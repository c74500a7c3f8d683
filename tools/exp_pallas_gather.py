#!/usr/bin/env python
'''Pallas VMEM-resident gather experiment for the K-major edge layout.

The large-N neighbor-list step is bound by XLA row gathers at ~11 ns/row
(PERF_NOTES.md). This kernel keeps the (N, F) source entirely VMEM-
resident (4 MB at N=4096, F=512 bf16) and gathers row blocks with an
in-kernel take_along_axis, testing whether Mosaic's dynamic_gather beats
the XLA lowering when the source never leaves VMEM.

Run on TPU:   python tools/exp_pallas_gather.py [N] [F] [K]
CPU (interpret-mode correctness only): set NEWTONNET_PALLAS_INTERPRET=1.
'''
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = os.environ.get('NEWTONNET_PALLAS_INTERPRET', '0') == '1'


def _kernel(idx_ref, x_ref, out_ref):
    rows, f = out_ref.shape
    idxm = jnp.broadcast_to(idx_ref[:][:, None], (rows, f))
    out_ref[:] = jnp.take_along_axis(x_ref[:], idxm, axis=0)


@functools.partial(jax.jit, static_argnames=('block',))
def pallas_gather(x, idx_flat, block=2048):
    '''out[e] = x[idx_flat[e]] with x VMEM-resident. x (N, F), idx (E,).'''
    n, f = x.shape
    e = idx_flat.shape[0]
    assert e % block == 0, (e, block)
    return pl.pallas_call(
        _kernel,
        grid=(e // block,),
        in_specs=[
            pl.BlockSpec((block,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, f), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((e, f), x.dtype),
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(idx_flat, x)


def main(n=4096, f=512, k=40):
    rs = np.random.RandomState(0)
    e = ((n * k) // 2048) * 2048
    idx = jnp.asarray(rs.randint(0, n, size=e).astype(np.int32))
    for dt in (jnp.bfloat16, jnp.float32):
        x = jnp.asarray(rs.randn(n, f), dt)
        _ = float(jnp.sum(x.astype(jnp.float32)))  # honest-timing poison
        f_xla = jax.jit(lambda x, i: jnp.take_along_axis(
            x, i[:, None], axis=0, mode='promise_in_bounds'))
        # production kernel (ops/pallas_gather.row_gather, 3-D batched)
        from newtonnet_tpu.ops import pallas_gather as pg
        x3, idx3 = x[None], idx[None]
        variants = []
        try:
            o_pal = pallas_gather(x, idx)
            o_xla = f_xla(x, idx)
            err = float(jnp.max(jnp.abs((o_pal - o_xla).astype(jnp.float32))))
            assert err == 0.0, err
            variants.append(('pallas2d', lambda: pallas_gather(x, idx)))
        except Exception as exc:
            print(f'{np.dtype(dt).name}: pallas2d FAILED: '
                  f'{type(exc).__name__}: {str(exc)[:200]}')
        try:
            o_prod = pg.row_gather(x3, idx3)
            o_ref = jnp.take_along_axis(x3, idx3[..., None], axis=1)
            err = float(jnp.max(jnp.abs((o_prod - o_ref)
                                        .astype(jnp.float32))))
            assert err == 0.0, err
            variants.append(('pallas3d', lambda: pg.row_gather(x3, idx3)))
        except Exception as exc:
            print(f'{np.dtype(dt).name}: pallas3d FAILED: '
                  f'{type(exc).__name__}: {str(exc)[:200]}')
        if not variants:
            continue
        iters = 1 if INTERPRET else 30  # interpret mode: correctness only
        for name, fn in variants + [('xla', lambda: f_xla(x, idx))]:
            o = fn()
            jax.block_until_ready(o)
            t0 = time.perf_counter()
            for _ in range(iters):
                o = fn()
            jax.block_until_ready(o)
            t = (time.perf_counter() - t0) / iters
            print(f'{np.dtype(dt).name:9s} {name:6s}: {t * 1e3:7.3f} ms '
                  f'({t / e * 1e9:5.2f} ns/row, '
                  f'{e * f * x.dtype.itemsize / t / 1e9:6.1f} GB/s)')


if __name__ == '__main__':
    main(*(int(a) for a in sys.argv[1:]))
