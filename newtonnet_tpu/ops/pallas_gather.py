'''VMEM-resident Pallas row gather for the neighbor-list hot path.

The large-N neighbor-list step is bound by XLA row gathers at ~11 ns/row
(PERF_NOTES.md "Large-N gather study"); the rows are re-fetched from HBM
every time even though the whole (N, F) source is a few MB. This kernel
pins the source in VMEM across the grid (its BlockSpec index is constant,
so Mosaic's revolving-window DMA fetches it once) and gathers row blocks
with an in-kernel take_along_axis.

Opt-in via NEWTONNET_GATHER=pallas (measured fallback: the XLA gather).
It is applied only INSIDE the inv_gather / inv_scatter_sum primitive
implementations (ops/nlist.py), which own their jvp/transpose rules, so
autodiff never needs to differentiate through the pallas_call itself.

Interpret mode (NEWTONNET_PALLAS_INTERPRET=1) runs the same kernel on CPU
for correctness tests; tools/exp_pallas_gather.py measures the raw kernel.
'''
import functools
import os
import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the resident source block (v5e has 128 MB VMEM; leave
# room for the output block, index block, and double buffering)
_SOURCE_BUDGET_BYTES = 64 * 1024 * 1024
_OUT_BLOCK_BUDGET_BYTES = 8 * 1024 * 1024
_BLOCK_ROWS = 2048


def _interpret():
    return os.environ.get('NEWTONNET_PALLAS_INTERPRET', '0') == '1'


def enabled():
    return os.environ.get('NEWTONNET_GATHER', 'xla') == 'pallas'


def _block_rows(rows, f, itemsize):
    '''Output-block row count: capped so block*F stays within the output
    VMEM budget (double-buffered alongside the resident source).'''
    cap = max(8, _OUT_BLOCK_BUDGET_BYTES // max(f * itemsize, 1))
    return min(_BLOCK_ROWS, cap, max(8, rows))


def eligible(x, rows):
    '''Trace-time check that a (B, N, F) source gathered at `rows` rows
    per batch entry fits the kernel (VMEM budgets, dtype, platform).'''
    if not enabled():
        return False
    if x.dtype not in (jnp.float32, jnp.bfloat16, jnp.float16):
        return False
    if x.ndim != 3 or x.shape[-1] < 128:
        return False  # narrow rows (e.g. pos (N, 3)) pad 42x in VMEM lanes
    itemsize = jnp.dtype(x.dtype).itemsize
    if x.shape[1] * x.shape[2] * itemsize > _SOURCE_BUDGET_BYTES:
        return False
    # degenerate tiling: fewer gathered rows than one 8-sublane tile
    if rows < 8:
        return False
    if not _interpret():
        try:
            if jax.devices()[0].platform != 'tpu':
                return False
        except Exception:
            return False
        # Mosaic's dynamic-gather support is toolchain-dependent (the
        # 2026-08 toolchain rejects cross-tile take_along_axis); probe
        # ONE ahead-of-time compile per shape so an opted-in run falls
        # back to the measured XLA gather instead of failing mid-trace.
        b, n, f = x.shape
        block = _block_rows(rows, f, jnp.dtype(x.dtype).itemsize)
        if not _probe_compile(b, n, f, rows + (-rows) % block, block,
                              x.dtype):
            return False
    return True


_PROBE_CACHE = {}


def _probe_compile(b, n, f, e_padded, block, dtype):
    key = (b, n, f, e_padded, block, jnp.dtype(dtype).name)
    ok = _PROBE_CACHE.get(key)
    if ok is None:
        try:
            _call.lower(
                jax.ShapeDtypeStruct((b, n, f), dtype),
                jax.ShapeDtypeStruct((b, e_padded), jnp.int32),
                block=block).compile()
            ok = True
        except Exception as exc:  # Mosaic lowering/verification errors
            warnings.warn(
                'NEWTONNET_GATHER=pallas: kernel failed to compile for '
                f'source ({b},{n},{f}) {jnp.dtype(dtype).name} '
                f'(block={block}); using the XLA gather instead. '
                f'[{type(exc).__name__}: {str(exc)[:200]}]')
            ok = False
        _PROBE_CACHE[key] = ok
    return ok


def _kernel(idx_ref, x_ref, out_ref):
    _, rows, f = out_ref.shape
    idxm = jnp.broadcast_to(idx_ref[0][:, None], (rows, f))
    out_ref[0] = jnp.take_along_axis(x_ref[0], idxm, axis=0)


@functools.partial(jax.jit, static_argnames=('block',))
def _call(x, idx, block):
    b, n, f = x.shape
    e = idx.shape[1]
    return pl.pallas_call(
        _kernel,
        grid=(b, e // block),
        in_specs=[
            pl.BlockSpec((1, block), lambda b_, i: (b_, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, f), lambda b_, i: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block, f), lambda b_, i: (b_, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, e, f), x.dtype),
        interpret=_interpret(),
        compiler_params=None if _interpret() else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(idx, x)


def row_gather(x, idx):
    '''out[b, r] = x[b, idx[b, r]] with the source VMEM-resident.

    Args:
        x: (B, N, F) source rows (F >= 128, float dtype).
        idx: (B, R) int32 row indices (already in bounds).

    Returns:
        (B, R, F), same dtype as x.
    '''
    b, n, f = x.shape
    e = idx.shape[1]
    block = _block_rows(e, f, jnp.dtype(x.dtype).itemsize)
    pad = (-e) % block
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros((b, pad), idx.dtype)], axis=1)
    out = _call(x, idx.astype(jnp.int32), block)
    return out[:, :e] if pad else out
