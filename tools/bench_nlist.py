#!/usr/bin/env python
'''Profile the large-system (neighbor-list) path on TPU.

Measures per-step time and edges/s for energy+forces at various N on a
periodic water-box-like system (density ~0.1 atoms/A^3, cutoff 5 A,
K~48), dense vs neighborlist modes, fp32 default matmul precision.
Guides the Pallas kernel work: if the XLA nlist path is far from the
HBM/MXU roofline, the fused gather kernels are worth it.
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def make_box(n, seed=0):
    rs = np.random.RandomState(seed)
    # ~0.1 atoms/A^3 like liquid water (3 atoms / 30 A^3)
    L = (n / 0.1) ** (1 / 3)
    cell = np.diag([L, L, L]).astype(np.float32)
    pos = (rs.rand(n, 3) * L).astype(np.float32)
    z = rs.choice([1, 1, 8], size=n).astype(np.int32)
    return z[None], pos[None], cell[None]


def bench(model, params, z, pos, cell, n_iter=20):
    def fwd(params, z, pos, cell):
        out = model.apply(params, z, pos, cell)
        return out['energy'], out['gradient_force']

    f = jax.jit(fwd)
    e, g = f(params, z, pos, cell)
    jax.block_until_ready(g)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        e, g = f(params, z, pos, cell)
    jax.block_until_ready(g)
    return (time.perf_counter() - t0) / n_iter


def main():
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.ops.nlist import neighbor_list

    for n in (512, 2048, 4096, 8192):
        z, pos, cell = make_box(n)
        zj, posj, cellj = jnp.asarray(z), jnp.asarray(pos), jnp.asarray(cell)
        # count edges
        idx, kmask, _, ovf = jax.jit(
            lambda p, c, m: neighbor_list(p, c, m, 5.0, 96))(
                posj, cellj, zj > 0)
        edges = int(jnp.sum(kmask))
        kmax_real = int(jnp.sum(kmask, axis=-1).max())
        row = [f'N={n:5d} edges={edges:8d} maxK={kmax_real}, ovf={int(ovf.sum())}']
        for mode in ('neighborlist', 'dense'):
            if mode == 'dense' and n > 4096:
                row.append('dense=OOM-skip')
                continue
            model = NewtonNet(graph_mode=mode, k_max=min(96, kmax_real + 8),
                              output_properties=['energy', 'gradient_force'])
            params = model.init(jax.random.PRNGKey(0), zj, posj, cellj)
            try:
                dt = bench(model, params, zj, posj, cellj)
                row.append(f'{mode}={dt * 1e3:7.2f}ms ({edges / dt / 1e6:6.1f}M edges/s)')
            except Exception as exc:  # noqa: BLE001
                row.append(f'{mode}=FAIL({type(exc).__name__})')
        print('  '.join(row), flush=True)


if __name__ == '__main__':
    main()
