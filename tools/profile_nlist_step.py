#!/usr/bin/env python
'''Break down where the large-N (neighbor-list) energy+forces step spends
its time on TPU: graph build vs message-passing forward vs backward.

Timings use the honest protocol from PERF_NOTES.md (poison fetch first,
then timed loops with block_until_ready).
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
    L = (n / 0.1) ** (1 / 3)
    cell = np.diag([L, L, L]).astype(np.float32)
    pos = (rs.rand(n, 3) * L).astype(np.float32)
    z = rs.choice([1, 1, 8], size=n).astype(np.int32)
    return (jnp.asarray(z[None]), jnp.asarray(pos[None]),
            jnp.asarray(cell[None]))


def timeit(f, *args, n_iter=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n_iter * 1e3  # ms


def main():
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.ops.nlist import neighbor_list

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    K = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    z, pos, cell = make_box(N)
    # poison fetch so block_until_ready is honest
    _ = float(jnp.sum(pos))

    build = jax.jit(lambda p, c, m: neighbor_list(p, c, m, 5.0, K))
    idx, kmask, disp, ovf = build(pos, cell, z > 0)
    edges = int(jnp.sum(kmask))
    kreal = int(jnp.sum(kmask, axis=-1).max())
    print(f'N={N} K={K} edges={edges} maxK={kreal} overflow={int(ovf.sum())}')
    t_build = timeit(lambda: build(pos, cell, z > 0))
    print(f'neighbor_list build O(N^2): {t_build:7.2f} ms')

    from newtonnet_tpu.ops.cellgrid import (
        cell_grid_neighbor_list, suggest_capacity, suggest_grid)
    grid = suggest_grid(np.asarray(cell[0]), 5.0)
    cap = suggest_capacity(N, grid)
    build_cg = jax.jit(lambda p, c, m: cell_grid_neighbor_list(
        p, c, m, 5.0, K, grid, cap))
    _, kmask_cg, _, ovf_cg = build_cg(pos, cell, z > 0)
    t_cg = timeit(lambda: build_cg(pos, cell, z > 0))
    print(f'cell-grid build {str(grid):9s} C={cap}: {t_cg:7.2f} ms '
          f'(edges={int(jnp.sum(kmask_cg))}, ovf={int(ovf_cg.sum())})')

    model = NewtonNet(cutoff=5.0, graph_mode='neighborlist', k_max=K,
                      output_properties=('energy', 'gradient_force'))
    model_e = NewtonNet(cutoff=5.0, graph_mode='neighborlist', k_max=K,
                        output_properties=('energy',))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), z, pos, cell)

    # energy only, with the in-jit build
    f_e = jax.jit(lambda p: model_e.apply(p, z, pos, cell)['energy'])
    t_e = timeit(f_e, params)
    print(f'energy fwd (incl build)  : {t_e:8.2f} ms')

    # energy only, precomputed nlist (build excluded)
    f_e_nl = jax.jit(lambda p, i, m: model_e.apply(
        p, z, pos, cell, nlist=(i, m))['energy'])
    t_e_nl = timeit(f_e_nl, params, idx, kmask)
    print(f'energy fwd (pre nlist)   : {t_e_nl:8.2f} ms')

    # energy+forces with in-jit build
    f_ef = jax.jit(lambda p: model.apply(p, z, pos, cell)['gradient_force'])
    t_ef = timeit(f_ef, params)
    print(f'energy+forces (incl build): {t_ef:7.2f} ms '
          f'-> {edges / t_ef * 1e3 / 1e6:.2f} M edges/s')

    # energy+forces with precomputed nlist
    f_ef_nl = jax.jit(lambda p, i, m: model.apply(
        p, z, pos, cell, nlist=(i, m))['gradient_force'])
    t_ef_nl = timeit(f_ef_nl, params, idx, kmask)
    print(f'energy+forces (pre nlist): {t_ef_nl:8.2f} ms '
          f'-> {edges / t_ef_nl * 1e3 / 1e6:.2f} M edges/s')

    # isolated gather cost at this size: one (N*K, 4F) row gather
    x = jnp.zeros((1, N, 512), jnp.float32)
    g = jax.jit(lambda x, i: jnp.take_along_axis(
        x, i.reshape(1, -1, 1), axis=1))
    t_g = timeit(g, x, idx)
    print(f'one 4F-wide row gather   : {t_g:8.2f} ms')


if __name__ == '__main__':
    main()
