#!/usr/bin/env python
'''TPU microbenchmark: windowed one-hot MXU gather/scatter
(ops/pallas_window.py) vs the per-row DMA gather/scatter it replaces.

Shapes match the large-N training hot op: the fused 4F-wide neighbor
gather of the newton3 half-list step at N=4096, K=40, F=128 (payload
4F=512), bf16 — plus its VJP scatter-add. Window W comes from the
measured cell-sorted locality (tools/exp_window_gather.py part A).

Usage: python tools/bench_window.py [n_atoms] [K] [W] [T]
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, args, tag, iters=50):
    import jax
    f = jax.jit(fn)
    o = jax.tree.leaves(f(*args))[0]
    o.block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        o = jax.tree.leaves(f(*args))[0]
    o.block_until_ready()
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(f'  {tag:40s} {ms:8.3f} ms')
    return ms


def main(n_atoms=4096, K=40, W=3072, T=128, F4=512):
    # defaults W=3072, T=128: the smallest window the measured cell-sorted
    # locality allows at N=4096 (offsets reach +/-1416; see PERF_NOTES.md
    # and exp_window_gather.bench_gather) -- smaller windows fail the
    # check_window assert below
    import jax
    import jax.numpy as jnp

    from newtonnet_tpu.data.prelists import frame_neighbor_lists
    from newtonnet_tpu.ops.nlist import gather_nodes
    from newtonnet_tpu.ops.pallas_window import (check_window, window_gather,
                                                 window_margin,
                                                 window_scatter_sum)
    from tools.exp_window_gather import cell_sort_order, make_config

    z, pos, cell, cutoff = make_config(n_atoms)
    order = cell_sort_order(pos, cell, cutoff)
    z, pos = z[order], pos[order]
    idx, mask = frame_neighbor_lists(z, pos, cell, cutoff, K, mode='newton3')
    N = n_atoms
    idx_kn = jnp.asarray(np.where(mask, idx, 0).T[None])   # (1, K, N)
    mask_kn = jnp.asarray(mask.T[None])
    print(f'device={jax.devices()[0].platform} N={N} K={K} W={W} T={T} '
          f'F4={F4} valid_edges={int(mask.sum())}')
    # masked slots carry idx 0 which may be out-of-window: point them at
    # their own block start instead (always in-window, result masked anyway)
    starts = jnp.repeat(jnp.asarray(
        [(i * T + T // 2 - W // 2) % N for i in range(N // T)], jnp.int32), T)
    idx_kn = jnp.where(mask_kn, idx_kn, starts[None, None, :])
    print('  margin (rows of slack):', window_margin(idx_kn, mask_kn, W, T))
    assert check_window(idx_kn, mask_kn, W, T)

    x = jnp.asarray(np.random.RandomState(1).rand(1, N, F4), jnp.bfloat16)
    y = jnp.asarray(np.random.RandomState(2).rand(1, K, N, F4), jnp.bfloat16)
    # K-major row gather baseline: x[b, idx[b,k,n]] -> (B, K, N, F4)
    idx_nk = jnp.swapaxes(idx_kn, 1, 2)                     # (1, N, K)

    def row_gather(x):
        return jnp.swapaxes(gather_nodes(x, idx_nk), 1, 2)  # (B, K, N, F)

    def row_scatter(y):
        return jnp.zeros((1, N, F4), jnp.float32).at[
            0, idx_kn.reshape(-1)].add(
            y.reshape(-1, F4).astype(jnp.float32), mode='drop')

    ref = row_gather(x)
    out = window_gather(x, idx_kn, W, T)
    mk = mask_kn[..., None]
    err = float(jnp.max(jnp.abs(jnp.where(mk, ref.astype(jnp.float32)
                                          - out.astype(jnp.float32), 0))))
    print(f'  gather parity (valid edges) max|err| = {err:.2e}')

    ym = jnp.where(mk, y, 0)
    sref = row_scatter(ym)
    sout = window_scatter_sum(ym, idx_kn, W, T).astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(sref - sout)) / jnp.max(jnp.abs(sref)))
    print(f'  scatter parity rel|err| = {rel:.2e}  (bf16 payload, fp32 acc)')

    gb = (N * K * F4 * 2) / 1e9
    t = timeit(row_gather, (x,), 'row gather (per-row DMA)')
    print(f'      -> {gb / (t / 1e3):7.1f} GB/s edge-payload')
    t = timeit(lambda x: window_gather(x, idx_kn, W, T), (x,),
               'window gather (pallas one-hot MXU)')
    print(f'      -> {gb / (t / 1e3):7.1f} GB/s edge-payload')
    t = timeit(row_scatter, (ym,), 'row scatter-add (.at[].add)')
    print(f'      -> {gb / (t / 1e3):7.1f} GB/s edge-payload')
    t = timeit(lambda y: window_scatter_sum(y, idx_kn, W, T), (ym,),
               'window scatter (pallas one-hot MXU)')
    print(f'      -> {gb / (t / 1e3):7.1f} GB/s edge-payload')

    # grad-of-gather composite (the training pattern: gather fwd + VJP)
    def train_like(fn):
        def loss(x):
            return jnp.sum(fn(x).astype(jnp.float32) ** 2)
        return jax.grad(loss)

    timeit(train_like(row_gather), (x.astype(jnp.float32),),
           'row gather fwd+VJP')
    timeit(train_like(lambda x: window_gather(x, idx_kn, W, T)),
           (x.astype(jnp.float32),), 'window gather fwd+VJP')


if __name__ == '__main__':
    a = sys.argv[1:]
    main(*(int(v) for v in a))
