#!/usr/bin/env python
'''Experiment: windowed one-hot MXU gather for the large-N neighborlist path.

Premise (PERF_NOTES.md round-3 K-list study): the large-N train step is
per-row gather/scatter latency-bound (~18 ns/row DMA). If atoms are
relabeled in cell-sorted order, every neighbor index j of atom i satisfies
(j - i) mod N in (-W/2, W/2] for a window W bounded by a few cell planes.
A gather then becomes, per T-row block, a (T*K, W) one-hot @ (W, F) slab
matmul -- built in VMEM, ridden on the MXU -- instead of E per-row DMAs.
Its adjoint (scatter-add) is the transposed matmul plus a cheap strided
overlap-add, replacing the even-slower per-row scatter.

Part A (numpy, host): measure the actual window for the bench_train_large
LJ-liquid config after cell-sort relabeling.
Part B (jax): microbenchmark take_along_axis gather vs the windowed
one-hot matmul (XLA first; Pallas kernel lives in ops/pallas_window.py).

Usage: python tools/exp_window_gather.py [A|B] [n_atoms]
'''
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_config(n_atoms=4096, rho=0.1, cutoff=5.0, seed=0):
    L = (n_atoms / rho) ** (1 / 3)
    rs = np.random.RandomState(seed)
    z = rs.choice([1, 1, 8], size=n_atoms).astype(np.int32)
    pos = (rs.rand(n_atoms, 3) * L).astype(np.float64)
    cell = np.diag([L, L, L]).astype(np.float64)
    return z, pos, cell, cutoff


def cell_sort_order(pos, cell, sort_cell):
    '''Relabel atoms by raster-ordered sort cells (serpentine in the two
    fast axes to shrink the jump between adjacent slow-axis planes).
    sort_cell < cutoff gives thinner slow-axis planes and thus a smaller
    circular index window at the cost of neighbors spanning more planes.'''
    L = np.diag(cell)
    nc = np.maximum((L // sort_cell).astype(int), 1)
    ijk = np.minimum((pos / (L / nc)).astype(int), nc - 1)
    # serpentine: reverse y within odd z-planes, reverse x within odd y-rows
    iy = np.where(ijk[:, 2] % 2 == 1, nc[1] - 1 - ijk[:, 1], ijk[:, 1])
    ix = np.where(iy % 2 == 1, nc[0] - 1 - ijk[:, 0], ijk[:, 0])
    cid = (ijk[:, 2] * nc[1] + iy) * nc[0] + ix
    return np.argsort(cid, kind='stable')


def measure_window(n_atoms=4096, mode='newton3', k_max=40, sort_frac=1.0):
    from newtonnet_tpu.data.prelists import frame_neighbor_lists
    z, pos, cell, cutoff = make_config(n_atoms)
    order = cell_sort_order(pos, cell, cutoff * sort_frac)
    z, pos = z[order], pos[order]
    idx, mask = frame_neighbor_lists(z, pos, cell, cutoff, k_max, mode=mode)
    n = n_atoms
    i = np.arange(n)[:, None]
    d = (idx - i) % n            # circular forward distance
    d = np.where(d > n // 2, d - n, d)[mask]
    lo, hi = int(d.min()), int(d.max())
    print(f'N={n} mode={mode} sort_frac={sort_frac}: offsets in '
          f'[{lo}, {hi}] (|d| p99.9={np.percentile(np.abs(d), 99.9):.0f}, '
          f'max={max(-lo, hi)})')
    for W in (512, 1024, 2048):
        off = W // 2
        inside = ((d >= -off) & (d < W - off)).mean()
        print(f'  W={W}: {inside * 100:.4f}% of edges inside window')
    return max(-lo, hi)


def bench_gather(n_atoms=4096, K=40, F4=512, W=3072, T=128):
    # W=3072 is the smallest 128-multiple covering the measured cell-sorted
    # offset range at N=4096 (max |d|=1416 plus T/2 block half-width).
    import time

    import jax
    import jax.numpy as jnp

    from newtonnet_tpu.data.prelists import frame_neighbor_lists
    z, pos, cell, cutoff = make_config(n_atoms)
    order = cell_sort_order(pos, cell, cutoff)
    z, pos = z[order], pos[order]
    idx, mask = frame_neighbor_lists(z, pos, cell, cutoff, K, mode='newton3')
    N = n_atoms
    idx = jnp.asarray(np.where(mask, idx, 0)[None])        # (1, N, K)
    maskj = jnp.asarray(mask[None])
    x = jnp.asarray(np.random.RandomState(1).rand(1, N, F4), jnp.float32)
    dev = jax.devices()[0].platform
    print(f'device={dev} N={N} K={K} F4={F4} W={W} T={T}')

    def timeit(fn, args, tag, iters=30):
        f = jax.jit(fn)
        o = jax.tree.leaves(f(*args))[0]
        o.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            o = jax.tree.leaves(f(*args))[0]
        o.block_until_ready()
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f'  {tag:34s} {ms:8.3f} ms')
        return ms

    # baseline: take_along_axis row gather
    def row_gather(x, idx):
        flat = jnp.take_along_axis(x, idx.reshape(1, N * K, 1) *
                                   jnp.ones((1, 1, F4), jnp.int32), axis=1)
        return flat.reshape(1, N, K, F4)

    def row_gather2(x, idx):
        from newtonnet_tpu.ops.nlist import gather_nodes
        return gather_nodes(x, idx)

    timeit(row_gather2, (x, idx), 'row gather (gather_nodes)')

    # XLA windowed one-hot: per-block slabs + einsum
    nb = N // T
    off = W // 2
    starts = (jnp.arange(nb) * T - off) % N
    x2 = jnp.concatenate([x, x[:, :W]], axis=1)

    def onehot_xla(x, idx):
        x2 = jnp.concatenate([x, x[:, :W]], axis=1)
        slabs = jax.vmap(lambda s: jax.lax.dynamic_slice(
            x2[0], (s, 0), (W, F4)))(starts)              # (nb, W, F4)
        local = (idx.reshape(nb, T, K) -
                 starts[:, None, None]) % N               # (nb, T, K)
        oh = jax.nn.one_hot(local, W, dtype=jnp.bfloat16)
        out = jnp.einsum('btkw,bwf->btkf', oh,
                         slabs.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return out.reshape(1, N, K, F4)

    out_ref = row_gather2(x, idx)
    out_oh = onehot_xla(x, idx)
    # masked slots carry idx 0, which is out-of-window for most blocks (the
    # one-hot drops them while the row gather fetches row 0): compare valid
    # edges only, like the Pallas parity check below
    err = float(jnp.max(jnp.abs(jnp.where(maskj[..., None],
                                          out_ref - out_oh, 0))))
    print(f'  onehot-XLA parity max|err| (valid edges) = {err:.2e}')
    timeit(onehot_xla, (x, idx), 'onehot window gather (XLA)')

    # Pallas windowed kernel (K-major API; full bench in tools/bench_window.py)
    from newtonnet_tpu.ops.pallas_window import window_gather
    idx_kn = jnp.swapaxes(idx, 1, 2)                       # (1, K, N)
    outp = jnp.swapaxes(window_gather(x, idx_kn, W, T), 1, 2)
    mk = maskj[..., None]                                  # (1, N, K, 1)
    err = float(jnp.max(jnp.abs(jnp.where(mk, out_ref - outp, 0))))
    print(f'  onehot-pallas parity max|err| = {err:.2e}')
    if dev == 'tpu':
        timeit(lambda x, i: window_gather(x, i, W, T), (x, idx_kn),
               'onehot window gather (pallas)')

    # adjoint: scatter-add baseline vs transposed windowed matmul
    y = out_ref

    def row_scatter(y, idx):
        return jnp.zeros((1, N, F4)).at[
            0, idx.reshape(N * K)].add(y.reshape(N * K, F4))[None][0][None]

    timeit(row_scatter, (y, idx), 'row scatter-add (.at[].add)')

    def onehot_scatter_xla(y, idx):
        local = (idx.reshape(nb, T, K) - starts[:, None, None]) % N
        oh = jax.nn.one_hot(local, W, dtype=jnp.bfloat16)
        dslab = jnp.einsum('btkw,btkf->bwf', oh,
                           y.reshape(nb, T, K, F4).astype(jnp.bfloat16),
                           preferred_element_type=jnp.float32)
        # overlap-add: dslab[b] covers rows [b*T - off, b*T - off + W) mod N
        out = jnp.zeros((N + W, F4))
        def body(out, bv):
            b, v = bv
            return jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (b * T, 0), (W, F4)) + v,
                (b * T, 0)), None
        out, _ = jax.lax.scan(body, out, (jnp.arange(nb), dslab))
        out = out.at[:W].add(out[N:])                      # wrap
        out = jnp.roll(out[:N], off, axis=0)
        return out[None]

    ds_ref = row_scatter(y, idx)
    ds_oh = onehot_scatter_xla(y, idx)
    err = float(jnp.max(jnp.abs(ds_ref - ds_oh)) /
                (float(jnp.max(jnp.abs(ds_ref))) + 1e-9))
    print(f'  onehot-scatter parity rel|err| = {err:.2e}')
    timeit(onehot_scatter_xla, (y, idx), 'onehot window scatter (XLA)')

    from newtonnet_tpu.ops.pallas_window import window_scatter_sum
    y_kn = jnp.swapaxes(jnp.where(mk, y, 0), 1, 2)         # (1, K, N, F4)
    dsp = window_scatter_sum(y_kn, idx_kn, W, T)
    ds_ref_m = row_scatter(jnp.where(mk, y, 0), idx)
    err = float(jnp.max(jnp.abs(ds_ref_m - dsp)) /
                (float(jnp.max(jnp.abs(ds_ref_m))) + 1e-9))
    print(f'  pallas-scatter parity rel|err| = {err:.2e}')
    if dev == 'tpu':
        timeit(lambda y, i: window_scatter_sum(y, i, W, T),
               (y_kn, idx_kn), 'onehot window scatter (pallas)')


if __name__ == '__main__':
    part = sys.argv[1] if len(sys.argv) > 1 else 'A'
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    if part.upper() == 'A':
        for sf in (1.0, 0.5, 0.34, 0.25):
            measure_window(n, sort_frac=sf)
    else:
        bench_gather(n)
