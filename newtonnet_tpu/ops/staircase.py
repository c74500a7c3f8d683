'''Staircase-compacted Newton's-third-law half lists.

The newton3 half-list formulation (ops/nlist.newton3_half_list) stores
every undirected edge once in a (N, K) slot grid whose capacity K is the
Koenig bound max(outdeg, indeg) over ALL atoms -- so every per-edge row
operation (the fused 4F gathers, the inv_scatter_sum scans, the pair-MLP
elementwise chain) pays N*K slot rows while only ~2/3 of them hold real
edges at liquid densities (measured occupancy 66.5% at N=4096, rc=5,
rho=0.1). The round-4 floor analysis (PERF_NOTES.md) showed the large-N
train step is bound by exactly those row operations, so the padding
fraction is paid in full on every one of the step's ~24 row ops.

This module removes most of that padding with a STAIRCASE layout:

  1. Color the oriented half list with the Koenig construction
     (ops/nlist._konig_color), then run a dual-side Kempe compaction:
     repeated chain-flip sweeps that lower, per atom, the highest color
     used on EITHER its out-row or its in-row. After convergence each
     atom's colors sit just above its own ~deg/2 need instead of the
     global bound (measured: sum of per-atom needs 113k vs the 159.7k
     dense grid at N=4096 -- and both the out side and the in side are
     compact simultaneously, which is what makes step 3 legal).
  2. Reorder atoms by need, descending (a host-side permutation the
     caller applies to the frame once).
  3. Cut the color axis into chunks of `chunk` consecutive colors; chunk
     [k0, k0+c) only carries the atom PREFIX that still needs colors
     > k0. Each chunk is then a small SQUARE K-major block -- an edge's
     source row and its in-side target both live inside the chunk's
     prefix (need(src) > color >= k0 and need(dst) > color >= k0) -- so
     the existing inv_gather / inv_scatter_sum primitives run per chunk
     unmodified, on ~25% fewer total rows (measured: 123k staircase rows
     vs 160k dense at chunk=6; the TPU microbench shows the savings are
     real, not op-count-limited: 7 chunked gathers run at the same
     ns/row as one monolithic gather, and the unrolled staircase scatter
     is ~21% faster than the uniform scan at matched semantics).

Reference context: the reference rebuilds a dynamic COO edge list every
forward (newtonnet/layers/representations.py:70-98) and its scatter ops
pay exactly the real edge count -- the staircase recovers that property
for the static-shape TPU formulation while keeping every shape
compile-time constant.

Scope: large-N single-frame training (B == 1), the configuration the
large-N benchmark runs (large systems train data-parallel at B=1 per
chip -- PERF_NOTES.md round-5 shows B>1 batching is pathological on the
(B, N, K) layout). The MD driver and halo trainer keep the plain
newton3 layout.
'''
from typing import NamedTuple

import numpy as np


class StairChunk(NamedTuple):
    '''One staircase chunk: a square K-major half-list block.

    Arrays are (1, c, n): c consecutive colors, n = the padded atom
    prefix that needs colors > the chunk's first color. idx[0, t, s] is
    the in-side endpoint (sorted atom id < n) of the edge stored at
    color k0+t on sorted atom s's out-row; inv is its per-color inverse
    (build_inverse_list semantics: idx[0, t, inv[0, t, j]] == j where
    inv_mask).
    '''
    idx: np.ndarray
    mask: np.ndarray
    inv: np.ndarray
    inv_mask: np.ndarray


class StairList(NamedTuple):
    '''Host-side staircase build output.

    perm (N,): sorted position -> original atom id. The caller permutes
    the frame (z, pos, and any per-atom targets) with `perm` before
    feeding the model, which then works entirely in sorted space;
    inv_perm maps model outputs back (out_orig = out_sorted[inv_perm]).
    chunks: tuple of StairChunk, int32/bool numpy arrays.
    widths: static (c, n) per chunk -- the shape plan, reusable across
    frames via the `plan` argument so every frame of a dataset compiles
    to the same shapes.
    '''
    perm: np.ndarray
    inv_perm: np.ndarray
    chunks: tuple
    widths: tuple


def _per_atom_need(src, dst, color, N):
    '''Slots needed per atom: 1 + its highest color on either side.'''
    need = np.zeros(N, np.int64)
    np.maximum.at(need, src, color + 1)
    np.maximum.at(need, dst, color + 1)
    return need


def _compact_colors(src, dst, out_deg, in_deg, state, sweeps):
    '''Dual-side Kempe compaction: lower each atom's top color.

    For each atom (worst overshoot over its own degree bound first),
    repeatedly take the edge holding its highest color on either side
    and move it to the lowest color free on the edge's out-row --
    directly when that color is also free on the in-row, else by the
    same alternating-chain flip the Koenig construction uses. Sweeps
    stop when a pass moves (almost) nothing; each sweep is O(E * cap)
    worst case, measured ~1 s/sweep at N=4096, E=106k.
    '''
    color, slot_out, slot_in, chain_flip = state
    N, cap = slot_out.shape
    for _ in range(sweeps):
        moved = 0
        need = _per_atom_need(src, dst, color, N)
        order = np.argsort(need - np.maximum(out_deg, in_deg),
                           kind='stable')[::-1]
        for a_u in order:
            a_u = int(a_u)
            for _ in range(cap):
                oc = np.flatnonzero(slot_out[a_u] >= 0)
                ic = np.flatnonzero(slot_in[a_u] >= 0)
                co = int(oc.max()) if len(oc) else -1
                ci = int(ic.max()) if len(ic) else -1
                top = max(co, ci)
                if top <= 0:
                    break
                if co >= ci:
                    e = int(slot_out[a_u][co])
                else:
                    e = int(slot_in[a_u][ci])
                u, v, ce = int(src[e]), int(dst[e]), int(color[e])
                cands = np.flatnonzero(slot_out[u][:ce] < 0)
                if not len(cands):
                    break
                done = False
                for a in cands:
                    a = int(a)
                    if slot_in[v][a] < 0:   # free on both rows: move
                        color[e] = a
                        slot_out[u][ce] = slot_in[v][ce] = -1
                        slot_out[u][a] = slot_in[v][a] = e
                        moved += 1
                        done = True
                        break
                if not done:
                    a = int(cands[0])
                    slot_out[u][ce] = slot_in[v][ce] = -1  # lift e out
                    if chain_flip(u, v, a, ce):
                        color[e] = a
                        slot_out[u][a] = slot_in[v][a] = e
                        moved += 1
                    else:  # chain ended occupying a at u: put e back
                        slot_out[u][ce] = slot_in[v][ce] = e
                        break
        if moved < max(50, len(src) // 2000):
            break
    return color


def staircase_half_list(idx, kmask, chunk=4, pad=8, sweeps=6, plan=None):
    '''Orient, color, compact, and chunk a symmetric list (host-side).

    Args:
        idx, kmask: (N, K) symmetric directed neighbor list (both (i, j)
            and (j, i) present, as neighbor_list returns). B > 1 is not
            supported (see module docstring).
        chunk: colors per staircase chunk. Smaller chunks follow the
            need distribution more tightly (fewer padded rows) at the
            cost of more scan blocks; 4-6 measured best on TPU v5e.
        pad: atom-prefix widths are rounded up to this multiple.
        sweeps: Kempe compaction sweep cap (converges in ~4-6).
        plan: optional `StairList.widths` from a previous build -- fixes
            the static shape plan so every frame of a dataset compiles
            identically. Raises if this frame does not fit the plan.

    Returns:
        StairList. Every undirected edge appears exactly once across
        chunks; per-color maps are injective on both sides (inv_gather /
        inv_scatter_sum exactness).
    '''
    colored = staircase_colors(idx, kmask, sweeps=sweeps, plan=plan)
    return staircase_chunks(colored, chunk=chunk, pad=pad, plan=plan)


def staircase_colors(idx, kmask, sweeps=6, plan=None):
    '''Phase 1: orient + color + compact (the expensive host work).

    Dispatches to the native builder (native/staircase.cpp, ~46 ms at
    N=4096 vs ~9 s pure-python) when the shared library is available.
    Returns an opaque (N, src, dst, color) tuple for staircase_chunks,
    so callers fixing a shape plan from the first frame can re-chunk
    without re-coloring.
    '''
    from newtonnet_tpu.ops.nlist import _euler_orientation, _konig_color
    idx = np.asarray(idx)
    kmask = np.asarray(kmask)
    if idx.ndim != 2:
        raise ValueError('staircase_half_list takes one frame (N, K); '
                         'large-N trains at B=1 per chip')
    N, K = idx.shape
    plan_cap = sum(c for c, _ in plan) if plan is not None else 0
    from newtonnet_tpu import native
    if native.available() or native.ensure_built():
        out = native.staircase_color_edges_native(
            idx, kmask, sweeps=sweeps, cap=plan_cap)
        if out is None:  # plan palette below this frame's Konig optimum
            src, _, color = native.staircase_color_edges_native(
                idx, kmask, sweeps=0, cap=0)
            needed = int(color.max()) + 1 if len(color) else 1
            raise ValueError(
                f'staircase_half_list: frame needs {needed} colors; the '
                f'plan provides {plan_cap}')
        src, dst, color = out
        return N, src.astype(np.int64), dst.astype(np.int64), \
            color.astype(np.int64)
    rows = np.repeat(np.arange(N), K)[kmask.ravel()]
    cols = idx.ravel()[kmask.ravel()]
    lo, hi = np.minimum(rows, cols), np.maximum(rows, cols)
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    deg = np.bincount(pairs[:, 0], minlength=N) \
        + np.bincount(pairs[:, 1], minlength=N)
    src, dst = _euler_orientation(pairs, deg, N)
    out_deg = np.bincount(src, minlength=N)
    in_deg = np.bincount(dst, minlength=N)
    cap = int(max(out_deg.max(), in_deg.max(), 1))
    if plan is not None:
        plan_cap = sum(c for c, _ in plan)
        if cap > plan_cap:
            raise ValueError(
                f'staircase_half_list: frame needs {cap} colors; the '
                f'plan provides {plan_cap}')
        cap = plan_cap
    state = _konig_color(src, dst, N, cap)
    color = _compact_colors(src, dst, out_deg, in_deg, state, sweeps)
    return N, src, dst, color


def staircase_chunks(colored, chunk=4, pad=8, plan=None):
    '''Phase 2: atom ordering + chunk assembly (cheap, plan-aware).'''
    N, src, dst, color = colored
    cap = int(color.max()) + 1 if len(color) else 1
    if plan is not None:
        plan_cap = sum(c for c, _ in plan)
        if cap > plan_cap:
            # must be loud: colors beyond the plan would otherwise fall
            # off the chunked fill below and silently drop edges
            raise ValueError(
                f'staircase_half_list: frame needs {cap} colors; the '
                f'plan provides {plan_cap}')
        cap = plan_cap
    need = _per_atom_need(src, dst, color, N)
    order = np.argsort(-need, kind='stable')
    perm = order.astype(np.int32)                 # sorted pos -> original
    spos = np.empty(N, np.int64)
    spos[order] = np.arange(N)
    inv_perm = spos.astype(np.int32)              # original -> sorted pos

    widths = []
    k0 = 0
    if plan is not None:
        # follow the plan's chunk boundaries exactly (shape stability
        # across frames); only validate that this frame fits
        for pc, pn in plan:
            n_k = int((need > k0).sum())
            n_k = max(pad, -(-n_k // pad) * pad)
            if min(n_k, N) > pn:
                raise ValueError(
                    f'staircase_half_list: chunk {len(widths)} needs '
                    f'{min(n_k, N)} rows; the plan provides {pn}')
            widths.append((pc, pn))
            k0 += pc
    else:
        while k0 < cap:
            c = min(chunk, cap - k0)
            n_k = int((need > k0).sum())
            n_k = max(pad, -(-n_k // pad) * pad)
            widths.append((c, min(n_k, N)))
            k0 += c

    # vectorized chunk fill (the per-edge python loop took ~2 s at 106k
    # edges -- too slow for MD skin rebuilds)
    starts = np.cumsum([0] + [c for c, _ in widths])
    ci_all = np.searchsorted(starts, color, side='right') - 1
    su_all = spos[src]
    sv_all = spos[dst]
    out_chunks = []
    for ci, (c, n) in enumerate(widths):
        sel = ci_all == ci
        t = color[sel] - starts[ci]
        su, sv = su_all[sel], sv_all[sel]
        if len(su) and (su.max() >= n or sv.max() >= n):
            raise AssertionError(
                'staircase_half_list: edge endpoint beyond its chunk '
                'prefix (compaction invariant violated)')
        if (len(np.unique(t * n + su)) != len(su)
                or len(np.unique(t * n + sv)) != len(sv)):
            raise AssertionError(
                'staircase_half_list: slot collision (coloring invariant '
                'violated)')
        idx_c = np.zeros((c, n), np.int32)
        mask_c = np.zeros((c, n), bool)
        inv_c = np.zeros((c, n), np.int32)
        invm_c = np.zeros((c, n), bool)
        idx_c[t, su] = sv
        mask_c[t, su] = True
        inv_c[t, sv] = su
        invm_c[t, sv] = True
        out_chunks.append(StairChunk(idx=idx_c[None], mask=mask_c[None],
                                     inv=inv_c[None],
                                     inv_mask=invm_c[None]))

    return StairList(perm=perm, inv_perm=inv_perm,
                     chunks=tuple(out_chunks), widths=tuple(widths))


def stair_nlist(stair):
    '''The model-facing nlist payload: a tuple of per-chunk 4-tuples.

    Feed as `model.apply(..., nlist=stair_nlist(sl))` to a
    newton3_compact model, with the frame permuted by `sl.perm` first.
    '''
    return tuple((c.idx, c.mask, c.inv, c.inv_mask) for c in stair.chunks)
