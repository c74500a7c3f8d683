'''Padded neighbor lists for large systems.

The dense (B, N, N) pair tensor (ops/neighbors.py) is ideal for molecular
workloads but scales O(N^2 * F) in memory through the message-passing
feature maps. For condensed-phase systems the graph is built instead as a
padded per-atom neighbor list:

    idx  (B, N, K) int32  -- neighbor indices j for each atom i
    mask (B, N, K) bool   -- validity (|d| < r, i != j, both real)
    disp (B, N, K, 3)     -- displacement pos_i - pos_j (minimum-imaged)

with static K = k_max. Message passing then works on (B, N, K, ...)
tensors: gathers along the atom axis plus a regular sum over K -- no
scatter anywhere, and O(N * K * F) memory.

Construction is O(N^2) in distances but row-chunked (never materializing
more than (chunk, N) at once) and selects the K nearest in-range neighbors
per atom with top_k; overflow (more than K neighbors inside the cutoff)
drops the farthest and is reported via `overflow` so callers can re-bucket.
A cell-list construction for very large N is a planned optimization.
'''


import jax
import jax.numpy as jnp

from newtonnet_tpu.ops.neighbors import minimum_image


def neighbor_list(pos, cell, atom_mask, cutoff, k_max, mic_mode='exact',
                  chunk=512):
    '''Build padded neighbor lists.

    Args:
        pos: (B, N, 3); cell: (B, 3, 3); atom_mask: (B, N) bool.
        cutoff: radius; k_max: static neighbor capacity K.
        chunk: row-block size for distance computation.

    Returns:
        idx (B, N, K) int32, mask (B, N, K) bool, disp (B, N, K, 3),
        overflow (B,) int32 -- number of atoms whose in-range neighbor count
        exceeded K (their farthest neighbors were dropped).
    '''
    B, N = pos.shape[:2]
    k_max = min(k_max, N - 1) if N > 1 else 1
    is_periodic = jnp.any(cell != 0, axis=(-1, -2))

    n_chunks = -(-N // chunk)
    pad_n = n_chunks * chunk
    pos_p = jnp.pad(pos, ((0, 0), (0, pad_n - N), (0, 0)))
    mask_p = jnp.pad(atom_mask, ((0, 0), (0, pad_n - N)))

    def per_chunk(c):
        rows = jax.lax.dynamic_slice_in_dim(pos_p, c * chunk, chunk, axis=1)
        rmask = jax.lax.dynamic_slice_in_dim(mask_p, c * chunk, chunk, axis=1)
        disp = rows[:, :, None, :] - pos[:, None, :, :]  # (B, chunk, N, 3)
        disp = minimum_image(disp, cell, is_periodic, mic_mode=mic_mode)
        d2 = jnp.sum(disp * disp, axis=-1)
        row_ids = (jnp.arange(chunk)[None, :, None] + c * chunk)
        col_ids = jnp.arange(N)[None, None, :]
        valid = (rmask[:, :, None] & atom_mask[:, None, :]
                 & (row_ids != col_ids) & (d2 < cutoff * cutoff))
        # K nearest valid neighbors; invalid entries pushed to -inf score
        score = jnp.where(valid, -d2, -jnp.inf)
        top_score, top_idx = jax.lax.top_k(score, k_max)  # (B, chunk, K)
        kmask = jnp.isfinite(top_score)
        n_valid = jnp.sum(valid, axis=-1)  # (B, chunk)
        over = jnp.sum((n_valid > k_max) & rmask, axis=-1)  # (B,)
        return top_idx.astype(jnp.int32), kmask, over

    idx_c, mask_c, over_c = jax.lax.map(per_chunk, jnp.arange(n_chunks))
    # (n_chunks, B, chunk, K) -> (B, N, K)
    idx = jnp.moveaxis(idx_c, 0, 1).reshape(B, pad_n, k_max)[:, :N]
    kmask = jnp.moveaxis(mask_c, 0, 1).reshape(B, pad_n, k_max)[:, :N]
    overflow = jnp.sum(over_c, axis=0)

    idx = jnp.where(kmask, idx, 0)
    disp = pos[:, :, None, :] - jnp.take_along_axis(
        pos, idx.reshape(B, -1, 1), axis=1,
        mode='promise_in_bounds').reshape(B, N, k_max, 3)
    disp = _mic_edges(disp, cell, is_periodic, mic_mode)
    return idx, kmask, disp, overflow


def _mic_edges(disp, cell, is_periodic, mic_mode):
    '''minimum_image over (B, N, K, 3) edge displacements.'''
    B, N, K, _ = disp.shape
    out = minimum_image(disp.reshape(B, N * K, 1, 3), cell, is_periodic,
                        mic_mode=mic_mode)
    return out.reshape(B, N, K, 3)


def neighbor_list_rect(pos_own, pos_cand, cell, own_mask, cand_mask,
                       cutoff, k_max, self_offset=None, mic_mode='exact'):
    '''Rectangular neighbor list: own rows vs a candidate column set.

    Used by halo-exchange graph parallelism (parallel/halo.py): each shard
    searches its own atoms' neighbors among the extended candidate array
    [left halo | own | right halo] instead of the global atom set, keeping
    the search O(N_loc x N_ext).

    Args:
        pos_own: (B, N_own, 3) row atoms.
        pos_cand: (B, N_cand, 3) candidate atoms (often a superset that
            contains the own atoms at column offset `self_offset`).
        own_mask: (B, N_own) bool; cand_mask: (B, N_cand) bool.
        self_offset: if not None, candidate column (self_offset + i) is
            excluded for row i (self-edge exclusion when own atoms appear
            in the candidate set at that offset).

    Returns:
        idx (B, N_own, K) int32 into the candidate axis, mask (B, N_own, K),
        disp (B, N_own, K, 3), overflow (B,) int32.
    '''
    B, N_own = pos_own.shape[:2]
    N_cand = pos_cand.shape[1]
    k_max = min(k_max, N_cand - 1) if N_cand > 1 else 1
    is_periodic = jnp.any(cell != 0, axis=(-1, -2))

    disp = pos_own[:, :, None, :] - pos_cand[:, None, :, :]
    disp = minimum_image(disp, cell, is_periodic, mic_mode=mic_mode)
    d2 = jnp.sum(disp * disp, axis=-1)  # (B, N_own, N_cand)
    valid = (own_mask[:, :, None] & cand_mask[:, None, :]
             & (d2 < cutoff * cutoff))
    if self_offset is not None:
        row_ids = jnp.arange(N_own)[None, :, None] + self_offset
        col_ids = jnp.arange(N_cand)[None, None, :]
        valid = valid & (row_ids != col_ids)

    score = jnp.where(valid, -d2, -jnp.inf)
    top_score, top_idx = jax.lax.top_k(score, k_max)
    kmask = jnp.isfinite(top_score)
    n_valid = jnp.sum(valid, axis=-1)
    overflow = jnp.sum((n_valid > k_max) & own_mask, axis=-1)

    idx = jnp.where(kmask, top_idx.astype(jnp.int32), 0)
    disp = jnp.take_along_axis(
        disp, idx[..., None], axis=2, mode='promise_in_bounds')
    return idx, kmask, disp, overflow


def recompute_displacements(pos, cell, idx, mic_mode='exact'):
    '''disp_i - disp_j for a precomputed index list, minimum-imaged.

    Used with host-built (native cell-list) neighbor lists: the integer
    indices are non-differentiable, but recomputing displacements from pos
    inside jit keeps forces/stress exact.
    '''
    B, N, K = idx.shape
    is_periodic = jnp.any(cell != 0, axis=(-1, -2))
    pos_j = jnp.take_along_axis(
        pos, idx.reshape(B, N * K, 1), axis=1,
        mode='promise_in_bounds').reshape(B, N, K, 3)
    disp = pos[:, :, None, :] - pos_j
    return _mic_edges(disp, cell, is_periodic, mic_mode)


def recompute_displacements_kn(pos, cell, idx_kn, inv, inv_mask,
                               mic_mode='exact'):
    '''K-major displacement recompute with a scatter-free pos backward.

    disp[b, k, n] = pos[b, n] - pos[b, idx_kn[b, k, n]], minimum-imaged.
    The neighbor-position gather goes through inv_gather, so d(loss)/d(pos)
    accumulates via the scan-of-slice-gathers adjoint instead of an E-row
    scatter (requires symmetric-slotted lists; see inv_gather).
    '''
    B, K, N = idx_kn.shape
    is_periodic = jnp.any(cell != 0, axis=(-1, -2))
    pos_j = inv_gather(pos, idx_kn, inv, inv_mask)      # (B, K, N, 3)
    disp = pos[:, None, :, :] - pos_j
    out = minimum_image(disp.reshape(B, K * N, 1, 3), cell, is_periodic,
                        mic_mode=mic_mode)
    return out.reshape(B, K, N, 3)


def build_reverse_list(idx, kmask):
    '''Reverse (transpose) neighbor list for symmetric radius graphs.

    rev[b, n, k] = the slot r such that idx[b, idx[b, n, k], r] == n, i.e.
    where atom n appears in its neighbor's own list. Radius graphs are
    symmetric (|d| is), so r exists for every valid (n, k) unless k_max
    overflow dropped the reciprocal edge; such one-sided edges are masked
    out of `rev_mask` (and the overflow counter from neighbor_list already
    flags the condition).

    The reverse list turns every scatter-add in the message-passing
    backward pass into a gather (see edge_gather): grad_x[j] =
    sum_k cot[idx[j,k], rev[j,k]]. TPU scatters serialize; gathers don't.

    Returns:
        rev (B, N, K) int32, rev_mask (B, N, K) bool.
    '''
    B, N, K = idx.shape
    neighbor_rows = gather_nodes(idx, idx)       # [b,n,k,r] = idx[b, j, r]
    neighbor_valid = gather_nodes(kmask, idx)    # [b,n,k,r] = kmask[b, j, r]
    me = jnp.arange(N, dtype=idx.dtype)[None, :, None, None]
    eq = (neighbor_rows == me) & neighbor_valid
    rev = jnp.argmax(eq, axis=-1).astype(jnp.int32)
    rev_mask = jnp.any(eq, axis=-1) & kmask
    return rev, rev_mask


@jax.custom_vjp
def edge_pull(y, idx, rev, rev_mask):
    '''Transpose-permute per-edge values: out[n, k] = y[idx[n,k], rev[n,k]].

    The mapping (n, k) -> (idx[n,k], rev[n,k]) is an involution on valid
    edge slots of a symmetric graph (applying it twice is the identity), so
    the linear map is its own transpose: the VJP of edge_pull is edge_pull.
    Every derivative order therefore lowers to gathers -- never a TPU
    scatter.
    '''
    B, N, K = idx.shape
    flat_index = (idx * K + rev).reshape(B, N * K, 1)
    y_flat = y.reshape(B, N * K, -1)
    out = jnp.take_along_axis(y_flat, flat_index, axis=1,
                              mode='promise_in_bounds')
    out = out.reshape(y.shape)
    mask = rev_mask.reshape(rev_mask.shape + (1,) * (y.ndim - 3))
    return jnp.where(mask, out, 0)


def _edge_pull_fwd(y, idx, rev, rev_mask):
    return edge_pull(y, idx, rev, rev_mask), (idx, rev, rev_mask)


def _edge_pull_bwd(res, cot):
    idx, rev, rev_mask = res
    return edge_pull(cot, idx, rev, rev_mask), None, None, None


edge_pull.defvjp(_edge_pull_fwd, _edge_pull_bwd)


@jax.custom_vjp
def edge_gather(x, idx, rev, rev_mask):
    '''x[idx] with a gather-only backward (see build_reverse_list).

    Args:
        x: (B, N, ...) per-atom features.
        idx, rev, rev_mask: (B, N, K) neighbor/reverse lists.

    Returns:
        (B, N, K, ...) gathered neighbor features.
    '''
    return gather_nodes(x, idx)


def _edge_gather_fwd(x, idx, rev, rev_mask):
    return gather_nodes(x, idx), (idx, rev, rev_mask)


def _edge_gather_bwd(res, cot):
    idx, rev, rev_mask = res
    # grad_x[b, j] = sum_k cot[b, idx[b,j,k], rev[b,j,k]] -- a pull + sum,
    # both gather-only and themselves differentiable to any order.
    pulled = edge_pull(cot, idx, rev, rev_mask)
    return jnp.sum(pulled, axis=2), None, None, None


edge_gather.defvjp(_edge_gather_fwd, _edge_gather_bwd)


def symmetrize_slots(idx, kmask, k_max=None):
    '''Re-slot a symmetric neighbor list so slot assignments are shared.

    HOST-side (numpy) reference implementation; the native C++ builder
    (newtonnet_tpu/native) is the production path for MD rebuilds.

    Input idx/kmask (N, K) may be distance-sorted (top_k) lists; output
    lists contain exactly the same edge set, but each undirected edge
    (i, j) occupies the SAME slot c in both endpoint lists:

        out_idx[i, c] = j  and  out_idx[j, c] = i.

    Each slot's i -> idx[:, c] map is then an involution on its valid
    entries -- per-slot injective -- which is the property inv_gather's
    scatter-free backward needs (the inverse list is the list itself).
    Greedy coloring in descending-degree edge order needs barely more
    slots than the max degree in practice (79 vs 77 on a 4096-atom
    r_c=5 A liquid); a proper Konig coloring would need exactly max
    degree, but the greedy slack is ~2 slots.

    Args:
        idx, kmask: (N, K) or (B, N, K) numpy arrays.
        k_max: output slot capacity (defaults to input K). Raises if the
            greedy coloring needs more slots.

    Returns:
        (idx2, kmask2) with the same shape and k_max slots.
    '''
    import numpy as np
    if idx.ndim == 3:
        outs = [symmetrize_slots(idx[b], kmask[b], k_max)
                for b in range(idx.shape[0])]
        return (np.stack([o[0] for o in outs]),
                np.stack([o[1] for o in outs]))
    idx = np.asarray(idx)
    kmask = np.asarray(kmask)
    N, K = idx.shape
    k_max = k_max or K
    try:  # C++ fast path (~10 ns/edge vs ~5 us/edge for the loop below)
        from newtonnet_tpu import native
        if native.available() or native.ensure_built():
            out = native.symmetrize_slots_native(idx, kmask, k_max)
            if out is None:
                raise ValueError(
                    f'symmetrize_slots: >{k_max} shared slots needed; '
                    'raise k_max')
            return out
    except (ImportError, RuntimeError, OSError):
        pass
    rows = np.repeat(np.arange(N), K)[kmask.ravel()]
    cols = idx.ravel()[kmask.ravel()]
    lo, hi = np.minimum(rows, cols), np.maximum(rows, cols)
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    deg = np.bincount(pairs[:, 0], minlength=N) \
        + np.bincount(pairs[:, 1], minlength=N)
    order = np.argsort(-(deg[pairs[:, 0]] + deg[pairs[:, 1]]),
                       kind='stable')
    used = np.zeros((N, k_max), bool)
    idx2 = np.zeros((N, k_max), idx.dtype)
    kmask2 = np.zeros((N, k_max), bool)
    for i, j in pairs[order]:
        free = ~(used[i] | used[j])
        if not free.any():
            raise ValueError(
                f'symmetrize_slots: >{k_max} shared slots needed '
                f'(max degree {deg.max()}); raise k_max')
        c = int(np.argmax(free))
        used[i, c] = used[j, c] = True
        idx2[i, c], idx2[j, c] = j, i
        kmask2[i, c] = kmask2[j, c] = True
    return idx2, kmask2


def _konig_color(src, dst, N, cap):
    '''Koenig bipartite edge coloring of an oriented edge list.

    Every edge gets the LOWEST slot free on both its out-row (src side)
    and in-row (dst side); when none is shared, flip an alternating
    a/b-colored path starting at the in-row to free one. Terminates with
    exactly max(outdeg, indeg) slots (Koenig's theorem); picking the
    lowest shared slot front-loads colors, which the staircase compaction
    (ops/staircase.py) relies on.

    Returns (color (E,), slot_out (N, cap), slot_in (N, cap), chain_flip)
    -- slot_* map slot -> edge id (-1 = free) per row, and `chain_flip`
    is a closure over that state so post-passes (the staircase's
    dual-side Kempe compaction) can keep recoloring without rebuilding
    the occupancy tables. chain_flip(u, v, a, b) frees color a at v's
    in-row (given a free at u's out-row and b free at v's in-row) by
    swapping a/b along the maximal alternating chain from v; it returns
    False if the chain ended occupying a at u (possible only for the
    compaction's mid-palette targets, not the construction's argmax
    choice, where Koenig's theorem guarantees success).
    '''
    import numpy as np
    slot_out = np.full((N, cap), -1, np.int64)  # slot -> edge id, per out-row
    slot_in = np.full((N, cap), -1, np.int64)   # slot -> edge id, per in-row
    color = np.full(len(src), -1, np.int64)

    def chain_flip(u, v, a, b):
        # walk the maximal a/b-alternating chain from v's a-in-edge
        # (in-edge colored a, out-edge colored b, ...), then swap the
        # two colors along it
        chain = []
        node, col, side_in = v, a, True
        while True:
            e2 = int(slot_in[node][col] if side_in
                     else slot_out[node][col])
            if e2 < 0:
                break
            chain.append(e2)
            col = b if col == a else a
            if side_in:
                node = int(src[e2])
            else:
                node = int(dst[e2])
            side_in = not side_in
        def toggle():
            for e2 in chain:
                old = int(color[e2])
                slot_out[src[e2]][old] = -1
                slot_in[dst[e2]][old] = -1
            for e2 in chain:
                new = b if int(color[e2]) == a else a
                color[e2] = new
                slot_out[src[e2]][new] = e2
                slot_in[dst[e2]][new] = e2
        toggle()
        if slot_out[u][a] >= 0 or slot_in[v][a] >= 0:
            # provably unreachable when the caller removed its edge from
            # both rows first (the walk cannot end occupying a at u), but
            # if it ever fires, the per-edge a/b swap is an involution:
            # re-toggling the SAME recorded chain restores the exact
            # pre-call state, so False never leaves corruption behind
            toggle()
            return False
        return True

    for e in range(len(src)):
        u, v = int(src[e]), int(dst[e])
        free_u = slot_out[u] < 0
        free_v = slot_in[v] < 0
        both = free_u & free_v
        if both.any():
            c = int(np.argmax(both))
        else:
            a = int(np.argmax(free_u))  # free at u, taken at v
            b = int(np.argmax(free_v))  # free at v, taken at u
            if not chain_flip(u, v, a, b):
                raise AssertionError('Koenig chain flip failed')
            c = a
        color[e] = c
        slot_out[u][c] = e
        slot_in[v][c] = e
    return color, slot_out, slot_in, chain_flip


def newton3_half_list(idx, kmask, k_max=None):
    '''Orient + slot-color a symmetric neighbor list into a HALF list.

    Newton's-third-law storage: each undirected edge (i, j) is stored
    exactly once, on the row of one chosen endpoint (the "out" side). The
    message-passing layer computes every per-edge quantity once and
    aggregates it onto BOTH endpoints -- the out side by the regular
    dense sum over slots, the in side through the scatter-free
    inv_scatter_sum scan -- halving gather rows, pair-MLP FLOPs, and
    backward traffic vs the full directed list.

    Construction (host-side numpy; see native/ for the C++ MD fast path):
      1. Eulerian orientation (_euler_orientation) -- odd-degree nodes are
         paired with virtual edges and Eulerian circuits walked, so every
         node ends with out-degree and in-degree <= ceil(deg/2);
      2. Konig bipartite edge coloring of the oriented edges under the
         constraint that no two out-edges of i and no two in-edges of j
         share a slot. The in-side constraint makes every slot's
         n -> idx2[k, n] map injective on valid entries, which is exactly
         what build_inverse_list/inv_scatter_sum require. The chain-flip
         construction (Konig's theorem) uses exactly max(outdeg, indeg)
         slots, i.e. at most ceil(max_degree / 2).

    Args:
        idx, kmask: (N, K) or (B, N, K) symmetric directed neighbor list
            (both (i,j) and (j,i) present, as neighbor_list returns).
        k_max: half-list slot capacity. Defaults to the exact Konig
            optimum max(outdeg, indeg); raises if given but too small.

    Returns:
        (idx2, kmask2) of shape (N, k2) / (B, N, k2) -- the half list.
    '''
    import numpy as np
    if idx.ndim == 3:
        outs = [newton3_half_list(idx[b], kmask[b], k_max)
                for b in range(idx.shape[0])]
        k2 = max(o[0].shape[-1] for o in outs)

        def padk(a, fill):
            return np.pad(a, ((0, 0), (0, k2 - a.shape[-1])),
                          constant_values=fill)
        return (np.stack([padk(o[0], 0) for o in outs]),
                np.stack([padk(o[1], False) for o in outs]))
    idx = np.asarray(idx)
    kmask = np.asarray(kmask)
    N, K = idx.shape
    rows = np.repeat(np.arange(N), K)[kmask.ravel()]
    cols = idx.ravel()[kmask.ravel()]
    lo, hi = np.minimum(rows, cols), np.maximum(rows, cols)
    pairs = np.unique(np.stack([lo, hi], axis=1), axis=0)
    deg = np.bincount(pairs[:, 0], minlength=N) \
        + np.bincount(pairs[:, 1], minlength=N)
    src, dst = _euler_orientation(pairs, deg, N)
    out_deg = np.bincount(src, minlength=N)
    in_deg = np.bincount(dst, minlength=N)
    delta = int(max(out_deg.max(), in_deg.max(), 1))
    cap = k_max or delta
    if cap < delta:
        raise ValueError(
            f'newton3_half_list: needs {delta} slots '
            f'(max out/in degree); got k_max={cap}')
    color, _, _, _ = _konig_color(src, dst, N, cap)
    k2 = k_max or delta
    idx2 = np.zeros((N, k2), idx.dtype)
    kmask2 = np.zeros((N, k2), bool)
    idx2[src, color] = dst
    kmask2[src, color] = True
    return idx2, kmask2


def _euler_orientation(pairs, deg, N):
    '''Orient undirected edges so max out-degree <= ceil(degree / 2).

    Odd-degree vertices (always an even count) are first paired up with
    VIRTUAL edges, making every component Eulerian; walking Eulerian
    circuits then gives out-degree == in-degree == deg'/2 exactly at every
    node (deg' = deg + 1 for odd nodes). Dropping the virtual edges leaves
    out-degree and in-degree both <= ceil(deg/2). Without the
    augmentation, trails that restart at a node each add an extra
    out-edge there (a degree-5 star would orient all 5 edges outward).
    Returns (src, dst) for the m real edges only.
    '''
    import numpy as np
    m = len(pairs)
    odd = np.flatnonzero(deg % 2 == 1)
    virt = np.stack([odd[0::2], odd[1::2]], axis=1).astype(pairs.dtype) \
        if len(odd) else np.zeros((0, 2), pairs.dtype)
    allp = np.concatenate([pairs, virt]) if len(virt) else pairs
    m_all = len(allp)
    # CSR adjacency over the augmented pair list
    ends = np.concatenate([allp[:, 0], allp[:, 1]])
    eids = np.concatenate([np.arange(m_all), np.arange(m_all)])
    order = np.argsort(ends, kind='stable')
    adj_e = eids[order]
    ptr = np.zeros(N + 1, np.int64)
    np.cumsum(np.bincount(ends, minlength=N), out=ptr[1:])
    cursor = ptr[:-1].copy()
    used = np.zeros(m_all, bool)
    src = np.empty(m_all, pairs.dtype)
    dst = np.empty(m_all, pairs.dtype)

    def next_edge(u):
        c = cursor[u]
        end = ptr[u + 1]
        while c < end and used[adj_e[c]]:
            c += 1
        cursor[u] = c
        return int(adj_e[c]) if c < end else -1

    for s in range(N):
        while True:  # all degrees even: every walk is a circuit back to s
            e = next_edge(s)
            if e < 0:
                break
            u = s
            while e >= 0:
                used[e] = True
                v = int(allp[e, 1]) if int(allp[e, 0]) == u \
                    else int(allp[e, 0])
                src[e], dst[e] = u, v
                u = v
                e = next_edge(u)
    return src[:m], dst[:m]


def build_inverse_list(idx_kn, kmask_kn):
    '''Per-slot inverse neighbor lists for the K-major edge layout.

    For idx (B, K, N) with idx_kn[b, k, i] the neighbor of atom i in slot
    k, the inverse list satisfies

        idx_kn[b, k, inv[b, k, j]] == j   wherever inv_mask[b, k, j].

    EXACT ONLY when each slot's i -> idx[k, i] map is injective on valid
    entries -- true for symmetric-slotted lists (symmetrize_slots; there
    inv == idx itself), NOT for distance-sorted top_k lists, where two
    atoms routinely share the same k-th nearest neighbor and the colliding
    edge would be silently dropped here. With a qualifying list the
    backward of the per-layer neighbor gather becomes a scan of K
    small-source gathers (inv_gather below) instead of one E-row TPU
    scatter-add -- measured ~1.9x faster at N=4096, K=80 (PERF_NOTES.md).

    Returns:
        inv (B, K, N) int32 (0 where invalid), inv_mask (B, K, N) bool.
    '''
    B, K, N = idx_kn.shape
    src = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, None, :], (B, K, N))
    tgt = jnp.where(kmask_kn, idx_kn, N)  # invalid -> dropped (index N)
    binds = jnp.broadcast_to(jnp.arange(B)[:, None, None], (B, K, N))
    kinds = jnp.broadcast_to(jnp.arange(K)[None, :, None], (B, K, N))
    filled = jnp.full((B, K, N + 1), -1, jnp.int32) \
        .at[binds, kinds, tgt].max(src, mode='drop')
    inv = filled[..., :N]
    return jnp.maximum(inv, 0), inv >= 0


# ---------------------------------------------------------------------- #
# inv_gather / inv_scatter_sum: a mutually-transposed pair of LINEAR maps
# registered as first-class JAX primitives. Reverse-mode cotangents route
# through each other's transpose (never an E-row TPU scatter-add),
# forward-mode tangents ride the op itself, and explicit batching rules
# make vmap fold extra batch axes into the B axis -- so every composition
# works: grad-of-grad force training, fastgrad's reverse-over-forward,
# and jvp-based blocked Hessian lanes. (A custom_vjp formulation supports
# reverse mode only; jax.custom_transpose leaked linearize tracers
# through the scan -- see ROADMAP.md.)

def _inv_gather_impl(x, idx_kn, inv, inv_mask):
    from newtonnet_tpu.ops import pallas_gather as pg
    B, K, N = idx_kn.shape
    flat = x.reshape(B, x.shape[1], -1)
    if pg.eligible(flat, K * N):
        out = pg.row_gather(flat, idx_kn.reshape(B, K * N))
        return out.reshape((B, K, N) + x.shape[2:])
    return gather_nodes(x, idx_kn)


def _inv_scatter_impl(y, idx_kn, inv, inv_mask):
    import os as _os
    B, K, N = idx_kn.shape
    feat = y.shape[3:]
    c = int(_os.environ.get('NEWTONNET_SCATTER_CHUNK', '6'))
    c = max(1, min(c, K))
    if K % c:  # pad slot axis with masked slots
        pad = c - K % c
        y = jnp.concatenate(
            [y, jnp.zeros((B, pad, N) + feat, y.dtype)], axis=1)
        inv = jnp.concatenate(
            [inv, jnp.zeros((B, pad, N), inv.dtype)], axis=1)
        inv_mask = jnp.concatenate(
            [inv_mask, jnp.zeros((B, pad, N), inv_mask.dtype)], axis=1)
        K += pad
    kc = K // c
    # per-slot indices offset into the chunk-flattened source axis
    iv = inv + (jnp.arange(K, dtype=inv.dtype) % c)[None, :, None] * N
    # chunk on the (B, K, N) layout (merging c adjacent slots with the atom
    # axis is a free reshape there), then move the chunk axis out for scan
    yk = jnp.moveaxis(y.reshape((B, kc, c * N) + feat), 1, 0)
    ik = jnp.moveaxis(iv.reshape(B, kc, c * N), 1, 0)
    mk = jnp.moveaxis(inv_mask.reshape(B, kc, c * N), 1, 0)

    from newtonnet_tpu.ops import pallas_gather as pg
    feat_flat = 1
    for s in feat:
        feat_flat *= s
    use_pallas = pg.eligible(
        jax.ShapeDtypeStruct((B, c * N, feat_flat), y.dtype), c * N)

    def body(acc, sl):
        ys, ivc, m = sl
        flat = ys.reshape(B, c * N, -1)
        if use_pallas:
            g = pg.row_gather(flat, ivc)
        else:
            g = jnp.take_along_axis(flat, ivc[..., None], axis=1,
                                    mode='promise_in_bounds')
        g = jnp.where(m[..., None], g, 0)
        g = g.reshape((B, c, N) + feat).sum(axis=1)
        return acc + g, None

    acc0 = jnp.zeros((B, N) + feat, y.dtype)
    out, _ = jax.lax.scan(body, acc0, (yk, ik, mk))
    return out


def _register_invlist_primitives():
    from jax.extend.core import Primitive
    from jax.interpreters import ad, batching, mlir

    gather_p = Primitive('newtonnet_inv_gather')
    scatter_p = Primitive('newtonnet_inv_scatter_sum')

    def gather_abstract(x, idx_kn, inv, inv_mask):
        B, K, N = idx_kn.shape
        return jax.core.ShapedArray((B, K, N) + x.shape[2:], x.dtype)

    def scatter_abstract(y, idx_kn, inv, inv_mask):
        B, K, N = idx_kn.shape
        return jax.core.ShapedArray((B, N) + y.shape[3:], y.dtype)

    gather_p.def_abstract_eval(gather_abstract)
    scatter_p.def_abstract_eval(scatter_abstract)
    gather_p.def_impl(_inv_gather_impl)
    scatter_p.def_impl(_inv_scatter_impl)
    mlir.register_lowering(
        gather_p, mlir.lower_fun(_inv_gather_impl, multiple_results=False))
    mlir.register_lowering(
        scatter_p, mlir.lower_fun(_inv_scatter_impl, multiple_results=False))

    # linear in the first operand; the list operands are integer/boolean
    ad.defjvp(gather_p,
              lambda g, x, idx, inv, m: gather_p.bind(g, idx, inv, m),
              None, None, None)
    ad.defjvp(scatter_p,
              lambda g, y, idx, inv, m: scatter_p.bind(g, idx, inv, m),
              None, None, None)

    def gather_transpose(ct, x, idx_kn, inv, inv_mask):
        assert ad.is_undefined_primal(x)
        if type(ct) is ad.Zero:
            return [ad.Zero(x.aval), None, None, None]
        # adjoint on the masked subspace: every consumer multiplies
        # per-edge quantities by the edge mask, so masked slots carry
        # zero cotangent into this transpose
        return [scatter_p.bind(ct, idx_kn, inv, inv_mask), None, None, None]

    def scatter_transpose(ct, y, idx_kn, inv, inv_mask):
        assert ad.is_undefined_primal(y)
        if type(ct) is ad.Zero:
            return [ad.Zero(y.aval), None, None, None]
        return [gather_p.bind(ct, idx_kn, inv, inv_mask), None, None, None]

    ad.primitive_transposes[gather_p] = gather_transpose
    ad.primitive_transposes[scatter_p] = scatter_transpose

    def batch_rule(prim):
        def rule(args, dims):
            size = next(a.shape[d] for a, d in zip(args, dims)
                        if d is not None)

            def front(a, d):
                if d is None:
                    return jnp.broadcast_to(a[None], (size,) + a.shape)
                return jnp.moveaxis(a, d, 0)

            x, idx, inv, m = (front(a, d) for a, d in zip(args, dims))

            def merge(a):  # fold the vmap axis into B
                return a.reshape((size * a.shape[1],) + a.shape[2:])

            out = prim.bind(merge(x), merge(idx), merge(inv), merge(m))
            return out.reshape((size, -1) + out.shape[1:]), 0
        return rule

    batching.primitive_batchers[gather_p] = batch_rule(gather_p)
    batching.primitive_batchers[scatter_p] = batch_rule(scatter_p)
    return gather_p, scatter_p


_inv_gather_p, _inv_scatter_p = _register_invlist_primitives()


def inv_gather(x, idx_kn, inv, inv_mask):
    '''K-major neighbor gather with a scatter-free backward.

    out[b, k, n] = x[b, idx_kn[b, k, n]] -- identical values to
    gather_nodes on the transposed index list. Reverse-mode cotangents
    accumulate back onto atoms with inv_scatter_sum (a lax.scan of
    slice gathers whose sources are (c*N, F) stacks, the regime where TPU
    gathers run at full rate) instead of an E-row scatter-add; forward-
    mode tangents ride the gather itself. The two registered primitives
    are mutually transposed, so every derivative mode and order works.

    Args:
        x: (B, N, ...) node features.
        idx_kn, inv, inv_mask: (B, K, N) forward and inverse lists
            (build_inverse_list).

    Returns:
        (B, K, N, ...) gathered neighbor features.
    '''
    return _inv_gather_p.bind(x, idx_kn, inv, inv_mask)


def inv_scatter_sum(y, idx_kn, inv, inv_mask):
    '''Adjoint of inv_gather: out[b, j] = sum_{b,k,n: idx[b,k,n]=j} y[b,k,n].

    Evaluated as a scan over chunks of c slots: slot k contributes
    where(inv_mask[k], y[k, inv[k]], 0), a gather whose source is the
    (c*N, F) stack of slices y[:, k0:k0+c] -- small enough to stay
    resident, unlike the E-sized source a transpose-permutation gather
    would need. Chunking c slots per iteration amortizes the while-loop
    bookkeeping and accumulator read/write over c gathers (measured ~15%
    faster than c=1 at N=4096, K=84; NEWTONNET_SCATTER_CHUNK overrides).
    EXACT ONLY for per-slot injective lists (see build_inverse_list).
    '''
    return _inv_scatter_p.bind(y, idx_kn, inv, inv_mask)


def gather_nodes(x, idx):
    '''Gather per-atom features at neighbor indices.

    x: (B, N, ...) -> (B, R, K, ...) for idx (B, R, K). The row count R may
    differ from N (halo mode gathers own-atom rows from the halo-extended
    candidate axis).
    '''
    B, N = x.shape[:2]
    R, K = idx.shape[1], idx.shape[2]
    flat = jnp.take_along_axis(
        x.reshape(B, N, -1), idx.reshape(B, R * K, 1), axis=1,
        mode='promise_in_bounds')
    return flat.reshape((B, R, K) + x.shape[2:])
