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
