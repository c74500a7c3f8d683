'''Static-shape graph construction.

TPU-native replacement for the reference's dynamic-shape RadiusGraph
(newtonnet/layers/representations.py:46-103), which builds a per-batch
meshgrid edge list, applies the minimum-image convention (MIC), and
boolean-filters edges under the cutoff -- all dynamic shapes that XLA
cannot compile.

Here the batch is a dense padded layout:

    z:    (B, N) int32, 0 = padding (the reference's own padding_idx=0
          embedding, newtonnet/models/newtonnet.py:131, anticipates this)
    pos:  (B, N, 3)
    cell: (B, 3, 3)  (rows = lattice vectors; all-zero = non-periodic)

and the graph is the full (B, N, N) pairwise displacement tensor with a
boolean adjacency mask `adj = (|d| < r) & (i != j) & mask_i & mask_j`.
Message passing then runs as masked dense einsums on the MXU -- no scatter,
no gather, no recompilation as molecules change.

For large systems (N >~ 1k) a padded neighbor-list path with cell-list
construction lives in newtonnet_tpu/ops/nlist.py.

MIC quirk: the reference computes `d - cell @ round(solve(cell^T, d))`
(representations.py:92-93). For non-symmetric (triclinic) cells the exact
row-vector-convention MIC is `d - cell^T @ round(cell^-T d)`. We default to
the exact form ('exact') and offer 'reference' for bit-parity with the
reference on triclinic cells (identical for symmetric cells).
'''
import jax.numpy as jnp
from newtonnet_tpu.ops.linalg3 import inv3x3


def minimum_image(disp, cell, is_periodic, mic_mode='exact'):
    '''Apply the minimum-image convention per graph.

    Args:
        disp: (B, N, N, 3) raw displacement vectors pos_i - pos_j.
        cell: (B, 3, 3) lattice rows.
        is_periodic: (B,) bool, any(cell != 0) per graph.
        mic_mode: 'exact' | 'reference' (see module docstring).

    Returns:
        (B, N, N, 3) minimum-image displacements (unchanged where aperiodic).
    '''
    # Guard the solve against singular zero cells of aperiodic graphs.
    eye = jnp.eye(3, dtype=cell.dtype)
    safe_cell = jnp.where(is_periodic[:, None, None], cell, eye)
    inv_cell_t = inv3x3(jnp.swapaxes(safe_cell, -1, -2))  # (B, 3, 3)
    # fractional displacement: solve(cell^T, d)  (ref :92)
    frac = jnp.einsum('bxy,bijy->bijx', inv_cell_t, disp)
    shift = jnp.round(frac)
    if mic_mode == 'reference':
        # ref :93 uses cell (not cell^T) to map the image shift back
        corrected = disp - jnp.einsum('bxy,bijy->bijx', safe_cell, shift)
    elif mic_mode == 'exact':
        corrected = disp - jnp.einsum('byx,bijy->bijx', safe_cell, shift)
    else:
        raise ValueError(f'unknown mic_mode {mic_mode}')
    return jnp.where(is_periodic[:, None, None, None], corrected, disp)


def dense_graph(pos, cell, atom_mask, cutoff, mic_mode='exact'):
    '''Build the dense masked radius graph.

    Args:
        pos: (B, N, 3) positions (possibly strain-displaced).
        cell: (B, 3, 3) lattice rows ((possibly strain-displaced); all-zero
            rows -> aperiodic, matching the reference's
            `not (cell == 0).all()` gate at representations.py:86).
        atom_mask: (B, N) bool, True for real atoms.
        cutoff: cutoff radius r.
        mic_mode: 'exact' | 'reference'.

    Returns:
        disp: (B, N, N, 3) displacements pos_i - pos_j (entry [b, i, j]),
            minimum-imaged where periodic. Matches the reference edge
            convention: edge (i, j) displacement is pos_i - pos_j and
            aggregation is onto i (representations.py:85, newtonnet.py:214).
        adj: (B, N, N) bool adjacency: |d| < r, no self loops, both real.
    '''
    disp = pos[:, :, None, :] - pos[:, None, :, :]  # (B, N, N, 3)
    is_periodic = jnp.any(cell != 0, axis=(-1, -2))  # (B,)
    disp = minimum_image(disp, cell, is_periodic, mic_mode=mic_mode)

    n = pos.shape[1]
    not_self = ~jnp.eye(n, dtype=bool)
    pair_mask = atom_mask[:, :, None] & atom_mask[:, None, :] & not_self
    d2 = jnp.sum(disp * disp, axis=-1)
    adj = pair_mask & (d2 < cutoff * cutoff)
    return disp, adj


def dense_graph_sharded(pos, cell, atom_mask, cutoff, axis_name,
                        mic_mode='exact'):
    '''Atom-sharded dense graph: local rows vs all-gathered global columns.

    Runs inside shard_map with the atom axis partitioned over `axis_name`.
    Positions/masks of all shards are all-gathered once (they are small,
    (B, N, 3)); the O(N_loc x N) pair tensors stay local.

    Args:
        pos: (B, N_loc, 3) this shard's positions.
        atom_mask: (B, N_loc) this shard's validity.

    Returns:
        disp (B, N_loc, N, 3), adj (B, N_loc, N) -- rows local, cols global.
    '''
    import jax

    pos_all = jax.lax.all_gather(pos, axis_name, axis=1, tiled=True)
    mask_all = jax.lax.all_gather(atom_mask, axis_name, axis=1, tiled=True)
    n_loc = pos.shape[1]
    n = pos_all.shape[1]
    offset = jax.lax.axis_index(axis_name) * n_loc

    disp = pos[:, :, None, :] - pos_all[:, None, :, :]  # (B, N_loc, N, 3)
    is_periodic = jnp.any(cell != 0, axis=(-1, -2))
    disp = minimum_image(disp, cell, is_periodic, mic_mode=mic_mode)

    row_ids = offset + jnp.arange(n_loc)
    not_self = row_ids[:, None] != jnp.arange(n)[None, :]
    pair_mask = atom_mask[:, :, None] & mask_all[:, None, :] & not_self
    d2 = jnp.sum(disp * disp, axis=-1)
    adj = pair_mask & (d2 < cutoff * cutoff)
    return disp, adj
