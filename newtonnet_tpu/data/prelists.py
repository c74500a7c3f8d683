'''Precomputed per-frame neighbor lists for training datasets.

Training frames are static geometry: each frame's neighbor list never
changes across epochs, so building it once at data-loading time and
feeding it through the batch removes the per-step in-jit O(N^2) (or
cell-grid) graph build entirely -- the analogue of the MD driver's
amortized skin rebuilds, amortized over the whole run instead.

It also unlocks the fast list formats for the training step, which the
in-jit build cannot produce (they need host-side slot colorings):

  * mode='inverse': symmetric-slotted lists -> scatter-free backward
    (ops/nlist.inv_gather);
  * mode='newton3': Newton's-third-law half lists -> each undirected edge
    computed ONCE per layer (ops/nlist.newton3_half_list) -- the fastest
    large-N formulation (PERF_NOTES.md).

The model recomputes displacements from pos in-jit (models/newtonnet.py
apply docstring), so derivatives through positions stay exact; only the
integer index structure is precomputed.

Reference context: the reference rebuilds its dynamic-shape radius graph
inside every forward (newtonnet/layers/representations.py:70-98) because
torch autograd needs the graph in-graph; with JAX the displacement
recompute achieves the same differentiability from a fixed index set.
'''
import numpy as np

_jit_nl = None


def _jit_neighbor_list(pos, cell, active, cutoff, k, mic_mode):
    # module-level jitted builder: a fresh lambda per frame would defeat
    # the jit cache and recompile for every frame of the dataset
    global _jit_nl
    if _jit_nl is None:
        import functools

        import jax

        from newtonnet_tpu.ops.nlist import neighbor_list

        @functools.partial(jax.jit,
                           static_argnames=('cutoff', 'k', 'mic_mode'))
        def fn(pos, cell, active, cutoff, k, mic_mode):
            idx, mask, _, ovf = neighbor_list(pos, cell, active, cutoff, k,
                                              mic_mode=mic_mode)
            return idx, mask, ovf
        _jit_nl = fn
    return _jit_nl(pos, cell, active, cutoff, k, mic_mode)


def frame_neighbor_lists(z, pos, cell, cutoff, k_max, mode='plain',
                         mic_mode='exact'):
    '''Build one frame's padded neighbor list on the host.

    Args:
        z: (N,) atomic numbers (0 = padding; padding rows get no edges).
        pos: (N, 3) positions.
        cell: (3, 3) lattice rows or zeros for aperiodic.
        cutoff: neighbor radius.
        k_max: slot capacity of the RETURNED list -- the full-list
            capacity for 'plain'/'inverse', the half-list capacity
            (>= ceil(max_degree/2), Konig bound) for 'newton3'.
        mode: 'plain' | 'inverse' (symmetric-slotted) | 'newton3'.

    Returns:
        idx (N, k_max) int32, mask (N, k_max) bool.
    '''
    from newtonnet_tpu import native
    z = np.asarray(z)
    pos = np.asarray(pos, np.float64)
    cell = np.asarray(cell, np.float64)
    n = len(z)
    n_real = int((z > 0).sum())
    if (z[:n_real] <= 0).any():
        raise ValueError('padding atoms (z == 0) must sit at the end')
    build_k = 2 * k_max + 8 if mode == 'newton3' else k_max
    if native.available() or native.ensure_built():
        idx_r, count, ovf = native.cell_list_neighbors(
            pos[:n_real], cell if cell.any() else None, cutoff, build_k)
        if ovf:
            raise ValueError(f'neighbor overflow ({ovf} atoms exceed '
                             f'k={build_k}); raise k_max')
        idx = np.zeros((n, build_k), np.int32)
        mask = np.zeros((n, build_k), bool)
        idx[:n_real] = idx_r
        mask[:n_real] = np.arange(build_k)[None, :] < count[:, None]
    else:
        import jax.numpy as jnp
        idx_d, mask_d, ovf = _jit_neighbor_list(
            jnp.asarray(pos[None]), jnp.asarray(cell[None]),
            jnp.asarray((z > 0)[None]), cutoff, build_k, mic_mode)
        if int(np.asarray(ovf).sum()):
            raise ValueError('neighbor overflow; raise k_max')
        idx, mask = np.asarray(idx_d[0]), np.asarray(mask_d[0])
    if mode == 'plain':
        return idx.astype(np.int32), mask
    if mode == 'inverse':
        # symmetrize_slots dispatches to the native builder internally
        from newtonnet_tpu.ops.nlist import symmetrize_slots
        idx2, m2 = symmetrize_slots(idx, mask, k_max=k_max)
        return idx2.astype(np.int32), m2
    if mode == 'newton3':
        if native.available():
            out = native.newton3_half_list_native(idx, mask, k_out=k_max)
            if out is None:
                raise ValueError(
                    f'newton3 half list needs > k_max={k_max} slots')
            return out[0].astype(np.int32), out[1]
        from newtonnet_tpu.ops.nlist import newton3_half_list
        idx2, m2 = newton3_half_list(idx, mask, k_max=k_max)
        return idx2.astype(np.int32), m2
    raise ValueError(f'unknown mode {mode}')


class NeighborListDataset:
    '''Dataset wrapper adding cached precomputed neighbor lists.

    Wraps any Molecular*Dataset (or Subset): samples gain 'nlist_idx' and
    'nlist_mask' keys that collate pads and the Trainer feeds to the model
    as its nlist argument. Lists are built lazily on first access and
    cached in memory (int32 + bool: ~(k_max*5)/atom bytes).

    Match the constructor arguments to the model: same cutoff, same k_max,
    and mode 'newton3'/'inverse'/'newton3c' only for models built with the
    matching flag.

    mode='newton3c' (staircase-compacted half lists, ops/staircase.py,
    for newton3_compact models): samples gain 'nlist_stair' -- a tuple of
    per-chunk (idx, mask, inv, inv_mask) -- and the frame's per-atom
    arrays (z, pos, force, charge) are PERMUTED to the staircase's
    need-sorted order; the training loss is permutation-covariant so
    training is unchanged, but per-atom predictions come back in sorted
    order. The first built frame fixes the static shape plan (widths +
    `stair_margin` spare rows per chunk); a later frame that does not fit
    raises with instructions rather than recompiling or overflowing.
    '''

    def __init__(self, dataset, cutoff, k_max, mode='plain',
                 mic_mode='exact', stair_chunk=4, stair_pad=8,
                 stair_margin=16, stair_extra_colors=None):
        self.dataset = dataset
        self.cutoff = cutoff
        self.k_max = k_max
        self.mode = mode
        self.mic_mode = mic_mode
        self.stair_chunk = stair_chunk
        self.stair_pad = stair_pad
        self.stair_margin = stair_margin
        # color headroom in the shared plan: a denser frame later in the
        # dataset may need a few more colors than frame 0 (default: one
        # spare chunk; 0 disables)
        self.stair_extra_colors = (stair_chunk if stair_extra_colors is None
                                   else stair_extra_colors)
        self._stair_plan = None
        self._cache = {}
        # pass through attributes loaders read (max_atoms, precision, ...)
        for attr in ('max_atoms', 'precision', 'frame_sizes'):
            if hasattr(dataset, attr):
                setattr(self, attr, getattr(dataset, attr))

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        s = dict(self.dataset[i])
        if self.mode == 'newton3c':
            if i not in self._cache:
                self._cache[i] = self._build_stair(s)
            sl = self._cache[i]
            perm = sl.perm
            for key in ('z', 'pos', 'force', 'charge'):
                v = s.get(key)
                if v is not None and np.ndim(v) >= 1 \
                        and len(v) == len(perm):
                    s[key] = np.asarray(v)[perm]
            s['nlist_stair'] = tuple(
                tuple(a[0] for a in ch) for ch in sl.chunks)
            return s
        if i not in self._cache:
            self._cache[i] = frame_neighbor_lists(
                s['z'], s['pos'], s['cell'], self.cutoff, self.k_max,
                mode=self.mode, mic_mode=self.mic_mode)
        s['nlist_idx'], s['nlist_mask'] = self._cache[i]
        return s

    def _build_stair(self, s):
        from newtonnet_tpu.ops.staircase import (staircase_chunks,
                                                 staircase_colors)
        idx, mask = frame_neighbor_lists(
            s['z'], s['pos'], s['cell'], self.cutoff, 2 * self.k_max + 8,
            mode='plain', mic_mode=self.mic_mode)
        try:
            colored = staircase_colors(idx, mask, plan=self._stair_plan)
            if self._stair_plan is None:
                # fix the static shape plan: this frame's widths plus
                # spare rows so homogeneous datasets' frame-to-frame
                # wobble fits without recompiling
                pad = self.stair_pad
                m = -(-(self.stair_margin) // pad) * pad
                first = staircase_chunks(colored, chunk=self.stair_chunk,
                                         pad=pad)
                nmax = int(getattr(self, 'max_atoms', None) or len(s['z']))

                def width(n):
                    return min(n + m, nmax)
                plan = [(c, width(n)) for c, n in first.widths]
                extra = self.stair_extra_colors
                if extra:
                    plan.append((extra, width(first.widths[-1][1])))
                self._stair_plan = tuple(plan)
            return staircase_chunks(colored, chunk=self.stair_chunk,
                                    pad=self.stair_pad,
                                    plan=self._stair_plan)
        except ValueError as e:
            raise ValueError(
                f'{e} -- a frame exceeded the staircase shape plan fixed '
                'by the first frame; raise stair_margin (or rebuild the '
                'dataset wrapper so a representative frame comes first)'
            ) from None
