'''NewtonNet on TPU: dense masked Newtonian message passing.

Architecture parity with the reference model (newtonnet/models/newtonnet.py)
but built TPU-first:

  * The molecular graph is the dense (B, N, N) padded adjacency from
    newtonnet_tpu/ops/neighbors.py -- every message-passing step below is a
    masked dense einsum/matmul that XLA tiles onto the MXU. There is no
    scatter/gather anywhere (the reference's hot op, torch_geometric
    `scatter` at newtonnet.py:214,226, becomes a masked sum over axis j).
  * All shapes are static; batches with different molecules simply differ
    in their masks, so there is exactly one compilation per (B, N) bucket.
  * Derivative-based outputs (forces, stress, virial, Hessian, BEC) are
    taken with jax.grad / jax.jacfwd of the pure energy function in
    newtonnet_tpu/models/output.py -- the functional analogue of the
    reference's autograd heads (newtonnet/models/output.py:61-180).

Parameter initialization matches torch defaults (nn.Linear kaiming-uniform
with a=sqrt(5) == U(+-1/sqrt(fan_in)) for both kernel and bias; nn.Embedding
N(0, 1) with the padding row zeroed) so that training dynamics are
comparable to the reference run.
'''
from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from newtonnet_tpu.layers.activations import get_activation_by_string
from newtonnet_tpu.layers.representations import (
    polynomial_cutoff,
    radial_bessel,
    scaled_norm,
)
from newtonnet_tpu.ops.neighbors import dense_graph, dense_graph_sharded
from newtonnet_tpu.ops.nlist import (
    build_reverse_list,
    edge_gather,
    gather_nodes,
    neighbor_list,
    recompute_displacements,
)


class DenseEdges(NamedTuple):
    '''Dense pair-tensor graph: j-axis is the full atom axis.'''
    dir: jnp.ndarray   # (B, N, N, 3)
    rbf: jnp.ndarray   # (B, N, N, n_basis)
    adj: jnp.ndarray   # (B, N, N) bool


class NeighborEdges(NamedTuple):
    '''Padded neighbor-list graph: j-axis is the K neighbor slots.

    rev/rev_mask are the reverse (transpose) lists from build_reverse_list;
    they make every backward pass gather-only (no TPU scatters).

    kmajor=True transposes every per-edge tensor to (B, K, N, ...): the
    sum-over-neighbors reductions then run over the outermost non-batch
    axis, whose natural TPU layout matches the gather outputs -- without it
    XLA inserts ~1 ms relayout copies per (B, N, K, 4F) tensor between the
    gathers (which produce (N*K, F) row-major) and the K reductions (which
    want K-major). Measured on the N=4096/K=80 step those copies are ~14%
    of the whole train step (PERF_NOTES.md).
    '''
    idx: jnp.ndarray   # (B, N, K) int32   [(B, K, N) if kmajor]
    mask: jnp.ndarray  # (B, N, K) bool
    dir: jnp.ndarray   # (B, N, K, 3)
    rbf: jnp.ndarray   # (B, N, K, n_basis)
    rev: jnp.ndarray   # (B, N, K) int32
    rev_mask: jnp.ndarray  # (B, N, K) bool
    kmajor: bool = False
    inv: jnp.ndarray = None        # (B, K, N) inverse lists (kmajor only)
    inv_mask: jnp.ndarray = None   # (B, K, N)
    newton3: bool = False  # idx is an oriented HALF list: each undirected
    # edge stored once; layers aggregate onto both endpoints (out side by
    # the dense slot sum, in side via inv_scatter_sum)


class StairEdgeChunk(NamedTuple):
    '''One staircase chunk (ops/staircase.py): a square K-major half-list
    block over the atom PREFIX that still needs this chunk's colors.'''
    idx: jnp.ndarray       # (B, c, n) int32
    mask: jnp.ndarray      # (B, c, n) bool
    inv: jnp.ndarray       # (B, c, n) int32
    inv_mask: jnp.ndarray  # (B, c, n) bool
    dir: jnp.ndarray       # (B, c, n, 3)
    rbf: jnp.ndarray       # (B, c, n, n_basis)


class StairEdges(NamedTuple):
    '''Staircase-compacted newton3 half list: the color axis is cut into
    chunks whose atom width follows the per-atom slot need (atoms sorted
    by need, descending), so every per-edge row op pays ~25% fewer slot
    rows than the rectangular newton3 grid (ops/staircase.py).'''
    chunks: tuple  # of StairEdgeChunk


def _torch_uniform_init(bound):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class TorchLinear(nn.Module):
    '''Dense layer with torch nn.Linear default init (see module docstring).'''
    features: int
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / fan_in ** 0.5
        kernel = self.param(
            'kernel', _torch_uniform_init(bound), (fan_in, self.features),
            self.param_dtype)
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param(
                'bias', _torch_uniform_init(bound), (self.features,),
                self.param_dtype)
            y = y + bias.astype(x.dtype)
        return y


class MLP(nn.Module):
    '''Stack of TorchLinear layers with activation between (not after).

    Mirrors the reference nn.Sequential blocks, e.g. the 2-layer message MLP
    (newtonnet.py:181-185) and 3-layer output heads (output.py:90-96).
    '''
    features: Sequence[int]
    activation: Callable
    use_bias: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            if i > 0:
                x = self.activation(x)
            x = TorchLinear(f, use_bias=self.use_bias,
                            param_dtype=self.param_dtype)(x)
        return x


class InteractionNet(nn.Module):
    '''One Newtonian message-passing layer (reference newtonnet.py:165-237).

    Dense-graph formulation: for the padded pair tensor (B, N, N, ...) with
    adjacency mask `adj`, the reference's edge gather/scatter pattern
    becomes masked elementwise products and sums over the neighbor axis j.
    Aggregation is onto node i = axis 1 (reference scatters onto
    edge_index[0], newtonnet.py:214,226).
    '''
    n_features: int
    activation: Callable
    layer_norm: bool = False
    shard_axis: str = ''  # mesh axis name for atom-sharded (graph-parallel)
    halo: int = 0  # >0: neighborlist indices point into the halo-extended
    # atom axis and per-layer communication is a boundary-block ring
    # exchange (parallel/halo.py) instead of the dense all-gather
    reverse_lists: bool = False  # gather-only backward via transpose lists
    inverse_lists: bool = False  # scatter-free backward via inverse lists
    # (K-major layout; see ops/nlist.inv_gather)
    first_layer: bool = False  # the stack's first layer sees force_node
    # identically zero (EmbeddingNet inits it to zeros, ref newtonnet.py:143),
    # so phi2's equivariant message vanishes: skip its compute (and the 3F
    # force part of the fused neighbor gather) while still creating the
    # phi2 parameters so the tree matches the reference layer-for-layer
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, atom_node, force_node, edges):
        '''
        Args:
            atom_node:  (B, N, F) invariant node features (N = local atoms
                when shard_axis is set; the j-axis is then global).
            force_node: (B, N, 3, F) equivariant node features.
            edges: DenseEdges or NeighborEdges (same parameters either way,
                so one checkpoint serves both graph layouts).

        Returns:
            updated (atom_node, force_node).

        Graph-parallel mode (shard_axis nonempty, dense edges): runs inside
        shard_map with atoms partitioned over the mesh axis; per layer, the
        neighbor-side node features are all-gathered over ICI (backward =
        reduce-scatter), everything else stays local. This is the graph
        analogue of context parallelism (SURVEY.md section 5).
        '''
        if isinstance(edges, StairEdges):
            return self._stair(atom_node, force_node, edges)
        f = self.n_features
        dense = isinstance(edges, DenseEdges)
        # jaxis = the summed-over neighbor axis of per-edge tensors:
        # 2 for (B, N, J, ...), 1 for the kmajor (B, K, N, ...) layout.
        jaxis = 1 if (not dense and edges.kmajor) else 2
        w = (edges.adj if dense else edges.mask)[..., None] \
            .astype(atom_node.dtype)

        def bcast_i(x):
            # broadcast a per-node (B, N, F) tensor across the edge axis
            return x[:, None, :, :] if jaxis == 1 else x[:, :, None, :]

        def gather_cols(x):
            # local -> global along the atom axis when graph-parallel
            if self.shard_axis:
                return jax.lax.all_gather(x, self.shard_axis, axis=1,
                                          tiled=True)
            return x

        # invariant message: W_rbf(d_ij) * phi(a)_i * phi(a)_j  (ref :209-211)
        message_nodepart = MLP([f, f], self.activation,
                               param_dtype=self.param_dtype,
                               name='message_nodepart')(atom_node)  # (B,N,F)
        message_edgepart = TorchLinear(f, use_bias=False,
                                       param_dtype=self.param_dtype,
                                       name='message_edgepart')(edges.rbf)
        # neighborlist gathers: either plain XLA gathers (backward =
        # scatter-add) or, with reverse_lists, transpose-list gathers whose
        # every derivative order is also a gather (ops/nlist.edge_gather).
        # Measured on TPU v5e the plain path is currently faster; the
        # reverse-list path exists for scatter-hostile configurations.
        if dense:
            gather_j = None
        elif self.shard_axis and self.halo > 0:
            # halo graph parallelism: neighbor indices address the
            # [left halo | own | right halo] extended axis; only the
            # boundary blocks move over ICI (parallel/halo.py)
            from newtonnet_tpu.parallel.halo import exchange_halo

            def gather_j(x):
                ext = exchange_halo(x, self.halo, self.shard_axis)
                return gather_nodes(ext, edges.idx)
        elif self.reverse_lists:
            def gather_j(x):
                return edge_gather(x, edges.idx, edges.rev, edges.rev_mask)
        elif ((self.inverse_lists or edges.newton3) and edges.kmajor
              and edges.inv is not None):
            from newtonnet_tpu.ops.nlist import inv_gather

            def gather_j(x):
                return inv_gather(x, edges.idx, edges.inv, edges.inv_mask)
        else:
            def gather_j(x):
                return gather_nodes(x, edges.idx)
        # The equivariant contractions sum over neighbors j with a 3-wide
        # free axis. Three formulations (NEWTONNET_EINSUM_IMPL):
        #   'unroll' (default): unroll the 3-wide Cartesian axis into three
        #       fused multiply-reduce ops over (B, N, J, F) tiles -- never
        #       materializes the 5D (B, N, J, 3, F) tensor, whose HBM
        #       write+read traffic dominated the step (PERF_NOTES.md).
        #   'bcast': the broadcast-multiply-then-sum 5D form.
        #   'dot': einsum/dot_general -- lowers to thousands of tiny
        #       (J, F)x(J, 3) matmuls with terrible MXU utilization.
        import os as _os
        impl = _os.environ.get('NEWTONNET_EINSUM_IMPL', 'unroll')

        if dense:
            nodepart_j = gather_cols(message_nodepart)[:, None, :, :]
            cat_j = None
        elif impl == 'unroll' and not self.first_layer:
            # TPU row gathers are overhead-bound per row (PERF_NOTES.md:
            # ~28 GB/s effective), so the layer's four neighbor gathers
            # (nodepart + three force components) are fused into ONE
            # 4F-wide gather: same row count, 4x the payload per row.
            # The backward pass correspondingly runs one fused scatter-add.
            cat = jnp.concatenate(
                [message_nodepart] + [force_node[:, :, d, :]
                                      for d in range(3)], axis=-1)
            cat_j = gather_j(cat)  # (B, N, K, 4F)
            nodepart_j = cat_j[..., :f]
        else:
            cat_j = None
            nodepart_j = gather_j(message_nodepart)
        message = (message_edgepart
                   * bcast_i(message_nodepart)
                   * nodepart_j) * w  # (B, N, J, F); J = N or K

        # invariant update: sum over neighbors j  (ref scatter at :214)
        atom_node = atom_node + jnp.sum(message, axis=jaxis)

        # equivariant message 1: phi1(m_ij) * dir_ij   (ref :218-220)
        phi1 = MLP([f, f], self.activation, use_bias=False,
                   param_dtype=self.param_dtype,
                   name='equiv_message1')(message) * w
        if impl == 'dot':
            equiv1 = jnp.einsum('bijf,bijd->bidf', phi1, edges.dir)
        elif impl == 'bcast':
            equiv1 = jnp.sum(phi1[:, :, :, None, :]
                             * edges.dir[..., None], axis=2)
        else:
            equiv1 = jnp.stack(
                [jnp.sum(phi1 * edges.dir[..., d:d + 1], axis=jaxis)
                 for d in range(3)], axis=2)

        # equivariant message 2: phi2(m_ij) * force_node_j  (ref :222-224)
        phi2_mlp = MLP([f, f], self.activation, use_bias=False,
                       param_dtype=self.param_dtype, name='equiv_message2')
        if self.first_layer:
            # force_node is identically zero here, so equiv2 == 0; apply
            # phi2 to a unit slice only to create its (identical) params
            _ = phi2_mlp(jnp.zeros((1, 1, 1, f), message.dtype))
            equiv2 = jnp.zeros_like(equiv1)
        elif dense:
            phi2 = phi2_mlp(message) * w
            force_all = gather_cols(force_node)
            if impl == 'dot':
                equiv2 = jnp.einsum('bijf,bjdf->bidf', phi2, force_all)
            elif impl == 'bcast':
                equiv2 = jnp.sum(phi2[:, :, :, None, :]
                                 * force_all[:, None], axis=2)
            else:
                equiv2 = jnp.stack(
                    [jnp.sum(phi2 * force_all[:, None, :, d, :], axis=2)
                     for d in range(3)], axis=2)
        else:
            phi2 = phi2_mlp(message) * w
            if impl == 'dot':
                force_j = gather_j(force_node)  # (B, N, K, 3, F)
                equiv2 = jnp.einsum('bnkf,bnkdf->bndf', phi2, force_j)
            elif impl == 'bcast':
                force_j = gather_j(force_node)
                equiv2 = jnp.sum(phi2[:, :, :, None, :] * force_j, axis=2)
            else:
                # force_node_j came in through the fused 4F gather above
                equiv2 = jnp.stack(
                    [jnp.sum(phi2 * cat_j[..., (d + 1) * f:(d + 2) * f],
                             axis=jaxis)
                     for d in range(3)], axis=2)

        if (not dense) and edges.newton3:
            # Newton's-third-law in-side aggregation: every per-edge
            # quantity above was computed once for the stored (out)
            # orientation; the mirrored contribution onto the neighbor j is
            #   invariant:  +message          (m_ij == m_ji: the invariant
            #                                  message is symmetric)
            #   equivariant: -phi1 * dir_ij   (dir_ji = -dir_ij)
            #                +phi2 * f_i      (the roles of i and j swap)
            # All four F-wide pieces ride ONE fused inv_scatter_sum scan
            # (the same scatter-free machinery as the backward; the slot
            # coloring of newton3_half_list guarantees its exactness).
            from newtonnet_tpu.ops.nlist import inv_scatter_sum
            if self.first_layer:
                mirror = [message] + [-phi1 * edges.dir[..., d:d + 1]
                                      for d in range(3)]
            else:
                mirror = [message]
                f_i = force_node[:, None]  # (B, 1, N, 3, F)
                for d in range(3):
                    mirror.append(phi2 * f_i[..., d, :]
                                  - phi1 * edges.dir[..., d:d + 1])
            S = inv_scatter_sum(jnp.concatenate(mirror, axis=-1),
                                edges.idx, edges.inv, edges.inv_mask)
            atom_node = atom_node + S[..., :f]
            equiv_in = jnp.stack(
                [S[..., (d + 1) * f:(d + 2) * f] for d in range(3)], axis=2)
        else:
            equiv_in = None

        # equivariant update: sum over j (inside the einsums)  (ref :226-227)
        force_node = force_node + equiv1 + equiv2
        if equiv_in is not None:
            force_node = force_node + equiv_in

        # invariant update from force norm  (ref :230-231)
        equiv_update = TorchLinear(f, use_bias=False,
                                   param_dtype=self.param_dtype,
                                   name='equiv_update')(force_node)
        atom_node = atom_node + jnp.sum(force_node * equiv_update, axis=2)

        if self.layer_norm:
            atom_node = nn.LayerNorm(epsilon=1e-5,
                                     param_dtype=self.param_dtype,
                                     name='layer_norm')(atom_node)
        return atom_node, force_node

    def _stair(self, atom_node, force_node, edges):
        '''Staircase-chunked newton3 layer (ops/staircase.py layout).

        Same physics and the same parameters as the kmajor newton3
        branch above -- one checkpoint serves both layouts -- but every
        per-edge tensor is a tuple of (B, c, n) chunks whose atom width
        n follows the per-atom slot need, so the fused 4F gathers, the
        mirror inv_scatter_sum scans, and the pair-MLP elementwise chain
        all run on ~25% fewer slot rows. Chunk sources/targets are atom
        PREFIXES (atoms sorted by need), so node-level tensors slice
        for free and per-chunk contributions accumulate with prefix
        adds. Requires first_layer handling identical to the kmajor
        path (F-wide gather, no phi2 compute).
        '''
        from newtonnet_tpu.ops.nlist import inv_gather, inv_scatter_sum
        f = self.n_features
        mn_mlp = MLP([f, f], self.activation, param_dtype=self.param_dtype,
                     name='message_nodepart')
        me_lin = TorchLinear(f, use_bias=False, param_dtype=self.param_dtype,
                             name='message_edgepart')
        phi1_mlp = MLP([f, f], self.activation, use_bias=False,
                       param_dtype=self.param_dtype, name='equiv_message1')
        phi2_mlp = MLP([f, f], self.activation, use_bias=False,
                       param_dtype=self.param_dtype, name='equiv_message2')

        message_nodepart = mn_mlp(atom_node)  # (B, N, F)
        if self.first_layer:
            # force_node is identically zero: phi2's message vanishes;
            # create its (identical) params from a unit slice and gather
            # only the F-wide invariant part
            _ = phi2_mlp(jnp.zeros((1, 1, 1, f), atom_node.dtype))
            cat = message_nodepart
        else:
            cat = jnp.concatenate(
                [message_nodepart] + [force_node[:, :, d, :]
                                      for d in range(3)], axis=-1)
        d_atom = jnp.zeros_like(atom_node)
        d_equiv = jnp.zeros_like(force_node)
        for ch in edges.chunks:
            n = ch.idx.shape[-1]
            w = ch.mask[..., None].astype(atom_node.dtype)
            cat_j = inv_gather(cat[:, :n], ch.idx, ch.inv, ch.inv_mask)
            nodepart_j = cat_j[..., :f]
            message = (me_lin(ch.rbf)
                       * message_nodepart[:, None, :n]
                       * nodepart_j) * w            # (B, c, n, F)
            d_atom = d_atom.at[:, :n].add(jnp.sum(message, axis=1))
            phi1 = phi1_mlp(message) * w
            equiv_out = jnp.stack(
                [jnp.sum(phi1 * ch.dir[..., d:d + 1], axis=1)
                 for d in range(3)], axis=2)        # (B, n, 3, F)
            if self.first_layer:
                mirror = [message] + [-phi1 * ch.dir[..., d:d + 1]
                                      for d in range(3)]
            else:
                phi2 = phi2_mlp(message) * w
                equiv_out = equiv_out + jnp.stack(
                    [jnp.sum(phi2 * cat_j[..., (d + 1) * f:(d + 2) * f],
                             axis=1)
                     for d in range(3)], axis=2)
                f_i = force_node[:, None, :n]       # (B, 1, n, 3, F)
                mirror = [message]
                for d in range(3):
                    mirror.append(phi2 * f_i[..., d, :]
                                  - phi1 * ch.dir[..., d:d + 1])
            S = inv_scatter_sum(jnp.concatenate(mirror, axis=-1),
                                ch.idx, ch.inv, ch.inv_mask)  # (B, n, 4F)
            d_atom = d_atom.at[:, :n].add(S[..., :f])
            equiv_in = jnp.stack(
                [S[..., (d + 1) * f:(d + 2) * f] for d in range(3)], axis=2)
            d_equiv = d_equiv.at[:, :n].add(equiv_out + equiv_in)
        atom_node = atom_node + d_atom
        force_node = force_node + d_equiv

        equiv_update = TorchLinear(f, use_bias=False,
                                   param_dtype=self.param_dtype,
                                   name='equiv_update')(force_node)
        atom_node = atom_node + jnp.sum(force_node * equiv_update, axis=2)
        if self.layer_norm:
            atom_node = nn.LayerNorm(epsilon=1e-5,
                                     param_dtype=self.param_dtype,
                                     name='layer_norm')(atom_node)
        return atom_node, force_node


class ScaleShift(nn.Module):
    '''Per-element (Z-indexed) trainable scale/shift (ref layers/scalers.py:33-69).

    scale/shift are (119, 1) embeddings initialized to ones/zeros; either can
    be disabled per property (ref scalers.py:5-24).
    '''
    use_scale: bool = True
    use_shift: bool = True
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, output, z):
        if self.use_scale:
            scale = self.param('scale', lambda k, s, d: jnp.ones(s, d),
                               (119, 1), self.param_dtype)
            output = output * scale[z, 0].astype(output.dtype)[..., None]
        if self.use_shift:
            shift = self.param('shift', lambda k, s, d: jnp.zeros(s, d),
                               (119, 1), self.param_dtype)
            output = output + shift[z, 0].astype(output.dtype)[..., None]
        return output


# which (scale, shift) each property's scaler carries (ref scalers.py:5-24).
# Note the reference passes numeric values (e.g. charge scale=0.1) but its
# ScaleShift constructor only checks `is not None` and always initializes the
# embeddings to ones/zeros (ref scalers.py:44-45) -- we reproduce that.
SCALER_CONFIG = {
    'energy': (True, True),
    'gradient_force': (False, False),
    'direct_force': (True, False),
    'hessian': (False, False),
    'virial': (False, False),
    'stress': (False, False),
    'charge': (True, True),
    'bec': (False, False),
}


class NewtonNetCore(nn.Module):
    '''All parametric compute: embedding -> interactions -> direct heads.

    Derivative heads wrap around this module functionally (see
    newtonnet_tpu/models/output.py). `__call__(z, pos, cell)` expects the
    *strain-displaced* pos/cell (the displacement trick itself lives in the
    caller, mirroring EmbeddingNet at reference newtonnet.py:146-155).
    '''
    cutoff: float = 5.0
    n_features: int = 128
    n_basis: int = 20
    n_interactions: int = 3
    activation: str = 'swish'
    layer_norm: bool = False
    output_properties: Sequence[str] = ()
    mic_mode: str = 'exact'
    graph_mode: str = 'dense'  # 'dense' (molecules) | 'neighborlist' (large)
    k_max: int = 48            # neighbor capacity in neighborlist mode
    cell_grid: tuple = ()      # static (nx, ny, nz): use the O(N) in-jit
    # cell-grid build (ops/cellgrid.py) instead of the O(N^2) one; pick
    # with cellgrid.suggest_grid/suggest_capacity on the host
    cell_capacity: int = 0     # static per-cell atom capacity for cell_grid
    shard_axis: str = ''       # mesh axis for atom-sharded graph parallelism
    halo: int = 0              # boundary block size for halo exchange
    # (neighborlist + shard_axis; atoms must be spatially sorted --
    # parallel/halo.py)
    reverse_lists: bool = False  # scatter-free backward (see InteractionNet)
    inverse_lists: bool = False  # scatter-free backward via K-major inverse
    # lists (ops/nlist.inv_gather); pays when the lists amortize over MD
    # skin rebuilds or the several scatters of a multi-layer train step
    newton3: bool = False      # Newton's-third-law half lists: nlist is an
    # oriented, slot-colored HALF edge list (ops/nlist.newton3_half_list);
    # each undirected edge is computed once and aggregated onto both
    # endpoints -- ~2x fewer gather rows and pair-MLP FLOPs. Implies the
    # K-major layout and requires a precomputed half nlist 4-tuple; without
    # one (e.g. during init) the model falls back to the plain full list
    newton3_compact: bool = False  # staircase-compacted newton3 half lists
    # (ops/staircase.py): the color axis is chunked and each chunk only
    # carries the atom prefix that needs it (~25% fewer slot rows). nlist
    # is the tuple of per-chunk 4-tuples from staircase.stair_nlist and
    # the frame must be permuted by StairList.perm (atoms sorted by slot
    # need). B=1, no sharding -- the large-N train-step formulation
    compute_dtype: str = ''    # '' = input dtype; 'bfloat16' = mixed
    # precision: bf16 interaction stack (the HBM-bound pair tensors at half
    # traffic), fp32 graph build, heads and aggregation
    trainable_basis: bool = False  # train the Bessel frequencies (init at
    # the reference's fixed k*pi grid, ref representations.py:220 freezes
    # them with requires_grad=False; some NewtonNet variants train them)
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z, pos, cell, nlist=None):
        '''
        Args:
            z: (B, N) atomic numbers, 0 = padding.
            pos: (B, N, 3) (possibly strain-displaced) positions.
            cell: (B, 3, 3) (possibly strain-displaced) lattice rows.
            nlist: optional (idx (B, N, K), mask (B, N, K)) precomputed
                neighbor indices (e.g. from the native cell-list search,
                newtonnet_tpu/native); displacements are recomputed from
                pos in-jit so derivatives stay exact. Requires
                graph_mode='neighborlist'.

        Returns:
            dict with atom_node (B,N,F), force_node (B,N,3,F) and, per
            configured direct property, its scaled per-atom output.
        '''
        act = get_activation_by_string(self.activation)
        atom_mask = z > 0
        fmask = atom_mask.astype(pos.dtype)[..., None]

        # node embedding: torch nn.Embedding(119, F) N(0,1), row 0 zeroed
        # (ref newtonnet.py:131)
        def embed_init(key, shape, dtype):
            w = jax.random.normal(key, shape, dtype)
            return w.at[0].set(0.0)
        embedding = self.param('node_embedding', embed_init,
                               (119, self.n_features), self.param_dtype)
        atom_node = embedding[z].astype(pos.dtype) * fmask  # (B, N, F)
        force_node = jnp.zeros(z.shape + (3, self.n_features), pos.dtype)

        bessel_freq = None
        if self.trainable_basis:
            bessel_freq = self.param(
                'bessel_frequencies',
                lambda k, s, d: jnp.arange(1, s[0] + 1, dtype=d) * jnp.pi,
                (self.n_basis,), self.param_dtype)

        # edge embedding (ref EmbeddingNet:159 -> representations.py:20-43)
        if self.graph_mode == 'dense':
            if self.shard_axis:
                disp, adj = dense_graph_sharded(
                    pos, cell, atom_mask, self.cutoff, self.shard_axis,
                    mic_mode=self.mic_mode)
            else:
                disp, adj = dense_graph(pos, cell, atom_mask, self.cutoff,
                                        mic_mode=self.mic_mode)
            dist, dir_edge = scaled_norm(disp, self.cutoff)
            rbf = polynomial_cutoff(dist) * radial_bessel(
                dist, self.n_basis, frequencies=bessel_freq)
            edges = DenseEdges(dir=dir_edge, rbf=rbf, adj=adj)
        elif self.graph_mode == 'neighborlist' and self.newton3_compact:
            if self.shard_axis or self.reverse_lists or self.inverse_lists \
                    or self.newton3:
                raise ValueError(
                    'newton3_compact is its own edge layout: no sharding, '
                    'reverse_lists, inverse_lists, or newton3')
            if nlist is None:
                if not self.is_initializing():
                    raise ValueError(
                        'newton3_compact models need a precomputed '
                        'staircase chunk tuple -- build it with '
                        'ops/staircase.staircase_half_list and pass '
                        'stair_nlist(sl) with the frame permuted by '
                        'sl.perm')
                # init only traces shapes: a minimal stub chunk creates
                # the same parameters the real layout uses
                B, N = z.shape
                n0 = min(8, N)
                stub_i = jnp.zeros((B, 1, n0), jnp.int32)
                stub_m = jnp.zeros((B, 1, n0), bool)
                nlist = ((stub_i, stub_m, stub_i, stub_m),)
            from newtonnet_tpu.ops.nlist import recompute_displacements_kn
            chunks = []
            for (cidx, cmask, cinv, cinvm) in nlist:
                n = cidx.shape[-1]
                disp = recompute_displacements_kn(
                    pos[:, :n], cell, cidx, cinv, cinvm,
                    mic_mode=self.mic_mode)
                # stale-pair tightening, as in the newton3 path below: a
                # stale edge's cotangent is already zero, so inv stays valid
                d2 = jnp.sum(disp * disp, axis=-1)
                cmask = cmask & (d2 < self.cutoff * self.cutoff)
                dist, dir_c = scaled_norm(disp, self.cutoff)
                rbf_c = polynomial_cutoff(dist) * radial_bessel(
                    dist, self.n_basis, frequencies=bessel_freq)
                chunks.append(StairEdgeChunk(
                    idx=cidx, mask=cmask, inv=cinv, inv_mask=cinvm,
                    dir=dir_c, rbf=rbf_c))
            edges = StairEdges(chunks=tuple(chunks))
        elif self.graph_mode == 'neighborlist':
            pre_rev = pre_inv = None
            if self.shard_axis and self.halo > 0:
                # halo graph parallelism: candidates = own slab plus the
                # ring neighbors' boundary blocks; indices address the
                # extended axis (self-edges excluded at offset halo)
                from newtonnet_tpu.ops.nlist import neighbor_list_rect
                from newtonnet_tpu.parallel.halo import exchange_halo
                pos_ext = exchange_halo(pos, self.halo, self.shard_axis)
                mask_ext = exchange_halo(atom_mask, self.halo,
                                         self.shard_axis)
                if self.reverse_lists:
                    raise ValueError(
                        'reverse_lists is incompatible with halo sharding '
                        '(transpose lists would span shard boundaries)')
                idx, kmask, disp, _ = neighbor_list_rect(
                    pos, pos_ext, cell, atom_mask, mask_ext, self.cutoff,
                    self.k_max, self_offset=self.halo,
                    mic_mode=self.mic_mode)
            elif nlist is not None:
                # (idx, mask) or, with reverse_lists/inverse_lists, the
                # 4-tuple that also carries the precomputed transpose or
                # inverse lists (amortized at rebuild time instead of
                # rebuilt every step). Precomputed inverse lists are in the
                # K-major (B, K, N) orientation of build_inverse_list.
                pre_rev = pre_inv = None
                if len(nlist) == 4 and (self.inverse_lists or self.newton3):
                    idx, kmask, *pre_inv = nlist
                elif len(nlist) == 4:
                    idx, kmask, *pre_rev = nlist
                else:
                    idx, kmask = nlist
                if pre_inv is not None:
                    # go K-major immediately: displacements recomputed in
                    # (B, K, N) orientation with the scatter-free pos
                    # backward (ops/nlist.recompute_displacements_kn)
                    from newtonnet_tpu.ops.nlist import \
                        recompute_displacements_kn
                    idx = jnp.swapaxes(idx, 1, 2)
                    kmask = jnp.swapaxes(kmask, 1, 2)
                    disp = recompute_displacements_kn(
                        pos, cell, idx, *pre_inv, mic_mode=self.mic_mode)
                else:
                    disp = recompute_displacements(pos, cell, idx,
                                                   mic_mode=self.mic_mode)
                # hard-mask any stale pair beyond the cutoff (atoms may have
                # moved since the host built the list; a skin margin on the
                # host side keeps this conservative)
                d2 = jnp.sum(disp * disp, axis=-1)
                kmask = kmask & (d2 < self.cutoff * self.cutoff)
            elif self.cell_grid:
                from newtonnet_tpu.ops.cellgrid import cell_grid_neighbor_list
                idx, kmask, disp, _ = cell_grid_neighbor_list(
                    pos, cell, atom_mask, self.cutoff, self.k_max,
                    self.cell_grid, self.cell_capacity,
                    mic_mode=self.mic_mode)
            else:
                idx, kmask, disp, _ = neighbor_list(
                    pos, cell, atom_mask, self.cutoff, self.k_max,
                    mic_mode=self.mic_mode)
            dist, dir_edge = scaled_norm(disp, self.cutoff)
            rbf = polynomial_cutoff(dist) * radial_bessel(
                dist, self.n_basis, frequencies=bessel_freq)
            if self.reverse_lists:
                # stale-pair tightening of kmask (above) does not require
                # re-deriving rev/rev_mask: a stale edge's cotangent is
                # already zero (the layer multiplies by the mask), so
                # pulling it is harmless
                rev, rev_mask = (pre_rev if pre_rev
                                 else build_reverse_list(idx, kmask))
            else:
                rev, rev_mask = idx, kmask  # unused placeholders
            import os as _os
            kn = (_os.environ.get('NEWTONNET_EDGE_LAYOUT', 'kn') == 'kn'
                  and not self.shard_axis and not self.reverse_lists
                  and _os.environ.get('NEWTONNET_EINSUM_IMPL', 'unroll')
                  == 'unroll')
            if (self.inverse_lists or self.newton3) and not kn:
                raise ValueError(
                    'inverse_lists/newton3 require the K-major edge layout '
                    '(no sharding/reverse_lists, NEWTONNET_EDGE_LAYOUT=kn, '
                    'NEWTONNET_EINSUM_IMPL=unroll)')
            if kn and pre_inv is None:  # pre_inv path is already K-major
                idx = jnp.swapaxes(idx, 1, 2)
                kmask = jnp.swapaxes(kmask, 1, 2)
                dir_edge = jnp.swapaxes(dir_edge, 1, 2)
                rbf = jnp.swapaxes(rbf, 1, 2)
            inv = inv_mask = None
            if self.inverse_lists or self.newton3:
                # Exactness requires per-slot injectivity (no two atoms
                # sharing a neighbor at the same slot), which top_k slotting
                # does NOT give -- only symmetric-slotted host-built lists
                # (ops/nlist.symmetrize_slots / the native builder) qualify,
                # so precomputed lists are mandatory here. Stale-pair
                # tightening of kmask does not require rebuilding inv: a
                # stale edge's cotangent is already zero, so pulling it in
                # the backward adds zero.
                # Without precomputed lists the inverse_lists layer falls
                # back to the plain scatter backward (in-jit top_k lists
                # are not per-slot injective, so deriving inv from them
                # would drop edges) -- correct, just slower. newton3 has
                # no such fallback: its k_max is a HALF-list capacity, so
                # an in-jit full-list build at that k_max silently drops
                # edges. Refuse it outside init (init only traces shapes).
                if (self.newton3 and pre_inv is None
                        and not self.is_initializing()):
                    raise ValueError(
                        'newton3 models need a precomputed half-list '
                        '4-tuple (idx, mask, inv, inv_mask) -- build it '
                        'with ops/nlist.newton3_half_list or '
                        'native.newton3_half_list_native + '
                        'build_inverse_list (the MD driver does this '
                        'automatically with nlist_every > 1)')
                if pre_inv is not None:
                    inv, inv_mask = pre_inv
            edges = NeighborEdges(idx=idx, mask=kmask, dir=dir_edge, rbf=rbf,
                                  rev=rev, rev_mask=rev_mask, kmajor=kn,
                                  inv=inv, inv_mask=inv_mask,
                                  newton3=self.newton3 and pre_inv is not None)
        else:
            raise ValueError(f'unknown graph_mode {self.graph_mode}')

        # message passing stack (ref newtonnet.py:93-94)
        import os as _os
        remat = _os.environ.get('NEWTONNET_REMAT', '0') == '1'
        if self.compute_dtype:
            cd = jnp.dtype(self.compute_dtype)
            atom_node = atom_node.astype(cd)
            force_node = force_node.astype(cd)
            if isinstance(edges, StairEdges):
                edges = StairEdges(chunks=tuple(
                    c._replace(dir=c.dir.astype(cd), rbf=c.rbf.astype(cd))
                    for c in edges.chunks))
            else:
                edges = edges._replace(dir=edges.dir.astype(cd),
                                       rbf=edges.rbf.astype(cd))
        for i in range(self.n_interactions):
            # static_argnums: `edges` (arg 2 after self) carries static
            # Python bools (kmajor/newton3) alongside arrays
            layer_cls = (nn.remat(InteractionNet, static_argnums=(3,))
                         if remat else InteractionNet)
            atom_node, force_node = layer_cls(
                n_features=self.n_features, activation=act,
                layer_norm=self.layer_norm, shard_axis=self.shard_axis,
                halo=self.halo, reverse_lists=self.reverse_lists,
                inverse_lists=self.inverse_lists, first_layer=(i == 0),
                param_dtype=self.param_dtype,
                name=f'interaction_{i}')(atom_node, force_node, edges)
        if self.compute_dtype:
            atom_node = atom_node.astype(pos.dtype)
            force_node = force_node.astype(pos.dtype)

        outputs = {'atom_node': atom_node, 'force_node': force_node}

        # direct (parametric) heads + their scalers
        for key in self.output_properties:
            if key == 'energy':
                # 3-layer MLP F->F->F->1 (ref output.py:90-100)
                e = MLP([self.n_features, self.n_features, 1], act,
                        param_dtype=self.param_dtype, name='energy_head')(
                            atom_node)  # (B, N, 1)
                e = self._scale(key, e, z)
                outputs['atomic_energy'] = e * fmask
            elif key == 'charge':
                # 3-layer MLP F->F->F->1 (ref output.py:192-202)
                q = MLP([self.n_features, self.n_features, 1], act,
                        param_dtype=self.param_dtype, name='charge_head')(
                            atom_node)
                q = self._scale(key, q, z)
                outputs['charge'] = (q * fmask)[..., 0]  # (B, N)
            elif key == 'direct_force':
                # MLP(a) . force_node summed over F (ref output.py:121-132)
                w = MLP([self.n_features] * 3, act,
                        param_dtype=self.param_dtype, name='direct_force_head')(
                            atom_node)  # (B, N, F)
                force = jnp.sum(w[:, :, None, :] * force_node, axis=-1)
                force = self._scale(key, force, z)
                outputs['direct_force'] = force * fmask  # (B, N, 3)
            # derivative properties have no parameters here

        return outputs

    def _scale(self, key, output, z):
        use_scale, use_shift = SCALER_CONFIG[key]
        if not (use_scale or use_shift):
            return output
        return ScaleShift(use_scale=use_scale, use_shift=use_shift,
                          param_dtype=self.param_dtype,
                          name=f'scaler_{key}')(output, z)
