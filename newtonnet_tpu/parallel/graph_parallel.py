'''Graph (atom-partitioned) parallelism: the context-parallel analogue for
molecular graphs (SURVEY.md sections 2.3/5).

Atoms are sharded over the mesh's 'graph' axis inside shard_map; per
message-passing layer the neighbor-side features are all-gathered over ICI
(InteractionNet.shard_axis) and the O(N_loc x N) pair tensors stay local.
Energies are psum-reduced; forces come from jax.grad *inside* the SPMD
program, where the all-gather transposes to reduce-scatter automatically --
no hand-written halo bookkeeping, exact to the single-device result.

Combines with the 'data' axis for DP x GP meshes: batch sharded over
'data', atoms over 'graph'.

STATUS: the small-molecule (dense-graph) fallback. For every large-system
use case the blueprint targets, parallel/halo.py supersedes this path --
it moves only boundary blocks (O(n_halo)) per layer instead of
all-gathering the full atom axis (O(N)), supports training/MD/stress/
charge heads, and is what the Trainer's halo mode and the CLI use. Keep
this module for dense-mode models whose atoms cannot be spatially sorted
(inference only, memory-bound single molecules too big for one chip).
'''


import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def pad_atoms_to_multiple(z, pos, multiple):
    '''Pad the atom axis so it divides the graph-axis size.'''
    n = z.shape[1]
    pad = (-n) % multiple
    if pad:
        z = jnp.pad(z, ((0, 0), (0, pad)))
        pos = jnp.pad(pos, ((0, 0), (0, pad), (0, 0)))
    return z, pos


def make_sharded_energy_force_fn(model, mesh, data_axis='data',
                                 graph_axis='graph'):
    '''Build a jitted (params, z, pos, cell) -> (energy, forces) function
    with batch sharded over `data_axis` and atoms over `graph_axis`.

    Only energy + gradient forces (the large-system MD path); other heads
    stay on the single-shard paths.
    '''
    if model.graph_mode != 'dense':
        raise NotImplementedError(
            'graph parallelism currently shards the dense pair tensor')
    core = model.core.clone(shard_axis=graph_axis)

    def local_fn(params, z, pos, cell):
        atom_mask = z > 0

        def local_energy(pos):
            out = core.apply(params, z, pos, cell)
            e_local = jnp.sum(out['atomic_energy'][..., 0]
                              * atom_mask.astype(pos.dtype), axis=-1)
            # Differentiate the LOCAL energy sum only: every shard seeds its
            # own e_local, and the all-gather inside the interactions
            # transposes to a reduce-scatter that accumulates the
            # cross-shard dE_k/dpos_mine terms. (Seeding the psum-reduced
            # total instead would double-count under the legacy psum
            # transpose used when replication checking is off.)
            return jnp.sum(e_local), e_local

        (_, e_local), pos_grad = jax.value_and_grad(
            local_energy, has_aux=True)(pos)
        energy = jax.lax.psum(e_local, graph_axis)  # (B_loc,) per-graph
        return energy, -pos_grad

    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(data_axis, graph_axis),
                  P(data_axis, graph_axis, None), P(data_axis)),
        out_specs=(P(data_axis), P(data_axis, graph_axis, None)),
        check_vma=False)
    return jax.jit(sharded)
