'''Multi-chip molecular dynamics via halo-exchange graph parallelism.

The reference's MD is strictly single-device (one ASE Calculator driving one
torch forward, newtonnet/utils/ase_interface.py:52-81); systems beyond one
chip's memory or compute are unreachable there. This driver integrates a
single large system with its atoms spatially partitioned across the mesh's
'graph' axis (parallel/halo.py): each chip owns a contiguous slab of the
x-sorted atom order, forces are computed with boundary-only ppermute halo
exchange, and the integrator update is purely local (positions, velocities
and forces never leave their shard inside a chunk).

Atoms move, so the slab decomposition goes stale: the driver advances the
trajectory in chunks of `resort_every` steps, and between chunks re-sorts
and re-partitions the atoms on the host (SURVEY.md section 7 names "halo
exchange correctness under resorting of atoms between MD steps" as a hard
part). Validity is enforced, never assumed:

  * at every re-sort, `check_halo_capacity` verifies with a widened width
    (cutoff + skin) that each shard's halo blocks cover every atom that
    could become a cross-boundary neighbor during the chunk; violations
    raise (a missed edge would silently corrupt forces);
  * on device, the chunk tracks the max atom displacement since the sort;
    a chunk where any atom moved more than skin/2 is counted and reported
    (the capacity margin no longer provably covers it).

The in-model neighbor list is rebuilt every step from current positions
(ops/nlist.neighbor_list_rect over the halo-extended axis), so unlike the
single-device amortized path (md/driver.py) there is no stale-list force
error -- only the partition ages, and that is what the checks above guard.

Forces are exact across shard boundaries: each shard differentiates only
its LOCAL energy sum, and the halo ppermutes transpose to reverse
ppermutes that deliver dE_other/dpos_mine automatically (same mechanism as
parallel/halo.make_halo_energy_force_fn).
'''
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from newtonnet_tpu.data.units import kB
from newtonnet_tpu.md.driver import _langevin_coeffs
from newtonnet_tpu.parallel.halo import (_halo_core, check_halo_capacity,
                                         spatial_sort)

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def _make_chunk_fn(core, mesh, integrator, graph_axis, data_axis='data'):
    '''Compile one re-sort chunk: `resort_every` integrator steps under a
    single lax.scan inside shard_map. Returns
    (pos, vel, epots, ekins, maxdisp2) with per-step observables.'''

    def local_chunk(params, z, pos, vel, masses, cell, keys, scalars):
        # scalars: (dt, kB_T, friction) -- traced so retuning the
        # thermostat does not retrace
        dt, temp, friction = scalars
        atom_mask = (z > 0).astype(pos.dtype)[..., None]   # (B, N_loc, 1)
        masses_c = masses[..., None]

        def energy_forces(pos):
            def local_energy(pos):
                out = core.apply(params, z, pos, cell)
                e_local = jnp.sum(out['atomic_energy'][..., 0]
                                  * atom_mask[..., 0], axis=-1)  # (B,)
                # grad of the LOCAL sum: halo ppermutes transpose to
                # reverse ppermutes carrying cross-shard force terms
                return jnp.sum(e_local), e_local

            (_, e_local), g = jax.value_and_grad(
                local_energy, has_aux=True)(pos)
            return jax.lax.psum(e_local, graph_axis), -g

        def observables(vel):
            ek_local = 0.5 * jnp.sum(masses_c * vel * vel * atom_mask,
                                     axis=(-1, -2))             # (B,)
            return jax.lax.psum(ek_local, graph_axis)

        pos_ref = pos
        shard = jax.lax.axis_index(graph_axis)

        if integrator == 'nve':
            def body(carry, _key):
                pos, vel, f = carry
                vel = vel + (0.5 * dt) * f / masses_c * atom_mask
                pos = pos + dt * vel
                epot, f = energy_forces(pos)
                vel = vel + (0.5 * dt) * f / masses_c * atom_mask
                disp2 = jnp.max(jnp.sum((pos - pos_ref) ** 2, axis=-1))
                return (pos, vel, f), (epot, observables(vel), disp2)
        else:  # langevin (Vanden-Eijnden / Ciccotti, == md/driver.py)
            c1, c2, c3, c4, c5 = _langevin_coeffs(masses_c, dt, temp,
                                                  friction)

            def body(carry, key):
                pos, vel, f = carry
                # decorrelate the noise streams across graph shards; the
                # data axis (if any) replicates state and must NOT fold
                k = jax.random.fold_in(key, shard)
                xi = jax.random.normal(k, pos.shape, pos.dtype)
                eta = jax.random.normal(jax.random.fold_in(k, 1), pos.shape,
                                        pos.dtype)
                vel = (vel + c1 * f / masses_c - c2 * vel
                       + c3 * xi - c4 * eta) * atom_mask
                pos = pos + dt * vel + c5 * eta * atom_mask
                epot, f = energy_forces(pos)
                vel = (vel + c1 * f / masses_c - c2 * vel
                       + c3 * xi - c4 * eta) * atom_mask
                disp2 = jnp.max(jnp.sum((pos - pos_ref) ** 2, axis=-1))
                return (pos, vel, f), (epot, observables(vel), disp2)

        # same positions as the pre-sort state, so recomputing forces here
        # reproduces the carried values exactly (one extra eval per chunk
        # buys not shipping forces through the host re-sort)
        _, f0 = energy_forces(pos)
        (pos, vel, _), (epots, ekins, disp2) = jax.lax.scan(
            body, (pos, vel, f0), keys)
        maxdisp2 = jax.lax.pmax(jnp.max(disp2), graph_axis)
        return pos, vel, epots, ekins, maxdisp2

    G = graph_axis
    sharded = shard_map(
        local_chunk, mesh=mesh,
        in_specs=(P(), P(None, G), P(None, G, None), P(None, G, None),
                  P(None, G), P(None), P(), P()),
        out_specs=(P(None, G, None), P(None, G, None), P(), P(), P()),
        check_vma=False)
    return jax.jit(sharded, donate_argnums=(2, 3))


def run_md_halo(model, params, system, mesh, n_halo, *, timestep, n_steps,
                resort_every=20, integrator='nve', temperature_K=None,
                friction=None, log_every=1, seed=0, skin=1.0,
                dtype=np.float32, matmul_precision='highest',
                graph_axis='graph'):
    '''Integrate one large System with atoms sharded across `graph_axis`.

    Args:
        model: NewtonNet with graph_mode='neighborlist' (halo requirement).
        mesh: jax Mesh with >= 2 shards on `graph_axis`; slabs must stay
            wider than the cutoff (checked every re-sort).
        n_halo: boundary block size (atoms) exchanged per layer.
        timestep: in internal ASE-compatible units (fs = 0.09823).
        resort_every: steps between host re-sort/re-partition passes; the
            partition must stay valid in between, i.e. no atom should move
            more than skin/2 within a chunk (tracked and reported).
        integrator: 'nve' (velocity Verlet) or 'langevin' (requires
            temperature_K and friction).
        skin: widens the halo-capacity check to cutoff + skin so the
            partition survives intra-chunk motion.

    Returns:
        (system, log): the System advanced in place;
        log = {'epot', 'ekin', 'temperature' (strided by log_every),
               'n_resorts', 'skin_violations'}.
    '''
    if integrator not in ('nve', 'langevin'):
        raise ValueError(f'unknown integrator {integrator!r}')
    if integrator == 'langevin' and (temperature_K is None
                                     or friction is None):
        raise ValueError('langevin needs temperature_K and friction')
    if n_steps % resort_every:
        raise ValueError('n_steps must be divisible by resort_every')
    core = _halo_core(model, graph_axis, n_halo, mesh)
    n_shards = mesh.shape[graph_axis]
    # multi-process pods: the graph axis SPANS processes (one system across
    # hosts -- unlike training, where 'data' is the cross-process axis).
    # Every process runs this identical host loop (same seeds, same sort);
    # global arrays are assembled per process via make_array_from_callback
    # and chunk outputs re-assembled with process_allgather. Halo ppermutes
    # that cross a process boundary ride DCN there -- still boundary-sized.
    multiproc = jax.process_count() > 1

    n_real = len(system)
    pad = (-n_real) % n_shards
    # pre-pad once so every re-sort sees the same static shapes; the tag
    # row rides along through each sort to invert the permutation at the
    # end (padding tags are -1, never written back)
    z = np.concatenate([system.numbers,
                        np.zeros(pad, np.int32)])[None].astype(np.int32)
    pos = np.concatenate(
        [system.positions, np.zeros((pad, 3))])[None].astype(dtype)
    vel = np.concatenate(
        [system.get_velocities(), np.zeros((pad, 3))])[None].astype(dtype)
    masses = np.concatenate(
        [system.masses, np.ones(pad)])[None].astype(dtype)
    tag = np.concatenate(
        [np.arange(n_real, dtype=np.int64), np.full(pad, -1)])[None]
    cell = np.asarray(system.cell, dtype=dtype)[None]
    periodic = bool(np.any(cell != 0))

    repl = NamedSharding(mesh, P())
    if multiproc:
        # committed process-local arrays cannot reshard across processes;
        # enter the global mesh from host values as replicated arrays
        params = jax.device_put(
            jax.tree.map(lambda x: np.asarray(jax.device_get(x), dtype),
                         params), repl)
        scalars = jax.device_put(
            np.asarray([timestep, kB * (temperature_K or 0.0),
                        friction or 0.0], dtype), repl)
    else:
        params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
        scalars = jnp.asarray(
            [timestep, kB * (temperature_K or 0.0), friction or 0.0], dtype)
    chunk_fn = _make_chunk_fn(core, mesh, integrator, graph_axis)

    specs = {'z': P(None, graph_axis), 'pos': P(None, graph_axis, None),
             'vel': P(None, graph_axis, None), 'masses': P(None, graph_axis),
             'cell': P(None)}

    def put(name, x):
        sh = NamedSharding(mesh, specs[name])
        if not multiproc:
            return jax.device_put(x, sh)
        xh = np.asarray(x)
        # every process holds the identical full host array; each supplies
        # exactly its addressable shards
        return jax.make_array_from_callback(xh.shape, sh,
                                            lambda idx: xh[idx])

    def fetch(a):
        # device -> full host value on EVERY process (the re-sort is host
        # code every process repeats identically)
        if not multiproc:
            return np.asarray(a)
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(a, tiled=True))

    keys = jax.random.split(jax.random.PRNGKey(seed), n_steps).reshape(
        n_steps // resort_every, resort_every, -1)
    ep_list, ek_list = [], []
    skin_violations = 0
    with jax.default_matmul_precision(matmul_precision):
        for c in range(n_steps // resort_every):
            z, pos, extra = spatial_sort(
                z, pos, cell if periodic else None,
                extra={'vel': vel, 'masses': masses, 'tag': tag},
                n_shards=n_shards)
            vel, masses, tag = extra['vel'], extra['masses'], extra['tag']
            # sort pads with 0; keep the device dtype stable across paths
            masses = np.where(z > 0, masses, 1.0).astype(dtype)
            bad = check_halo_capacity(z, pos, cell if periodic else None,
                                      n_shards, n_halo,
                                      model.cutoff + skin)
            if bad:
                raise ValueError(
                    f'halo partition invalid at chunk {c}: {bad} atoms '
                    f'within cutoff+skin={model.cutoff + skin:g} of a slab '
                    f'boundary fall outside the n_halo={n_halo} blocks '
                    '(raise n_halo, use fewer graph shards, or shrink skin)')
            keys_c = (jax.device_put(np.asarray(keys[c]), repl)
                      if multiproc else jnp.asarray(keys[c]))
            pos_d, vel_d, ep, ek, maxdisp2 = chunk_fn(
                params, put('z', z), put('pos', pos), put('vel', vel),
                put('masses', masses), put('cell', cell), keys_c, scalars)
            pos = fetch(pos_d)
            vel = fetch(vel_d)
            skin_violations += int(float(maxdisp2) > (skin / 2.0) ** 2)
            ep_list.append(np.asarray(ep))
            ek_list.append(np.asarray(ek))

    if skin_violations:
        import warnings
        warnings.warn(
            f'halo MD partition quality: in {skin_violations} chunks an '
            'atom moved > skin/2 before the re-sort -- cross-boundary '
            'neighbors may have left halo coverage there; shrink '
            'resort_every or enlarge skin/n_halo', stacklevel=2)

    # invert the accumulated permutation back to the caller's atom order
    real = z[0] > 0
    order = tag[0, real].astype(np.int64)
    system.positions[order] = pos[0, real].astype(np.float64)
    system.momenta[order] = (vel[0, real]
                             * masses[0, real, None]).astype(np.float64)
    epots = np.concatenate(ep_list)[:, 0][::log_every]
    ekins = np.concatenate(ek_list)[:, 0][::log_every]
    log = {'epot': epots, 'ekin': ekins,
           'temperature': 2.0 * ekins / (3 * n_real * kB),
           'n_resorts': n_steps // resort_every,
           'skin_violations': skin_violations}
    return system, log
