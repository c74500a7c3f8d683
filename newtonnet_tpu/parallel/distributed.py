'''Multi-host (pod-slice) execution helpers.

A multi-host run is the same SPMD program as the single-host one: each host
calls initialize_distributed() first, then builds the global mesh with
make_global_mesh() and uses the exact same NamedShardings / shard_map code
paths that the single-host Trainer and graph_parallel use (they are
device-count agnostic and unit-tested on virtual CPU meshes).

Axis layout guidance (SURVEY.md section 5): put 'data' outermost so the
gradient psum crosses DCN only once per step at the slice boundary, and
keep 'graph' (per-layer all-gathers) inside a slice so halo traffic rides
ICI.

Launching: one process per host, each exporting
    NEWTONNET_DIST_COORD=<host0>:<port>
    NEWTONNET_DIST_NPROCS=<N>  NEWTONNET_DIST_PROCID=<i>
(or nothing at all on TPU pod runtimes, which autoconfigure) -- the train
CLI calls maybe_initialize_from_env() before any backend use.
tools/launch_distributed.py spawns such a set locally (CPU devices), which
is also how tests/test_distributed_mp.py exercises the real multi-process
code path: cross-process gradient psum over Gloo, per-process data
slicing, chief-only checkpointing.
'''
import os

import jax

from newtonnet_tpu.parallel.mesh import make_mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    '''Initialize jax.distributed when running multi-process.

    With no arguments, relies on the environment (TPU pod runtimes set
    everything automatically). Safe no-op when already initialized or when
    running single-process.
    '''
    try:
        if num_processes is not None and num_processes <= 1:
            return False
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return True
    except (RuntimeError, ValueError):
        # already initialized, or single-process environment
        return False


def maybe_initialize_from_env():
    '''Initialize jax.distributed from NEWTONNET_DIST_* env vars.

    Launcher-agnostic: tools/launch_distributed.py, mpirun wrappers, or a
    per-host shell loop all just export the three variables. No-op (returns
    False) when they are absent or NPROCS <= 1. Must run before the first
    backend touch (jax.devices / any jit).
    '''
    coord = os.environ.get('NEWTONNET_DIST_COORD')
    nprocs = os.environ.get('NEWTONNET_DIST_NPROCS')
    procid = os.environ.get('NEWTONNET_DIST_PROCID')
    if not (coord and nprocs and procid):
        return False
    return initialize_distributed(coord, int(nprocs), int(procid))


def is_multiprocess():
    '''True when this run spans >1 processes (after initialization).'''
    return jax.process_count() > 1


def global_data_batch(mesh, batch, stacked=False, specs=None):
    '''Assemble this process's slice of a host batch into global arrays.

    Multi-process jit cannot consume plain per-host numpy batches: each
    process owns only its addressable shard of the 'data' axis. This slices
    the host batch to the process's rows (every process iterates the SAME
    seeded loader, so slicing here is equivalent to per-process loading)
    and builds global jax.Arrays via make_array_from_process_local_data.

    Args:
        mesh: the global ('data', 'graph') mesh.
        batch: dict of host arrays, batch dim on axis 0 (or axis 1 when
            `stacked`: a steps_per_call scan stack, scan axis 0 unsharded).
        stacked: see above.
        specs: optional {key: PartitionSpec} giving per-key shardings whose
            FIRST axis is the 'data' axis (e.g. halo batches: z/pos/force
            P('data', 'graph'), per-graph labels P('data') -- see
            parallel/halo.halo_batch_specs). Keys absent from specs are
            dropped. The non-data axes (here 'graph') must be process-LOCAL
            on the mesh: the process contributes its data rows with the
            full atom axis and make_array_from_process_local_data lays the
            local slice out over the process's own devices. None = every
            key sharded P('data') (plain DP).

    Returns:
        dict of global jax.Arrays with the requested shardings (scan axis
        prepended unsharded when `stacked`).
    '''
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = 1 if stacked else 0
    nproc, rank = jax.process_count(), jax.process_index()

    def conv(x, spec):
        if stacked:
            spec = P(None, *spec)
        sh = NamedSharding(mesh, spec)
        x = np.asarray(x)
        b = x.shape[axis]
        if b % nproc:
            raise ValueError(
                f'batch dim {b} not divisible by {nproc} processes')
        size = b // nproc
        sl = [slice(None)] * x.ndim
        sl[axis] = slice(rank * size, (rank + 1) * size)
        return jax.make_array_from_process_local_data(
            sh, np.ascontiguousarray(x[tuple(sl)]), x.shape)

    if specs is None:
        return {k: conv(v, P('data')) for k, v in batch.items()}
    return {k: conv(v, specs[k]) for k, v in batch.items() if k in specs}


def make_global_mesh(data=-1, graph=1):
    '''Mesh over ALL processes' devices (jax.devices() is global after
    initialize_distributed). Identical semantics to make_mesh.'''
    return make_mesh(data=data, graph=graph, devices=jax.devices())


def process_local_batch_slice(global_batch_size):
    '''(start, size) of this process's shard of a globally-sharded batch.

    Hosts feed only their slice of the 'data' axis;
    jax.make_array_from_process_local_data assembles the global array.
    '''
    n = jax.process_count()
    assert global_batch_size % n == 0, \
        f'global batch {global_batch_size} not divisible by {n} processes'
    size = global_batch_size // n
    return jax.process_index() * size, size
