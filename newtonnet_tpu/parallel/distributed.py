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

This module is exercised on real pods only; in single-process environments
initialize_distributed() is a no-op.
'''
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
