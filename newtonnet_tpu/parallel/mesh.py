'''Device mesh construction.

The reference has no distributed layer at all (its only parallelism is a
bit-rotted single-process DataParallel, trainer.py:71-74; SURVEY.md
section 2.3). The TPU framework's distribution is designed around a
jax.sharding.Mesh with two logical axes:

  * 'data'  -- batch (graph) dimension: DP across chips/hosts, gradient
               psum over ICI inserted by XLA from the shardings;
  * 'graph' -- atom dimension inside large graphs: spatial/edge
               partitioning with halo exchange (the graph analogue of
               context parallelism), see newtonnet_tpu/parallel/halo.py.

Axis sizes of -1 consume the remaining devices.
'''
import jax
import numpy as np


def make_mesh(data=-1, graph=1, devices=None):
    '''Create a Mesh with ('data', 'graph') axes.

    Args:
        data: data-parallel axis size (-1 = fill with remaining devices).
        graph: atom-partition axis size.
        devices: explicit device list (default: all jax.devices()).
    '''
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % graph == 0, f'{n} devices not divisible by graph={graph}'
        data = n // graph
    assert data * graph <= n, \
        f'mesh {data}x{graph} needs more than {n} devices'
    devices = np.asarray(devices[:data * graph]).reshape(data, graph)
    return jax.sharding.Mesh(devices, ('data', 'graph'))
