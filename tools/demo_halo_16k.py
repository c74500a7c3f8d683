#!/usr/bin/env python
'''10k+-atom halo-exchange training demo (BASELINE.json configuration
class "large periodic/condensed-phase system, edge-partitioned across N
hosts with halo exchange").

Runs a full sharded TRAIN step of a 16,384-atom periodic box with atoms
partitioned over 8 devices on the mesh graph axis (parallel/halo.py):
per-layer communication is the boundary halo blocks only (ppermute over
the ring), never the full node tensor, so per-device memory and comm
scale with the slab boundary, not with N. On this machine the 8 devices
are virtual (one CPU host), which validates the sharded program
end-to-end; on a real pod slice the same script runs unchanged with
JAX_PLATFORMS unset.
'''
import os
os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
import jax
jax.config.update('jax_platforms', 'cpu')
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp
import optax
from newtonnet_tpu.models import NewtonNet
from newtonnet_tpu.parallel import (make_mesh, make_halo_train_step,
                                    shard_halo_batch, spatial_sort)

# 16384-atom periodic box at liquid density, atoms partitioned over 8
# virtual devices on the graph axis; per-layer communication = halo blocks
N = 16384
G = 8
rho = 0.05
L = (N / rho) ** (1 / 3)
rs = np.random.RandomState(0)
z = rs.choice([1, 1, 8], size=(1, N)).astype(np.int32)
pos = rs.rand(1, N, 3) * L
cell = np.broadcast_to(np.diag([L, L, L]).astype(np.float32), (1, 3, 3))
f_lbl = rs.randn(1, N, 3).astype(np.float32)

mesh = make_mesh(data=1, graph=G)
z, pos, extra = spatial_sort(z, pos, cell, extra={'force': f_lbl},
                             n_shards=G)
batch = {'z': jnp.asarray(z), 'pos': jnp.asarray(pos, jnp.float32),
         'cell': jnp.asarray(cell, jnp.float32),
         'energy': jnp.zeros((1,), jnp.float32),
         'force': jnp.asarray(extra['force'], jnp.float32),
         'graph_mask': jnp.ones((1,), bool)}

model = NewtonNet(cutoff=5.0, n_features=64, n_basis=20, n_interactions=3,
                  graph_mode='neighborlist', k_max=64,
                  output_properties=['energy', 'gradient_force'])
params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                    batch['cell'])
tx = optax.adam(1e-3)
# halo capacity: atoms within cutoff of a slab boundary; slab width
# L/G ~ 8.6 A > cutoff. H = N/G * (cutoff/slab_width) * safety
H = 1024
step = make_halo_train_step(model, tx, mesh, n_halo=H)
batch_s = shard_halo_batch(batch, mesh)
opt = tx.init(params)
t0 = time.time()
params, opt, metrics = step(params, opt, batch_s)
jax.block_until_ready(metrics['loss'])
print(f'compile+first step: {time.time()-t0:.0f}s '
      f'loss={float(metrics["loss"]):.4f}')
t0 = time.perf_counter()
for _ in range(3):
    params, opt, metrics = step(params, opt, batch_s)
jax.block_until_ready(metrics['loss'])
dt = (time.perf_counter() - t0) / 3
# count edges
from newtonnet_tpu.ops.nlist import neighbor_list
_, kmask, _, ovf = jax.jit(
    lambda p, c, m: neighbor_list(p, c, m, 5.0, 64))(
    batch['pos'], batch['cell'], batch['z'] > 0)
edges = int(jnp.sum(kmask))
print(f'N={N} atoms over graph={G} shards (halo H={H}): '
      f'train step {dt*1e3:.0f} ms, {edges} edges, '
      f'{edges/dt/1e6:.2f} M edges/s (virtual CPU mesh), '
      f'overflow={int(ovf.sum())}, loss finite={np.isfinite(float(metrics["loss"]))}')
