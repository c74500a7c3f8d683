#!/usr/bin/env python
'''Multi-chip MD demo: halo-partitioned Langevin on a large periodic box.

Integrates a periodic system (default 16,384 atoms) with its atoms
spatially sharded across the mesh's graph axis (md/halo_md.py): forces are
computed with boundary-only ppermute halo exchange, and the slab
decomposition is re-sorted on the host every `resort_every` steps. Runs
unchanged on a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_
device_count=8 JAX_PLATFORMS=cpu) and on a real multi-chip slice.

The reference has no analogue: its MD is one ASE Calculator on one device
(newtonnet/utils/ase_interface.py:52-81), capped by one GPU's memory.

Usage: demo_halo_md.py [n_atoms] [n_steps] [n_shards] [resort_every]
       [--aspect AX] [--save OUT.npz] [--seed S]

Multi-process: launch one process per host with NEWTONNET_DIST_* env
(tools/launch_distributed.py spawns a local set) -- the GRAPH axis then
spans processes (one system across hosts; halo ppermutes crossing the
process boundary stay boundary-sized). Every process runs the identical
host loop; --save writes from the chief only.
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(n_atoms=16384, n_steps=40, n_shards=8, resort_every=10,
         aspect=1.0, save=None, seed=0, device=None):
    import jax
    if device:
        # the axon plugin overrides the JAX_PLATFORMS env var; pin the
        # backend explicitly for virtual-CPU runs (same as export_model.py)
        jax.config.update('jax_platforms', device)

    from newtonnet_tpu.parallel.distributed import maybe_initialize_from_env
    if maybe_initialize_from_env():
        print(f'distributed: process {jax.process_index()}/'
              f'{jax.process_count()}, {len(jax.devices())} global devices')
    import jax.numpy as jnp

    from newtonnet_tpu.data import units
    from newtonnet_tpu.md.halo_md import run_md_halo
    from newtonnet_tpu.md.system import System, maxwell_boltzmann
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.parallel import make_mesh

    rs = np.random.RandomState(seed)
    L = (n_atoms / 0.1) ** (1 / 3)  # ~0.1 atoms/A^3
    # aspect > 1 elongates x (and shrinks y/z at constant volume): lets
    # small test systems keep slabs wider than the cutoff
    cell = np.diag([L * aspect, L / aspect ** 0.5, L / aspect ** 0.5])
    pos = rs.rand(n_atoms, 3) @ cell
    numbers = rs.choice([1, 1, 8], size=n_atoms)
    system = System(numbers, pos, cell=cell, pbc=[True] * 3)
    maxwell_boltzmann(system, 300.0, rng=np.random.default_rng(0))

    model = NewtonNet(graph_mode='neighborlist', k_max=96,
                      compute_dtype='bfloat16',
                      output_properties=['energy', 'gradient_force'])
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(numbers[None], jnp.int32),
                        jnp.asarray(pos[None], jnp.float32),
                        jnp.asarray(cell[None], jnp.float32))
    params = jax.tree.map(lambda x: x * 0.1, params)  # stable random pot.

    mesh = make_mesh(data=1, graph=n_shards)
    n_loc = -(-n_atoms // n_shards)
    # halo sized for the boundary layer: slab occupies Lx/n_shards of x, a
    # (cutoff+skin)-thick boundary at this density holds ~rho*(c+s)*Ly*Lz
    n_halo = min(n_loc, max(8, int(1.6 * 0.1 * (5.0 + 1.0)
                                   * cell[1, 1] * cell[2, 2])))
    print(f'N={n_atoms}, {n_shards} shards x {n_loc} atoms, n_halo={n_halo}')

    kw = dict(timestep=0.5 * units.fs, temperature_K=300,
              friction=1 / (100 * units.fs), integrator='langevin',
              resort_every=resort_every, log_every=resort_every)
    t0 = time.time()
    system, _ = run_md_halo(model, params, system, mesh, n_halo,
                            n_steps=resort_every, **kw)
    print(f'compile+warmup: {time.time() - t0:.0f}s')

    t0 = time.perf_counter()
    system, log = run_md_halo(model, params, system, mesh, n_halo,
                              n_steps=n_steps, **kw)
    dt = (time.perf_counter() - t0) / n_steps
    print(f'{dt * 1e3:.1f} ms/step -> {1 / dt:.1f} steps/s '
          f'({n_shards} shards, resort every {resort_every})')
    print(f"T={log['temperature'][-1]:.0f}K, "
          f"skin_violations={log['skin_violations']}, "
          f"Epot finite: {bool(np.isfinite(log['epot']).all())}")
    if save is not None and jax.process_index() == 0:
        np.savez(save, positions=system.positions,
                 momenta=system.momenta, epot=log['epot'],
                 temperature=log['temperature'])
        print(f'saved {save}')


if __name__ == '__main__':
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('n_atoms', nargs='?', type=int, default=16384)
    ap.add_argument('n_steps', nargs='?', type=int, default=40)
    ap.add_argument('n_shards', nargs='?', type=int, default=8)
    ap.add_argument('resort_every', nargs='?', type=int, default=10)
    ap.add_argument('--aspect', type=float, default=1.0)
    ap.add_argument('--save', default=None)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--device', default=None)
    a = ap.parse_args()
    main(a.n_atoms, a.n_steps, a.n_shards, a.resort_every,
         aspect=a.aspect, save=a.save, seed=a.seed, device=a.device)
