#!/usr/bin/env python
'''Large-system on-device MD throughput demo.

Runs Langevin MD of a periodic box (default 4096 atoms, ~0.1 atoms/A^3)
with the neighbor-list model path, entirely on device (lax.scan). The
model is untrained (throughput demonstration for the BASELINE.json
"large periodic/condensed-phase system" configuration class); dynamics are
stable because forces are exact gradients of the (random) potential.

Prints steps/s and edges/s for the MD hot loop.
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main(n_atoms=4096, n_steps=100, k_max=0, nlist_every=10,
         mode='newton3'):
    # mode: 'newton3c' (staircase-compacted half lists, host-rebuilt,
    # fastest -- ops/staircase.py), 'newton3' (rectangular half lists,
    # host-rebuilt), 'inverse' (symmetric-slotted full lists,
    # host-rebuilt), or 'plain' (full lists rebuilt in-jit on device).
    # k_max=0 picks a default per mode (half-list capacity is ~max
    # degree/2 + slack).
    from newtonnet_tpu.data import units
    from newtonnet_tpu.md.driver import run_langevin_on_device
    from newtonnet_tpu.md.system import System, maxwell_boltzmann
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.ops.nlist import neighbor_list

    rs = np.random.RandomState(0)
    L = (n_atoms / 0.1) ** (1 / 3)
    cell = np.diag([L, L, L])
    pos = rs.rand(n_atoms, 3) @ cell
    numbers = rs.choice([1, 1, 8], size=n_atoms)

    system = System(numbers, pos, cell=cell, pbc=[True] * 3)
    maxwell_boltzmann(system, 300.0, rng=np.random.default_rng(0))

    if not k_max:
        # capacity covers the BUILD radius cutoff+skin=6.0 A: max degree in
        # this box is ~119 (Konig half-list bound 60), plus drift headroom
        k_max = {'newton3': 72, 'newton3c': 72, 'inverse': 136,
                 'plain': 144}[mode]
    model = NewtonNet(graph_mode='neighborlist', k_max=k_max,
                      newton3=(mode == 'newton3'),
                      newton3_compact=(mode == 'newton3c'),
                      inverse_lists=(mode == 'inverse'),
                      compute_dtype='bfloat16',
                      output_properties=['energy', 'gradient_force'])
    z = jnp.asarray(numbers[None], jnp.int32)
    params = model.init(jax.random.PRNGKey(0), z, jnp.asarray(pos[None],
                                                              jnp.float32),
                        jnp.asarray(cell[None], jnp.float32))
    # scale down the random potential so the demo integrates stably
    params = jax.tree.map(lambda x: x * 0.1, params)

    _, kmask, _, ovf = jax.jit(
        lambda p, c, m: neighbor_list(p, c, m, 5.0, 128))(
            jnp.asarray(pos[None], jnp.float32),
            jnp.asarray(cell[None], jnp.float32), z > 0)
    edges = int(jnp.sum(kmask))
    print(f'N={n_atoms} atoms, {edges} directed edges, overflow={int(ovf.sum())}')

    # warmup/compile (+ honest-timing fetch); skin-radius lists rebuilt
    # every nlist_every steps, stale pairs re-masked per step in-model.
    # The shared stair_plan keeps the warmup and timed legs on ONE set of
    # compiled chunk shapes (newton3c mode; ignored otherwise)
    stair_plan = {}
    t0 = time.time()
    system, log = run_langevin_on_device(
        model, params, system, timestep=0.5 * units.fs, temperature_K=300,
        friction=1 / (100 * units.fs), n_steps=nlist_every, log_every=1,
        matmul_precision='default', nlist_every=nlist_every,
        stair_plan=stair_plan)
    print(f'compile+warmup: {time.time() - t0:.0f}s')

    t0 = time.perf_counter()
    system, log = run_langevin_on_device(
        model, params, system, timestep=0.5 * units.fs, temperature_K=300,
        friction=1 / (100 * units.fs), n_steps=n_steps,
        log_every=max(1, n_steps // 10), matmul_precision='default',
        nlist_every=nlist_every, stair_plan=stair_plan)
    dt = (time.perf_counter() - t0) / n_steps
    print(f'{dt * 1e3:.1f} ms/step -> {1 / dt:.1f} steps/s, '
          f'{edges / dt / 1e6:.1f}M edges/s')
    print('Epot trace finite:', bool(np.isfinite(log['epot']).all()))


def _arg(a):
    try:
        return int(a)
    except ValueError:
        return a  # mode name ('newton3' | 'inverse' | 'plain')


if __name__ == '__main__':
    main(*(map(_arg, sys.argv[1:])))
