#!/usr/bin/env python
'''Aspirin MD demo (reference: scripts/simulate.py).

Langevin dynamics of MD17 aspirin frame 0 at 300 K, 0.5 fs timestep,
friction 1/(500 fs), 20,000 steps, logging every 100 -- the reference's
exact setup, with two execution modes:

  * default: host-loop integrator with the jitted calculator (the ASE-style
    architecture);
  * --on-device: the whole trajectory under one lax.scan on the TPU
    (no host round trip per step; orders of magnitude faster for small
    systems).
'''
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compilation_cache():
    import os, jax
    cache = os.environ.get('JAX_COMPILATION_CACHE_DIR') or os.path.expanduser('~/.cache/newtonnet_tpu/jax')
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


def main():
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(description='Aspirin MD with NewtonNet-TPU')
    parser.add_argument('--model', default='md17_model/training_1/models/best_model.msgpack')
    parser.add_argument('--xyz', default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        'data', 'md17_aspirin', 'ccsd_test', 'raw', 'aspirin_ccsd-test.xyz'))
    parser.add_argument('--steps', type=int, default=20000)
    parser.add_argument('--out', default='md17_md')
    parser.add_argument('--on-device', action='store_true',
                        help='run the whole trajectory on device (lax.scan)')
    parser.add_argument('--device', default=os.environ.get('JAX_PLATFORMS')
                        or None,
                        help="jax platform, e.g. 'cpu' (default: the "
                             'installed accelerator; the axon TPU plugin '
                             'ignores the JAX_PLATFORMS env var, so the '
                             'config is pinned here before backend init)')
    args = parser.parse_args()

    if args.device:
        import jax
        jax.config.update('jax_platforms', args.device)

    import numpy as np
    from newtonnet_tpu.data import units
    from newtonnet_tpu.data.xyz import read_extxyz
    from newtonnet_tpu.md.calculator import NewtonNetCalculator
    from newtonnet_tpu.md.integrators import Langevin
    from newtonnet_tpu.md.system import System

    print('Running aspirin MD simulation with NewtonNet-TPU...')
    frame = read_extxyz(args.xyz, index=0)
    system = System.from_frame(frame)
    calc = NewtonNetCalculator(model_path=args.model,
                               properties=['energy', 'forces'],
                               precision='float32')
    system.calc = calc
    os.makedirs(args.out, exist_ok=True)
    np.random.seed(0)

    if args.on_device:
        from newtonnet_tpu.data.units import ps
        from newtonnet_tpu.md.driver import run_langevin_on_device
        system, log = run_langevin_on_device(
            calc.model, calc.params, system,
            timestep=0.5 * units.fs, temperature_K=300,
            friction=1 / (500 * units.fs), n_steps=args.steps,
            log_every=100)
        with open(os.path.join(args.out, 'md.log'), 'w') as f:
            f.write('Time[ps]      Etot[eV]     Epot[eV]     Ekin[eV]'
                    '    T[K]\n')
            for i, (ep, ek, t) in enumerate(zip(log['epot'], log['ekin'],
                                                log['temperature'])):
                time = i * 100 * 0.5 * units.fs / ps
                f.write(f'{time:<10.4f} {ep + ek:12.4f} {ep:12.4f} '
                        f'{ek:12.4f} {t:6.1f}\n')
    else:
        dyn = Langevin(
            system,
            timestep=0.5 * units.fs,
            temperature_K=300,
            friction=1 / (500 * units.fs),
            logfile=os.path.join(args.out, 'md.log'),
            trajectory=os.path.join(args.out, 'md.traj.xyz'),
            loginterval=100,
            rng=np.random.default_rng(0),
        )
        dyn.run(args.steps)
    print('MD simulation finished')


if __name__ == '__main__':
    main()
