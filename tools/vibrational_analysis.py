#!/usr/bin/env python
'''Vibrational (normal-mode) analysis demo: relax aspirin with the trained
model, compute the Hessian through the second-derivative head, mass-weight,
and report harmonic frequencies -- the workflow the reference's Hessian
head exists for (newtonnet/models/output.py:134-152).

  python tools/vibrational_analysis.py [checkpoint ...]
'''
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update('jax_default_matmul_precision', 'highest')

from newtonnet_tpu.data import units  # noqa: E402
from newtonnet_tpu.data.xyz import ATOMIC_MASSES, read_extxyz  # noqa: E402
from newtonnet_tpu.md.calculator import NewtonNetCalculator  # noqa: E402
from newtonnet_tpu.md.system import System  # noqa: E402

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def relax(system, calc, steps=2000, fmax=0.01):
    '''FIRE relaxation to a force threshold.'''
    from newtonnet_tpu.md.optimize import FIRE

    def force_fn(pos):
        system.positions = pos
        return calc.calculate(system)['forces']

    opt = FIRE(system, force_fn=force_fn)
    converged, n, fnorm = opt.run(fmax=fmax, steps=steps)
    return n, fnorm


def main():
    ckpts = sys.argv[1:] or [os.path.join(
        HERE, 'artifacts', 'md17_model', 'best_model.msgpack')]
    path = ckpts if len(ckpts) > 1 else ckpts[0]
    # forces-only engine for the relaxation loop; the (expensive) Hessian
    # head only runs once on the relaxed geometry
    force_calc = NewtonNetCalculator(model_path=path,
                                     properties=['energy', 'forces'])
    calc = NewtonNetCalculator(model_path=path,
                               properties=['energy', 'forces', 'hessian'])

    frame = read_extxyz(os.path.join(
        HERE, 'data', 'md17_aspirin', 'ccsd_test', 'raw',
        'aspirin_ccsd-test.xyz'), index=0)
    system = System.from_frame(frame)
    n_steps, fmax = relax(system, force_calc)
    print(f'relaxed in {n_steps} steps, max |F| = {fmax:.4f} eV/A')

    out = calc.calculate(system)
    n = len(system)
    h = out['hessian'].reshape(3 * n, 3 * n)
    h = 0.5 * (h + h.T)
    masses = ATOMIC_MASSES[system.numbers]
    inv_sqrt_m = np.repeat(1.0 / np.sqrt(masses), 3)
    dyn = h * inv_sqrt_m[:, None] * inv_sqrt_m[None, :]
    eigvals = np.linalg.eigvalsh(dyn)

    # eV/(A^2 amu) -> angular frequency in internal units; cm^-1 conversion
    # nu[cm^-1] = sqrt(lambda) / (2 pi c); with ASE-style units:
    s = units.second
    c_cm = 2.99792458e10  # cm/s
    freqs = []
    for lam in eigvals:
        omega = np.sqrt(abs(lam)) * s  # rad/s
        nu = omega / (2 * np.pi * c_cm)
        freqs.append(-nu if lam < 0 else nu)
    freqs = np.array(freqs)

    print(f'modes: {len(freqs)} (6 should be ~0: translations/rotations)')
    print('lowest 8 (cm^-1):', np.round(freqs[:8], 1))
    print('highest 6 (cm^-1):', np.round(freqs[-6:], 1))
    n_imag = int((freqs < -20).sum())
    print(f'imaginary modes (|nu| > 20 cm^-1): {n_imag}')
    ch = freqs[(freqs > 2800) & (freqs < 3300)]
    print(f'C-H stretch band (2800-3300 cm^-1): {len(ch)} modes '
          f'(aspirin has 8 C-H bonds)')


if __name__ == '__main__':
    main()
