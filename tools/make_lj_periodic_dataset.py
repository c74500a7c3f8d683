#!/usr/bin/env python
'''Generate a PERIODIC Lennard-Jones liquid dataset (extxyz, exact labels).

Condensed-phase counterpart of make_lj_dataset.py: N-atom argon boxes at
liquid-like density with minimum-image LJ energies/forces truncated and
SHIFTED at r_c (so the target is exactly representable by a cutoff
model). Frames are decorrelated by short randomized damped relaxations
from fresh random packings. Exercises the "large periodic/condensed-phase
system" configuration class end-to-end through training
(data.precompute_nlist + model newton3).

    python tools/make_lj_periodic_dataset.py --out data/lj_liquid \
        --atoms 64 --frames 240 --cutoff 5.0
'''
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPS = 0.0104  # eV (argon)
SIGMA = 3.4   # Angstrom


def lj_periodic(pos, box, r_c):
    '''Truncated+shifted LJ under the minimum-image convention.

    Valid for r_c <= box/2 (orthorhombic cube). Returns (energy, forces).
    '''
    n = len(pos)
    d = pos[:, None, :] - pos[None, :, :]
    d -= box * np.round(d / box)
    r2 = np.sum(d * d, axis=-1)
    np.fill_diagonal(r2, np.inf)
    inside = r2 < r_c * r_c
    inv6 = np.where(inside, (SIGMA * SIGMA / np.where(inside, r2, 1.0)) ** 3,
                    0.0)
    inv12 = inv6 * inv6
    s6 = (SIGMA / r_c) ** 6
    shift = 4.0 * EPS * (s6 * s6 - s6)  # V(r_c), subtracted inside r_c
    energy = 2.0 * np.sum(EPS * 4.0 * 0.5 * (inv12 - inv6)
                          - 0.5 * shift * inside)
    coef = np.where(inside,
                    4.0 * EPS * (12.0 * inv12 - 6.0 * inv6)
                    / np.where(inside, r2, 1.0), 0.0)
    forces = np.sum(coef[:, :, None] * d, axis=1)
    return energy, forces


def make_frame(n, box, r_c, rng, relax_steps=80):
    pos = rng.random((n, 3)) * box
    for _ in range(relax_steps):
        _, f = lj_periodic(pos, box, r_c)
        pos = (pos + np.clip(f * 15.0, -0.25, 0.25)) % box
    pos = (pos + rng.standard_normal((n, 3)) * 0.09) % box
    e, f = lj_periodic(pos, box, r_c)
    return pos, e, f


def write_extxyz(f, pos, energy, forces, box):
    n = len(pos)
    f.write(f'{n}\n')
    f.write(f'Lattice="{box} 0 0 0 {box} 0 0 0 {box}" '
            f'Properties=species:S:1:pos:R:3:forces:R:3 '
            f'energy={energy:.10f} pbc="T T T"\n')
    for p, fo in zip(pos, forces):
        f.write(f'Ar {p[0]:.8f} {p[1]:.8f} {p[2]:.8f} '
                f'{fo[0]:.8f} {fo[1]:.8f} {fo[2]:.8f}\n')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', default='data/lj_liquid')
    ap.add_argument('--atoms', type=int, default=64)
    ap.add_argument('--frames', type=int, default=240)
    ap.add_argument('--cutoff', type=float, default=5.0)
    ap.add_argument('--density', type=float, default=0.021)  # atoms/A^3,
    # liquid argon ~0.021
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    box = (args.atoms / args.density) ** (1 / 3)
    assert args.cutoff <= box / 2, (args.cutoff, box)
    rng = np.random.default_rng(args.seed)
    raw = os.path.join(args.out, 'raw')
    os.makedirs(raw, exist_ok=True)
    path = os.path.join(raw, 'lj_liquid.extxyz')
    with open(path, 'w') as f:
        for i in range(args.frames):
            pos, e, forces = make_frame(args.atoms, box, args.cutoff, rng)
            write_extxyz(f, pos, e, forces, box)
    print(f'wrote {args.frames} frames of {args.atoms} atoms '
          f'(box {box:.2f} A) to {path}')


if __name__ == '__main__':
    main()
