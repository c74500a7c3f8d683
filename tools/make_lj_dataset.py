#!/usr/bin/env python
'''Generate a heterogeneous Lennard-Jones cluster dataset (extxyz).

Produces argon clusters of mixed sizes with exact LJ energies/forces -- a
physically meaningful, learnable target whose frames span a wide atom-count
range, exercising the BucketedLoader path (BASELINE.json configuration
class "heterogeneous multi-molecule"). Also the frame source for the
streaming-preprocess demo (tools/demo_streaming_preprocess.py).

LJ: V(r) = 4 eps [(sigma/r)^12 - (sigma/r)^6], argon eps=0.0104 eV,
sigma=3.4 A. Clusters are random sphere packings relaxed by a few damped
steepest-descent steps so the dataset contains no unphysical overlaps.
'''
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

EPS = 0.0104  # eV
SIGMA = 3.4   # Angstrom


def lj_energy_forces(pos):
    d = pos[:, None, :] - pos[None, :, :]
    r2 = np.sum(d * d, axis=-1)
    np.fill_diagonal(r2, np.inf)
    inv6 = (SIGMA * SIGMA / r2) ** 3
    inv12 = inv6 * inv6
    energy = 2.0 * EPS * np.sum(inv12 - inv6)  # 4 eps * 1/2 double count
    # dV/dr2 = 4 eps (-12 inv12 + 6 inv6) / (2 r2); F_i = -sum_j dV/dd * dhat
    coef = 4.0 * EPS * (12.0 * inv12 - 6.0 * inv6) / r2  # (N, N)
    forces = np.sum(coef[:, :, None] * d, axis=1)
    return energy, forces


def make_cluster(n, rng, relax_steps=60):
    # loose random sphere packing near the LJ minimum distance
    r_min = 2 ** (1 / 6) * SIGMA
    radius = r_min * (n ** (1 / 3)) * 0.75
    pos = rng.standard_normal((n, 3))
    pos *= radius / np.maximum(np.linalg.norm(pos, axis=1, keepdims=True), .1)
    pos += rng.standard_normal((n, 3)) * 0.3 * r_min
    # damped relaxation away from overlaps, capped displacement per step
    for _ in range(relax_steps):
        e, f = lj_energy_forces(pos)
        step = np.clip(f * 20.0, -0.2, 0.2)
        pos += step
    # thermal-ish perturbation so forces are nonzero
    pos += rng.standard_normal((n, 3)) * 0.08
    e, f = lj_energy_forces(pos)
    return pos, e, f


def write_extxyz(f, pos, energy, forces):
    n = len(pos)
    f.write(f'{n}\n')
    f.write(f'Properties=species:S:1:pos:R:3:forces:R:3 '
            f'energy={energy:.10f} pbc="F F F"\n')
    for p, fo in zip(pos, forces):
        f.write(f'Ar {p[0]:.8f} {p[1]:.8f} {p[2]:.8f} '
                f'{fo[0]:.8f} {fo[1]:.8f} {fo[2]:.8f}\n')


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--out', default='data/lj_hetero')
    ap.add_argument('--sizes', default='6,9,13,19,26,38',
                    help='comma-separated cluster sizes')
    ap.add_argument('--per-size', type=int, default=120)
    ap.add_argument('--test-per-size', type=int, default=30)
    ap.add_argument('--seed', type=int, default=0)
    args = ap.parse_args()

    sizes = [int(s) for s in args.sizes.split(',')]
    rng = np.random.default_rng(args.seed)
    for split, count in (('train', args.per_size),
                         ('test', args.test_per_size)):
        root = os.path.join(args.out, split, 'raw')
        os.makedirs(root, exist_ok=True)
        path = os.path.join(root, 'lj_clusters.extxyz')
        n_frames = 0
        with open(path, 'w') as f:
            frames = [(n, i) for n in sizes for i in range(count)]
            order = rng.permutation(len(frames))
            for k in order:
                n, _ = frames[k]
                pos, e, fo = make_cluster(n, rng)
                write_extxyz(f, pos, e, fo)
                n_frames += 1
        print(f'{split}: {n_frames} frames ({len(sizes)} sizes '
              f'{min(sizes)}..{max(sizes)} atoms) -> {path}')


if __name__ == '__main__':
    main()
