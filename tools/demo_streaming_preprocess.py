#!/usr/bin/env python
'''Streaming large-dataset ingestion demo (BASELINE.json configuration
class "ANI-style large dataset").

Generates an N-frame heterogeneous LJ-cluster corpus as extxyz shards,
then streams it shard-by-shard through the native C++ parser
(native/extxyz.cpp) into the npz cache format that MolecularDataset
consumes -- peak host memory stays bounded by one shard regardless of the
corpus size. Reports ingestion throughput (frames/s, Matoms/s, MB/s) for
the native parser, with the pure-Python parser (data/xyz.py) timed on one
shard for comparison.

    python tools/demo_streaming_preprocess.py --frames 100000
'''
import argparse
import os
import shutil
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from make_lj_dataset import lj_energy_forces, write_extxyz  # noqa: E402


def generate_shards(root, n_frames, n_shards, seed=0):
    '''Cheap generation: perturbed cached clusters (exact LJ labels).'''
    rng = np.random.default_rng(seed)
    sizes = [5, 8, 13, 21]
    base = {}
    from make_lj_dataset import make_cluster
    for n in sizes:
        base[n], _, _ = make_cluster(n, rng)
    os.makedirs(root, exist_ok=True)
    paths = []
    per = -(-n_frames // n_shards)
    total_bytes = 0
    k = 0
    for s in range(n_shards):
        path = os.path.join(root, f'shard_{s:03d}.extxyz')
        with open(path, 'w') as f:
            for _ in range(min(per, n_frames - k)):
                n = sizes[k % len(sizes)]
                pos = base[n] + rng.standard_normal((n, 3)) * 0.06
                e, fo = lj_energy_forces(pos)
                write_extxyz(f, pos, e, fo)
                k += 1
        total_bytes += os.path.getsize(path)
        paths.append(path)
    return paths, total_bytes


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--frames', type=int, default=100000)
    ap.add_argument('--shards', type=int, default=10)
    ap.add_argument('--workdir', default='/tmp/newtonnet_streaming_demo')
    ap.add_argument('--keep', action='store_true')
    ap.add_argument('--report', default=None, help='markdown report path')
    args = ap.parse_args()

    from newtonnet_tpu import native
    if not native.ensure_built():
        raise SystemExit('native library unavailable (make -C native failed)')

    raw = os.path.join(args.workdir, 'raw')
    out = os.path.join(args.workdir, 'processed')
    shutil.rmtree(args.workdir, ignore_errors=True)
    os.makedirs(out)

    print(f'generating {args.frames} frames in {args.shards} shards...',
          file=sys.stderr)
    t0 = time.perf_counter()
    paths, total_bytes = generate_shards(raw, args.frames, args.shards)
    t_gen = time.perf_counter() - t0
    print(f'generated {total_bytes / 1e6:.1f} MB in {t_gen:.1f} s',
          file=sys.stderr)

    # streamed native ingestion: parse shard -> write npz cache -> drop
    frames = atoms = 0
    t0 = time.perf_counter()
    for i, path in enumerate(paths):
        d = native.parse_extxyz(path)
        n_fr = len(d['ptr']) - 1
        np.savez(os.path.join(out, f'chunk_{i:03d}.npz'),
                 ptr=d['ptr'], z=d['z'], pos=d['pos'], forces=d['forces'],
                 energy=d['energy'], cell=d['cell'])
        frames += n_fr
        atoms += len(d['z'])
    t_native = time.perf_counter() - t0

    # python parser comparison on one shard
    from newtonnet_tpu.data.xyz import read_extxyz
    t0 = time.perf_counter()
    py_frames = list(read_extxyz(paths[0]))
    t_py_shard = time.perf_counter() - t0
    py_fps = len(py_frames) / t_py_shard

    native_fps = frames / t_native
    lines = [
        f'frames ingested: {frames} ({atoms} atoms, '
        f'{total_bytes / 1e6:.1f} MB)',
        f'native streaming ingest: {t_native:.2f} s = '
        f'{native_fps:,.0f} frames/s, {atoms / t_native / 1e6:.2f} Matoms/s, '
        f'{total_bytes / t_native / 1e6:.0f} MB/s',
        f'python parser (1 shard): {py_fps:,.0f} frames/s '
        f'-> native speedup {native_fps / py_fps:.1f}x',
        f'peak working set: 1 shard = {total_bytes / args.shards / 1e6:.1f} '
        f'MB (corpus-size independent)',
    ]
    print('\n'.join(lines))
    if args.report:
        with open(args.report, 'w') as f:
            f.write('# Streaming ingestion demo '
                    '(tools/demo_streaming_preprocess.py)\n\n'
                    + '\n'.join(f'- {line}' for line in lines) + '\n')
    if not args.keep:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == '__main__':
    main()
