#!/usr/bin/env python
'''Offline dataset preprocessing (reference: scripts/preprocess.py).

Processes root/raw/*.{xyz,extxyz,npz} into the cached processed/ form on a
big-memory CPU node, so training jobs start instantly.
'''
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(
        description='Preprocess raw data for NewtonNet-TPU training.')
    parser.add_argument('-r', '--root', type=str, required=True,
                        help='The path to the raw data root directory.')
    parser.add_argument('-p', '--precision', type=str, default='single',
                        help='The precision of the data. Default: single.')
    parser.add_argument('--in-memory', action=argparse.BooleanOptionalAction,
                        default=True,
                        help='Whether to store as one in-memory npz.')
    args = parser.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    from newtonnet_tpu.layers.precision import get_precision_by_string
    from newtonnet_tpu.data import MolecularDataset, MolecularInMemoryDataset

    precision = np.dtype(str(np.dtype(
        get_precision_by_string(args.precision))))
    cls = MolecularInMemoryDataset if args.in_memory else MolecularDataset
    data = cls(root=args.root, precision=precision, force_reload=True)
    print(f'processed {len(data)} frames (max atoms {data.max_atoms})')
    print('done!')


if __name__ == '__main__':
    main()
