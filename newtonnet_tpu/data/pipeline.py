'''Train/val/test dataset construction (reference: newtonnet/data/parse_raw.py).

Same split-cascade semantics as parse_train_test (ref parse_raw.py:10-92):
train from train_root (sized, remainder cascades to val), val from val_root
or the train remainder, test from test_root or the val remainder; then
statistics are computed from one stats batch of the training set.
DataLoaders are replaced by static-shape PaddedLoaders.
'''
import numpy as np

from newtonnet_tpu.data.loader import (
    BucketedLoader,
    MolecularDataset,
    MolecularInMemoryDataset,
    MolecularShardedDataset,
    PaddedLoader,
    random_split,
)
from newtonnet_tpu.data.statistics import compute_statistics


class SpatialSortDataset:
    '''Access-time wrapper sorting each frame's atoms along (fractional) x
    (parallel/halo.spatial_sort), with force labels permuted alongside --
    the pre-sort the halo-parallel slab decomposition requires.'''

    def __init__(self, dataset):
        self.dataset = dataset
        for attr in ('max_atoms', 'precision', 'frame_sizes'):
            if hasattr(dataset, attr):
                setattr(self, attr, getattr(dataset, attr))

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, i):
        from newtonnet_tpu.parallel.halo import spatial_sort
        s = dict(self.dataset[i])
        extra = {}
        if s.get('force') is not None:
            extra['force'] = s['force'][None]
        z_s, pos_s, extra_s = spatial_sort(
            s['z'][None], s['pos'][None],
            s['cell'][None] if s.get('cell') is not None else None, extra)
        s['z'], s['pos'] = z_s[0], pos_s[0]
        if 'force' in extra_s:
            s['force'] = extra_s['force'][0]
        return s


def parse_train_test(
        in_memory=True,
        train_root=None,
        val_root=None,
        test_root=None,
        train_size=None,
        val_size=None,
        test_size=None,
        stats_size=None,
        train_batch_size=32,
        val_batch_size=32,
        test_batch_size=32,
        seed=0,
        n_pad=None,
        bucketed=False,
        bucket_multiple=8,
        precompute_nlist=None,
        prefetch=0,
        locality_block='auto',
        spatial_sort=False,
        **dataset_kwargs):
    '''Build the three loaders + scaler statistics.

    `bucketed: true` (YAML data section) groups frames into per-size
    buckets (BucketedLoader) instead of one global padding -- the right
    choice for heterogeneous datasets (multi-molecule sweeps, ANI-style
    collections) where one big molecule would tax every batch with its
    O(N^2) padding cost. One compilation per bucket size.

    `precompute_nlist: {cutoff: 5.0, k_max: 48, mode: plain}` (YAML data
    section) wraps every dataset in NeighborListDataset: frame neighbor
    lists are built once on the host, cached, and fed through the batches,
    removing the per-step in-jit graph build. mode 'newton3'/'inverse'
    require the matching model flag and must match the model's cutoff and
    k_max (see data/prelists.py).

    `prefetch: 2` wraps each loader in PrefetchLoader: a background
    thread assembles the next batches (sample fetch + collate + cached
    neighbor lists) while the device computes.

    `locality_block` (YAML data section) keeps disk locality at ANI scale:
    splits and epoch shuffles randomize blocks of that many CONSECUTIVE
    frames instead of single frames, so one batch decodes one or two
    shard_{j}.npz packs instead of batch_size of them (loader.py
    _block_shuffled). 'auto' (default) enables it with the dataset's
    shard_size when `in_memory: sharded` and disables it otherwise; an int
    forces that block size; null/0 forces exact global shuffling.

    Returns:
        (train_gen, val_gen, test_gen, stats)
    '''
    # in_memory: True (one cache npz, all in RAM) | False (per-frame
    # files, reference layout) | 'sharded' (shard_{j}.npz packs, bounded
    # memory at ANI scale)
    cls = {True: MolecularInMemoryDataset, False: MolecularDataset,
           'sharded': MolecularShardedDataset}[in_memory]
    rng = np.random.default_rng(seed)

    print('Data:')
    if train_root is None:
        raise ValueError('train_root must be provided')
    train_data = cls(root=train_root, **dataset_kwargs)
    print(f'load {len(train_data)} data from {train_root}')
    if locality_block == 'auto':
        locality_block = (getattr(train_data, 'shard_size', None)
                          if in_memory == 'sharded' else None)
    locality_block = locality_block or None
    train_size = len(train_data) if train_size is None else train_size
    train_data, left_data = random_split(
        train_data, [train_size, len(train_data) - train_size], rng,
        block=locality_block)
    if val_root is not None:
        val_data = cls(root=val_root, **dataset_kwargs)
        print(f'load {len(val_data)} data from {val_root}')
    else:
        val_data = left_data
    val_size = len(val_data) if val_size is None else val_size
    val_data, left_data = random_split(
        val_data, [val_size, len(val_data) - val_size], rng,
        block=locality_block)
    if test_root is not None:
        test_data = cls(root=test_root, **dataset_kwargs)
        print(f'load {len(test_data)} data from {test_root}')
    else:
        test_data = left_data
    test_size = len(test_data) if test_size is None else test_size
    test_data, _ = random_split(
        test_data, [test_size, len(test_data) - test_size], rng,
        block=locality_block)
    print(f'data size (train, val, test): '
          f'{len(train_data)}, {len(val_data)}, {len(test_data)}')

    if spatial_sort:
        # halo-parallel training (training: parallel: {graph: G}) needs
        # each frame's atoms sorted along (fractional) x for the slab
        # decomposition; applied at access time so cached datasets work
        train_data, val_data, test_data = (
            SpatialSortDataset(d)
            for d in (train_data, val_data, test_data))

    if precompute_nlist:
        from newtonnet_tpu.data.prelists import NeighborListDataset
        train_data, val_data, test_data = (
            NeighborListDataset(d, **precompute_nlist)
            for d in (train_data, val_data, test_data))

    if bucketed:
        train_gen = BucketedLoader(train_data, train_batch_size,
                                   shuffle=True, seed=seed,
                                   bucket_multiple=bucket_multiple,
                                   shuffle_block=locality_block)
        val_gen = BucketedLoader(val_data, val_batch_size, shuffle=False,
                                 seed=seed + 1,
                                 bucket_multiple=bucket_multiple)
        test_gen = BucketedLoader(test_data, test_batch_size, shuffle=False,
                                  seed=seed + 2,
                                  bucket_multiple=bucket_multiple)
    else:
        # one shared atom padding across the three loaders (one compile)
        if n_pad is None:
            n_pad = max(8, -(-max(d.max_atoms for d in
                                  (train_data, val_data, test_data)
                                  if len(d) > 0) // 8) * 8)

        train_gen = PaddedLoader(train_data, train_batch_size, shuffle=True,
                                 n_pad=n_pad, seed=seed,
                                 shuffle_block=locality_block)
        val_gen = PaddedLoader(val_data, val_batch_size,
                               shuffle=len(val_data) > 0,
                               n_pad=n_pad, seed=seed + 1,
                               shuffle_block=locality_block)
        test_gen = PaddedLoader(test_data, test_batch_size,
                                shuffle=len(test_data) > 0, n_pad=n_pad,
                                seed=seed + 2,
                                shuffle_block=locality_block)
    if prefetch:
        from newtonnet_tpu.data.loader import PrefetchLoader
        train_gen, val_gen, test_gen = (
            PrefetchLoader(g, depth=prefetch)
            for g in (train_gen, val_gen, test_gen))
    print(f'batch size (train, val, test): '
          f'{train_batch_size}, {val_batch_size}, {test_batch_size}')

    # statistics from one stats batch (ref parse_raw.py:81-88); visiting
    # the random sample in sorted position order is statistically
    # identical and keeps the sharded dataset's access sequential
    size = len(train_data) if stats_size is None else min(stats_size,
                                                          len(train_data))
    stats_idx = np.sort(rng.permutation(len(train_data))[:size])
    stats = compute_statistics(train_data[i] for i in stats_idx)

    return train_gen, val_gen, test_gen, stats
