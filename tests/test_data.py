'''Data pipeline tests: extxyz round trip, units, datasets, statistics,
bucketing/padding, and the npz parser the reference left unimplemented.'''
import os

import numpy as np
import pytest

from newtonnet_tpu.data import (  # noqa
    MolecularDataset,
    MolecularInMemoryDataset,
    PaddedLoader,
    collate,
)
from newtonnet_tpu.data.loader import Sample
from newtonnet_tpu.data.statistics import compute_statistics
from newtonnet_tpu.data.units import get_unit
from newtonnet_tpu.data.xyz import Frame, read_extxyz, write_extxyz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASPIRIN = os.path.join(REPO, 'data', 'md17_aspirin', 'ccsd_test', 'raw',
                       'aspirin_ccsd-test.xyz')


def test_units_match_ase_values():
    # spot values from ase.units (CODATA 2014)
    assert abs(get_unit('kcal/mol') - 0.04336410390059322) < 1e-12
    assert abs(get_unit('kJ/mol') - 0.010364269574711572) < 1e-12
    assert abs(get_unit('Ha') - 27.211386024367243) < 1e-7
    assert abs(get_unit('Bohr') - 0.5291772105638411) < 1e-12
    assert abs(get_unit('fs') - 0.09822694788464063) < 1e-12
    with pytest.raises(ValueError):
        get_unit('parsec')


def test_read_shipped_extxyz():
    frames = read_extxyz(ASPIRIN)
    assert len(frames) == 500
    f = frames[0]
    assert len(f) == 21
    assert f.energy is not None and f.forces.shape == (21, 3)
    assert not f.pbc.any()
    assert sorted(set(f.numbers.tolist())) == [1, 6, 8]


def test_extxyz_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    frame = Frame(numbers=[8, 1, 1], positions=rs.randn(3, 3),
                  cell=np.diag([9., 9., 9.]), pbc=[True, True, True],
                  energy=-76.4, forces=rs.randn(3, 3))
    path = os.path.join(tmp_path, 'w.xyz')
    write_extxyz(path, [frame, frame])
    back = read_extxyz(path)
    assert len(back) == 2
    np.testing.assert_array_equal(back[0].numbers, frame.numbers)
    np.testing.assert_allclose(back[0].positions, frame.positions, atol=1e-7)
    np.testing.assert_allclose(back[0].cell, frame.cell, atol=1e-9)
    np.testing.assert_allclose(back[0].energy, frame.energy)
    np.testing.assert_allclose(back[0].forces, frame.forces, atol=1e-7)


def _write_raw_xyz(root, n_frames=4):
    os.makedirs(os.path.join(root, 'raw'), exist_ok=True)
    rs = np.random.RandomState(1)
    frames = [Frame(numbers=[6, 1, 1, 1], positions=rs.randn(4, 3),
                    energy=float(i), forces=rs.randn(4, 3))
              for i in range(n_frames)]
    write_extxyz(os.path.join(root, 'raw', 'data.xyz'), frames)


def test_in_memory_vs_on_disk_datasets(tmp_path):
    root1, root2 = os.path.join(tmp_path, 'a'), os.path.join(tmp_path, 'b')
    _write_raw_xyz(root1)
    _write_raw_xyz(root2)
    d1 = MolecularInMemoryDataset(root=root1)
    d2 = MolecularDataset(root=root2)
    assert len(d1) == len(d2) == 4
    for i in range(4):
        np.testing.assert_array_equal(d1[i]['z'], d2[i]['z'])
        np.testing.assert_allclose(d1[i]['pos'], d2[i]['pos'], atol=1e-6)
        np.testing.assert_allclose(d1[i]['energy'], d2[i]['energy'])


def test_npz_parsing(tmp_path):
    '''The reference's parse_npz is dead code raising NotImplementedError
    (loader.py:131-132); ours implements the documented Z/R/L/E/F schema.'''
    root = os.path.join(tmp_path, 'npz')
    os.makedirs(os.path.join(root, 'raw'))
    rs = np.random.RandomState(2)
    np.savez(os.path.join(root, 'raw', 'd.npz'),
             Z=np.array([8, 1, 1]), R=rs.randn(5, 3, 3),
             E=rs.randn(5), F=rs.randn(5, 3, 3),
             L=np.array([10., 10., 10.]))
    ds = MolecularInMemoryDataset(root=root)
    assert len(ds) == 5
    s = ds[0]
    np.testing.assert_array_equal(s['z'], [8, 1, 1])
    np.testing.assert_array_equal(np.diag(s['cell']), [10., 10., 10.])


def test_unit_conversion(tmp_path):
    root = os.path.join(tmp_path, 'u')
    _write_raw_xyz(root)
    ev = MolecularInMemoryDataset(root=root)
    root2 = os.path.join(tmp_path, 'u2')
    _write_raw_xyz(root2)
    kcal = MolecularInMemoryDataset(root=root2, data_energy_unit='kcal/mol')
    ratio = kcal[1]['energy'] / ev[1]['energy']
    np.testing.assert_allclose(ratio, get_unit('kcal/mol'), rtol=1e-5)


def test_padded_loader_covers_everything(tmp_path):
    root = os.path.join(tmp_path, 'c')
    _write_raw_xyz(root, n_frames=10)
    ds = MolecularInMemoryDataset(root=root)
    loader = PaddedLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(loader)
    assert len(batches) == 3
    total = sum(int(b['graph_mask'].sum()) for b in batches)
    assert total == 10
    for b in batches:
        assert b['z'].shape == (4, 8)  # padded to multiple of 8
        # energies seen across epochs differ in order (shuffling)
    e1 = np.concatenate([b['energy'][b['graph_mask']] for b in loader])
    e2 = np.concatenate([b['energy'][b['graph_mask']] for b in loader])
    assert not np.array_equal(e1, e2)
    assert sorted(e1) == sorted(e2)


def test_statistics_lstsq():
    '''Per-element shifts recovered exactly from a linear-in-composition
    energy model (the reference's lstsq construction, loader.py:210-219).'''
    rs = np.random.RandomState(3)
    shifts = {1: -13.6, 6: -1029.0, 8: -2041.0}
    samples = []
    for _ in range(20):
        z = rs.choice([1, 6, 8], size=rs.randint(3, 8)).astype(np.int32)
        e = sum(shifts[int(x)] for x in z)
        samples.append({'z': z, 'energy': e,
                        'force': rs.randn(len(z), 3)})
    stats = compute_statistics(samples)
    for el, val in shifts.items():
        np.testing.assert_allclose(stats['energy']['shift'][el], val,
                                   rtol=1e-9)
    assert stats['energy']['scale'][1] < 1e-6  # perfect fit -> ~zero residual
    assert 'force' in stats
    # no cells in the samples -> aperiodic (molecular) dataset
    assert stats['periodicity'] == 'aperiodic'


def test_statistics_periodicity():
    '''Dataset periodicity detection feeds the CLI's static ewald_mode
    selection (scripts/newtonnet_train.py): all-periodic / all-aperiodic /
    mixed stats samples classify as such.'''
    rs = np.random.RandomState(7)

    def sample(cell):
        z = rs.choice([1, 8], size=4).astype(np.int32)
        return {'z': z, 'energy': 1.0, 'force': rs.randn(4, 3),
                'cell': cell}

    box = np.eye(3) * 10.0
    none = np.zeros((3, 3))
    assert compute_statistics(
        [sample(box) for _ in range(5)])['periodicity'] == 'periodic'
    assert compute_statistics(
        [sample(none) for _ in range(5)])['periodicity'] == 'aperiodic'
    assert compute_statistics(
        [sample(box), sample(none)])['periodicity'] == 'mixed'


def test_bucketed_loader(tmp_path):
    from newtonnet_tpu.data.loader import BucketedLoader
    root = os.path.join(tmp_path, 'het')
    os.makedirs(os.path.join(root, 'raw'))
    rs = np.random.RandomState(5)
    frames = []
    for i in range(12):
        n = [4, 9, 21][i % 3]
        frames.append(Frame(numbers=rs.choice([1, 6], n),
                            positions=rs.randn(n, 3), energy=float(i),
                            forces=rs.randn(n, 3)))
    write_extxyz(os.path.join(root, 'raw', 'h.xyz'), frames)
    ds = MolecularInMemoryDataset(root=root)
    loader = BucketedLoader(ds, batch_size=4, shuffle=True, seed=0)
    assert loader.buckets == [8, 16, 24]
    batches = list(loader)
    assert len(batches) == len(loader) == 3
    shapes = sorted(b['z'].shape[1] for b in batches)
    assert shapes == [8, 16, 24]
    # every real frame appears exactly once
    energies = sorted(float(e) for b in batches
                      for e in b['energy'][b['graph_mask']])
    assert energies == [float(i) for i in range(12)]
    # padding waste bounded: bucket of n=4 frames is 8 wide, not 24
    for b in batches:
        n_real_max = int((b['z'] > 0).sum(axis=1).max())
        assert b['z'].shape[1] - n_real_max < 8


def test_collate_rejects_oversized_sample():
    s = Sample(z=np.arange(1, 12, dtype=np.int32), pos=np.zeros((11, 3)),
               cell=np.zeros((3, 3)), energy=0.0, force=np.zeros((11, 3)))
    with pytest.raises(ValueError, match='does not fit'):
        collate([s], n_pad=8, batch_pad=1)


@pytest.mark.slow
def test_precomputed_neighbor_lists_training_parity():
    '''NeighborListDataset + Trainer: a train step fed precomputed lists
    (plain and newton3 modes) matches the in-jit-graph step exactly.'''
    import jax
    import jax.numpy as jnp
    import optax

    from newtonnet_tpu.data import collate
    from newtonnet_tpu.data.prelists import NeighborListDataset
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import fastgrad, get_loss_by_string

    rs = np.random.RandomState(3)
    N, B = 14, 3

    class Frames:
        def __len__(self):
            return B

        def __getitem__(self, i):
            r = np.random.RandomState(100 + i)
            cell = np.diag([9.0, 9.0, 9.0])
            return {'z': r.choice([1, 6, 8], size=N).astype(np.int32),
                    'pos': r.rand(N, 3) @ cell, 'cell': cell,
                    'energy': float(r.randn()), 'force': r.randn(N, 3)}

    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 10.0}})
    common = dict(graph_mode='neighborlist', cutoff=5.0, n_features=16,
                  n_basis=8, n_interactions=2, param_dtype=jnp.float64,
                  output_properties=['energy', 'gradient_force'])

    def step_loss(model, batch, nlist):
        params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                            batch['cell'])
        loss, grads, _ = fastgrad.value_and_grad(model, main_loss,
                                                 params, batch, nlist=nlist)
        return float(loss), grads

    # baseline: in-jit graph build
    plain_model = NewtonNet(k_max=13, **common)
    base = collate([Frames()[i] for i in range(B)], n_pad=N, batch_pad=B,
                   dtype=np.float64)
    base = {k: jnp.asarray(v) for k, v in base.items()}
    loss0, g0 = step_loss(plain_model, base, None)

    for mode, k_max, model in (
            ('plain', 13, plain_model),
            ('newton3', 8, NewtonNet(k_max=8, newton3=True, **common))):
        ds = NeighborListDataset(Frames(), cutoff=5.0, k_max=k_max,
                                 mode=mode)
        batch = collate([ds[i] for i in range(B)], n_pad=N, batch_pad=B,
                        dtype=np.float64)
        assert batch['nlist_idx'].shape == (B, N, k_max)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        nl = (batch['nlist_idx'], batch['nlist_mask'])
        if mode == 'newton3':
            from newtonnet_tpu.ops.nlist import build_inverse_list
            inv, invm = build_inverse_list(
                jnp.swapaxes(nl[0], 1, 2), jnp.swapaxes(nl[1], 1, 2))
            nl = nl + (inv, invm)
        loss1, g1 = step_loss(model, batch, nl)
        assert abs(loss1 - loss0) < 1e-9 * max(1.0, abs(loss0)), mode
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(a, b, atol=1e-9, err_msg=mode)


def test_precomputed_lists_through_trainer():
    '''Trainer.run_one_epoch with nlist-carrying batches: the step body
    feeds the lists to the model (in-jit graph build bypassed) and matches
    the same epoch run on identical batches without lists.'''
    import jax
    import jax.numpy as jnp

    from newtonnet_tpu.data import collate
    from newtonnet_tpu.data.prelists import NeighborListDataset
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import (Trainer, get_loss_by_string,
                                     get_optimizer_by_string)

    N, B = 12, 2

    class Frames:
        def __len__(self):
            return 2 * B

        def __getitem__(self, i):
            r = np.random.RandomState(200 + i)
            cell = np.diag([8.0, 8.0, 8.0])
            return {'z': r.choice([1, 8], size=N).astype(np.int32),
                    'pos': r.rand(N, 3) @ cell, 'cell': cell,
                    'energy': float(r.randn()), 'force': r.randn(N, 3)}

    model = NewtonNet(graph_mode='neighborlist', cutoff=4.0, k_max=11,
                      n_features=8, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'])

    def epoch(with_lists):
        src = Frames()
        ds = (NeighborListDataset(src, cutoff=4.0, k_max=11)
              if with_lists else src)
        batches = [collate([ds[i + c * B] for i in range(B)], n_pad=N,
                           batch_pad=B) for c in range(2)]
        batches = [{k: jnp.asarray(v) for k, v in b.items()}
                   for b in batches]
        params = model.init(jax.random.PRNGKey(0), batches[0]['z'],
                            batches[0]['pos'], batches[0]['cell'])
        t = Trainer(model=model, params=params,
                    loss_fns=get_loss_by_string(
                        {'energy': {}, 'gradient_force': {'weight': 5.0}}),
                    optimizer=get_optimizer_by_string('adam', lr=1e-3))
        log = t.run_one_epoch(batches, step=True)
        return t.params, log

    p0, log0 = epoch(False)
    p1, log1 = epoch(True)
    np.testing.assert_allclose(log0['loss'], log1['loss'], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p0),
                    jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5,
                                   atol=1e-7)


def test_prefetch_loader_matches_direct():
    '''PrefetchLoader yields byte-identical batches in the same order as
    its wrapped loader and propagates worker exceptions.'''
    from newtonnet_tpu.data import PaddedLoader, PrefetchLoader

    class Frames:
        max_atoms = 6

        def __len__(self):
            return 7

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            return {'z': r.choice([1, 8], size=6).astype(np.int32),
                    'pos': r.randn(6, 3), 'cell': np.zeros((3, 3)),
                    'energy': float(r.randn()), 'force': r.randn(6, 3)}

    loader = PaddedLoader(Frames(), batch_size=3, shuffle=True, seed=4)
    pre = PrefetchLoader(PaddedLoader(Frames(), batch_size=3, shuffle=True,
                                      seed=4), depth=2)
    for epoch in range(2):  # restartable, RNG advances identically
        direct = list(loader)
        fetched = list(pre)
        assert len(direct) == len(fetched) == 3
        for a, b in zip(direct, fetched):
            for k in a:
                np.testing.assert_array_equal(a[k], b[k])

    class Boom:
        max_atoms = 4

        def __len__(self):
            return 2

        def __getitem__(self, i):
            raise RuntimeError('boom')

    with pytest.raises(RuntimeError, match='boom'):
        list(PrefetchLoader(PaddedLoader(Boom(), batch_size=1)))


def test_trainer_rejects_mismatched_nlist_mode():
    '''Plain precomputed lists fed to a newton3 model must raise loudly
    (a silent mismatch would double-count every edge).'''
    import jax
    import jax.numpy as jnp

    from newtonnet_tpu.data import collate
    from newtonnet_tpu.data.prelists import NeighborListDataset
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import (Trainer, get_loss_by_string,
                                     get_optimizer_by_string)

    N, B = 10, 2

    class Frames:
        def __len__(self):
            return B

        def __getitem__(self, i):
            r = np.random.RandomState(300 + i)
            cell = np.diag([7.0, 7.0, 7.0])
            return {'z': r.choice([1, 8], size=N).astype(np.int32),
                    'pos': r.rand(N, 3) @ cell, 'cell': cell,
                    'energy': 0.0, 'force': np.zeros((N, 3))}

    ds = NeighborListDataset(Frames(), cutoff=4.0, k_max=9, mode='plain')
    batch = collate([ds[i] for i in range(B)], n_pad=N, batch_pad=B)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    model = NewtonNet(graph_mode='neighborlist', cutoff=4.0, k_max=9,
                      newton3=True, n_features=8, n_basis=4,
                      n_interactions=1,
                      output_properties=['energy', 'gradient_force'])
    params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                        batch['cell'])
    t = Trainer(model=model, params=params,
                loss_fns=get_loss_by_string({'energy': {}}),
                optimizer=get_optimizer_by_string('adam', lr=1e-3))
    with pytest.raises(ValueError, match='reciprocal edge'):
        t.run_one_epoch([batch], step=True)


def test_sharded_dataset_matches_in_memory(tmp_path):
    '''MolecularShardedDataset returns frame-identical samples to the
    in-memory dataset over shard boundaries, with bounded shard cache.'''
    import shutil

    from newtonnet_tpu.data import (MolecularInMemoryDataset,
                                    MolecularShardedDataset)

    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, '..', 'data', 'md17_aspirin', 'ccsd_test')
    root = tmp_path / 'ds'
    (root / 'raw').mkdir(parents=True)
    for f in os.listdir(os.path.join(src, 'raw')):
        shutil.copy(os.path.join(src, 'raw', f), root / 'raw' / f)
    mem = MolecularInMemoryDataset(root=str(root))
    shard = MolecularShardedDataset(root=str(root), shard_size=7,
                                    cache_shards=2, force_reload=True)
    assert len(shard) == len(mem)
    assert shard.max_atoms == mem.max_atoms
    for i in (0, 6, 7, 13, len(mem) - 1, 20, 3):  # cross shards, revisit
        a, b = mem[i], shard[i]
        np.testing.assert_array_equal(a['z'], b['z'])
        np.testing.assert_allclose(a['pos'], b['pos'], atol=0)
        np.testing.assert_allclose(a['force'], b['force'], atol=0)
        assert abs(a['energy'] - b['energy']) == 0
    assert len(shard._cache) <= 2


def test_block_split_is_a_partition(tmp_path):
    '''random_split(block=...) yields disjoint exact-size subsets covering
    every frame, with each subset's indices in runs of consecutive frames.'''
    from newtonnet_tpu.data.loader import random_split

    class Ixs:
        def __len__(self):
            return 100

        def __getitem__(self, i):
            return i

    rng = np.random.default_rng(0)
    a, b, c = random_split(Ixs(), [55, 25, 20], rng, block=8)
    idx = np.concatenate([s.indices for s in (a, b, c)])
    assert len(a) == 55 and len(b) == 25 and len(c) == 20
    np.testing.assert_array_equal(np.sort(idx), np.arange(100))
    # locality: each subset takes ONE contiguous sub-run per block, so
    # index jumps are bounded by the block count
    n_blocks = -(-100 // 8)
    jumps = np.sum(np.diff(np.sort(a.indices)) != 1)
    assert jumps <= n_blocks, jumps
    # stratification: every block contributes ~proportionally to every
    # subset (disk order correlates with content in real corpora, so
    # val/test must not be whole blocks)
    for sub, size in ((a, 55), (b, 25), (c, 20)):
        for blk in range(n_blocks):
            lo, hi = blk * 8, min(blk * 8 + 8, 100)
            got = np.sum((sub.indices >= lo) & (sub.indices < hi))
            expect = size / 100 * (hi - lo)
            assert abs(got - expect) <= 1.5, (size, blk, got, expect)


def test_sharded_locality_shuffle_bounds_io(tmp_path):
    '''With block split + block shuffle, one epoch over a sharded dataset
    loads each shard O(1) times; a global shuffle would thrash the LRU.'''
    from newtonnet_tpu.data import (MolecularShardedDataset, PaddedLoader,
                                    random_split)

    root = tmp_path / 'ds'
    _write_raw_xyz(str(root), n_frames=96)
    ds = MolecularShardedDataset(root=str(root), shard_size=8,
                                 cache_shards=2, force_reload=True)
    rng = np.random.default_rng(0)
    train, rest = random_split(ds, [80, 16], rng, block=8)

    ds.shard_loads = 0
    loader = PaddedLoader(train, batch_size=4, shuffle=True,
                          shuffle_block=8, seed=0)
    seen = []
    for batch in loader:
        seen.extend(batch['energy'][batch['graph_mask']].tolist())
    assert len(seen) == 80 and len(set(seen)) == 80  # full coverage
    locality_loads = ds.shard_loads

    ds.shard_loads = 0
    for batch in PaddedLoader(train, batch_size=4, shuffle=True, seed=0):
        pass
    thrash_loads = ds.shard_loads
    # 12 shards: locality mode re-loads each a handful of times; the
    # global shuffle pays nearly one load per SAMPLE
    assert locality_loads <= 3 * 12, locality_loads
    assert thrash_loads > 3 * locality_loads, (thrash_loads, locality_loads)


def test_bucketed_loader_uses_size_metadata(tmp_path):
    '''BucketedLoader on a sharded dataset learns frame sizes from meta.npz
    without decoding any shard payloads.'''
    from newtonnet_tpu.data import BucketedLoader, MolecularShardedDataset

    root = tmp_path / 'ds'
    _write_raw_xyz(str(root), n_frames=32)
    ds = MolecularShardedDataset(root=str(root), shard_size=8,
                                 cache_shards=2, force_reload=True)
    ds.shard_loads = 0
    loader = BucketedLoader(ds, batch_size=4)
    assert ds.shard_loads == 0
    assert loader.buckets == [8]  # 4 atoms -> padded to the multiple
    n = sum(int(b['graph_mask'].sum()) for b in loader)
    assert n == 32


def test_stress_virial_labels_round_trip(tmp_path):
    '''extxyz stress=/virial= info fields survive write -> read -> dataset
    -> collate, with stress unit-converted as energy/length^3.'''
    from newtonnet_tpu.data.units import get_unit as _u
    root = os.path.join(tmp_path, 's')
    os.makedirs(os.path.join(root, 'raw'))
    rs = np.random.RandomState(11)
    frames = []
    for i in range(4):
        s = rs.randn(3, 3)
        frames.append(Frame(numbers=[8, 1, 1], positions=rs.randn(3, 3) + 5,
                            cell=np.eye(3) * 10, pbc=[True] * 3,
                            energy=float(i), forces=rs.randn(3, 3),
                            stress=s, virial=-s * 1000.0))
    write_extxyz(os.path.join(root, 'raw', 's.xyz'), frames)
    back = read_extxyz(os.path.join(root, 'raw', 's.xyz'))
    np.testing.assert_allclose(back[1].stress, frames[1].stress, atol=1e-9)
    np.testing.assert_allclose(back[1].virial, frames[1].virial, rtol=1e-9)

    # kcal/mol energy unit: stress scales by the energy factor / Ang^3
    ds = MolecularInMemoryDataset(root=root, data_energy_unit='kcal/mol')
    k = _u('kcal/mol')
    np.testing.assert_allclose(ds[2]['stress'], frames[2].stress * k,
                               rtol=1e-6)
    np.testing.assert_allclose(ds[2]['virial'], frames[2].virial * k,
                               rtol=1e-6)

    batch = collate([ds[i] for i in range(3)], n_pad=8, batch_pad=4)
    assert batch['stress'].shape == (4, 3, 3)
    np.testing.assert_allclose(batch['virial'][1], frames[1].virial * k,
                               rtol=1e-6)
    # Voigt-6 form parses too
    from newtonnet_tpu.data.xyz import _parse_3x3
    v = _parse_3x3('1 2 3 4 5 6')
    np.testing.assert_allclose(v, [[1, 6, 5], [6, 2, 4], [5, 4, 3]])

    # on-disk per-frame variant carries the labels as well
    root2 = os.path.join(tmp_path, 's2')
    os.makedirs(os.path.join(root2, 'raw'))
    write_extxyz(os.path.join(root2, 'raw', 's.xyz'), frames)
    ds2 = MolecularDataset(root=root2)
    np.testing.assert_allclose(ds2[3]['stress'], frames[3].stress,
                               rtol=1e-6, atol=1e-8)
