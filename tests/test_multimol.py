'''Heterogeneous (multi-molecule) training through the BucketedLoader --
the "MD17 multi-molecule sweep" configuration class from BASELINE.json.
Verifies end-to-end training across buckets of different padded sizes and
that the loss decreases.'''
import os

import jax
import numpy as np
import pytest

from newtonnet_tpu.data.loader import BucketedLoader, MolecularInMemoryDataset
from newtonnet_tpu.data.statistics import compute_statistics, set_scalers
from newtonnet_tpu.data.xyz import Frame, write_extxyz
from newtonnet_tpu.models import NewtonNet
from newtonnet_tpu.train import Trainer, get_loss_by_string, \
    get_optimizer_by_string


def _make_dataset(tmp_path, n_frames=24):
    rs = np.random.RandomState(0)
    frames = []
    for i in range(n_frames):
        n = [3, 5, 12][i % 3]
        z = rs.choice([1, 6, 8], size=n)
        pos = rs.randn(n, 3) * 1.5
        d = np.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
        np.fill_diagonal(d, 1.0)
        energy = float((1.0 / d)[np.triu_indices(n, 1)].sum())
        frames.append(Frame(numbers=z, positions=pos, energy=energy,
                            forces=rs.randn(n, 3) * 0.1))
    root = os.path.join(tmp_path, 'multi')
    os.makedirs(os.path.join(root, 'raw'))
    write_extxyz(os.path.join(root, 'raw', 'm.xyz'), frames)
    return MolecularInMemoryDataset(root=root)


def test_bucketed_training_decreases_loss(tmp_path, rng):
    ds = _make_dataset(tmp_path)
    loader = BucketedLoader(ds, batch_size=4, shuffle=True, seed=0)
    assert len(loader.buckets) > 1  # genuinely heterogeneous
    model = NewtonNet(n_features=16, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'])
    b = next(iter(loader))
    import jax.numpy as jnp
    params = model.init(rng, jnp.asarray(b['z']), jnp.asarray(b['pos']),
                        jnp.asarray(b['cell']))
    stats = compute_statistics(ds[i] for i in range(len(ds)))
    params = set_scalers(params, model.output_properties, stats)
    trainer = Trainer(
        model=model, params=params,
        loss_fns=get_loss_by_string({'energy': {},
                                     'gradient_force': {'weight': 10.0}}),
        optimizer=get_optimizer_by_string('adam', lr=2e-3),
        output_base_path=str(tmp_path),
        train_generator=loader, epochs=6, steps_per_call=3)
    trainer.train()
    import csv
    rows = list(csv.DictReader(open(os.path.join(trainer.output_path,
                                                 'log.csv'))))
    losses = [float(r['train_loss']) for r in rows if r['epoch'].isdigit()]
    assert losses[-1] < losses[0]


def test_direct_force_training_mode(tmp_path, rng):
    '''The reference's direct (non-gradient) force mode: DirectForceOutput
    head + DirectForceLoss with the cos/norm eval battery
    (ref output.py:115-132, loss.py:140-149).'''
    ds = _make_dataset(tmp_path, n_frames=12)
    from newtonnet_tpu.data.loader import PaddedLoader
    loader = PaddedLoader(ds, batch_size=4, shuffle=True, seed=0)
    model = NewtonNet(n_features=16, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'direct_force'])
    b = next(iter(loader))
    import jax.numpy as jnp
    params = model.init(rng, jnp.asarray(b['z']), jnp.asarray(b['pos']),
                        jnp.asarray(b['cell']))
    main_loss, eval_loss = get_loss_by_string(
        {'energy': {}, 'direct_force': {'weight': 10.0}})
    preds = model.apply(params, jnp.asarray(b['z']), jnp.asarray(b['pos']),
                        jnp.asarray(b['cell']))
    metrics = eval_loss(preds, b)
    for k in ('direct_force_mae', 'direct_force_cos_mae',
              'direct_force_norm_mse'):
        assert k in metrics and np.isfinite(float(metrics[k]))
    trainer = Trainer(
        model=model, params=params, loss_fns=(main_loss, eval_loss),
        optimizer=get_optimizer_by_string('adam', lr=2e-3),
        output_base_path=str(tmp_path / 'df'),
        train_generator=loader, epochs=5, steps_per_call=2)
    trainer.train()
    import csv, os
    rows = list(csv.DictReader(open(os.path.join(trainer.output_path,
                                                 'log.csv'))))
    losses = [float(r['train_loss']) for r in rows if r['epoch'].isdigit()]
    assert losses[-1] < losses[0]
