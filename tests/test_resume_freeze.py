'''Checkpoint/resume fidelity and pretrained freeze masks.

The strongest resume test: training N epochs straight must equal training
N/2 epochs, stopping, and resuming for N/2 more -- parameters and logged
metrics included (reference semantics: trainer.py:128-149 restores model/
optimizer/scheduler/RNG/log).
'''
import csv
import os

import jax
import pytest  # noqa: F401 (slow marker)
import jax.numpy as jnp
import numpy as np

from newtonnet_tpu.data import parse_train_test
from newtonnet_tpu.models import NewtonNet
from newtonnet_tpu.train import (
    Trainer,
    get_loss_by_string,
    get_optimizer_by_string,
    get_scheduler_by_string,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TRAIN_ROOT = os.path.join(ROOT, 'data', 'md17_aspirin', 'ccsd_train')


def _setup(out_dir, epochs, seed=0):
    train_gen, val_gen, _, _ = parse_train_test(
        train_root=TRAIN_ROOT, train_size=16, val_size=8, test_size=0,
        train_batch_size=4, val_batch_size=8, seed=seed)
    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'])
    b = next(iter(train_gen))
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(b['z']),
                        jnp.asarray(b['pos']), jnp.asarray(b['cell']))
    trainer = Trainer(
        model=model, params=params,
        loss_fns=get_loss_by_string({'energy': {},
                                     'gradient_force': {'weight': 50.0}}),
        optimizer=get_optimizer_by_string('adam', lr=1e-3),
        lr_scheduler=get_scheduler_by_string(
            [('plateau', {'patience': 1, 'factor': 0.5})], 1e-3),
        output_base_path=out_dir,
        train_generator=train_gen, val_generator=val_gen,
        epochs=epochs, steps_per_call=2,
        checkpoint={'check_val': 1, 'check_log': 1})
    return trainer


@pytest.mark.slow
def test_resume_reproduces_uninterrupted_run(tmp_path):
    # straight 4-epoch run
    t_full = _setup(os.path.join(tmp_path, 'full'), epochs=4)
    t_full.train()

    # 2 epochs, then resume for 2 more
    t_a = _setup(os.path.join(tmp_path, 'split'), epochs=2)
    t_a.train()
    t_b = _setup(os.path.join(tmp_path, 'split'), epochs=4)
    t_b.resume(t_a.output_path)
    t_b.train()

    for a, b in zip(jax.tree.leaves(t_full.params),
                    jax.tree.leaves(t_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=1e-7)

    rows_full = [r for r in csv.DictReader(
        open(os.path.join(t_full.output_path, 'log.csv')))
        if r['epoch'].isdigit()]
    rows_split = [r for r in csv.DictReader(
        open(os.path.join(t_b.output_path, 'log.csv')))
        if r['epoch'].isdigit()]
    assert [r['epoch'] for r in rows_split] == ['0', '1', '2', '3']
    for rf, rs in zip(rows_full, rows_split):
        np.testing.assert_allclose(float(rf['train_loss']),
                                   float(rs['train_loss']), rtol=1e-4)


def test_freeze_masks_stop_updates(tmp_path, rng):
    import optax
    from newtonnet_tpu.utils.freeze import build_freeze_mask

    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'])
    z = jnp.asarray([[6, 1, 1, 0]], jnp.int32)
    pos = jax.random.normal(rng, (1, 4, 3))
    cell = jnp.zeros((1, 3, 3))
    params = model.init(rng, z, pos, cell)
    mask = build_freeze_mask(params, freeze_encoder=True,
                             freeze_interaction=True)
    tx = get_optimizer_by_string('adam', lr=1e-2, freeze=mask)
    opt_state = tx.init(params)

    def loss(p):
        return jnp.sum(model.apply(p, z, pos, cell)['energy'] ** 2)

    grads = jax.grad(loss)(params)
    updates, _ = tx.update(grads, opt_state, params)
    new = optax.apply_updates(params, updates)

    p0, p1 = params['params'], new['params']
    np.testing.assert_array_equal(p0['node_embedding'], p1['node_embedding'])
    for leaf0, leaf1 in zip(jax.tree.leaves(p0['interaction_0']),
                            jax.tree.leaves(p1['interaction_0'])):
        np.testing.assert_array_equal(leaf0, leaf1)
    # decoder must still learn
    assert not np.allclose(
        np.asarray(jax.tree.leaves(p0['energy_head'])[0]),
        np.asarray(jax.tree.leaves(p1['energy_head'])[0]))
