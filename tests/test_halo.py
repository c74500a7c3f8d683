'''Halo-exchange graph parallelism (parallel/halo.py).

Parity targets: the halo-sharded forward/backward must equal the
single-device dense-graph model to numerical precision, for aperiodic and
periodic systems, including a full training step; communication must be
boundary-block sized (ppermute payloads of n_halo atoms, never the global
atom count).
'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonnet_tpu.models import NewtonNet
from newtonnet_tpu.parallel import make_mesh
from newtonnet_tpu.parallel.halo import (
    check_halo_capacity,
    exchange_halo,
    make_halo_energy_force_fn,
    make_halo_train_step,
    shard_halo_batch,
    spatial_sort,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')

CUTOFF = 3.0


def _gas(B, N, box, seed, periodic):
    '''Random atom gas, sorted for slab decomposition.'''
    rs = np.random.RandomState(seed)
    z = rs.choice([1, 6, 8], size=(B, N)).astype(np.int32)
    pos = rs.rand(B, N, 3) * np.asarray(box)
    if periodic:
        cell = np.broadcast_to(np.diag(box), (B, 3, 3)).astype(float).copy()
    else:
        cell = np.zeros((B, 3, 3))
    force = rs.randn(B, N, 3)
    energy = rs.randn(B)
    z, pos, extra = spatial_sort(z, pos, cell if periodic else None,
                                 extra={'force': force}, n_shards=4)
    return {'z': z, 'pos': pos, 'cell': cell, 'energy': energy,
            'force': extra['force'], 'graph_mask': np.ones(B, bool)}


def _params_for(model, batch, rng):
    return model.init(rng, jnp.asarray(batch['z']),
                      jnp.asarray(batch['pos']), jnp.asarray(batch['cell']))


@pytest.mark.parametrize('periodic', [False, True])
def test_halo_energy_force_parity(periodic, rng):
    B, N = 2, 48
    box = [48.0, 6.0, 6.0]
    n_shards, n_halo = 4, 6
    batch = _gas(B, N, box, seed=0, periodic=periodic)
    assert check_halo_capacity(batch['z'], batch['pos'],
                               batch['cell'] if periodic else None,
                               n_shards, n_halo, CUTOFF) == 0

    dense = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                      n_interactions=2,
                      output_properties=['energy', 'gradient_force'])
    params = _params_for(dense, batch, rng)
    ref = dense.apply(params, jnp.asarray(batch['z']),
                      jnp.asarray(batch['pos']), jnp.asarray(batch['cell']))

    nl_model = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                         n_interactions=2, graph_mode='neighborlist',
                         k_max=24,
                         output_properties=['energy', 'gradient_force'])
    mesh = make_mesh(data=2, graph=n_shards)
    fn = make_halo_energy_force_fn(nl_model, mesh, n_halo)
    sb = shard_halo_batch(
        {k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    energy, forces = fn(params, sb['z'], sb['pos'], sb['cell'])

    np.testing.assert_allclose(np.asarray(energy), np.asarray(ref['energy']),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(forces),
                               np.asarray(ref['gradient_force']),
                               rtol=1e-7, atol=1e-9)


def test_halo_stress_parity(rng):
    '''Sharded stress (strain applied pre-exchange, disp grads psummed)
    == the dense-graph stress head.'''
    B, N = 2, 48
    n_shards, n_halo = 4, 6
    batch = _gas(B, N, [48.0, 6.0, 6.0], seed=7, periodic=True)
    assert check_halo_capacity(batch['z'], batch['pos'], batch['cell'],
                               n_shards, n_halo, CUTOFF) == 0

    dense = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                      n_interactions=2,
                      output_properties=['energy', 'gradient_force',
                                         'stress', 'virial'])
    params = _params_for(dense, batch, rng)
    ref = dense.apply(params, jnp.asarray(batch['z']),
                      jnp.asarray(batch['pos']), jnp.asarray(batch['cell']))

    nl_model = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                         n_interactions=2, graph_mode='neighborlist',
                         k_max=24,
                         output_properties=['energy', 'gradient_force'])
    mesh = make_mesh(data=2, graph=n_shards)
    fn = make_halo_energy_force_fn(nl_model, mesh, n_halo,
                                   compute_stress=True)
    sb = shard_halo_batch(
        {k: jnp.asarray(v) for k, v in batch.items()}, mesh)
    energy, forces, stress = fn(params, sb['z'], sb['pos'], sb['cell'])

    np.testing.assert_allclose(np.asarray(energy), np.asarray(ref['energy']),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(forces),
                               np.asarray(ref['gradient_force']),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(stress), np.asarray(ref['stress']),
                               rtol=1e-7, atol=1e-10)


def test_halo_train_step_parity(rng):
    '''One halo-sharded train step == the same step on one device.'''
    import optax

    B, N = 2, 48
    box = [48.0, 6.0, 6.0]
    n_shards, n_halo = 4, 6
    batch = _gas(B, N, box, seed=1, periodic=True)

    dense = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                      n_interactions=2,
                      output_properties=['energy', 'gradient_force'])
    params = _params_for(dense, batch, rng)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    # single-device reference step with identical loss semantics
    def ref_loss(p):
        out = dense.apply(p, jb['z'], jb['pos'], jb['cell'])
        gmask = jb['graph_mask'].astype(jb['pos'].dtype)
        amask = ((jb['z'] > 0) & jb['graph_mask'][:, None]).astype(
            jb['pos'].dtype)[..., None]
        e_err = (out['energy'] - jb['energy']) * gmask
        f_err = (out['gradient_force'] - jb['force']) * amask
        e_mse = jnp.sum(e_err ** 2) / jnp.sum(gmask)
        f_mse = jnp.sum(f_err ** 2) / (3 * jnp.sum(amask))
        return 1.0 * e_mse + 50.0 * f_mse

    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(params)
    updates, _ = tx.update(grads_ref, opt_state, params)
    params_ref = optax.apply_updates(params, updates)

    nl_model = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                         n_interactions=2, graph_mode='neighborlist',
                         k_max=24,
                         output_properties=['energy', 'gradient_force'])
    mesh = make_mesh(data=2, graph=n_shards)
    step = make_halo_train_step(nl_model, tx, mesh, n_halo,
                                energy_weight=1.0, force_weight=50.0)
    sb = shard_halo_batch(jb, mesh)
    params_halo, _, metrics = step(
        jax.tree.map(jnp.array, params), tx.init(params), sb)

    np.testing.assert_allclose(float(metrics['loss']), float(loss_ref),
                               rtol=1e-8)
    for a, b in zip(jax.tree.leaves(params_ref),
                    jax.tree.leaves(params_halo)):
        # fp32 params; adam's rsqrt amplifies reduction-order noise of the
        # psum tree vs the single-device sum
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=1e-7)


def test_halo_comm_is_boundary_sized():
    '''Every ppermute in the halo program moves n_halo-atom blocks, never
    the full (sharded or global) atom axis.'''
    B, N = 2, 48
    n_shards, n_halo = 4, 6
    n_loc = N // n_shards
    batch = _gas(B, N, [48.0, 6.0, 6.0], seed=2, periodic=False)

    nl_model = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                         n_interactions=2, graph_mode='neighborlist',
                         k_max=24,
                         output_properties=['energy', 'gradient_force'])
    mesh = make_mesh(data=2, graph=n_shards)
    params = nl_model.init(jax.random.PRNGKey(0),
                           jnp.asarray(batch['z']), jnp.asarray(batch['pos']),
                           jnp.asarray(batch['cell']))
    fn = make_halo_energy_force_fn(nl_model, mesh, n_halo)
    jaxpr = jax.make_jaxpr(
        lambda p, z, pos, cell: fn(p, z, pos, cell))(
            params, jnp.asarray(batch['z']), jnp.asarray(batch['pos']),
            jnp.asarray(batch['cell']))
    text = str(jaxpr)
    assert 'ppermute' in text
    import re
    # jaxpr eqn format: "out:f32[B,H,...] = ppermute[...] in" -- the payload
    # type/shape annotate the LHS binder
    payloads = re.findall(
        r'[a-z0-9_]+:[a-z0-9]+\[([0-9,]+)\] = ppermute\[', text)
    assert payloads, 'no ppermute payload shapes parsed from the jaxpr'
    for shape_s in payloads:
        shape = tuple(int(s) for s in shape_s.split(','))
        assert shape[1] == n_halo, f'oversized ppermute payload {shape}'
        assert shape[1] < n_loc, shape


def test_exchange_halo_roundtrip():
    '''exchange_halo places ring neighbors' boundary blocks correctly.'''
    from functools import partial
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(data=1, graph=4)
    N, H = 16, 2
    x = jnp.arange(N, dtype=jnp.float32)[None, :]  # (1, 16), 4 per shard

    f = shard_map(partial(exchange_halo, n_halo=H, axis_name='graph'),
                  mesh=mesh, in_specs=P(None, 'graph'),
                  out_specs=P(None, 'graph'), check_vma=False)
    out = np.asarray(f(x)).reshape(4, -1)  # per-shard extended rows
    # shard 1 owns [4..7]; left halo = shard 0's last H = [2, 3],
    # right halo = shard 2's first H = [8, 9]
    np.testing.assert_array_equal(out[1], [2, 3, 4, 5, 6, 7, 8, 9])
    # ring wrap: shard 0's left halo is shard 3's last block
    np.testing.assert_array_equal(out[0], [14, 15, 0, 1, 2, 3, 4, 5])


def test_check_halo_capacity_flags_undersized():
    batch = _gas(2, 48, [48.0, 6.0, 6.0], seed=3, periodic=False)
    assert check_halo_capacity(batch['z'], batch['pos'], None, 4, 8,
                               CUTOFF) == 0
    # a 1-atom halo cannot cover a 3 Angstrom boundary layer of a dense gas
    assert check_halo_capacity(batch['z'], batch['pos'], None, 4, 1,
                               CUTOFF) > 0


def test_halo_guards():
    '''Degenerate halo configurations raise instead of silently corrupting
    physics: n_halo=0 (drops cross-shard edges), 2 shards with overlapping
    halos (double-counts edges), and a 1-shard graph axis (distance-0
    ghosts).'''
    import optax

    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.parallel import make_mesh
    from newtonnet_tpu.parallel.halo import (exchange_halo,
                                             make_halo_train_step)

    model = NewtonNet(graph_mode='neighborlist', k_max=8, n_features=8,
                      n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'])
    tx = optax.adam(1e-3)
    with pytest.raises(ValueError, match='n_halo must be >= 1'):
        make_halo_train_step(model, tx, make_mesh(data=1, graph=4),
                             n_halo=0)
    with pytest.raises(ValueError, match='>= 2 shards'):
        make_halo_train_step(model, tx, make_mesh(data=8, graph=1),
                             n_halo=4)

    mesh2 = make_mesh(data=1, graph=2)
    x = jnp.zeros((1, 16, 3))  # N_loc=16 per shard after sharding by 2

    def bad(x):
        return exchange_halo(x, 10, 'graph')  # 2*10 > 16

    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    with pytest.raises(ValueError, match='double-count'):
        jax.jit(shard_map(bad, mesh=mesh2,
                          in_specs=P(None, 'graph', None),
                          out_specs=P(None, 'graph', None),
                          check_vma=False))(jnp.zeros((1, 32, 3)))


def test_trainer_halo_mode_matches_standard(rng):
    '''Trainer(mesh=..., halo=...) runs the halo-sharded step through the
    standard epoch loop: per-epoch metrics and the updated parameters
    match a single-device Trainer with the same loss configuration.'''
    from newtonnet_tpu.train import (Trainer, get_loss_by_string,
                                     get_optimizer_by_string)

    B, N = 2, 48
    box = [48.0, 6.0, 6.0]
    n_halo = 9
    batch = _gas(B, N, box, seed=3, periodic=True)
    losses = {'energy': {'mode': 'mse', 'weight': 1.0},
              'gradient_force': {'mode': 'mse', 'weight': 50.0}}

    dense = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                      n_interactions=2,
                      output_properties=['energy', 'gradient_force'])
    params = _params_for(dense, batch, rng)

    t_ref = Trainer(model=dense, params=jax.tree.map(jnp.array, params),
                    loss_fns=get_loss_by_string(losses),
                    optimizer=get_optimizer_by_string('adam', lr=1e-3),
                    steps_per_call=1)
    m_ref = t_ref.run_one_epoch([dict(batch)], step=True)

    nl_model = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                         n_interactions=2, graph_mode='neighborlist',
                         k_max=24,
                         output_properties=['energy', 'gradient_force'])
    mesh = make_mesh(data=2, graph=4)
    t_halo = Trainer(model=nl_model, params=jax.tree.map(jnp.array, params),
                     loss_fns=get_loss_by_string(losses),
                     optimizer=get_optimizer_by_string('adam', lr=1e-3),
                     mesh=mesh, halo={'n_halo': n_halo}, steps_per_call=1)
    m_halo = t_halo.run_one_epoch([dict(batch)], step=True)

    for key in ('loss', 'energy_mae', 'energy_mse', 'energy_per_atom_mae',
                'gradient_force_mae', 'gradient_force_mse'):
        np.testing.assert_allclose(m_halo[key], m_ref[key], rtol=1e-5,
                                   err_msg=key)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(a, b, atol=1e-7),
                 t_halo.params, t_ref.params)

    # eval epoch through the same halo path
    e_halo = t_halo.run_one_epoch([dict(batch)], step=False)
    e_ref = t_ref.run_one_epoch([dict(batch)], step=False)
    np.testing.assert_allclose(e_halo['loss'], e_ref['loss'], rtol=1e-5)

    # guardrails: bad halo config must fail loudly
    import pytest
    with pytest.raises(ValueError, match='graph'):
        Trainer(model=nl_model, params=params,
                loss_fns=get_loss_by_string(losses),
                halo={'n_halo': n_halo})
    with pytest.raises(ValueError, match='energy'):
        Trainer(model=nl_model, params=params,
                loss_fns=get_loss_by_string({'energy': {'mode': 'mae'}}),
                mesh=mesh, halo={'n_halo': n_halo})


def test_trainer_halo_capacity_enforced_every_batch(rng):
    '''A frame whose atoms violate the slab decomposition planted
    MID-epoch (batch 2, not batch 1) must be caught before it trains on
    silently wrong forces, and the clean epoch must pass -- per-batch
    enforcement, mirroring the load-bearing MD list-quality counters
    (tests/test_md.py) and the integrity the reference's per-forward
    dynamic graph gives for free (representations.py:96-98).'''
    from newtonnet_tpu.train import (Trainer, get_loss_by_string,
                                     get_optimizer_by_string)

    B, N = 2, 48
    box = [48.0, 6.0, 6.0]
    n_halo = 9
    good = _gas(B, N, box, seed=3, periodic=True)
    losses = {'energy': {'mode': 'mse', 'weight': 1.0},
              'gradient_force': {'mode': 'mse', 'weight': 50.0}}

    dense = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                      n_interactions=2,
                      output_properties=['energy', 'gradient_force'])
    params = _params_for(dense, good, rng)
    nl_model = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                         n_interactions=2, graph_mode='neighborlist',
                         k_max=24,
                         output_properties=['energy', 'gradient_force'])
    mesh = make_mesh(data=2, graph=4)
    trainer = Trainer(model=nl_model,
                      params=jax.tree.map(jnp.array, params),
                      loss_fns=get_loss_by_string(losses),
                      optimizer=get_optimizer_by_string('adam', lr=1e-3),
                      mesh=mesh, halo={'n_halo': n_halo}, steps_per_call=1)

    # clean epoch: two good batches, zero violations, trains fine
    metrics = trainer.run_one_epoch([dict(good), dict(good)], step=True)
    assert np.isfinite(metrics['loss'])

    # violating frame in batch 2: shuffle one frame's atom order so
    # boundary atoms land outside the n_halo blocks
    bad = {k: np.array(v) for k, v in good.items()}
    perm = np.random.RandomState(0).permutation(N)
    for key in ('z', 'pos', 'force'):
        bad[key][0] = bad[key][0][perm]
    assert check_halo_capacity(bad['z'], bad['pos'], bad['cell'],
                               4, n_halo, CUTOFF) > 0  # precondition
    with pytest.raises(ValueError, match='batch 2'):
        trainer.run_one_epoch([dict(good), bad], step=True)


def _ref_train_step(dense, params, tx, jb, weights):
    '''Single-device reference step with the exact loss semantics of
    make_halo_grads_fn's generalized config (masked mse battery).'''
    import optax

    def ref_loss(p):
        out = dense.apply(p, jb['z'], jb['pos'], jb['cell'])
        gmask = jb['graph_mask'].astype(jb['pos'].dtype)
        amask = ((jb['z'] > 0) & jb['graph_mask'][:, None]).astype(
            jb['pos'].dtype)[..., None]
        loss = 0.0
        if 'energy' in weights:
            e_err = (out['energy'] - jb['energy']) * gmask
            loss += weights['energy'] * jnp.sum(e_err ** 2) / jnp.sum(gmask)
        if 'gradient_force' in weights:
            f_err = (out['gradient_force'] - jb['force']) * amask
            loss += weights['gradient_force'] * jnp.sum(f_err ** 2) \
                / (3 * jnp.sum(amask))
        if 'direct_force' in weights:
            d_err = (out['direct_force'] - jb['force']) * amask
            loss += weights['direct_force'] * jnp.sum(d_err ** 2) \
                / (3 * jnp.sum(amask))
        for key in ('stress', 'virial'):
            if key in weights:
                t_err = (out[key] - jb[key]) * gmask[:, None, None]
                loss += weights[key] * jnp.sum(t_err ** 2) \
                    / (9 * jnp.sum(gmask))
        return loss

    loss_ref, grads_ref = jax.value_and_grad(ref_loss)(params)
    updates, _ = tx.update(grads_ref, tx.init(params), params)
    import optax as _optax
    return loss_ref, _optax.apply_updates(params, updates)


def test_halo_stress_training_parity(rng):
    '''A halo train step with the generalized loss config (energy + force
    + STRESS mse -- cell-labelled condensed-phase training) matches the
    single-device step: loss, metrics, and updated params.'''
    import optax

    B, N = 2, 48
    n_shards, n_halo = 4, 6
    batch = _gas(B, N, [48.0, 6.0, 6.0], seed=11, periodic=True)
    rs = np.random.RandomState(12)
    batch['stress'] = rs.randn(B, 3, 3) * 1e-2

    dense = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                      n_interactions=2,
                      output_properties=['energy', 'gradient_force',
                                         'stress'])
    params = _params_for(dense, batch, rng)
    tx = optax.adam(1e-3)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    weights = {'energy': 1.0, 'gradient_force': 50.0, 'stress': 100.0}
    loss_ref, params_ref = _ref_train_step(dense, params, tx, jb, weights)

    nl_model = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                         n_interactions=2, graph_mode='neighborlist',
                         k_max=24,
                         output_properties=['energy', 'gradient_force'])
    mesh = make_mesh(data=2, graph=n_shards)
    step = make_halo_train_step(
        nl_model, tx, mesh, n_halo,
        loss_config={k: {'weight': v} for k, v in weights.items()})
    sb = shard_halo_batch(jb, mesh)
    params_halo, _, metrics = step(
        jax.tree.map(jnp.array, params), tx.init(params), sb)

    np.testing.assert_allclose(float(metrics['loss']), float(loss_ref),
                               rtol=1e-8)
    assert 'stress_mae' in metrics and np.isfinite(float(metrics['stress_mae']))
    for a, b in zip(jax.tree.leaves(params_ref),
                    jax.tree.leaves(params_halo)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=1e-7)


def test_halo_virial_training_parity(rng):
    '''Same as the stress case for the virial label (-disp_grad, no 1/V).'''
    import optax

    B, N = 2, 48
    n_shards, n_halo = 4, 6
    batch = _gas(B, N, [48.0, 6.0, 6.0], seed=21, periodic=True)
    rs = np.random.RandomState(22)
    batch['virial'] = rs.randn(B, 3, 3)

    dense = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                      n_interactions=2,
                      output_properties=['energy', 'virial'])
    params = _params_for(dense, batch, rng)
    tx = optax.adam(1e-3)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    weights = {'energy': 1.0, 'virial': 10.0}
    loss_ref, params_ref = _ref_train_step(dense, params, tx, jb, weights)

    nl_model = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                         n_interactions=2, graph_mode='neighborlist',
                         k_max=24, output_properties=['energy'])
    mesh = make_mesh(data=2, graph=n_shards)
    step = make_halo_train_step(
        nl_model, tx, mesh, n_halo,
        loss_config={k: {'weight': v} for k, v in weights.items()})
    sb = shard_halo_batch(jb, mesh)
    params_halo, _, metrics = step(
        jax.tree.map(jnp.array, params), tx.init(params), sb)

    np.testing.assert_allclose(float(metrics['loss']), float(loss_ref),
                               rtol=1e-8)
    for a, b in zip(jax.tree.leaves(params_ref),
                    jax.tree.leaves(params_halo)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=1e-7)


def test_halo_charge_ewald_training_parity(rng):
    '''A halo train step on a charge-head model (latent Ewald long-range
    energy, reciprocal sum sharded via partial structure factors) matches
    the single-device step.'''
    import optax

    B, N = 2, 48
    n_shards, n_halo = 4, 6
    batch = _gas(B, N, [48.0, 6.0, 6.0], seed=31, periodic=True)

    ewald = dict(ewald_mode='periodic', ewald_sigma=1.5, ewald_n_k=4)
    dense = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                      n_interactions=2,
                      output_properties=['charge', 'energy',
                                         'gradient_force'], **ewald)
    params = _params_for(dense, batch, rng)
    tx = optax.adam(1e-3)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    weights = {'energy': 1.0, 'gradient_force': 50.0}
    loss_ref, params_ref = _ref_train_step(dense, params, tx, jb, weights)

    nl_model = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                         n_interactions=2, graph_mode='neighborlist',
                         k_max=24,
                         output_properties=['charge', 'energy',
                                            'gradient_force'], **ewald)
    mesh = make_mesh(data=2, graph=n_shards)
    step = make_halo_train_step(
        nl_model, tx, mesh, n_halo,
        loss_config={k: {'weight': v} for k, v in weights.items()})
    sb = shard_halo_batch(jb, mesh)
    params_halo, _, metrics = step(
        jax.tree.map(jnp.array, params), tx.init(params), sb)

    np.testing.assert_allclose(float(metrics['loss']), float(loss_ref),
                               rtol=1e-8)
    for a, b in zip(jax.tree.leaves(params_ref),
                    jax.tree.leaves(params_halo)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=1e-7)


def test_halo_direct_force_training_parity(rng):
    '''A halo train step with a DIRECT force loss (the reference's
    DirectForceLoss, ref loss.py:106-149) matches the single-device step:
    loss, params, and the cos/norm eval decompositions. The config has no
    gradient_force, so this also covers the derivative-free halo path.'''
    import optax

    from newtonnet_tpu.train.loss import get_loss_by_string

    B, N = 2, 48
    n_shards, n_halo = 4, 6
    batch = _gas(B, N, [48.0, 6.0, 6.0], seed=41, periodic=True)

    dense = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                      n_interactions=2,
                      output_properties=['energy', 'direct_force'])
    params = _params_for(dense, batch, rng)
    tx = optax.adam(1e-3)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    weights = {'energy': 1.0, 'direct_force': 20.0}
    loss_ref, params_ref = _ref_train_step(dense, params, tx, jb, weights)

    nl_model = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                         n_interactions=2, graph_mode='neighborlist',
                         k_max=24,
                         output_properties=['energy', 'direct_force'])
    mesh = make_mesh(data=2, graph=n_shards)
    step = make_halo_train_step(
        nl_model, tx, mesh, n_halo,
        loss_config={k: {'weight': v} for k, v in weights.items()})
    sb = shard_halo_batch(jb, mesh)
    params_halo, _, metrics = step(
        jax.tree.map(jnp.array, params), tx.init(params), sb)

    np.testing.assert_allclose(float(metrics['loss']), float(loss_ref),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(params_ref),
                    jax.tree.leaves(params_halo)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=1e-7)

    # the cos/norm eval decompositions match the train/loss.py battery
    # evaluated on the dense single-device predictions
    _, eval_loss = get_loss_by_string(
        {k: {'weight': v} for k, v in weights.items()})
    ref_metrics = eval_loss(dense.apply(params, jb['z'], jb['pos'],
                                        jb['cell']), jb)
    for key in ('direct_force_mae', 'direct_force_mse',
                'direct_force_cos_mae', 'direct_force_cos_mse',
                'direct_force_norm_mae', 'direct_force_norm_mse'):
        np.testing.assert_allclose(float(metrics[key]),
                                   float(ref_metrics[key]),
                                   rtol=2e-5, err_msg=key)


def test_halo_second_derivative_heads_rejected():
    '''hessian/bec heads under halo raise loudly with the documented
    rationale (their derivative lanes couple atoms beyond the one-ring
    halo) instead of silently training something else.'''
    import optax
    mesh = make_mesh(data=2, graph=4)
    for head in ('hessian', 'bec'):
        props = ['energy', head] if head == 'hessian' else \
            ['charge', 'energy', head]
        model = NewtonNet(graph_mode='neighborlist', k_max=8, n_features=8,
                          n_basis=4, n_interactions=1,
                          ewald_mode='periodic', output_properties=props)
        with pytest.raises(ValueError, match='second-derivative'):
            make_halo_train_step(model, optax.adam(1e-3), mesh, n_halo=4,
                                 loss_config={'energy': {}})
    # direct_force in the loss needs the head on the model
    model = NewtonNet(graph_mode='neighborlist', k_max=8, n_features=8,
                      n_basis=4, n_interactions=1,
                      output_properties=['energy'])
    with pytest.raises(ValueError, match='direct_force head'):
        make_halo_train_step(model, optax.adam(1e-3), mesh, n_halo=4,
                             loss_config={'energy': {},
                                          'direct_force': {}})


def test_halo_charge_requires_periodic_ewald():
    import optax
    model = NewtonNet(graph_mode='neighborlist', k_max=8, n_features=8,
                      n_basis=4, n_interactions=1,
                      output_properties=['charge', 'energy'])  # mode 'auto'
    with pytest.raises(ValueError, match="ewald_mode='periodic'"):
        make_halo_train_step(model, optax.adam(1e-3),
                             make_mesh(data=2, graph=4), n_halo=4,
                             loss_config={'energy': {}})


def test_halo_loss_config_guards():
    import optax
    model = NewtonNet(graph_mode='neighborlist', k_max=8, n_features=8,
                      n_basis=4, n_interactions=1,
                      output_properties=['energy'])
    mesh = make_mesh(data=2, graph=4)
    with pytest.raises(ValueError, match='losses within'):
        make_halo_train_step(model, optax.adam(1e-3), mesh, n_halo=4,
                             loss_config={'hessian': {}})
    with pytest.raises(ValueError, match='mse-only'):
        make_halo_train_step(model, optax.adam(1e-3), mesh, n_halo=4,
                             loss_config={'energy': {'mode': 'mae'}})
