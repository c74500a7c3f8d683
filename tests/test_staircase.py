'''Staircase-compacted newton3 half lists (ops/staircase.py).

The staircase layout is the large-N train-step formulation: the color
axis is chunked and each chunk only carries the atom prefix that still
needs it, cutting ~25% of slot rows off every per-edge row op (measured
54.3 -> 32.8 ms/step at N=4096 on TPU v5e, PERF_NOTES.md round-5).
These tests pin the builder's combinatorial invariants and full model
parity (forward + gradients) against the plain newton3 path, which is
itself parity-tested against the dense oracle (test_model_parity.py).

Reference context: the reference's dynamic COO graph pays exactly the
real edge count every forward (newtonnet/layers/representations.py:
70-98); the staircase recovers that property for static TPU shapes.
'''
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from newtonnet_tpu.ops.staircase import staircase_half_list, stair_nlist


def _frame(n=120, rho=0.08, seed=0):
    L = (n / rho) ** (1 / 3)
    rs = np.random.RandomState(seed)
    z = rs.choice([1, 6, 8], size=(1, n)).astype(np.int32)
    pos = (rs.rand(1, n, 3) * L).astype(np.float32)
    cell = np.diag([L, L, L]).astype(np.float32)[None]
    return z, pos, cell, L


def _full_list(z, pos, cell, cutoff, k=64):
    from newtonnet_tpu.ops.nlist import neighbor_list
    idx, kmask, _, _ = jax.jit(
        lambda p, c, m: neighbor_list(p, c, m, cutoff, k))(
        jnp.asarray(pos), jnp.asarray(cell), jnp.asarray(z > 0))
    return np.asarray(idx[0]), np.asarray(kmask[0])


def test_staircase_builder_invariants():
    cutoff = 4.5
    z, pos, cell, _ = _frame()
    idx, kmask = _full_list(z, pos, cell, cutoff)
    n = idx.shape[0]
    sl = staircase_half_list(idx, kmask, chunk=5, pad=4)

    # perm and inv_perm are mutually inverse permutations
    assert np.array_equal(sl.perm[sl.inv_perm], np.arange(n))
    assert np.array_equal(np.sort(sl.perm), np.arange(n))

    # reconstruct the undirected edge set from the chunks (sorted space
    # -> original ids) and compare with the input list's
    rows = np.repeat(np.arange(n), idx.shape[1])[kmask.ravel()]
    cols = idx.ravel()[kmask.ravel()]
    want = set(map(tuple, np.sort(np.stack([rows, cols], 1), axis=1)))
    got = []
    for ch in sl.chunks:
        ci, cm, cv, cvm = (a[0] for a in ch)
        c, w = ci.shape
        for t in range(c):
            src_s = np.flatnonzero(cm[t])
            dst_s = ci[t][src_s]
            # per-color injectivity on the in side
            assert len(dst_s) == len(np.unique(dst_s))
            # inverse map consistency: idx[t, inv[t, j]] == j
            tgt = np.flatnonzero(cvm[t])
            assert np.array_equal(ci[t][cv[t][tgt]], tgt)
            assert len(tgt) == len(src_s)
            # endpoints live inside the chunk prefix by construction
            assert dst_s.max(initial=-1) < w
            for u, v in zip(sl.perm[src_s], sl.perm[dst_s]):
                got.append((min(u, v), max(u, v)))
    assert len(got) == len(set(got)) == len(want)
    assert set(got) == want

    # chunk widths are monotonically non-increasing (the staircase)
    widths = [w for _, w in sl.widths]
    assert widths == sorted(widths, reverse=True)


def _models(cutoff, compact, **kw):
    from newtonnet_tpu.models import NewtonNet
    return NewtonNet(
        graph_mode='neighborlist', cutoff=cutoff, n_features=32, n_basis=8,
        n_interactions=3, k_max=48, newton3=not compact,
        newton3_compact=compact,
        output_properties=['energy', 'gradient_force'], **kw)


def _newton3_inputs(z, pos, cell, cutoff):
    from newtonnet_tpu.data.prelists import frame_neighbor_lists
    from newtonnet_tpu.ops.nlist import build_inverse_list
    idx, m = frame_neighbor_lists(z[0], pos[0], cell[0], cutoff, 48,
                                  mode='newton3')
    idxj, mj = jnp.asarray(idx[None]), jnp.asarray(m[None])
    inv, invm = build_inverse_list(jnp.swapaxes(idxj, 1, 2),
                                   jnp.swapaxes(mj, 1, 2))
    return (idxj, mj, inv, invm)


def test_staircase_model_parity():
    '''Energy/forces and parameter gradients match the newton3 path.'''
    cutoff = 4.5
    z, pos, cell, _ = _frame(seed=3)
    m3 = _models(cutoff, compact=False)
    mc = _models(cutoff, compact=True)
    params = m3.init(jax.random.PRNGKey(0), jnp.asarray(z),
                     jnp.asarray(pos), jnp.asarray(cell))
    # identical parameter trees: one checkpoint serves both layouts
    assert jax.tree_util.tree_structure(params) == \
        jax.tree_util.tree_structure(
            mc.init(jax.random.PRNGKey(0), jnp.asarray(z),
                    jnp.asarray(pos), jnp.asarray(cell)))

    nl3 = _newton3_inputs(z, pos, cell, cutoff)
    out3 = m3.apply(params, jnp.asarray(z), jnp.asarray(pos),
                    jnp.asarray(cell), nlist=nl3)

    idx, kmask = _full_list(z, pos, cell, cutoff)
    sl = staircase_half_list(idx, kmask, chunk=6)
    nlc = tuple(tuple(jnp.asarray(a) for a in ch) for ch in stair_nlist(sl))
    zs, ps = z[:, sl.perm], pos[:, sl.perm]
    outc = mc.apply(params, jnp.asarray(zs), jnp.asarray(ps),
                    jnp.asarray(cell), nlist=nlc)

    e3, ec = np.asarray(out3['energy']), np.asarray(outc['energy'])
    f3 = np.asarray(out3['gradient_force'])[0]
    fc = np.asarray(outc['gradient_force'])[0][sl.inv_perm]
    assert abs(e3 - ec).max() < 1e-4 * max(1.0, abs(e3).max())
    assert np.abs(f3 - fc).max() < 1e-4 * np.abs(f3).max() + 1e-6

    # parameter gradients of the training loss agree
    from newtonnet_tpu.train import get_loss_by_string
    loss_fn, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 20.0}})
    force = np.random.RandomState(7).randn(*pos.shape).astype(np.float32)
    b3 = {'z': jnp.asarray(z), 'pos': jnp.asarray(pos),
          'cell': jnp.asarray(cell), 'energy': jnp.zeros((1,)),
          'force': jnp.asarray(force), 'graph_mask': jnp.ones((1,), bool)}
    bc = dict(b3, z=jnp.asarray(zs), pos=jnp.asarray(ps),
              force=jnp.asarray(force[:, sl.perm]))

    def loss3(p):
        return loss_fn(m3.apply(p, b3['z'], b3['pos'], b3['cell'],
                                nlist=nl3), b3)

    def lossc(p):
        return loss_fn(mc.apply(p, bc['z'], bc['pos'], bc['cell'],
                                nlist=nlc), bc)

    l3, g3 = jax.value_and_grad(loss3)(params)
    lc, gc = jax.value_and_grad(lossc)(params)
    assert abs(float(l3) - float(lc)) < 1e-4 * abs(float(l3))
    flat3, _ = jax.flatten_util.ravel_pytree(g3)
    flatc, _ = jax.flatten_util.ravel_pytree(gc)
    scale = float(jnp.abs(flat3).max())
    assert float(jnp.abs(flat3 - flatc).max()) < 2e-4 * scale + 1e-7


def test_staircase_plan_reuse_and_overflow():
    '''A previous build's widths fix the static shapes for new frames.'''
    cutoff = 4.5
    z, pos, cell, L = _frame(seed=0)
    idx, kmask = _full_list(z, pos, cell, cutoff)
    sl = staircase_half_list(idx, kmask, chunk=5)

    # a slightly perturbed frame fits the same plan -> identical widths
    pos2 = pos + np.random.RandomState(1).randn(*pos.shape).astype(
        np.float32) * 0.02
    idx2, kmask2 = _full_list(z, pos2, cell, cutoff)
    sl2 = staircase_half_list(idx2, kmask2, chunk=5, plan=sl.widths)
    assert sl2.widths == sl.widths

    # a much denser frame must refuse the plan loudly, not overflow
    pos3 = (pos * 0.55).astype(np.float32)
    cell3 = (cell * 0.55).astype(np.float32)
    idx3, kmask3 = _full_list(z, pos3, cell3, cutoff, k=96)
    with pytest.raises(ValueError, match='plan provides'):
        staircase_half_list(idx3, kmask3, chunk=5, plan=sl.widths)


def test_staircase_guards():
    from newtonnet_tpu.models import NewtonNet
    # hessian/bec heads are rejected at construction
    with pytest.raises(ValueError, match='newton3_compact'):
        NewtonNet(graph_mode='neighborlist', newton3_compact=True,
                  output_properties=['energy', 'hessian'])
    # incompatible layouts are rejected
    with pytest.raises(ValueError, match='newton3_compact'):
        NewtonNet(graph_mode='neighborlist', newton3_compact=True,
                  newton3=True, output_properties=['energy'])
    # applying without a staircase nlist is refused outside init
    cutoff = 4.5
    z, pos, cell, _ = _frame(seed=2)
    mc = _models(cutoff, compact=True)
    params = mc.init(jax.random.PRNGKey(0), jnp.asarray(z),
                     jnp.asarray(pos), jnp.asarray(cell))
    with pytest.raises(ValueError, match='staircase'):
        mc.apply(params, jnp.asarray(z), jnp.asarray(pos),
                 jnp.asarray(cell))


def test_staircase_through_trainer():
    '''NeighborListDataset mode='newton3c' + Trainer: epochs on staircase
    batches (frames pre-permuted, chunk tuples riding the batch, the
    scan-chunked stacking path) match the in-jit-graph epochs of the plain
    model on the same frames.'''
    import jax
    from newtonnet_tpu.data import collate
    from newtonnet_tpu.data.prelists import NeighborListDataset
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import (Trainer, get_loss_by_string,
                                     get_optimizer_by_string)

    N, B = 14, 2

    class Frames:
        def __len__(self):
            return 2 * B

        def __getitem__(self, i):
            r = np.random.RandomState(400 + i)
            cell = np.diag([8.5, 8.5, 8.5])
            return {'z': r.choice([1, 6, 8], size=N).astype(np.int32),
                    'pos': r.rand(N, 3) @ cell, 'cell': cell,
                    'energy': float(r.randn()), 'force': r.randn(N, 3)}

    common = dict(graph_mode='neighborlist', cutoff=4.5, n_features=8,
                  n_basis=4, n_interactions=2,
                  output_properties=['energy', 'gradient_force'])

    def epochs(compact):
        src = Frames()
        ds = (NeighborListDataset(src, cutoff=4.5, k_max=10, mode='newton3c',
                                  stair_chunk=3, stair_pad=2,
                                  stair_margin=8)
              if compact else src)
        model = NewtonNet(k_max=16, newton3_compact=compact, **common)
        batches = [collate([ds[i + c * B] for i in range(B)], n_pad=N,
                           batch_pad=B) for c in range(2)]
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(batches[0]['z']),
                            jnp.asarray(batches[0]['pos']),
                            jnp.asarray(batches[0]['cell']))
        t = Trainer(model=model, params=params,
                    loss_fns=get_loss_by_string(
                        {'energy': {}, 'gradient_force': {'weight': 5.0}}),
                    optimizer=get_optimizer_by_string('adam', lr=1e-3),
                    steps_per_call=2)  # exercise the stacked-scan path
        logs = [t.run_one_epoch(batches, step=True) for _ in range(2)]
        return [lg['loss'] for lg in logs]

    l_plain = epochs(False)
    l_stair = epochs(True)
    np.testing.assert_allclose(l_plain, l_stair, rtol=5e-5)


def test_trainer_rejects_stair_mode_mismatch():
    '''Staircase batches and newton3_compact models must pair both ways.'''
    import jax
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
            r = np.random.RandomState(500 + i)
            cell = np.diag([7.0, 7.0, 7.0])
            return {'z': r.choice([1, 8], size=N).astype(np.int32),
                    'pos': r.rand(N, 3) @ cell, 'cell': cell,
                    'energy': 0.0, 'force': np.zeros((N, 3))}

    common = dict(graph_mode='neighborlist', cutoff=4.0, n_features=8,
                  n_basis=4, n_interactions=1,
                  output_properties=['energy', 'gradient_force'])

    def make_trainer(model, batch):
        params = model.init(jax.random.PRNGKey(0),
                            jnp.asarray(batch['z']),
                            jnp.asarray(batch['pos']),
                            jnp.asarray(batch['cell']))
        return Trainer(model=model, params=params,
                       loss_fns=get_loss_by_string({'energy': {}}),
                       optimizer=get_optimizer_by_string('adam', lr=1e-3))

    # staircase batch into a non-compact model
    ds = NeighborListDataset(Frames(), cutoff=4.0, k_max=9, mode='newton3c',
                             stair_chunk=3, stair_pad=2)
    stair_batch = collate([ds[i] for i in range(B)], n_pad=N, batch_pad=B)
    plain_model = NewtonNet(k_max=16, **common)
    with pytest.raises(ValueError, match='newton3_compact'):
        make_trainer(plain_model, stair_batch).run_one_epoch(
            [stair_batch], step=True)

    # plain batch into a compact model
    plain_batch = collate([Frames()[i] for i in range(B)], n_pad=N,
                          batch_pad=B)
    compact_model = NewtonNet(k_max=16, newton3_compact=True, **common)
    with pytest.raises(ValueError, match='newton3_compact'):
        make_trainer(compact_model, plain_batch).run_one_epoch(
            [plain_batch], step=True)


def test_staircase_train_cli_subprocess(tmp_path):
    '''The full production path: YAML `data.precompute_nlist: {mode:
    newton3c}` + `model: {newton3_compact: true}` through the real
    training CLI, end to end in a subprocess.'''
    import os
    import subprocess
    import sys

    import yaml

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = {
        'general': {'device': 'cpu', 'output': str(tmp_path / 'out'),
                    'precision': 'float32', 'seed': 0},
        'data': {'train_root': os.path.join(repo, 'data', 'md17_aspirin',
                                            'ccsd_train'),
                 'train_size': 8, 'val_size': 4, 'test_size': 0,
                 'train_batch_size': 4, 'val_batch_size': 4,
                 'precompute_nlist': {'cutoff': 5.0, 'k_max': 16,
                                      'mode': 'newton3c'}},
        'model': {'n_features': 8, 'n_basis': 4, 'n_interactions': 1,
                  'graph_mode': 'neighborlist', 'k_max': 16,
                  'newton3_compact': True,
                  'output_properties': ['energy', 'gradient_force']},
        'training': {'loss': {'energy': {}, 'gradient_force':
                              {'weight': 50.0}},
                     'optimizer': {'adam': {'lr': 1e-3}},
                     'epochs': 1, 'checkpoint': {'check_log': 1}},
    }
    cfg_path = tmp_path / 'c.yml'
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, 'scripts', 'newtonnet_train.py'),
         '--config', str(cfg_path)],
        capture_output=True, text=True, timeout=400)
    assert out.returncode == 0, out.stderr[-1500:]
    assert 'done!' in out.stdout
    assert (tmp_path / 'out' / 'training_1' / 'models'
            / 'best_model.msgpack').exists()


def test_staircase_md_matches_newton3_driver():
    '''Host-rebuild MD with staircase lists (atoms re-sorted by slot need
    at every rebuild, state permuted on device, cumulative permutation
    undone at the end) integrates the same trajectory as the newton3
    host-rebuild driver. friction=0 makes the Langevin integrator
    noise-free, so trajectories are deterministic and comparable across
    the two atom orderings.'''
    from newtonnet_tpu.data import units
    from newtonnet_tpu.md.driver import run_langevin_on_device
    from newtonnet_tpu.md.system import System, maxwell_boltzmann
    from newtonnet_tpu.models import NewtonNet

    rs = np.random.RandomState(1)
    n = 48
    L = (n / 0.02) ** (1 / 3)
    cell = np.diag([L, L, L])
    pos = rs.rand(n, 3) @ cell
    numbers = rs.choice([1, 1, 8], size=n)

    def fresh():
        s = System(numbers, pos.copy(), cell=cell, pbc=[True] * 3)
        maxwell_boltzmann(s, 300.0, rng=np.random.default_rng(0))
        return s

    results = {}
    for compact in (False, True):
        model = NewtonNet(graph_mode='neighborlist', k_max=24,
                          newton3=not compact, newton3_compact=compact,
                          output_properties=['energy', 'gradient_force'])
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(numbers[None], jnp.int32),
            jnp.asarray(pos[None], jnp.float32),
            jnp.asarray(cell[None], jnp.float32))
        params = jax.tree.map(lambda x: x * 0.1, params)
        s, log = run_langevin_on_device(
            model, params, fresh(), timestep=0.5 * units.fs,
            temperature_K=300, friction=0.0, n_steps=9, log_every=1,
            nlist_every=3, seed=0)
        results[compact] = (s.positions.copy(), s.momenta.copy(),
                            log['epot'])
    np.testing.assert_allclose(results[True][0], results[False][0],
                               atol=1e-5)
    np.testing.assert_allclose(results[True][1], results[False][1],
                               atol=1e-4)
    np.testing.assert_allclose(results[True][2], results[False][2],
                               atol=1e-4)


def test_staircase_md_heterogeneous_replicas():
    '''The staircase MD shape plan must cover ALL replicas, not just
    replica 0: a batched run of a sparse and a denser system previously
    failed at the first rebuild with a misleading drift error.'''
    from newtonnet_tpu.data import units
    from newtonnet_tpu.md.driver import run_langevin_on_device
    from newtonnet_tpu.md.system import System, maxwell_boltzmann
    from newtonnet_tpu.models import NewtonNet

    rs = np.random.RandomState(4)
    n = 32

    def make(rho):
        L = (n / rho) ** (1 / 3)
        cell = np.diag([L, L, L])
        s = System(rs.choice([1, 8], size=n), rs.rand(n, 3) @ cell,
                   cell=cell, pbc=[True] * 3)
        maxwell_boltzmann(s, 300.0, rng=np.random.default_rng(0))
        return s

    systems = [make(0.01), make(0.05)]  # sparse first: the old bug path
    model = NewtonNet(graph_mode='neighborlist', k_max=24,
                      newton3_compact=True,
                      output_properties=['energy', 'gradient_force'])
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(np.stack([s.numbers for s in systems]), jnp.int32),
        jnp.asarray(np.stack([s.positions for s in systems]), jnp.float32),
        jnp.asarray(np.stack([s.cell for s in systems]), jnp.float32))
    params = jax.tree.map(lambda x: x * 0.1, params)
    out, log = run_langevin_on_device(
        model, params, systems, timestep=0.5 * units.fs, temperature_K=300,
        friction=0.0, n_steps=4, log_every=1, nlist_every=2, seed=0)
    assert np.isfinite(log['epot']).all()
    assert len(out) == 2


def test_staircase_md_requires_host_rebuild_mode():
    from newtonnet_tpu.data import units
    from newtonnet_tpu.md.driver import run_langevin_on_device
    from newtonnet_tpu.md.system import System
    from newtonnet_tpu.models import NewtonNet

    s = System([8, 1, 1], np.eye(3))
    model = NewtonNet(graph_mode='neighborlist', k_max=8,
                      newton3_compact=True,
                      output_properties=['energy', 'gradient_force'])
    with pytest.raises(ValueError, match='host-rebuild'):
        run_langevin_on_device(model, {}, s, timestep=0.5 * units.fs,
                               temperature_K=300, friction=0.0, n_steps=2,
                               log_every=1, nlist_every=0, seed=0)


def test_calculator_serves_compact_checkpoints():
    '''The calculator transparently serves staircase-trained checkpoints
    through the rectangular newton3 layout (identical parameters), so a
    single-structure call neither recompiles per geometry nor demands
    staircase chunk plumbing.'''
    from newtonnet_tpu.md.calculator import NewtonNetCalculator

    cutoff = 4.5
    z, pos, cell, _ = _frame(n=40, seed=5)
    mc = _models(cutoff, compact=True)
    params = mc.init(jax.random.PRNGKey(0), jnp.asarray(z),
                     jnp.asarray(pos), jnp.asarray(cell))

    calc = NewtonNetCalculator(model=mc, params=params,
                               properties=['energy', 'forces'])
    assert calc.model.newton3 and not calc.model.newton3_compact
    res = calc.calculate(numbers=z[0], positions=pos[0],
                         cell=cell[0])

    m3 = _models(cutoff, compact=False)
    nl3 = _newton3_inputs(z, pos, cell, cutoff)
    out3 = m3.apply(params, jnp.asarray(z), jnp.asarray(pos),
                    jnp.asarray(cell), nlist=nl3)
    np.testing.assert_allclose(res['energy'],
                               float(out3['energy'][0]), rtol=1e-5)
    np.testing.assert_allclose(res['forces'],
                               np.asarray(out3['gradient_force'])[0],
                               atol=1e-5)


def test_export_serves_fast_list_checkpoints():
    '''AOT export rebuilds host-built-list models (newton3 / staircase /
    inverse) through the self-contained plain in-jit layout -- parameters
    are layout-portable, and a serialized StableHLO program cannot run
    host colorings per structure.'''
    from newtonnet_tpu.utils.export import export_inference

    cutoff = 4.5
    z, pos, cell, _ = _frame(n=40, seed=6)
    mc = _models(cutoff, compact=True)
    params = mc.init(jax.random.PRNGKey(0), jnp.asarray(z),
                     jnp.asarray(pos), jnp.asarray(cell))

    header, blob = export_inference(mc, params, n_atoms=40, batch_size=1,
                                    properties=['energy', 'gradient_force'])
    from jax import export as jax_export
    fn = jax_export.deserialize(blob)
    zp = np.zeros((1, header['n_pad']), np.int32)
    pp = np.zeros((1, header['n_pad'], 3), np.float32)
    zp[0, :40], pp[0, :40] = z[0], pos[0]
    out = fn.call(jnp.asarray(zp), jnp.asarray(pp), jnp.asarray(cell))

    m3 = _models(cutoff, compact=False)
    nl3 = _newton3_inputs(z, pos, cell, cutoff)
    ref = m3.apply(params, jnp.asarray(z), jnp.asarray(pos),
                   jnp.asarray(cell), nlist=nl3)
    np.testing.assert_allclose(np.asarray(out['energy']),
                               np.asarray(ref['energy']), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(out['gradient_force'])[0, :40],
        np.asarray(ref['gradient_force'])[0], atol=2e-5)


def test_staircase_chunks_rejects_colors_beyond_plan():
    '''A plan shorter than the coloring's palette must raise, not
    silently drop the out-of-range edges from every chunk.'''
    from newtonnet_tpu.ops.staircase import (staircase_chunks,
                                             staircase_colors)
    cutoff = 4.5
    z, pos, cell, _ = _frame(seed=7)
    idx, kmask = _full_list(z, pos, cell, cutoff)
    colored = staircase_colors(idx, kmask)
    cap = int(colored[3].max()) + 1
    short_plan = ((max(1, cap - 2), pos.shape[1]),)
    with pytest.raises(ValueError, match='colors'):
        staircase_chunks(colored, plan=short_plan)


def test_staircase_md_dilute_plus_dense_replicas():
    '''A dilute replica whose Konig palette is smaller than one chunk
    batched with a dense one: the plan must still cover the dense
    replica's colors (previously its high-color edges were dropped).'''
    from newtonnet_tpu.data import units
    from newtonnet_tpu.md.driver import run_langevin_on_device
    from newtonnet_tpu.md.system import System, maxwell_boltzmann
    from newtonnet_tpu.models import NewtonNet

    rs = np.random.RandomState(6)
    n = 24

    def make(rho):
        L = (n / rho) ** (1 / 3)
        cell = np.diag([L, L, L])
        s = System(rs.choice([1, 8], size=n), rs.rand(n, 3) @ cell,
                   cell=cell, pbc=[True] * 3)
        maxwell_boltzmann(s, 300.0, rng=np.random.default_rng(0))
        return s

    systems = [make(0.002), make(0.08)]  # near-isolated gas + liquid
    model = NewtonNet(graph_mode='neighborlist', k_max=24,
                      newton3_compact=True,
                      output_properties=['energy', 'gradient_force'])
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(np.stack([s.numbers for s in systems]), jnp.int32),
        jnp.asarray(np.stack([s.positions for s in systems]), jnp.float32),
        jnp.asarray(np.stack([s.cell for s in systems]), jnp.float32))
    params = jax.tree.map(lambda x: x * 0.1, params)
    out, log = run_langevin_on_device(
        model, params, systems, timestep=0.5 * units.fs, temperature_K=300,
        friction=0.0, n_steps=4, log_every=1, nlist_every=2, seed=0)
    assert np.isfinite(log['epot']).all()
    # the dense replica's trajectory must match a rectangular-newton3 run
    # of the same system alone (dropped high-color edges would shift it);
    # friction=0 makes both runs deterministic
    rs = np.random.RandomState(6)
    dilute, dense = make(0.002), make(0.08)
    m3 = NewtonNet(graph_mode='neighborlist', k_max=24, newton3=True,
                   output_properties=['energy', 'gradient_force'])
    _, log3 = run_langevin_on_device(
        m3, params, dense, timestep=0.5 * units.fs, temperature_K=300,
        friction=0.0, n_steps=4, log_every=1, nlist_every=2, seed=0)
    np.testing.assert_allclose(log['epot'][:, 1], log3['epot'], atol=1e-4)


def test_calculator_preserves_param_dtype():
    from newtonnet_tpu.md.calculator import NewtonNetCalculator
    from newtonnet_tpu.models import NewtonNet

    z, pos, cell, _ = _frame(n=24, seed=8)
    mc = NewtonNet(graph_mode='neighborlist', cutoff=4.5, n_features=8,
                   n_basis=4, n_interactions=1, k_max=24,
                   newton3_compact=True, param_dtype=jnp.float64,
                   output_properties=['energy', 'gradient_force'])
    params = mc.init(jax.random.PRNGKey(0), jnp.asarray(z),
                     jnp.asarray(pos), jnp.asarray(cell))
    calc = NewtonNetCalculator(model=mc, params=params,
                               properties=['energy', 'forces'],
                               precision='float64')
    assert calc.model.param_dtype == jnp.float64
