'''CLI plumbing (subprocess), head-ordering robustness, virial/stress
consistency, and the ASE calculator bridge (exercised via a stub ase).'''

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_property_order_is_dependency_free(rng):
    '''The reference requires charge < energy < gradient_force ordering in
    output_properties (SURVEY.md call-stack constraint); here any order
    must work because dependencies are resolved internally.'''
    from newtonnet_tpu.models import NewtonNet
    rs = np.random.RandomState(0)
    z = jnp.asarray(rs.choice([1, 6, 8], size=(1, 6)), jnp.int32)
    pos = jnp.asarray(rs.randn(1, 6, 3) * 2, jnp.float64)
    cell = jnp.zeros((1, 3, 3), jnp.float64)
    kw = dict(n_features=8, n_basis=4, n_interactions=1, param_dtype=jnp.float64)
    m1 = NewtonNet(output_properties=['charge', 'energy', 'gradient_force'],
                   **kw)
    m2 = NewtonNet(output_properties=['gradient_force', 'energy', 'charge'],
                   **kw)
    params = m1.init(rng, z, pos, cell)
    o1 = m1.apply(params, z, pos, cell)
    o2 = m2.apply(params, z, pos, cell)
    np.testing.assert_allclose(o1['energy'], o2['energy'], rtol=1e-12)
    np.testing.assert_allclose(o1['gradient_force'], o2['gradient_force'],
                               rtol=1e-10)


def test_virial_stress_consistency(rng):
    '''stress = -virial / volume (ref output.py:164 vs :174-180 sign
    conventions: virial = -dE/deps, stress = +dE/deps / V).'''
    from newtonnet_tpu.models import NewtonNet
    rs = np.random.RandomState(1)
    cell = jnp.asarray(np.diag([8.0, 9.0, 10.0])[None], jnp.float64)
    pos = jnp.asarray(rs.rand(1, 6, 3), jnp.float64) @ cell[0]
    z = jnp.asarray(rs.choice([1, 6], size=(1, 6)), jnp.int32)
    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'virial', 'stress'],
                      param_dtype=jnp.float64)
    params = model.init(rng, z, pos, cell)
    out = model.apply(params, z, pos, cell)
    volume = float(jnp.linalg.det(cell[0]))
    np.testing.assert_allclose(np.asarray(out['stress'][0]),
                               -np.asarray(out['virial'][0]) / volume,
                               rtol=1e-10)


@pytest.mark.parametrize('in_memory', ['--in-memory', '--no-in-memory'])
def test_preprocess_cli(tmp_path, in_memory):
    from newtonnet_tpu.data.xyz import Frame, write_extxyz
    root = os.path.join(tmp_path, 'ds')
    os.makedirs(os.path.join(root, 'raw'))
    rs = np.random.RandomState(0)
    frames = [Frame(numbers=[6, 1], positions=rs.randn(2, 3),
                    energy=1.0, forces=rs.randn(2, 3)) for _ in range(3)]
    write_extxyz(os.path.join(root, 'raw', 'a.xyz'), frames)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', 'preprocess.py'),
         '--root', root, in_memory],
        capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stderr[-800:]
    assert 'processed 3 frames' in out.stdout


def test_train_cli_subprocess(tmp_path):
    cfg = {
        'general': {'device': 'cpu', 'output': str(tmp_path / 'out'),
                    'precision': 'float32', 'seed': 0},
        'data': {'train_root': os.path.join(REPO, 'data', 'md17_aspirin',
                                            'ccsd_train'),
                 'train_size': 8, 'val_size': 4, 'test_size': 0,
                 'train_batch_size': 4, 'val_batch_size': 4},
        'model': {'n_features': 8, 'n_basis': 4, 'n_interactions': 1,
                  'output_properties': ['energy', 'gradient_force']},
        'training': {'loss': {'energy': {}, 'gradient_force':
                              {'weight': 50.0}},
                     'optimizer': {'adam': {'lr': 1e-3}},
                     'epochs': 1, 'checkpoint': {'check_log': 1}},
    }
    import yaml
    cfg_path = tmp_path / 'c.yml'
    cfg_path.write_text(yaml.safe_dump(cfg))
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', 'newtonnet_train.py'),
         '--config', str(cfg_path)],
        capture_output=True, text=True, timeout=400)
    assert out.returncode == 0, out.stderr[-1500:]
    assert 'done!' in out.stdout
    assert (tmp_path / 'out' / 'training_1' / 'log.csv').exists()
    assert (tmp_path / 'out' / 'training_1' / 'models'
            / 'best_model.msgpack').exists()


def test_ase_bridge_with_stub(rng, monkeypatch):
    '''Exercise MLAseCalculator against a minimal fake ase module.'''
    import types

    class FakeCalculator:
        def __init__(self, **kw):
            self.results = {}

        def calculate(self, atoms=None, properties=None,
                      system_changes=None):
            pass

    calc_mod = types.ModuleType('ase.calculators.calculator')
    calc_mod.Calculator = FakeCalculator
    calc_mod.all_changes = ['positions']
    ase_mod = types.ModuleType('ase')
    calcs_mod = types.ModuleType('ase.calculators')
    monkeypatch.setitem(sys.modules, 'ase', ase_mod)
    monkeypatch.setitem(sys.modules, 'ase.calculators', calcs_mod)
    monkeypatch.setitem(sys.modules, 'ase.calculators.calculator', calc_mod)

    import importlib
    import newtonnet_tpu.utils.ase_interface as ai
    importlib.reload(ai)
    assert ai.HAVE_ASE

    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.utils.checkpoint import save_model
    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'])
    z = jnp.asarray([[8, 1, 1, 0]], jnp.int32)
    params = model.init(rng, z, jax.random.normal(rng, (1, 4, 3)),
                        jnp.zeros((1, 3, 3)))
    path = '/tmp/_stub_model.msgpack'
    save_model(path, model, params)

    calc = ai.MLAseCalculator(model_path=path,
                              properties=['energy', 'forces'])

    class FakeAtoms:
        def get_atomic_numbers(self):
            return np.array([8, 1, 1])

        def get_positions(self, wrap=False):
            return np.array([[0., 0, 0], [0.96, 0, 0], [-0.24, 0.93, 0]])

        def get_cell(self):
            return np.zeros((3, 3))

        def get_pbc(self):
            return np.zeros(3, bool)

    calc.calculate(FakeAtoms())
    assert isinstance(calc.results['energy'], float)
    assert calc.results['forces'].shape == (3, 3)

    # reload without the stub so other tests see the gated version
    for m in ('ase', 'ase.calculators', 'ase.calculators.calculator'):
        monkeypatch.delitem(sys.modules, m, raising=False)
    importlib.reload(ai)


def test_evaluate_cli(tmp_path, rng):
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.utils.checkpoint import save_model
    import jax.numpy as _jnp
    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'])
    z = _jnp.asarray([[6, 1, 1, 1, 0, 0, 0, 0]], _jnp.int32)
    params = model.init(rng, z, jax.random.normal(rng, (1, 8, 3)),
                        _jnp.zeros((1, 3, 3)))
    ckpt = str(tmp_path / 'm.msgpack')
    save_model(ckpt, model, params)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', 'evaluate.py'),
         '-m', ckpt, '-d',
         os.path.join(REPO, 'data', 'md17_aspirin', 'ccsd_test'),
         '--batch-size', '250', '--device', 'cpu',
         '--out', str(tmp_path / 'p.npz')],
        capture_output=True, text=True, timeout=400)
    assert out.returncode == 0, out.stderr[-800:]
    assert 'force  MAE' in out.stdout
    import numpy as _np
    preds = _np.load(tmp_path / 'p.npz')
    assert preds['energy'].shape == (500,)
    assert preds['forces'].shape == (500 * 21, 3)


def test_distributed_helpers_single_process():
    '''Degenerate (process_count==1) paths of parallel/distributed.py.

    Real pods are unavailable here (SURVEY.md section 7); this pins the
    single-process contract the multi-host scaling harness
    (tools/bench_scaling.py) relies on.
    '''
    from newtonnet_tpu.parallel import distributed

    # explicit single-process request is a no-op
    assert distributed.initialize_distributed(num_processes=1) is False
    # environment-driven init in a single-process env must not raise
    assert distributed.initialize_distributed() is False

    mesh = distributed.make_global_mesh(data=-1, graph=2)
    assert mesh.axis_names == ('data', 'graph')
    assert mesh.devices.shape == (4, 2)  # 8 virtual CPU devices

    # one process owns the whole global batch
    start, size = distributed.process_local_batch_slice(24)
    assert (start, size) == (0, 24)
