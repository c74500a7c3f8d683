'''AOT serving export (utils/export.py): StableHLO round trip, padding,
derivative heads, version/platform guards, and the export CLI.'''
import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from newtonnet_tpu.models import NewtonNet
from newtonnet_tpu.utils.export import (ServedModel, export_inference,
                                        save_serving_artifact)

HERE = os.path.dirname(os.path.abspath(__file__))


def _tiny_model(props=('energy', 'gradient_force')):
    model = NewtonNet(cutoff=4.0, n_features=16, n_basis=6, n_interactions=2,
                      output_properties=list(props))
    rs = np.random.RandomState(0)
    z = jnp.asarray(rs.choice([1, 6, 8], size=(1, 8)), jnp.int32)
    pos = jnp.asarray(rs.randn(1, 8, 3) * 1.5, jnp.float32)
    cell = jnp.zeros((1, 3, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), z, pos, cell)
    return model, params


@pytest.fixture(scope='module')
def served(tmp_path_factory):
    model, params = _tiny_model()
    header, blob = export_inference(model, params, n_atoms=10, batch_size=2,
                                    dtype='float32')
    path = tmp_path_factory.mktemp('export') / 'model.npz'
    save_serving_artifact(path, header, blob)
    return model, params, ServedModel(path)


def test_export_round_trip_matches_apply(served):
    '''The artifact replays the computation: padded raw outputs match
    model.apply on the same padded batch (the AOT module may fuse
    differently than the in-process jit, so to fp32 round-off, not
    bit-for-bit).'''
    model, params, sm = served
    assert sm.n_pad == 16 and sm.batch_size == 2
    rs = np.random.RandomState(1)
    z = np.zeros((2, 16), np.int32)
    z[0, :7] = rs.choice([1, 6, 8], size=7)
    z[1, :10] = rs.choice([1, 6, 8], size=10)
    pos = (rs.randn(2, 16, 3) * 1.5).astype(np.float32)
    pos[z == 0] = 0
    cell = np.zeros((2, 3, 3), np.float32)
    got = sm.call_raw(jnp.asarray(z), jnp.asarray(pos), jnp.asarray(cell))
    with jax.default_matmul_precision('highest'):
        want = model.apply(params, jnp.asarray(z), jnp.asarray(pos),
                           jnp.asarray(cell))
    for k in ('energy', 'gradient_force'):
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]),
                                   rtol=1e-5, atol=1e-6)


def test_served_call_pads_and_strips(served):
    '''The convenience call pads inputs and strips padding from outputs;
    a single system loses its batch axis.'''
    model, params, sm = served
    rs = np.random.RandomState(2)
    numbers = rs.choice([1, 6, 8], size=9)
    positions = rs.randn(9, 3) * 1.5
    out = sm(numbers, positions)
    assert isinstance(out['energy'], float)
    assert out['gradient_force'].shape == (9, 3)
    assert np.isfinite(out['gradient_force']).all()
    # a 2-system batch returns per-system dicts, padding-independent:
    # system 0 alone == system 0 served next to a different system 1
    out2 = sm([numbers, rs.choice([1, 6, 8], size=4)],
              [positions, rs.randn(4, 3)])
    assert len(out2) == 2 and out2[1]['gradient_force'].shape == (4, 3)
    np.testing.assert_allclose(out2[0]['gradient_force'],
                               out['gradient_force'], rtol=1e-6, atol=1e-6)


def test_served_model_guards(served, tmp_path):
    model, params, sm = served
    rs = np.random.RandomState(3)
    with pytest.raises(ValueError, match='systems > exported batch_size'):
        sm([np.ones(4, int)] * 3, [rs.randn(4, 3)] * 3)
    with pytest.raises(ValueError, match='atoms > exported capacity'):
        sm(np.ones(17, int), rs.randn(17, 3))
    # exporting a head the model does not have is refused up front
    with pytest.raises(ValueError, match='no output head'):
        export_inference(model, params, n_atoms=8, properties=['hessian'])
    # a newer artifact version is refused, not misread
    header, blob = export_inference(model, params, n_atoms=8)
    header['version'] = 999
    p = tmp_path / 'future.npz'
    save_serving_artifact(p, header, blob)
    with pytest.raises(ValueError, match='newer than this loader'):
        ServedModel(p)


def test_export_cli_round_trip(tmp_path):
    '''scripts/export_model.py: checkpoint -> artifact -> ServedModel
    matches the in-process model end to end.'''
    from newtonnet_tpu.utils.checkpoint import save_model
    model, params = _tiny_model()
    ckpt = tmp_path / 'model.msgpack'
    save_model(str(ckpt), model, params)
    art = tmp_path / 'serving.npz'
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, '..', 'scripts',
                                      'export_model.py'),
         '--checkpoint', str(ckpt), '--n-atoms', '9', '--out', str(art),
         '--device', 'cpu',
         '--properties', 'energy', 'gradient_force'],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    sm = ServedModel(art)
    assert sm.properties == ['energy', 'gradient_force']
    assert json.loads(json.dumps(sm.header))  # header is valid JSON
    rs = np.random.RandomState(4)
    numbers = rs.choice([1, 6, 8], size=9)
    positions = rs.randn(9, 3) * 1.5
    got = sm(numbers, positions)
    from newtonnet_tpu.md.calculator import NewtonNetCalculator
    calc = NewtonNetCalculator(model=model, params=params)
    want = calc.calculate(numbers=numbers, positions=positions)
    np.testing.assert_allclose(got['energy'], want['energy'],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got['gradient_force'], want['forces'],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('variant', ['plain', 'charge', 'float64'])
def test_cold_process_serve(tmp_path, variant):
    '''An artifact must replay in a FRESH process that never traced the
    model. Regression ('plain'): the model once lowered cells through
    jnp.linalg.inv/det, which on CPU become LAPACK custom calls with
    process-local function pointers -- the exported module deserialized
    fine but segfaulted on call in any cold serving process (fixed by the
    closed-form ops/linalg3.py). 'charge' repeats it through the latent
    Ewald path (ops/ewald.py had its own jnp.linalg.det/inv pair with the
    same segfault). 'float64' covers the x64-canonicalization mismatch:
    ServedModel must enable jax x64 before calling an f64 artifact. A
    crash exits the subprocess with a signal -> returncode != 0.'''
    if variant == 'charge':
        model, params = _tiny_model(
            props=('charge', 'energy', 'gradient_force'))
        dtype = 'float32'
    else:
        model, params = _tiny_model()
        dtype = 'float64' if variant == 'float64' else 'float32'
    header, blob = export_inference(model, params, n_atoms=9, dtype=dtype)
    art = tmp_path / 'cold.npz'
    save_serving_artifact(art, header, blob)
    # the charge variant serves a PERIODIC system so the reciprocal-space
    # Ewald branch (cell det/inv) actually executes in the cold process
    cell_line = ("cell = np.eye(3) * 8.0\n" if variant == 'charge'
                 else "cell = None\n")
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import sys, numpy as np\n"
        f"sys.path.insert(0, {os.path.join(HERE, '..')!r})\n"
        "from newtonnet_tpu.utils.export import ServedModel\n"
        f"sm = ServedModel({str(art)!r})\n"
        "rs = np.random.RandomState(0)\n"
        + cell_line +
        "out = sm(rs.choice([1, 6, 8], size=9), rs.randn(9, 3) * 1.5 + 4.0,"
        " cell)\n"
        "assert np.isfinite(out['gradient_force']).all()\n"
        "print('COLD_OK', out['energy'])\n")
    r = subprocess.run([sys.executable, '-c', code], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, (r.returncode, r.stderr[-2000:])
    assert 'COLD_OK' in r.stdout
