'''Native (C++) components: extxyz parser vs the Python parser, and the
cell-list neighbor search vs the in-jit dense/top-k construction.'''
import os

import numpy as np
import pytest

from newtonnet_tpu import native
from newtonnet_tpu.data.xyz import read_extxyz

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASPIRIN = os.path.join(REPO, 'data', 'md17_aspirin', 'ccsd_test', 'raw',
                       'aspirin_ccsd-test.xyz')

pytestmark = pytest.mark.skipif(
    not native.ensure_built(), reason='native toolchain unavailable')


def test_native_extxyz_matches_python():
    frames = read_extxyz(ASPIRIN)
    data = native.parse_extxyz(ASPIRIN)
    assert len(data['ptr']) - 1 == len(frames)
    assert data['ptr'][-1] == sum(len(f) for f in frames)
    for i in [0, 7, 499]:
        lo, hi = data['ptr'][i], data['ptr'][i + 1]
        np.testing.assert_array_equal(data['z'][lo:hi], frames[i].numbers)
        np.testing.assert_allclose(data['pos'][lo:hi], frames[i].positions,
                                   atol=1e-12)
        np.testing.assert_allclose(data['forces'][lo:hi], frames[i].forces,
                                   atol=1e-12)
        np.testing.assert_allclose(data['energy'][i], frames[i].energy)
        assert not data['pbc'][i].any()


def _neighbor_sets(idx, count):
    return [set(idx[i, :count[i]].tolist()) for i in range(idx.shape[0])]


def _brute_sets(pos, cell, cutoff):
    n = len(pos)
    disp = pos[:, None, :] - pos[None, :, :]
    if cell is not None and cell.any():
        inv = np.linalg.inv(cell)
        frac = disp @ inv
        disp = disp - np.round(frac) @ cell
    d = np.linalg.norm(disp, axis=-1)
    out = []
    for i in range(n):
        out.append({j for j in range(n) if j != i and d[i, j] < cutoff})
    return out


def test_cell_list_aperiodic():
    rs = np.random.RandomState(0)
    pos = rs.rand(300, 3) * 20.0
    idx, count, overflow = native.cell_list_neighbors(pos, None, 4.0, 64)
    assert overflow == 0
    got = _neighbor_sets(idx, count)
    want = _brute_sets(pos, None, 4.0)
    assert got == want


def test_cell_list_periodic_orthorhombic():
    rs = np.random.RandomState(1)
    cell = np.diag([18.0, 20.0, 22.0])
    pos = rs.rand(400, 3) @ cell
    idx, count, overflow = native.cell_list_neighbors(pos, cell, 4.5, 64)
    assert overflow == 0
    got = _neighbor_sets(idx, count)
    want = _brute_sets(pos, cell, 4.5)
    assert got == want


def test_cell_list_periodic_triclinic():
    rs = np.random.RandomState(2)
    cell = np.array([[16.0, 0.0, 0.0], [3.0, 17.0, 0.0], [-2.0, 1.5, 18.0]])
    pos = rs.rand(350, 3) @ cell
    idx, count, overflow = native.cell_list_neighbors(pos, cell, 4.0, 64)
    assert overflow == 0
    assert _neighbor_sets(idx, count) == _brute_sets(pos, cell, 4.0)


def test_cell_list_small_box_fallback():
    '''Boxes under 3 cutoffs per axis use the brute-force MIC path.'''
    rs = np.random.RandomState(3)
    cell = np.diag([9.0, 9.0, 9.0])
    pos = rs.rand(60, 3) @ cell
    idx, count, overflow = native.cell_list_neighbors(pos, cell, 4.0, 64)
    assert overflow == 0
    assert _neighbor_sets(idx, count) == _brute_sets(pos, cell, 4.0)


def test_cell_list_overflow():
    rs = np.random.RandomState(4)
    pos = rs.rand(50, 3) * 3.0
    _, count, overflow = native.cell_list_neighbors(pos, None, 10.0, 8)
    assert overflow > 0
    assert count.max() == 8


def test_model_with_native_nlist(rng):
    '''Host-built cell-list indices through the model == in-jit construction.'''
    import jax
    import jax.numpy as jnp
    from newtonnet_tpu.models import NewtonNet

    rs = np.random.RandomState(5)
    N = 48
    cell_np = np.diag([15.0, 15.0, 15.0])
    pos_np = rs.rand(N, 3) @ cell_np
    z = jnp.asarray(rs.choice([1, 6, 8], size=(1, N)), jnp.int32)
    pos = jnp.asarray(pos_np[None], jnp.float64)
    cell = jnp.asarray(cell_np[None], jnp.float64)
    model = NewtonNet(graph_mode='neighborlist', k_max=32, n_features=8,
                      n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'],
                      param_dtype=jnp.float64)
    params = model.init(rng, z, pos, cell)
    ref = model.apply(params, z, pos, cell)
    idx, count, ovf = native.cell_list_neighbors(pos_np, cell_np, 5.0, 32)
    assert ovf == 0
    kmask = np.arange(32)[None, :] < count[:, None]
    out = model.apply(params, z, pos, cell,
                      nlist=(jnp.asarray(idx[None]), jnp.asarray(kmask[None])))
    np.testing.assert_allclose(ref['energy'], out['energy'], rtol=1e-12)
    np.testing.assert_allclose(ref['gradient_force'], out['gradient_force'],
                               atol=1e-12)
