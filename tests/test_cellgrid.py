'''Cell-grid neighbor build vs the O(N^2) reference build (ops/nlist.py).'''
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from newtonnet_tpu.ops.cellgrid import (
    cell_grid_neighbor_list,
    suggest_capacity,
    suggest_grid,
)
from newtonnet_tpu.ops.nlist import neighbor_list


def _box(n, L, seed=0, batch=1):
    rs = np.random.RandomState(seed)
    pos = rs.rand(batch, n, 3) * L
    cell = np.tile(np.diag([L, L, L])[None], (batch, 1, 1))
    mask = np.ones((batch, n), bool)
    return jnp.asarray(pos, jnp.float32), jnp.asarray(cell, jnp.float32), \
        jnp.asarray(mask)


def _edge_sets(idx, kmask):
    out = []
    for b in range(idx.shape[0]):
        s = set()
        for i in range(idx.shape[1]):
            for k in range(idx.shape[2]):
                if kmask[b, i, k]:
                    s.add((i, int(idx[b, i, k])))
        out.append(s)
    return out


@pytest.mark.parametrize('n,L,seed', [(128, 12.0, 0), (300, 16.0, 1)])
def test_matches_n2_build(n, L, seed):
    cutoff, k_max = 5.0, 64
    pos, cell, mask = _box(n, L, seed)
    grid = suggest_grid(np.asarray(cell[0]), cutoff)
    cap = suggest_capacity(n, grid, margin=3.0)

    idx_r, m_r, disp_r, ovf_r = jax.jit(
        lambda p, c, a: neighbor_list(p, c, a, cutoff, k_max))(
        pos, cell, mask)
    idx_g, m_g, disp_g, ovf_g = jax.jit(
        lambda p, c, a: cell_grid_neighbor_list(
            p, c, a, cutoff, k_max, grid, cap))(pos, cell, mask)

    assert int(ovf_r.sum()) == 0 and int(ovf_g.sum()) == 0
    assert _edge_sets(np.asarray(idx_r), np.asarray(m_r)) == \
        _edge_sets(np.asarray(idx_g), np.asarray(m_g))
    # same displacement physics: per-atom sums of |d| agree
    d_r = np.where(np.asarray(m_r), np.linalg.norm(disp_r, axis=-1), 0)
    d_g = np.where(np.asarray(m_g), np.linalg.norm(disp_g, axis=-1), 0)
    np.testing.assert_allclose(d_r.sum(-1), d_g.sum(-1), rtol=1e-5)


def test_batch_and_padding():
    cutoff, k_max = 5.0, 48
    pos, cell, mask = _box(96, 11.0, seed=3, batch=2)
    mask = mask.at[1, 80:].set(False)  # padded atoms in frame 1
    grid = suggest_grid(np.asarray(cell[0]), cutoff)
    cap = suggest_capacity(96, grid, margin=3.0)
    idx_g, m_g, _, _ = cell_grid_neighbor_list(
        pos, cell, mask, cutoff, k_max, grid, cap)
    idx_r, m_r, _, _ = neighbor_list(pos, cell, mask, cutoff, k_max)
    assert _edge_sets(np.asarray(idx_r), np.asarray(m_r)) == \
        _edge_sets(np.asarray(idx_g), np.asarray(m_g))
    # padded atoms never appear on either side of an edge
    assert not bool(m_g[1, 80:].any())
    assert not bool((m_g[1] & (idx_g[1] >= 80)).any())


def test_overflow_reported():
    # tiny capacity forces cell spill
    pos, cell, mask = _box(128, 12.0, seed=0)
    grid = suggest_grid(np.asarray(cell[0]), 5.0)
    _, _, _, ovf = cell_grid_neighbor_list(
        pos, cell, mask, 5.0, 64, grid, capacity=8)
    assert int(ovf.sum()) > 0


def test_small_grid_dims_no_double_count():
    # L barely over 2*cutoff -> grid (2,2,2): wrapped -1/+1 images coincide
    pos, cell, mask = _box(64, 10.2, seed=5)
    idx_g, m_g, _, ovf = cell_grid_neighbor_list(
        pos, cell, mask, 5.0, 63, (2, 2, 2), capacity=32)
    assert int(ovf.sum()) == 0
    # no duplicate neighbor ids within a row
    idxn, mn = np.asarray(idx_g), np.asarray(m_g)
    for i in range(64):
        ids = idxn[0, i][mn[0, i]]
        assert len(ids) == len(set(ids.tolist()))
    idx_r, m_r, _, _ = neighbor_list(pos, cell, mask, 5.0, 63)
    assert _edge_sets(idx_r, np.asarray(m_r)) == _edge_sets(idxn, mn)


def test_model_integration():
    '''NewtonNet forward with a cell-grid nlist == with the O(N^2) nlist.'''
    from newtonnet_tpu.models import NewtonNet

    pos, cell, mask = _box(128, 12.0, seed=2)
    z = jnp.asarray(np.random.RandomState(0).choice([1, 6, 8], (1, 128)))
    model = NewtonNet(cutoff=5.0, graph_mode='neighborlist', k_max=64,
                      n_features=16, n_basis=8, n_interactions=2,
                      output_properties=('energy', 'gradient_force'))
    params = model.init(jax.random.PRNGKey(0), z, pos, cell)

    grid = suggest_grid(np.asarray(cell[0]), 5.0)
    cap = suggest_capacity(128, grid, margin=3.0)
    idx_g, m_g, _, _ = cell_grid_neighbor_list(
        pos, cell, mask, 5.0, 64, grid, cap)
    out_g = model.apply(params, z, pos, cell, nlist=(idx_g, m_g))
    out_r = model.apply(params, z, pos, cell)
    np.testing.assert_allclose(np.asarray(out_g['energy']),
                               np.asarray(out_r['energy']), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out_g['gradient_force']),
                               np.asarray(out_r['gradient_force']),
                               rtol=1e-4, atol=1e-5)
