'''Physical symmetry tests: the energy must be invariant and forces
equivariant under rotation, translation, atom permutation, and (for the
exact MIC) lattice translations. These hold by construction in the
reference architecture; here they validate the dense masked formulation.
'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonnet_tpu.models import NewtonNet

F64 = jnp.float64


@pytest.fixture(scope='module')
def setup(rng):
    rs = np.random.RandomState(1)
    B, N = 2, 10
    z = jnp.asarray(rs.choice([1, 6, 8], size=(B, N)), dtype=jnp.int32)
    z = z.at[0, 7:].set(0)  # padding
    pos = jnp.asarray(rs.randn(B, N, 3) * 2.0, F64)
    cell = jnp.zeros((B, 3, 3), F64)
    model = NewtonNet(n_features=16, n_basis=8, n_interactions=2,
                      output_properties=['energy', 'gradient_force'],
                      param_dtype=F64)
    params = model.init(rng, z, pos, cell)
    return model, params, z, pos, cell


def _rotation_matrix():
    rs = np.random.RandomState(3)
    q, _ = np.linalg.qr(rs.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    return jnp.asarray(q, F64)


def test_translation_invariance(setup):
    model, params, z, pos, cell = setup
    out1 = model.apply(params, z, pos, cell)
    out2 = model.apply(params, z, pos + jnp.asarray([1.3, -0.7, 2.1]), cell)
    np.testing.assert_allclose(out1['energy'], out2['energy'], rtol=1e-10)
    np.testing.assert_allclose(out1['gradient_force'],
                               out2['gradient_force'], atol=1e-10)


def test_rotation_equivariance(setup):
    model, params, z, pos, cell = setup
    R = _rotation_matrix()
    out1 = model.apply(params, z, pos, cell)
    out2 = model.apply(params, z, pos @ R, cell)
    np.testing.assert_allclose(out1['energy'], out2['energy'], rtol=1e-10)
    np.testing.assert_allclose(out1['gradient_force'] @ R,
                               out2['gradient_force'], atol=1e-10)


def test_permutation_invariance(setup):
    model, params, z, pos, cell = setup
    perm = jnp.asarray(np.random.RandomState(5).permutation(pos.shape[1]))
    out1 = model.apply(params, z, pos, cell)
    out2 = model.apply(params, z[:, perm], pos[:, perm], cell)
    np.testing.assert_allclose(out1['energy'], out2['energy'], rtol=1e-10)
    np.testing.assert_allclose(np.asarray(out1['gradient_force'])[:, perm],
                               out2['gradient_force'], atol=1e-10)


def test_lattice_translation_invariance_triclinic(rng):
    '''Exact-MIC energies are invariant when atoms shift by lattice vectors,
    including for non-symmetric (triclinic) cells -- the case the reference
    MIC formula gets wrong (see ops/neighbors.py docstring).'''
    rs = np.random.RandomState(7)
    B, N = 1, 6
    z = jnp.asarray(rs.choice([1, 6], size=(B, N)), dtype=jnp.int32)
    cell = jnp.asarray([[[8.0, 0.0, 0.0],
                         [2.1, 7.5, 0.0],
                         [-1.2, 0.9, 9.0]]], F64)  # triclinic rows
    pos = jnp.asarray(rs.rand(B, N, 3), F64) @ cell[0]
    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'],
                      mic_mode='exact', param_dtype=F64)
    params = model.init(rng, z, pos, cell)
    out1 = model.apply(params, z, pos, cell)
    shift = 2 * cell[0, 0] - cell[0, 1] + 3 * cell[0, 2]
    pos2 = pos.at[0, 2].add(shift)  # move one atom by a lattice vector
    out2 = model.apply(params, z, pos2, cell)
    np.testing.assert_allclose(out1['energy'], out2['energy'], rtol=1e-9)
    np.testing.assert_allclose(out1['gradient_force'],
                               out2['gradient_force'], atol=1e-9)


def test_padding_independence(setup, rng):
    '''Adding more padding columns must not change any real output.'''
    model, params, z, pos, cell = setup
    out1 = model.apply(params, z, pos, cell)
    pad = 4
    z2 = jnp.pad(z, ((0, 0), (0, pad)))
    pos2 = jnp.pad(pos, ((0, 0), (0, pad), (0, 0)))
    out2 = model.apply(params, z2, pos2, cell)
    np.testing.assert_allclose(out1['energy'], out2['energy'], rtol=1e-12)
    np.testing.assert_allclose(out1['gradient_force'],
                               np.asarray(out2['gradient_force'])[:, :pos.shape[1]],
                               atol=1e-12)
    assert float(jnp.abs(out2['gradient_force'][:, pos.shape[1]:]).max()) == 0.0
