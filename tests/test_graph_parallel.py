'''Graph-parallel (atom-sharded) forward must match the single-device model
exactly -- energies and forces -- on the virtual 8-device CPU mesh, in both
a pure graph mesh (1x8) and a combined data x graph mesh (2x4).'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonnet_tpu.models import NewtonNet
from newtonnet_tpu.parallel import make_mesh
from newtonnet_tpu.parallel.graph_parallel import (
    make_sharded_energy_force_fn,
    pad_atoms_to_multiple,
)

F64 = jnp.float64


@pytest.fixture(scope='module')
def model_and_data(rng):
    rs = np.random.RandomState(0)
    B, N = 4, 30
    z = jnp.asarray(rs.choice([1, 6, 8], size=(B, N)), jnp.int32)
    z = z.at[:, 27:].set(0)
    pos = jnp.asarray(rs.randn(B, N, 3) * 3.0, F64)
    cell = jnp.zeros((B, 3, 3), F64)
    model = NewtonNet(n_features=16, n_basis=8, n_interactions=2,
                      output_properties=['energy', 'gradient_force'],
                      param_dtype=F64)
    params = model.init(rng, z, pos, cell)
    ref = model.apply(params, z, pos, cell)
    return model, params, z, pos, cell, ref


@pytest.mark.parametrize('data,graph', [(1, 8), (2, 4)])
def test_sharded_matches_single_device(model_and_data, data, graph):
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    model, params, z, pos, cell, ref = model_and_data
    mesh = make_mesh(data=data, graph=graph)
    fn = make_sharded_energy_force_fn(model, mesh)
    zp, posp = pad_atoms_to_multiple(z, pos, graph)
    energy, forces = fn(params, zp, posp, cell)
    np.testing.assert_allclose(np.asarray(energy), np.asarray(ref['energy']),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(forces)[:, :z.shape[1]],
                               np.asarray(ref['gradient_force']),
                               atol=1e-10)
