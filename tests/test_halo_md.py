'''Multi-chip halo-partitioned MD (md/halo_md.py).

Parity target: the atom-sharded NVE trajectory (with mid-run host re-sorts
of the slab decomposition) must match the single-device dense-graph
velocity-Verlet trajectory; the re-sort permutation must invert exactly;
invalid partitions must raise, and partition aging must be reported.
'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonnet_tpu.md.halo_md import run_md_halo
from newtonnet_tpu.md.system import System, maxwell_boltzmann
from newtonnet_tpu.models import NewtonNet
from newtonnet_tpu.parallel import make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason='needs 8 virtual devices')

CUTOFF = 3.0


def _system(N=48, box=(48.0, 6.0, 6.0), seed=0, temperature_K=300.0):
    rs = np.random.RandomState(seed)
    numbers = rs.choice([1, 6, 8], size=N).astype(np.int32)
    pos = rs.rand(N, 3) * np.asarray(box)
    s = System(numbers, pos, cell=np.diag(box), pbc=[True] * 3)
    if temperature_K:
        maxwell_boltzmann(s, temperature_K, rng=np.random.default_rng(seed))
    return s


def _models(rng, sys0):
    dense = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                      n_interactions=2,
                      output_properties=['energy', 'gradient_force'])
    nl = NewtonNet(cutoff=CUTOFF, n_features=16, n_basis=4,
                   n_interactions=2, graph_mode='neighborlist', k_max=24,
                   output_properties=['energy', 'gradient_force'])
    params = dense.init(rng, jnp.asarray(sys0.numbers[None]),
                        jnp.asarray(sys0.positions[None]),
                        jnp.asarray(sys0.cell[None]))
    return dense, nl, params


def test_halo_md_nve_matches_single_device(rng):
    '''8 velocity-Verlet steps with a re-sort after step 4 == the
    single-device dense-graph trajectory (fp64, includes atoms crossing
    slab boundaries between chunks).'''
    dt, n_steps = 0.2, 8
    sys_halo = _system(seed=0)
    dense, nl, params = _models(rng, sys_halo)

    # single-device reference trajectory (same initial state)
    z = jnp.asarray(sys_halo.numbers[None])
    cell = jnp.asarray(sys_halo.cell[None])
    m = sys_halo.masses[:, None]
    pos = sys_halo.positions.copy()
    vel = sys_halo.get_velocities().copy()

    def ef(pos):
        out = dense.apply(params, z, jnp.asarray(pos)[None], cell)
        return float(out['energy'][0]), np.asarray(out['gradient_force'][0])

    epots_ref = []
    _, f = ef(pos)
    for _ in range(n_steps):
        vel = vel + 0.5 * dt * f / m
        pos = pos + dt * vel
        e, f = ef(pos)
        vel = vel + 0.5 * dt * f / m
        epots_ref.append(e)

    mesh = make_mesh(data=1, graph=4)
    _, log = run_md_halo(nl, params, sys_halo, mesh, n_halo=8,
                         timestep=dt, n_steps=n_steps, resort_every=4,
                         integrator='nve', dtype=np.float64)

    assert log['n_resorts'] == 2
    assert log['skin_violations'] == 0
    np.testing.assert_allclose(log['epot'], epots_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(sys_halo.positions, pos, rtol=1e-8,
                               atol=1e-9)
    np.testing.assert_allclose(sys_halo.get_velocities(), vel, rtol=1e-7,
                               atol=1e-10)


def test_halo_md_permutation_roundtrip(rng):
    '''dt=0: the sort -> shard -> unsort pipeline must return every atom
    to its caller-visible slot bit-exactly.'''
    s = _system(seed=1)
    _, nl, params = _models(rng, s)
    pos0, mom0 = s.positions.copy(), s.momenta.copy()
    mesh = make_mesh(data=1, graph=4)
    _, log = run_md_halo(nl, params, s, mesh, n_halo=8, timestep=0.0,
                         n_steps=4, resort_every=2, integrator='nve',
                         dtype=np.float64)
    np.testing.assert_array_equal(s.positions, pos0)
    # momenta pass through a velocity round trip (mom/m * m): 1-ulp noise
    np.testing.assert_allclose(s.momenta, mom0, rtol=1e-14, atol=0)
    assert np.all(np.isfinite(log['epot']))


def test_halo_md_langevin_smoke(rng):
    s = _system(seed=2, temperature_K=300.0)
    _, nl, params = _models(rng, s)
    mesh = make_mesh(data=1, graph=4)
    _, log = run_md_halo(nl, params, s, mesh, n_halo=8, timestep=0.1,
                         n_steps=12, resort_every=4, integrator='langevin',
                         temperature_K=300.0, friction=0.02, skin=0.5,
                         dtype=np.float64, log_every=2)
    assert log['epot'].shape == (6,)
    assert np.all(np.isfinite(log['temperature']))
    assert log['temperature'][-1] > 0


def test_halo_md_invalid_partition_raises(rng):
    '''A 1-atom halo cannot cover a 3 Angstrom boundary layer.'''
    s = _system(seed=3)
    _, nl, params = _models(rng, s)
    mesh = make_mesh(data=1, graph=4)
    with pytest.raises(ValueError, match='halo partition invalid'):
        run_md_halo(nl, params, s, mesh, n_halo=1, timestep=0.1,
                    n_steps=2, resort_every=2, integrator='nve')


def test_halo_md_reports_partition_aging(rng):
    '''Atoms racing across the skin margin within a chunk are counted and
    warned about (the capacity check can no longer vouch for coverage).'''
    s = _system(seed=4, temperature_K=None)
    s.set_velocities(np.full((len(s), 3), 0.5))  # uniform fast drift
    _, nl, params = _models(rng, s)
    mesh = make_mesh(data=1, graph=4)
    with pytest.warns(UserWarning, match='halo MD partition quality'):
        _, log = run_md_halo(nl, params, s, mesh, n_halo=8, timestep=0.5,
                             n_steps=4, resort_every=4, integrator='nve',
                             skin=0.2, dtype=np.float64)
    assert log['skin_violations'] == 1
