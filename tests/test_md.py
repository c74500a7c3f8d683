'''MD layer tests: System mechanics, thermostat statistics, NVE
conservation, calculator result surface, and the on-device driver.'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonnet_tpu.data import units
from newtonnet_tpu.md.calculator import NewtonNetCalculator
from newtonnet_tpu.md.integrators import Langevin, VelocityVerlet
from newtonnet_tpu.md.system import System, maxwell_boltzmann
from newtonnet_tpu.models import NewtonNet


class HarmonicCalculator:
    '''E = 0.5 k sum |r - r0|^2 -- analytic test potential.'''

    def __init__(self, r0, k=5.0):
        self.r0 = np.asarray(r0)
        self.k = k

    def calculate(self, system):
        d = system.positions - self.r0
        return {'energy': 0.5 * self.k * float((d ** 2).sum()),
                'forces': -self.k * d}


def _h2o():
    return System([8, 1, 1], [[0.0, 0.0, 0.0], [0.96, 0.0, 0.0],
                              [-0.24, 0.93, 0.0]])


def test_system_mechanics():
    s = _h2o()
    assert len(s) == 3
    assert abs(s.masses[0] - 15.999) < 1e-3
    s.set_velocities(np.ones((3, 3)) * 0.01)
    assert s.kinetic_energy() > 0
    np.testing.assert_allclose(s.get_velocities(), 0.01)


def test_maxwell_boltzmann_temperature():
    rs = np.random.default_rng(0)
    temps = []
    for seed in range(20):
        s = System([6] * 50, np.zeros((50, 3)))
        maxwell_boltzmann(s, 300.0, rng=np.random.default_rng(seed),
                          zero_momentum=False)
        temps.append(s.temperature())
    assert abs(np.mean(temps) - 300.0) < 20.0


def test_nve_energy_conservation():
    s = _h2o()
    s.calc = HarmonicCalculator(s.positions.copy(), k=2.0)
    maxwell_boltzmann(s, 300.0, rng=np.random.default_rng(1))
    e0 = s.get_potential_energy() + s.kinetic_energy()
    VelocityVerlet(s, timestep=0.25 * units.fs).run(400)
    e1 = s.get_potential_energy() + s.kinetic_energy()
    assert abs(e1 - e0) < 2e-3  # eV over 100 fs


def test_langevin_equilibrium_temperature():
    '''Harmonic bath: long Langevin run must equilibrate near the target
    temperature (the exact-coefficient check vs ASE's algorithm).'''
    n = 64
    rs = np.random.default_rng(2)
    s = System([6] * n, rs.standard_normal((n, 3)) * 0.1)
    s.calc = HarmonicCalculator(s.positions.copy(), k=1.0)
    dyn = Langevin(s, timestep=1.0 * units.fs, temperature_K=300,
                   friction=1.0 / (20 * units.fs),
                   rng=np.random.default_rng(3))
    temps = []
    dyn.run(200)  # equilibrate
    for _ in range(40):
        dyn.run(10)
        temps.append(s.temperature())
    assert abs(np.mean(temps) - 300.0) < 45.0, np.mean(temps)


@pytest.fixture(scope='module')
def tiny_calc(rng):
    model = NewtonNet(n_features=16, n_basis=4, n_interactions=1,
                      output_properties=['charge', 'energy',
                                         'gradient_force', 'hessian',
                                         'stress', 'bec'])
    z = jnp.zeros((1, 8), jnp.int32).at[0, :3].set(
        jnp.asarray([8, 1, 1], jnp.int32))  # x64 suite: literals are int64
    pos = jax.random.normal(rng, (1, 8, 3))
    params = model.init(rng, z, pos, jnp.zeros((1, 3, 3)))
    return NewtonNetCalculator(
        model=model, params=params,
        properties=['energy', 'free_energy', 'forces', 'stress', 'hessian',
                    'charges', 'bec'])


def test_calculator_result_surface(tiny_calc):
    s = _h2o()
    out = tiny_calc.calculate(s)
    assert isinstance(out['energy'], float)
    assert out['energy'] == out['free_energy']
    assert out['forces'].shape == (3, 3)
    assert out['stress'].shape == (6,)       # Voigt
    assert out['hessian'].shape == (3, 3, 3, 3)
    assert out['charges'].shape == (3,)
    assert out['bec'].shape == (3, 3, 3)
    assert np.isfinite(out['forces']).all()
    # hessian symmetry
    h = out['hessian'].reshape(9, 9)
    np.testing.assert_allclose(h, h.T, atol=1e-4)


def test_calculator_bucketing(tiny_calc):
    '''Systems under the same bucket share one compilation.'''
    out3 = tiny_calc.calculate(_h2o())
    s5 = System([6, 1, 1, 1, 1], np.random.RandomState(0).randn(5, 3) * 2)
    out5 = tiny_calc.calculate(s5)
    assert out5['forces'].shape == (5, 3)
    assert len(tiny_calc._compiled) == 1  # both pad to 8


def test_calculator_refuses_untrained_heads(rng):
    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      output_properties=['energy'])
    z = jnp.asarray([[8, 1, 1, 0]], jnp.int32)
    params = model.init(rng, z, jax.random.normal(rng, (1, 4, 3)),
                        jnp.zeros((1, 3, 3)))
    with pytest.raises(ValueError, match='untrained'):
        NewtonNetCalculator(model=model, params=params,
                            properties=['charges'])
    # derivative extensions of trained heads are allowed
    calc = NewtonNetCalculator(model=model, params=params,
                               properties=['energy', 'forces'])
    out = calc.calculate(_h2o())
    assert np.isfinite(out['forces']).all()


def test_on_device_driver_matches_host_energy(rng):
    from newtonnet_tpu.md.driver import run_langevin_on_device
    model = NewtonNet(n_features=16, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'])
    s = _h2o()
    z = jnp.zeros((1, 8), jnp.int32).at[0, :3].set(jnp.asarray(s.numbers))
    pos = jnp.zeros((1, 8, 3)).at[0, :3].set(jnp.asarray(s.positions))
    params = model.init(rng, z, pos, jnp.zeros((1, 3, 3)))
    maxwell_boltzmann(s, 300, rng=np.random.default_rng(0))
    s2, log = run_langevin_on_device(
        model, params, s, timestep=0.25 * units.fs, temperature_K=300,
        friction=1 / (100 * units.fs), n_steps=20, log_every=5)
    assert np.isfinite(log['epot']).all()
    assert np.isfinite(s2.positions).all()
    assert log['epot'].shape == (4,)


def test_replica_ensemble_md(rng):
    '''Batched-replica on-device MD: independent trajectories, independent
    noise, each consistent with the single-system path shapes.'''
    from newtonnet_tpu.md.driver import run_langevin_on_device
    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'])
    rs = np.random.default_rng(0)
    systems = []
    for i in range(4):
        s = _h2o()
        s.positions = s.positions + rs.standard_normal((3, 3)) * 0.02
        maxwell_boltzmann(s, 300, rng=np.random.default_rng(i))
        systems.append(s)
    z = jnp.zeros((1, 8), jnp.int32).at[0, :3].set(
        jnp.asarray(systems[0].numbers))
    params = model.init(rng, z, jnp.zeros((1, 8, 3)), jnp.zeros((1, 3, 3)))
    out, log = run_langevin_on_device(
        model, params, systems, timestep=0.25 * units.fs, temperature_K=300,
        friction=1 / (100 * units.fs), n_steps=12, log_every=4)
    assert log['epot'].shape == (3, 4)
    assert len(out) == 4
    # different noise/starts -> replicas diverge
    assert not np.allclose(out[0].positions, out[1].positions)
    for s in out:
        assert np.isfinite(s.positions).all()


def test_ensemble_calculator(rng, tmp_path):
    '''Multi-checkpoint ensemble averaging in the calculator.'''
    import os
    from newtonnet_tpu.utils.checkpoint import save_model
    z = jnp.asarray([[8, 1, 1, 0]], jnp.int32)
    pos = jax.random.normal(rng, (1, 4, 3))
    cell = jnp.zeros((1, 3, 3))
    paths, outs = [], []
    for seed in (0, 1):
        model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                          output_properties=['energy', 'gradient_force'])
        params = model.init(jax.random.PRNGKey(seed), z, pos, cell)
        p = os.path.join(tmp_path, f'm{seed}.msgpack')
        save_model(p, model, params)
        paths.append(p)
        single = NewtonNetCalculator(model_path=p,
                                     properties=['energy', 'forces'])
        outs.append(single.calculate(_h2o()))
    ens = NewtonNetCalculator(model_path=paths,
                              properties=['energy', 'forces'])
    out = ens.calculate(_h2o())
    np.testing.assert_allclose(
        out['energy'], 0.5 * (outs[0]['energy'] + outs[1]['energy']),
        rtol=1e-5)
    np.testing.assert_allclose(
        out['forces'], 0.5 * (outs[0]['forces'] + outs[1]['forces']),
        rtol=1e-4, atol=1e-6)


def test_fire_optimizer_converges():
    '''FIRE must relax a stiff harmonic system where naive gradient
    descent with a comparable step diverges.'''
    from newtonnet_tpu.md.optimize import FIRE
    rs = np.random.RandomState(0)
    r0 = rs.randn(10, 3)
    s = System([6] * 10, r0 + rs.randn(10, 3) * 0.3)
    k = np.linspace(1.0, 60.0, 10)[:, None]  # stiff + soft modes

    def force_fn(pos):
        return -k * (pos - r0)

    opt = FIRE(s, force_fn=force_fn)
    converged, n, fnorm = opt.run(fmax=1e-3, steps=2000)
    assert converged, (n, fnorm)
    np.testing.assert_allclose(s.positions, r0, atol=1e-3)


def test_on_device_amortized_cellgrid_rebuild(rng):
    '''Periodic neighborlist MD with nlist_every > 1 routes through the
    O(N) cell-grid rebuild (md/driver.py) and keeps per-replica logs.
    The box must give a >= 3-cell grid (min(suggest_grid) >= 3 is the
    driver's switch) and the capacity must be ample: a clean run reports
    ZERO overflows/skin violations and emits no list-quality warning.'''
    import warnings

    from newtonnet_tpu.md.driver import run_langevin_on_device
    from newtonnet_tpu.ops.cellgrid import suggest_grid
    rs = np.random.RandomState(0)
    N, L = 128, 20.0
    # the driver only takes the O(N) grid path when the box fits >= 3
    # cells of (cutoff + skin) per axis -- assert this test exercises it
    assert min(suggest_grid(np.diag([L, L, L]), 5.0 + 1.0)) >= 3
    numbers = rs.choice([1, 6, 8], N)
    s = System(numbers, rs.rand(N, 3) * L, cell=np.diag([L, L, L]))
    maxwell_boltzmann(s, 300, rng=np.random.default_rng(0))
    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      graph_mode='neighborlist', k_max=48,
                      reverse_lists=True,
                      output_properties=['energy', 'gradient_force'])
    z = jnp.asarray(numbers)[None]
    params = model.init(rng, z, jnp.asarray(s.positions)[None],
                        jnp.asarray(s.cell)[None])
    with warnings.catch_warnings():
        warnings.simplefilter('error')  # a list-quality warning = failure
        out, log = run_langevin_on_device(
            model, params, s, timestep=0.25 * units.fs, temperature_K=300,
            friction=1 / (100 * units.fs), n_steps=8, log_every=2,
            nlist_every=4, skin=1.0)
    assert log['epot'].shape == (4,)  # single system: (n_logged,) not flat
    assert np.isfinite(log['epot']).all()
    assert np.isfinite(out.positions).all()
    # a correctly-capacitated run must certify its own list quality
    assert log['nlist_overflow'] == 0
    assert log['skin_violations'] == 0


def test_list_quality_counters_are_exact():
    '''The amortized driver's list-quality counters are load-bearing: an
    UNDERSIZED k_max reports exactly the overflow count of the list built
    at the rebuild positions (one rebuild: nlist_every == n_steps, so the
    build happens at the known initial positions), and the driver warns.'''
    from newtonnet_tpu.md.driver import run_langevin_on_device
    from newtonnet_tpu.ops.nlist import neighbor_list

    rs = np.random.RandomState(3)
    N, L, k_small = 128, 12.0, 24
    numbers = rs.choice([1, 6, 8], N)
    pos0 = rs.rand(N, 3) * L
    cell = np.diag([L, L, L])

    # independent count: atoms whose in-range neighbor count at the initial
    # positions exceeds k_small at the build radius cutoff + skin
    skin = 1.0
    _, _, _, ovf = neighbor_list(
        jnp.asarray(pos0, jnp.float32)[None], jnp.asarray(cell)[None],
        jnp.ones((1, N), bool), 5.0 + skin, k_small)
    expected = int(np.sum(np.asarray(ovf)))
    assert expected > 0  # the config is deliberately undersized

    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      graph_mode='neighborlist', k_max=k_small,
                      output_properties=['energy', 'gradient_force'])
    z = jnp.asarray(numbers)[None]
    params = model.init(jax.random.PRNGKey(0), z,
                        jnp.asarray(pos0, jnp.float32)[None],
                        jnp.asarray(cell, jnp.float32)[None])

    def run(k_max, skin, n_steps=4):
        m = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      graph_mode='neighborlist', k_max=k_max,
                      output_properties=['energy', 'gradient_force'])
        s = System(numbers, pos0.copy(), cell=cell)
        maxwell_boltzmann(s, 300, rng=np.random.default_rng(0))
        return run_langevin_on_device(
            m, params, s, timestep=0.25 * units.fs, temperature_K=300,
            friction=1 / (100 * units.fs), n_steps=n_steps, log_every=2,
            nlist_every=n_steps, skin=skin)

    with pytest.warns(UserWarning, match='list quality'):
        _, log = run(k_small, skin)
    assert log['nlist_overflow'] == expected

    # correctly-capacitated twin: ample k_max -> both counters zero and no
    # warning (~68 in-range neighbors at build radius 6 A at this density)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter('error')
        _, log2 = run(127, skin)
    assert log2['nlist_overflow'] == 0
    assert log2['skin_violations'] == 0


def test_inverse_lists_md_matches_standard_driver():
    '''Host-rebuild MD with symmetric-slotted inverse lists integrates the
    exact same trajectory as the all-on-device amortized driver (same PRNG
    key layout, same rebuild cadence, same skin semantics).'''
    import numpy as np
    from newtonnet_tpu.data import units
    from newtonnet_tpu.md.driver import run_langevin_on_device
    from newtonnet_tpu.md.system import System, maxwell_boltzmann
    from newtonnet_tpu.models import NewtonNet

    rs = np.random.RandomState(0)
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
    for invl in (False, True):
        model = NewtonNet(graph_mode='neighborlist', k_max=40,
                          inverse_lists=invl,
                          output_properties=['energy', 'gradient_force'])
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(numbers[None], jnp.int32),
            jnp.asarray(pos[None], jnp.float32),
            jnp.asarray(cell[None], jnp.float32))
        params = jax.tree.map(lambda x: x * 0.1, params)
        s, log = run_langevin_on_device(
            model, params, fresh(), timestep=0.5 * units.fs,
            temperature_K=300, friction=0.02, n_steps=10, log_every=1,
            nlist_every=5, seed=0)
        results[invl] = (s.positions.copy(), log['epot'])
    np.testing.assert_allclose(results[True][0], results[False][0],
                               atol=1e-5)
    np.testing.assert_allclose(results[True][1], results[False][1],
                               atol=1e-4)


def test_newton3_md_matches_standard_driver():
    '''Host-rebuild MD with newton3 half lists (each undirected edge
    computed once) integrates the same trajectory as the all-on-device
    amortized driver with full lists.'''
    import numpy as np
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
    for n3 in (False, True):
        # k_max: full-list capacity when plain, HALF-list capacity under
        # newton3 (max(out, in)-degree of the Konig coloring + slack)
        model = NewtonNet(graph_mode='neighborlist', k_max=24 if n3 else 40,
                          newton3=n3,
                          output_properties=['energy', 'gradient_force'])
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(numbers[None], jnp.int32),
            jnp.asarray(pos[None], jnp.float32),
            jnp.asarray(cell[None], jnp.float32))
        params = jax.tree.map(lambda x: x * 0.1, params)
        s, log = run_langevin_on_device(
            model, params, fresh(), timestep=0.5 * units.fs,
            temperature_K=300, friction=0.02, n_steps=10, log_every=1,
            nlist_every=5, seed=0)
        results[n3] = (s.positions.copy(), log['epot'])
    np.testing.assert_allclose(results[True][0], results[False][0],
                               atol=1e-5)
    np.testing.assert_allclose(results[True][1], results[False][1],
                               atol=1e-4)


def test_amortized_md_reports_skin_violations():
    '''The in-jit amortized driver surfaces list-quality counters: with a
    tiny skin and long rebuild interval, atoms outrun skin/2 and the log
    reports it (previously silent -- forces just missed new neighbors).'''
    import warnings

    import numpy as np
    from newtonnet_tpu.data import units
    from newtonnet_tpu.md.driver import run_langevin_on_device
    from newtonnet_tpu.md.system import System, maxwell_boltzmann
    from newtonnet_tpu.models import NewtonNet

    rs = np.random.RandomState(2)
    n = 24
    L = (n / 0.02) ** (1 / 3)
    cell = np.diag([L, L, L])
    s = System(rs.choice([1, 1, 8], size=n), rs.rand(n, 3) @ cell,
               cell=cell, pbc=[True] * 3)
    maxwell_boltzmann(s, 600.0, rng=np.random.default_rng(0))
    model = NewtonNet(graph_mode='neighborlist', k_max=23,
                      output_properties=['energy', 'gradient_force'])
    params = model.init(jax.random.PRNGKey(0),
                        jnp.asarray(s.numbers[None], jnp.int32),
                        jnp.asarray(s.positions[None], jnp.float32),
                        jnp.asarray(cell[None], jnp.float32))
    params = jax.tree.map(lambda x: x * 0.01, params)  # nearly free atoms
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter('always')
        _, log = run_langevin_on_device(
            model, params, s, timestep=2.0 * units.fs, temperature_K=600,
            friction=0.02, n_steps=40, log_every=10, nlist_every=20,
            skin=1e-3)
    assert log['skin_violations'] > 0
    assert any('skin/2' in str(x.message) for x in w)


class MICLennardJones:
    """Periodic LJ with minimum-image convention and analytic virial
    stress (ASE sign convention: stress = (1/V) dE/d(strain))."""

    def __init__(self, eps=0.0104, sigma=3.4):
        self.eps, self.sigma = eps, sigma

    def calculate(self, system):
        cell = system.cell
        inv = np.linalg.inv(cell)
        d = system.positions[:, None, :] - system.positions[None, :, :]
        d -= np.round(d @ inv) @ cell
        r2 = np.sum(d * d, axis=-1)
        np.fill_diagonal(r2, np.inf)
        inv6 = (self.sigma ** 2 / r2) ** 3
        inv12 = inv6 * inv6
        energy = 2.0 * self.eps * np.sum(inv12 - inv6)
        coef = 4.0 * self.eps * (12.0 * inv12 - 6.0 * inv6) / r2
        forces = np.sum(coef[:, :, None] * d, axis=1)
        vol = abs(np.linalg.det(cell))
        # stress = -(1/2V) sum_ij coef d (x) d (1/2 for double counting)
        stress = -0.5 / vol * np.einsum('ij,ija,ijb->ab', coef, d, d)
        return {'energy': energy, 'forces': forces, 'stress': stress}


def _lj_crystal(scale=1.0):
    a = 2 ** (1 / 6) * 3.4 * scale
    g = np.arange(3) * a
    pos = np.stack(np.meshgrid(g, g, g, indexing='ij'), -1).reshape(-1, 3)
    s = System([18] * 27, pos, cell=np.eye(3) * (3 * a), pbc=[True] * 3)
    s.calc = MICLennardJones()
    return s


def test_nose_hoover_chain_nvt():
    """NHC on an interacting LJ solid: equilibrates to the target
    temperature and conserves the extended Hamiltonian."""
    from newtonnet_tpu.md.integrators import NoseHooverChain

    s = _lj_crystal()
    maxwell_boltzmann(s, 15.0, rng=np.random.default_rng(5))
    dyn = NoseHooverChain(s, timestep=2.0 * units.fs, temperature_K=30,
                          tdamp=50 * units.fs)
    dyn.run(300)  # equilibrate (incl. heating 15 -> 30)
    h0 = dyn.conserved_quantity()
    temps = []
    for _ in range(8):
        dyn.run(100)
        temps.append(s.temperature())
    assert abs(np.mean(temps) - 30.0) < 6.0, np.mean(temps)
    drift = abs(dyn.conserved_quantity() - h0)
    assert drift < 1e-3, drift


def test_berendsen_npt_relaxes_pressure():
    """Compressed periodic LJ crystal under NPT: the barostat expands the
    box and drives the pressure toward the target."""
    from newtonnet_tpu.md.integrators import BerendsenNPT, _pressure

    s = _lj_crystal(scale=0.94)  # compressed 6% below the LJ minimum
    maxwell_boltzmann(s, 30.0, rng=np.random.default_rng(6))
    p_start = _pressure(s)
    assert p_start > 0  # compressed -> positive pressure
    v_start = abs(np.linalg.det(s.cell))
    dyn = BerendsenNPT(s, timestep=2.0 * units.fs, temperature_K=30,
                       taut=50 * units.fs, taup=200 * units.fs,
                       pressure=0.0)
    dyn.run(300)
    v_end = abs(np.linalg.det(s.cell))
    p_end = _pressure(s)
    assert v_end > v_start * 1.01, (v_start, v_end)
    assert abs(p_end) < 0.5 * p_start, (p_start, p_end)
    assert abs(s.temperature() - 30) < 30


def test_on_device_nhc_matches_host_integrator(rng):
    '''The on-device NHC scan reproduces the host-loop NoseHooverChain
    (identical algebra) step for step, and its extended Hamiltonian is
    conserved over a longer run.'''
    from newtonnet_tpu.md.calculator import NewtonNetCalculator
    from newtonnet_tpu.md.driver import run_nhc_on_device
    from newtonnet_tpu.md.integrators import NoseHooverChain

    model = NewtonNet(n_features=16, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force'])
    s = _h2o()
    z = jnp.zeros((1, 8), jnp.int32).at[0, :3].set(jnp.asarray(s.numbers))
    pos = jnp.zeros((1, 8, 3)).at[0, :3].set(jnp.asarray(s.positions))
    params = model.init(rng, z, pos, jnp.zeros((1, 3, 3)))
    maxwell_boltzmann(s, 300, rng=np.random.default_rng(0))

    host = System(s.numbers.copy(), s.positions.copy(),
                  momenta=s.momenta.copy())
    host.calc = NewtonNetCalculator(model=model, params=params,
                                    properties=['energy', 'forces'],
                                    precision='float64')
    dyn = NoseHooverChain(host, timestep=0.25 * units.fs, temperature_K=300,
                          tdamp=10 * units.fs)
    dyn.run(10)

    dev = System(s.numbers.copy(), s.positions.copy(),
                 momenta=s.momenta.copy())
    dev2, log = run_nhc_on_device(
        model, params, dev, timestep=0.25 * units.fs, temperature_K=300,
        tdamp=10 * units.fs, n_steps=10, log_every=1, dtype=np.float64)
    np.testing.assert_allclose(dev2.positions, host.positions,
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(dev2.momenta, host.momenta,
                               rtol=0, atol=1e-7)

    # conservation over a longer f64 run
    dev3, log3 = run_nhc_on_device(
        model, params, dev2, timestep=0.25 * units.fs, temperature_K=300,
        tdamp=10 * units.fs, n_steps=400, log_every=10, dtype=np.float64)
    drift = np.max(np.abs(log3['conserved'] - log3['conserved'][0]))
    assert drift < 5e-4, drift
    assert np.isfinite(log3['temperature']).all()
