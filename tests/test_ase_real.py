'''Real-ASE integration: MLAseCalculator driven by an actually-installed
ASE through ase.md Langevin dynamics and ase.optimize BFGS.

This image does not ship ASE, so the whole module skips here; it runs
unchanged in any environment with ASE installed (pip install ase), which
is how the bridge (newtonnet_tpu/utils/ase_interface.py, mirroring
reference newtonnet/utils/ase_interface.py:18-81) is meant to be
exercised. The stubbed-ASE surface test lives in test_cli_and_misc.py.
'''
import os

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
CKPT = os.path.join(HERE, '..', 'artifacts', 'md17_model',
                    'best_model.msgpack')

# the fixture must exist even in ASE-less environments: otherwise this
# module is structurally unrunnable (skips twice) and reads as coverage
# it does not provide. Assert BEFORE the importorskip so a broken path
# fails the suite everywhere.
assert os.path.exists(CKPT), (
    f'checkpoint fixture missing: {CKPT} -- the real-ASE tests would '
    f'silently skip even with ASE installed')

ase = pytest.importorskip('ase')


@pytest.fixture(scope='module')
def aspirin_atoms():
    from ase import Atoms

    from newtonnet_tpu.data.xyz import read_extxyz
    frame = read_extxyz(os.path.join(
        HERE, '..', 'data', 'md17_aspirin', 'ccsd_test', 'raw',
        'aspirin_ccsd-test.xyz'), index=0)
    return Atoms(numbers=frame['z'], positions=frame['pos'])


@pytest.fixture(scope='module')
def calculator():
    from newtonnet_tpu.utils.ase_interface import MLAseCalculator
    return MLAseCalculator(model_path=CKPT,
                           properties=['energy', 'forces'])


def test_ase_energy_forces(aspirin_atoms, calculator):
    aspirin_atoms.calc = calculator
    e = aspirin_atoms.get_potential_energy()
    f = aspirin_atoms.get_forces()
    assert np.isfinite(e)
    assert f.shape == (len(aspirin_atoms), 3)
    assert np.isfinite(f).all()
    # trained model: net force ~ 0 (translation invariance)
    np.testing.assert_allclose(f.sum(axis=0), 0.0, atol=1e-3)


def test_ase_md_langevin(aspirin_atoms, calculator):
    from ase import units
    from ase.md.langevin import Langevin
    from ase.md.velocitydistribution import MaxwellBoltzmannDistribution

    atoms = aspirin_atoms.copy()
    atoms.calc = calculator
    MaxwellBoltzmannDistribution(atoms, temperature_K=300)
    dyn = Langevin(atoms, timestep=0.5 * units.fs, temperature_K=300,
                   friction=0.02)
    e0 = atoms.get_potential_energy()
    dyn.run(20)
    e1 = atoms.get_potential_energy()
    assert np.isfinite(e1)
    assert abs(e1 - e0) < 5.0  # stable short trajectory, no blowup


def test_ase_optimize_bfgs(aspirin_atoms, calculator):
    from ase.optimize import BFGS

    atoms = aspirin_atoms.copy()
    atoms.calc = calculator
    fmax0 = np.abs(atoms.get_forces()).max()
    opt = BFGS(atoms, logfile=None)
    converged = opt.run(fmax=max(0.05, fmax0 / 2), steps=50)
    fmax1 = np.abs(atoms.get_forces()).max()
    # either converged to the target, or the 50-step cap hit -- in which
    # case the optimizer must at least have made progress downhill
    assert converged or fmax1 < fmax0
