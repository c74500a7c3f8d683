'''Molecular dynamics integrators (host loop, jitted force engine).

The reference uses ASE's Langevin driver (scripts/simulate.py:21-30); ASE is
unavailable here, so the integrators are implemented natively with the same
algorithms and units:

  * VelocityVerlet -- standard NVE.
  * Langevin -- the Vanden-Eijnden / Ciccotti (2006) splitting that ASE's
    ase.md.langevin uses, with identical coefficients, so trajectories are
    statistically equivalent to the reference MD run
    (scripts/md17_md/md.log).

For maximum TPU throughput (no host round trip per step) see
newtonnet_tpu/md/driver.py, which runs the whole trajectory on device
under lax.scan.
'''
import math

import numpy as np

from newtonnet_tpu.data.units import fs, kB, ps
from newtonnet_tpu.data.xyz import write_extxyz


class MDLogger:
    '''ASE-style md.log writer: Time[ps] Etot Epot Ekin T[K].'''

    def __init__(self, path):
        self.path = path
        with open(path, 'w') as f:
            f.write('Time[ps]      Etot[eV]     Epot[eV]     Ekin[eV]'
                    '    T[K]\n')

    def __call__(self, system, time):
        epot = system.get_potential_energy()
        ekin = system.kinetic_energy()
        temp = system.temperature()
        with open(self.path, 'a') as f:
            f.write(f'{time / ps:<10.4f} {epot + ekin:12.4f} {epot:12.4f} '
                    f'{ekin:12.4f} {temp:6.1f}\n')


class XYZTrajectory:
    '''Append frames to an extxyz trajectory file.'''

    def __init__(self, path):
        self.path = path
        open(path, 'w').close()

    def __call__(self, system, time):
        frame = system.to_frame(energy=system.get_potential_energy(),
                                forces=system.get_forces())
        write_extxyz(self.path, frame, mode='a')


class _Integrator:
    def __init__(self, system, timestep, logfile=None, trajectory=None,
                 loginterval=1):
        self.system = system
        self.dt = timestep
        self.observers = []
        if logfile is not None:
            self.observers.append((MDLogger(logfile), loginterval))
        if trajectory is not None:
            self.observers.append((XYZTrajectory(trajectory), loginterval))
        self.nsteps = 0

    def attach(self, fn, interval=1):
        self.observers.append((fn, interval))

    def _notify(self):
        for fn, interval in self.observers:
            if self.nsteps % interval == 0:
                fn(self.system, self.nsteps * self.dt)

    def run(self, steps):
        self._notify()
        for _ in range(steps):
            self.step()
            self.nsteps += 1
            self._notify()


class VelocityVerlet(_Integrator):
    def step(self):
        s = self.system
        f = s.get_forces()
        s.momenta = s.momenta + 0.5 * self.dt * f
        s.positions = s.positions + self.dt * s.momenta / s.masses[:, None]
        f = s.get_forces()
        s.momenta = s.momenta + 0.5 * self.dt * f


class Langevin(_Integrator):
    '''Langevin NVT, ASE-compatible coefficients.

    Args:
        system: System with a calculator attached.
        timestep: in internal units (pass e.g. 0.5 * units.fs).
        temperature_K: bath temperature.
        friction: friction coefficient in inverse internal time
            (e.g. 1 / (500 * units.fs), as scripts/simulate.py:15).
        rng: numpy Generator for the thermostat noise.
    '''

    def __init__(self, system, timestep, temperature_K, friction,
                 rng=None, **kwargs):
        super().__init__(system, timestep, **kwargs)
        self.temp = kB * temperature_K
        self.fr = friction
        self.rng = rng or np.random.default_rng(0)
        self._update_coeffs()

    def _update_coeffs(self):
        dt, fr, T = self.dt, self.fr, self.temp
        masses = self.system.masses[:, None]
        sigma = np.sqrt(2 * T * fr / masses)
        self.c1 = dt / 2.0 - dt * dt * fr / 8.0
        self.c2 = dt * fr / 2.0 - dt * dt * fr * fr / 8.0
        self.c3 = math.sqrt(dt) * sigma / 2.0 - dt ** 1.5 * fr * sigma / 8.0
        self.c5 = dt ** 1.5 * sigma / (2.0 * math.sqrt(3.0))
        self.c4 = fr / 2.0 * self.c5

    def step(self):
        s = self.system
        masses = s.masses[:, None]
        f = s.get_forces()
        v = s.get_velocities()
        xi = self.rng.standard_normal((len(s), 3))
        eta = self.rng.standard_normal((len(s), 3))
        v += self.c1 * f / masses - self.c2 * v + self.c3 * xi - self.c4 * eta
        s.positions = s.positions + self.dt * v + self.c5 * eta
        f = s.get_forces()
        v += self.c1 * f / masses - self.c2 * v + self.c3 * xi - self.c4 * eta
        s.set_velocities(v)
