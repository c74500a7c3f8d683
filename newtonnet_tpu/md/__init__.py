from newtonnet_tpu.md.calculator import NewtonNetCalculator
from newtonnet_tpu.md.integrators import (
    BerendsenNPT,
    BerendsenNVT,
    Langevin,
    MDLogger,
    NoseHooverChain,
    VelocityVerlet,
)
from newtonnet_tpu.md.system import System, maxwell_boltzmann
from newtonnet_tpu.md.optimize import FIRE
