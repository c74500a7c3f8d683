'''ASE Calculator bridge (reference: newtonnet/utils/ase_interface.py).

When ASE is installed, MLAseCalculator plugs the jitted NewtonNet engine
into ase.md / ase.optimize drivers with the same surface as the reference
calculator (implemented_properties, Voigt stress, hessian reshape). In this
repo's environment ASE is absent; the native equivalents live in
newtonnet_tpu.md (System + integrators share the same engine).
'''
import numpy as np

from newtonnet_tpu.md.calculator import NewtonNetCalculator

try:
    from ase.calculators.calculator import Calculator, all_changes
    HAVE_ASE = True
except ImportError:  # pragma: no cover - ASE not installed here
    HAVE_ASE = False

    class Calculator:  # minimal stand-in so the class definition loads
        def __init__(self, **kwargs):
            self.results = {}
    all_changes = None


class MLAseCalculator(Calculator):
    '''ASE Calculator for NewtonNet-TPU models (ref ase_interface.py:18-81).

    Args:
        model_path: .msgpack checkpoint, reference .pt pickle, or a
            pretrained alias ('ani1' | 'ani1x' | 't1x').
        properties: subset of implemented_properties.
        precision: 'float32' | 'float64'.
    '''
    implemented_properties = ['charges', 'bec', 'energy', 'free_energy',
                              'forces', 'hessian', 'stress']

    def __init__(self, model_path, properties=None, device=None,
                 precision='float32', **kwargs):
        if not HAVE_ASE:
            raise ImportError(
                'ase is not installed; use newtonnet_tpu.md.System with '
                'NewtonNetCalculator instead')
        Calculator.__init__(self, **kwargs)
        if model_path in ('ani1', 'ani1x', 't1x'):
            from newtonnet_tpu.utils.pretrained import download_checkpoint
            model_path = download_checkpoint(model_path)
        del device  # JAX picks the accelerator; kept for API compatibility
        self.engine = NewtonNetCalculator(model_path=model_path,
                                          properties=properties,
                                          precision=precision)
        self.properties = self.engine.properties

    def calculate(self, atoms=None, properties=None, system_changes=None):
        super().calculate(atoms, self.properties,
                          system_changes or all_changes)
        pbc = atoms.get_pbc()
        cell = np.array(atoms.get_cell())
        cell[~pbc] = 0.0  # ref ase_interface.py:138
        out = self.engine.calculate(
            numbers=atoms.get_atomic_numbers(),
            positions=atoms.get_positions(wrap=pbc.any()),
            cell=cell)
        self.results.update(out)
