'''Published-accuracy parity: the shipped reference checkpoint
(scripts/md17_model/training_1/models/best_model.pt, trained by the
reference authors) evaluated through the TPU implementation must reproduce
the reference's logged MD17-aspirin test metrics
(scripts/md17_model/training_1/log.csv:533):
    test energy MAE = 0.006431154 eV
    test force MAE  = 0.022400917 eV/A
'''
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REF_CKPT = ('/root/reference/scripts/md17_model/training_1/models/'
            'best_model.pt')
DATA_ROOT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'data', 'md17_aspirin', 'ccsd_test')


@pytest.mark.skipif(not os.path.exists(REF_CKPT),
                    reason='reference checkpoint not available')
@pytest.mark.slow
def test_shipped_checkpoint_reproduces_logged_mae():
    from newtonnet_tpu.data import MolecularInMemoryDataset, PaddedLoader
    from newtonnet_tpu.utils.torch_import import load_reference_model

    model, params = load_reference_model(REF_CKPT)
    params = jax.tree.map(lambda x: jnp.asarray(x, jnp.float64), params)

    ds = MolecularInMemoryDataset(root=DATA_ROOT, precision=np.float64)
    loader = PaddedLoader(ds, batch_size=100, shuffle=False)
    apply = jax.jit(model.apply)

    mae_f = mae_e = atoms = graphs = 0.0
    for batch in loader:
        out = apply(params, jnp.asarray(batch['z']),
                    jnp.asarray(batch['pos']), jnp.asarray(batch['cell']))
        gm, am = batch['graph_mask'], batch['z'] > 0
        mae_e += np.abs(np.asarray(out['energy'])
                        - batch['energy'])[gm].sum()
        mae_f += np.abs(np.asarray(out['gradient_force'])
                        - batch['force'])[am].sum()
        graphs += gm.sum()
        atoms += am.sum()

    energy_mae = mae_e / graphs
    force_mae = mae_f / (3 * atoms)
    np.testing.assert_allclose(energy_mae, 0.006431154, rtol=1e-4)
    np.testing.assert_allclose(force_mae, 0.022400917, rtol=1e-4)
