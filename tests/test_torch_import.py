'''Reference-checkpoint importer robustness (utils/torch_import.py).

The shipped reference checkpoint proves import parity for ONE
architecture (128 features, 3 interactions, no layer_norm -- see
test_reference_checkpoint.py). The published ani1/ani1x/t1x release zips
are unreachable here (no network), and they were trained under the
reference's OLDER config schema (the shipped run's archived
run_scripts/config.yml uses `representation:` / `infer_properties:`
keys). This test fabricates an old-schema pickled checkpoint of a
DIFFERENT architecture (32 features, 8 basis, 2 interactions,
layer_norm, cutoff 4.5, old `embedding_layer` / `infer_properties`
attribute names, ref newtonnet/utils/pretrained_models.py:7-43) and
asserts load_reference_model recovers the architecture and the exact
weights -- everything checkpoint-dependent that can be proven offline.
'''
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from newtonnet_tpu.models import NewtonNet  # noqa: E402

OLD_MODULES = ['newtonnet', 'newtonnet.models', 'newtonnet.models.newtonnet',
               'newtonnet.models.output', 'newtonnet.layers',
               'newtonnet.layers.representations']


def _fab_class(modname, name):
    '''A picklable nn.Module subclass registered under `modname.name`.'''
    import torch.nn as nn
    mod = sys.modules[modname]
    cls = type(name, (nn.Module,), {})
    cls.__module__ = modname
    cls.__qualname__ = name
    setattr(mod, name, cls)
    return cls


def _fabricate_old_checkpoint(path, flax_params, *, n_features, n_basis,
                              n_interactions, cutoff):
    '''Build a reference-shaped module tree under the OLD schema, fill it
    with the given flax parameters, torch.save it, and unregister the
    fabricated modules (so loading exercises the importer's shims).'''
    import torch.nn as nn

    for m in OLD_MODULES:
        mod = types.ModuleType(m)
        sys.modules[m] = mod

    Net = _fab_class('newtonnet.models.newtonnet', 'NewtonNet')
    Emb = _fab_class('newtonnet.models.newtonnet', 'EmbeddingNet')
    Inter = _fab_class('newtonnet.models.newtonnet', 'InteractionNet')
    Norm = _fab_class('newtonnet.layers.representations', 'ScaledNorm')
    Head = _fab_class('newtonnet.models.output', 'EnergyOutput')
    Scaler = _fab_class('newtonnet.models.output', 'ScaleShift')

    p = flax_params['params']

    def lin(kernel, bias=None):
        out_f, in_f = kernel.shape[1], kernel.shape[0]
        layer = nn.Linear(in_f, out_f, bias=bias is not None)
        with torch.no_grad():
            layer.weight.copy_(torch.tensor(np.asarray(kernel).T))
            if bias is not None:
                layer.bias.copy_(torch.tensor(np.asarray(bias)))
        return layer

    def mlp(block, n_layers, act=True):
        layers = []
        for i in range(n_layers):
            lp = block[f'TorchLinear_{i}']
            layers.append(lin(lp['kernel'], lp.get('bias')))
            if act and i < n_layers - 1:
                layers.append(nn.SiLU())
        return nn.Sequential(*layers)

    m = Net()
    # OLD attribute names: embedding_layer (singular) + infer_properties
    emb = Emb()
    emb.node_embedding = nn.Embedding(119, n_features, padding_idx=0)
    with torch.no_grad():
        emb.node_embedding.weight.copy_(
            torch.tensor(np.asarray(p['node_embedding'])))
    emb.norm = Norm()
    emb.norm.r = cutoff
    m.embedding_layer = emb
    m.infer_properties = ['energy', 'gradient_force']

    m.interaction_layers = nn.ModuleList()
    for i in range(n_interactions):
        b = p[f'interaction_{i}']
        it = Inter()
        it.message_nodepart = mlp(b['message_nodepart'], 2)
        it.message_edgepart = lin(b['message_edgepart']['kernel'])
        it.equiv_message1 = nn.Sequential(
            lin(b['equiv_message1']['TorchLinear_0']['kernel']), nn.SiLU(),
            lin(b['equiv_message1']['TorchLinear_1']['kernel']))
        it.equiv_message2 = nn.Sequential(
            lin(b['equiv_message2']['TorchLinear_0']['kernel']), nn.SiLU(),
            lin(b['equiv_message2']['TorchLinear_1']['kernel']))
        it.equiv_update = lin(b['equiv_update']['kernel'])
        it.layer_norm = nn.LayerNorm(n_features)
        with torch.no_grad():
            it.layer_norm.weight.copy_(
                torch.tensor(np.asarray(b['layer_norm']['scale'])))
            it.layer_norm.bias.copy_(
                torch.tensor(np.asarray(b['layer_norm']['bias'])))
        m.interaction_layers.append(it)

    head = Head()
    head.layers = nn.Sequential(
        lin(p['energy_head']['TorchLinear_0']['kernel'],
            p['energy_head']['TorchLinear_0']['bias']), nn.SiLU(),
        lin(p['energy_head']['TorchLinear_1']['kernel'],
            p['energy_head']['TorchLinear_1']['bias']), nn.SiLU(),
        lin(p['energy_head']['TorchLinear_2']['kernel'],
            p['energy_head']['TorchLinear_2']['bias']))
    m.output_layers = nn.ModuleList([head])
    sc = Scaler()
    sc.scale = nn.Embedding(119, 1)
    sc.shift = nn.Embedding(119, 1)
    with torch.no_grad():
        sc.scale.weight.copy_(
            torch.tensor(np.asarray(p['scaler_energy']['scale'])))
        sc.shift.weight.copy_(
            torch.tensor(np.asarray(p['scaler_energy']['shift'])))
    m.scalers = nn.ModuleList([sc])

    torch.save(m, path)
    # unregister so load_reference_model must resolve via its shims, as
    # with a real downloaded checkpoint
    for name in OLD_MODULES:
        del sys.modules[name]


@pytest.mark.slow
def test_old_schema_checkpoint_roundtrip(tmp_path, rng):
    import jax
    import jax.numpy as jnp

    from newtonnet_tpu.utils.torch_import import load_reference_model

    cfg = dict(cutoff=4.5, n_features=32, n_basis=8, n_interactions=2,
               layer_norm=True,
               output_properties=['energy', 'gradient_force'])
    src = NewtonNet(mic_mode='reference', **cfg)
    z = jnp.asarray(np.random.RandomState(0).choice(
        [1, 6, 8], size=(2, 6)).astype(np.int32))
    pos = jnp.asarray(np.random.RandomState(1).randn(2, 6, 3) * 1.5,
                      jnp.float32)
    cell = jnp.zeros((2, 3, 3), jnp.float32)
    params = src.init(rng, z, pos, cell)

    path = os.path.join(tmp_path, 'old_schema.pt')
    _fabricate_old_checkpoint(path, jax.device_get(params), cutoff=4.5,
                              n_features=32, n_basis=8, n_interactions=2)

    model, imported = load_reference_model(path)
    # architecture recovered from the pickled tree alone
    assert model.cutoff == 4.5
    assert model.n_features == 32
    assert model.n_basis == 8
    assert model.n_interactions == 2
    assert model.layer_norm is True
    assert list(model.output_properties) == ['energy', 'gradient_force']
    # weights byte-exact through the torch round trip
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(imported))
    assert len(flat_a) == len(flat_b)
    for key, val in flat_a:
        np.testing.assert_array_equal(np.asarray(val),
                                      np.asarray(flat_b[key]),
                                      err_msg=str(key))
    # and the imported model runs
    out = jax.jit(model.apply)(imported, z, pos, cell)
    assert np.isfinite(np.asarray(out['energy'])).all()
    assert out['gradient_force'].shape == (2, 6, 3)
