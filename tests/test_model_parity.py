'''End-to-end numerical parity of the TPU model vs the torch oracle.

The oracle (tests/torch_oracle.py) restates the reference equations with
dynamic edge lists + autograd; the TPU model uses dense masked message
passing + jax.grad. Identical parameters must give allclose outputs in
float64 (SURVEY.md section 4).
'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonnet_tpu.models import NewtonNet

import torch_oracle

F64 = jnp.float64


def make_batch(rng, sizes, n_pad, periodic=False, seed_scale=2.5):
    '''Random padded batch + the equivalent flat PyG-style arrays.'''
    rs = np.random.RandomState(0)
    B = len(sizes)
    z = np.zeros((B, n_pad), dtype=np.int32)
    pos = np.zeros((B, n_pad, 3))
    cell = np.zeros((B, 3, 3))
    flat_z, flat_pos, flat_batch = [], [], []
    for b, n in enumerate(sizes):
        zb = rs.choice([1, 6, 7, 8], size=n)
        pb = rs.randn(n, 3) * seed_scale
        z[b, :n] = zb
        pos[b, :n] = pb
        if periodic:
            cell[b] = np.diag([9.0, 10.0, 11.0]) + rs.rand(3, 3) * 0.0
            pb = pb % np.diag(cell[b])
            pos[b, :n] = pb
        flat_z.append(zb)
        flat_pos.append(pb)
        flat_batch.append(np.full(n, b))
    return (
        jnp.asarray(z), jnp.asarray(pos, F64), jnp.asarray(cell, F64),
        np.concatenate(flat_z), np.concatenate(flat_pos),
        np.concatenate(flat_batch),
    )


@pytest.mark.parametrize('periodic', [False, True])
@pytest.mark.parametrize('layer_norm', [False, True])
def test_energy_force_parity(rng, periodic, layer_norm):
    sizes = [5, 7]
    z, pos, cell, fz, fpos, fbatch = make_batch(rng, sizes, n_pad=8,
                                                periodic=periodic)
    props = ['energy', 'gradient_force', 'virial', 'stress'] \
        if periodic else ['energy', 'gradient_force']
    # mic_mode='reference' reproduces the reference MIC exactly (including
    # its cell-vs-cell^T gradient quirk, see ops/neighbors.py docstring);
    # the physically exact default is covered by test_invariance.py.
    model = NewtonNet(cutoff=5.0, n_features=16, n_basis=8, n_interactions=2,
                      layer_norm=layer_norm, output_properties=props,
                      mic_mode='reference', param_dtype=F64)
    params = model.init(rng, z, pos, cell)
    out = model.apply(params, z, pos, cell)

    ref = torch_oracle.forward(
        jax.device_get(params), fz, fpos,
        np.asarray(cell) if periodic else np.zeros((len(sizes), 3, 3)),
        fbatch, cutoff=5.0, n_basis=8, n_interactions=2,
        output_properties=props)

    np.testing.assert_allclose(np.asarray(out['energy']),
                               ref['energy'].detach().numpy(),
                               rtol=1e-9, atol=1e-9)
    # unpad forces to flat layout
    force = np.concatenate([np.asarray(out['gradient_force'])[b, :n]
                            for b, n in enumerate(sizes)])
    np.testing.assert_allclose(force, ref['gradient_force'].detach().numpy(),
                               rtol=1e-8, atol=1e-9)
    if periodic:
        np.testing.assert_allclose(np.asarray(out['virial']),
                                   ref['virial'].detach().numpy(),
                                   rtol=1e-8, atol=1e-9)
        np.testing.assert_allclose(np.asarray(out['stress']),
                                   ref['stress'].detach().numpy(),
                                   rtol=1e-8, atol=1e-9)


def test_direct_heads_parity(rng):
    sizes = [6, 4]
    z, pos, cell, fz, fpos, fbatch = make_batch(rng, sizes, n_pad=8)
    props = ['energy', 'charge', 'direct_force']
    model = NewtonNet(n_features=16, n_basis=8, n_interactions=1,
                      output_properties=props, param_dtype=F64)
    params = model.init(rng, z, pos, cell)
    out = model.apply(params, z, pos, cell)

    ref = torch_oracle.forward(jax.device_get(params), fz, fpos,
                               np.zeros((2, 3, 3)), fbatch,
                               n_basis=8, n_interactions=1,
                               output_properties=props)
    charge = np.concatenate([np.asarray(out['charge'])[b, :n]
                             for b, n in enumerate(sizes)])
    np.testing.assert_allclose(charge,
                               ref['charge'].detach().numpy().ravel(),
                               rtol=1e-9, atol=1e-10)
    dforce = np.concatenate([np.asarray(out['direct_force'])[b, :n]
                             for b, n in enumerate(sizes)])
    np.testing.assert_allclose(dforce, ref['direct_force'].detach().numpy(),
                               rtol=1e-9, atol=1e-10)
    # energy here excludes the long-range term only if charge is absent;
    # with a charge head the TPU energy includes Ewald (ref output.py:234),
    # so compare short-range part by subtracting it.
    from newtonnet_tpu.ops.ewald import ewald_energy
    e_lr = ewald_energy(out['charge'], pos, cell, z > 0,
                        sigma=model.ewald_sigma, n_k=model.ewald_n_k)
    np.testing.assert_allclose(np.asarray(out['energy'] - e_lr),
                               ref['energy'].detach().numpy(),
                               rtol=1e-9, atol=1e-9)


@pytest.mark.slow
def test_hessian_matches_fd(rng):
    sizes = [4]
    z, pos, cell, *_ = make_batch(rng, sizes, n_pad=4)
    model = NewtonNet(n_features=8, n_basis=4, n_interactions=1,
                      output_properties=['energy', 'gradient_force',
                                         'hessian'],
                      param_dtype=F64)
    params = model.init(rng, z, pos, cell)
    out = model.apply(params, z, pos, cell)
    h = np.asarray(out['hessian'])[0]
    # symmetry
    np.testing.assert_allclose(h, h.transpose(2, 3, 0, 1), atol=1e-9)
    # finite difference of forces
    eps = 1e-5
    i, d = 1, 0
    fp = model.apply(params, z, pos.at[0, i, d].add(eps), cell)
    fm = model.apply(params, z, pos.at[0, i, d].add(-eps), cell)
    fd = -(np.asarray(fp['gradient_force'][0])
           - np.asarray(fm['gradient_force'][0])) / (2 * eps)
    np.testing.assert_allclose(h[i, d], fd, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_hessian_matches_fd_neighborlist(rng):
    '''Hessian head on the neighborlist and newton3 half-list paths ==
    the dense-path Hessian and the FD of forces at the same tolerances
    (closes the last untested head x formulation cell: the list
    primitives' jvp/transpose modes are covered in test_nlist.py, but
    were never composed through the blocked jacfwd-of-grad head).'''
    from newtonnet_tpu.ops.nlist import (build_inverse_list, neighbor_list,
                                         newton3_half_list)

    sizes = [4]
    z, pos, cell, *_ = make_batch(rng, sizes, n_pad=4)
    common = dict(n_features=8, n_basis=4, n_interactions=1,
                  output_properties=['energy', 'gradient_force', 'hessian'],
                  param_dtype=F64)
    dense = NewtonNet(**common)
    params = dense.init(rng, z, pos, cell)
    h_dense = np.asarray(dense.apply(params, z, pos, cell)['hessian'])[0]

    idx, kmask, _, _ = neighbor_list(pos, cell, z > 0, dense.cutoff, 3)
    i2, m2 = newton3_half_list(np.asarray(idx), np.asarray(kmask))
    i2, m2 = jnp.asarray(i2), jnp.asarray(m2)
    inv, invm = build_inverse_list(jnp.swapaxes(i2, 1, 2),
                                   jnp.swapaxes(m2, 1, 2))
    paths = {
        'neighborlist': (NewtonNet(graph_mode='neighborlist', k_max=3,
                                   **common), (idx, kmask)),
        'newton3': (NewtonNet(graph_mode='neighborlist',
                              k_max=i2.shape[-1], newton3=True, **common),
                    (i2, m2, inv, invm)),
    }
    eps, i, d = 1e-5, 1, 0
    for name, (model, nl) in paths.items():
        out = model.apply(params, z, pos, cell, nlist=nl)
        h = np.asarray(out['hessian'])[0]
        # dense-path parity + symmetry at the dense tolerances
        np.testing.assert_allclose(h, h_dense, atol=1e-9, err_msg=name)
        np.testing.assert_allclose(h, h.transpose(2, 3, 0, 1), atol=1e-9,
                                   err_msg=name)
        # finite difference of the same path's forces
        fp = model.apply(params, z, pos.at[0, i, d].add(eps), cell,
                         nlist=nl)
        fm = model.apply(params, z, pos.at[0, i, d].add(-eps), cell,
                         nlist=nl)
        fd = -(np.asarray(fp['gradient_force'][0])
               - np.asarray(fm['gradient_force'][0])) / (2 * eps)
        np.testing.assert_allclose(h[i, d], fd, rtol=1e-5, atol=1e-6,
                                   err_msg=name)


@pytest.mark.slow
def test_trainable_basis(rng):
    '''trainable_basis=True initializes the Bessel frequencies at the
    reference's fixed k*pi grid (identical outputs at init) and lets
    gradients flow into them.'''
    z, pos, cell, *_ = make_batch(rng, [4, 5], n_pad=6)
    common = dict(n_features=8, n_basis=4, n_interactions=1,
                  output_properties=['energy', 'gradient_force'],
                  param_dtype=F64)
    frozen = NewtonNet(**common)
    trainable = NewtonNet(trainable_basis=True, **common)
    p_t = trainable.init(rng, z, pos, cell)
    freqs = p_t['params']['bessel_frequencies']
    np.testing.assert_allclose(np.asarray(freqs),
                               np.arange(1, 5) * np.pi, rtol=1e-12)
    p_f = jax.tree.map(lambda x: x, p_t)
    del p_f['params']['bessel_frequencies']
    out_f = frozen.apply(p_f, z, pos, cell)
    out_t = trainable.apply(p_t, z, pos, cell)
    np.testing.assert_allclose(out_f['energy'], out_t['energy'], rtol=1e-12)

    def loss(p):
        o = trainable.apply(p, z, pos, cell)
        return jnp.sum(o['energy'] ** 2) + jnp.sum(o['gradient_force'] ** 2)

    g = jax.grad(loss)(p_t)['params']['bessel_frequencies']
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.slow
def test_hessian_block_matches_full(rng):
    '''hessian_block (lax.map-blocked HVP lanes) == the all-at-once
    jacfwd Hessian, including a block size that does not divide 3N.'''
    z, pos, cell, *_ = make_batch(rng, [5], n_pad=5)
    common = dict(n_features=8, n_basis=4, n_interactions=2,
                  output_properties=['energy', 'hessian'], param_dtype=F64)
    full = NewtonNet(**common)
    blocked = NewtonNet(hessian_block=4, **common)  # 15 lanes -> 4 blocks
    params = full.init(rng, z, pos, cell)
    h_full = full.apply(params, z, pos, cell)['hessian']
    h_blk = jax.jit(lambda p: blocked.apply(p, z, pos, cell)['hessian'])(
        params)
    np.testing.assert_allclose(np.asarray(h_blk), np.asarray(h_full),
                               atol=1e-11)
