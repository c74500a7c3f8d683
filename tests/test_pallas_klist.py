'''Fused K-list Pallas hot path (ops/pallas_klist.py +
models/pallas_klist.py + train/fastgrad.py): interpret-mode parity against
the XLA neighborlist stack -- forward, first-order derivatives (forces /
stress), dual forward, and full training gradients. Compiled-mode timing on
real TPU hardware: tools/bench_train_large.py pallas mode.'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonnet_tpu.models import NewtonNet
from newtonnet_tpu.ops.pallas_klist import (
    make_fused_klist_interaction,
    make_fused_klist_interaction_dual,
)
from newtonnet_tpu.train import fastgrad, get_loss_by_string


# ------------------------------------------------------------------ #
# op-level: XLA restatement of the fused K-list layer (the kernels'
# docstring contract)
def _xla_ref(npi, cat, rbf, dir_, mask, We, W1a, W1b, W2a, W2b,
             with_force=True):
    silu = jax.nn.silu
    f = npi.shape[-1]
    m = mask[..., None]
    npj = cat[..., :f]
    msg = (rbf @ We) * npi[:, :, None] * npj * m    # (B, N, K, F)
    inv1 = jnp.sum(msg, axis=2)
    phi1 = (silu(msg @ W1a) @ W1b) * m
    if with_force:
        phi2 = (silu(msg @ W2a) @ W2b) * m
    eqs = []
    for d in range(3):
        e = jnp.sum(phi1 * dir_[:, d][..., None], axis=2)
        if with_force:
            e = e + jnp.sum(phi2 * cat[..., (d + 1) * f:(d + 2) * f], axis=2)
        eqs.append(e[:, None])
    return inv1, jnp.concatenate(eqs, axis=1)


def _op_inputs(B=2, N=8, K=8, F=16, R=4, with_force=True, seed=0):
    rs = np.random.RandomState(seed)
    C = 4 * F if with_force else F
    npi = jnp.asarray(rs.randn(B, N, F), jnp.float32) * 0.3
    cat = jnp.asarray(rs.randn(B, N, K, C), jnp.float32) * 0.3
    rbf = jnp.asarray(rs.randn(B, N, K, R), jnp.float32) * 0.3
    dir_ = jnp.asarray(rs.randn(B, 3, N, K), jnp.float32)
    mask = jnp.asarray(rs.rand(B, N, K) < 0.7, jnp.float32)
    Ws = [jnp.asarray(rs.randn(*s), jnp.float32) * (1.0 / np.sqrt(s[0]))
          for s in [(R, F), (F, F), (F, F), (F, F), (F, F)]]
    return (npi, cat, rbf, dir_, mask), Ws


@pytest.mark.parametrize('with_force', [True, False])
def test_klist_forward_matches_xla(with_force):
    args, Ws = _op_inputs(with_force=with_force)
    fused = make_fused_klist_interaction(nb=4, interpret=True,
                                         dot_dtype=jnp.float32,
                                         with_force=with_force)
    inv1_p, eq_p = fused(*args, *Ws)
    inv1_x, eq_x = _xla_ref(*args, *Ws, with_force=with_force)
    np.testing.assert_allclose(np.asarray(inv1_p), np.asarray(inv1_x),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(eq_p), np.asarray(eq_x),
                               atol=2e-5)


@pytest.mark.parametrize('with_force', [True, False])
def test_klist_first_order_grads_match_xla(with_force):
    '''All backward-kernel cotangents: inputs (npi, cat, rbf, dir) and the
    five weights, against jax.grad of the XLA restatement.'''
    args, Ws = _op_inputs(with_force=with_force, seed=2)
    npi, cat, rbf, dir_, mask = args
    fused = make_fused_klist_interaction(nb=4, interpret=True,
                                         dot_dtype=jnp.float32,
                                         with_force=with_force)

    def loss(op):
        def f(a, c, r, d, ws):
            inv1, eq = op(a, c, r, d, mask, *ws)
            return jnp.sum(jnp.sin(eq)) + jnp.sum(inv1 ** 2)
        return f

    leaves = (npi, cat, rbf, dir_, Ws)
    g_p = jax.grad(loss(fused), argnums=(0, 1, 2, 3, 4))(*leaves)
    g_x = jax.grad(
        loss(lambda a, c, r, d, m, *ws: _xla_ref(a, c, r, d, m, *ws,
                                                 with_force=with_force)),
        argnums=(0, 1, 2, 3, 4))(*leaves)
    for lp, lx, name in zip(g_p, g_x, ['npi', 'cat', 'rbf', 'dir', 'Ws']):
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name), lp, lx)


def _dual_args(with_force=True, seed=3):
    (npi, cat, rbf, dir_, mask), Ws = _op_inputs(with_force=with_force,
                                                 seed=seed)
    rs = np.random.RandomState(seed + 100)
    dots = [jnp.asarray(rs.randn(*a.shape), jnp.float32) * 0.1
            for a in (npi, cat, rbf, dir_)]
    return (npi, dots[0], cat, dots[1], rbf, dots[2], dir_, dots[3],
            mask), Ws


def _xla_dual(npi, npidot, cat, catdot, rbf, rbfdot, dir_, dirdot, mask,
              *Ws, with_force=True):
    (inv1, eq), (inv1dot, eqdot) = jax.jvp(
        lambda a, c, r, d: _xla_ref(a, c, r, d, mask, *Ws,
                                    with_force=with_force),
        (npi, cat, rbf, dir_), (npidot, catdot, rbfdot, dirdot))
    return inv1, eq, inv1dot, eqdot


@pytest.mark.parametrize('with_force', [True, False])
def test_klist_dual_forward_matches_jvp(with_force):
    args, Ws = _dual_args(with_force=with_force)
    fused = make_fused_klist_interaction_dual(nb=4, interpret=True,
                                              dot_dtype=jnp.float32,
                                              with_force=with_force)
    outs_p = fused(*args, *Ws)
    outs_x = _xla_dual(*args, *Ws, with_force=with_force)
    for op, ox, name in zip(outs_p, outs_x,
                            ['inv1', 'eq', 'inv1dot', 'eqdot']):
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                                   atol=2e-5, err_msg=name)


@pytest.mark.parametrize('with_force', [True, False])
def test_klist_dual_vjp_matches_xla(with_force):
    '''Cotangents of the dual op for the theta-dependent leaves: npart_i,
    cat_j (and tangents) plus all five weights. rbf/dir cotangents are zero
    by contract (fastgrad surrogate).'''
    args, Ws = _dual_args(with_force=with_force, seed=4)
    (npi, npidot, cat, catdot, rbf, rbfdot, dir_, dirdot, mask) = args
    fused = make_fused_klist_interaction_dual(nb=4, interpret=True,
                                              dot_dtype=jnp.float32,
                                              with_force=with_force)

    def scalar(op):
        def f(a, adot, c, cdot, ws):
            inv1, eq, inv1dot, eqdot = op(
                a, adot, c, cdot, rbf, rbfdot, dir_, dirdot, mask, *ws)
            return (jnp.sum(jnp.sin(inv1)) + jnp.sum(eq ** 2)
                    + jnp.sum(jnp.cos(inv1dot) * inv1dot)
                    + jnp.sum(eqdot * jnp.sin(eqdot)))
        return f

    leaves = (npi, npidot, cat, catdot, Ws)
    g_p = jax.grad(scalar(fused), argnums=(0, 1, 2, 3, 4))(*leaves)
    g_x = jax.grad(
        scalar(lambda *a: _xla_dual(*a[:9], *a[9:],
                                    with_force=with_force)),
        argnums=(0, 1, 2, 3, 4))(*leaves)
    for lp, lx, name in zip(g_p, g_x, ['npi', 'npidot', 'cat', 'catdot',
                                       'Ws']):
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name), lp, lx)


# ------------------------------------------------------------------ #
# model-level: kernel='pallas' vs kernel='xla', both neighborlist
def _models(B=2, N=12, K=16, seed=0,
            outputs=('energy', 'gradient_force'), periodic=False):
    cfg = dict(cutoff=5.0, n_features=32, n_basis=8, n_interactions=2,
               graph_mode='neighborlist', k_max=K,
               output_properties=list(outputs))
    xla = NewtonNet(**cfg)
    pal = NewtonNet(kernel='pallas', **cfg)
    rs = np.random.RandomState(seed)
    z = np.zeros((B, N), np.int32)
    for b in range(B):
        n = rs.randint(6, N + 1)
        z[b, :n] = rs.choice([1, 6, 7, 8], size=n)
    z = jnp.asarray(z)
    if periodic:
        L = 7.0
        pos = jnp.asarray(rs.rand(B, N, 3) * L, jnp.float32)
        cell = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * L,
                                (B, 3, 3))
    else:
        pos = jnp.asarray(rs.randn(B, N, 3) * 1.8, jnp.float32)
        cell = jnp.zeros((B, 3, 3), jnp.float32)
    params = xla.init(jax.random.PRNGKey(seed), z, pos, cell)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    return xla, pal, params, z, pos, cell


def test_klist_model_matches_xla_forward_and_forces():
    xla, pal, params, z, pos, cell = _models()
    o_x = xla.apply(params, z, pos, cell)
    o_p = pal.apply(params, z, pos, cell)
    np.testing.assert_allclose(np.asarray(o_p['energy']),
                               np.asarray(o_x['energy']), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_p['gradient_force']),
                               np.asarray(o_x['gradient_force']), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_p['atom_node']),
                               np.asarray(o_x['atom_node']), atol=1e-4)


def test_klist_model_precomputed_nlist_and_stress():
    '''Periodic box with a host-precomputed plain list fed to both paths;
    stress/virial through the strain trick.'''
    from newtonnet_tpu.data.prelists import frame_neighbor_lists
    xla, pal, params, z, pos, cell = _models(
        seed=5, outputs=('energy', 'gradient_force', 'virial', 'stress'),
        periodic=True)
    idxs, masks = [], []
    for b in range(z.shape[0]):
        idx, m = frame_neighbor_lists(np.asarray(z[b]), np.asarray(pos[b]),
                                      np.asarray(cell[b]), 5.0, 16)
        idxs.append(idx)
        masks.append(m)
    nlist = (jnp.asarray(np.stack(idxs)), jnp.asarray(np.stack(masks)))
    o_x = xla.apply(params, z, pos, cell, nlist=nlist)
    o_p = pal.apply(params, z, pos, cell, nlist=nlist)
    for key in ('energy', 'gradient_force', 'virial', 'stress'):
        np.testing.assert_allclose(np.asarray(o_p[key]),
                                   np.asarray(o_x[key]), atol=2e-4,
                                   err_msg=key)


def test_klist_fastgrad_matches_xla_training_gradient():
    '''The full fused-kernel K-list training gradient == the standard
    reverse-over-reverse XLA gradient.'''
    xla, pal, params, z, pos, cell = _models(seed=8)
    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 20.0}})
    rs = np.random.RandomState(9)
    B, N = z.shape
    batch = {
        'z': z, 'pos': pos, 'cell': cell,
        'graph_mask': jnp.ones(B, bool),
        'energy': jnp.asarray(rs.randn(B), jnp.float32),
        'force': jnp.asarray(rs.randn(B, N, 3), jnp.float32),
    }

    def loss_fn(p):
        preds = xla.apply(p, z, pos, cell)
        return main_loss(preds, batch)

    l_x, g_x = jax.value_and_grad(loss_fn)(params)
    l_p, g_p, _ = fastgrad.value_and_grad(pal, main_loss, params, batch)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4), g_p, g_x)


def test_klist_bf16_edges_close_to_f32():
    '''compute_dtype='bfloat16' rides the gathered edge tensors in bf16;
    the result must stay within mixed-precision tolerance of fp32.'''
    xla, _, params, z, pos, cell = _models(seed=11)
    cfg = dict(cutoff=5.0, n_features=32, n_basis=8, n_interactions=2,
               graph_mode='neighborlist', k_max=16,
               output_properties=['energy', 'gradient_force'])
    pal16 = NewtonNet(kernel='pallas', compute_dtype='bfloat16', **cfg)
    o_x = xla.apply(params, z, pos, cell)
    o_p = pal16.apply(params, z, pos, cell)
    np.testing.assert_allclose(np.asarray(o_p['energy']),
                               np.asarray(o_x['energy']),
                               rtol=0.05, atol=0.05)
    scale = np.abs(np.asarray(o_x['gradient_force'])).max()
    np.testing.assert_allclose(np.asarray(o_p['gradient_force']) / scale,
                               np.asarray(o_x['gradient_force']) / scale,
                               atol=0.05)
