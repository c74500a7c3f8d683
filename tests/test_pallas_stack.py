'''Fused Pallas training hot path (ops/pallas_dense.py dual kernels +
models/pallas_stack.py + train/fastgrad.py): interpret-mode parity against
the XLA/flax reference stack, forward / first-order / training gradients.
Compiled-mode timing on real TPU hardware: tools/bench_step_variants.py.'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonnet_tpu.models import NewtonNet
from newtonnet_tpu.ops.pallas_dense import (
    make_fused_pair_interaction,
    make_fused_pair_interaction_dual,
)
from newtonnet_tpu.train import get_loss_by_string
from newtonnet_tpu.train import fastgrad


# ------------------------------------------------------------------ #
# op-level: XLA restatement of the fused layer (same as the kernels'
# docstring contract)
def _xla_ref(np_, rbf, dir_, adj, force, We, W1a, W1b, W2a, W2b):
    silu = jax.nn.silu
    adj4 = adj[..., None]
    msg = (rbf @ We) * np_[:, :, None, :] * np_[:, None, :, :] * adj4
    inv1 = jnp.sum(msg, axis=2)
    phi1 = (silu(msg @ W1a) @ W1b) * adj4
    phi2 = (silu(msg @ W2a) @ W2b) * adj4
    eqs = []
    for d in range(3):
        e1 = jnp.sum(phi1 * dir_[:, d][..., None], axis=2)
        e2 = jnp.sum(phi2 * force[:, d][:, None, :, :], axis=2)
        eqs.append((e1 + e2)[:, None])
    return inv1, jnp.concatenate(eqs, axis=1)


def _op_inputs(B=4, N=8, F=32, R=8, seed=0):
    rs = np.random.RandomState(seed)
    np_ = jnp.asarray(rs.randn(B, N, F), jnp.float32) * 0.3
    rbf = jnp.asarray(rs.randn(B, N, N, R), jnp.float32) * 0.3
    dir_ = jnp.asarray(rs.randn(B, 3, N, N), jnp.float32)
    adj = jnp.asarray((rs.rand(B, N, N) < 0.6) & ~np.eye(N, dtype=bool),
                      jnp.float32)
    force = jnp.asarray(rs.randn(B, 3, N, F), jnp.float32) * 0.2
    Ws = [jnp.asarray(rs.randn(*s), jnp.float32) * (1.0 / np.sqrt(s[0]))
          for s in [(R, F), (F, F), (F, F), (F, F), (F, F)]]
    return (np_, rbf, dir_, adj, force), Ws


def test_first_order_weight_grads_match_xla():
    '''The backward kernel's weight cotangents (new in round 2; round 1
    returned zeros).'''
    args, Ws = _op_inputs(seed=2)
    fused = make_fused_pair_interaction(bb=2, interpret=True)

    def loss(op):
        def f(ws):
            inv1, eq = op(*args, *ws)
            return jnp.sum(jnp.sin(eq)) + jnp.sum(inv1 ** 2)
        return f

    g_p = jax.grad(loss(fused))(Ws)
    g_x = jax.grad(loss(_xla_ref))(Ws)
    for lp, lx, name in zip(g_p, g_x, ['We', 'W1a', 'W1b', 'W2a', 'W2b']):
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   atol=3e-5, err_msg=name)


def _dual_args(seed=3):
    (np_, rbf, dir_, adj, force), Ws = _op_inputs(seed=seed)
    rs = np.random.RandomState(seed + 100)
    npdot = jnp.asarray(rs.randn(*np_.shape), jnp.float32) * 0.1
    rbfdot = jnp.asarray(rs.randn(*rbf.shape), jnp.float32) * 0.1
    dirdot = jnp.asarray(rs.randn(*dir_.shape), jnp.float32) * 0.1
    forcedot = jnp.asarray(rs.randn(*force.shape), jnp.float32) * 0.1
    return (np_, npdot, rbf, rbfdot, dir_, dirdot, adj, force,
            forcedot), Ws


def _xla_dual(np_, npdot, rbf, rbfdot, dir_, dirdot, adj, force, forcedot,
              *Ws):
    (inv1, eq), (inv1dot, eqdot) = jax.jvp(
        lambda a, r, d, f: _xla_ref(a, r, d, adj, f, *Ws),
        (np_, rbf, dir_, force), (npdot, rbfdot, dirdot, forcedot))
    return inv1, eq, inv1dot, eqdot


def test_dual_forward_matches_jvp():
    args, Ws = _dual_args()
    fused = make_fused_pair_interaction_dual(bb=2, interpret=True)
    outs_p = fused(*args, *Ws)
    outs_x = _xla_dual(*args, *Ws)
    for op, ox, name in zip(outs_p, outs_x,
                            ['inv1', 'eq', 'inv1dot', 'eqdot']):
        np.testing.assert_allclose(np.asarray(op), np.asarray(ox),
                                   atol=2e-5, err_msg=name)


def test_dual_vjp_matches_xla():
    '''Cotangents of the dual op for the theta-dependent leaves: nodepart,
    force (and their tangents) plus all five weights. rbf/dir cotangents are
    zero by contract (geometry is theta-independent in the fastgrad
    surrogate) and are not compared.'''
    args, Ws = _dual_args(seed=4)
    (np_, npdot, rbf, rbfdot, dir_, dirdot, adj, force, forcedot) = args
    fused = make_fused_pair_interaction_dual(bb=2, interpret=True)

    def scalar(op):
        def f(a, adot, fo, fodot, ws):
            inv1, eq, inv1dot, eqdot = op(
                a, adot, rbf, rbfdot, dir_, dirdot, adj, fo, fodot, *ws)
            return (jnp.sum(jnp.sin(inv1)) + jnp.sum(eq ** 2)
                    + jnp.sum(jnp.cos(inv1dot) * inv1dot)
                    + jnp.sum(eqdot * jnp.sin(eqdot)))
        return f

    leaves = (np_, npdot, force, forcedot, Ws)
    g_p = jax.grad(scalar(fused), argnums=(0, 1, 2, 3, 4))(*leaves)
    g_x = jax.grad(scalar(_xla_dual), argnums=(0, 1, 2, 3, 4))(*leaves)
    names = ['np', 'npdot', 'force', 'forcedot', 'Ws']
    for lp, lx, name in zip(g_p, g_x, names):
        jax.tree.map(lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-5, err_msg=name), lp, lx)


# ------------------------------------------------------------------ #
# model-level: kernel='pallas' vs kernel='xla' through the public API
def _models(B=4, N=6, seed=0, outputs=('energy', 'gradient_force'),
            grad_dot='float32'):
    # grad_dot='float32' pins the dual (gradient) kernels to fp32 MXU
    # passes so exactness asserts hold; the production default is bf16
    # (mixed-precision gradients, tested separately for closeness)
    cfg = dict(cutoff=5.0, n_features=32, n_basis=8, n_interactions=2,
               output_properties=list(outputs))
    xla = NewtonNet(**cfg)
    pal = NewtonNet(kernel='pallas', pallas_grad_dot_dtype=grad_dot, **cfg)
    rs = np.random.RandomState(seed)
    z = np.zeros((B, N), np.int32)
    for b in range(B):
        n = rs.randint(3, N + 1)
        z[b, :n] = rs.choice([1, 6, 7, 8], size=n)
    z = jnp.asarray(z)
    pos = jnp.asarray(rs.randn(B, N, 3) * 1.6, jnp.float32)
    cell = jnp.zeros((B, 3, 3), jnp.float32)
    params = xla.init(jax.random.PRNGKey(seed), z, pos, cell)
    params = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), params)
    return xla, pal, params, z, pos, cell


@pytest.mark.slow
def test_pallas_model_matches_xla_forward_and_forces():
    xla, pal, params, z, pos, cell = _models()
    o_x = xla.apply(params, z, pos, cell)
    o_p = pal.apply(params, z, pos, cell)
    np.testing.assert_allclose(np.asarray(o_p['energy']),
                               np.asarray(o_x['energy']), atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_p['gradient_force']),
                               np.asarray(o_x['gradient_force']),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(o_p['atom_node']),
                               np.asarray(o_x['atom_node']), atol=1e-4)


def test_pallas_model_stress_matches_xla():
    xla, pal, params, z, pos, _ = _models(
        seed=5, outputs=('energy', 'gradient_force', 'virial', 'stress'))
    cell = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) * 9.0,
                            (z.shape[0], 3, 3))
    pos = pos + 4.5  # inside the box
    o_x = xla.apply(params, z, pos, cell)
    o_p = pal.apply(params, z, pos, cell)
    for key in ('virial', 'stress'):
        np.testing.assert_allclose(np.asarray(o_p[key]),
                                   np.asarray(o_x[key]), atol=1e-4,
                                   err_msg=key)


def _loss_fns():
    return get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 20.0}})


def _batchify(z, pos, cell, seed=9):
    rs = np.random.RandomState(seed)
    B, N = z.shape
    return {
        'z': z, 'pos': pos, 'cell': cell,
        'graph_mask': jnp.ones(B, bool),
        'energy': jnp.asarray(rs.randn(B), jnp.float32),
        'force': jnp.asarray(rs.randn(B, N, 3), jnp.float32),
    }


def test_fastgrad_matches_standard_path_xla():
    '''Reverse-over-forward == reverse-over-reverse on the XLA kernel.'''
    xla, _, params, z, pos, cell = _models(seed=7)
    main_loss, _ = _loss_fns()
    batch = _batchify(z, pos, cell)

    def loss_fn(p):
        preds = xla.apply(p, z, pos, cell)
        return main_loss(preds, batch)

    l_std, g_std = jax.value_and_grad(loss_fn)(params)
    l_fg, g_fg, preds = fastgrad.value_and_grad(xla, main_loss, params,
                                                batch)
    np.testing.assert_allclose(float(l_fg), float(l_std), rtol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=5e-5), g_fg, g_std)
    assert set(preds) == {'energy', 'gradient_force'}


def test_fastgrad_pallas_matches_xla():
    '''The full fused-kernel training gradient == the XLA one.'''
    xla, pal, params, z, pos, cell = _models(seed=8)
    main_loss, _ = _loss_fns()
    batch = _batchify(z, pos, cell)
    l_x, g_x, _ = fastgrad.value_and_grad(xla, main_loss, params, batch)
    l_p, g_p, _ = fastgrad.value_and_grad(pal, main_loss, params, batch)
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=2e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=2e-4), g_p, g_x)


def test_fastgrad_pallas_bf16_grad_dots_close():
    '''The production default (bf16 MXU passes in the dual/gradient
    kernels, fp32 accumulation) leaves the loss bit-identical to the fp32
    dual path and the gradients close in relative norm -- standard
    mixed-precision gradient noise, far below optimizer stochasticity.'''
    xla, pal, params, z, pos, cell = _models(seed=8, grad_dot='bfloat16')
    main_loss, _ = _loss_fns()
    batch = _batchify(z, pos, cell)
    l_x, g_x, _ = fastgrad.value_and_grad(xla, main_loss, params, batch)
    l_p, g_p, _ = fastgrad.value_and_grad(pal, main_loss, params, batch)
    # loss comes from the fp32 force path -- unaffected by the dual dtype
    np.testing.assert_allclose(float(l_p), float(l_x), rtol=2e-5)
    gx = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g_x)])
    gp = jnp.concatenate([a.ravel() for a in jax.tree.leaves(g_p)])
    rel = float(jnp.linalg.norm(gp - gx) / (jnp.linalg.norm(gx) + 1e-30))
    assert rel < 2e-2, f'bf16 dual gradients too far from fp32: {rel}'
    cos = float(jnp.vdot(gp, gx)
                / (jnp.linalg.norm(gp) * jnp.linalg.norm(gx) + 1e-30))
    assert cos > 0.9999, f'gradient direction off: cos={cos}'


def test_pallas_config_validation():
    import pytest
    with pytest.raises(ValueError):
        NewtonNet(kernel='pallas', output_properties=['hessian'])
    # neighborlist IS supported (round 3) with plain full lists at any
    # k_max (the N-major kernels carry the full K per block); half/inverse
    # list formulations stay XLA-only
    NewtonNet(kernel='pallas', graph_mode='neighborlist', k_max=50,
              output_properties=['energy'])
    with pytest.raises(ValueError):
        NewtonNet(kernel='pallas', graph_mode='neighborlist', k_max=48,
                  newton3=True, output_properties=['energy'])
    with pytest.raises(ValueError):
        NewtonNet(kernel='bogus', output_properties=['energy'])
