'''Fused Pallas pair-interaction kernels (ops/pallas_dense.py): interpret-
mode correctness against the XLA reference chain, forward and backward
(input gradients). Compiled-mode parity and timing on real TPU hardware:
tools/test_pallas_kernel.py.'''
import jax
import jax.numpy as jnp
import numpy as np

from newtonnet_tpu.ops.pallas_dense import make_fused_pair_interaction


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


def _inputs(B=4, N=8, F=32, R=8, seed=0):
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


def test_fused_forward_matches_xla():
    args, Ws = _inputs()
    fused = make_fused_pair_interaction(bb=2, interpret=True)
    o_p = fused(*args, *Ws)
    o_x = _xla_ref(*args, *Ws)
    np.testing.assert_allclose(o_p[0], o_x[0], atol=1e-5)
    np.testing.assert_allclose(o_p[1], o_x[1], atol=1e-5)


def test_fused_backward_input_grads_match_xla():
    args, Ws = _inputs(seed=1)
    fused = make_fused_pair_interaction(bb=2, interpret=True)

    def loss(op):
        def f(a):
            inv1, eq = op(*a, *Ws)
            return jnp.sum(jnp.sin(eq)) + jnp.sum(inv1 ** 2)
        return f

    g_p = jax.grad(loss(fused))(args)
    g_x = jax.grad(loss(_xla_ref))(args)
    names = ['np', 'rbf', 'dir', 'adj', 'force']
    for lp, lx, name in zip(g_p, g_x, names):
        if name == 'adj':
            continue  # mask: non-differentiable by convention
        np.testing.assert_allclose(np.asarray(lp), np.asarray(lx),
                                   atol=2e-5, err_msg=name)
