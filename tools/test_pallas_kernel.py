#!/usr/bin/env python
'''Correctness + speed harness for the fused Pallas pair-interaction kernel.

Run on CPU (interpret mode) or TPU (compiled): python tools/test_pallas_kernel.py [cpu]
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if len(sys.argv) > 1 and sys.argv[1] == 'cpu':
    jax.config.update('jax_platforms', 'cpu')
    INTERPRET = True
else:
    INTERPRET = False

import jax.numpy as jnp  # noqa: E402

from newtonnet_tpu.ops.pallas_dense import make_fused_pair_interaction  # noqa: E402


def xla_ref(np_, rbf, dir_, adj, force, We, W1a, W1b, W2a, W2b):
    F = np_.shape[-1]
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


def main(B=100, N=24, F=128, R=20, bb=4):
    rs = np.random.RandomState(0)
    np_ = jnp.asarray(rs.randn(B, N, F), jnp.float32) * 0.3
    rbf = jnp.asarray(rs.randn(B, N, N, R), jnp.float32) * 0.3
    dir_ = jnp.asarray(rs.randn(B, 3, N, N), jnp.float32)
    adj = jnp.asarray((rs.rand(B, N, N) < 0.5) & ~np.eye(N, dtype=bool),
                      jnp.float32)
    force = jnp.asarray(rs.randn(B, 3, N, F), jnp.float32) * 0.2
    Ws = [jnp.asarray(rs.randn(*s), jnp.float32) * (1.0 / np.sqrt(s[0]))
          for s in [(R, F), (F, F), (F, F), (F, F), (F, F)]]

    fused = make_fused_pair_interaction(bb=bb, interpret=INTERPRET)
    f_p = jax.jit(lambda *a: fused(*a))
    f_x = jax.jit(xla_ref)

    o_p = f_p(np_, rbf, dir_, adj, force, *Ws)
    _ = float(jnp.sum(o_p[0]))  # honest timing from here on
    o_x = f_x(np_, rbf, dir_, adj, force, *Ws)
    print('fwd inv1 err:', float(jnp.max(jnp.abs(o_p[0] - o_x[0]))))
    print('fwd eq err:', float(jnp.max(jnp.abs(o_p[1] - o_x[1]))))

    gp = jax.jit(jax.grad(lambda a: jnp.sum(jnp.sin(fused(*a, *Ws)[1]))
                          + jnp.sum(fused(*a, *Ws)[0] ** 2)))
    gx = jax.jit(jax.grad(lambda a: jnp.sum(jnp.sin(xla_ref(*a, *Ws)[1]))
                          + jnp.sum(xla_ref(*a, *Ws)[0] ** 2)))
    args = (np_, rbf, dir_, adj, force)
    r_p, r_x = gp(args), gx(args)
    for leaf_p, leaf_x, name in zip(jax.tree.leaves(r_p),
                                    jax.tree.leaves(r_x),
                                    ['np', 'rbf', 'dir', 'adj', 'force']):
        if name == 'adj':
            continue
        err = float(jnp.max(jnp.abs(leaf_p - leaf_x)))
        print(f'bwd d{name} err: {err:.2e}')

    def timeit(fn, *a, n=20):
        o = fn(*a)
        _ = float(jnp.sum(jax.tree.leaves(o)[0]))
        t0 = time.perf_counter()
        for _i in range(n):
            o = fn(*a)
        _ = float(jnp.sum(jax.tree.leaves(o)[0]))
        return (time.perf_counter() - t0) / n * 1e3

    if not INTERPRET:
        print(f'pallas fwd:     {timeit(f_p, np_, rbf, dir_, adj, force, *Ws):.2f} ms')
        print(f'xla    fwd:     {timeit(f_x, np_, rbf, dir_, adj, force, *Ws):.2f} ms')
        print(f'pallas fwd+bwd: {timeit(gp, args):.2f} ms')
        print(f'xla    fwd+bwd: {timeit(gx, args):.2f} ms')


if __name__ == '__main__':
    main()
