#!/usr/bin/env python
'''Component ablation of the dense Pallas fastgrad train step (the bench.py
headline). Times each phase in-scan with the honest post-fetch protocol
(PERF_NOTES.md) to locate where the ~6 ms step actually goes.

Usage: python tools/ablate_dense_fastgrad.py [--steps 30] [--bb N]
'''
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..'))

import jax
import jax.numpy as jnp


def enable_cache():
    cache = os.path.expanduser('~/.cache/newtonnet_tpu/jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def scan_time(fn, args, n_steps, tag, pos_idx=None):
    '''jit a lax.scan of fn over n_steps iterations; returns ms/iter.

    The carry is folded back into the designated position-like argument
    (pos_idx, default: last array arg with float dtype) each iteration --
    without that data dependence XLA hoists the loop-invariant body out of
    the scan and the measurement is fiction.
    '''
    args = list(args)
    if pos_idx is None:
        pos_idx = next(i for i in reversed(range(len(args)))
                       if hasattr(args[i], 'dtype')
                       and jnp.issubdtype(args[i].dtype, jnp.floating))

    @jax.jit
    def run(args):
        def body(c, _):
            a = list(args)
            a[pos_idx] = a[pos_idx] + c  # c ~ 1e-38: numerically a no-op
            out = fn(*a)
            s = sum(jnp.sum(x) for x in jax.tree.leaves(out)
                    if jnp.issubdtype(x.dtype, jnp.floating))
            return s.astype(jnp.float32) * jnp.float32(1e-38), ()
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=n_steps)
        return c

    c = run(args)
    _ = float(c)  # poison dispatch (honest timing on the tunnel)
    t0 = time.perf_counter()
    c = run(args)
    _ = float(c)
    ms = (time.perf_counter() - t0) / n_steps * 1000
    print(f'{tag:42s} {ms:8.3f} ms')
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--bb', type=int, default=0)
    args = ap.parse_args()
    enable_cache()
    if args.bb:
        os.environ['NEWTONNET_PALLAS_BB'] = str(args.bb)

    from bench import load_batch
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.models import pallas_stack as ps
    from newtonnet_tpu.train import fastgrad, get_loss_by_string

    batch = {k: jnp.asarray(v) for k, v in load_batch().items()}
    z, pos, cell = batch['z'], batch['pos'], batch['cell']
    cfg = dict(cutoff=5.0, n_features=128, n_basis=20, n_interactions=3,
               output_properties=['energy', 'gradient_force'])
    model = NewtonNet(kernel='pallas', **cfg)
    params = model.init(jax.random.PRNGKey(0), z, pos, cell)
    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})
    v = jax.random.normal(jax.random.PRNGKey(1), pos.shape)
    n = args.steps
    print(f'B={z.shape[0]} N={z.shape[1]} steps={n} '
          f'bb={args.bb or "auto"} dev={jax.devices()[0].platform}')

    # geometry only
    def geom(pos):
        adj, feats = ps._geometry(model, z, pos, cell)
        dir_t, rbf = feats(pos)
        return adj, dir_t, rbf
    scan_time(geom, (pos,), n, 'geometry (adj + dir/rbf)')

    # precomputed geometry for the isolated-kernel rows
    adjc, featsc = ps._geometry(model, z, pos, cell)
    dirc, rbfc = featsc(pos)
    B, N = z.shape
    F = model.n_features
    from newtonnet_tpu.ops.pallas_dense import (
        make_fused_pair_interaction, make_fused_pair_interaction_dual)
    bb = ps.pick_bb(B)
    fused = make_fused_pair_interaction(bb=bb)
    fused_dual = make_fused_pair_interaction_dual(bb=bb)
    lp = params['params']['interaction_1']
    ws = (lp['message_edgepart']['kernel'],
          lp['equiv_message1']['TorchLinear_0']['kernel'],
          lp['equiv_message1']['TorchLinear_1']['kernel'],
          lp['equiv_message2']['TorchLinear_0']['kernel'],
          lp['equiv_message2']['TorchLinear_1']['kernel'])
    npk = jax.random.normal(jax.random.PRNGKey(2), (B, N, F)) * 0.1
    ft = jax.random.normal(jax.random.PRNGKey(3), (B, 3, N, F)) * 0.1

    def one_fwd(npk, rbf):
        return fused(npk, rbf, dirc, adjc, ft, *ws)
    scan_time(one_fwd, (npk, rbfc), n, 'ONE fused fwd kernel')

    def one_fwd_bwd(npk, rbf):
        def s(a):
            i1, eq = fused(a[0], a[1], dirc, adjc, a[2], *a[3:])
            return jnp.sum(i1) + jnp.sum(eq)
        return jax.grad(s)((npk, rbf, ft) + ws)
    scan_time(one_fwd_bwd, (npk, rbfc), n, 'ONE fwd+bwd kernel pair')

    def one_dual(npk, rbf):
        return fused_dual(npk, npk * 0.5, rbf, rbf * 0.5, dirc, dirc * 0.5,
                          adjc, ft, ft * 0.5, *ws)
    scan_time(one_dual, (npk, rbfc), n, 'ONE dual_fwd kernel')

    def one_dual_bwd(npk, rbf):
        def s(a):
            outs = fused_dual(a[0], a[1], rbf, rbf * 0.5, dirc, dirc * 0.5,
                              adjc, a[2], a[3], *a[4:])
            return sum(jnp.sum(o) for o in outs)
        return jax.grad(s)((npk, npk * 0.5, ft, ft * 0.5) + ws)
    scan_time(one_dual_bwd, (npk, rbfc), n, 'ONE dual fwd+bwd kernel pair')

    # kernels-only forward (geometry precomputed)
    def fwd_geom(params, rbf):
        out = ps.core_from_geom(params, model, z, adjc, dirc, rbf)
        return out['atomic_energy']
    scan_time(fwd_geom, (params, rbfc), n, 'core_from_geom (no geometry)')

    # primal forward (pallas fwd kernels x3 + node MLPs + energy head)
    def fwd(params, pos):
        out = ps.apply_core(params, model, z, pos, cell)
        return out['atomic_energy']
    scan_time(fwd, (params, pos), n, 'primal forward (3x fwd kernel)')

    # energy + forces (vjp through fwd+bwd kernels)
    def ef(params, pos):
        e, pull = jax.vjp(lambda x: jnp.sum(fwd(params, x)), pos)
        return e, pull(jnp.ones_like(e))[0]
    scan_time(ef, (params, pos), n, 'energy+forces vjp (fwd+bwd kernels)')

    # dual forward
    def dual(params, pos):
        return ps.dual_energy(params, model, z, pos, cell, v)
    scan_time(dual, (params, pos), n, 'dual forward (3x dual_fwd kernel)')

    # grad of the dual surrogate (dual_fwd + dual_bwd kernels)
    def gradsur(params, pos):
        def s(p):
            e, t = ps.dual_energy(p, model, z, pos, cell, v)
            return jnp.sum(e) + jnp.sum(t)
        return jax.grad(s)(params)
    scan_time(gradsur, (params, pos), n, 'grad of dual surrogate')

    # full fastgrad value_and_grad
    def full(params, pos):
        loss, grads, _ = fastgrad.value_and_grad(model, main_loss, params,
                                                 dict(batch, pos=pos))
        return loss, grads
    scan_time(full, (params, pos), n, 'FULL fastgrad value_and_grad')

    # full train step with Adam
    import optax
    from newtonnet_tpu.train import get_optimizer_by_string
    tx = get_optimizer_by_string('adam', clip_grad=1.0, lr=1e-3)
    opt_state = tx.init(params)

    def step(params, opt_state, pos):
        loss, grads, _ = fastgrad.value_and_grad(model, main_loss, params,
                                                 dict(batch, pos=pos))
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss
    scan_time(step, (params, opt_state, pos), n, 'FULL train step (+Adam)')


if __name__ == '__main__':
    main()
