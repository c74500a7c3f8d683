#!/usr/bin/env python
'''Break the dense train step into structural variants to locate cost.

Variants (all jitted, honest post-fetch timing):
  fwd        -- energy-only forward
  forces     -- energy + gradient-force (one reverse pass)
  train_e    -- train step, energy-only loss (reverse-over-forward)
  train_std  -- full train step, standard reverse-over-reverse
  train_fast -- full train step, fastgrad reverse-over-forward restructure
Optionally captures a jax.profiler trace of train_std with --trace DIR.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batch', type=int, default=100)
    ap.add_argument('--dtype', default='')
    ap.add_argument('--steps', type=int, default=30)
    ap.add_argument('--trace', default='')
    ap.add_argument('--pallas-dtype', default='float32')
    ap.add_argument('--variants', nargs='*',
                    default=['fwd', 'forces', 'train_e', 'train_std',
                             'train_fast', 'train_pallas',
                             'forces_pallas'])
    args = ap.parse_args()
    enable_cache()

    import optax
    from tools.bench_dense_levers import load_batch, count_edges
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import get_loss_by_string, get_optimizer_by_string
    from newtonnet_tpu.train import fastgrad

    batch = {k: jnp.asarray(v) for k, v in load_batch(args.batch).items()}
    n_edges = count_edges(batch)

    def make(outputs):
        model = NewtonNet(cutoff=5.0, n_features=128, n_basis=20,
                          n_interactions=3, compute_dtype=args.dtype,
                          output_properties=outputs)
        params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                            batch['cell'])
        return model, params

    tx = get_optimizer_by_string('adam', clip_grad=1.0, lr=1e-3)
    loss_ef, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})
    loss_e, _ = get_loss_by_string({'energy': {'weight': 1.0}})

    fns = {}

    if 'fwd' in args.variants:
        model, params = make(['energy'])

        @jax.jit
        def fwd(params, batch):
            return model.apply(params, batch['z'], batch['pos'],
                               batch['cell'])['energy']
        fns['fwd'] = (fwd, (params, batch))

    if 'forces' in args.variants:
        model, params = make(['energy', 'gradient_force'])

        @jax.jit
        def forces(params, batch):
            out = model.apply(params, batch['z'], batch['pos'], batch['cell'])
            return out['energy'], out['gradient_force']
        fns['forces'] = (forces, (params, batch))

    if 'train_e' in args.variants:
        model, params = make(['energy'])
        opt_state = tx.init(params)

        @jax.jit
        def train_e(params, opt_state, batch):
            def loss_fn(p):
                preds = model.apply(p, batch['z'], batch['pos'],
                                    batch['cell'])
                return loss_e(preds, batch)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        fns['train_e'] = (train_e, (params, opt_state, batch))

    if 'train_std' in args.variants:
        model, params = make(['energy', 'gradient_force'])
        opt_state = tx.init(params)

        @jax.jit
        def train_std(params, opt_state, batch):
            def loss_fn(p):
                preds = model.apply(p, batch['z'], batch['pos'],
                                    batch['cell'])
                return loss_ef(preds, batch)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        fns['train_std'] = (train_std, (params, opt_state, batch))

    if 'train_fast' in args.variants:
        model, params = make(['energy', 'gradient_force'])
        opt_state = tx.init(params)

        @jax.jit
        def train_fast(params, opt_state, batch):
            loss, grads, _ = fastgrad.value_and_grad(model, loss_ef, params,
                                                     batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        fns['train_fast'] = (train_fast, (params, opt_state, batch))

    if 'train_pallas' in args.variants:
        model, params = make(['energy', 'gradient_force'])
        pmodel = NewtonNet(cutoff=5.0, n_features=128, n_basis=20,
                           n_interactions=3, kernel='pallas',
                           pallas_dot_dtype=args.pallas_dtype,
                           output_properties=['energy', 'gradient_force'])
        opt_state = tx.init(params)

        @jax.jit
        def train_pallas(params, opt_state, batch):
            loss, grads, _ = fastgrad.value_and_grad(pmodel, loss_ef,
                                                     params, batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        fns['train_pallas'] = (train_pallas, (params, opt_state, batch))

    if 'forces_pallas' in args.variants:
        model, params = make(['energy', 'gradient_force'])
        pmodel = NewtonNet(cutoff=5.0, n_features=128, n_basis=20,
                           n_interactions=3, kernel='pallas',
                           pallas_dot_dtype=args.pallas_dtype,
                           output_properties=['energy', 'gradient_force'])

        @jax.jit
        def forces_pallas(params, batch):
            out = pmodel.apply(params, batch['z'], batch['pos'],
                               batch['cell'])
            return out['energy'], out['gradient_force']
        fns['forces_pallas'] = (forces_pallas, (params, batch))

    for name, (fn, fargs) in fns.items():
        out = fn(*fargs)
        jax.block_until_ready(out)
        _ = float(jax.tree_util.tree_leaves(out)[-1].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*fargs)
        _ = float(jax.tree_util.tree_leaves(out)[-1].ravel()[0])
        dt = (time.perf_counter() - t0) / args.steps
        print(f'{name:10s} {dt*1e3:8.2f} ms  {n_edges/dt/1e6:6.2f} M edges/s',
              flush=True)
        if args.trace and name == 'train_std':
            with jax.profiler.trace(args.trace):
                for _ in range(3):
                    out = fn(*fargs)
                jax.block_until_ready(out)
            print(f'trace written to {args.trace}', flush=True)


if __name__ == '__main__':
    main()
