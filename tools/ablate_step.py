#!/usr/bin/env python
'''Honest train-step timing for one model variant (run in a fresh process).

Usage: python tools/ablate_step.py '{"n_interactions": 3, ...}' [steps]
Prints: variant_json ms_per_step

Timing protocol for the axon-tunneled TPU: poison dispatch with one host
fetch first (before that, block_until_ready does not actually block), then
run K train steps inside a single lax.scan dispatch and fetch the result.
'''
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax


def main():
    variant = json.loads(sys.argv[1]) if len(sys.argv) > 1 else {}
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    matmul_precision = variant.pop('matmul_precision', None)
    einsum_impl = variant.pop('einsum_impl', None)
    if einsum_impl:
        os.environ['NEWTONNET_EINSUM_IMPL'] = einsum_impl

    from bench import load_batch
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import get_loss_by_string, get_optimizer_by_string

    if matmul_precision:
        jax.config.update('jax_default_matmul_precision', matmul_precision)

    batch = {k: jnp.asarray(v) for k, v in load_batch().items()}
    cfg = dict(cutoff=5.0, n_features=128, n_basis=20, n_interactions=3,
               output_properties=['energy', 'gradient_force'])
    cfg.update(variant)
    model = NewtonNet(**cfg)
    params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                        batch['cell'])
    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})
    tx = get_optimizer_by_string('adam', clip_grad=1.0, lr=1e-3)
    opt_state = tx.init(params)
    _ = float(jnp.sum(batch['pos']))  # poison -> honest timing

    def one_step(carry, _):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(
            lambda p: main_loss(model.apply(p, batch['z'], batch['pos'],
                                            batch['cell']), batch))(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @jax.jit
    def run_k(params, opt_state):
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), None, length=n_steps)
        return params, opt_state, losses[-1]

    p, o, loss = run_k(params, opt_state)
    _ = float(loss)
    t0 = time.perf_counter()
    p, o, loss = run_k(p, o)
    _ = float(loss)
    dt = (time.perf_counter() - t0) / n_steps
    print(f'{json.dumps(variant)} precision={matmul_precision} '
          f'einsum={einsum_impl}: {dt * 1e3:.2f} ms/step')


if __name__ == '__main__':
    main()
