#!/usr/bin/env python
'''Measure candidate optimizations for the dense train-step hot path.

Levers: compute_dtype (fp32 vs bf16), batch size, remat off/on.
Prints honest per-step times (post-fetch protocol, see PERF_NOTES.md).
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


def load_batch(batch_size):
    from newtonnet_tpu.data import MolecularInMemoryDataset, collate
    here = os.path.dirname(os.path.abspath(__file__))
    root = os.path.join(here, '..', 'data', 'md17_aspirin', 'ccsd_train')
    ds = MolecularInMemoryDataset(root=root)
    samples = [ds[i % len(ds)] for i in range(batch_size)]
    n_pad = max(8, -(-ds.max_atoms // 8) * 8)
    return collate(samples, n_pad=n_pad, batch_pad=batch_size)


def count_edges(batch, cutoff=5.0):
    from newtonnet_tpu.ops.neighbors import dense_graph

    @jax.jit
    def count(pos, cell, z):
        _, adj = dense_graph(pos, cell, z > 0, cutoff)
        return jnp.sum(adj)
    return int(count(batch['pos'], batch['cell'], batch['z']))


def time_train_step(batch, compute_dtype='', n_steps=30):
    import optax
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import get_loss_by_string, get_optimizer_by_string

    model = NewtonNet(cutoff=5.0, n_features=128, n_basis=20,
                      n_interactions=3, compute_dtype=compute_dtype,
                      output_properties=['energy', 'gradient_force'])
    params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                        batch['cell'])
    tx = get_optimizer_by_string('adam', clip_grad=1.0, lr=1e-3)
    opt_state = tx.init(params)
    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})

    @jax.jit
    def train_step(params, opt_state, batch):
        def loss_fn(p):
            preds = model.apply(p, batch['z'], batch['pos'], batch['cell'])
            return main_loss(preds, batch)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    params, opt_state, loss = train_step(params, opt_state, batch)
    _ = float(loss)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        params, opt_state, loss = train_step(params, opt_state, batch)
    _ = float(loss)
    return (time.perf_counter() - t0) / n_steps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--batches', type=int, nargs='*', default=[100])
    ap.add_argument('--dtypes', nargs='*', default=['', 'bfloat16'])
    args = ap.parse_args()
    enable_cache()
    for bs in args.batches:
        batch = {k: jnp.asarray(v) for k, v in load_batch(bs).items()}
        n_edges = count_edges(batch)
        for cd in args.dtypes:
            dt = time_train_step(batch, compute_dtype=cd)
            print(f'B={bs:4d} dtype={cd or "fp32":8s} '
                  f'{dt*1e3:7.2f} ms/step  {n_edges/dt/1e6:6.2f} M edges/s',
                  flush=True)


if __name__ == '__main__':
    main()
