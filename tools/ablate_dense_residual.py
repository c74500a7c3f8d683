#!/usr/bin/env python
'''Quantify the dense-headline residual (VERDICT round-3 weak #1 / directive
#8): the round-3 roofline left 5.16 ms measured vs 3.8 ms of HBM traffic +
0.26 ms of FLOPs, attributing the ~1.1 ms gap to "scan/dispatch overhead
plus (N, F) node ops" without numbers. This tool measures each piece:

  1. chunk sweep       -- per-dispatch overhead, extracted from step time
                          at CHUNK = 1 / 8 / 32 steps per dispatch;
  2. kernels-only      -- the three fused Pallas pair passes (fwd, vjp,
                          dual) executed alone at the bench shapes: the
                          pair-chain share of the step;
  3. program census    -- executed-instruction count of the compiled step
                          (instructions / fusions / custom-calls).

Usage: python tools/ablate_dense_residual.py
'''
import functools
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    bench._enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import (fastgrad, get_loss_by_string,
                                     get_optimizer_by_string)

    batch = {k: jnp.asarray(v) for k, v in bench.load_batch().items()}
    _ = float(jnp.sum(batch['pos']))  # poison fetch (honest timing)
    n_edges = bench.count_edges(batch)
    B, N = batch['z'].shape
    print(f'B={B} N={N} edges/batch={n_edges}')

    cfg = dict(cutoff=5.0, n_features=128, n_basis=20, n_interactions=3,
               output_properties=['energy', 'gradient_force'])
    pmodel = NewtonNet(kernel='pallas', **cfg)
    params = pmodel.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                         batch['cell'])
    tx = get_optimizer_by_string('adam', clip_grad=1.0, lr=1e-3)
    opt_state = tx.init(params)
    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})

    def body(carry, b):
        params, opt_state = carry
        loss, grads, _ = fastgrad.value_and_grad(pmodel, main_loss,
                                                 params, b)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    # ---- 1. chunk sweep: per-dispatch overhead ----
    results = {}
    for chunk in (1, 8, 32):
        stacked = jax.tree.map(lambda x: jnp.broadcast_to(x[None],
                                                          (chunk,) + x.shape),
                               batch)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(params, opt_state, stacked):
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), stacked)
            return params, opt_state, losses[-1]

        p = jax.tree.map(jnp.copy, params)
        o = jax.tree.map(jnp.copy, opt_state)
        p, o, loss = run(p, o, stacked)
        _ = float(loss)
        n_disp = max(1, 32 // chunk)
        t0 = time.perf_counter()
        for _ in range(n_disp):
            p, o, loss = run(p, o, stacked)
        _ = float(loss)
        dt = (time.perf_counter() - t0) / (n_disp * chunk)
        results[chunk] = dt
        print(f'CHUNK={chunk:3d}: {dt * 1e3:6.3f} ms/step '
              f'({n_edges / dt / 1e6:5.2f} M edges/s)')
    if results.get(1) and results.get(32):
        per_dispatch = (results[1] - results[32]) / (1 - 1 / 32)
        print(f'-> per-dispatch overhead ~{per_dispatch * 1e3:5.3f} ms '
              f'(={(results[1] - results[32]) * 1e3:.3f} ms of the CHUNK=1 '
              f'step)')

    # ---- 2. the fused pair passes alone ----
    from newtonnet_tpu.models import pallas_stack as ps
    if hasattr(ps, 'apply_core'):
        def pair_only(params, z, pos, cell):
            out = ps.apply_core(params, pmodel, z, pos, cell)
            return jnp.sum(out['atomic_energy'])
        f = jax.jit(pair_only)
        v = f(params, batch['z'], batch['pos'], batch['cell'])
        jax.block_until_ready(v)
        t0 = time.perf_counter()
        for _ in range(30):
            v = f(params, batch['z'], batch['pos'], batch['cell'])
        jax.block_until_ready(v)
        print(f'pallas core fwd alone: '
              f'{(time.perf_counter() - t0) / 30 * 1e3:6.3f} ms')

    # ---- 3. program census + per-fusion overhead ----
    @jax.jit
    def one_step(params, opt_state, b):
        (params, opt_state), loss = body((params, opt_state), b)
        return params, opt_state, loss

    compiled = one_step.lower(params, opt_state, batch).compile()
    hlo = compiled.as_text()
    # executed instructions: entry + all computations reachable once each
    # (no while loops in this step); count non-trivial instruction lines
    n_instr = len(re.findall(r'^\s+\S+ = ', hlo, re.M))
    n_fusion = len(re.findall(r'= \S+ fusion\(', hlo))
    n_custom = len(re.findall(r'custom-call', hlo))
    print(f'compiled step: {n_instr} instructions, {n_fusion} fusions, '
          f'{n_custom} custom-calls (Pallas kernels + infra)')


if __name__ == '__main__':
    main()
