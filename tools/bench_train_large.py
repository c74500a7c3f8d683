#!/usr/bin/env python
'''Large-system TRAINING throughput (BASELINE.json configuration class
"large periodic/condensed-phase system", single chip).

One jitted train step (energy+force loss, Adam) of an N-atom periodic box
through the neighborlist path, comparing graph strategies:

  * injit   -- plain lists rebuilt inside the step (the only option the
               reference's architecture allows: its graph is rebuilt every
               forward, newtonnet/layers/representations.py:70-98);
  * plain   -- precomputed plain lists fed via data/prelists.py;
  * newton3 -- precomputed Newton's-third-law half lists: each undirected
               edge computed once per layer;
  * newton3c -- staircase-compacted newton3 (ops/staircase.py): the color
               axis is chunked and each chunk only carries the atom prefix
               that needs it, ~25% fewer slot rows on every per-edge op
               (chunk size via NEWTONNET_STAIR_CHUNK, default 4).

Prints ms/step and M edges/s for each mode.

    python tools/bench_train_large.py [n_atoms] [modes...]
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _enable_compilation_cache():
    import jax
    cache = os.environ.get('JAX_COMPILATION_CACHE_DIR') or \
        os.path.expanduser('~/.cache/newtonnet_tpu/jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main(n_atoms=4096, *modes):
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from newtonnet_tpu.data.prelists import frame_neighbor_lists
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.ops.nlist import build_inverse_list, neighbor_list
    from newtonnet_tpu.train import fastgrad, get_loss_by_string

    modes = modes or ('injit', 'plain', 'newton3', 'newton3c')
    rho, cutoff = 0.1, 5.0
    L = (n_atoms / rho) ** (1 / 3)
    rs = np.random.RandomState(0)
    z = rs.choice([1, 1, 8], size=(1, n_atoms)).astype(np.int32)
    pos = (rs.rand(1, n_atoms, 3) * L).astype(np.float32)
    cell = np.diag([L, L, L]).astype(np.float32)[None]
    batch = {'z': jnp.asarray(z), 'pos': jnp.asarray(pos),
             'cell': jnp.asarray(cell),
             'energy': jnp.zeros((1,), jnp.float32),
             'force': jnp.asarray(rs.randn(1, n_atoms, 3), jnp.float32),
             'graph_mask': jnp.ones((1,), bool)}
    _ = float(jnp.sum(batch['pos']))  # honest-timing poison fetch

    _, kmask_full, _, _ = jax.jit(
        lambda p, c, m: neighbor_list(p, c, m, cutoff, 96))(
        batch['pos'], batch['cell'], batch['z'] > 0)
    edges = int(np.asarray(kmask_full).sum())
    print(f'N={n_atoms}, {edges} directed edges')

    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})

    def step_time(model, nlist, use_fastgrad=False, batch=batch):
        params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                            batch['cell'])
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        # default: standard reverse-over-reverse -- measured FASTER than
        # the fastgrad restructure on the XLA neighborlist path (60 vs
        # 68 ms at N=4096/k44, tools/ablate_train_large.py; fastgrad's
        # reverse-over-forward wins only where the fused Pallas kernels
        # carry it, kernel='pallas'). Pallas-kernel models require it.
        if use_fastgrad or getattr(model, 'kernel', 'xla') == 'pallas':
            @jax.jit
            def step(p, o):
                loss, grads, _ = fastgrad.value_and_grad(
                    model, main_loss, p, batch, nlist=nlist)
                updates, o = tx.update(grads, o, p)
                return optax.apply_updates(p, updates), o, loss
        else:
            @jax.jit
            def step(p, o):
                def loss_fn(pp):
                    preds = model.apply(pp, batch['z'], batch['pos'],
                                        batch['cell'], nlist=nlist)
                    return main_loss(preds, batch)
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, o = tx.update(grads, o, p)
                return optax.apply_updates(p, updates), o, loss

        params, opt, loss = step(params, opt)
        _ = float(loss)
        t0 = time.perf_counter()
        n_iter = 10
        for _i in range(n_iter):
            params, opt, loss = step(params, opt)
        _ = float(loss)
        return (time.perf_counter() - t0) / n_iter

    common = dict(graph_mode='neighborlist', cutoff=cutoff, n_features=128,
                  n_basis=20, n_interactions=3, compute_dtype='bfloat16',
                  output_properties=['energy', 'gradient_force'])
    for mode in modes:
        if mode == 'injit':
            model = NewtonNet(k_max=80, **common)
            nlist = None
        elif mode == 'plain':
            model = NewtonNet(k_max=80, **common)
            idx, m = frame_neighbor_lists(z[0], pos[0], cell[0], cutoff, 80)
            nlist = (jnp.asarray(idx[None]), jnp.asarray(m[None]))
        elif mode == 'pallas':
            # fused K-list kernels (ops/pallas_klist.py): the whole pair
            # chain VMEM-resident; k_max=88 = full-list capacity 84 rounded
            # to the kernels' K % 8 == 0 block constraint
            model = NewtonNet(k_max=88, kernel='pallas', **common)
            idx, m = frame_neighbor_lists(z[0], pos[0], cell[0], cutoff, 88)
            nlist = (jnp.asarray(idx[None]), jnp.asarray(m[None]))
        elif mode == 'newton3':
            # k2 starts at the N=4096 box's exact Konig bound (40); the
            # max-degree tail grows slowly with N at fixed density, so
            # retry upward until the coloring fits
            for k2 in (40, 44, 48, 56):
                try:
                    idx, m = frame_neighbor_lists(z[0], pos[0], cell[0],
                                                  cutoff, k2, mode='newton3')
                    break
                except ValueError:
                    continue
            else:
                raise SystemExit('newton3 slot bound > 56 at this density')
            model = NewtonNet(k_max=k2, newton3=True, **common)
            idxj, mj = jnp.asarray(idx[None]), jnp.asarray(m[None])
            inv, invm = build_inverse_list(jnp.swapaxes(idxj, 1, 2),
                                           jnp.swapaxes(mj, 1, 2))
            nlist = (idxj, mj, inv, invm)
        elif mode == 'newton3c':
            from newtonnet_tpu.ops.staircase import (staircase_half_list,
                                                     stair_nlist)
            chunk = int(os.environ.get('NEWTONNET_STAIR_CHUNK', '4'))
            idx_full, kmask_f, _, _ = jax.jit(
                lambda p, c, m: neighbor_list(p, c, m, cutoff, 96))(
                batch['pos'], batch['cell'], batch['z'] > 0)
            t0 = time.perf_counter()
            sl = staircase_half_list(np.asarray(idx_full[0]),
                                     np.asarray(kmask_f[0]), chunk=chunk)
            rows = sum(c * n for c, n in sl.widths)
            print(f'  staircase build {time.perf_counter() - t0:.1f}s: '
                  f'widths={sl.widths} rows={rows} '
                  f'({rows / (n_atoms * sum(c for c, _ in sl.widths)):.0%} '
                  'of the rectangular grid)')
            model = NewtonNet(k_max=40, newton3_compact=True, **common)
            nlist = tuple(tuple(jnp.asarray(a) for a in ch)
                          for ch in stair_nlist(sl))
            perm = sl.perm
            bench_batch = dict(batch)
            for key in ('z', 'pos', 'force'):
                bench_batch[key] = batch[key][:, perm]
        else:
            raise SystemExit(f'unknown mode {mode}')
        dt = step_time(model, nlist,
                       batch=bench_batch if mode == 'newton3c' else batch)
        print(f'{mode:8s}: {dt * 1e3:7.1f} ms/step  '
              f'{edges / dt / 1e6:6.2f} M edges/s')


if __name__ == '__main__':
    main(*(int(a) if a.isdigit() else a for a in sys.argv[1:]))
