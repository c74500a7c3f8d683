#!/usr/bin/env python
'''Round-3 experiments toward the >=5 M edges/s newton3 train step:
reverse-over-reverse at the Konig-bound k_max, production scan-chunked
dispatch, and frame batching.

    python tools/exp_train_large3.py [n_atoms] [variants...]
variants: single, scan8, b2, b2scan4, chunk10, chunk8
'''
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _cache():
    import jax
    cache = os.path.expanduser('~/.cache/newtonnet_tpu/jax')
    os.makedirs(cache, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def main(n_atoms=4096, *names):
    _cache()
    import jax
    import jax.numpy as jnp
    import optax

    from newtonnet_tpu.data.prelists import frame_neighbor_lists
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.ops.nlist import build_inverse_list, neighbor_list
    from newtonnet_tpu.train import get_loss_by_string

    names = names or ('single', 'scan8', 'b2', 'b2scan4')
    k_max = int(os.environ.get('ABLATE_KMAX', '40'))
    rho, cutoff = 0.1, 5.0
    L = (n_atoms / rho) ** (1 / 3)
    rs = np.random.RandomState(0)

    def make_batch(B):
        z = rs.choice([1, 1, 8], size=(B, n_atoms)).astype(np.int32)
        pos = (rs.rand(B, n_atoms, 3) * L).astype(np.float32)
        cell = np.broadcast_to(np.diag([L, L, L]).astype(np.float32),
                               (B, 3, 3)).copy()
        batch = {'z': jnp.asarray(z), 'pos': jnp.asarray(pos),
                 'cell': jnp.asarray(cell),
                 'energy': jnp.zeros((B,), jnp.float32),
                 'force': jnp.asarray(rs.randn(B, n_atoms, 3), jnp.float32),
                 'graph_mask': jnp.ones((B,), bool)}
        idxs, ms = [], []
        for b in range(B):
            idx, m = frame_neighbor_lists(z[b], pos[b], cell[b], cutoff,
                                          k_max, mode='newton3')
            idxs.append(idx)
            ms.append(m)
        idxj = jnp.asarray(np.stack(idxs))
        mj = jnp.asarray(np.stack(ms))
        inv, invm = build_inverse_list(jnp.swapaxes(idxj, 1, 2),
                                       jnp.swapaxes(mj, 1, 2))
        return batch, (idxj, mj, inv, invm)

    batch1, nlist1 = make_batch(1)
    _ = float(jnp.sum(batch1['pos']))  # poison fetch

    _, kmask_full, _, _ = jax.jit(
        lambda p, c, m: neighbor_list(p, c, m, cutoff, 96))(
        batch1['pos'], batch1['cell'], batch1['z'] > 0)
    edges1 = int(np.asarray(kmask_full).sum())
    print(f'N={n_atoms}, k_max={k_max}, {edges1} directed edges/frame')

    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})
    common = dict(graph_mode='neighborlist', cutoff=cutoff, n_features=128,
                  n_basis=20, n_interactions=3, compute_dtype='bfloat16',
                  output_properties=['energy', 'gradient_force'])
    model = NewtonNet(k_max=k_max, newton3=True, **common)
    tx = optax.adam(1e-3)

    def revrev_step(batch, nlist):
        def step(p, o):
            def loss_fn(pp):
                preds = model.apply(pp, batch['z'], batch['pos'],
                                    batch['cell'], nlist=nlist)
                return main_loss(preds, batch)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss
        return step

    def time_one(step_fn, B, n_iter=10, steps_inside=1):
        params = model.init(jax.random.PRNGKey(0), batch1['z'],
                            batch1['pos'], batch1['cell'])
        opt = tx.init(params)
        params, opt, loss = step_fn(params, opt)
        _ = float(jnp.sum(loss))
        t0 = time.perf_counter()
        for _i in range(n_iter):
            params, opt, loss = step_fn(params, opt)
        _ = float(jnp.sum(loss))
        dt = (time.perf_counter() - t0) / (n_iter * steps_inside)
        return dt, edges1 * B / dt

    for name in names:
        if name == 'single':
            step = jax.jit(revrev_step(batch1, nlist1),
                           donate_argnums=(0, 1))
            dt, eps = time_one(step, 1)
        elif name in ('chunk10', 'chunk8'):
            os.environ['NEWTONNET_SCATTER_CHUNK'] = name[5:]
            step = jax.jit(revrev_step(batch1, nlist1),
                           donate_argnums=(0, 1))
            dt, eps = time_one(step, 1)
            os.environ['NEWTONNET_SCATTER_CHUNK'] = '6'
        elif name == 'scan8':
            body = revrev_step(batch1, nlist1)

            @jax.jit
            def step8(p, o):
                def sb(carry, _):
                    p, o = carry
                    p, o, loss = body(p, o)
                    return (p, o), loss
                (p, o), losses = jax.lax.scan(sb, (p, o), None, length=8)
                return p, o, losses[-1]
            dt, eps = time_one(step8, 1, n_iter=3, steps_inside=8)
        elif name == 'b2':
            batch2, nlist2 = make_batch(2)
            step = jax.jit(revrev_step(batch2, nlist2),
                           donate_argnums=(0, 1))
            dt, eps = time_one(step, 2)
        elif name == 'b2scan4':
            batch2, nlist2 = make_batch(2)
            body = revrev_step(batch2, nlist2)

            @jax.jit
            def step4(p, o):
                def sb(carry, _):
                    p, o = carry
                    p, o, loss = body(p, o)
                    return (p, o), loss
                (p, o), losses = jax.lax.scan(sb, (p, o), None, length=4)
                return p, o, losses[-1]
            dt, eps = time_one(step4, 2, n_iter=3, steps_inside=4)
        else:
            raise SystemExit(f'unknown variant {name}')
        print(f'{name:8s}: {dt * 1e3:7.1f} ms/step  {eps / 1e6:6.2f} M edges/s')


if __name__ == '__main__':
    main(*(int(a) if a.isdigit() else a for a in sys.argv[1:]))
