#!/usr/bin/env python
'''Ablate the large-N newton3 TRAIN step (the round-3 target: close the
3x train/inference gap, VERDICT.md #3).

Components timed separately (all jitted, honest post-fetch protocol):
    fwd       -- energies forward only
    ef        -- energy + forces (vjp + pullback)        [the 21.6 ms step]
    jvp       -- dual-number forward (primal + tangent)
    gradsur   -- grad of the fastgrad surrogate only
    full      -- complete fastgrad train step (Adam incl.)
    revrev    -- standard reverse-over-reverse train step
    remat     -- full fastgrad step with NEWTONNET_REMAT=1 layers

    python tools/ablate_train_large.py [n_atoms] [components...]
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


def main(n_atoms=4096, *names):
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from newtonnet_tpu.data.prelists import frame_neighbor_lists
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.ops.nlist import build_inverse_list, neighbor_list
    from newtonnet_tpu.train import fastgrad, get_loss_by_string

    names = names or ('fwd', 'ef', 'jvp', 'gradsur', 'full', 'revrev')
    k_max = int(os.environ.get('ABLATE_KMAX', '44'))
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
    _ = float(jnp.sum(batch['pos']))  # poison fetch: honest timings

    _, kmask_full, _, _ = jax.jit(
        lambda p, c, m: neighbor_list(p, c, m, cutoff, 96))(
        batch['pos'], batch['cell'], batch['z'] > 0)
    edges = int(np.asarray(kmask_full).sum())
    print(f'N={n_atoms}, {edges} directed edges')

    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})

    common = dict(graph_mode='neighborlist', cutoff=cutoff, n_features=128,
                  n_basis=20, n_interactions=3, compute_dtype='bfloat16',
                  output_properties=['energy', 'gradient_force'])
    model = NewtonNet(k_max=k_max, newton3=True, **common)
    idx, m = frame_neighbor_lists(z[0], pos[0], cell[0], cutoff, k_max,
                                  mode='newton3')
    idxj, mj = jnp.asarray(idx[None]), jnp.asarray(m[None])
    inv, invm = build_inverse_list(jnp.swapaxes(idxj, 1, 2),
                                   jnp.swapaxes(mj, 1, 2))
    nlist = (idxj, mj, inv, invm)

    params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                        batch['cell'])
    zz, cc = batch['z'], batch['cell']
    disp = model._identity_displacement(cc)

    def energies(p, x):
        _, out = model._energy_and_aux(p, zz, x, disp, cc, nlist)
        return out['energy']

    v = jnp.asarray(rs.randn(1, n_atoms, 3), jnp.float32)
    e_bar = jnp.ones((1,), jnp.float32)

    def timed(fn, *a, n_iter=10):
        out = fn(*a)
        jax.block_until_ready(out)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        t0 = time.perf_counter()
        for _i in range(n_iter):
            out = fn(*a)
        _ = float(jnp.sum(jax.tree.leaves(out)[0]))
        return (time.perf_counter() - t0) / n_iter

    report = {}

    if 'fwd' in names:
        report['fwd'] = timed(jax.jit(lambda p: energies(p, batch['pos'])),
                              params)
    if 'ef' in names:
        def ef(p):
            e, pullback = jax.vjp(lambda x: energies(p, x), batch['pos'])
            return e, -pullback(jnp.ones_like(e))[0]
        report['ef'] = timed(jax.jit(ef), params)
    if 'jvp' in names:
        def dual(p):
            return jax.jvp(lambda x: energies(p, x), (batch['pos'],), (v,))
        report['jvp'] = timed(jax.jit(dual), params)
    if 'gradsur' in names:
        def surrogate(p):
            evec, tangent = jax.jvp(lambda x: energies(p, x),
                                    (batch['pos'],), (v,))
            return jnp.vdot(e_bar, evec) + jnp.sum(tangent)
        report['gradsur'] = timed(jax.jit(jax.grad(surrogate)), params)
    if 'full' in names or 'revrev' in names:
        tx = optax.adam(1e-3)

        def time_step(step):
            opt = tx.init(params)
            p2, opt, loss = step(params, opt)
            _ = float(loss)
            t0 = time.perf_counter()
            for _i in range(10):
                p2, opt, loss = step(p2, opt)
            _ = float(loss)
            return (time.perf_counter() - t0) / 10

        if 'full' in names:
            @jax.jit
            def step(p, o):
                loss, grads, _ = fastgrad.value_and_grad(
                    model, main_loss, p, batch, nlist=nlist)
                updates, o = tx.update(grads, o, p)
                return optax.apply_updates(p, updates), o, loss
            report['full'] = time_step(step)
        if 'revrev' in names:
            @jax.jit
            def step_rr(p, o):
                def loss_fn(pp):
                    preds = model.apply(pp, batch['z'], batch['pos'],
                                        batch['cell'], nlist=nlist)
                    return main_loss(preds, batch)
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, o = tx.update(grads, o, p)
                return optax.apply_updates(p, updates), o, loss
            report['revrev'] = time_step(step_rr)

    for k, dt in report.items():
        print(f'{k:8s}: {dt * 1e3:7.1f} ms   {edges / dt / 1e6:6.2f} M edges/s')


if __name__ == '__main__':
    main(*(int(a) if a.isdigit() else a for a in sys.argv[1:]))
