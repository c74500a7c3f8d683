#!/usr/bin/env python
'''Ablate the fused-Pallas K-list train step (large-N path).

Times each stage of the kernel='pallas' neighborlist pipeline separately
(honest post-fetch protocol) to locate where the step time sits relative
to the HBM roofline:

    gather   -- one (B, N, K, 4F) bf16 neighbor gather (the per-layer HBM
                floor of the kernel design)
    scatter  -- VJP of that gather (segment-sum back to nodes)
    fwd      -- apply_core_nlist energies forward
    ef       -- energy + force (custom-VJP backward kernels)
    dual     -- dual_energy_nlist (primal + position tangent)
    gradsur  -- grad of the fastgrad surrogate (dual fwd + dual bwd kernel)
    full     -- complete fastgrad train step incl. Adam

    python tools/ablate_klist.py [n_atoms] [components...]
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
    from newtonnet_tpu.ops.nlist import gather_nodes, neighbor_list
    from newtonnet_tpu.train import fastgrad, get_loss_by_string

    names = names or ('gather', 'scatter', 'fwd', 'ef', 'dual', 'gradsur',
                      'full')
    k_max = int(os.environ.get('ABLATE_KMAX', '84'))
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
    print(f'N={n_atoms}, k_max={k_max}, {edges} directed edges')

    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})

    model = NewtonNet(k_max=k_max, kernel='pallas',
                      graph_mode='neighborlist', cutoff=cutoff,
                      n_features=128, n_basis=20, n_interactions=3,
                      compute_dtype='bfloat16',
                      output_properties=['energy', 'gradient_force'])
    idx, m = frame_neighbor_lists(z[0], pos[0], cell[0], cutoff, k_max)
    nlist = (jnp.asarray(idx[None]), jnp.asarray(m[None]))

    params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                        batch['cell'])
    zz, cc, pp = batch['z'], batch['cell'], batch['pos']
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
    gb = {}

    if 'gather' in names or 'scatter' in names:
        feats = jnp.asarray(
            rs.randn(1, n_atoms, 4 * 128), jnp.bfloat16)
        idx_d = nlist[0]

        def g(x):
            return gather_nodes(x, idx_d)
        if 'gather' in names:
            report['gather'] = timed(jax.jit(g), feats)
            gb['gather'] = feats.size * 2 * (1 + k_max) / 1e9
        if 'scatter' in names:
            ct = jnp.asarray(
                rs.randn(1, n_atoms, k_max, 4 * 128), jnp.bfloat16)

            def gT(c):
                return jax.vjp(g, feats)[1](c)[0]
            report['scatter'] = timed(jax.jit(gT), ct)
            gb['scatter'] = ct.size * 2 / 1e9

    from newtonnet_tpu.models.pallas_klist import (
        apply_core_nlist, dual_energy_nlist)

    def energy_vec(p, x):
        out = apply_core_nlist(p, model, zz, x, cc, nlist=nlist)
        mask = (zz > 0)
        return jnp.sum(out['atomic_energy'][..., 0] * mask, axis=-1)

    if 'fwd' in names:
        report['fwd'] = timed(jax.jit(energy_vec), params, pp)
    if 'ef' in names:
        def ef(p):
            e, pullback = jax.vjp(lambda x: energy_vec(p, x), pp)
            return e, -pullback(jnp.ones_like(e))[0]
        report['ef'] = timed(jax.jit(ef), params)
    if 'dual' in names:
        report['dual'] = timed(
            jax.jit(lambda p: dual_energy_nlist(p, model, zz, pp, cc, v,
                                                nlist=nlist)), params)
    if 'gradsur' in names:
        def surrogate(p):
            evec, tangent = dual_energy_nlist(p, model, zz, pp, cc, v,
                                              nlist=nlist)
            return jnp.vdot(e_bar, evec) + jnp.sum(tangent)
        report['gradsur'] = timed(jax.jit(jax.grad(surrogate)), params)
    if 'full' in names:
        tx = optax.adam(1e-3)

        @jax.jit
        def step(p, o):
            loss, grads, _ = fastgrad.value_and_grad(
                model, main_loss, p, batch, nlist=nlist)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss
        opt = tx.init(params)
        p2, opt, loss = step(params, opt)
        _ = float(loss)
        t0 = time.perf_counter()
        for _i in range(10):
            p2, opt, loss = step(p2, opt)
        _ = float(loss)
        report['full'] = (time.perf_counter() - t0) / 10

    for k, dt in report.items():
        extra = f'  {gb[k] / dt:6.0f} GB/s' if k in gb else ''
        print(f'{k:8s}: {dt * 1e3:7.2f} ms   '
              f'{edges / dt / 1e6:6.2f} M edges/s{extra}')


if __name__ == '__main__':
    main(*(int(a) if a.isdigit() else a for a in sys.argv[1:]))
