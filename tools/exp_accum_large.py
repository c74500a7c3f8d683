#!/usr/bin/env python
'''VERDICT r4 directive #4: the overlap lever the large-N floor analysis
implies -- multi-frame gradient accumulation in ONE jit.

tools/floor_train_large.py proved the large-N newton3 train step is
dependency-serialized: its 24 row ops run in 30.9 ms dependency-FREE but
54.2 ms chained (round-4 PERF_NOTES). Two frames' fwd/rev1/rev2 chains
are mutually independent, so one jit computing both and summing grads
lets XLA interleave frame A's rev2 row ops with frame B's fwd. Edges/s
counts ALL accumulated frames' edges per wall-clock step (grads sum, so
accumulation is an optimizer-equivalent batching of the same work).

Two composition forms per accumulation factor A:

  * batch  -- one model.apply over a (A, N) batch: each row op carries
              A x rows (amortizes per-op overhead, same chain length);
  * accum  -- A separate B=1 applies inside one loss, grads summed by AD:
              A independent chains XLA may interleave (chain overlap).

Usage:  python tools/exp_accum_large.py [n_atoms] [factors...]
        (default 4096, factors 1 2 4)
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


def make_frames(n_atoms, n_frames, cutoff=5.0, rho=0.1, k_max=40,
                jitter=0.0):
    '''n_frames independent periodic boxes + newton3 half lists.'''
    import jax.numpy as jnp

    from newtonnet_tpu.data.prelists import frame_neighbor_lists
    from newtonnet_tpu.ops.nlist import build_inverse_list

    L = (n_atoms / rho) ** (1 / 3)
    rs = np.random.RandomState(0)
    frames = []
    z0 = pos0 = None
    for f_i in range(n_frames):
        if f_i == 0 or not jitter:
            z = rs.choice([1, 1, 8], size=n_atoms).astype(np.int32)
            pos = (rs.rand(n_atoms, 3) * L).astype(np.float32)
            z0, pos0 = z, pos
        else:
            # same configuration class as frame 0 (jittered positions,
            # lists honestly rebuilt): keeps the official k_max=40 Konig
            # bound of the seed-0 box so the A=1 baseline IS the
            # PERF_NOTES headline config; values differ so XLA cannot
            # CSE the accumulated chains
            z = z0
            pos = (pos0 + rs.randn(n_atoms, 3).astype(np.float32)
                   * jitter) % L
        cell = np.diag([L, L, L]).astype(np.float32)
        # per-frame Konig bounds differ; every frame must share one K so
        # the accumulated step is shape-homogeneous -- first fit wins
        for k_try in range(k_max, k_max + 17, 4):
            try:
                idx, m = frame_neighbor_lists(z, pos, cell, cutoff, k_try,
                                              mode='newton3')
                break
            except ValueError:
                continue
        else:
            raise ValueError('no K within k_max+16 fits this frame')
        frames.append(dict(z=z, pos=pos, cell=cell, idx=idx, m=m))
    k_use = max(f['idx'].shape[-1] for f in frames)
    for f in frames:
        k = f['idx'].shape[-1]
        if k < k_use:
            f['idx'] = np.pad(f['idx'], ((0, 0), (0, k_use - k)))
            f['m'] = np.pad(f['m'], ((0, 0), (0, k_use - k)))
    print(f'half-list slot capacity K = {k_use}')
    batch = {
        'z': jnp.asarray(np.stack([f['z'] for f in frames])),
        'pos': jnp.asarray(np.stack([f['pos'] for f in frames])),
        'cell': jnp.asarray(np.stack([f['cell'] for f in frames])),
        'energy': jnp.zeros((n_frames,), jnp.float32),
        'force': jnp.asarray(rs.randn(n_frames, n_atoms, 3), jnp.float32),
        'graph_mask': jnp.ones((n_frames,), bool),
    }
    idxj = jnp.asarray(np.stack([f['idx'] for f in frames]))
    mj = jnp.asarray(np.stack([f['m'] for f in frames]))
    inv, invm = build_inverse_list(jnp.swapaxes(idxj, 1, 2),
                                   jnp.swapaxes(mj, 1, 2))
    return batch, (idxj, mj, inv, invm)


def main(n_atoms=4096, *factors, jitter=0.0):
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import optax

    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import get_loss_by_string

    factors = tuple(int(f) for f in factors) or (1, 2, 4)
    cutoff, k_max = 5.0, 40
    A_max = max(factors)
    batch_all, nlist_all = make_frames(n_atoms, A_max, cutoff, k_max=k_max,
                                       jitter=jitter)
    _ = float(jnp.sum(batch_all['pos']))  # honest-timing poison fetch
    edges_per_frame = [int(np.asarray(nlist_all[1][a]).sum()) * 2
                      for a in range(A_max)]  # newton3 half -> directed
    print(f'N={n_atoms}, directed edges/frame: {edges_per_frame}')

    model = NewtonNet(graph_mode='neighborlist', cutoff=cutoff,
                      n_features=128, n_basis=20, n_interactions=3,
                      compute_dtype='bfloat16', newton3=True,
                      k_max=nlist_all[0].shape[-1],
                      output_properties=['energy', 'gradient_force'])
    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})
    params0 = model.init(jax.random.PRNGKey(0), batch_all['z'][:1],
                         batch_all['pos'][:1], batch_all['cell'][:1])
    tx = optax.adam(1e-3)

    def slice_a(a):
        b = {k: v[a:a + 1] for k, v in batch_all.items()}
        nl = tuple(x[a:a + 1] for x in nlist_all)
        return b, nl

    def time_step(step, tag, n_edges):
        params, opt = jax.tree.map(jnp.array, params0), None
        opt = tx.init(params)
        params, opt, loss = step(params, opt)
        _ = float(loss)
        dts = []
        for _rep in range(3):
            t0 = time.perf_counter()
            n_iter = 10
            for _i in range(n_iter):
                params, opt, loss = step(params, opt)
            _ = float(loss)
            dts.append((time.perf_counter() - t0) / n_iter)
        dt = float(np.median(dts))
        print(f'{tag:10s}: {dt * 1e3:7.1f} ms/step  '
              f'{n_edges / dt / 1e6:6.2f} M edges/s '
              f'(min {min(dts)*1e3:.1f} max {max(dts)*1e3:.1f})')
        return dt

    for A in factors:
        n_edges = sum(edges_per_frame[:A])

        # -- batch form: one apply over (A, N) --
        ba = {k: v[:A] for k, v in batch_all.items()}
        nla = tuple(x[:A] for x in nlist_all)

        @jax.jit
        def step_batch(p, o, ba=ba, nla=nla):
            def loss_fn(pp):
                preds = model.apply(pp, ba['z'], ba['pos'], ba['cell'],
                                    nlist=nla)
                return main_loss(preds, ba)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        time_step(step_batch, f'batch A={A}', n_edges)

        if A == 1:
            continue

        # -- accum form: A independent B=1 chains in one jit --
        slices = [slice_a(a) for a in range(A)]

        @jax.jit
        def step_accum(p, o, slices=slices):
            def loss_fn(pp):
                total = 0.0
                for b, nl in slices:
                    preds = model.apply(pp, b['z'], b['pos'], b['cell'],
                                        nlist=nl)
                    total = total + main_loss(preds, b)
                return total / len(slices)
            loss, grads = jax.value_and_grad(loss_fn)(p)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss

        time_step(step_accum, f'accum A={A}', n_edges)


if __name__ == '__main__':
    args = [a for a in sys.argv[1:] if not a.startswith('--')]
    jit_amp = 0.05 if '--jitter' in sys.argv[1:] else 0.0
    main(*(int(a) for a in args), jitter=jit_amp)
