#!/usr/bin/env python
'''Benchmark: training-step throughput in edges/s/chip (the BASELINE.json
north-star metric).

Workload: the reference's own MD17-aspirin training configuration
(scripts/config.yml -- 128 features, 20 Bessel basis, 3 interaction layers,
cutoff 5 A, energy + gradient-force MSE loss) on real aspirin frames, with
a full jitted train step (forward + force grad + backward + Adam update).
"Edges" counts real directed edges (|d| < cutoff, i != j) processed per
second per chip.

vs_baseline compares against the plain-torch CPU implementation of the
reference hot path (tools/torch_baseline.py; the reference repo itself
cannot run here: no torch_geometric/ase/les, no GPU). The stored number in
BENCH_BASELINE.json is refreshed by running that tool.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "edges/s/chip", "vs_baseline": R}
'''
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

import jax
import jax.numpy as jnp

def _enable_compilation_cache():
    # persistent XLA compilation cache: compiles on the tunneled TPU go
    # through a remote compile helper and take minutes; caching makes
    # every subsequent run start instantly
    import os
    cache = os.environ.get('JAX_COMPILATION_CACHE_DIR') or \
        os.path.expanduser('~/.cache/newtonnet_tpu/jax')
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update('jax_compilation_cache_dir', cache)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:
        pass


BATCH_SIZE = 100
CHUNK = 8       # train steps per device dispatch (lax.scan, as the Trainer
                # runs production epochs -- trainer.py _build_scan)
N_CHUNKS = 4
N_REPS = 7      # independent timed measurements; JSON reports the median
                # with min/max spread so tunnel noise is visible
HERE = os.path.dirname(os.path.abspath(__file__))


def load_batch(offset=0):
    from newtonnet_tpu.data import MolecularInMemoryDataset, collate
    root = os.path.join(HERE, 'data', 'md17_aspirin', 'ccsd_train')
    ds = MolecularInMemoryDataset(root=root)
    samples = [ds[(offset + i) % len(ds)] for i in range(BATCH_SIZE)]
    n_pad = max(8, -(-ds.max_atoms // 8) * 8)
    return collate(samples, n_pad=n_pad, batch_pad=BATCH_SIZE)


def count_edges(batch, cutoff=5.0):
    from newtonnet_tpu.ops.neighbors import dense_graph

    @jax.jit
    def count(pos, cell, z):
        _, adj = dense_graph(pos, cell, z > 0, cutoff)
        return jnp.sum(adj)

    return int(count(batch['pos'], batch['cell'], batch['z']))


def matmul_flops_per_step(B, N, F, R, n_layers):
    '''Analytic MXU-matmul FLOPs of one fastgrad train step (XLA cost
    analysis cannot see inside the Pallas custom calls).

    Per pair slot per layer the forward chain does rbf@We (2RF FLOPs) and
    four FxF matmuls (8F^2). The step runs: primal forward (1x), its
    reverse for forces (recompute + transposed matmuls + weight grads,
    ~3x), the dual forward (primal + tangent, 2x) and the dual reverse
    (~6x) -- ~12x the forward matmul work. Node-level MLPs and the 3-wide
    equivariant contractions are O(B N F^2) / O(B N^2 F): <5% extra.
    '''
    fwd = B * N * N * n_layers * (2 * R * F + 8 * F * F)
    return 12 * fwd


# v5e MXU peak (dense bf16 matmul); fp32 dots run at ~1/4 of this rate,
# so mfu_pct is reported against the hardware's true speed of light.
PEAK_FLOPS_BF16 = 197e12


def _probe_backend(total_wait_s=1200, probe_timeout_s=120):
    '''Fail fast (instead of hanging forever) when the tunneled TPU is
    wedged: the axon plugin blocks inside backend init with no timeout of
    its own, so device health is checked in a SUBPROCESS with a timeout,
    retrying for up to total_wait_s before giving up.'''
    import subprocess
    deadline = time.time() + total_wait_s
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, '-c',
                 'import jax; print("BACKEND_OK", jax.devices()[0].platform)'],
                capture_output=True, text=True, timeout=probe_timeout_s)
            if 'BACKEND_OK' in r.stdout:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline:
            return False
        print(f'# backend probe {attempt} failed; retrying '
              f'({int(deadline - time.time())}s left)', file=sys.stderr)
        time.sleep(60)


def main():
    _enable_compilation_cache()
    if not _probe_backend():
        print(json.dumps({
            'metric': 'edges/s/chip (train step, MD17 aspirin, B=100)',
            'value': 0,
            'unit': 'edges/s/chip',
            'vs_baseline': 0,
            'error': 'device backend unresponsive (tunneled TPU wedged); '
                     'no measurement possible -- see BENCH_r01.json for '
                     'the last healthy-tunnel measurement',
        }))
        sys.exit(3)
    import optax
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import (fastgrad, get_loss_by_string,
                                     get_optimizer_by_string)

    batch = {k: jnp.asarray(v) for k, v in load_batch().items()}
    n_edges = count_edges(batch)  # all chunks are aspirin frames of the
    # same size; per-batch edge counts vary <0.5%, so batch 0 stands in

    cfg = dict(cutoff=5.0, n_features=128, n_basis=20, n_interactions=3,
               output_properties=['energy', 'gradient_force'])
    model = NewtonNet(**cfg)
    pmodel = NewtonNet(kernel='pallas', **cfg)
    params = model.init(jax.random.PRNGKey(0), batch['z'], batch['pos'],
                        batch['cell'])
    tx = get_optimizer_by_string('adam', clip_grad=1.0, lr=1e-3)
    opt_state = tx.init(params)
    main_loss, _ = get_loss_by_string(
        {'energy': {'weight': 1.0}, 'gradient_force': {'weight': 50.0}})

    def make_step(m):
        @jax.jit
        def train_step(params, opt_state, batch):
            loss, grads, _ = fastgrad.value_and_grad(m, main_loss, params,
                                                     batch)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return train_step

    # parity guard: one fused-kernel step must match the XLA step
    _, _, loss_x = make_step(model)(params, opt_state, batch)
    _, _, loss_p = make_step(pmodel)(params, opt_state, batch)
    rel = abs(float(loss_p) - float(loss_x)) / max(abs(float(loss_x)), 1e-9)
    assert rel < 1e-3, f'pallas/XLA train-step loss mismatch: {rel}'

    # production stepping: CHUNK distinct batches per device dispatch under
    # lax.scan with a donated carry, exactly as Trainer._build_scan runs
    # epochs (per-step host dispatch on the tunneled backend costs ~1 ms).
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[{k: jnp.asarray(v) for k, v in load_batch(c * BATCH_SIZE).items()}
          for c in range(CHUNK)])

    def make_chunk(m):
        def body(carry, b):
            params, opt_state = carry
            loss, grads, _ = fastgrad.value_and_grad(m, main_loss, params, b)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state), loss
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def run(params, opt_state, stacked):
            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), stacked)
            return params, opt_state, losses[-1]
        return run

    train_chunk = make_chunk(pmodel)
    # compile + warmup. The float() fetch also switches the axon-tunneled
    # TPU stream into honest execution: before the first device->host fetch
    # in a process, block_until_ready does not actually block (see
    # PERF_NOTES.md), so timing without it reports fictional numbers.
    params, opt_state, loss = train_chunk(params, opt_state, stacked)
    _ = float(loss)

    # >=5 independent timed measurements (median + min/max in the JSON):
    # a single timing cannot distinguish tunnel noise from a real
    # regression round-over-round (VERDICT r4 weak #1). Each repetition
    # times N_CHUNKS scan dispatches of CHUNK steps each, synced by the
    # loss fetch.
    dts = []
    for _ in range(N_REPS):
        t0 = time.perf_counter()
        for _ in range(N_CHUNKS):
            params, opt_state, loss = train_chunk(params, opt_state,
                                                  stacked)
        _ = float(loss)
        dts.append((time.perf_counter() - t0) / (N_CHUNKS * CHUNK))
    dt = float(np.median(dts))

    edges_per_s = n_edges / dt
    B, N = batch['z'].shape
    mfu = matmul_flops_per_step(B, N, 128, 20, 3) / dt / PEAK_FLOPS_BF16

    baseline_path = os.path.join(HERE, 'BENCH_BASELINE.json')
    vs_baseline = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        if base.get('edges_per_s'):
            vs_baseline = edges_per_s / base['edges_per_s']

    print(json.dumps({
        'metric': 'edges/s/chip (train step, MD17 aspirin, B=100)',
        'value': round(edges_per_s, 1),
        'unit': 'edges/s/chip',
        'vs_baseline': round(vs_baseline, 3) if vs_baseline else None,
        'mfu_pct': round(100 * mfu, 1),
        # context: mfu is against the bf16 MXU peak, but the kernel sweep
        # (PERF_NOTES.md) shows the step is VPU/elementwise-bound -- bf16
        # vs fp32 dots land within noise -- so the bf16-peak headroom the
        # percentage implies is NOT reachable by precision knobs; the next
        # factor requires an edge-major data-structure change.
        'mfu_note': 'vs bf16 peak; step is VPU-bound (see PERF_NOTES.md)',
        'step_ms': round(dt * 1e3, 2),       # median of n_reps
        'step_ms_min': round(min(dts) * 1e3, 2),
        'step_ms_max': round(max(dts) * 1e3, 2),
        'n_reps': N_REPS,
        # attribute the measurement: a cleanly-failed TPU plugin falls back
        # to the CPU backend, which must not masquerade as a chip number
        'device': jax.devices()[0].platform,
    }))


if __name__ == '__main__':
    main()
