#!/usr/bin/env python
'''Scaling harness: train-step edges/s vs device count (BASELINE.md target:
>= 80% parallel efficiency from 1 host to N hosts).

Measures the two distribution modes on whatever devices exist:

  * dp:   data parallelism -- weak scaling with a fixed per-device batch of
          molecules (the Trainer's mesh path; gradient psum over ICI/DCN);
  * halo: graph parallelism -- weak scaling of one large periodic gas with
          atoms sharded over the graph axis and boundary-block halo
          exchange (parallel/halo.py sharded train step).

On a TPU pod, run unchanged (one process per host; jax.distributed is
initialized via parallel/distributed.py, a no-op in single-process runs).
Without hardware, `--platform cpu --devices 8` uses virtual CPU devices --
absolute numbers are meaningless there, but the efficiency curve and the
methodology are identical.

Writes a markdown report (--out SCALING.md) and prints one JSON line per
measurement. Timing protocol per PERF_NOTES.md: one device->host fetch
poisons the stream before any timed region, and each timed region executes
`--steps` full train steps back-to-back with a final block_until_ready.
'''
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--devices', type=int, default=0,
                   help='virtual CPU device count (0 = use real devices)')
    p.add_argument('--processes', type=int, default=0,
                   help='spawn N separate OS processes (real jax.distributed '
                        'over Gloo on CPU; on a TPU pod run this script once '
                        'per host with NEWTONNET_DIST_* env instead) and '
                        'measure the dp step over the global mesh')
    p.add_argument('--devices-per-proc', type=int, default=2,
                   help='virtual CPU devices per process in --processes mode')
    p.add_argument('--platform', default=None, choices=[None, 'cpu', 'tpu'])
    p.add_argument('--mode', default='both', choices=['dp', 'halo', 'both'])
    p.add_argument('--steps', type=int, default=10)
    p.add_argument('--warmup', type=int, default=2)
    p.add_argument('--batch-per-device', type=int, default=16)
    p.add_argument('--atoms-per-device', type=int, default=256)
    p.add_argument('--out', default=None, help='markdown report path')
    p.add_argument('--n-features', type=int, default=64)
    p.add_argument('--n-interactions', type=int, default=3)
    p.add_argument('--predict', action='store_true',
                   help='pod-efficiency prediction: program-derived '
                        'communication volumes + an analytic ICI/DCN '
                        'bandwidth model (no hardware needed; see '
                        'SCALING.md "Predicted pod efficiency")')
    return p.parse_args()


# ------------------------------------------------------------------ #
# Pod-efficiency prediction (BASELINE.md >= 80% clause): everything this
# one-chip environment CAN produce -- measured single-chip step times
# (PERF_NOTES.md / BENCH_r03.json), program-derived per-step communication
# volumes, and public v5e interconnect figures -- combined into predicted
# parallel efficiency vs device count. tools/bench_scaling.py without
# --predict measures the same efficiencies for real on actual hardware.

# public TPU v5e figures (jax-ml.github.io/scaling-book: ICI one-way
# bandwidth per link 4.5e10 B/s, 4 links/chip in the 2D torus; DCN ~2.5e10
# B/s per host, 8 chips per v5e host)
ICI_LINK_BW = 45e9          # bytes/s, one way, per link
DCN_HOST_BW = 25e9          # bytes/s per host
CHIPS_PER_HOST = 8


def _dtype_bytes(code):
    return {'f32': 4, 'f16': 2, 'bf16': 2, 'f64': 8, 'i32': 4, 'u32': 4,
            'i16': 2, 'i8': 1, 'u8': 1, 'bool': 1, 'i64': 8, 'f8': 1}.get(
                code, 4)


def collective_bytes(fn, *args):
    '''Per-shard, per-call payload bytes of every ppermute / psum in the
    jaxpr of `fn` -- the program-derived communication volume (the same
    program-inspection approach tests/test_halo.py::
    test_halo_comm_is_boundary_sized asserts boundary-sizing with).'''
    import re

    import jax
    text = str(jax.make_jaxpr(fn)(*args))
    out = {'ppermute': 0, 'psum': 0}
    # jaxpr eqn format: "out1:f32[1,640,512] out2:... = ppermute[...] in"
    for lhs, prim in re.findall(
            r'((?:[a-z0-9_]+:[a-z0-9]+\[[0-9,]*\] )+)= (ppermute|psum)\[',
            text):
        for dt, shape in re.findall(r':([a-z0-9]+)\[([0-9,]*)\]', lhs):
            n = 1
            for s in shape.split(','):
                if s:
                    n *= int(s)
            out[prim] += n * _dtype_bytes(dt)
    assert out['ppermute'] or out['psum'], \
        'no collectives found -- jaxpr text format changed?'
    return out


def _allreduce_ms(payload_bytes, n_chips):
    '''Bidirectional-ring all-reduce time over ICI, hierarchical over DCN.

    Within a host (or pod slice): t = 2 * P * (D-1)/D / (2 * ICI_LINK_BW)
    (reduce-scatter + all-gather, both ICI directions busy). Across hosts:
    reduce within host over ICI first, then ring all-reduce of the full
    payload between hosts over DCN, then broadcast down -- the DCN stage
    moves 2 * P * (H-1)/H bytes per host.
    '''
    d = min(n_chips, CHIPS_PER_HOST)
    t = 2.0 * payload_bytes * (d - 1) / d / (2.0 * ICI_LINK_BW)
    # ceil: a partial host still adds a DCN stage (12 chips = 2 hosts);
    # floor would silently drop the cross-host term for ad-hoc counts
    hosts = max(1, -(-n_chips // CHIPS_PER_HOST))
    if hosts > 1:
        t += 2.0 * payload_bytes * (hosts - 1) / hosts / DCN_HOST_BW
    return t * 1e3


def _latest_bench_step_ms(default):
    '''(step_ms, source) from the newest BENCH_r*.json with a real-chip
    measurement; (default, 'constant...') when none is readable.'''
    import glob
    import json as _json
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for path in sorted(glob.glob(os.path.join(root, 'BENCH_r*.json')),
                       reverse=True):
        try:
            with open(path) as f:
                row = _json.load(f)
        except Exception:
            continue
        row = row.get('parsed', row)   # driver captures nest under 'parsed'
        if row.get('device') == 'tpu' and row.get('step_ms'):
            return float(row['step_ms']), os.path.basename(path)
    return default, 'constant (no BENCH_r*.json with a tpu step_ms found)'


def predict_pod_efficiency(args, out_path=None):
    '''Predicted parallel efficiency vs chip count for the measured
    configurations. Prints one JSON line per scenario/device-count and
    returns the rows.'''
    os.environ.setdefault(
        'XLA_FLAGS', '--xla_force_host_platform_device_count=2')
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np

    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.parallel import make_mesh, make_halo_train_step, \
        shard_halo_batch, spatial_sort

    # ---- measured single-chip step times (ms) ----
    # dense MD17 headline: read from the NEWEST driver-captured
    # BENCH_r*.json (falls back to the r03 constant with a note, so the
    # prediction table tracks the live bench round-over-round); B=10 is
    # scaled from it (step time ~linear in B on the HBM-bound dense
    # path; the 0.66/5.25 ratio was measured in round 3).
    # large-N DP: staircase-compacted half lists (PERF_NOTES round-5,
    # N=4096, newton3c chunk=4, native lists). The halo mode runs plain
    # full lists per shard (~87 ms measured, PERF_NOTES round-3; neither
    # newton3 nor the staircase composes with the halo-extended axis);
    # its row uses the SMALLER 52.6 ms so communication is overweighted
    # -- the conservative direction for an efficiency prediction
    T_DENSE_B100, bench_src = _latest_bench_step_ms(default=5.25)
    print(f'# T_DENSE_B100 = {T_DENSE_B100} ms  (source: {bench_src})')
    T_DENSE_B10 = 0.66 * (T_DENSE_B100 / 5.25)
    T_LARGEN = 31.7
    T_LARGEN_HALO = 52.6

    # ---- gradient all-reduce payload: the parameter pytree ----
    model = NewtonNet(cutoff=5.0, n_features=128, n_basis=20,
                      n_interactions=3,
                      output_properties=['energy', 'gradient_force'])
    z = jnp.ones((1, 21), jnp.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), z,
                                 jnp.zeros((1, 21, 3), jnp.float32),
                                 jnp.zeros((1, 3, 3), jnp.float32))
    param_bytes = sum(x.size * x.dtype.itemsize
                      for x in jax.tree.leaves(params))

    # ---- halo-exchange payload: derived from the sharded program ----
    # production-class halo config: N=4096 atoms/shard at liquid density
    # (rho ~= 0.1 A^-3 -> ~34.5 A slab width per shard), H = atoms within
    # the 5 A boundary layer (~640), F=128, 3 layers
    import optax
    n_loc, H, F = 4096, 640, 128
    nl_model = NewtonNet(cutoff=5.0, n_features=F, n_basis=20,
                         n_interactions=3, graph_mode='neighborlist',
                         k_max=48,
                         output_properties=['energy', 'gradient_force'])
    mesh = make_mesh(data=1, graph=2, devices=jax.devices()[:2])
    N = 2 * n_loc
    rs = np.random.RandomState(0)
    zh = rs.choice([1, 6, 8], size=(1, N)).astype(np.int32)
    box = np.asarray([2 * 34.5, 34.5, 34.5])
    ph = (rs.rand(1, N, 3) * box).astype(np.float32)
    cellh = np.broadcast_to(np.diag(box), (1, 3, 3)).astype(np.float32)
    zh, ph, _ = spatial_sort(zh, ph, cellh, n_shards=2)
    batch = {'z': jnp.asarray(zh), 'pos': jnp.asarray(ph, jnp.float32),
             'cell': jnp.asarray(cellh),
             'energy': jnp.zeros((1,), jnp.float32),
             'force': jnp.zeros((1, N, 3), jnp.float32),
             'graph_mask': jnp.ones((1,), bool)}
    hparams = jax.eval_shape(
        lambda k: nl_model.core.init(k, batch['z'], batch['pos'],
                                     batch['cell']),
        jax.random.PRNGKey(0))
    hparams = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), hparams)
    tx = optax.adam(1e-3)
    step = make_halo_train_step(nl_model, tx, mesh, n_halo=H)
    sb = shard_halo_batch(batch, mesh)
    comm = collective_bytes(
        lambda p, o, b: step(p, o, b), hparams, tx.init(hparams), sb)
    halo_ppermute_bytes = comm['ppermute']
    halo_psum_bytes = comm['psum']

    rows = []

    def emit(scenario, t_comp_ms, chips_list, comm_ms_fn, note):
        for c in chips_list:
            t_comm = comm_ms_fn(c)
            eff = 100.0 * t_comp_ms / (t_comp_ms + t_comm)
            row = {'scenario': scenario, 'chips': c,
                   't_comp_ms': round(t_comp_ms, 3),
                   't_comm_ms': round(t_comm, 4),
                   'predicted_efficiency_pct': round(eff, 1), 'note': note}
            rows.append(row)
            print(json.dumps(row))

    chips = [8, 64, 256]
    emit('dense-dp-B100/chip', T_DENSE_B100, chips,
         lambda c: _allreduce_ms(param_bytes, c),
         f'grad all-reduce {param_bytes / 1e6:.2f} MB (param pytree)')
    emit('dense-dp-B10/chip', T_DENSE_B10, chips,
         lambda c: _allreduce_ms(param_bytes, c),
         'reference batch size; the near-threshold DP case')
    emit('largeN-dp-N4096/chip', T_LARGEN, chips,
         lambda c: _allreduce_ms(param_bytes, c),
         'newton3c staircase train step, PERF_NOTES round-5')
    # halo: ring exchanges ride both ICI directions concurrently; the
    # per-shard per-step one-way payload is half the total ppermute bytes.
    # Compute per shard stays ~T_LARGEN (4096 atoms/shard weak scaling);
    # the gradient all-reduce (graph axis) adds param_bytes like DP.
    emit('largeN-halo-N4096/shard', T_LARGEN_HALO, chips,
         lambda c: (halo_ppermute_bytes / 2.0 / ICI_LINK_BW * 1e3
                    + _allreduce_ms(param_bytes + halo_psum_bytes, c)),
         f'halo ppermutes {halo_ppermute_bytes / 1e6:.2f} MB/step/shard '
         f'(program-derived), psums {halo_psum_bytes / 1e6:.2f} MB')

    print(json.dumps({
        'param_bytes': param_bytes,
        'halo_ppermute_bytes_per_step_per_shard': halo_ppermute_bytes,
        'halo_psum_bytes_per_step_per_shard': halo_psum_bytes,
        'assumptions': {
            'ici_link_bw_Bps': ICI_LINK_BW, 'dcn_host_bw_Bps': DCN_HOST_BW,
            'chips_per_host': CHIPS_PER_HOST,
            'overlap': 'none (pessimistic: comm fully exposed)'}}))
    return rows


def orchestrate_processes(args):
    '''Parent mode for --processes N: measure a 1-process/1-device baseline,
    spawn the N-process set via tools/launch_distributed.py, merge the
    chief's measurement, and report multi-process efficiency.'''
    import subprocess
    import tempfile
    here = os.path.dirname(os.path.abspath(__file__))
    common = ['--mode', 'dp', '--platform', 'cpu',
              '--steps', str(args.steps), '--warmup', str(args.warmup),
              '--batch-per-device', str(args.batch_per_device),
              '--n-features', str(args.n_features),
              '--n-interactions', str(args.n_interactions)]
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)

    # single-process single-device baseline (same per-device problem size)
    r = subprocess.run([sys.executable, os.path.abspath(__file__),
                        '--devices', '1', *common],
                       capture_output=True, text=True, timeout=900, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    base = [json.loads(line) for line in r.stdout.splitlines()
            if line.startswith('{')][0]

    with tempfile.TemporaryDirectory() as log_dir:
        r = subprocess.run(
            [sys.executable, os.path.join(here, 'launch_distributed.py'),
             '--nprocs', str(args.processes),
             '--devices-per-proc', str(args.devices_per_proc),
             '--log-dir', log_dir, '--timeout', '900', '--',
             sys.executable, os.path.abspath(__file__), *common],
            capture_output=True, text=True, timeout=960, env=env)
        with open(os.path.join(log_dir, 'proc_0.log')) as f:
            chief = f.read()
        assert r.returncode == 0, (r.stderr[-2000:], chief[-3000:])
    rows = [json.loads(line) for line in chief.splitlines()
            if line.startswith('{')]
    row = rows[-1]
    d = row['devices']
    row |= {'mode': 'dp-multiprocess', 'processes': args.processes,
            'efficiency_pct': round(
                100 * row['edges_per_s'] / (base['edges_per_s'] * d), 1)}
    print(json.dumps(row))
    if args.out:
        with open(args.out, 'a') as f:
            f.write(f"\n## Multi-process ({args.processes} OS processes x "
                    f"{args.devices_per_proc} devices, jax.distributed/"
                    f"Gloo)\n\n"
                    f"| mode | procs | devices | batch | step ms | edges/s |"
                    f" efficiency vs 1-proc/1-dev |\n|---|---|---|---|---|"
                    f"---|---|\n"
                    f"| dp-multiprocess | {args.processes} | {d} | "
                    f"{row['batch']} | {row['step_ms']} | "
                    f"{row['edges_per_s']:.3g} | {row['efficiency_pct']}% "
                    f"|\n\nSame virtual-CPU caveat as above; what this row "
                    f"proves is the real multi-process code path: separate "
                    f"runtimes, cross-process gradient psum, per-process "
                    f"batch slices. On a pod, run one process per host "
                    f"with NEWTONNET_DIST_* env (no --processes flag "
                    f"needed).\n")
        print(f'appended multi-process row to {args.out}', file=sys.stderr)


def main():
    args = parse_args()
    if args.predict:
        predict_pod_efficiency(args, out_path=args.out)
        return
    if args.processes > 1 and 'NEWTONNET_DIST_NPROCS' not in os.environ:
        orchestrate_processes(args)
        return
    if args.devices:
        os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                                   + f' --xla_force_host_platform_device_count={args.devices}')
    import jax
    if args.platform:
        jax.config.update('jax_platforms', args.platform)
    import jax.numpy as jnp
    import numpy as np
    import optax

    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.parallel import (
        global_data_batch,
        initialize_distributed,
        make_global_mesh,
        make_halo_train_step,
        maybe_initialize_from_env,
        shard_halo_batch,
        spatial_sort,
    )
    from newtonnet_tpu.train import get_loss_by_string

    # NEWTONNET_DIST_* env (launch_distributed.py / per-host pod launch),
    # falling back to pod auto-configuration; no-op single-process
    maybe_initialize_from_env() or initialize_distributed()
    multiproc = jax.process_count() > 1
    devices = jax.devices()
    n_dev = len(devices)
    counts = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    if multiproc:
        # each process owns only its local devices; measure the one global
        # mesh (smaller meshes would exclude processes from the program)
        counts = [n_dev]
        if args.mode == 'both':
            args.mode = 'dp'
    print(f'# devices: {n_dev} ({devices[0].platform}), '
          f'process {jax.process_index()}/{jax.process_count()}',
          file=sys.stderr)

    rows = []

    def poison(x):
        float(jnp.sum(x))  # force a fetch so subsequent timings are honest

    def timed(fn, *a):
        out = None
        for _ in range(args.warmup):
            out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.steps, out

    # ---------------- data-parallel weak scaling ---------------- #
    if args.mode in ('dp', 'both'):
        from newtonnet_tpu.parallel.mesh import make_mesh
        from jax.sharding import NamedSharding, PartitionSpec as P

        model = NewtonNet(cutoff=5.0, n_features=args.n_features, n_basis=20,
                          n_interactions=args.n_interactions,
                          output_properties=['energy', 'gradient_force'])
        main_loss, _ = get_loss_by_string(
            {'energy': {}, 'gradient_force': {'weight': 50.0}})
        tx = optax.adam(1e-3)
        N = 24
        base = None
        for d in counts:
            B = args.batch_per_device * d
            rs = np.random.RandomState(0)
            z = rs.choice([1, 6, 7, 8], size=(B, N)).astype(np.int32)
            z[:, -3:] = 0
            pos = (rs.randn(B, N, 3) * 1.8).astype(np.float32)
            host_batch = {'z': z, 'pos': pos,
                          'cell': np.zeros((B, 3, 3), np.float32),
                          'energy': np.zeros((B,), np.float32),
                          'force': np.zeros((B, N, 3), np.float32),
                          'graph_mask': np.ones((B,), bool)}
            mesh = make_mesh(data=d, graph=1, devices=devices[:d])
            repl = NamedSharding(mesh, P())
            bsh = NamedSharding(mesh, P('data'))
            batch = {k: jnp.asarray(v) for k, v in host_batch.items()}

            if multiproc:
                # host params (same everywhere: fixed seed on CPU), entered
                # as global replicated arrays
                import jax as _jax
                with _jax.default_device(_jax.local_devices()[0]):
                    params = jax.jit(model.init)(
                        jax.random.PRNGKey(0),
                        jnp.asarray(z[:1]), jnp.asarray(pos[:1]),
                        jnp.zeros((1, 3, 3), jnp.float32))
                params = jax.device_put(jax.device_get(params), repl)
                opt_state = jax.device_put(
                    jax.device_get(tx.init(params)), repl)
            else:
                params = jax.jit(model.init, static_argnums=())(
                    jax.random.PRNGKey(0), batch['z'], batch['pos'],
                    batch['cell'])
                opt_state = tx.init(params)

            def train_step(params, opt_state, batch):
                def loss_fn(p):
                    preds = model.apply(p, batch['z'], batch['pos'],
                                        batch['cell'])
                    return main_loss(preds, batch)
                loss, grads = jax.value_and_grad(loss_fn)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state, loss

            step = jax.jit(train_step,
                           in_shardings=(repl, repl,
                                         jax.tree.map(lambda _: bsh, batch)),
                           out_shardings=(repl, repl, repl),
                           donate_argnums=(0, 1))
            # count real edges once (cutoff graph on the synthetic batch),
            # on host-local arrays: under multi-process, eager ops on
            # global sharded arrays are not addressable from one process
            from newtonnet_tpu.ops.neighbors import dense_graph
            _, adj = jax.jit(dense_graph, static_argnums=(3,))(
                jnp.asarray(host_batch['pos']),
                jnp.asarray(host_batch['cell']),
                jnp.asarray(host_batch['z'] > 0), 5.0)
            edges = int(jnp.sum(adj))

            if multiproc:
                # real per-process slice -> global arrays (the multi-host
                # data path the Trainer runs, parallel/distributed.py)
                batch = global_data_batch(mesh, host_batch)
            else:
                batch = jax.device_put(batch, bsh)
                params = jax.device_put(params, repl)
                opt_state = jax.device_put(opt_state, repl)
            poison(jnp.ones(()))

            def run(params, opt_state):
                p, o, loss = step(params, opt_state, batch)
                return p, o, loss

            # keep state threading out of the timed closure: donation means
            # we must re-feed outputs; wrap in a mutable cell
            state = [params, opt_state]

            def one():
                state[0], state[1], loss = step(state[0], state[1], batch)
                return loss

            dt, _ = timed(one)
            eps = edges / dt
            if base is None:
                base = eps
            eff = eps / (base * d)
            row = {'mode': 'dp', 'devices': d, 'batch': B,
                   'edges_per_batch': edges, 'step_ms': round(dt * 1e3, 3),
                   'edges_per_s': round(eps, 1),
                   'efficiency_pct': round(100 * eff, 1)}
            rows.append(row)
            print(json.dumps(row))

    # ---------------- halo graph-parallel weak scaling ---------------- #
    if args.mode in ('halo', 'both'):
        halo_counts = [d for d in counts if d >= 2]
        base = None
        for d in halo_counts:
            N = args.atoms_per_device * d
            # periodic gas at liquid-ish density, elongated along x
            Lx = 3.0 * N / 256 * 16.0
            box = np.asarray([Lx, 12.0, 12.0])
            rs = np.random.RandomState(0)
            z = rs.choice([1, 6, 8], size=(1, N)).astype(np.int32)
            pos = rs.rand(1, N, 3) * box
            force = rs.randn(1, N, 3).astype(np.float32)
            cell = np.broadcast_to(np.diag(box), (1, 3, 3)).astype(np.float32)
            z, pos, extra = spatial_sort(z, pos, cell,
                                         extra={'force': force}, n_shards=d)
            n_halo = max(32, int(2.2 * args.atoms_per_device
                                 * 5.0 / (Lx / d)))
            # with 2 shards both halos come from the same neighbor: cap at
            # N_loc/2 so the extended axis never duplicates an atom
            cap = args.atoms_per_device // 2 if d == 2 \
                else args.atoms_per_device
            n_halo = min(n_halo, cap)
            model = NewtonNet(cutoff=5.0, n_features=args.n_features,
                              n_basis=20,
                              n_interactions=args.n_interactions,
                              graph_mode='neighborlist', k_max=40,
                              output_properties=['energy', 'gradient_force'])
            mesh = make_global_mesh(data=1, graph=d)
            tx = optax.adam(1e-3)
            batch = {'z': jnp.asarray(z),
                     'pos': jnp.asarray(pos, jnp.float32),
                     'cell': jnp.asarray(cell),
                     'energy': jnp.zeros((1,), jnp.float32),
                     'force': jnp.asarray(extra['force']),
                     'graph_mask': jnp.ones((1,), bool)}
            params = jax.jit(model.init)(jax.random.PRNGKey(0), batch['z'],
                                         batch['pos'], batch['cell'])
            step = make_halo_train_step(model, tx, mesh, n_halo=n_halo)
            batch = shard_halo_batch(batch, mesh)
            poison(batch['pos'])

            state = [params, tx.init(params)]

            def one():
                state[0], state[1], m = step(state[0], state[1], batch)
                return m['loss']

            dt, _ = timed(one)
            # edge count from the plain neighbor list (same graph)
            from newtonnet_tpu.ops.nlist import neighbor_list
            _, kmask, _, _ = jax.jit(
                neighbor_list, static_argnums=(3, 4))(
                batch['pos'], batch['cell'],
                batch['z'] > 0, 5.0, 40)
            edges = int(jnp.sum(kmask))
            eps = edges / dt
            if base is None:
                base = eps / d  # per-device baseline from smallest run
            eff = eps / (base * d)
            row = {'mode': 'halo', 'devices': d, 'atoms': N, 'n_halo': n_halo,
                   'edges_per_batch': edges, 'step_ms': round(dt * 1e3, 3),
                   'edges_per_s': round(eps, 1),
                   'efficiency_pct': round(100 * eff, 1)}
            rows.append(row)
            print(json.dumps(row))

    if args.out:
        plat = devices[0].platform
        with open(args.out, 'w') as f:
            f.write('# Scaling (train-step edges/s vs device count)\n\n')
            f.write(f'Harness: `tools/bench_scaling.py` -- weak scaling, '
                    f'{args.steps} timed steps, platform `{plat}`, '
                    f'{n_dev} devices.\n\n')
            f.write('Efficiency = edges/s divided by (devices x single-'
                    'device edges/s) for dp, and by devices x the per-'
                    'device rate of the smallest halo run for halo. '
                    'Target (BASELINE.md): >= 80%.\n\n')
            if plat == 'cpu':
                f.write('**Caveat (virtual CPU devices):** all virtual '
                        'devices share one host\'s physical cores, so '
                        'weak-scaled work grows while hardware does not; '
                        'the curves measure the sharded program\'s '
                        'correctness and communication overhead, not chip '
                        'speedup. They are meaningful only while the host '
                        'still has idle cores (keep per-device sizes '
                        'small); real efficiency numbers require real '
                        'chips, where this exact command applies '
                        'unchanged.\n\n')
            f.write('| mode | devices | problem size | step ms | edges/s |'
                    ' efficiency |\n|---|---|---|---|---|---|\n')
            for r in rows:
                size = (f"B={r['batch']}" if r['mode'] == 'dp'
                        else f"N={r['atoms']} (H={r['n_halo']})")
                f.write(f"| {r['mode']} | {r['devices']} | {size} | "
                        f"{r['step_ms']} | {r['edges_per_s']:.3g} | "
                        f"{r['efficiency_pct']}% |\n")
            f.write('\nOn real multi-host TPU hardware run the identical '
                    'command per host (jax.distributed picks up pod '
                    'topology; the data feed already slices per process '
                    'via parallel/distributed.py).\n')
        print(f'wrote {args.out}', file=sys.stderr)


if __name__ == '__main__':
    main()
