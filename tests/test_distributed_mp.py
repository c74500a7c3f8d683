'''REAL multi-process distributed training (SURVEY.md section 2.3 / 5:
distributed comm backend; BASELINE.md >= 80% scaling methodology).

Unlike every other parallelism test (virtual devices, one process), these
spawn SEPARATE OS processes, each with its own JAX runtime and 2 virtual
CPU devices, connected through jax.distributed (Gloo collectives on CPU --
the same initialization and SPMD program a TPU pod runs per host, where
the collectives ride ICI/DCN instead). Covered end to end through the real
training CLI: per-process data slicing (parallel/distributed.
global_data_batch), cross-process gradient psum, chief-only run dir +
checkpointing, in-memory final re-eval on every process, and resume.
'''
import csv
import os
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.join(HERE, '..')

CONFIG = '''\
general:
  device: cpu
  precision: float32
  output: {out}
  seed: 1
data:
  train_root: {repo}/data/md17_aspirin/ccsd_train
  train_size: 32
  val_size: 8
  test_size: 8
  train_batch_size: 8
  val_batch_size: 8
  test_batch_size: 8
model:
  cutoff: 5.0
  n_features: 16
  n_basis: 8
  n_interactions: 1
  output_properties: ['energy', 'gradient_force']
training:
  epochs: {epochs}
  parallel: {{data: -1}}
  loss:
    energy: {{weight: 1.0}}
    gradient_force: {{weight: 50.0}}
  optimizer:
    adam: {{lr: 0.001}}
'''


HALO_CONFIG = '''\
general:
  device: cpu
  precision: float32
  output: {out}
  seed: 1
data:
  train_root: {root}
  train_size: 16
  val_size: 4
  test_size: 4
  train_batch_size: 4
  val_batch_size: 4
  test_batch_size: 4
  spatial_sort: true
  n_pad: 48
model:
  cutoff: 3.0
  n_features: 8
  n_basis: 4
  n_interactions: 1
  graph_mode: neighborlist
  k_max: 24
  ewald_mode: periodic
  output_properties: ['charge', 'energy', 'gradient_force', 'direct_force']
training:
  epochs: {epochs}
  steps_per_call: 2
  parallel: {{data: 2, graph: 2}}
  halo: {{n_halo: 12}}
  loss:
    energy: {{weight: 1.0}}
    gradient_force: {{weight: 50.0}}
    direct_force: {{weight: 5.0}}
    stress: {{weight: 10.0}}
  optimizer:
    adam: {{lr: 0.001}}
'''


def _write_gas_dataset(root, n_frames=24, n_atoms=48, seed=5):
    '''Periodic random-gas frames in a long [48, 6, 6] box -- wide enough
    along x for a 2-shard slab decomposition at cutoff 3 (the same
    configuration class as tests/test_halo.py). Carries stress labels so
    the composed halo x multi-process run covers the generalized loss
    battery (per-graph tensor labels ride P('data') through
    global_data_batch's halo specs).'''
    from newtonnet_tpu.data.xyz import Frame, write_extxyz
    rs = np.random.RandomState(seed)
    box = np.diag([48.0, 6.0, 6.0])
    frames = []
    for _ in range(n_frames):
        numbers = rs.choice([1, 6, 8], size=n_atoms)
        pos = rs.rand(n_atoms, 3) * np.diag(box)
        s = rs.randn(3, 3) * 1e-2
        frames.append(Frame(numbers=numbers, positions=pos, cell=box,
                            pbc=[True] * 3, energy=float(rs.randn()),
                            forces=rs.randn(n_atoms, 3),
                            stress=0.5 * (s + s.T)))
    os.makedirs(os.path.join(root, 'raw'), exist_ok=True)
    write_extxyz(os.path.join(root, 'raw', 'gas.xyz'), frames)


def _clean_env():
    # the suite's conftest XLA_FLAGS (8 virtual devices) must not leak into
    # the children, which set their own device counts
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    for k in list(env):
        if k.startswith('NEWTONNET_DIST_'):
            del env[k]
    env['JAX_PLATFORMS'] = 'cpu'
    return env


def _write_config(path, out, epochs):
    with open(path, 'w') as f:
        f.write(CONFIG.format(out=out, repo=os.path.abspath(REPO),
                              epochs=epochs))


def _launch_mp(tmp_path, tag, config, nprocs=2, devices_per_proc=2,
               extra=()):
    log_dir = os.path.join(tmp_path, f'logs_{tag}')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools',
                                      'launch_distributed.py'),
         '--nprocs', str(nprocs), '--devices-per-proc',
         str(devices_per_proc), '--log-dir', log_dir, '--timeout', '540',
         '--', sys.executable,
         os.path.join(REPO, 'scripts', 'newtonnet_train.py'), *extra,
         *(('--config', config) if config else ())],
        capture_output=True, text=True, timeout=600, env=_clean_env(),
        cwd=REPO)
    logs = ''
    for i in range(nprocs):
        p = os.path.join(log_dir, f'proc_{i}.log')
        if os.path.exists(p):
            with open(p) as f:
                logs += f'--- proc {i} ---\n' + f.read()[-3000:]
    assert r.returncode == 0, (r.stdout, r.stderr, logs)
    return logs


def _read_log(out_dir):
    with open(os.path.join(out_dir, 'training_1', 'log.csv')) as f:
        return list(csv.DictReader(f))


@pytest.mark.slow
def test_multiprocess_training_matches_single_process(tmp_path):
    '''2 processes x 2 devices == 1 process x 4 devices, epoch for epoch
    (same global batches, same gradient psum -- the cross-process Gloo
    reduction must be numerically equivalent to the in-process one), and
    only the chief writes the run dir.'''
    mp_out = os.path.join(tmp_path, 'mp_out')
    sp_out = os.path.join(tmp_path, 'sp_out')
    mp_cfg = os.path.join(tmp_path, 'mp.yml')
    sp_cfg = os.path.join(tmp_path, 'sp.yml')
    _write_config(mp_cfg, mp_out, epochs=3)
    _write_config(sp_cfg, sp_out, epochs=3)

    _launch_mp(tmp_path, 'mp', mp_cfg)

    env = _clean_env()
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', 'newtonnet_train.py'),
         '--config', sp_cfg],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    mp_rows, sp_rows = _read_log(mp_out), _read_log(sp_out)
    assert len(mp_rows) == len(sp_rows)
    for a, b in zip(mp_rows, sp_rows):
        for key in ('train_loss', 'val_loss', 'test_loss',
                    'train_gradient_force_mae'):
            if a.get(key) and b.get(key):
                np.testing.assert_allclose(
                    float(a[key]), float(b[key]), rtol=1e-5,
                    err_msg=f'epoch {a["epoch"]} {key}')
    # chief-only filesystem: exactly one training_1 dir, with checkpoints
    assert os.path.exists(os.path.join(mp_out, 'training_1', 'models',
                                       'best_model.msgpack'))
    assert not os.path.exists(os.path.join(mp_out, 'training_2'))


@pytest.mark.slow
def test_multiprocess_halo_matches_single_process(tmp_path):
    '''Composed halo x multi-process training (SURVEY section 2.3/5 axis
    layout: 'data' spanning processes, 'graph' over each process's local
    devices): 2 processes x (data row of 1, graph=2 local devices) must
    match the single-process (data=2, graph=2) halo run epoch for epoch
    through the real training CLI -- same global batches, same halo
    ppermutes inside a process, gradient psum crossing processes.

    The config carries the FULL halo head/loss battery: a latent charge
    head with the process-sharded periodic Ewald sum
    (ops/ewald.ewald_energy_periodic_sharded under the composed mesh),
    direct_force, gradient_force, and per-graph stress labels
    (ref newtonnet/train/loss.py:106-149 battery scope).'''
    root = os.path.join(tmp_path, 'gas_ds')
    _write_gas_dataset(root)
    mp_out = os.path.join(tmp_path, 'mp_out')
    sp_out = os.path.join(tmp_path, 'sp_out')
    mp_cfg = os.path.join(tmp_path, 'mp_halo.yml')
    sp_cfg = os.path.join(tmp_path, 'sp_halo.yml')
    for path, out in ((mp_cfg, mp_out), (sp_cfg, sp_out)):
        with open(path, 'w') as f:
            f.write(HALO_CONFIG.format(out=out, root=root, epochs=3))

    _launch_mp(tmp_path, 'mp_halo', mp_cfg)

    env = _clean_env()
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'scripts', 'newtonnet_train.py'),
         '--config', sp_cfg],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    mp_rows, sp_rows = _read_log(mp_out), _read_log(sp_out)
    assert len(mp_rows) == len(sp_rows)
    for a, b in zip(mp_rows, sp_rows):
        for key in ('train_loss', 'val_loss', 'test_loss',
                    'train_gradient_force_mae', 'train_energy_mae',
                    'train_direct_force_mae', 'train_stress_mae'):
            if a.get(key) and b.get(key):
                np.testing.assert_allclose(
                    float(a[key]), float(b[key]), rtol=1e-5,
                    err_msg=f'epoch {a["epoch"]} {key}')
    # the stress + direct_force batteries actually flowed through the
    # composed run (the charge head has no labels; its sharded Ewald term
    # is exercised through the energy loss it feeds)
    assert any(r.get('train_stress_mae') for r in mp_rows)
    assert any(r.get('train_direct_force_mae') for r in mp_rows)
    # training actually descended and the chief wrote the artifacts
    e0 = [float(r['train_loss']) for r in mp_rows if r.get('epoch') == '0']
    e2 = [float(r['train_loss']) for r in mp_rows if r.get('epoch') == '2']
    assert e0 and e2 and e2[0] < e0[0]
    assert os.path.exists(os.path.join(mp_out, 'training_1', 'models',
                                       'best_model.msgpack'))


@pytest.mark.slow
def test_multiprocess_halo_md_matches_single_process(tmp_path):
    '''Halo-partitioned MD across separate OS processes: the GRAPH axis
    spans processes here (one system across hosts -- the opposite axis
    layout from training), so the per-layer halo ppermutes and the force
    psums cross the process boundary. The trajectory must match the
    single-process run on the same 4-device mesh (same seeds, same host
    re-sorts) to floating-point exactness.'''
    args = ['128', '8', '4', '4', '--aspect', '6.0', '--device', 'cpu',
            '--seed', '0']
    sp_out = os.path.join(tmp_path, 'sp.npz')
    mp_out = os.path.join(tmp_path, 'mp.npz')

    env = _clean_env()
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'demo_halo_md.py'),
         *args, '--save', sp_out],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])

    log_dir = os.path.join(tmp_path, 'mdlogs')
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools',
                                      'launch_distributed.py'),
         '--nprocs', '2', '--devices-per-proc', '2', '--log-dir', log_dir,
         '--timeout', '540', '--', sys.executable,
         os.path.join(REPO, 'tools', 'demo_halo_md.py'), *args,
         '--save', mp_out],
        capture_output=True, text=True, timeout=600, env=_clean_env(),
        cwd=REPO)
    logs = ''
    for i in range(2):
        p = os.path.join(log_dir, f'proc_{i}.log')
        if os.path.exists(p):
            with open(p) as f:
                logs += f'--- proc {i} ---\n' + f.read()[-2000:]
    assert r.returncode == 0, (r.stderr[-2000:], logs)

    sp, mp = np.load(sp_out), np.load(mp_out)
    np.testing.assert_allclose(mp['positions'], sp['positions'], atol=1e-12)
    np.testing.assert_allclose(mp['momenta'], sp['momenta'], atol=1e-12)
    np.testing.assert_allclose(mp['epot'], sp['epot'], rtol=1e-6)
    # ekin-derived: the graph-axis psum crosses processes (reduction-order
    # noise only)
    np.testing.assert_allclose(mp['temperature'], sp['temperature'],
                               rtol=1e-5)


@pytest.mark.slow
def test_multiprocess_resume(tmp_path):
    '''A 2-epoch multi-process run resumed (all processes restarted) for a
    third epoch lands where the uninterrupted 3-epoch run (previous test's
    scenario) would: the resumed epoch trains, the log continues, and the
    checkpoint round-trips through every process.'''
    out = os.path.join(tmp_path, 'out')
    cfg = os.path.join(tmp_path, 'train.yml')
    _write_config(cfg, out, epochs=2)
    _launch_mp(tmp_path, 'initial', cfg)
    run_dir = os.path.join(out, 'training_1')
    rows = _read_log(out)
    assert rows[-1]['epoch'] == 'best'

    # extend to 3 epochs by editing the archived config (the documented
    # resume flow: --resume re-reads run_scripts/<config>.yml)
    archived = os.path.join(run_dir, 'run_scripts', 'train.yml')
    with open(archived) as f:
        text = f.read()
    with open(archived, 'w') as f:
        f.write(text.replace('epochs: 2', 'epochs: 3'))

    _launch_mp(tmp_path, 'resume', None, extra=('--resume', run_dir))
    resumed = os.path.join(out, 'training_2')
    assert os.path.exists(resumed)
    with open(os.path.join(resumed, 'log.csv')) as f:
        rows2 = list(csv.DictReader(f))
    epochs = [r['epoch'] for r in rows2]
    assert '2' in epochs, epochs  # the third epoch actually trained
    # training kept descending across the restart
    e1 = [float(r['train_loss']) for r in rows2 if r['epoch'] == '1'][0]
    e2 = [float(r['train_loss']) for r in rows2 if r['epoch'] == '2'][0]
    assert e2 < e1
