#!/usr/bin/env python
'''Local multi-process launcher for distributed training.

Spawns N copies of a command (default: the training CLI), wiring up the
NEWTONNET_DIST_{COORD,NPROCS,PROCID} environment that
parallel/distributed.maybe_initialize_from_env consumes, plus
`--devices-per-proc` virtual CPU devices each. This is the single-machine
analogue of a pod launch: the same per-host environment, real
jax.distributed initialization, real cross-process collectives (Gloo on
CPU; ICI/DCN on TPU hardware, where you run one process per host with the
same three variables instead of this script).

Example (2 processes x 2 virtual CPU devices, DP over 4 global devices):

    python tools/launch_distributed.py --nprocs 2 --devices-per-proc 2 \
        -- python scripts/newtonnet_train.py --config config.yml

Child stdout/stderr stream to ./proc_{i}.log (or --log-dir). Exit status is
non-zero if any child fails; remaining children are then terminated.
'''
import argparse
import os
import signal
import socket
import subprocess
import sys


def free_port():
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--nprocs', type=int, default=2)
    p.add_argument('--devices-per-proc', type=int, default=1,
                   help='virtual CPU devices per process (0 = leave '
                        'XLA_FLAGS alone, e.g. real TPU hosts)')
    p.add_argument('--log-dir', default='.')
    p.add_argument('--timeout', type=float, default=None,
                   help='seconds before the whole set is killed')
    p.add_argument('cmd', nargs=argparse.REMAINDER,
                   help='command to run (prefix with --)')
    args = p.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == '--' else args.cmd
    if not cmd:
        p.error('no command given (append: -- python scripts/... )')

    port = free_port()
    os.makedirs(args.log_dir, exist_ok=True)
    procs, logs = [], []
    for i in range(args.nprocs):
        env = dict(os.environ)
        env['NEWTONNET_DIST_COORD'] = f'127.0.0.1:{port}'
        env['NEWTONNET_DIST_NPROCS'] = str(args.nprocs)
        env['NEWTONNET_DIST_PROCID'] = str(i)
        if args.devices_per_proc:
            env['XLA_FLAGS'] = (
                env.get('XLA_FLAGS', '') +
                f' --xla_force_host_platform_device_count='
                f'{args.devices_per_proc}')
        log = open(os.path.join(args.log_dir, f'proc_{i}.log'), 'w')
        logs.append(log)
        procs.append(subprocess.Popen(cmd, env=env, stdout=log,
                                      stderr=subprocess.STDOUT,
                                      start_new_session=True))
    print(f'launched {args.nprocs} processes (coordinator '
          f'127.0.0.1:{port}); logs in {args.log_dir}/proc_*.log',
          file=sys.stderr)

    rc = 0
    try:
        for i, proc in enumerate(procs):
            r = proc.wait(timeout=args.timeout)
            if r != 0:
                print(f'process {i} exited with {r}', file=sys.stderr)
                rc = rc or r
    except subprocess.TimeoutExpired:
        print('timeout: killing the process set', file=sys.stderr)
        rc = 124
    finally:
        for proc in procs:
            if proc.poll() is None:
                # kill the exact process group we started, never a pattern
                os.killpg(proc.pid, signal.SIGKILL)
        for log in logs:
            log.close()
    sys.exit(rc)


if __name__ == '__main__':
    main()
