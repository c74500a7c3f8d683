#!/usr/bin/env python
'''Training-run dashboard: render a run's log.csv to one PNG.

Offline stand-in for a wandb dashboard (the Trainer also supports live
wandb when installed): loss curves (train/val/test, log scale), per-
property MAEs, learning-rate schedule, and throughput (epoch seconds +
edges/s when logged).

    python tools/plot_training.py <run_dir_or_log.csv> [out.png]
    python tools/plot_training.py <run_dir> --watch [seconds]

--watch re-renders whenever log.csv changes (live dashboard for a run in
progress; point any auto-reloading image viewer at the PNG). Stops when
the run's final summary rows appear or on Ctrl-C.
'''
import os
import sys
import time


def main(path, out=None):
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np

    if os.path.isdir(path):
        path = os.path.join(path, 'log.csv')
    out = out or os.path.join(os.path.dirname(path), 'dashboard.png')

    with open(path) as f:
        header = f.readline().strip().split(',')
    # CSV rows: numeric epochs, then 'last'/'best' summary rows -- skip those
    rows = []
    with open(path) as f:
        next(f)
        for line in f:
            first = line.split(',', 1)[0]
            if not first or not first[0].isdigit():
                continue
            def num(x):
                try:
                    return float(x)
                except ValueError:  # booleans/strings (e.g. best_model)
                    return np.nan
            rows.append([num(x) for x in line.rstrip('\n').split(',')])
    data = {k: np.array([r[i] if i < len(r) else np.nan for r in rows])
            for i, k in enumerate(header)}
    epoch = data.get('epoch', np.arange(len(rows)))

    fig, axes = plt.subplots(2, 2, figsize=(11, 7.5), dpi=120)
    fig.suptitle(os.path.dirname(os.path.abspath(path)).split(os.sep)[-1]
                 + ' / log.csv', fontsize=10)

    ax = axes[0, 0]
    for split in ('train', 'val', 'test'):
        key = f'{split}_loss'
        if key in data and np.isfinite(data[key]).any():
            ax.semilogy(epoch, data[key], label=split)
    ax.set_title('weighted loss')
    ax.set_xlabel('epoch')
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)

    ax = axes[0, 1]
    for key in sorted(data):
        if key.endswith('_mae') and 'per_atom' not in key \
                and np.isfinite(data[key]).any():
            ax.semilogy(epoch, data[key], label=key, lw=1)
    ax.set_title('MAEs')
    ax.set_xlabel('epoch')
    ax.legend(fontsize=6)
    ax.grid(alpha=0.3)

    ax = axes[1, 0]
    if 'lr' in data:
        ax.semilogy(epoch, data['lr'])
    ax.set_title('learning rate')
    ax.set_xlabel('epoch')
    ax.grid(alpha=0.3)

    ax = axes[1, 1]
    shown = False
    if 'epoch_seconds' in data and np.isfinite(data['epoch_seconds']).any():
        ax.plot(epoch, data['epoch_seconds'], label='epoch seconds')
        shown = True
    if 'edges_per_s' in data and np.isfinite(data['edges_per_s']).any():
        ax2 = ax.twinx()
        ax2.plot(epoch, data['edges_per_s'] / 1e6, color='C1',
                 label='M edges/s')
        ax2.set_ylabel('M edges/s')
        shown = True
    ax.set_title('throughput' if shown else 'throughput (not logged)')
    ax.set_xlabel('epoch')
    ax.grid(alpha=0.3)

    fig.tight_layout()
    fig.savefig(out)
    print(f'wrote {out}')


def watch(path, interval=10.0):
    log = os.path.join(path, 'log.csv') if os.path.isdir(path) else path
    last = None
    while True:
        try:
            mtime = os.stat(log).st_mtime
        except FileNotFoundError:
            mtime = None  # run not started yet
        if mtime is not None and mtime != last:
            try:
                main(log)
            except Exception as exc:  # partial row mid-write
                print(f'render skipped: {exc}')
            last = mtime
            with open(log) as f:
                if any(line.startswith(('last,', 'best,')) for line in f):
                    print('run finished')
                    return
        time.sleep(interval)


if __name__ == '__main__':
    args = [a for a in sys.argv[1:] if a != '--watch']
    if len(args) != len(sys.argv) - 1:
        watch(args[0], float(args[1]) if len(args) > 1 else 10.0)
    else:
        main(*args)
