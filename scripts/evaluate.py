#!/usr/bin/env python
'''Standalone checkpoint evaluation.

Evaluates a trained checkpoint (msgpack, reference .pt, or several
checkpoints ensemble-averaged) on a dataset root and prints the MAE/RMSE
table; optionally writes per-frame predictions to an npz.

  python scripts/evaluate.py --model artifacts/md17_model/best_model.msgpack \
      --data data/md17_aspirin/ccsd_test [--batch-size 100] [--out preds.npz]
'''
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description='Evaluate a NewtonNet-TPU checkpoint.')
    parser.add_argument('-m', '--model', nargs='+', required=True,
                        help='checkpoint path(s); several = ensemble average')
    parser.add_argument('-d', '--data', required=True,
                        help='dataset root (raw/*.xyz)')
    parser.add_argument('--batch-size', type=int, default=100)
    parser.add_argument('--precision', default='float32')
    parser.add_argument('--matmul-precision', default='highest')
    parser.add_argument('--out', default=None,
                        help='write per-frame predictions to this npz')
    parser.add_argument('--device', default=None)
    args = parser.parse_args()

    import jax
    if args.device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_default_matmul_precision', args.matmul_precision)
    import jax.numpy as jnp
    import numpy as np

    from newtonnet_tpu.data import MolecularInMemoryDataset, PaddedLoader
    from newtonnet_tpu.md.calculator import NewtonNetCalculator

    calc = NewtonNetCalculator(model_path=args.model if len(args.model) > 1
                               else args.model[0],
                               properties=['energy', 'forces'],
                               precision=args.precision,
                               matmul_precision=args.matmul_precision)
    models = [(calc.model, calc.params)] + calc._ensemble

    ds = MolecularInMemoryDataset(
        root=args.data, precision=np.dtype(args.precision))
    model0 = models[0][0]
    nlist_mode = ('newton3' if getattr(model0, 'newton3', False) else
                  'inverse' if getattr(model0, 'inverse_lists', False)
                  else None)
    if nlist_mode:
        # checkpoints trained with fast list formats need precomputed
        # lists at evaluation time too; build them per frame on the host
        from newtonnet_tpu.data import NeighborListDataset
        ds = NeighborListDataset(ds, cutoff=model0.cutoff,
                                 k_max=model0.k_max, mode=nlist_mode,
                                 mic_mode=model0.mic_mode)
    loader = PaddedLoader(ds, batch_size=args.batch_size, shuffle=False)
    fns = [jax.jit(m.apply) for m, _ in models]

    def batch_nlist(batch):
        if 'nlist_idx' not in batch:
            return None
        idx = jnp.asarray(batch['nlist_idx'])
        mask = jnp.asarray(batch['nlist_mask'])
        if nlist_mode == 'newton3':
            from newtonnet_tpu.ops.nlist import build_inverse_list
            inv, invm = build_inverse_list(jnp.swapaxes(idx, 1, 2),
                                           jnp.swapaxes(mask, 1, 2))
            return (idx, mask, inv, invm)
        return (idx, mask, jnp.swapaxes(idx, 1, 2),
                jnp.swapaxes(mask, 1, 2))

    abs_e = sq_e = abs_f = sq_f = 0.0
    n_graphs = n_comp = 0
    all_e, all_f = [], []
    for batch in loader:
        z = jnp.asarray(batch['z'])
        pos = jnp.asarray(batch['pos'])
        cell = jnp.asarray(batch['cell'])
        nl = batch_nlist(batch)
        es, fs = [], []
        for f, (_, params) in zip(fns, models):
            out = f(params, z, pos, cell, nlist=nl)
            es.append(np.asarray(out['energy']))
            fs.append(np.asarray(out['gradient_force']))
        e, frc = np.mean(es, axis=0), np.mean(fs, axis=0)
        gm, am = batch['graph_mask'], batch['z'] > 0
        de = (e - batch['energy'])[gm]
        df = (frc - batch['force'])[am]
        abs_e += np.abs(de).sum()
        sq_e += (de ** 2).sum()
        abs_f += np.abs(df).sum()
        sq_f += (df ** 2).sum()
        n_graphs += gm.sum()
        n_comp += 3 * am.sum()
        for i in np.nonzero(gm)[0]:
            all_e.append(float(e[i]))
            all_f.append(frc[i][am[i]])

    print(f'frames: {n_graphs}  (ensemble of {len(models)} model(s))')
    print(f'energy MAE : {abs_e / n_graphs:.6f} eV')
    print(f'energy RMSE: {np.sqrt(sq_e / n_graphs):.6f} eV')
    print(f'force  MAE : {abs_f / n_comp:.6f} eV/A')
    print(f'force  RMSE: {np.sqrt(sq_f / n_comp):.6f} eV/A')
    if args.out:
        np.savez(args.out, energy=np.asarray(all_e),
                 forces=np.concatenate(all_f))
        print(f'wrote predictions to {args.out}')


if __name__ == '__main__':
    main()
