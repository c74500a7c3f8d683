#!/usr/bin/env python
'''Export a trained checkpoint to a self-contained serving artifact.

    python scripts/export_model.py --checkpoint best_model.msgpack \
        --n-atoms 21 --out aspirin_serving.npz [--batch 1] \
        [--properties energy gradient_force] [--platforms cpu tpu] \
        [--dtype float32]

The artifact replays on any machine with jax (and one of the lowered
platforms) via newtonnet_tpu.utils.export.ServedModel -- no model code,
no checkpoint, no retracing. See utils/export.py.
'''
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('--checkpoint', required=True,
                    help='.msgpack checkpoint (or reference .pt)')
    ap.add_argument('--n-atoms', type=int, required=True,
                    help='max atoms the artifact serves (padded to x8)')
    ap.add_argument('--out', required=True, help='output .npz artifact')
    ap.add_argument('--batch', type=int, default=1)
    ap.add_argument('--properties', nargs='*', default=None,
                    help='model output names (default: all trained heads)')
    ap.add_argument('--platforms', nargs='*', default=None,
                    help='lowering platforms, e.g. cpu tpu '
                         '(default: current backend)')
    ap.add_argument('--dtype', default='float32')
    ap.add_argument('--matmul-precision', default='highest')
    ap.add_argument('--device', default=None,
                    help="pin the jax backend (the axon plugin ignores the "
                         "JAX_PLATFORMS env var, so use '--device cpu' to "
                         "export CPU artifacts on a TPU box)")
    ap.add_argument('--periodic', action='store_true', default=None,
                    help="statically resolve a charge-head model's "
                         "ewald_mode='auto' to the periodic branch "
                         "(single-branch artifact)")
    ap.add_argument('--aperiodic', dest='periodic', action='store_false',
                    help='resolve to the aperiodic branch instead')
    args = ap.parse_args(argv)

    if args.device:
        import jax
        jax.config.update('jax_platforms', args.device)

    from newtonnet_tpu.utils.export import (export_inference,
                                            save_serving_artifact)
    if args.checkpoint.endswith('.pt'):
        from newtonnet_tpu.utils.torch_import import load_reference_model
        model, params = load_reference_model(args.checkpoint)
    else:
        from newtonnet_tpu.utils.checkpoint import load_model
        model, params = load_model(args.checkpoint)

    header, blob = export_inference(
        model, params, n_atoms=args.n_atoms, batch_size=args.batch,
        properties=args.properties, dtype=args.dtype,
        matmul_precision=args.matmul_precision, platforms=args.platforms,
        periodic=args.periodic)
    save_serving_artifact(args.out, header, blob)
    print(f'wrote {args.out}: {os.path.getsize(args.out)} bytes, '
          f'B={header["batch_size"]} n_pad={header["n_pad"]} '
          f'platforms={header["platforms"]} '
          f'properties={header["properties"]}')


if __name__ == '__main__':
    main()
