#!/usr/bin/env python
'''Training CLI (reference: scripts/newtonnet_train.py).

Same YAML schema and semantics: `--config config.yml` to train from
scratch, `--resume DIR` to continue a previous training_{n} run (mutually
exclusive, ref newtonnet_train.py:42-44); the YAML sections
general/data/model/training are consumed destructively so remaining keys
pass through as kwargs.
'''
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import yaml

import jax

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


def main():
    _enable_compilation_cache()
    parser = argparse.ArgumentParser(
        description='Train NewtonNet-TPU on a given dataset.')
    parser.add_argument('-c', '--config', type=str,
                        help='The path to the Yaml configuration file.')
    parser.add_argument('-r', '--resume', type=str,
                        help='The path to the checkpoint to resume training.')
    args = parser.parse_args()

    checkpoint = args.resume
    if checkpoint is None:
        config = args.config
    else:
        assert args.config is None, \
            'Cannot resume and train from scratch at the same time.'
        configs = [f for f in os.listdir(os.path.join(checkpoint,
                                                      'run_scripts'))
                   if f.endswith(('.yaml', '.yml'))]
        assert len(configs) == 1, \
            f'Found {len(configs)} config files in {checkpoint}.'
        config = os.path.join(checkpoint, 'run_scripts', configs[0])

    settings_path = os.path.abspath(config)
    with open(settings_path) as f:
        settings = yaml.safe_load(f)
    script_path = os.path.abspath(__file__)
    output_base_path = settings['general']['output']

    wandb_kwargs = settings['training'].pop('wandb', None)
    if wandb_kwargs is not None:
        import wandb
        wandb.login()
        wandb.init(**wandb_kwargs, config=settings)

    # device / precision (general.device: cpu forces the CPU backend;
    # anything else uses the default -- TPU when present)
    from newtonnet_tpu.layers.precision import get_precision_by_string
    device = settings['general'].get('device', None)
    if device == 'cpu':
        jax.config.update('jax_platforms', 'cpu')
    # multi-process (multi-host) runs: NEWTONNET_DIST_{COORD,NPROCS,PROCID}
    # env vars (one process per host; tools/launch_distributed.py spawns a
    # local set). Must run before the first backend touch.
    from newtonnet_tpu.parallel.distributed import maybe_initialize_from_env
    if maybe_initialize_from_env():
        print(f'distributed: process {jax.process_index()}/'
              f'{jax.process_count()}, {len(jax.devices())} global devices')
    if settings['general'].get('debug_nans', False):
        # opt-in NaN checking (SURVEY.md section 5: sanitizer equivalent)
        jax.config.update('jax_debug_nans', True)
    matmul_precision = settings['general'].get('matmul_precision', None)
    if matmul_precision is not None:
        # 'highest' = full-fp32 matmul passes on TPU (the MXU's native path
        # is bf16; force-accuracy targets need the 3-pass fp32 mode)
        jax.config.update('jax_default_matmul_precision', matmul_precision)
    precision = get_precision_by_string(settings['general']['precision'])
    np_precision = np.dtype(str(np.dtype(precision)))

    from newtonnet_tpu.data import parse_train_test, set_scalers
    from newtonnet_tpu.models import NewtonNet
    from newtonnet_tpu.train import (
        Trainer,
        get_loss_by_string,
        get_optimizer_by_string,
        get_scheduler_by_string,
    )
    from newtonnet_tpu.utils.checkpoint import load_model
    from newtonnet_tpu.utils.freeze import build_freeze_mask

    seed = settings['general'].get('seed', 0)
    rng = jax.random.PRNGKey(seed)
    train_gen, val_gen, test_gen, stats = parse_train_test(
        precision=np_precision, seed=seed, **settings['data'])

    # model (pretrained warm start + freeze flags, ref newtonnet_train.py:66-85)
    pretrained_model = settings['model'].pop('pretrained_model', None)
    freeze_mask_fn = None
    example = next(iter(train_gen))
    if pretrained_model is not None:
        path = pretrained_model['path']
        if str(path).endswith('.pt'):
            # reference torch pickle (also the published ani1/ani1x/t1x zips)
            from newtonnet_tpu.utils.torch_import import load_reference_model
            model, params = load_reference_model(path)
        else:
            model, params = load_model(path)
        freeze_mask_fn = lambda params: build_freeze_mask(  # noqa: E731
            params,
            freeze_encoder=pretrained_model.get('freeze_encoder', False),
            freeze_interaction=pretrained_model.get('freeze_interaction',
                                                    False),
            freeze_decoder=pretrained_model.get('freeze_decoder', False),
            freeze_scaler=pretrained_model.get('freeze_scaler', False))
    else:
        # auto-select a STATIC ewald_mode from dataset periodicity: the
        # 'auto' default is per-graph runtime dispatch that computes BOTH
        # Ewald branches every energy evaluation (ops/ewald.py). When the
        # stats sample is homogeneous, pin the matching branch; genuinely
        # mixed datasets keep 'auto'.
        if ('charge' in settings['model'].get('output_properties', ())
                and settings['model'].get('ewald_mode', 'auto') == 'auto'
                and stats.get('periodicity') in ('periodic', 'aperiodic')):
            settings['model']['ewald_mode'] = stats['periodicity']
            print(f"ewald_mode: auto -> {stats['periodicity']} "
                  f"(from dataset periodicity)")
        model = NewtonNet(param_dtype=precision, **settings['model'])
        params = model.init(rng, example['z'], example['pos'],
                            example['cell'])

    # fit scalers (ref newtonnet_train.py:88-90)
    fit_scalers = settings['training'].pop('fit_scalers', {}) or {}
    fit_config = {key: fit_scalers.pop(key, {})
                  for key in model.output_properties}
    params = set_scalers(params, model.output_properties, stats, fit_config)

    # loss
    main_loss, eval_loss = get_loss_by_string(
        settings['training'].pop('loss', None))

    # optimizer + scheduler
    clip_grad = settings['training'].pop('clip_grad', 0.0) or 0.0
    opt_name, opt_kwargs = (settings['training']
                            .pop('optimizer', {'adam': {}})).popitem()
    freeze = freeze_mask_fn(params) if freeze_mask_fn is not None else None
    optimizer = get_optimizer_by_string(opt_name, clip_grad=clip_grad,
                                        freeze=freeze, **(opt_kwargs or {}))
    lr = (opt_kwargs or {}).get('lr', 1e-3)
    lr_scheduler_cfg = settings['training'].pop('lr_scheduler', None)
    lr_scheduler = get_scheduler_by_string(
        lr_scheduler_cfg.items() if lr_scheduler_cfg else None, lr)

    # optional data-parallel mesh over all local devices
    mesh = None
    parallel_cfg = settings['training'].pop('parallel', None)
    if parallel_cfg:
        from newtonnet_tpu.parallel import make_mesh
        mesh = make_mesh(**parallel_cfg)

    trainer = Trainer(
        model=model,
        params=params,
        loss_fns=(main_loss, eval_loss),
        optimizer=optimizer,
        lr_scheduler=lr_scheduler,
        output_base_path=output_base_path,
        script_path=script_path,
        settings_path=settings_path,
        train_generator=train_gen,
        val_generator=val_gen,
        test_generator=test_gen,
        log_wandb=wandb_kwargs is not None,
        mesh=mesh,
        **settings['training'],
    )
    if checkpoint is not None:
        trainer.resume(checkpoint)
    trainer.train()
    print('done!')


if __name__ == '__main__':
    main()
