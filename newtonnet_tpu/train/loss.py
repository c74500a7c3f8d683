'''Loss system (reference: newtonnet/train/loss.py).

`get_loss_by_string(losses)` returns (main_loss, eval_loss):
  * main_loss(preds, batch) -> scalar weighted sum for backprop,
  * eval_loss(preds, batch) -> dict of the fixed evaluation battery
    (mae/mse, energy-per-atom, and cos/norm transforms for direct force),
exactly the reference's construction (ref loss.py:5-50), but as pure
functions over PADDED batches: every mean is masked so padding atoms and
padding graphs contribute nothing. Batches carry 'graph_mask' (B,) and
z=0 atom padding.
'''
import jax.numpy as jnp


def _masked_mean(err, mask):
    '''Mean of err over entries where mask is True (broadcast over trailing
    dims of err, which all count -- matching torch's elementwise reductions).'''
    mask = mask.astype(err.dtype)
    extra = 1
    for d in err.shape[mask.ndim:]:
        extra *= d
    total = jnp.sum(err * mask.reshape(mask.shape + (1,) * (err.ndim - mask.ndim)))
    count = jnp.sum(mask) * extra
    return total / jnp.maximum(count, 1.0)


def _elementwise(mode, pred, ref, delta=1.0):
    diff = pred - ref
    if mode == 'mse':
        return diff * diff
    if mode == 'mae':
        return jnp.abs(diff)
    if mode == 'huber':
        a = jnp.abs(diff)
        return jnp.where(a <= delta, 0.5 * diff * diff,
                         delta * (a - 0.5 * delta))
    raise ValueError(f'loss mode {mode} not implemented')


def _n_atoms(batch):
    return jnp.sum(batch['z'] > 0, axis=-1)  # (B,)


def _energy_loss(mode, per_atom=False, weight=1.0, **kw):
    def fn(preds, batch):
        pred, ref = preds['energy'], batch['energy']
        if per_atom:
            n = jnp.maximum(_n_atoms(batch), 1).astype(pred.dtype)
            pred, ref = pred / n, ref / n  # ref loss.py:126-127
        err = _elementwise(mode, pred, ref, **kw)
        return weight * _masked_mean(err, batch['graph_mask'])
    return fn


def _force_loss(key, mode, transform=None, weight=1.0, **kw):
    def fn(preds, batch):
        pred, ref = preds[key], batch['force']  # (B, N, 3)
        atom_mask = batch['z'] > 0
        if transform == 'cos':
            # 1 vs cosine similarity (ref loss.py:82-84)
            dot = jnp.sum(pred * ref, axis=-1)
            norm = (jnp.linalg.norm(pred, axis=-1)
                    * jnp.linalg.norm(ref, axis=-1))
            cos = dot / jnp.maximum(norm, 1e-8)
            err = _elementwise(mode, cos, jnp.ones_like(cos), **kw)
        elif transform == 'norm':
            err = _elementwise(mode, jnp.linalg.norm(pred, axis=-1),
                               jnp.linalg.norm(ref, axis=-1), **kw)
        elif transform is None:
            err = _elementwise(mode, pred, ref, **kw)
        else:
            raise ValueError(f'transform {transform} not implemented')
        return weight * _masked_mean(err, atom_mask)
    return fn


def _graph_tensor_loss(key, mode, weight=1.0, **kw):
    '''Per-graph tensor labels (stress/virial: (B, 3, 3)), masked over
    padding graphs. The reference has no stress/virial loss (its loss.py
    stops at forces); cell-labeled condensed-phase training needs one, so
    this extends the same construction.'''
    def fn(preds, batch):
        err = _elementwise(mode, preds[key], batch[key], **kw)
        return weight * _masked_mean(err, batch['graph_mask'])
    return fn


def get_loss_by_string(losses):
    '''Build (main_loss, eval_loss) from the config dict (ref loss.py:5-50).

    losses: {'energy': {'weight':..,'mode':..}, 'gradient_force': {...},
             'direct_force': {...}, 'stress': {...}, 'virial': {...}}
    '''
    if losses is None:
        raise AssertionError('losses is not defined.')
    main, evals = [], {}
    for key, kwargs in losses.items():
        kwargs = dict(kwargs or {})
        mode = kwargs.pop('mode', 'mse')
        weight = kwargs.pop('weight', 1.0)
        if key == 'energy':
            main.append(_energy_loss(mode, weight=weight, **kwargs))
            evals['energy_mae'] = _energy_loss('mae')
            evals['energy_mse'] = _energy_loss('mse')
            evals['energy_per_atom_mae'] = _energy_loss('mae', per_atom=True)
            evals['energy_per_atom_mse'] = _energy_loss('mse', per_atom=True)
        elif key == 'gradient_force':
            main.append(_force_loss(key, mode, weight=weight, **kwargs))
            evals['gradient_force_mae'] = _force_loss(key, 'mae')
            evals['gradient_force_mse'] = _force_loss(key, 'mse')
        elif key == 'direct_force':
            main.append(_force_loss(key, mode, weight=weight, **kwargs))
            evals['direct_force_mae'] = _force_loss(key, 'mae')
            evals['direct_force_mse'] = _force_loss(key, 'mse')
            evals['direct_force_cos_mae'] = _force_loss(key, 'mae', 'cos')
            evals['direct_force_cos_mse'] = _force_loss(key, 'mse', 'cos')
            evals['direct_force_norm_mae'] = _force_loss(key, 'mae', 'norm')
            evals['direct_force_norm_mse'] = _force_loss(key, 'mse', 'norm')
        elif key in ('stress', 'virial'):
            main.append(_graph_tensor_loss(key, mode, weight=weight,
                                           **kwargs))
            evals[f'{key}_mae'] = _graph_tensor_loss(key, 'mae')
            evals[f'{key}_mse'] = _graph_tensor_loss(key, 'mse')
        else:
            raise NotImplementedError(f'loss for {key} is not implemented')

    def main_loss(preds, batch):
        return sum(fn(preds, batch) for fn in main)

    # which prediction keys the training loss reads -- lets the trainer
    # decide whether the first-order fastgrad path (train/fastgrad.py) is
    # applicable to this loss configuration
    main_loss.keys = frozenset(losses)
    # the raw config (weights/modes) -- the halo-parallel trainer path
    # rebuilds this loss inside shard_map and needs the numbers
    main_loss.config = {k: dict(v or {}) for k, v in losses.items()}

    def eval_loss(preds, batch):
        return {name: fn(preds, batch) for name, fn in evals.items()}

    return main_loss, eval_loss
