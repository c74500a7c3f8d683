'''Checkpointing: pure pytree-of-arrays files, no pickled code.

The reference saves whole pickled nn.Modules (`torch.save(model)`,
trainer.py:219-221), which ties checkpoints to class definitions (SURVEY.md
section 5 flags this). Here a model checkpoint is
{config json, params state-dict} serialized with flax msgpack; a train-state
checkpoint additionally carries optimizer/scheduler/RNG/progress state
(mirroring trainer.py:241-251). Files are self-describing: `load_model`
rebuilds the NewtonNet object from the embedded config.
'''
import json

import jax
import numpy as np
from flax import serialization


def _to_plain(tree):
    return jax.tree.map(np.asarray, serialization.to_state_dict(tree))


def save_pytree(path, tree):
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(_to_plain(tree)))


def load_pytree(path, template=None):
    with open(path, 'rb') as f:
        state = serialization.msgpack_restore(f.read())
    if template is not None:
        return serialization.from_state_dict(template, state)
    return state


def save_model(path, model, params):
    '''Save {config, params} (the best_model.pt analogue, ref trainer.py:219).'''
    payload = {
        'config': json.dumps(model.config_dict()),
        'params': _to_plain(params),
    }
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(payload))


def load_model(path):
    '''Load a model checkpoint -> (NewtonNet, params).'''
    from newtonnet_tpu.models import NewtonNet
    with open(path, 'rb') as f:
        payload = serialization.msgpack_restore(f.read())
    config = json.loads(payload['config'])
    model = NewtonNet(**config)
    return model, {'params': payload['params']['params']}


def save_train_state(path, *, epoch, step, params, opt_state, scheduler_state,
                     best_val_loss, loader_rng_state):
    '''Full training-state checkpoint (ref trainer.py:241-251).'''
    payload = {
        'meta': json.dumps({
            'epoch': int(epoch), 'step': int(step),
            'best_val_loss': float(best_val_loss),
            'scheduler_state': scheduler_state,
            'loader_rng_state': loader_rng_state,
        }),
        'params': _to_plain(params),
        'opt_state': _to_plain(opt_state),
    }
    with open(path, 'wb') as f:
        f.write(serialization.msgpack_serialize(payload))


def load_train_state(path, params_template=None, opt_state_template=None):
    with open(path, 'rb') as f:
        payload = serialization.msgpack_restore(f.read())
    meta = json.loads(payload['meta'])
    params = payload['params']
    opt_state = payload['opt_state']
    if params_template is not None:
        params = serialization.from_state_dict(params_template, params)
    if opt_state_template is not None:
        opt_state = serialization.from_state_dict(opt_state_template,
                                                  opt_state)
    return meta, params, opt_state
