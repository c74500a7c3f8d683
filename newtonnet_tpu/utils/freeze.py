'''Per-block freeze masks for pretrained warm starts.

The reference freezes blocks by setting requires_grad=False on parameter
groups (scripts/newtonnet_train.py:66-81: encoder / interaction / decoder /
scaler). Functionally, a freeze mask is a bool pytree consumed by
optax.masked(optax.set_to_zero(), mask) -- True means frozen.
'''
import jax


def build_freeze_mask(params, freeze_encoder=False, freeze_interaction=False,
                      freeze_decoder=False, freeze_scaler=False):
    '''Map top-level parameter groups onto the reference's freeze flags.

    encoder -> node_embedding (the EmbeddingNet's only parameters),
    interaction -> interaction_* blocks, decoder -> *_head blocks,
    scaler -> scaler_* blocks.
    '''
    def block_frozen(name):
        if name == 'node_embedding':
            return freeze_encoder
        if name.startswith('interaction_'):
            return freeze_interaction
        if name.endswith('_head'):
            return freeze_decoder
        if name.startswith('scaler_'):
            return freeze_scaler
        return False

    top = params['params']
    mask_top = {
        name: jax.tree.map(lambda _: block_frozen(name), subtree)
        for name, subtree in top.items()
    }
    return {'params': mask_top}
