'''Precision string -> jnp dtype map.

Mirrors the reference API `get_precision_by_string`
(reference: newtonnet/layers/precision.py:3-14), returning JAX dtypes.

Note: TPUs have no native float64; selecting 'double' flips on jax x64 mode
(slow on TPU, intended for CPU oracle runs and strict parity checks).
float32 is the recommended default on TPU; bfloat16 is offered for the
matmul-heavy compute path (the reference's 'half' means float16 on GPU).
'''
import jax
import jax.numpy as jnp

_PRECISION = {
    'float32': jnp.float32,
    'float': jnp.float32,
    'single': jnp.float32,
    'float64': jnp.float64,
    'double': jnp.float64,
    'float16': jnp.float16,
    'half': jnp.float16,
    'bfloat16': jnp.bfloat16,
    'bf16': jnp.bfloat16,
}


def get_precision_by_string(key):
    '''Get the dtype for data and model. Enables x64 when float64 requested.'''
    if key not in _PRECISION:
        raise ValueError(f'precision {key} is not supported')
    dtype = _PRECISION[key]
    if dtype == jnp.float64:
        jax.config.update('jax_enable_x64', True)
    return dtype
