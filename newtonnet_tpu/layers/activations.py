'''Activation registry.

Mirrors the reference's string factory (newtonnet/layers/activations.py:5-63)
with plain JAX functions. All activations are elementwise VPU ops that XLA
fuses into the surrounding matmuls.

SwiGLU in the reference is a *parametric* module (two Linear layers,
activations.py:49-63); it is unreachable through `get_activation_by_string`
there because the factory calls `SwiGLU()` with no features (a latent bug).
Here `swiglu` maps to a non-parametric gated split (x1 * silu(x2) over a
feature split), documented as a fix of that reference quirk.
'''
import math

import jax
import jax.numpy as jnp

_LOG2 = math.log(2.0)


def shifted_softplus(x):
    # y = softplus(x) - ln 2   (reference: activations.py:33-47)
    return jax.nn.softplus(x) - _LOG2


def swiglu(x):
    # Non-parametric gated variant over a channel split (see module docstring).
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jax.nn.silu(x1) * x2


_ACTIVATIONS = {
    'swish': jax.nn.silu,
    'silu': jax.nn.silu,
    'relu': jax.nn.relu,
    'elu': jax.nn.elu,
    'leaky_relu': lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
    'tanh': jnp.tanh,
    'sigmoid': jax.nn.sigmoid,
    'softplus': jax.nn.softplus,
    'gelu': jax.nn.gelu,
    'ssp': shifted_softplus,
    'swiglu': swiglu,
}


def get_activation_by_string(key):
    if key not in _ACTIVATIONS:
        raise NotImplementedError(f"The activation function '{key}' is unknown.")
    return _ACTIVATIONS[key]
