'''Radial edge featurization: cutoff envelopes and Bessel basis.

Pure functions over (already scaled) distances. Functional equivalents of the
reference modules (newtonnet/layers/representations.py:106-238), kept
numerically identical so per-layer parity vs the torch oracle holds:

  * scaled_norm:  dist = |disp| / r, dir = disp / |disp|      (ref :118-133)
  * polynomial_cutoff (DimeNet p=9 envelope)                  (ref :155-171)
  * cosine_cutoff (Behler)                                    (ref :190-203)
  * radial_bessel: sin(k pi d) / d, k = 1..n_basis            (ref :223-235,
    note: *no* 2/c normalization, and no epsilon guard despite the attribute)

The graph construction itself lives in newtonnet_tpu/ops/neighbors.py
(static-shape, masked — the TPU-native replacement for the reference's
dynamic-shape RadiusGraph at representations.py:46-103).
'''
import jax.numpy as jnp


def scaled_norm(disp, r, eps=1e-12):
    '''Scaled norm + unit direction of displacement vectors.

    Args:
        disp: (..., 3) displacement vectors.
        r: cutoff radius (distances are scaled into [0, 1) inside the cutoff).
        eps: guard so masked/self entries (disp == 0) stay finite and
            differentiable; real edges are unaffected (|d| >> eps).

    Returns:
        dist: (..., 1) scaled distances |disp| / r.
        dir: (..., 3) unit directions disp / |disp|.
    '''
    d2 = jnp.sum(disp * disp, axis=-1, keepdims=True)
    norm = jnp.sqrt(jnp.maximum(d2, eps))
    return norm / r, disp / norm


def polynomial_cutoff(dist, p=9):
    '''DimeNet polynomial envelope, y(0)=1, y(1)=0 (ref :166-169).'''
    xp = dist ** p
    return (
        1.0
        - 0.5 * (p + 1) * (p + 2) * xp
        + p * (p + 2) * xp * dist
        - 0.5 * p * (p + 1) * xp * dist * dist
    )


def cosine_cutoff(dist):
    '''Behler cosine envelope, y(0)=1, y(1)=0 (ref :201).'''
    return 0.5 * (jnp.cos(dist * jnp.pi) + 1.0)


def radial_bessel(dist, n_basis=20, frequencies=None):
    '''Radial Bessel basis sin(k pi d)/d for k = 1..n_basis (ref :233).

    Args:
        dist: (..., 1) scaled distances in [0, 1).
        frequencies: optional (n_basis,) frequency vector overriding the
            fixed k*pi grid -- used by the trainable_basis model option
            (the reference freezes them, ref :220 requires_grad=False;
            NewtonNet variants that train them start from the same init).

    Returns:
        (..., n_basis) basis values.
    '''
    if frequencies is None:
        frequencies = jnp.arange(1, n_basis + 1, dtype=dist.dtype) * jnp.pi
    return jnp.sin(frequencies.astype(dist.dtype) * dist) / dist
