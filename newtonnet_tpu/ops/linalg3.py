'''Closed-form 3x3 determinant / inverse for lattice cells.

Cells are always (..., 3, 3), so the cofactor formulas beat the general
LAPACK/LU path everywhere: no batched factorization, better fusion -- and
crucially they keep exported modules portable. On the CPU backend
`jnp.linalg.inv`/`det` lower to LAPACK *custom calls* whose function
pointers are process-local; a jax.export artifact containing one
deserializes fine but SEGFAULTS when called in a fresh process
(utils/export.py serving). The closed forms lower to plain mul/add HLO,
which serializes and replays anywhere.
'''
import jax.numpy as jnp


def det3x3(a):
    '''Determinant of (..., 3, 3) by cofactor expansion.'''
    return (
        a[..., 0, 0] * (a[..., 1, 1] * a[..., 2, 2]
                        - a[..., 1, 2] * a[..., 2, 1])
        - a[..., 0, 1] * (a[..., 1, 0] * a[..., 2, 2]
                          - a[..., 1, 2] * a[..., 2, 0])
        + a[..., 0, 2] * (a[..., 1, 0] * a[..., 2, 1]
                          - a[..., 1, 1] * a[..., 2, 0]))


def inv3x3(a):
    '''Inverse of (..., 3, 3) as adjugate / determinant.

    Singular inputs produce inf/nan entries exactly like
    `jnp.linalg.inv`; callers that may see zero cells guard the input
    (e.g. `ops/neighbors.dense_graph` substitutes the identity for
    aperiodic systems before inverting).
    '''
    m = [[a[..., i, j] for j in range(3)] for i in range(3)]
    (m00, m01, m02), (m10, m11, m12), (m20, m21, m22) = m
    c00 = m11 * m22 - m12 * m21
    c01 = m12 * m20 - m10 * m22
    c02 = m10 * m21 - m11 * m20
    c10 = m02 * m21 - m01 * m22
    c11 = m00 * m22 - m02 * m20
    c12 = m01 * m20 - m00 * m21
    c20 = m01 * m12 - m02 * m11
    c21 = m02 * m10 - m00 * m12
    c22 = m00 * m11 - m01 * m10
    det = m00 * c00 + m01 * c01 + m02 * c02
    adj = jnp.stack([
        jnp.stack([c00, c10, c20], axis=-1),
        jnp.stack([c01, c11, c21], axis=-1),
        jnp.stack([c02, c12, c22], axis=-1),
    ], axis=-2)
    return adj / det[..., None, None]
