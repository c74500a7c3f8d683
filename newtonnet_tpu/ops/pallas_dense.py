'''Pallas TPU kernels: fused dense pair-interaction layer (inference path).

The dense message-passing layer materializes several (B, N, N, F) pair
tensors in HBM per layer (message, phi1, phi2, and their backward
counterparts); PERF_NOTES.md shows the step is HBM-bound. These kernels
keep the whole pair-MLP chain VMEM-resident per molecule block: HBM sees
only the (B, N, *) node tensors, the (B, {3,R}, N, N) geometry tensors,
and the (B, *) outputs.

Layout note: the Cartesian axis is a LEADING dim everywhere (dir
(B, 3, N, N); force/eq (B, 3, N, F)) because Mosaic cannot slice the minor
dimension ("Only 2D gather is supported" for width-3 minor slices).

Scope: FIRST-ORDER only. fused_pair_interaction carries a custom VJP whose
backward is itself a Pallas kernel producing input gradients (nodepart,
rbf, dir, force_node) -- exactly what energy->force differentiation needs.
Weight gradients are NOT produced (returned as zeros), so this op is for
inference/MD serving; training uses the XLA path.

Computation (matching InteractionNet, models/newtonnet.py):
    msg  = (rbf @ We) * np_i * np_j * adj          (B, N, N, F)
    inv1 = sum_j msg                               (B, N, F)
    phi1 = (silu(msg @ W1a) @ W1b) * adj
    phi2 = (silu(msg @ W2a) @ W2b) * adj
    eq[:, d] = sum_j phi1 * dir[:, d, ..., None]
             + sum_j phi2 * force[:, d, None, :, :]
'''
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _chain(np_, rbf_flat, adj, w, dot_dtype=jnp.float32):
    '''Shared forward chain: returns (me4, msg, msg2, p1, h1, phi1, p2, h2,
    phi2) for block shapes (bb, n, n, *). dot_dtype=bfloat16 runs the MXU
    passes in bf16 (f32 accumulation) for speed.'''
    we, w1a, w1b, w2a, w2b = w
    bb, n = np_.shape[0], np_.shape[1]
    f = np_.shape[-1]

    def dot(a, b):
        return jnp.dot(a.astype(dot_dtype), b.astype(dot_dtype),
                       preferred_element_type=jnp.float32)

    me4 = dot(rbf_flat, we).reshape(bb, n, n, f)
    msg = me4 * np_[:, :, None, :] * np_[:, None, :, :] * adj
    msg2 = msg.reshape(bb * n * n, f)
    p1 = dot(msg2, w1a)
    h1 = _silu(p1)
    phi1 = (dot(h1, w1b).reshape(bb, n, n, f)) * adj
    p2 = dot(msg2, w2a)
    h2 = _silu(p2)
    phi2 = (dot(h2, w2b).reshape(bb, n, n, f)) * adj
    return me4, msg, msg2, p1, h1, phi1, p2, h2, phi2


def _fwd_kernel(np_ref, rbf_ref, dir_ref, adj_ref, force_ref,
                we_ref, w1a_ref, w1b_ref, w2a_ref, w2b_ref,
                inv1_ref, eq_ref, *, dot_dtype=jnp.float32):
    bb, n, _, r = rbf_ref.shape
    f = np_ref.shape[-1]
    w = (we_ref[:], w1a_ref[:], w1b_ref[:], w2a_ref[:], w2b_ref[:])
    adj = adj_ref[:][..., None]
    rbf_flat = rbf_ref[:].reshape(bb * n * n, r)
    _, msg, _, _, _, phi1, _, _, phi2 = _chain(np_ref[:], rbf_flat, adj, w,
                                               dot_dtype)

    inv1_ref[:] = jnp.sum(msg, axis=2)
    for d in range(3):
        dir_d = dir_ref[:, d][..., None]               # (bb, N, N, 1)
        e1 = jnp.sum(phi1 * dir_d, axis=2)             # (bb, N, F)
        fj = force_ref[:, d][:, None, :, :]            # (bb, 1, N, F)
        e2 = jnp.sum(phi2 * fj, axis=2)
        eq_ref[:, d] = e1 + e2


def _bwd_kernel(np_ref, rbf_ref, dir_ref, adj_ref, force_ref,
                we_ref, w1a_ref, w1b_ref, w2a_ref, w2b_ref,
                dinv1_ref, deq_ref,
                dnp_ref, drbf_ref, ddir_ref, dforce_ref, *,
                dot_dtype=jnp.float32):
    bb, n, _, r = rbf_ref.shape
    f = np_ref.shape[-1]
    np_ = np_ref[:]
    w = (we_ref[:], w1a_ref[:], w1b_ref[:], w2a_ref[:], w2b_ref[:])
    adj = adj_ref[:][..., None]
    rbf_flat = rbf_ref[:].reshape(bb * n * n, r)
    me4, msg, msg2, p1, h1, phi1, p2, h2, phi2 = _chain(
        np_, rbf_flat, adj, w, dot_dtype)

    dphi1 = jnp.zeros((bb, n, n, f), jnp.float32)
    dphi2 = jnp.zeros((bb, n, n, f), jnp.float32)
    for d in range(3):
        g4 = deq_ref[:, d][:, :, None, :]              # (bb, N, 1, F)
        dphi1 = dphi1 + g4 * dir_ref[:, d][..., None]
        ddir_ref[:, d] = jnp.sum(phi1 * g4, axis=-1)   # (bb, N, N)
        fj = force_ref[:, d][:, None, :, :]            # (bb, 1, N, F)
        dphi2 = dphi2 + g4 * fj
        dforce_ref[:, d] = jnp.sum(phi2 * g4, axis=1)  # (bb, N, F)

    dphi1 = (dphi1 * adj).reshape(bb * n * n, f)
    dh1 = jnp.dot(dphi1, w1b_ref[:].T, preferred_element_type=jnp.float32)
    dmsg = jnp.dot(dh1 * _dsilu(p1), w1a_ref[:].T,
                   preferred_element_type=jnp.float32)
    dphi2 = (dphi2 * adj).reshape(bb * n * n, f)
    dh2 = jnp.dot(dphi2, w2b_ref[:].T, preferred_element_type=jnp.float32)
    dmsg = dmsg + jnp.dot(dh2 * _dsilu(p2), w2a_ref[:].T,
                          preferred_element_type=jnp.float32)
    dmsg4 = (dmsg.reshape(bb, n, n, f)
             + dinv1_ref[:][:, :, None, :]) * adj

    dnp_ref[:] = (jnp.sum(dmsg4 * me4 * np_[:, None, :, :], axis=2)
                  + jnp.sum(dmsg4 * me4 * np_[:, :, None, :], axis=1))
    dme = (dmsg4 * np_[:, :, None, :] * np_[:, None, :, :]) \
        .reshape(bb * n * n, f)
    drbf_ref[:] = jnp.dot(dme, we_ref[:].T,
                          preferred_element_type=jnp.float32) \
        .reshape(bb, n, n, r)


def _specs(shapes, bb):
    return [pl.BlockSpec((bb,) + s[1:],
                         lambda i, _nd=len(s) - 1: (i,) + (0,) * _nd,
                         memory_space=pltpu.VMEM) for s in shapes]


def _weight_specs(n_weights):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weights)]


def _call_fwd(np_, rbf, dir_, adj, force, weights, bb, interpret,
              dot_dtype=jnp.float32):
    B, N, _, R = rbf.shape
    F = np_.shape[-1]
    in_shapes = [np_.shape, rbf.shape, dir_.shape, adj.shape, force.shape]
    out_shapes = [(B, N, F), (B, 3, N, F)]
    import functools
    return pl.pallas_call(
        functools.partial(_fwd_kernel, dot_dtype=dot_dtype),
        grid=(B // bb,),
        in_specs=_specs(in_shapes, bb) + _weight_specs(5),
        out_specs=tuple(_specs(out_shapes, bb)),
        out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                        for s in out_shapes),
        interpret=interpret,
    )(np_, rbf, dir_, adj, force, *weights)


def _call_bwd(np_, rbf, dir_, adj, force, weights, dinv1, deq, bb,
              interpret, dot_dtype=jnp.float32):
    B, N, _, R = rbf.shape
    in_shapes = [np_.shape, rbf.shape, dir_.shape, adj.shape, force.shape]
    cot_shapes = [dinv1.shape, deq.shape]
    out_shapes = [np_.shape, rbf.shape, dir_.shape, force.shape]
    import functools
    return pl.pallas_call(
        functools.partial(_bwd_kernel, dot_dtype=dot_dtype),
        grid=(B // bb,),
        in_specs=(_specs(in_shapes, bb) + _weight_specs(5)
                  + _specs(cot_shapes, bb)),
        out_specs=tuple(_specs(out_shapes, bb)),
        out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                        for s in out_shapes),
        interpret=interpret,
    )(np_, rbf, dir_, adj, force, *weights, dinv1, deq)


def make_fused_pair_interaction(bb=4, interpret=False,
                                dot_dtype=jnp.float32):
    '''Build the custom-VJP fused op.

    fn(np_ (B,N,F), rbf (B,N,N,R), dir (B,3,N,N), adj_f32 (B,N,N),
       force (B,3,N,F), We, W1a, W1b, W2a, W2b) -> (inv1 (B,N,F),
       eq (B,3,N,F)).
    First-order differentiable w.r.t. the five data inputs; weight
    cotangents are ZERO (inference only -- see module docstring).
    B must be divisible by bb.
    '''

    @jax.custom_vjp
    def fused(np_, rbf, dir_, adj, force, We, W1a, W1b, W2a, W2b):
        return _call_fwd(np_, rbf, dir_, adj, force,
                         (We, W1a, W1b, W2a, W2b), bb, interpret, dot_dtype)

    def fwd(np_, rbf, dir_, adj, force, We, W1a, W1b, W2a, W2b):
        out = _call_fwd(np_, rbf, dir_, adj, force,
                        (We, W1a, W1b, W2a, W2b), bb, interpret, dot_dtype)
        return out, (np_, rbf, dir_, adj, force, We, W1a, W1b, W2a, W2b)

    def bwd(res, cots):
        np_, rbf, dir_, adj, force, We, W1a, W1b, W2a, W2b = res
        dinv1, deq = cots
        dnp, drbf, ddir, dforce = _call_bwd(
            np_, rbf, dir_, adj, force, (We, W1a, W1b, W2a, W2b),
            dinv1, deq, bb, interpret, dot_dtype)
        zero = jnp.zeros_like
        return (dnp, drbf, ddir, zero(adj), dforce,
                zero(We), zero(W1a), zero(W1b), zero(W2a), zero(W2b))

    fused.defvjp(fwd, bwd)
    return fused
