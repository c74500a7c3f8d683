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

Two ops, both with single-fused-kernel custom VJPs:

* make_fused_pair_interaction: the primal layer. Its backward kernel
  produces ALL first-order cotangents -- inputs (nodepart, rbf, dir,
  force_node) and the five weight matrices. This serves inference/MD
  (forces via grad-wrt-positions) and energy-only training.
* make_fused_pair_interaction_dual: the layer's jvp (primal + position
  tangent) with a custom VJP. Force training restructured as
  grad-of-a-jvp-surrogate (train/fastgrad.py) makes every AD pass first
  order, so these two kernels are the complete training hot path -- no
  second-order AD ever touches the pair tensors.

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


def _chain(np_, rbf_flat, adj, w, dot_dtype=jnp.float32, first_layer=False):
    '''Shared forward chain: returns (me4, msg, msg2, p1, h1, phi1, p2, h2,
    phi2) for block shapes (bb, n, n, *). dot_dtype=bfloat16 runs the MXU
    passes in bf16 (f32 accumulation) for speed. first_layer=True skips the
    phi2 branch (its only consumer multiplies the stack's zero-initialized
    force_node, matching InteractionNet's first_layer shortcut) and returns
    None for its intermediates.'''
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
    if first_layer:
        return me4, msg, msg2, p1, h1, phi1, None, None, None
    p2 = dot(msg2, w2a)
    h2 = _silu(p2)
    phi2 = (dot(h2, w2b).reshape(bb, n, n, f)) * adj
    return me4, msg, msg2, p1, h1, phi1, p2, h2, phi2


def _fwd_kernel(np_ref, rbf_ref, dir_ref, adj_ref, force_ref,
                we_ref, w1a_ref, w1b_ref, w2a_ref, w2b_ref,
                inv1_ref, eq_ref, *, dot_dtype=jnp.float32,
                first_layer=False):
    bb, n, _, r = rbf_ref.shape
    f = np_ref.shape[-1]
    w = (we_ref[:], w1a_ref[:], w1b_ref[:], w2a_ref[:], w2b_ref[:])
    adj = adj_ref[:][..., None]
    rbf_flat = rbf_ref[:].reshape(bb * n * n, r)
    _, msg, _, _, _, phi1, _, _, phi2 = _chain(np_ref[:], rbf_flat, adj, w,
                                               dot_dtype, first_layer)

    inv1_ref[:] = jnp.sum(msg, axis=2)
    for d in range(3):
        dir_d = dir_ref[:, d][..., None]               # (bb, N, N, 1)
        e1 = jnp.sum(phi1 * dir_d, axis=2)             # (bb, N, F)
        if first_layer:
            eq_ref[:, d] = e1
            continue
        fj = force_ref[:, d][:, None, :, :]            # (bb, 1, N, F)
        e2 = jnp.sum(phi2 * fj, axis=2)
        eq_ref[:, d] = e1 + e2


def _bwd_kernel(np_ref, rbf_ref, dir_ref, adj_ref, force_ref,
                we_ref, w1a_ref, w1b_ref, w2a_ref, w2b_ref,
                dinv1_ref, deq_ref,
                dnp_ref, drbf_ref, ddir_ref, dforce_ref,
                dwe_ref, dw1a_ref, dw1b_ref, dw2a_ref, dw2b_ref, *,
                dot_dtype=jnp.float32, first_layer=False):
    bb, n, _, r = rbf_ref.shape
    f = np_ref.shape[-1]
    np_ = np_ref[:]
    w = (we_ref[:], w1a_ref[:], w1b_ref[:], w2a_ref[:], w2b_ref[:])
    adj = adj_ref[:][..., None]
    rbf_flat = rbf_ref[:].reshape(bb * n * n, r)
    me4, msg, msg2, p1, h1, phi1, p2, h2, phi2 = _chain(
        np_, rbf_flat, adj, w, dot_dtype, first_layer)

    def dotT(a, b):
        # a^T @ b contracting the long (pair-slot) axis
        return jax.lax.dot_general(
            a.astype(dot_dtype), b.astype(dot_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dphi1 = jnp.zeros((bb, n, n, f), jnp.float32)
    dphi2 = None if first_layer else jnp.zeros((bb, n, n, f), jnp.float32)
    for d in range(3):
        g4 = deq_ref[:, d][:, :, None, :]              # (bb, N, 1, F)
        dphi1 = dphi1 + g4 * dir_ref[:, d][..., None]
        ddir_ref[:, d] = jnp.sum(phi1 * g4, axis=-1)   # (bb, N, N)
        if first_layer:
            # force_node is the stack's zeros init: phi2 is skipped and
            # the force cotangent is discarded by the caller
            dforce_ref[:, d] = jnp.zeros((bb, n, f), jnp.float32)
            continue
        fj = force_ref[:, d][:, None, :, :]            # (bb, 1, N, F)
        dphi2 = dphi2 + g4 * fj
        dforce_ref[:, d] = jnp.sum(phi2 * g4, axis=1)  # (bb, N, F)

    first = pl.program_id(0) == 0

    dphi1 = (dphi1 * adj).reshape(bb * n * n, f)
    dh1 = jnp.dot(dphi1, w1b_ref[:].T, preferred_element_type=jnp.float32)
    dp1 = dh1 * _dsilu(p1)
    dmsg = jnp.dot(dp1, w1a_ref[:].T, preferred_element_type=jnp.float32)
    if not first_layer:
        dphi2 = (dphi2 * adj).reshape(bb * n * n, f)
        dh2 = jnp.dot(dphi2, w2b_ref[:].T,
                      preferred_element_type=jnp.float32)
        dp2 = dh2 * _dsilu(p2)
        dmsg = dmsg + jnp.dot(dp2, w2a_ref[:].T,
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

    # weight cotangents, accumulated across the sequential molecule grid
    @pl.when(first)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        dw1a_ref[:] = jnp.zeros_like(dw1a_ref)
        dw1b_ref[:] = jnp.zeros_like(dw1b_ref)
        dw2a_ref[:] = jnp.zeros_like(dw2a_ref)
        dw2b_ref[:] = jnp.zeros_like(dw2b_ref)
    dwe_ref[:] += dotT(rbf_flat, dme)
    dw1a_ref[:] += dotT(msg2, dp1)
    dw1b_ref[:] += dotT(h1, dphi1)
    if not first_layer:
        dw2a_ref[:] += dotT(msg2, dp2)
        dw2b_ref[:] += dotT(h2, dphi2)


# Mosaic's default scoped-VMEM cap is 16 MiB; the fused backward/dual
# kernels keep the whole pair-MLP chain resident and legitimately use more
# (v5e has 128 MiB VMEM/core). Block sizes (pick_bb) are chosen to fit
# under this raised cap.
_VMEM_LIMIT = 100 * 1024 * 1024


def _params(interpret):
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT)


def _specs(shapes, bb):
    return [pl.BlockSpec((bb,) + s[1:],
                         lambda i, _nd=len(s) - 1: (i,) + (0,) * _nd,
                         memory_space=pltpu.VMEM) for s in shapes]


def _weight_specs(n_weights):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_weights)]


def _call_fwd(np_, rbf, dir_, adj, force, weights, bb, interpret,
              dot_dtype=jnp.float32, first_layer=False):
    B, N, _, R = rbf.shape
    F = np_.shape[-1]
    in_shapes = [np_.shape, rbf.shape, dir_.shape, adj.shape, force.shape]
    out_shapes = [(B, N, F), (B, 3, N, F)]
    import functools
    return pl.pallas_call(
        functools.partial(_fwd_kernel, dot_dtype=dot_dtype,
                          first_layer=first_layer),
        grid=(B // bb,),
        in_specs=_specs(in_shapes, bb) + _weight_specs(5),
        out_specs=tuple(_specs(out_shapes, bb)),
        out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                        for s in out_shapes),
        interpret=interpret,
        compiler_params=_params(interpret),
    )(np_, rbf, dir_, adj, force, *weights)


def _call_bwd(np_, rbf, dir_, adj, force, weights, dinv1, deq, bb,
              interpret, dot_dtype=jnp.float32, first_layer=False):
    B, N, _, R = rbf.shape
    in_shapes = [np_.shape, rbf.shape, dir_.shape, adj.shape, force.shape]
    cot_shapes = [dinv1.shape, deq.shape]
    out_shapes = [np_.shape, rbf.shape, dir_.shape, force.shape]
    w_shapes = [w.shape for w in weights]
    w_out_specs = [pl.BlockSpec(s, lambda i, _nd=len(s): (0,) * _nd,
                                memory_space=pltpu.VMEM) for s in w_shapes]
    import functools
    return pl.pallas_call(
        functools.partial(_bwd_kernel, dot_dtype=dot_dtype,
                          first_layer=first_layer),
        grid=(B // bb,),
        in_specs=(_specs(in_shapes, bb) + _weight_specs(5)
                  + _specs(cot_shapes, bb)),
        out_specs=tuple(_specs(out_shapes, bb)) + tuple(w_out_specs),
        out_shape=(tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                         for s in out_shapes)
                   + tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                           for s in w_shapes)),
        interpret=interpret,
        compiler_params=_params(interpret),
    )(np_, rbf, dir_, adj, force, *weights, dinv1, deq)


def _d2silu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 - s) * (2.0 + x * (1.0 - 2.0 * s))


def _dual_chain(np_, npdot, rbf_flat, rbfdot_flat, adj, w,
                dot_dtype=jnp.float32, first_layer=False):
    '''Primal + tangent (dual-number) pair chain, all VMEM-resident.

    Weights carry no tangent (the dual pass propagates a *position*
    tangent; see train/fastgrad.py). Returns every intermediate both the
    dual-forward and its reverse need. first_layer=True: force_node AND
    the node tangents are identically zero at the stack's first layer
    (zeros init), so the phi2 branch and the np-tangent terms of msgdot
    vanish -- skip their compute (b2 returned as Nones).
    '''
    we, w1a, w1b, w2a, w2b = w
    bb, n = np_.shape[0], np_.shape[1]
    f = np_.shape[-1]

    def dot(a, b):
        return jnp.dot(a.astype(dot_dtype), b.astype(dot_dtype),
                       preferred_element_type=jnp.float32)

    ai = np_[:, :, None, :]
    aj = np_[:, None, :, :]
    me = dot(rbf_flat, we).reshape(bb, n, n, f)
    medot = dot(rbfdot_flat, we).reshape(bb, n, n, f)
    msg = me * ai * aj * adj
    if first_layer:
        msgdot = medot * ai * aj * adj
    else:
        aidot = npdot[:, :, None, :]
        ajdot = npdot[:, None, :, :]
        msgdot = (medot * ai * aj + me * aidot * aj + me * ai * ajdot) * adj
    msg2 = msg.reshape(bb * n * n, f)
    msgdot2 = msgdot.reshape(bb * n * n, f)

    def branch(w_a, w_b):
        p = dot(msg2, w_a)
        pdot = dot(msgdot2, w_a)
        h = _silu(p)
        hdot = _dsilu(p) * pdot
        phi = dot(h, w_b).reshape(bb, n, n, f) * adj
        phidot = dot(hdot, w_b).reshape(bb, n, n, f) * adj
        return p, pdot, h, hdot, phi, phidot

    b1 = branch(w1a, w1b)
    b2 = (None,) * 6 if first_layer else branch(w2a, w2b)
    return (me, medot, msg, msgdot, msg2, msgdot2, b1, b2)


def _dual_fwd_kernel(np_ref, npdot_ref, rbf_ref, rbfdot_ref,
                     dir_ref, dirdot_ref, adj_ref,
                     force_ref, forcedot_ref,
                     we_ref, w1a_ref, w1b_ref, w2a_ref, w2b_ref,
                     inv1_ref, eq_ref, inv1dot_ref, eqdot_ref, *,
                     dot_dtype=jnp.float32, first_layer=False):
    bb, n, _, r = rbf_ref.shape
    w = (we_ref[:], w1a_ref[:], w1b_ref[:], w2a_ref[:], w2b_ref[:])
    adj = adj_ref[:][..., None]
    e = bb * n * n
    (_, _, msg, msgdot, _, _,
     (_, _, _, _, phi1, phi1dot),
     (_, _, _, _, phi2, phi2dot)) = _dual_chain(
        np_ref[:], npdot_ref[:], rbf_ref[:].reshape(e, r),
        rbfdot_ref[:].reshape(e, r), adj, w, dot_dtype, first_layer)

    inv1_ref[:] = jnp.sum(msg, axis=2)
    inv1dot_ref[:] = jnp.sum(msgdot, axis=2)
    for d in range(3):
        dir_d = dir_ref[:, d][..., None]               # (bb, N, N, 1)
        dirdot_d = dirdot_ref[:, d][..., None]
        if first_layer:
            eq_ref[:, d] = jnp.sum(phi1 * dir_d, axis=2)
            eqdot_ref[:, d] = jnp.sum(phi1dot * dir_d + phi1 * dirdot_d,
                                      axis=2)
            continue
        fj = force_ref[:, d][:, None, :, :]            # (bb, 1, N, F)
        fjdot = forcedot_ref[:, d][:, None, :, :]
        eq_ref[:, d] = (jnp.sum(phi1 * dir_d, axis=2)
                        + jnp.sum(phi2 * fj, axis=2))
        eqdot_ref[:, d] = (jnp.sum(phi1dot * dir_d + phi1 * dirdot_d,
                                   axis=2)
                           + jnp.sum(phi2dot * fj + phi2 * fjdot, axis=2))


def _dual_bwd_kernel(np_ref, npdot_ref, rbf_ref, rbfdot_ref,
                     dir_ref, dirdot_ref, adj_ref,
                     force_ref, forcedot_ref,
                     we_ref, w1a_ref, w1b_ref, w2a_ref, w2b_ref,
                     di_ref, dq_ref, didot_ref, dqdot_ref,
                     dnp_ref, dnpdot_ref, dforce_ref, dforcedot_ref,
                     dwe_ref, dw1a_ref, dw1b_ref, dw2a_ref, dw2b_ref, *,
                     dot_dtype=jnp.float32, first_layer=False):
    '''Reverse of the dual forward: cotangents for the theta-dependent
    inputs (nodepart, force_node and their tangents) and for all five
    weight matrices. rbf/dir cotangents are intentionally NOT produced --
    this op backs the parameter-gradient surrogate only (fastgrad).

    Weight cotangents accumulate across the (sequential) molecule-block
    grid: zero-initialized on the first grid step.

    first_layer=True: the stack feeds zeros for force/forcedot/npdot at
    layer 0, so the phi2 branch and all np-tangent terms vanish; their
    cotangents (dforce/dforcedot/dnpdot, dw2a/dw2b) are exact zeros (the
    surrogate's dependence through those inputs is identically zero).
    '''
    bb, n, _, r = rbf_ref.shape
    f = np_ref.shape[-1]
    e = bb * n * n
    np_, npdot = np_ref[:], npdot_ref[:]
    w = (we_ref[:], w1a_ref[:], w1b_ref[:], w2a_ref[:], w2b_ref[:])
    we, w1a, w1b, w2a, w2b = w
    adj = adj_ref[:][..., None]
    rbf_flat = rbf_ref[:].reshape(e, r)
    rbfdot_flat = rbfdot_ref[:].reshape(e, r)
    (me, medot, msg, msgdot, msg2, msgdot2,
     (p1, p1dot, h1, h1dot, phi1, phi1dot),
     (p2, p2dot, h2, h2dot, phi2, phi2dot)) = _dual_chain(
        np_, npdot, rbf_flat, rbfdot_flat, adj, w, dot_dtype, first_layer)

    def dot(a, b):
        return jnp.dot(a.astype(dot_dtype), b.astype(dot_dtype),
                       preferred_element_type=jnp.float32)

    def dotT(a, b):
        # a^T @ b contracting the long (pair-slot) axis
        return jax.lax.dot_general(
            a.astype(dot_dtype), b.astype(dot_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dphi1 = jnp.zeros((bb, n, n, f), jnp.float32)
    dphi1dot = jnp.zeros((bb, n, n, f), jnp.float32)
    dphi2 = dphi2dot = None
    if not first_layer:
        dphi2 = jnp.zeros((bb, n, n, f), jnp.float32)
        dphi2dot = jnp.zeros((bb, n, n, f), jnp.float32)
    for d in range(3):
        dq = dq_ref[:, d][:, :, None, :]               # (bb, N, 1, F)
        dqdot = dqdot_ref[:, d][:, :, None, :]
        dir_d = dir_ref[:, d][..., None]
        dirdot_d = dirdot_ref[:, d][..., None]
        dphi1 = dphi1 + dq * dir_d + dqdot * dirdot_d
        dphi1dot = dphi1dot + dqdot * dir_d
        if first_layer:
            dforce_ref[:, d] = jnp.zeros((bb, n, f), jnp.float32)
            dforcedot_ref[:, d] = jnp.zeros((bb, n, f), jnp.float32)
            continue
        fj = force_ref[:, d][:, None, :, :]
        fjdot = forcedot_ref[:, d][:, None, :, :]
        dphi2 = dphi2 + dq * fj + dqdot * fjdot
        dphi2dot = dphi2dot + dqdot * fj
        dforce_ref[:, d] = jnp.sum(phi2 * dq + phi2dot * dqdot, axis=1)
        dforcedot_ref[:, d] = jnp.sum(phi2 * dqdot, axis=1)

    first = pl.program_id(0) == 0

    def backprop_branch(dphi, dphidot, p, pdot, h, hdot, w_a, w_b,
                        dwa_ref, dwb_ref):
        g = (dphi * adj).reshape(e, f)
        gdot = (dphidot * adj).reshape(e, f)
        dh = dot(g, w_b.T)
        dhdot = dot(gdot, w_b.T)
        dwb = dotT(h, g) + dotT(hdot, gdot)
        dp = _dsilu(p) * dh + _d2silu(p) * pdot * dhdot
        dpdot = _dsilu(p) * dhdot
        dmsg = dot(dp, w_a.T)
        dmsgdot = dot(dpdot, w_a.T)
        dwa = dotT(msg2, dp) + dotT(msgdot2, dpdot)

        @pl.when(first)
        def _():
            dwa_ref[:] = jnp.zeros_like(dwa_ref)
            dwb_ref[:] = jnp.zeros_like(dwb_ref)
        dwa_ref[:] += dwa
        dwb_ref[:] += dwb
        return dmsg, dmsgdot

    dmsg_a, dmsgdot_a = backprop_branch(dphi1, dphi1dot, p1, p1dot, h1,
                                        h1dot, w1a, w1b, dw1a_ref, dw1b_ref)
    if first_layer:
        @pl.when(first)
        def _():
            dw2a_ref[:] = jnp.zeros_like(dw2a_ref)
            dw2b_ref[:] = jnp.zeros_like(dw2b_ref)
        dmsg = dmsg_a.reshape(bb, n, n, f) + di_ref[:][:, :, None, :]
        dmsgdot = (dmsgdot_a.reshape(bb, n, n, f)
                   + didot_ref[:][:, :, None, :])
    else:
        dmsg_b, dmsgdot_b = backprop_branch(dphi2, dphi2dot, p2, p2dot, h2,
                                            h2dot, w2a, w2b, dw2a_ref,
                                            dw2b_ref)
        dmsg = (dmsg_a + dmsg_b).reshape(bb, n, n, f) \
            + di_ref[:][:, :, None, :]
        dmsgdot = (dmsgdot_a + dmsgdot_b).reshape(bb, n, n, f) \
            + didot_ref[:][:, :, None, :]

    ai = np_[:, :, None, :]
    aj = np_[:, None, :, :]
    t = dmsg * adj
    tdot = dmsgdot * adj
    if first_layer:
        # npdot == 0: its tangent terms vanish, and dnpdot's downstream
        # consumers are exactly zero (see docstring) -- write zeros
        dme = t * ai * aj
        dmedot = tdot * ai * aj
        dnp_ref[:] = (jnp.sum(t * me * aj + tdot * medot * aj, axis=2)
                      + jnp.sum(t * me * ai + tdot * medot * ai, axis=1))
        dnpdot_ref[:] = jnp.zeros((bb, n, f), jnp.float32)
    else:
        aidot = npdot[:, :, None, :]
        ajdot = npdot[:, None, :, :]
        dme = t * ai * aj + tdot * (aidot * aj + ai * ajdot)
        dmedot = tdot * ai * aj
        dnp_ref[:] = (
            jnp.sum(t * me * aj + tdot * (medot * aj + me * ajdot), axis=2)
            + jnp.sum(t * me * ai + tdot * (medot * ai + me * aidot),
                      axis=1))
        dnpdot_ref[:] = (jnp.sum(tdot * me * aj, axis=2)
                         + jnp.sum(tdot * me * ai, axis=1))

    dwe = dotT(rbf_flat, dme.reshape(e, f)) \
        + dotT(rbfdot_flat, dmedot.reshape(e, f))

    @pl.when(first)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
    dwe_ref[:] += dwe


def _call_dual_fwd(args, weights, bb, interpret, dot_dtype=jnp.float32,
                   first_layer=False):
    np_, npdot, rbf, rbfdot, dir_, dirdot, adj, force, forcedot = args
    B, N, _, R = rbf.shape
    F = np_.shape[-1]
    in_shapes = [a.shape for a in args]
    out_shapes = [(B, N, F), (B, 3, N, F), (B, N, F), (B, 3, N, F)]
    import functools
    return pl.pallas_call(
        functools.partial(_dual_fwd_kernel, dot_dtype=dot_dtype,
                          first_layer=first_layer),
        grid=(B // bb,),
        in_specs=_specs(in_shapes, bb) + _weight_specs(5),
        out_specs=tuple(_specs(out_shapes, bb)),
        out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                        for s in out_shapes),
        interpret=interpret,
        compiler_params=_params(interpret),
    )(*args, *weights)


def _call_dual_bwd(args, weights, cots, bb, interpret,
                   dot_dtype=jnp.float32, first_layer=False):
    np_, npdot, rbf, rbfdot, dir_, dirdot, adj, force, forcedot = args
    B, N, _, R = rbf.shape
    F = np_.shape[-1]
    in_shapes = [a.shape for a in args]
    cot_shapes = [c.shape for c in cots]
    out_shapes = [np_.shape, npdot.shape, force.shape, forcedot.shape]
    w_shapes = [w.shape for w in weights]
    import functools
    # weight-grad outputs accumulate across grid steps: every step maps to
    # the same (zero-offset) block
    w_out_specs = [pl.BlockSpec(s, lambda i, _nd=len(s): (0,) * _nd,
                                memory_space=pltpu.VMEM) for s in w_shapes]
    return pl.pallas_call(
        functools.partial(_dual_bwd_kernel, dot_dtype=dot_dtype,
                          first_layer=first_layer),
        grid=(B // bb,),
        in_specs=(_specs(in_shapes, bb) + _weight_specs(5)
                  + _specs(cot_shapes, bb)),
        out_specs=tuple(_specs(out_shapes, bb)) + tuple(w_out_specs),
        out_shape=(tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                         for s in out_shapes)
                   + tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                           for s in w_shapes)),
        interpret=interpret,
        compiler_params=_params(interpret),
    )(*args, *weights, *cots)


def make_fused_pair_interaction_dual(bb=4, interpret=False,
                                     dot_dtype=jnp.float32,
                                     first_layer=False):
    '''Fused dual (primal + position-tangent) pair-interaction op.

    fn(np_, npdot (B,N,F), rbf, rbfdot (B,N,N,R), dir, dirdot (B,3,N,N),
       adj_f32 (B,N,N), force, forcedot (B,3,N,F), We, W1a, W1b, W2a, W2b)
       -> (inv1 (B,N,F), eq (B,3,N,F), inv1dot (B,N,F), eqdot (B,3,N,F)).

    Every AD pass of force training is first order once the parameter
    gradient is restructured as grad of a jvp surrogate (train/fastgrad.py):
    this op IS that jvp for the pair-interaction layer, and its custom VJP
    (one fused kernel) produces the weight cotangents plus the cotangents
    of the theta-dependent inputs. Cotangents for rbf/dir (and their
    tangents) are ZERO by design -- the surrogate differentiates with
    respect to parameters only; do not use this op under grad-wrt-positions.
    B must be divisible by bb.
    '''

    @jax.custom_vjp
    def fused(np_, npdot, rbf, rbfdot, dir_, dirdot, adj, force, forcedot,
              We, W1a, W1b, W2a, W2b):
        return _call_dual_fwd(
            (np_, npdot, rbf, rbfdot, dir_, dirdot, adj, force, forcedot),
            (We, W1a, W1b, W2a, W2b), bb, interpret, dot_dtype,
            first_layer)

    def fwd(np_, npdot, rbf, rbfdot, dir_, dirdot, adj, force, forcedot,
            We, W1a, W1b, W2a, W2b):
        args = (np_, npdot, rbf, rbfdot, dir_, dirdot, adj, force, forcedot)
        weights = (We, W1a, W1b, W2a, W2b)
        return (_call_dual_fwd(args, weights, bb, interpret, dot_dtype,
                               first_layer),
                (args, weights))

    def bwd(res, cots):
        args, weights = res
        dnp, dnpdot, dforce, dforcedot, dwe, dw1a, dw1b, dw2a, dw2b = \
            _call_dual_bwd(args, weights, cots, bb, interpret, dot_dtype,
                           first_layer)
        zero = jnp.zeros_like
        (np_, npdot, rbf, rbfdot, dir_, dirdot, adj, force, forcedot) = args
        return (dnp, dnpdot, zero(rbf), zero(rbfdot), zero(dir_),
                zero(dirdot), zero(adj), dforce, dforcedot,
                dwe, dw1a, dw1b, dw2a, dw2b)

    fused.defvjp(fwd, bwd)
    return fused


def make_fused_pair_interaction(bb=4, interpret=False,
                                dot_dtype=jnp.float32,
                                first_layer=False):
    '''Build the custom-VJP fused op.

    fn(np_ (B,N,F), rbf (B,N,N,R), dir (B,3,N,N), adj_f32 (B,N,N),
       force (B,3,N,F), We, W1a, W1b, W2a, W2b) -> (inv1 (B,N,F),
       eq (B,3,N,F)).
    First-order differentiable w.r.t. the five data inputs AND the five
    weight matrices (one fused backward kernel). Second-order AD (e.g.
    grad-of-force-loss) is NOT available through this op -- JAX raises on
    differentiating a custom_vjp backward; training uses the first-order
    surrogate restructure in train/fastgrad.py with the dual op below.
    B must be divisible by bb.
    '''

    @jax.custom_vjp
    def fused(np_, rbf, dir_, adj, force, We, W1a, W1b, W2a, W2b):
        return _call_fwd(np_, rbf, dir_, adj, force,
                         (We, W1a, W1b, W2a, W2b), bb, interpret, dot_dtype,
                         first_layer)

    def fwd(np_, rbf, dir_, adj, force, We, W1a, W1b, W2a, W2b):
        out = _call_fwd(np_, rbf, dir_, adj, force,
                        (We, W1a, W1b, W2a, W2b), bb, interpret, dot_dtype,
                        first_layer)
        return out, (np_, rbf, dir_, adj, force, We, W1a, W1b, W2a, W2b)

    def bwd(res, cots):
        np_, rbf, dir_, adj, force, We, W1a, W1b, W2a, W2b = res
        dinv1, deq = cots
        dnp, drbf, ddir, dforce, dwe, dw1a, dw1b, dw2a, dw2b = _call_bwd(
            np_, rbf, dir_, adj, force, (We, W1a, W1b, W2a, W2b),
            dinv1, deq, bb, interpret, dot_dtype, first_layer)
        return (dnp, drbf, ddir, jnp.zeros_like(adj), dforce,
                dwe, dw1a, dw1b, dw2a, dw2b)

    fused.defvjp(fwd, bwd)
    return fused
