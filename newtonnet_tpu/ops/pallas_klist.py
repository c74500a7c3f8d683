'''Pallas TPU kernels: fused pair-interaction layer over neighbor lists
(the large-N path).

The neighborlist (large-N) train step is pure HBM traffic: XLA cost
analysis of the N=4096 newton3 step reports 374 GFLOP against ~50 GB of
bytes accessed (PERF_NOTES.md "Round-3 large-N train-step study") -- the
fwd+rev+outer-rev program materializes dozens of (N, K, F) pair tensors.
These kernels keep the whole per-edge message/phi chain VMEM-resident per
atom tile: HBM sees only the gathered neighbor features (one (N, K, 4F)
tensor per layer, produced by a plain XLA gather outside the kernel,
because Mosaic rejects in-kernel cross-tile gathers -- see
ops/pallas_gather.py), the geometry tensors, and (N, *)-sized node
outputs.

Layout (N-major; every block carries the FULL K so the Mosaic last-two-
dims rule is satisfied by "equal to the overall array dimension"):
    npart_i (B, N, F)       tile-resident invariant node part
    cat_j   (B, N, K, C)    gathered neighbor features; C = F (first
                            layer) or 4F ([nodepart | force_x|y|z])
    rbf     (B, N, K, R)
    dir     (B, 3, N, K)    Cartesian axis LEADING (Mosaic cannot slice a
                            width-3 minor dim)
    mask    (B, N, K)       float edge mask

Grid = (B, N // nb) with nb % 8 == 0: atoms are tiled along N; reductions
over K run entirely in VMEM. Weight cotangents accumulate across the
sequential grid.

Computation per layer (InteractionNet, models/newtonnet.py:193-311;
reference hot loop /root/reference/newtonnet/models/newtonnet.py:207-237):
    msg  = (rbf @ We) * np_i * np_j * mask          (N, K, F)
    inv1 = sum_k msg                                (N, F)
    phi1 = (silu(msg @ W1a) @ W1b) * mask
    phi2 = (silu(msg @ W2a) @ W2b) * mask
    eq[d] = sum_k phi1 * dir[d] + sum_k phi2 * force_j[d]

Two ops, both single-fused-kernel custom VJPs (same design as
ops/pallas_dense.py):

* make_fused_klist_interaction: the primal layer; its backward produces
  ALL first-order cotangents (npart_i, cat_j, rbf, dir, weights). Serves
  inference / MD forces (grad wrt positions) and energy-only training.
* make_fused_klist_interaction_dual: primal + position-tangent dual with
  a custom VJP producing weight cotangents and theta-dependent input
  cotangents (npart_i, cat_j and their tangents). With the fastgrad
  reverse-over-forward restructure (train/fastgrad.py) these two ops are
  the complete force-training hot path -- no second-order AD ever touches
  a pair tensor.

Inputs may arrive in bfloat16 (cat_j / rbf edge tensors at half HBM
traffic); elementwise math runs in fp32 in VMEM, MXU passes in dot_dtype
(bf16 by default here -- at K~88 the matmuls are no longer negligible),
and per-edge cotangent outputs are emitted in the input dtype.
'''
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _d2silu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 - s) * (2.0 + x * (1.0 - 2.0 * s))


# Mosaic's default scoped-VMEM cap is 16 MiB; the fused kernels keep the
# whole pair chain resident (v5e has 128 MiB VMEM/core).
_VMEM_LIMIT = 100 * 1024 * 1024


def _params(interpret):
    return None if interpret else pltpu.CompilerParams(
        vmem_limit_bytes=_VMEM_LIMIT)


def _f32(x):
    return x.astype(jnp.float32)


def _mk_dot(dot_dtype):
    def dot(a, b):
        return jnp.dot(a.astype(dot_dtype), b.astype(dot_dtype),
                       preferred_element_type=jnp.float32)
    return dot


def _mk_dotT(dot_dtype):
    def dotT(a, b):
        # a^T @ b contracting the long (edge-slot) axis
        return jax.lax.dot_general(
            a.astype(dot_dtype), b.astype(dot_dtype),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    return dotT


def _chain(npi, cat, rbf_flat, mask3, w, dot, with_force):
    '''Shared forward chain in fp32. Returns every intermediate the
    backward needs. Shapes: npi (nb, F); cat (nb, K, C); mask3 (nb, K, 1).
    '''
    we, w1a, w1b, w2a, w2b = w
    nb, k = cat.shape[0], cat.shape[1]
    f = npi.shape[-1]
    npj = _f32(cat[..., :f])
    me = dot(rbf_flat, we).reshape(nb, k, f)
    msg = me * npi[:, None] * npj * mask3
    msg2 = msg.reshape(nb * k, f)
    p1 = dot(msg2, w1a)
    h1 = _silu(p1)
    phi1 = dot(h1, w1b).reshape(nb, k, f) * mask3
    if with_force:
        p2 = dot(msg2, w2a)
        h2 = _silu(p2)
        phi2 = dot(h2, w2b).reshape(nb, k, f) * mask3
    else:
        p2 = h2 = phi2 = None
    return npj, me, msg, msg2, p1, h1, phi1, p2, h2, phi2


def _fwd_kernel(npi_ref, cat_ref, rbf_ref, dir_ref, mask_ref,
                we_ref, w1a_ref, w1b_ref, w2a_ref, w2b_ref,
                inv1_ref, eq_ref, *, dot_dtype, with_force):
    _, nb, k, r = rbf_ref.shape
    f = npi_ref.shape[-1]
    dot = _mk_dot(dot_dtype)
    w = (we_ref[:], w1a_ref[:], w1b_ref[:], w2a_ref[:], w2b_ref[:])
    npi = _f32(npi_ref[0])
    cat = cat_ref[0]
    mask3 = _f32(mask_ref[0])[..., None]
    rbf_flat = _f32(rbf_ref[0]).reshape(nb * k, r)
    _, _, msg, _, _, _, phi1, _, _, phi2 = _chain(
        npi, cat, rbf_flat, mask3, w, dot, with_force)

    inv1_ref[0] = jnp.sum(msg, axis=1)
    for d in range(3):
        dird = _f32(dir_ref[0, d])[..., None]          # (nb, K, 1)
        e = jnp.sum(phi1 * dird, axis=1)               # (nb, F)
        if with_force:
            fj = _f32(cat[..., (d + 1) * f:(d + 2) * f])
            e = e + jnp.sum(phi2 * fj, axis=1)
        eq_ref[0, d] = e


def _bwd_kernel(npi_ref, cat_ref, rbf_ref, dir_ref, mask_ref,
                we_ref, w1a_ref, w1b_ref, w2a_ref, w2b_ref,
                dinv1_ref, deq_ref,
                dnpi_ref, dcat_ref, drbf_ref, ddir_ref,
                dwe_ref, dw1a_ref, dw1b_ref, dw2a_ref, dw2b_ref, *,
                dot_dtype, with_force):
    _, nb, k, r = rbf_ref.shape
    f = npi_ref.shape[-1]
    dot = _mk_dot(dot_dtype)
    dotT = _mk_dotT(dot_dtype)
    w = (we_ref[:], w1a_ref[:], w1b_ref[:], w2a_ref[:], w2b_ref[:])
    we, w1a, w1b, w2a, w2b = w
    npi = _f32(npi_ref[0])
    cat = cat_ref[0]
    mask3 = _f32(mask_ref[0])[..., None]
    rbf_flat = _f32(rbf_ref[0]).reshape(nb * k, r)
    npj, me, msg, msg2, p1, h1, phi1, p2, h2, phi2 = _chain(
        npi, cat, rbf_flat, mask3, w, dot, with_force)

    dphi1 = jnp.zeros((nb, k, f), jnp.float32)
    dphi2 = jnp.zeros((nb, k, f), jnp.float32) if with_force else None
    for d in range(3):
        g = _f32(deq_ref[0, d])[:, None]               # (nb, 1, F)
        dird = _f32(dir_ref[0, d])[..., None]
        dphi1 = dphi1 + g * dird
        ddir_ref[0, d] = jnp.sum(phi1 * g, axis=-1).astype(ddir_ref.dtype)
        if with_force:
            fj = _f32(cat[..., (d + 1) * f:(d + 2) * f])
            dphi2 = dphi2 + g * fj
            dcat_ref[0, :, :, (d + 1) * f:(d + 2) * f] = \
                (phi2 * g).astype(dcat_ref.dtype)

    dphi1 = (dphi1 * mask3).reshape(nb * k, f)
    dh1 = dot(dphi1, w1b.T)
    dp1 = dh1 * _dsilu(p1)
    dmsg = dot(dp1, w1a.T)
    if with_force:
        dphi2 = (dphi2 * mask3).reshape(nb * k, f)
        dh2 = dot(dphi2, w2b.T)
        dp2 = dh2 * _dsilu(p2)
        dmsg = dmsg + dot(dp2, w2a.T)
    dmsg3 = (dmsg.reshape(nb, k, f) + _f32(dinv1_ref[0])[:, None]) * mask3

    dnpi_ref[0] = jnp.sum(dmsg3 * me * npj, axis=1).astype(dnpi_ref.dtype)
    dcat_ref[0, :, :, :f] = (dmsg3 * me * npi[:, None]).astype(dcat_ref.dtype)
    dme = (dmsg3 * npi[:, None] * npj).reshape(nb * k, f)
    drbf_ref[0] = dot(dme, we.T).reshape(nb, k, r).astype(drbf_ref.dtype)

    # weight cotangents, accumulated across the sequential (B, N//nb) grid
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

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
    if with_force:
        dw2a_ref[:] += dotT(msg2, dp2)
        dw2b_ref[:] += dotT(h2, dphi2)


def _dual_chain(npi, npidot, cat, catdot, rbf_flat, rbfdot_flat, mask3, w,
                dot, with_force):
    '''Primal + tangent pair chain (weights carry no tangent -- the dual
    pass propagates a position tangent; see train/fastgrad.py).'''
    we, w1a, w1b, w2a, w2b = w
    nb, k = cat.shape[0], cat.shape[1]
    f = npi.shape[-1]
    npj = _f32(cat[..., :f])
    npjdot = _f32(catdot[..., :f])
    me = dot(rbf_flat, we).reshape(nb, k, f)
    medot = dot(rbfdot_flat, we).reshape(nb, k, f)
    ai = npi[:, None]
    aidot = npidot[:, None]
    msg = me * ai * npj * mask3
    msgdot = (medot * ai * npj + me * aidot * npj + me * ai * npjdot) * mask3
    msg2 = msg.reshape(nb * k, f)
    msgdot2 = msgdot.reshape(nb * k, f)

    def branch(w_a, w_b):
        p = dot(msg2, w_a)
        pdot = dot(msgdot2, w_a)
        h = _silu(p)
        hdot = _dsilu(p) * pdot
        phi = dot(h, w_b).reshape(nb, k, f) * mask3
        phidot = dot(hdot, w_b).reshape(nb, k, f) * mask3
        return p, pdot, h, hdot, phi, phidot

    b1 = branch(w1a, w1b)
    b2 = branch(w2a, w2b) if with_force else None
    return npj, npjdot, me, medot, msg, msgdot, msg2, msgdot2, b1, b2


def _dual_fwd_kernel(npi_ref, npidot_ref, cat_ref, catdot_ref,
                     rbf_ref, rbfdot_ref, dir_ref, dirdot_ref, mask_ref,
                     we_ref, w1a_ref, w1b_ref, w2a_ref, w2b_ref,
                     inv1_ref, eq_ref, inv1dot_ref, eqdot_ref, *,
                     dot_dtype, with_force):
    _, nb, k, r = rbf_ref.shape
    f = npi_ref.shape[-1]
    dot = _mk_dot(dot_dtype)
    w = (we_ref[:], w1a_ref[:], w1b_ref[:], w2a_ref[:], w2b_ref[:])
    mask3 = _f32(mask_ref[0])[..., None]
    e = nb * k
    cat, catdot = cat_ref[0], catdot_ref[0]
    (_, _, _, _, msg, msgdot, _, _,
     (_, _, _, _, phi1, phi1dot), b2) = _dual_chain(
        _f32(npi_ref[0]), _f32(npidot_ref[0]), cat, catdot,
        _f32(rbf_ref[0]).reshape(e, r), _f32(rbfdot_ref[0]).reshape(e, r),
        mask3, w, dot, with_force)

    inv1_ref[0] = jnp.sum(msg, axis=1)
    inv1dot_ref[0] = jnp.sum(msgdot, axis=1)
    for d in range(3):
        dird = _f32(dir_ref[0, d])[..., None]
        dirddot = _f32(dirdot_ref[0, d])[..., None]
        eqd = jnp.sum(phi1 * dird, axis=1)
        eqddot = jnp.sum(phi1dot * dird + phi1 * dirddot, axis=1)
        if with_force:
            _, _, _, _, phi2, phi2dot = b2
            fj = _f32(cat[..., (d + 1) * f:(d + 2) * f])
            fjdot = _f32(catdot[..., (d + 1) * f:(d + 2) * f])
            eqd = eqd + jnp.sum(phi2 * fj, axis=1)
            eqddot = eqddot + jnp.sum(phi2dot * fj + phi2 * fjdot, axis=1)
        eq_ref[0, d] = eqd
        eqdot_ref[0, d] = eqddot


def _dual_bwd_kernel(npi_ref, npidot_ref, cat_ref, catdot_ref,
                     rbf_ref, rbfdot_ref, dir_ref, dirdot_ref, mask_ref,
                     we_ref, w1a_ref, w1b_ref, w2a_ref, w2b_ref,
                     di_ref, dq_ref, didot_ref, dqdot_ref,
                     dnpi_ref, dnpidot_ref, dcat_ref, dcatdot_ref,
                     dwe_ref, dw1a_ref, dw1b_ref, dw2a_ref, dw2b_ref, *,
                     dot_dtype, with_force):
    '''Reverse of the dual forward: cotangents for the theta-dependent
    inputs (npart_i, cat_j, their tangents) and all five weight matrices.
    rbf/dir cotangents are intentionally NOT produced -- this op backs the
    parameter-gradient surrogate only (train/fastgrad.py).'''
    _, nb, k, r = rbf_ref.shape
    f = npi_ref.shape[-1]
    e = nb * k
    dot = _mk_dot(dot_dtype)
    dotT = _mk_dotT(dot_dtype)
    w = (we_ref[:], w1a_ref[:], w1b_ref[:], w2a_ref[:], w2b_ref[:])
    we, w1a, w1b, w2a, w2b = w
    npi = _f32(npi_ref[0])
    npidot = _f32(npidot_ref[0])
    cat, catdot = cat_ref[0], catdot_ref[0]
    mask3 = _f32(mask_ref[0])[..., None]
    rbf_flat = _f32(rbf_ref[0]).reshape(e, r)
    rbfdot_flat = _f32(rbfdot_ref[0]).reshape(e, r)
    (npj, npjdot, me, medot, msg, msgdot, msg2, msgdot2,
     (p1, p1dot, h1, h1dot, phi1, phi1dot), b2) = _dual_chain(
        npi, npidot, cat, catdot, rbf_flat, rbfdot_flat, mask3, w, dot,
        with_force)

    dphi1 = jnp.zeros((nb, k, f), jnp.float32)
    dphi1dot = jnp.zeros((nb, k, f), jnp.float32)
    if with_force:
        p2, p2dot, h2, h2dot, phi2, phi2dot = b2
        dphi2 = jnp.zeros((nb, k, f), jnp.float32)
        dphi2dot = jnp.zeros((nb, k, f), jnp.float32)
    for d in range(3):
        dq = _f32(dq_ref[0, d])[:, None]               # (nb, 1, F)
        dqdot = _f32(dqdot_ref[0, d])[:, None]
        dird = _f32(dir_ref[0, d])[..., None]
        dirddot = _f32(dirdot_ref[0, d])[..., None]
        dphi1 = dphi1 + dq * dird + dqdot * dirddot
        dphi1dot = dphi1dot + dqdot * dird
        if with_force:
            fj = _f32(cat[..., (d + 1) * f:(d + 2) * f])
            fjdot = _f32(catdot[..., (d + 1) * f:(d + 2) * f])
            dphi2 = dphi2 + dq * fj + dqdot * fjdot
            dphi2dot = dphi2dot + dqdot * fj
            dcat_ref[0, :, :, (d + 1) * f:(d + 2) * f] = \
                (phi2 * dq + phi2dot * dqdot).astype(dcat_ref.dtype)
            dcatdot_ref[0, :, :, (d + 1) * f:(d + 2) * f] = \
                (phi2 * dqdot).astype(dcatdot_ref.dtype)

    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    def backprop_branch(dphi, dphidot, p, pdot, h, hdot, w_a, w_b,
                        dwa_ref, dwb_ref):
        g = (dphi * mask3).reshape(e, f)
        gdot = (dphidot * mask3).reshape(e, f)
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

    dmsg, dmsgdot = backprop_branch(dphi1, dphi1dot, p1, p1dot, h1, h1dot,
                                    w1a, w1b, dw1a_ref, dw1b_ref)
    if with_force:
        dmsg_b, dmsgdot_b = backprop_branch(
            dphi2, dphi2dot, p2, p2dot, h2, h2dot, w2a, w2b,
            dw2a_ref, dw2b_ref)
        dmsg = dmsg + dmsg_b
        dmsgdot = dmsgdot + dmsgdot_b
    dmsg3 = (dmsg.reshape(nb, k, f) + _f32(di_ref[0])[:, None]) * mask3
    dmsgdot3 = (dmsgdot.reshape(nb, k, f)
                + _f32(didot_ref[0])[:, None]) * mask3

    ai = npi[:, None]
    aidot = npidot[:, None]
    # msg = me*ai*aj (masked); msgdot = medot*ai*aj + me*aidot*aj + me*ai*ajdot
    dme = dmsg3 * ai * npj + dmsgdot3 * (aidot * npj + ai * npjdot)
    dmedot = dmsgdot3 * ai * npj
    dnpi_ref[0] = jnp.sum(
        dmsg3 * me * npj + dmsgdot3 * (medot * npj + me * npjdot),
        axis=1).astype(dnpi_ref.dtype)
    dnpidot_ref[0] = jnp.sum(dmsgdot3 * me * npj, axis=1) \
        .astype(dnpidot_ref.dtype)
    dcat_ref[0, :, :, :f] = (
        dmsg3 * me * ai + dmsgdot3 * (medot * ai + me * aidot)
    ).astype(dcat_ref.dtype)
    dcatdot_ref[0, :, :, :f] = (dmsgdot3 * me * ai).astype(dcatdot_ref.dtype)

    dwe = dotT(rbf_flat, dme.reshape(e, f)) \
        + dotT(rbfdot_flat, dmedot.reshape(e, f))

    @pl.when(first)
    def _():
        dwe_ref[:] = jnp.zeros_like(dwe_ref)
        if not with_force:
            dw2a_ref[:] = jnp.zeros_like(dw2a_ref)
            dw2b_ref[:] = jnp.zeros_like(dw2b_ref)
    dwe_ref[:] += dwe


# --------------------------------------------------------------------- #
# pallas_call plumbing

def _edge_spec(shape, nb):
    '''BlockSpec for a (B, N, K, C) edge tensor -> block (1, nb, K, C).'''
    _, _, K, C = shape
    return pl.BlockSpec((1, nb, K, C), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)


def _node_spec(shape, nb):
    '''(B, N, F) -> (1, nb, F).'''
    return pl.BlockSpec((1, nb, shape[-1]), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)


def _eq_spec(shape, nb):
    '''(B, 3, N, F) -> (1, 3, nb, F).'''
    return pl.BlockSpec((1, 3, nb, shape[-1]), lambda b, i: (b, 0, i, 0),
                        memory_space=pltpu.VMEM)


def _dir_spec(shape, nb):
    '''(B, 3, N, K) -> (1, 3, nb, K): full K in the minor dim.'''
    _, _, _, K = shape
    return pl.BlockSpec((1, 3, nb, K), lambda b, i: (b, 0, i, 0),
                        memory_space=pltpu.VMEM)


def _mask_spec(shape, nb):
    '''(B, N, K) -> (1, nb, K).'''
    _, _, K = shape
    return pl.BlockSpec((1, nb, K), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)


def _weight_specs(n):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n)]


def _w_out_specs(w_shapes):
    # weight-grad outputs accumulate across grid steps: every step maps to
    # the same (zero-offset) block
    return [pl.BlockSpec(s, lambda b, i, _nd=len(s): (0,) * _nd,
                         memory_space=pltpu.VMEM) for s in w_shapes]


def _validate(npi, cat, rbf, dir_, mask, nb):
    B, N, F = npi.shape
    _, _, K, C = cat.shape
    if N % nb:
        raise ValueError(f'N={N} not divisible by block nb={nb}')
    if dir_.shape != (B, 3, N, K):
        raise ValueError(f'dir must be (B, 3, N, K), got {dir_.shape}')
    if mask.shape != (B, N, K):
        raise ValueError(f'mask must be (B, N, K), got {mask.shape}')
    return B, N, F, K, C


def pick_nb(n, dual=False):
    '''Largest atom-tile size in {64, 32, 16, 8} dividing N that fits the
    chain under the VMEM cap (NEWTONNET_KLIST_NB overrides).'''
    import os
    forced = int(os.environ.get('NEWTONNET_KLIST_NB', '0'))
    if forced and n % forced == 0:
        return forced
    # conservative defaults: the fused BACKWARD kernels keep ~2x (dual:
    # ~4x) the forward chain live; Mosaic rejects over-cap programs at
    # compile time, so the TPU sweep tunes via NEWTONNET_KLIST_NB
    cap = 32 if dual else 64
    for nb in (64, 32, 16, 8):
        if nb <= cap and n % nb == 0:
            return nb
    # N not 8-divisible (small test systems / interpret mode): largest
    # divisor under the cap. Compiled TPU runs should pad N to a multiple
    # of the tile instead.
    for nb in range(min(cap, n), 0, -1):
        if n % nb == 0:
            return nb
    return 1


def make_fused_klist_interaction(nb=64, interpret=False,
                                 dot_dtype=jnp.bfloat16, with_force=True):
    '''Build the custom-VJP fused K-list op.

    fn(npart_i (B,N,F), cat_j (B,N,K,C), rbf (B,N,K,R), dir (B,3,N,K),
       mask_f (B,N,K), We, W1a, W1b, W2a, W2b) -> (inv1 (B,N,F),
       eq (B,3,N,F)).

    C = 4F with force (cat_j = [nodepart_j | force_j x|y|z]) or F for the
    stack's first layer (force_node enters identically zero; phi2 is
    skipped and its weight cotangents are zero). First-order differentiable
    w.r.t. npart_i, cat_j, rbf, dir and the five weights in ONE fused
    backward kernel; second-order AD is NOT available (training uses the
    dual op + train/fastgrad.py). N % nb == 0 required.
    '''

    def call_fwd(npi, cat, rbf, dir_, mask, weights):
        B, N, F, K, C = _validate(npi, cat, rbf, dir_, mask, nb)
        out_shapes = [(B, N, F), (B, 3, N, F)]
        return pl.pallas_call(
            functools.partial(_fwd_kernel, dot_dtype=dot_dtype,
                              with_force=with_force),
            grid=(B, N // nb),
            in_specs=[_node_spec(npi.shape, nb), _edge_spec(cat.shape, nb),
                      _edge_spec(rbf.shape, nb), _dir_spec(dir_.shape, nb),
                      _mask_spec(mask.shape, nb)] + _weight_specs(5),
            out_specs=(_node_spec(out_shapes[0], nb),
                       _eq_spec(out_shapes[1], nb)),
            out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                            for s in out_shapes),
            interpret=interpret,
            compiler_params=_params(interpret),
        )(npi, cat, rbf, dir_, mask, *weights)

    def call_bwd(npi, cat, rbf, dir_, mask, weights, dinv1, deq):
        B, N, F, K, C = _validate(npi, cat, rbf, dir_, mask, nb)
        w_shapes = [w.shape for w in weights]
        out_shape = (
            jax.ShapeDtypeStruct(npi.shape, jnp.float32),
            jax.ShapeDtypeStruct(cat.shape, cat.dtype),
            jax.ShapeDtypeStruct(rbf.shape, rbf.dtype),
            jax.ShapeDtypeStruct(dir_.shape, dir_.dtype),
        ) + tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes)
        return pl.pallas_call(
            functools.partial(_bwd_kernel, dot_dtype=dot_dtype,
                              with_force=with_force),
            grid=(B, N // nb),
            in_specs=([_node_spec(npi.shape, nb), _edge_spec(cat.shape, nb),
                       _edge_spec(rbf.shape, nb), _dir_spec(dir_.shape, nb),
                       _mask_spec(mask.shape, nb)] + _weight_specs(5)
                      + [_node_spec(dinv1.shape, nb),
                         _eq_spec(deq.shape, nb)]),
            out_specs=(_node_spec(npi.shape, nb), _edge_spec(cat.shape, nb),
                       _edge_spec(rbf.shape, nb), _dir_spec(dir_.shape, nb))
            + tuple(_w_out_specs(w_shapes)),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=_params(interpret),
        )(npi, cat, rbf, dir_, mask, *weights, dinv1, deq)

    @jax.custom_vjp
    def fused(npi, cat, rbf, dir_, mask, We, W1a, W1b, W2a, W2b):
        return call_fwd(npi, cat, rbf, dir_, mask, (We, W1a, W1b, W2a, W2b))

    def fwd(npi, cat, rbf, dir_, mask, We, W1a, W1b, W2a, W2b):
        out = call_fwd(npi, cat, rbf, dir_, mask, (We, W1a, W1b, W2a, W2b))
        return out, (npi, cat, rbf, dir_, mask, We, W1a, W1b, W2a, W2b)

    def bwd(res, cots):
        npi, cat, rbf, dir_, mask, We, W1a, W1b, W2a, W2b = res
        dinv1, deq = cots
        outs = call_bwd(npi, cat, rbf, dir_, mask,
                        (We, W1a, W1b, W2a, W2b), dinv1, deq)
        dnpi, dcat, drbf, ddir = outs[:4]
        dwe, dw1a, dw1b, dw2a, dw2b = outs[4:]
        if not with_force:
            # phi2 never ran: its weight-grad outputs are uninitialized
            dw2a = jnp.zeros_like(dw2a)
            dw2b = jnp.zeros_like(dw2b)
        return (dnpi, dcat, drbf, ddir, jnp.zeros_like(mask),
                dwe, dw1a, dw1b, dw2a, dw2b)

    fused.defvjp(fwd, bwd)
    return fused


def make_fused_klist_interaction_dual(nb=32, interpret=False,
                                      dot_dtype=jnp.bfloat16,
                                      with_force=True):
    '''Fused dual (primal + position-tangent) K-list op with custom VJP.

    fn(npi, npidot (B,N,F), cat, catdot (B,N,K,C), rbf, rbfdot (B,N,K,R),
       dir, dirdot (B,3,N,K), mask (B,N,K), We, W1a, W1b, W2a, W2b)
       -> (inv1, eq, inv1dot, eqdot).

    The VJP produces weight cotangents plus cotangents of the
    theta-dependent inputs (npi/cat and tangents); rbf/dir cotangents are
    ZERO by design -- the fastgrad surrogate differentiates w.r.t.
    parameters only. Do not use under grad-wrt-positions.
    '''

    def call_dual_fwd(args, weights):
        npi, npidot, cat, catdot, rbf, rbfdot, dir_, dirdot, mask = args
        B, N, F, K, C = _validate(npi, cat, rbf, dir_, mask, nb)
        out_shapes = [(B, N, F), (B, 3, N, F), (B, N, F), (B, 3, N, F)]
        specs = [_node_spec(npi.shape, nb), _node_spec(npi.shape, nb),
                 _edge_spec(cat.shape, nb), _edge_spec(cat.shape, nb),
                 _edge_spec(rbf.shape, nb), _edge_spec(rbf.shape, nb),
                 _dir_spec(dir_.shape, nb), _dir_spec(dir_.shape, nb),
                 _mask_spec(mask.shape, nb)]
        return pl.pallas_call(
            functools.partial(_dual_fwd_kernel, dot_dtype=dot_dtype,
                              with_force=with_force),
            grid=(B, N // nb),
            in_specs=specs + _weight_specs(5),
            out_specs=(_node_spec(out_shapes[0], nb),
                       _eq_spec(out_shapes[1], nb),
                       _node_spec(out_shapes[2], nb),
                       _eq_spec(out_shapes[3], nb)),
            out_shape=tuple(jax.ShapeDtypeStruct(s, jnp.float32)
                            for s in out_shapes),
            interpret=interpret,
            compiler_params=_params(interpret),
        )(*args, *weights)

    def call_dual_bwd(args, weights, cots):
        npi, npidot, cat, catdot, rbf, rbfdot, dir_, dirdot, mask = args
        B, N, F, K, C = _validate(npi, cat, rbf, dir_, mask, nb)
        w_shapes = [w.shape for w in weights]
        specs = [_node_spec(npi.shape, nb), _node_spec(npi.shape, nb),
                 _edge_spec(cat.shape, nb), _edge_spec(cat.shape, nb),
                 _edge_spec(rbf.shape, nb), _edge_spec(rbf.shape, nb),
                 _dir_spec(dir_.shape, nb), _dir_spec(dir_.shape, nb),
                 _mask_spec(mask.shape, nb)]
        cot_specs = [_node_spec(cots[0].shape, nb),
                     _eq_spec(cots[1].shape, nb),
                     _node_spec(cots[2].shape, nb),
                     _eq_spec(cots[3].shape, nb)]
        out_shape = (
            jax.ShapeDtypeStruct(npi.shape, jnp.float32),
            jax.ShapeDtypeStruct(npi.shape, jnp.float32),
            jax.ShapeDtypeStruct(cat.shape, cat.dtype),
            jax.ShapeDtypeStruct(catdot.shape, catdot.dtype),
        ) + tuple(jax.ShapeDtypeStruct(s, jnp.float32) for s in w_shapes)
        return pl.pallas_call(
            functools.partial(_dual_bwd_kernel, dot_dtype=dot_dtype,
                              with_force=with_force),
            grid=(B, N // nb),
            in_specs=specs + _weight_specs(5) + cot_specs,
            out_specs=(_node_spec(npi.shape, nb), _node_spec(npi.shape, nb),
                       _edge_spec(cat.shape, nb), _edge_spec(cat.shape, nb))
            + tuple(_w_out_specs(w_shapes)),
            out_shape=out_shape,
            interpret=interpret,
            compiler_params=_params(interpret),
        )(*args, *weights, *cots)

    @jax.custom_vjp
    def fused(npi, npidot, cat, catdot, rbf, rbfdot, dir_, dirdot, mask,
              We, W1a, W1b, W2a, W2b):
        return call_dual_fwd(
            (npi, npidot, cat, catdot, rbf, rbfdot, dir_, dirdot, mask),
            (We, W1a, W1b, W2a, W2b))

    def fwd(npi, npidot, cat, catdot, rbf, rbfdot, dir_, dirdot, mask,
            We, W1a, W1b, W2a, W2b):
        args = (npi, npidot, cat, catdot, rbf, rbfdot, dir_, dirdot, mask)
        weights = (We, W1a, W1b, W2a, W2b)
        return call_dual_fwd(args, weights), (args, weights)

    def bwd(res, cots):
        args, weights = res
        outs = call_dual_bwd(args, weights, cots)
        dnpi, dnpidot, dcat, dcatdot = outs[:4]
        dwe, dw1a, dw1b, dw2a, dw2b = outs[4:]
        (npi, npidot, cat, catdot, rbf, rbfdot, dir_, dirdot, mask) = args
        zero = jnp.zeros_like
        return (dnpi, dnpidot, dcat, dcatdot, zero(rbf), zero(rbfdot),
                zero(dir_), zero(dirdot), zero(mask),
                dwe, dw1a, dw1b, dw2a, dw2b)

    fused.defvjp(fwd, bwd)
    return fused
