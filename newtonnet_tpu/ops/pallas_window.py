'''Windowed one-hot MXU gather/scatter for cell-sorted neighbor lists.

The large-N neighborlist step is bound by per-row gather/scatter DMA
overhead (~12-27 ns/row, PERF_NOTES.md "Large-N gather study"): each of
the E = N*K neighbor rows is fetched/accumulated individually no matter
how it is phrased at the XLA level. This module exploits a *data-layout*
property instead: when atoms are relabeled in raster-ordered spatial
cells (data/prelists.sort_by_cells with sort_cell ~ cutoff/3), every
neighbor index j of atom i satisfies

    (j - block_start(i)) mod N < W

for a window W of a couple of thousand rows (measured 1720 at N=4096,
rho=0.1, rc=5 -- tools/exp_window_gather.py). A neighbor gather then
becomes, per T-row atom block, a (K*T, W) one-hot @ (W, F) slab matmul:
the one-hot is built in VMEM from an iota comparison (never touching
HBM), the slab is ONE contiguous W-row stream instead of K*T random rows,
and the contraction rides the MXU. The adjoint (scatter-add) is the
transposed matmul plus a strided overlap-add epilogue.

Semantics (both ops, K-major layout matching ops/nlist.inv_gather):

    window_gather(x, idx, W, T)[b, k, n] =
        x[b, idx[b, k, n]]  if (idx[b,k,n] - start(n)) mod N < W else 0
    window_scatter_sum(y, idx, W, T)[b, j] =
        sum over {(k, n): idx[b,k,n] == j and j in window(n)} of y[b,k,n]

with start(n) = (T * (n // T) + T//2 - W//2) mod N (the window is centered
on the block). Out-of-window entries are dropped on both sides, so the two
maps stay exact mutual transposes; callers must guarantee every VALID edge
is in-window (check_window) -- masked slots may point anywhere.

Like inv_gather/inv_scatter_sum these are registered as mutually-
transposed LINEAR primitives, so every AD composition (grad-of-grad force
training, fastgrad duals, HVP lanes) works.

Numerics: the MXU pass runs in bfloat16. A one-hot row selects exactly one
slab row (no accumulation), so the result is the payload rounded to
bf16 -- bit-exact for bf16 inputs (the large-N compute_dtype), ~3 decimal
digits for fp32. The scatter side accumulates in fp32.

Reference pattern: the reference's torch_geometric scatter hot op
(/root/reference/newtonnet/models/newtonnet.py:207-237) has no TPU
counterpart; this is the TPU-native formulation.
'''
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_LIMIT = 100 * 1024 * 1024


def _interpret():
    return os.environ.get('NEWTONNET_PALLAS_INTERPRET', '0') == '1'


def _starts(N, W, T):
    '''Static per-block slab starts, window centered on each T-row block.'''
    import numpy as np
    nb = N // T
    return [(i * T + T // 2 - W // 2) % N for i in range(nb)]


def _locals_kn(idx_kn, N, W, T):
    '''Window-local indices: (idx - start(n)) mod N, shape (B, K, N).'''
    B, K, n = idx_kn.shape
    starts = jnp.asarray(_starts(N, W, T), jnp.int32)
    st = jnp.repeat(starts, T)                       # (N,)
    return (idx_kn - st[None, None, :]) % N


def check_window(idx_kn, mask_kn, W, T):
    '''True iff every VALID edge is inside its block's window.'''
    N = idx_kn.shape[-1]
    loc = _locals_kn(idx_kn, N, W, T)
    return bool(jnp.all(jnp.where(mask_kn, loc < W, True)))


def window_margin(idx_kn, mask_kn, W, T):
    '''Min slack (in rows) between valid edges and the window edges; >= 0
    means check_window passes. Use at list-build time to size W.'''
    N = idx_kn.shape[-1]
    loc = _locals_kn(idx_kn, N, W, T)
    lo = jnp.where(mask_kn, loc, W)          # distance from low edge
    hi = jnp.where(mask_kn, W - 1 - loc, W)  # distance from high edge
    return int(jnp.minimum(jnp.min(lo), jnp.min(hi)))


def _slabs(x, N, W, T):
    '''(B, nb, W, F) contiguous slab views of x (wraparound via concat).'''
    B, n, F = x.shape
    x2 = jnp.concatenate([x, x[:, :W]], axis=1)
    return jnp.stack([jax.lax.slice_in_dim(x2, s, s + W, axis=1)
                      for s in _starts(N, W, T)], axis=1)


def _overlap_add(dslabs, N, W, T):
    '''Adjoint of _slabs: accumulate (B, nb, W, F) back onto (B, N, F).'''
    B, nb, _, F = dslabs.shape
    out = jnp.zeros((B, N + W, F), dslabs.dtype)
    for i, s in enumerate(_starts(N, W, T)):
        out = jax.lax.dynamic_update_slice_in_dim(
            out, jax.lax.dynamic_slice_in_dim(out, s, W, axis=1)
            + dslabs[:, i], s, axis=1)
    return out[:, :N].at[:, :W].add(out[:, N:])


# --------------------------------------------------------------------- #
# kernels

def _onehot(loc_ref, k0, kc, T, W):
    '''(kc*T, W) bf16 one-hot of window-local indices, built in VMEM.
    The (kc, T, W) intermediate keeps the lane axis (W) untouched so the
    reshape only collapses leading dims (Mosaic-supported).'''
    loc = loc_ref[0, k0:k0 + kc, :]                         # (kc, T)
    lanes = jax.lax.broadcasted_iota(jnp.int32, (kc, T, W), 2)
    oh = (lanes == loc[:, :, None]).astype(jnp.bfloat16)
    return oh.reshape(kc * T, W)


def _gather_kernel(loc_ref, slab_ref, out_ref, *, kc, W):
    K, T = loc_ref.shape[1], loc_ref.shape[2]
    F = slab_ref.shape[-1]
    slab = slab_ref[0, 0].astype(jnp.bfloat16)             # (W, F)
    for k0 in range(0, K, kc):
        oh = _onehot(loc_ref, k0, kc, T, W)                 # (kc*T, W)
        res = jnp.dot(oh, slab, preferred_element_type=jnp.float32)
        out_ref[0, k0:k0 + kc, :, :] = res.reshape(kc, T, F).astype(
            out_ref.dtype)


def _scatter_kernel(loc_ref, y_ref, dslab_ref, *, kc, W):
    K, T = loc_ref.shape[1], loc_ref.shape[2]
    F = y_ref.shape[-1]
    acc = jnp.zeros((W, F), jnp.float32)
    for k0 in range(0, K, kc):
        oh = _onehot(loc_ref, k0, kc, T, W)
        y = y_ref[0, k0:k0 + kc, :, :].reshape(kc * T, F)
        acc = acc + jax.lax.dot_general(
            oh, y.astype(jnp.bfloat16),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (W, F)
    dslab_ref[0, 0] = acc.astype(dslab_ref.dtype)


def _pick_kc(K, T, W):
    '''One-hot chunk rows kc*T sized to ~4 MB bf16 in VMEM.'''
    budget = 4 * 1024 * 1024 // 2
    kc = max(1, budget // max(T * W, 1))
    while K % kc:
        kc -= 1
    return kc


def _pad_f(a):
    '''Pad the trailing feature axis to a lane multiple of 128.'''
    F = a.shape[-1]
    Fp = max(128, -(-F // 128) * 128)
    if Fp == F:
        return a, F
    pad = [(0, 0)] * (a.ndim - 1) + [(0, Fp - F)]
    return jnp.pad(a, pad), F


def _gather_pallas(x, idx_kn, W, T, interpret):
    B, K, N = idx_kn.shape
    x2, F = _pad_f(x.reshape(B, N, -1))
    Fp = x2.shape[-1]
    loc = _locals_kn(idx_kn, N, W, T)
    slabs = _slabs(x2, N, W, T)
    nb = N // T
    kc = _pick_kc(K, T, W)
    out = pl.pallas_call(
        functools.partial(_gather_kernel, kc=kc, W=W),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, K, T), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, W, Fp), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, K, T, Fp), lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, K, N, Fp), x.dtype),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(loc, slabs)
    out = out[..., :F]
    return out.reshape((B, K, N) + x.shape[2:])


def _scatter_pallas(y, idx_kn, W, T, interpret):
    B, K, N = idx_kn.shape
    feat = y.shape[3:]
    y2, F = _pad_f(y.reshape(B, K, N, -1))
    Fp = y2.shape[-1]
    loc = _locals_kn(idx_kn, N, W, T)
    nb = N // T
    kc = _pick_kc(K, T, W)
    dslabs = pl.pallas_call(
        functools.partial(_scatter_kernel, kc=kc, W=W),
        grid=(B, nb),
        in_specs=[
            pl.BlockSpec((1, K, T), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, K, T, Fp), lambda b, i: (b, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, W, Fp), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nb, W, Fp), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT),
    )(loc, y2)
    out = _overlap_add(dslabs, N, W, T)[..., :F].astype(y.dtype)
    return out.reshape((B, N) + feat)


# --------------------------------------------------------------------- #
# XLA reference implementations (identical window-drop semantics; exact
# arithmetic -- used on CPU, for small shapes, and as the test oracle)

def _gather_ref(x, idx_kn, W, T):
    B, K, N = idx_kn.shape
    loc = _locals_kn(idx_kn, N, W, T)
    flat = jnp.take_along_axis(
        x.reshape(B, N, -1), idx_kn.reshape(B, K * N, 1), axis=1,
        mode='promise_in_bounds')
    out = flat.reshape((B, K, N) + x.shape[2:])
    inwin = (loc < W).reshape((B, K, N) + (1,) * (x.ndim - 2))
    return jnp.where(inwin, out, 0)


def _scatter_ref(y, idx_kn, W, T):
    B, K, N = idx_kn.shape
    loc = _locals_kn(idx_kn, N, W, T)
    inwin = (loc < W).reshape((B, K, N) + (1,) * (y.ndim - 3))
    yw = jnp.where(inwin, y, 0)
    binds = jnp.broadcast_to(jnp.arange(B)[:, None], (B, K * N))
    return jnp.zeros((B, N) + y.shape[3:], y.dtype).at[
        binds, idx_kn.reshape(B, K * N)].add(
        yw.reshape((B, K * N) + y.shape[3:]), mode='drop')


def _use_pallas(idx_kn, W, T):
    N = idx_kn.shape[-1]
    if N % T or W % 128 or W > N or T % 128:
        return False
    if _interpret():
        return True
    return jax.default_backend() == 'tpu'


def _gather_impl(x, idx_kn, *, W, T):
    if _use_pallas(idx_kn, W, T):
        return _gather_pallas(x, idx_kn, W, T, _interpret())
    return _gather_ref(x, idx_kn, W, T)


def _scatter_impl(y, idx_kn, *, W, T):
    if _use_pallas(idx_kn, W, T):
        return _scatter_pallas(y, idx_kn, W, T, _interpret())
    return _scatter_ref(y, idx_kn, W, T)


# --------------------------------------------------------------------- #
# primitives (mirrors ops/nlist._register_invlist_primitives)

def _register():
    from jax.extend.core import Primitive
    from jax.interpreters import ad, batching, mlir

    gather_p = Primitive('newtonnet_window_gather')
    scatter_p = Primitive('newtonnet_window_scatter_sum')

    def gather_abstract(x, idx_kn, *, W, T):
        B, K, N = idx_kn.shape
        return jax.core.ShapedArray((B, K, N) + x.shape[2:], x.dtype)

    def scatter_abstract(y, idx_kn, *, W, T):
        B, K, N = idx_kn.shape
        return jax.core.ShapedArray((B, N) + y.shape[3:], y.dtype)

    gather_p.def_abstract_eval(gather_abstract)
    scatter_p.def_abstract_eval(scatter_abstract)
    gather_p.def_impl(_gather_impl)
    scatter_p.def_impl(_scatter_impl)
    mlir.register_lowering(
        gather_p, mlir.lower_fun(_gather_impl, multiple_results=False))
    mlir.register_lowering(
        scatter_p, mlir.lower_fun(_scatter_impl, multiple_results=False))

    ad.defjvp(gather_p,
              lambda g, x, idx, **kw: gather_p.bind(g, idx, **kw),
              None)
    ad.defjvp(scatter_p,
              lambda g, y, idx, **kw: scatter_p.bind(g, idx, **kw),
              None)

    def gather_transpose(ct, x, idx_kn, **kw):
        assert ad.is_undefined_primal(x)
        if type(ct) is ad.Zero:
            return [ad.Zero(x.aval), None]
        return [scatter_p.bind(ct, idx_kn, **kw), None]

    def scatter_transpose(ct, y, idx_kn, **kw):
        assert ad.is_undefined_primal(y)
        if type(ct) is ad.Zero:
            return [ad.Zero(y.aval), None]
        return [gather_p.bind(ct, idx_kn, **kw), None]

    ad.primitive_transposes[gather_p] = gather_transpose
    ad.primitive_transposes[scatter_p] = scatter_transpose

    def batch_rule(prim):
        def rule(args, dims, **kw):
            size = next(a.shape[d] for a, d in zip(args, dims)
                        if d is not None)

            def front(a, d):
                if d is None:
                    return jnp.broadcast_to(a[None], (size,) + a.shape)
                return jnp.moveaxis(a, d, 0)

            x, idx = (front(a, d) for a, d in zip(args, dims))

            def merge(a):
                return a.reshape((size * a.shape[1],) + a.shape[2:])

            out = prim.bind(merge(x), merge(idx), **kw)
            return out.reshape((size, -1) + out.shape[1:]), 0
        return rule

    batching.primitive_batchers[gather_p] = batch_rule(gather_p)
    batching.primitive_batchers[scatter_p] = batch_rule(scatter_p)
    return gather_p, scatter_p


_gather_p, _scatter_p = _register()


def window_gather(x, idx_kn, W, T=128):
    '''K-major neighbor gather as windowed one-hot MXU matmuls.

    out[b, k, n] = x[b, idx_kn[b, k, n]] for edges inside the block
    window, 0 outside (see module docstring). Requires cell-sorted atom
    labels (data/prelists.sort_by_cells) validated with check_window.

    Args:
        x: (B, N, ...) node features (bf16 exact; fp32 rounds to bf16).
        idx_kn: (B, K, N) int32 neighbor list, K-major.
        W: window rows (multiple of 128, <= N).
        T: atom rows per kernel block (N % T == 0).

    Returns:
        (B, K, N, ...) gathered features, dtype of x.
    '''
    return _gather_p.bind(x, idx_kn, W=int(W), T=int(T))


def window_scatter_sum(y, idx_kn, W, T=128):
    '''Adjoint of window_gather: out[b, j] = sum over in-window edges with
    idx[b, k, n] == j of y[b, k, n]. fp32 accumulation on the MXU.'''
    return _scatter_p.bind(y, idx_kn, W=int(W), T=int(T))
