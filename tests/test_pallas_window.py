'''Windowed one-hot MXU gather/scatter (ops/pallas_window.py).

Parity of the Pallas kernels (interpret mode on CPU) against the exact
XLA reference semantics, mutual-transpose consistency, and the AD
surface (grad, jvp, vmap) of the registered primitives.

Measured outcome on real TPU hardware is in PERF_NOTES.md ("windowed
one-hot MXU gather"): the kernels run near MXU peak but lose to the
per-row DMA gather at production N because per-edge FLOPs scale with
the window width; they remain available for narrow-window layouts.
'''
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from newtonnet_tpu.ops.pallas_window import (
    _gather_ref,
    _scatter_ref,
    check_window,
    window_gather,
    window_margin,
    window_scatter_sum,
)

B, K, N, F = 2, 5, 256, 12
T, W = 128, 128


def _case(seed=0):
    rs = np.random.RandomState(seed)
    starts = np.repeat(
        np.array([(i * T + T // 2 - W // 2) % N for i in range(N // T)]), T)
    idx = ((starts[None, None, :] + rs.randint(0, W, size=(B, K, N))) % N
           ).astype(np.int32)
    mask = rs.rand(B, K, N) < 0.8
    x = rs.randn(B, N, F).astype(np.float32)
    y = rs.randn(B, K, N, F).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(mask), jnp.asarray(x), jnp.asarray(y)


def test_window_validators():
    idx, mask, _, _ = _case()
    assert check_window(idx, mask, W, T)
    assert window_margin(idx, mask, W, T) >= 0
    # an out-of-window valid edge is caught
    bad = idx.at[0, 0, 0].set((idx[0, 0, 0] + W + 7) % N)
    badmask = mask.at[0, 0, 0].set(True)
    assert not check_window(bad, badmask, W, T)
    assert window_margin(bad, badmask, W, T) < 0


def test_gather_kernel_parity(monkeypatch):
    # interpret mode is the only way to exercise the KERNEL body under the
    # suite's pinned CPU backend (without it _use_pallas dispatches to the
    # XLA reference and the comparison would be vacuous)
    monkeypatch.setenv('NEWTONNET_PALLAS_INTERPRET', '1')
    idx, mask, x, _ = _case()
    ref = _gather_ref(x, idx, W, T)
    out = window_gather(x, idx, W, T)
    assert out.shape == (B, K, N, F)
    # kernel rounds the fp32 payload to bf16
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-2)
    # bf16 payload is selected exactly (one-hot, no sums)
    xb = x.astype(jnp.bfloat16)
    assert bool(jnp.all(window_gather(xb, idx, W, T)
                        == _gather_ref(xb, idx, W, T)))


def test_scatter_kernel_parity(monkeypatch):
    monkeypatch.setenv('NEWTONNET_PALLAS_INTERPRET', '1')
    idx, mask, _, y = _case(1)
    ref = _scatter_ref(y, idx, W, T)
    out = window_scatter_sum(y, idx, W, T)
    assert out.shape == (B, N, F)
    scale = float(jnp.max(jnp.abs(ref)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-2 * scale)


def test_cpu_dispatch_is_exact_reference():
    # on non-TPU backends (this suite pins CPU) the public ops dispatch to
    # the XLA reference path: results must be BITWISE the reference's --
    # this is a dispatch test, not a kernel-parity test (see above)
    idx, mask, x, y = _case(1)
    assert bool(jnp.all(window_gather(x, idx, W, T)
                        == _gather_ref(x, idx, W, T)))
    assert bool(jnp.all(window_scatter_sum(y, idx, W, T)
                        == _scatter_ref(y, idx, W, T)))


def test_mutual_transpose_exact():
    # the XLA reference pair must be EXACT mutual transposes (window-drop
    # on both sides): <gather(x), y> == <x, scatter(y)> in fp64
    idx, _, x, y = _case(2)
    x64, y64 = x.astype(jnp.float64), y.astype(jnp.float64)
    lhs = jnp.sum(_gather_ref(x64, idx, W, T) * y64)
    rhs = jnp.sum(x64 * _scatter_ref(y64, idx, W, T))
    assert abs(float(lhs - rhs)) <= 1e-9 * abs(float(lhs))


def test_ad_surface():
    idx, _, x, y = _case(3)

    # transpose rule: grad of sum(gather * y) is scatter(y)
    g = jax.grad(lambda x: jnp.sum(window_gather(x, idx, W, T) * y))(x)
    np.testing.assert_allclose(np.asarray(g),
                               np.asarray(_scatter_ref(y, idx, W, T)),
                               rtol=1e-6)
    # jvp is the primitive itself (linearity)
    _, tangent = jax.jvp(lambda x: window_gather(x, idx, W, T), (x,), (x,))
    np.testing.assert_allclose(np.asarray(tangent),
                               np.asarray(_gather_ref(x, idx, W, T)),
                               rtol=1e-6)
    # grad-of-grad (the force-training composition) stays a gather/scatter
    def e(x):
        return jnp.sum(window_gather(x, idx, W, T) ** 2)
    hvp = jax.jvp(jax.grad(e), (x,), (x,))[1]
    assert hvp.shape == x.shape and bool(jnp.all(jnp.isfinite(hvp)))
    # vmap
    xs = jnp.stack([x, 2 * x])
    vm = jax.vmap(lambda x: window_gather(x, idx, W, T))(xs)
    np.testing.assert_allclose(np.asarray(vm[1]), 2 * np.asarray(vm[0]),
                               rtol=1e-6)
