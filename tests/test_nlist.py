'''Neighbor-list path: construction correctness and dense-vs-sparse model
equivalence (same parameters must give identical outputs when K is large
enough to hold every in-range neighbor).'''
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from newtonnet_tpu.models import NewtonNet
from newtonnet_tpu.ops.neighbors import dense_graph
from newtonnet_tpu.ops.nlist import neighbor_list

F64 = jnp.float64


def _random_system(rng_seed, B, N, periodic=False):
    rs = np.random.RandomState(rng_seed)
    z = rs.choice([1, 6, 8], size=(B, N)).astype(np.int32)
    z[:, -2:] = 0
    pos = rs.randn(B, N, 3) * 3.0
    cell = np.zeros((B, 3, 3))
    if periodic:
        for b in range(B):
            cell[b] = np.diag([9.0, 8.0, 10.0])
            pos[b] = pos[b] % np.diag(cell[b])
    return jnp.asarray(z), jnp.asarray(pos, F64), jnp.asarray(cell, F64)


@pytest.mark.parametrize('periodic', [False, True])
def test_neighbor_list_matches_dense(periodic):
    z, pos, cell = _random_system(0, 2, 12, periodic)
    mask = z > 0
    cutoff = 5.0
    disp_d, adj = dense_graph(pos, cell, mask, cutoff)
    idx, kmask, disp_nl, overflow = neighbor_list(pos, cell, mask, cutoff,
                                                  k_max=11)
    assert int(overflow.sum()) == 0
    # same neighbor sets
    counts_dense = np.asarray(jnp.sum(adj, axis=-1))
    counts_nl = np.asarray(jnp.sum(kmask, axis=-1))
    np.testing.assert_array_equal(counts_dense, counts_nl)
    # same displacements per (i, j) pair
    for b in range(z.shape[0]):
        for i in range(z.shape[1]):
            pairs_nl = {int(j): np.asarray(disp_nl[b, i, k])
                        for k, j in enumerate(np.asarray(idx[b, i]))
                        if kmask[b, i, k]}
            for j in range(z.shape[1]):
                if adj[b, i, j]:
                    np.testing.assert_allclose(
                        pairs_nl[j], np.asarray(disp_d[b, i, j]), atol=1e-12)


def test_neighbor_list_overflow_reported():
    z, pos, cell = _random_system(1, 1, 10)
    mask = z > 0
    _, _, _, overflow = neighbor_list(pos, cell, mask, 50.0, k_max=3)
    assert int(overflow.sum()) > 0


@pytest.mark.parametrize('reverse_lists', [False, True])
@pytest.mark.parametrize('periodic', [False, True])
def test_model_dense_vs_neighborlist(rng, periodic, reverse_lists):
    '''Same params, both graph modes -> identical energies and forces
    (with either the plain-gather or the reverse-list backward).'''
    z, pos, cell = _random_system(2, 2, 10, periodic)
    common = dict(n_features=16, n_basis=8, n_interactions=2,
                  output_properties=['energy', 'gradient_force'],
                  param_dtype=F64)
    dense_model = NewtonNet(graph_mode='dense', **common)
    nl_model = NewtonNet(graph_mode='neighborlist', k_max=9,
                         reverse_lists=reverse_lists, **common)
    params = dense_model.init(rng, z, pos, cell)
    out_d = dense_model.apply(params, z, pos, cell)
    out_n = nl_model.apply(params, z, pos, cell)  # identical param layout
    np.testing.assert_allclose(out_d['energy'], out_n['energy'], rtol=1e-10)
    np.testing.assert_allclose(out_d['gradient_force'],
                               out_n['gradient_force'], atol=1e-10)


@pytest.mark.slow
def test_neighbor_list_triclinic():
    '''Triclinic periodic cells through the neighbor-list path (exact MIC).'''
    rs = np.random.RandomState(9)
    cell_np = np.array([[[9.0, 0.0, 0.0],
                         [2.5, 8.5, 0.0],
                         [-1.0, 1.2, 9.5]]])
    pos = jnp.asarray(rs.rand(1, 12, 3), F64) @ jnp.asarray(cell_np[0], F64)
    z = jnp.asarray(rs.choice([1, 6], size=(1, 12)), jnp.int32)
    cell = jnp.asarray(cell_np, F64)
    common = dict(n_features=8, n_basis=4, n_interactions=1,
                  output_properties=['energy', 'gradient_force'],
                  mic_mode='exact', param_dtype=F64)
    dense_model = NewtonNet(graph_mode='dense', **common)
    nl_model = NewtonNet(graph_mode='neighborlist', k_max=11, **common)
    params = dense_model.init(jax.random.PRNGKey(0), z, pos, cell)
    out_d = dense_model.apply(params, z, pos, cell)
    out_n = nl_model.apply(params, z, pos, cell)
    np.testing.assert_allclose(out_d['energy'], out_n['energy'], rtol=1e-10)
    np.testing.assert_allclose(out_d['gradient_force'],
                               out_n['gradient_force'], atol=1e-10)
    # lattice translation invariance through the nlist path
    pos2 = pos.at[0, 3].add(jnp.asarray(cell_np[0, 1], F64))
    out_n2 = nl_model.apply(params, z, pos2, cell)
    np.testing.assert_allclose(out_n['energy'], out_n2['energy'], rtol=1e-9)


def test_precomputed_reverse_lists(rng):
    '''nlist 4-tuple (idx, mask, rev, rev_mask) == in-step reverse build.'''
    from newtonnet_tpu.ops.nlist import build_reverse_list

    z, pos, cell = _random_system(4, 2, 10, periodic=True)
    model = NewtonNet(graph_mode='neighborlist', k_max=9, reverse_lists=True,
                      n_features=16, n_basis=8, n_interactions=2,
                      output_properties=['energy', 'gradient_force'],
                      param_dtype=F64)
    params = model.init(rng, z, pos, cell)
    idx, kmask, _, _ = neighbor_list(pos, cell, z > 0, 5.0, 9)
    rev, rev_mask = build_reverse_list(idx, kmask)
    out_in_step = model.apply(params, z, pos, cell, nlist=(idx, kmask))
    out_pre = model.apply(params, z, pos, cell,
                          nlist=(idx, kmask, rev, rev_mask))
    np.testing.assert_allclose(out_in_step['energy'], out_pre['energy'],
                               rtol=1e-12)
    np.testing.assert_allclose(out_in_step['gradient_force'],
                               out_pre['gradient_force'], atol=1e-12)


def test_symmetrize_slots_involution():
    '''Shared-slot re-coloring preserves the edge set and is a per-slot
    involution (idx[idx[:, c], c] == arange wherever valid).'''
    from newtonnet_tpu.ops.nlist import symmetrize_slots

    z, pos, cell = _random_system(5, 2, 14, periodic=True)
    idx, kmask, _, _ = neighbor_list(pos, cell, z > 0, 5.0, 13)
    idx2, kmask2 = symmetrize_slots(np.asarray(idx), np.asarray(kmask))
    assert int(kmask2.sum()) == int(kmask.sum())
    for b in range(idx2.shape[0]):
        ii = np.where(kmask2[b], idx2[b], np.arange(idx2.shape[1])[:, None])
        np.testing.assert_array_equal(
            np.take_along_axis(ii, ii, axis=0),
            np.broadcast_to(np.arange(idx2.shape[1])[:, None], ii.shape))
        # same undirected edge sets
        for i in range(idx2.shape[1]):
            s_old = {int(j) for k, j in enumerate(np.asarray(idx[b, i]))
                     if kmask[b, i, k]}
            s_new = {int(j) for k, j in enumerate(idx2[b, i])
                     if kmask2[b, i, k]}
            assert s_old == s_new


@pytest.mark.slow
def test_inverse_lists_match_plain(rng):
    '''inverse_lists (scatter-free backward via symmetric-slotted lists)
    == the plain path: values, forces, stress, and grad-of-force-loss.'''
    from newtonnet_tpu.ops.nlist import symmetrize_slots

    z, pos, cell = _random_system(6, 2, 12, periodic=True)
    idx, kmask, _, _ = neighbor_list(pos, cell, z > 0, 5.0, 11)
    idx2, kmask2 = symmetrize_slots(np.asarray(idx), np.asarray(kmask))
    idx2 = jnp.asarray(idx2)
    kmask2 = jnp.asarray(kmask2)
    inv_kn = jnp.swapaxes(idx2, 1, 2)
    invm_kn = jnp.swapaxes(kmask2, 1, 2)
    common = dict(graph_mode='neighborlist', k_max=11, n_features=16,
                  n_basis=8, n_interactions=2,
                  output_properties=['energy', 'gradient_force', 'stress'],
                  param_dtype=F64)
    plain = NewtonNet(**common)
    invm = NewtonNet(inverse_lists=True, **common)
    params = plain.init(rng, z, pos, cell)
    nl_p = (idx2, kmask2)
    nl_i = (idx2, kmask2, inv_kn, invm_kn)
    out_p = plain.apply(params, z, pos, cell, nlist=nl_p)
    out_i = invm.apply(params, z, pos, cell, nlist=nl_i)
    for key in ('energy', 'gradient_force', 'stress'):
        np.testing.assert_allclose(out_p[key], out_i[key], atol=1e-12)

    def loss(model, nl):
        def f(p):
            o = model.apply(p, z, pos, cell, nlist=nl)
            return (jnp.sum(o['gradient_force'] ** 2)
                    + jnp.sum(o['energy'] ** 2))
        return f

    g_p = jax.grad(loss(plain, nl_p))(params)
    g_i = jax.grad(loss(invm, nl_i))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_i)):
        np.testing.assert_allclose(a, b, atol=1e-10)


def test_newton3_half_list_structure():
    '''newton3_half_list stores each undirected edge exactly once, per-slot
    maps are injective on BOTH sides (out rows by construction, in rows via
    the Koenig coloring), and the slot count hits the Koenig Delta bound.'''
    from newtonnet_tpu.ops.nlist import newton3_half_list

    z, pos, cell = _random_system(7, 2, 16, periodic=True)
    idx, kmask, _, _ = neighbor_list(pos, cell, z > 0, 5.0, 15)
    idxn, kmn = np.asarray(idx), np.asarray(kmask)
    idx2, m2 = newton3_half_list(idxn, kmn)
    B, N, K2 = idx2.shape
    for b in range(B):
        full = set()
        for i in range(N):
            for k in range(idxn.shape[2]):
                if kmn[b, i, k]:
                    j = int(idxn[b, i, k])
                    full.add((min(i, j), max(i, j)))
        half = [(min(i, int(idx2[b, i, k])), max(i, int(idx2[b, i, k])))
                for i in range(N) for k in range(K2) if m2[b, i, k]]
        assert len(half) == len(set(half)) == len(full)
        assert set(half) == full
        # in-side injectivity: within each slot k, no target atom repeats
        for k in range(K2):
            tgt = idx2[b, :, k][m2[b, :, k]]
            assert len(tgt) == len(set(tgt.tolist()))
    # Koenig bound (K2 is padded to the batch max, so check globally):
    # K2 == max over batches of max(out-degree, in-degree)
    delta = max(max(m2[b].sum(axis=1).max(),
                    np.bincount(idx2[b][m2[b]].ravel(), minlength=N).max())
                for b in range(B))
    assert K2 == delta


@pytest.mark.slow
def test_newton3_matches_plain(rng):
    '''newton3 half-list path (each undirected edge computed once,
    aggregated onto both endpoints) == the plain full-list path: values,
    forces, stress, and grad-of-force-loss.'''
    from newtonnet_tpu.ops.nlist import build_inverse_list, newton3_half_list

    z, pos, cell = _random_system(8, 2, 12, periodic=True)
    idx, kmask, _, _ = neighbor_list(pos, cell, z > 0, 5.0, 11)
    idx2, m2 = newton3_half_list(np.asarray(idx), np.asarray(kmask))
    K2 = idx2.shape[-1]
    idx2 = jnp.asarray(idx2)
    m2 = jnp.asarray(m2)
    inv_kn, invm_kn = build_inverse_list(jnp.swapaxes(idx2, 1, 2),
                                         jnp.swapaxes(m2, 1, 2))
    common = dict(graph_mode='neighborlist', n_features=16,
                  n_basis=8, n_interactions=3,
                  output_properties=['energy', 'gradient_force', 'stress'],
                  param_dtype=F64)
    plain = NewtonNet(k_max=11, **common)
    n3 = NewtonNet(k_max=K2, newton3=True, **common)
    params = plain.init(rng, z, pos, cell)
    nl_p = (idx, kmask)
    nl_3 = (idx2, m2, inv_kn, invm_kn)
    out_p = plain.apply(params, z, pos, cell, nlist=nl_p)
    out_3 = n3.apply(params, z, pos, cell, nlist=nl_3)
    for key in ('energy', 'gradient_force', 'stress'):
        np.testing.assert_allclose(out_p[key], out_3[key], atol=1e-11)

    def loss(model, nl):
        def f(p):
            o = model.apply(p, z, pos, cell, nlist=nl)
            return (jnp.sum(o['gradient_force'] ** 2)
                    + jnp.sum(o['energy'] ** 2))
        return f

    g_p = jax.grad(loss(plain, nl_p))(params)
    g_3 = jax.grad(loss(n3, nl_3))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_3)):
        np.testing.assert_allclose(a, b, atol=1e-9)


def test_newton3_star_graph_konig_bound():
    '''Regression: a degree-5 star must orient balanced (the Eulerian
    orientation pairs odd-degree vertices with virtual edges), so the half
    list needs ceil(5/2) = 3 slots, not 5 -- and the native C++ builder
    agrees with the Python one.'''
    from newtonnet_tpu import native
    from newtonnet_tpu.ops.nlist import newton3_half_list

    N, K = 6, 5  # hub atom 0 bonded to atoms 1..5, leaves see only the hub
    idx = np.zeros((N, K), np.int64)
    kmask = np.zeros((N, K), bool)
    idx[0] = np.arange(1, 6)
    kmask[0] = True
    for j in range(1, 6):
        idx[j, 0] = 0
        kmask[j, 0] = True
    idx2, m2 = newton3_half_list(idx, kmask)
    assert idx2.shape[-1] == 3  # ceil(max degree / 2)
    assert int(m2.sum()) == 5  # each undirected edge stored once
    if native.available() or native.ensure_built():
        i2n, m2n = native.newton3_half_list_native(idx.astype(np.int32),
                                                   kmask)
        assert i2n.shape[-1] == 3
        assert int(m2n.sum()) == 5


def test_invlist_primitives_all_derivative_modes():
    '''inv_gather / inv_scatter_sum are registered primitives with jvp,
    transpose, and batching rules: every composition (vjp, jvp,
    grad-of-grad, jvp-of-grad, vmap) matches the plain-gather reference.'''
    from newtonnet_tpu.ops.nlist import (build_inverse_list, gather_nodes,
                                         inv_gather, inv_scatter_sum,
                                         symmetrize_slots)

    rs = np.random.RandomState(0)
    B, N, K, F = 2, 10, 7, 5
    pos = jnp.asarray(rs.rand(B, N, 3) * 6)
    idx, kmask, _, _ = neighbor_list(pos, jnp.zeros((B, 3, 3)),
                                     jnp.ones((B, N), bool), 3.0, K)
    idx2, m2 = symmetrize_slots(np.asarray(idx), np.asarray(kmask))
    idx_kn = jnp.swapaxes(jnp.asarray(idx2), 1, 2)
    m_kn = jnp.swapaxes(jnp.asarray(m2), 1, 2)
    inv, invm = build_inverse_list(idx_kn, m_kn)
    Kc = idx_kn.shape[1]
    x = jnp.asarray(rs.randn(B, N, F))
    dx = jnp.asarray(rs.randn(B, N, F))
    y = jnp.asarray(rs.randn(B, Kc, N, F)) * m_kn[..., None]

    # primal + scatter vs dense reference
    g = inv_gather(x, idx_kn, inv, invm)
    np.testing.assert_array_equal(np.asarray(g),
                                  np.asarray(gather_nodes(x, idx_kn)))
    s = inv_scatter_sum(y, idx_kn, inv, invm)
    ref = np.zeros((B, N, F))
    for b in range(B):
        for k in range(Kc):
            for n in range(N):
                if m_kn[b, k, n]:
                    ref[b, idx_kn[b, k, n]] += np.asarray(y[b, k, n])
    np.testing.assert_allclose(np.asarray(s), ref, atol=1e-12)

    f = lambda x: jnp.sum(  # noqa: E731
        (inv_gather(x, idx_kn, inv, invm) * m_kn[..., None]) ** 2)
    f_ref = lambda x: jnp.sum(  # noqa: E731
        (gather_nodes(x, idx_kn) * m_kn[..., None]) ** 2)
    # vjp
    np.testing.assert_allclose(jax.grad(f)(x), jax.grad(f_ref)(x),
                               atol=1e-12)
    # jvp
    _, jv = jax.jvp(lambda x: inv_gather(x, idx_kn, inv, invm), (x,), (dx,))
    np.testing.assert_array_equal(np.asarray(jv),
                                  np.asarray(gather_nodes(dx, idx_kn)))
    # grad-of-grad
    gg = jax.grad(lambda x: jnp.sum(jax.grad(f)(x) ** 2))(x)
    gg_ref = jax.grad(lambda x: jnp.sum(jax.grad(f_ref)(x) ** 2))(x)
    np.testing.assert_allclose(gg, gg_ref, atol=1e-10)
    # jvp-of-grad (blocked Hessian lanes)
    _, hv = jax.jvp(jax.grad(f), (x,), (dx,))
    _, hv_ref = jax.jvp(jax.grad(f_ref), (x,), (dx,))
    np.testing.assert_allclose(hv, hv_ref, atol=1e-10)
    # vmap (batched and broadcast operands)
    xs = jnp.stack([x, 2 * x])
    out_v = jax.vmap(inv_gather, in_axes=(0, None, None, None))(
        xs, idx_kn, inv, invm)
    np.testing.assert_allclose(out_v[1], 2 * g, atol=0)


def test_pallas_gather_interpret_parity(monkeypatch):
    '''NEWTONNET_GATHER=pallas routes the inv-list primitives through the
    VMEM-resident Pallas row gather (interpret mode on CPU); values and
    every derivative mode match the XLA path bit-for-bit.'''
    from newtonnet_tpu.ops.nlist import (build_inverse_list, inv_gather,
                                         inv_scatter_sum, symmetrize_slots)

    rs = np.random.RandomState(3)
    B, N, K, F = 2, 16, 12, 128
    pos = jnp.asarray(rs.rand(B, N, 3) * 8)
    idx, kmask, _, _ = neighbor_list(pos, jnp.zeros((B, 3, 3)),
                                     jnp.ones((B, N), bool), 3.0, K)
    idx2, m2 = symmetrize_slots(np.asarray(idx), np.asarray(kmask))
    idx_kn = jnp.swapaxes(jnp.asarray(idx2), 1, 2)
    m_kn = jnp.swapaxes(jnp.asarray(m2), 1, 2)
    inv, invm = build_inverse_list(idx_kn, m_kn)
    Kc = idx_kn.shape[1]
    # float32: eligible() rejects f64, which would silently keep BOTH
    # passes on the XLA path and test nothing (the gather itself is exact
    # in any dtype, so array_equal still holds downstream)
    x = jnp.asarray(rs.randn(B, N, F), jnp.float32)
    y = jnp.asarray(rs.randn(B, Kc, N, F), jnp.float32) * m_kn[..., None]

    def everything():
        g = inv_gather(x, idx_kn, inv, invm)
        s = inv_scatter_sum(y, idx_kn, inv, invm)
        loss = lambda x: jnp.sum(  # noqa: E731
            (inv_gather(x, idx_kn, inv, invm) * m_kn[..., None]) ** 2)
        dx = jax.grad(loss)(x)
        ddx = jax.grad(lambda x: jnp.sum(jax.grad(loss)(x) ** 2))(x)
        return [np.asarray(v) for v in (g, s, dx, ddx)]

    ref = everything()
    monkeypatch.setenv('NEWTONNET_GATHER', 'pallas')
    monkeypatch.setenv('NEWTONNET_PALLAS_INTERPRET', '1')
    from newtonnet_tpu.ops import pallas_gather
    assert pallas_gather.eligible(
        jax.ShapeDtypeStruct((B, N, F), jnp.float32), Kc * N)
    calls = []
    real_row_gather = pallas_gather.row_gather
    monkeypatch.setattr(pallas_gather, 'row_gather',
                        lambda *a: calls.append(1) or real_row_gather(*a))
    got = everything()
    assert calls, 'pallas row_gather was never invoked -- test is vacuous'
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(a, b)
