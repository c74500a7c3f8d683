'''NewtonNet large-N (neighborlist) core over the fused K-list kernels.

Mirrors NewtonNetCore's neighborlist path (models/newtonnet.py:494-612 +
InteractionNet) numerically -- same parameter pytree, same math, same
masking -- but routes every pair-tensor operation through the fused
VMEM-resident kernels in ops/pallas_klist.py. The neighbor gathers stay in
XLA (Mosaic cannot do cross-tile gathers; ops/pallas_gather.py documents
the probe), so per layer HBM sees exactly ONE gathered (B, N, K, 4F) edge
tensor plus (N, *)-sized node tensors -- instead of the dozens of pair
materializations of the auto-differentiated XLA program (PERF_NOTES.md
"Round-3 large-N train-step study": the step is pure HBM traffic).

Entry points (both take a precomputed `nlist = (idx (B,N,K), mask)` or
build a plain top_k list in-jit when nlist is None):

* apply_core_nlist(params, model, z, pos, cell, nlist): primal forward,
  drop-in for core.apply in neighborlist mode. First-order differentiable
  (forces/virial/stress via grad-wrt-positions, energy-only training via
  grad-wrt-params) through the fused backward kernel.
* dual_energy_nlist(params, model, z, pos, cell, v, nlist): per-graph
  energies plus their directional derivative along the position tangent v.
  jax.grad of a scalar of its outputs is the reverse-over-forward force
  training path (train/fastgrad.py).

Edge tensors (cat_j, rbf and their tangents) ride in
model.compute_dtype (bfloat16 halves the gather traffic, matching the XLA
path's mixed-precision interaction stack); elementwise math runs fp32 in
VMEM.

Reference for the fused computation: the interaction hot loop at
/root/reference/newtonnet/models/newtonnet.py:207-237.
'''
import jax
import jax.numpy as jnp

from newtonnet_tpu.layers.representations import (
    polynomial_cutoff,
    radial_bessel,
    scaled_norm,
)
from newtonnet_tpu.models.pallas_stack import _interpret, _mlp2_dual, _mlp3
from newtonnet_tpu.ops.nlist import (
    gather_nodes,
    neighbor_list,
    recompute_displacements,
)
from newtonnet_tpu.ops.pallas_klist import (
    make_fused_klist_interaction,
    make_fused_klist_interaction_dual,
    pick_nb,
)


def _edge_dtype(model, pos):
    return jnp.dtype(model.compute_dtype) if model.compute_dtype \
        else pos.dtype


def _resolve_nlist(model, z, pos, cell, nlist):
    '''(idx (B,N,K) int32, kmask (B,N,K) bool) -- precomputed or built
    in-jit with the O(N^2) top_k search (idx is integer-valued, hence
    constant under AD, exactly like the XLA injit path).'''
    if nlist is not None:
        idx, kmask = nlist[0], nlist[1]
    else:
        idx, kmask, _, _ = neighbor_list(pos, cell, z > 0, model.cutoff,
                                         model.k_max,
                                         mic_mode=model.mic_mode)
    return idx, kmask


def _geometry(model, z, pos, cell, idx, kmask):
    '''Static mask (stale pairs tightened at current pos, as the XLA path
    does at newtonnet.py:541-543) and the pos-differentiable edge features
    in the kernels' N-major (B, N, K, ...) layout.'''

    def feats(x):
        disp = recompute_displacements(x, cell, idx,
                                       mic_mode=model.mic_mode)  # (B,N,K,3)
        dist, dir_edge = scaled_norm(disp, model.cutoff)
        rbf = polynomial_cutoff(dist) * radial_bessel(dist, model.n_basis)
        return jnp.moveaxis(dir_edge, -1, 1), rbf  # (B,3,N,K), (B,N,K,R)

    disp0 = recompute_displacements(pos, cell, idx, mic_mode=model.mic_mode)
    d2 = jnp.sum(disp0 * disp0, axis=-1)
    m = kmask & (d2 < model.cutoff * model.cutoff)
    return m.astype(jnp.float32), feats  # (B, N, K)


def _kernels(model, n, dual):
    interpret = _interpret()
    dot_dtype = jnp.dtype(model.pallas_dot_dtype)
    nb = pick_nb(n, dual=dual)
    make = make_fused_klist_interaction_dual if dual \
        else make_fused_klist_interaction
    first = make(nb=nb, interpret=interpret, dot_dtype=dot_dtype,
                 with_force=False)
    rest = make(nb=nb, interpret=interpret, dot_dtype=dot_dtype,
                with_force=True)
    return first, rest


def _layer_weights(lp):
    return (lp['message_edgepart']['kernel'],
            lp['equiv_message1']['TorchLinear_0']['kernel'],
            lp['equiv_message1']['TorchLinear_1']['kernel'],
            lp['equiv_message2']['TorchLinear_0']['kernel'],
            lp['equiv_message2']['TorchLinear_1']['kernel'])


def apply_core_nlist(params, model, z, pos, cell, nlist=None):
    '''Primal forward: same outputs dict as NewtonNetCore.apply for the
    neighborlist path with output_properties ['energy'].'''
    p = params['params']
    B, N = z.shape
    F = model.n_features
    edt = _edge_dtype(model, pos)
    fused_first, fused_rest = _kernels(model, N, dual=False)

    idx, kmask = _resolve_nlist(model, z, pos, cell, nlist)
    mask_f, feats = _geometry(model, z, pos, cell, idx, kmask)
    dir_t, rbf = feats(pos)
    dir_t = dir_t.astype(jnp.float32)
    rbf = rbf.astype(edt)

    fmask = (z > 0).astype(pos.dtype)[..., None]
    atom_node = p['node_embedding'][z].astype(pos.dtype) * fmask
    force_t = jnp.zeros((B, 3, N, F), pos.dtype)

    for i in range(model.n_interactions):
        lp = p[f'interaction_{i}']
        np_, _ = _mlp2_dual(lp['message_nodepart'], atom_node, None)
        if i == 0:
            cat_j = gather_nodes(np_.astype(edt), idx)   # (B, N, K, F)
            inv1, eq = fused_first(np_, cat_j, rbf, dir_t, mask_f,
                                   *_layer_weights(lp))
        else:
            cat = jnp.concatenate(
                [np_] + [force_t[:, d] for d in range(3)], axis=-1)
            cat_j = gather_nodes(cat.astype(edt), idx)   # (B, N, K, 4F)
            inv1, eq = fused_rest(np_, cat_j, rbf, dir_t, mask_f,
                                  *_layer_weights(lp))
        atom_node = atom_node + inv1
        force_t = force_t + eq
        u = jnp.einsum('bdnf,fg->bdng', force_t, lp['equiv_update']['kernel'])
        atom_node = atom_node + jnp.sum(force_t * u, axis=1)

    e = _mlp3(p['energy_head'], atom_node)
    e = e * p['scaler_energy']['scale'][z, 0][..., None]
    e = e + p['scaler_energy']['shift'][z, 0][..., None]
    return {
        'atom_node': atom_node,
        'force_node': jnp.moveaxis(force_t, 1, 2),  # (B, N, 3, F)
        'atomic_energy': e * fmask,
    }


def dual_energy_nlist(params, model, z, pos, cell, v, nlist=None):
    '''Per-graph energies E (B,) and their directional derivative along the
    position tangent v (B, N, 3), in one dual-number forward through the
    fused dual kernels.'''
    p = params['params']
    B, N = z.shape
    F = model.n_features
    edt = _edge_dtype(model, pos)
    dual_first, dual_rest = _kernels(model, N, dual=True)

    idx, kmask = _resolve_nlist(model, z, pos, cell, nlist)
    mask_f, feats = _geometry(model, z, pos, cell, idx, kmask)
    (dir_t, rbf), (dirdot_t, rbfdot) = jax.jvp(feats, (pos,), (v,))
    dir_t = dir_t.astype(jnp.float32)
    dirdot_t = dirdot_t.astype(jnp.float32)
    rbf = rbf.astype(edt)
    rbfdot = rbfdot.astype(edt)

    fmask = (z > 0).astype(pos.dtype)[..., None]
    atom_node = p['node_embedding'][z].astype(pos.dtype) * fmask
    atomdot = jnp.zeros_like(atom_node)
    force_t = jnp.zeros((B, 3, N, F), pos.dtype)
    forcedot_t = jnp.zeros_like(force_t)

    for i in range(model.n_interactions):
        lp = p[f'interaction_{i}']
        np_, npdot = _mlp2_dual(lp['message_nodepart'], atom_node, atomdot)
        if i == 0:
            cat_j = gather_nodes(np_.astype(edt), idx)
            catdot_j = gather_nodes(npdot.astype(edt), idx)
            inv1, eq, inv1dot, eqdot = dual_first(
                np_, npdot, cat_j, catdot_j, rbf, rbfdot, dir_t, dirdot_t,
                mask_f, *_layer_weights(lp))
        else:
            cat = jnp.concatenate(
                [np_] + [force_t[:, d] for d in range(3)], axis=-1)
            catdot = jnp.concatenate(
                [npdot] + [forcedot_t[:, d] for d in range(3)], axis=-1)
            cat_j = gather_nodes(cat.astype(edt), idx)
            catdot_j = gather_nodes(catdot.astype(edt), idx)
            inv1, eq, inv1dot, eqdot = dual_rest(
                np_, npdot, cat_j, catdot_j, rbf, rbfdot, dir_t, dirdot_t,
                mask_f, *_layer_weights(lp))
        atom_node = atom_node + inv1
        atomdot = atomdot + inv1dot
        force_t = force_t + eq
        forcedot_t = forcedot_t + eqdot
        ku = lp['equiv_update']['kernel']
        u = jnp.einsum('bdnf,fg->bdng', force_t, ku)
        udot = jnp.einsum('bdnf,fg->bdng', forcedot_t, ku)
        atom_node = atom_node + jnp.sum(force_t * u, axis=1)
        atomdot = atomdot + jnp.sum(forcedot_t * u + force_t * udot, axis=1)

    e, edot = _mlp3(p['energy_head'], atom_node, atomdot)
    scale = p['scaler_energy']['scale'][z, 0][..., None]
    shift = p['scaler_energy']['shift'][z, 0][..., None]
    e = (e * scale + shift) * fmask
    edot = edot * scale * fmask
    return jnp.sum(e[..., 0], axis=-1), jnp.sum(edot[..., 0], axis=-1)
