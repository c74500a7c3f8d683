'''Pure-function NewtonNet core over the fused Pallas pair kernels.

Mirrors NewtonNetCore (models/newtonnet.py) numerically -- same parameter
pytree, same math, same masking -- but routes every pair-tensor operation
through the fused VMEM-resident kernels in ops/pallas_dense.py. Two entry
points:

* apply_core(params, model, z, pos, cell): primal forward, drop-in for
  core.apply in dense graph mode. Differentiable to first order
  (forces/virial/stress via grad-wrt-positions, energy-only training via
  grad-wrt-params) through the fused backward kernel.
* dual_energy(params, model, z, pos, cell, v): per-graph energies plus
  their directional derivative along the position tangent v, computed as
  one dual-number forward. jax.grad of a scalar built from its outputs is
  the reverse-over-forward force-training path (train/fastgrad.py);
  the node-level dual arithmetic here is plain jnp (auto-differentiated),
  the pair-level dual goes through make_fused_pair_interaction_dual's
  custom VJP.

Restrictions (checked in NewtonNet.__init__): dense graph mode, swish
activation, no layer_norm, outputs within {energy, gradient_force, virial,
stress}, fp32 params. The Hessian would need second-order AD through the
custom ops and is served by the XLA path.

Reference for the computation being fused: the interaction hot loop at
/root/reference/newtonnet/models/newtonnet.py:165-237 and the energy head
at /root/reference/newtonnet/models/output.py:90-100.
'''
import jax
import jax.numpy as jnp

from newtonnet_tpu.layers.representations import (
    polynomial_cutoff,
    radial_bessel,
    scaled_norm,
)
from newtonnet_tpu.ops.neighbors import dense_graph
from newtonnet_tpu.ops.pallas_dense import (
    make_fused_pair_interaction,
    make_fused_pair_interaction_dual,
)


def pick_bb(batch):
    '''Largest molecule-block size in {8, 4, 2, 1} dividing the batch
    (NEWTONNET_PALLAS_BB overrides, for VMEM-pressure tuning).'''
    import os
    forced = int(os.environ.get('NEWTONNET_PALLAS_BB', '0'))
    if forced and batch % forced == 0:
        return forced
    for bb in (8, 4, 2, 1):
        if batch % bb == 0:
            return bb
    return 1


def _interpret():
    '''Mosaic only targets TPU; everywhere else run the kernels in
    interpret mode (correct, slow -- tests / CPU mesh).'''
    return jax.default_backend() != 'tpu'


def _silu(x):
    return x * jax.nn.sigmoid(x)


def _dsilu(x):
    s = jax.nn.sigmoid(x)
    return s * (1.0 + x * (1.0 - s))


def _mlp2_dual(p, x, xdot):
    '''TorchLinear-act-TorchLinear (biased) with optional tangent.'''
    k0, b0 = p['TorchLinear_0']['kernel'], p['TorchLinear_0']['bias']
    k1, b1 = p['TorchLinear_1']['kernel'], p['TorchLinear_1']['bias']
    h = x @ k0 + b0
    m = _silu(h)
    y = m @ k1 + b1
    if xdot is None:
        return y, None
    hdot = xdot @ k0
    mdot = _dsilu(h) * hdot
    return y, mdot @ k1


def _geometry(model, z, pos, cell):
    '''adj (float mask) and the pos-differentiable edge features, with the
    Cartesian axis leading as the kernels require.'''
    atom_mask = z > 0

    def feats(x):
        disp, _ = dense_graph(x, cell, atom_mask, model.cutoff,
                              mic_mode=model.mic_mode)
        dist, dir_edge = scaled_norm(disp, model.cutoff)
        rbf = polynomial_cutoff(dist) * radial_bessel(dist, model.n_basis)
        return jnp.moveaxis(dir_edge, -1, 1), rbf  # (B,3,N,N), (B,N,N,R)

    _, adj = dense_graph(pos, cell, atom_mask, model.cutoff,
                         mic_mode=model.mic_mode)
    return adj.astype(pos.dtype), feats


def apply_core(params, model, z, pos, cell, fused=None):
    '''Primal forward: same outputs dict as NewtonNetCore.apply for the
    dense path with output_properties ['energy'] (atom_node, force_node,
    atomic_energy).'''
    adj, feats = _geometry(model, z, pos, cell)
    dir_t, rbf = feats(pos)
    return core_from_geom(params, model, z, adj, dir_t, rbf, fused=fused)


def core_from_geom(params, model, z, adj, dir_t, rbf, fused=None):
    '''apply_core given precomputed geometry (adj, dir (B,3,N,N),
    rbf (B,N,N,R)). Factoring the geometry out lets train/fastgrad.py
    compute it ONCE per train step and share it between the force vjp and
    the parameter-gradient surrogate (it is constant wrt params).'''
    p = params['params']
    B, N = z.shape
    F = model.n_features
    pos_dtype = dir_t.dtype
    if fused is None:
        # layer 0 sees force_node == 0 (zeros init): its kernel variant
        # skips the dead phi2 branch, mirroring InteractionNet.first_layer
        fused0 = make_fused_pair_interaction(
            bb=pick_bb(B), interpret=_interpret(),
            dot_dtype=jnp.dtype(model.pallas_dot_dtype), first_layer=True)
        fused = make_fused_pair_interaction(
            bb=pick_bb(B), interpret=_interpret(),
            dot_dtype=jnp.dtype(model.pallas_dot_dtype))
    else:
        fused0 = fused

    fmask = (z > 0).astype(pos_dtype)[..., None]
    atom_node = p['node_embedding'][z].astype(pos_dtype) * fmask
    force_t = jnp.zeros((B, 3, N, F), pos_dtype)

    for i in range(model.n_interactions):
        lp = p[f'interaction_{i}']
        np_, _ = _mlp2_dual(lp['message_nodepart'], atom_node, None)
        inv1, eq = (fused0 if i == 0 else fused)(
            np_, rbf, dir_t, adj, force_t,
            lp['message_edgepart']['kernel'],
            lp['equiv_message1']['TorchLinear_0']['kernel'],
            lp['equiv_message1']['TorchLinear_1']['kernel'],
            lp['equiv_message2']['TorchLinear_0']['kernel'],
            lp['equiv_message2']['TorchLinear_1']['kernel'])
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


def _mlp3(p, x, xdot=None):
    '''The 3-layer energy head F->F->F->1 with act between (ref
    output.py:90-96); returns tangent too when xdot is given.'''
    k0, b0 = p['TorchLinear_0']['kernel'], p['TorchLinear_0']['bias']
    k1, b1 = p['TorchLinear_1']['kernel'], p['TorchLinear_1']['bias']
    k2, b2 = p['TorchLinear_2']['kernel'], p['TorchLinear_2']['bias']
    h0 = x @ k0 + b0
    m0 = _silu(h0)
    h1 = m0 @ k1 + b1
    m1 = _silu(h1)
    y = m1 @ k2 + b2
    if xdot is None:
        return y
    h0dot = xdot @ k0
    m0dot = _dsilu(h0) * h0dot
    h1dot = m0dot @ k1
    m1dot = _dsilu(h1) * h1dot
    return y, m1dot @ k2


def dual_energy(params, model, z, pos, cell, v, fused_dual=None):
    '''Per-graph energies E (B,) and their directional derivative along the
    position tangent v (B, N, 3), in one dual-number forward.'''
    adj, feats = _geometry(model, z, pos, cell)
    (dir_t, rbf), (dirdot_t, rbfdot) = jax.jvp(feats, (pos,), (v,))
    return dual_energy_from_geom(params, model, z, adj, dir_t, rbf,
                                 dirdot_t, rbfdot, fused_dual=fused_dual)


def dual_energy_from_geom(params, model, z, adj, dir_t, rbf,
                          dirdot_t, rbfdot, fused_dual=None):
    '''dual_energy given precomputed primal + tangent geometry. The
    geometry carries no parameter dependence, so train/fastgrad.py hoists
    it out of the grad-of-surrogate (and shares the primal part with the
    force vjp) instead of re-tracing it inside.'''
    p = params['params']
    B, N = z.shape
    F = model.n_features
    pos_dtype = dir_t.dtype
    if fused_dual is None:
        # the dual kernels back the parameter-gradient surrogate only;
        # bf16 MXU passes there (fp32 accumulation) are mixed-precision
        # gradient noise, not a loss/force-path precision change
        grad_dt = jnp.dtype(getattr(model, 'pallas_grad_dot_dtype',
                                    model.pallas_dot_dtype))
        fused_dual0 = make_fused_pair_interaction_dual(
            bb=pick_bb(B), interpret=_interpret(), dot_dtype=grad_dt,
            first_layer=True)
        fused_dual = make_fused_pair_interaction_dual(
            bb=pick_bb(B), interpret=_interpret(), dot_dtype=grad_dt)
    else:
        fused_dual0 = fused_dual

    fmask = (z > 0).astype(pos_dtype)[..., None]
    atom_node = p['node_embedding'][z].astype(pos_dtype) * fmask
    atomdot = jnp.zeros_like(atom_node)
    force_t = jnp.zeros((B, 3, N, F), pos_dtype)
    forcedot_t = jnp.zeros_like(force_t)

    for i in range(model.n_interactions):
        lp = p[f'interaction_{i}']
        np_, npdot = _mlp2_dual(lp['message_nodepart'], atom_node, atomdot)
        inv1, eq, inv1dot, eqdot = (fused_dual0 if i == 0 else fused_dual)(
            np_, npdot, rbf, rbfdot, dir_t, dirdot_t, adj,
            force_t, forcedot_t,
            lp['message_edgepart']['kernel'],
            lp['equiv_message1']['TorchLinear_0']['kernel'],
            lp['equiv_message1']['TorchLinear_1']['kernel'],
            lp['equiv_message2']['TorchLinear_0']['kernel'],
            lp['equiv_message2']['TorchLinear_1']['kernel'])
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
