'''Halo-exchange graph parallelism: boundary-only communication for large
atomistic systems (SURVEY.md sections 2.3/5; supersedes the all-gather path
in parallel/graph_parallel.py for 10k+-atom systems).

Atoms are sorted along x (fractional x for periodic cells) and split into
contiguous slabs, one per device on the mesh's 'graph' axis. Each shard owns
N_loc atoms; because the order is spatial, every neighbor of an own atom
within the model cutoff lives either in the shard itself or among the first/
last `n_halo` atoms of the adjacent shards. Per message-passing layer each
shard therefore exchanges only those boundary blocks with its ring
neighbors (jax.lax.ppermute over ICI) -- communication and memory scale
with the boundary (n_halo), not with the total atom count, unlike the
reference's single-device O(N^2) graph (newtonnet/layers/
representations.py:70-98) and round 1's per-layer all-gather.

Shape/dataflow per shard (B graphs on the 'data' axis):

    own:  pos (B, N_loc, 3)     sorted slab, owned
    ext:  [left halo | own | right halo]  (B, N_loc + 2H, .)
    idx:  (B, N_loc, K) neighbor indices INTO the ext axis
          (ops/nlist.neighbor_list_rect, self-edges excluded at offset H)

Derivatives: jax.grad runs inside the same SPMD program; the ppermute of a
halo exchange transposes to the reverse ppermute, so cross-shard force
contributions (dE_j/dpos_mine for j owned elsewhere) arrive automatically
and exactly. Validity requires slab width > cutoff (i.e. n_devices not too
large for the box) and n_halo large enough to cover every atom within
`cutoff` of a slab boundary -- check_halo_capacity verifies both from the
sorted positions.

The ring wraps, so periodic cells parallelize naturally: shard 0's left
halo is the last slab's right boundary, and the minimum-image convention
maps the displacement across the wrap. Requires >= 2 shards on the graph
axis (with one shard the wrapped halo would duplicate local edges); use the
plain neighborlist path for a single device.
'''
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from newtonnet_tpu.ops.linalg3 import det3x3

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map


def exchange_halo(x, n_halo, axis_name):
    '''Ring-exchange boundary blocks: (B, N_loc, ...) -> (B, N_loc+2H, ...).

    Returns [left halo | own | right halo] along axis 1, where the left
    halo is the right-boundary block (last H atoms) of the left ring
    neighbor and vice versa. Communication: 2 * H * feature_size per shard
    per call, independent of the global atom count.
    '''
    d = jax.lax.axis_size(axis_name)
    n_loc = x.shape[1]
    if not 0 < n_halo <= n_loc:
        raise ValueError(f'n_halo must be in [1, N_loc={n_loc}]; got '
                         f'{n_halo} (n_halo=0 would slice x[:, -0:] as the '
                         'whole shard)')
    if d == 2 and 2 * n_halo > n_loc:
        raise ValueError(
            f'with 2 graph shards both halos come from the same neighbor; '
            f'2*n_halo={2 * n_halo} > N_loc={n_loc} would duplicate atoms '
            'in the extended axis and double-count their edges')
    first = x[:, :n_halo]
    last = x[:, -n_halo:]
    # shard i receives `last` from shard i-1 (left neighbor): perm sends i -> i+1
    left = jax.lax.ppermute(last, axis_name,
                            [(i, (i + 1) % d) for i in range(d)])
    # shard i receives `first` from shard i+1 (right neighbor)
    right = jax.lax.ppermute(first, axis_name,
                             [(i, (i - 1) % d) for i in range(d)])
    return jnp.concatenate([left, x, right], axis=1)


# ---------------------------------------------------------------------- #
# host-side data preparation


def spatial_sort(z, pos, cell=None, extra=None, n_shards=1):
    '''Sort atoms of each graph along x for slab decomposition (numpy).

    Periodic graphs sort on fractional x (so skewed cells still decompose
    into lattice-aligned slabs); padding atoms (z == 0) sort to the end.
    Pads the atom axis to a multiple of n_shards.

    Args:
        z: (B, N) int; pos: (B, N, 3); cell: (B, 3, 3) or None;
        extra: optional dict of (B, N, ...) per-atom arrays to permute
            alongside (e.g. force labels).

    Returns:
        (z_sorted, pos_sorted, extra_sorted) with N padded to a multiple
        of n_shards.
    '''
    z = np.asarray(z)
    pos = np.asarray(pos)
    B, N = z.shape
    extra = {k: np.asarray(v) for k, v in (extra or {}).items()}

    keys = np.empty((B, N))
    for b in range(B):
        x = pos[b, :, 0]
        if cell is not None and np.any(cell[b] != 0):
            frac = np.linalg.solve(np.asarray(cell[b]).T, pos[b].T).T
            x = frac[:, 0] % 1.0
        keys[b] = np.where(z[b] > 0, x, np.inf)  # padding last
    order = np.argsort(keys, axis=1, kind='stable')

    take = np.take_along_axis
    z_s = take(z, order, axis=1)
    pos_s = take(pos, order[..., None], axis=1)
    extra_s = {k: take(v, order.reshape(order.shape + (1,) * (v.ndim - 2)),
                       axis=1)
               for k, v in extra.items()}

    pad = (-N) % n_shards
    if pad:
        z_s = np.pad(z_s, ((0, 0), (0, pad)))
        pos_s = np.pad(pos_s, ((0, 0), (0, pad), (0, 0)))
        extra_s = {k: np.pad(v, ((0, 0), (0, pad)) + ((0, 0),) * (v.ndim - 2))
                   for k, v in extra_s.items()}
    return z_s, pos_s, extra_s


def check_halo_capacity(z, pos, cell, n_shards, n_halo, cutoff):
    '''Validate the slab decomposition for sorted positions (numpy).

    For every shard boundary, every real atom within `cutoff` (along the
    sort coordinate) of the boundary must fall inside the adjacent n_halo
    block. Returns the number of violating atoms (0 = safe); also counts
    slabs narrower than the cutoff (which would need next-nearest-shard
    communication that the ring exchange does not provide).
    '''
    z = np.asarray(z)
    pos = np.asarray(pos)
    B, N = z.shape
    assert N % n_shards == 0
    n_loc = N // n_shards
    violations = 0
    for b in range(B):
        x = pos[b, :, 0].astype(float)
        periodic = cell is not None and np.any(np.asarray(cell[b]) != 0)
        width = None
        if periodic:
            c = np.asarray(cell[b])
            frac = np.linalg.solve(c.T, pos[b].T).T
            x = frac[:, 0] % 1.0
            # fractional width of a Cartesian cutoff r along frac-x: the
            # spacing between frac-x planes is d_perp = V / |a2 x a3|
            # (equals |a1| only for orthogonal cells -- using |a1| would
            # undersize the halo for skewed cells by 1/cos(tilt))
            d_perp = abs(np.linalg.det(c)) / np.linalg.norm(
                np.cross(c[1], c[2]))
            width = cutoff / d_perp
        else:
            width = cutoff
        real = z[b] > 0
        for s in range(n_shards):
            lo, hi = s * n_loc, (s + 1) * n_loc
            own = np.arange(lo, hi)
            own_real = own[real[lo:hi]]
            if own_real.size == 0:
                continue
            x_lo, x_hi = x[own_real].min(), x[own_real].max()
            if x_hi - x_lo < width and n_shards > 2:
                violations += 1  # slab narrower than the cutoff
            # atoms near the left boundary must lie in the first n_halo slots
            near_left = own_real[x[own_real] < x_lo + width]
            violations += int(np.sum(near_left >= lo + n_halo))
            near_right = own_real[x[own_real] > x_hi - width]
            violations += int(np.sum(near_right < hi - n_halo))
    return violations


# ---------------------------------------------------------------------- #
# sharded model functions


def _halo_core(model, graph_axis, n_halo, mesh=None):
    if model.graph_mode != 'neighborlist':
        raise ValueError("halo exchange requires graph_mode='neighborlist' "
                         "(use parallel/graph_parallel.py for the dense "
                         "all-gather path)")
    if n_halo < 1:
        raise ValueError('n_halo must be >= 1 (with halo=0 the core builds '
                         'a purely local graph, silently dropping every '
                         'cross-shard edge)')
    if mesh is not None and mesh.shape[graph_axis] < 2:
        raise ValueError(
            'halo exchange needs >= 2 shards on the graph axis (with one '
            'shard the wrapped halo duplicates local atoms as distance-0 '
            'ghosts); use the plain neighborlist path instead')
    return model.core.clone(shard_axis=graph_axis, halo=n_halo)


def make_halo_energy_force_fn(model, mesh, n_halo, data_axis='data',
                              graph_axis='graph', compute_stress=False):
    '''Jitted (params, z, pos, cell) -> (energy (B,), forces (B, N, 3))
    with the batch sharded over `data_axis` and atoms (pre-sorted with
    spatial_sort) over `graph_axis` with halo exchange.

    With compute_stress=True also returns stress (B, 3, 3) (and the model
    cell must be periodic): the strain displacement of the virial trick
    (models/output.py:168-197) is applied to each shard's LOCAL positions
    BEFORE the in-core halo exchange, so the displacement cotangent rides
    the same transposed ppermutes as the force cotangent -- each shard's
    disp grad accumulates every energy term that touches its own atoms,
    and the psum over shards counts each exactly once (the cell path is
    local to the shard whose energy it enters).
    '''
    core = _halo_core(model, graph_axis, n_halo, mesh)

    def local_fn(params, z, pos, cell):
        atom_mask = z > 0

        def local_energy(pos, disp):
            sym = 0.5 * (disp + jnp.swapaxes(disp, -1, -2))
            pos_d = jnp.einsum('bni,bij->bnj', pos, sym)
            cell_d = jnp.einsum('bxi,bij->bxj', cell, sym)
            out = core.apply(params, z, pos_d, cell_d)
            e_local = jnp.sum(out['atomic_energy'][..., 0]
                              * atom_mask.astype(pos.dtype), axis=-1)
            # differentiate the LOCAL energy sum; the halo ppermutes
            # transpose to reverse ppermutes that deliver cross-shard
            # dE_other/dpos_mine terms (see graph_parallel.py for the
            # double-counting rationale)
            return jnp.sum(e_local), e_local

        disp = jnp.broadcast_to(jnp.eye(3, dtype=pos.dtype),
                                (pos.shape[0], 3, 3))
        (_, e_local), (pos_grad, disp_grad) = jax.value_and_grad(
            local_energy, argnums=(0, 1), has_aux=True)(pos, disp)
        energy = jax.lax.psum(e_local, graph_axis)
        if not compute_stress:
            return energy, -pos_grad
        volume = jnp.abs(det3x3(cell))[:, None, None]
        stress = jax.lax.psum(disp_grad, graph_axis) / volume
        return energy, -pos_grad, stress

    out_specs = (P(data_axis), P(data_axis, graph_axis, None))
    if compute_stress:
        out_specs = out_specs + (P(data_axis),)
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(data_axis, graph_axis),
                  P(data_axis, graph_axis, None), P(data_axis)),
        out_specs=out_specs,
        check_vma=False)
    return jax.jit(sharded)


HALO_LOSS_KEYS = frozenset(
    {'energy', 'gradient_force', 'direct_force', 'stress', 'virial'})


def _halo_loss_config(loss_config, energy_weight, force_weight):
    '''Normalize/validate the halo loss config; None falls back to the
    classic energy+force pair built from the two weight scalars.'''
    if loss_config is None:
        loss_config = {'energy': {'weight': energy_weight},
                       'gradient_force': {'weight': force_weight}}
    cfg = {k: dict(v or {}) for k, v in loss_config.items()}
    bad = set(cfg) - HALO_LOSS_KEYS
    if bad or not cfg:
        raise ValueError(
            f'halo training supports losses within '
            f'{sorted(HALO_LOSS_KEYS)} (got {sorted(cfg) or None})')
    for k, v in cfg.items():
        if v.get('mode', 'mse') != 'mse':
            raise ValueError(
                f"halo training losses are mse-only (got mode="
                f"{v.get('mode')!r} for {k}); the surrogate-gradient "
                f"algebra below is derived for squared error")
    return cfg


def make_halo_grads_fn(model, mesh, n_halo, loss_config=None,
                       energy_weight=1.0, force_weight=50.0,
                       data_axis='data', graph_axis='graph',
                       with_grads=True):
    '''Sharded (not jitted) (params, batch) -> (grads, metrics) for the
    halo-parallel configuration; the building block the Trainer's halo
    mode and make_halo_train_step share. With with_grads=False the
    parameter backward is skipped (evaluation epochs): grads is None and
    only the metrics come back.

    batch = {z (B, N), pos (B, N, 3), cell (B, 3, 3), energy (B,),
    force (B, N, 3), graph_mask (B,), [stress (B, 3, 3)], [virial ...]}
    is globally sharded (batch over `data_axis`, atoms over `graph_axis`,
    labels alongside). loss_config follows train/loss.py
    ({'energy': {'weight': w}, 'gradient_force': ..., 'direct_force': ...,
    'stress': ..., 'virial': ...}, mse modes); None = the classic
    energy+force pair from the two weight scalars. Masked-mean
    normalization is identical to train/loss.py (direct_force additionally
    reports the cos/norm eval decompositions, ref loss.py:29-47); gradients
    are psum-reduced over both axes. Second-derivative heads (hessian/bec)
    are rejected with a documented rationale -- see the guard below.

    Per-graph predictions (energy, stress, virial) cross shards through
    psums whose legacy shard_map transpose would double-count, so each
    mse term is formed as a local surrogate sum(stop_grad(residual) *
    local_contribution) -- its gradient psum-accumulates to exactly
    d/dtheta of the global mse. Stress/virial ride the same strain-
    displacement trick as models/output.py, applied to each shard's LOCAL
    pos/cell before the in-core halo exchange (the displacement cotangent
    then rides the transposed ppermutes like the force cotangent).

    Models with a 'charge' head additionally include the latent-Ewald
    long-range energy: the structure factor psums over graph shards
    (ops/ewald.ewald_energy_periodic_sharded -- exact value AND gradients,
    including the cell path for stress). Requires ewald_mode='periodic'
    (the aperiodic direct-space sum needs all-pairs terms the slab
    decomposition does not materialize).
    '''
    cfg = _halo_loss_config(loss_config, energy_weight, force_weight)
    core = _halo_core(model, graph_axis, n_halo, mesh)
    needs_disp = 'stress' in cfg or 'virial' in cfg
    model_props = set(getattr(model, 'output_properties', ()))
    has_charge = 'charge' in model_props
    second = {'hessian', 'bec'} & model_props
    if second:
        # documented out-of-scope guard: a Hessian row d2E/dr_i dr_j (and
        # the BEC polarization jacobian dq_j/dr_i) couples atom pairs up to
        # 2 x (n_interactions x cutoff) apart -- far beyond the one-ring
        # boundary blocks the halo exchange materializes -- and the heads'
        # forward-over-reverse lanes would need their own psum-transpose
        # algebra. Compute these properties post-training on the unsharded
        # model (models/output.py _hessian/_bec work on one device, with
        # hessian_block bounding memory).
        raise ValueError(
            f'halo training does not support second-derivative heads '
            f'({sorted(second)}); drop them from output_properties for the '
            f'sharded run and evaluate them post-training on the unsharded '
            f'model')
    if 'direct_force' in cfg and 'direct_force' not in model_props:
        raise ValueError(
            "loss config has 'direct_force' but the model has no "
            "direct_force head (add it to output_properties)")
    if has_charge and getattr(model, 'ewald_mode', 'auto') != 'periodic':
        raise ValueError(
            "halo training with a charge head requires ewald_mode="
            "'periodic' (set it in the model config; the CLI auto-selects "
            "it for all-periodic datasets)")
    w = {k: float(v.get('weight', 1.0)) for k, v in cfg.items()}

    def local_grads(params, batch):
        z, pos, cell = batch['z'], batch['pos'], batch['cell']
        gmask = batch['graph_mask'].astype(pos.dtype)  # (B_loc,)
        atom_mask = (z > 0) & batch['graph_mask'][:, None]
        fmask = atom_mask.astype(pos.dtype)[..., None]

        # max(count, 1): an all-padding batch must yield zero loss, not
        # 0/0 NaN grads (same guard as train/loss.py _masked_mean)
        n_graphs = jnp.maximum(jax.lax.psum(jnp.sum(gmask), data_axis), 1.0)
        n_force = jnp.maximum(
            3.0 * jax.lax.psum(jnp.sum(fmask), (data_axis, graph_axis)), 1.0)
        n_tensor = 9.0 * n_graphs  # 3x3 entries per labelled graph
        volume = jnp.abs(det3x3(cell))  # (B_loc,)

        def loss_fn(p):
            def local_energy(pos, disp):
                if needs_disp:
                    sym = 0.5 * (disp + jnp.swapaxes(disp, -1, -2))
                    pos_d = jnp.einsum('bni,bij->bnj', pos, sym)
                    cell_d = jnp.einsum('bxi,bij->bxj', cell, sym)
                else:
                    pos_d, cell_d = pos, cell
                out = core.apply(p, z, pos_d, cell_d)
                e_local = jnp.sum(out['atomic_energy'][..., 0]
                                  * atom_mask.astype(pos.dtype), axis=-1)
                if has_charge:
                    from newtonnet_tpu.ops.ewald import \
                        ewald_energy_periodic_sharded
                    e_local = e_local + ewald_energy_periodic_sharded(
                        out['charge'], pos_d, cell_d, atom_mask, graph_axis,
                        sigma=model.ewald_sigma, n_k=model.ewald_n_k)
                # the direct_force head is a per-atom, shard-LOCAL output
                # (MLP(a_i) . force_node_i): it needs no psum and its loss
                # shards like gradient_force's
                extra = {}
                if 'direct_force' in cfg:
                    extra['direct_force'] = out['direct_force'] * fmask
                # differentiate the LOCAL energy sum; the halo ppermutes
                # transpose to reverse ppermutes delivering cross-shard
                # dE_other/dpos_mine terms, and the sharded Ewald term's
                # gradients are exact per shard by construction
                return jnp.sum(e_local), (e_local, extra)

            disp = jnp.broadcast_to(jnp.eye(3, dtype=pos.dtype),
                                    (pos.shape[0], 3, 3))
            needs_pos_grad = 'gradient_force' in cfg
            if needs_disp:
                (_, (e_local, extra)), (pos_grad, disp_grad) = \
                    jax.value_and_grad(local_energy, argnums=(0, 1),
                                       has_aux=True)(pos, disp)
            elif needs_pos_grad:
                (_, (e_local, extra)), pos_grad = jax.value_and_grad(
                    local_energy, has_aux=True)(pos, disp)
                disp_grad = None
            else:
                # energy/direct_force-only config: no derivative pass
                _, (e_local, extra) = local_energy(pos, disp)
                pos_grad = disp_grad = None

            loss = 0.0
            aux = {'e_local': e_local,
                   'e_pred': jax.lax.psum(e_local, graph_axis)}

            if 'energy' in cfg:
                resid = 2.0 * gmask * (aux['e_pred'] - batch['energy']) \
                    / n_graphs
                # exact d(mse_E)/dtheta via the local surrogate
                loss += w['energy'] * jnp.sum(
                    jax.lax.stop_gradient(resid) * e_local)

            if 'gradient_force' in cfg:
                f_err = (-pos_grad - batch['force']) * fmask
                aux['f_se'] = jnp.sum(f_err * f_err)
                aux['f_ae'] = jnp.sum(jnp.abs(f_err))
                loss += w['gradient_force'] * aux['f_se'] / n_force
            if 'direct_force' in cfg:
                aux['d_pred'] = extra['direct_force']
                d_err = (aux['d_pred'] - batch['force']) * fmask
                aux['d_se'] = jnp.sum(d_err * d_err)
                aux['d_ae'] = jnp.sum(jnp.abs(d_err))
                loss += w['direct_force'] * aux['d_se'] / n_force

            for key, local_tensor in (
                    ('stress', (lambda: disp_grad
                                / volume[:, None, None])),
                    ('virial', (lambda: -disp_grad))):
                if key not in cfg:
                    continue
                t_local = local_tensor()  # (B_loc, 3, 3) local share
                t_pred = jax.lax.psum(t_local, graph_axis)
                t_err = (t_pred - batch[key]) * gmask[:, None, None]
                aux[f'{key}_se'] = jnp.sum(t_err * t_err)
                aux[f'{key}_ae'] = jnp.sum(jnp.abs(t_err))
                if key in cfg:
                    resid = 2.0 * gmask[:, None, None] * t_err / n_tensor
                    loss += w[key] * jnp.sum(
                        jax.lax.stop_gradient(resid) * t_local)
            return loss, aux

        if with_grads:
            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grads = jax.lax.psum(grads, (data_axis, graph_axis))
        else:
            loss, aux = loss_fn(params)
            grads = None

        # metrics with global masked-mean normalization (train/loss.py),
        # matching the eval battery get_loss_by_string derives from the
        # same config (the Trainer zips these with its totals dict)
        e_err = (aux['e_pred'] - batch['energy']) * gmask
        e_mse = jax.lax.psum(jnp.sum(e_err * e_err), data_axis) / n_graphs
        e_mae = jax.lax.psum(jnp.sum(jnp.abs(e_err)), data_axis) / n_graphs
        metrics = {'loss': 0.0}
        if 'energy' in cfg:
            # per-atom energy metrics: per-graph atom counts psum over shards
            n_at = jnp.maximum(jax.lax.psum(
                jnp.sum(atom_mask.astype(pos.dtype), axis=1), graph_axis),
                1.0)
            ea_err = e_err / n_at
            ea_mse = jax.lax.psum(jnp.sum(ea_err * ea_err),
                                  data_axis) / n_graphs
            ea_mae = jax.lax.psum(jnp.sum(jnp.abs(ea_err)),
                                  data_axis) / n_graphs
            metrics |= {'energy_mae': e_mae, 'energy_mse': e_mse,
                        'energy_per_atom_mae': ea_mae,
                        'energy_per_atom_mse': ea_mse}
            metrics['loss'] += w['energy'] * e_mse
        if 'gradient_force' in cfg:
            f_mse = jax.lax.psum(aux['f_se'],
                                 (data_axis, graph_axis)) / n_force
            f_mae = jax.lax.psum(aux['f_ae'],
                                 (data_axis, graph_axis)) / n_force
            metrics |= {'gradient_force_mae': f_mae,
                        'gradient_force_mse': f_mse}
            metrics['loss'] += w['gradient_force'] * f_mse
        if 'direct_force' in cfg:
            # same eval battery get_loss_by_string derives for direct
            # force (ref loss.py:29-47): plain mae/mse over components plus
            # the cos and norm decompositions (per-atom scalars, masked
            # mean over atoms). All quantities are shard-local per atom.
            d_mse = jax.lax.psum(aux['d_se'],
                                 (data_axis, graph_axis)) / n_force
            d_mae = jax.lax.psum(aux['d_ae'],
                                 (data_axis, graph_axis)) / n_force
            n_at_total = n_force / 3.0
            amaskf = fmask[..., 0]  # (B_loc, N_loc)
            pred, ref = aux['d_pred'], batch['force']
            dot = jnp.sum(pred * ref, axis=-1)
            norm = (jnp.linalg.norm(pred, axis=-1)
                    * jnp.linalg.norm(ref, axis=-1))
            cos = dot / jnp.maximum(norm, 1e-8)
            c_err = (cos - 1.0) * amaskf
            n_err = (jnp.linalg.norm(pred, axis=-1)
                     - jnp.linalg.norm(ref, axis=-1)) * amaskf
            psum2 = lambda x: jax.lax.psum(  # noqa: E731
                jnp.sum(x), (data_axis, graph_axis))
            metrics |= {
                'direct_force_mae': d_mae, 'direct_force_mse': d_mse,
                'direct_force_cos_mae': psum2(jnp.abs(c_err)) / n_at_total,
                'direct_force_cos_mse': psum2(c_err * c_err) / n_at_total,
                'direct_force_norm_mae': psum2(jnp.abs(n_err)) / n_at_total,
                'direct_force_norm_mse': psum2(n_err * n_err) / n_at_total,
            }
            metrics['loss'] += w['direct_force'] * d_mse
        for key in ('stress', 'virial'):
            if key in cfg:
                t_mse = jax.lax.psum(aux[f'{key}_se'], data_axis) / n_tensor
                t_mae = jax.lax.psum(aux[f'{key}_ae'], data_axis) / n_tensor
                metrics |= {f'{key}_mae': t_mae, f'{key}_mse': t_mse}
                metrics['loss'] += w[key] * t_mse
        if not with_grads:
            return metrics
        return grads, metrics

    batch_specs = halo_batch_specs(data_axis, graph_axis,
                                   tensor_labels=[k for k in
                                                  ('stress', 'virial')
                                                  if k in cfg])
    return shard_map(
        local_grads, mesh=mesh,
        in_specs=(P(), batch_specs),
        out_specs=(P(), P()) if with_grads else P(),
        check_vma=False)


def make_halo_train_step(model, tx, mesh, n_halo, loss_config=None,
                         energy_weight=1.0, force_weight=50.0,
                         data_axis='data', graph_axis='graph'):
    '''Jitted sharded training step for the halo-parallel configuration:
    step(params, opt_state, batch) -> (params, opt_state, metrics) with
    the optax update running replicated (see make_halo_grads_fn).'''
    sharded_grads = make_halo_grads_fn(
        model, mesh, n_halo, loss_config=loss_config,
        energy_weight=energy_weight, force_weight=force_weight,
        data_axis=data_axis, graph_axis=graph_axis)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, batch):
        grads, metrics = sharded_grads(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        import optax
        params = optax.apply_updates(params, updates)
        return params, opt_state, metrics

    return step


def halo_batch_specs(data_axis='data', graph_axis='graph',
                     tensor_labels=()):
    '''PartitionSpecs of a halo training batch (single source of truth for
    make_halo_train_step and shard_halo_batch). `tensor_labels` adds the
    per-graph 3x3 labels ('stress'/'virial') the loss config uses.'''
    specs = {
        'z': P(data_axis, graph_axis),
        'pos': P(data_axis, graph_axis, None),
        'cell': P(data_axis),
        'energy': P(data_axis),
        'force': P(data_axis, graph_axis, None),
        'graph_mask': P(data_axis),
    }
    for key in tensor_labels:
        specs[key] = P(data_axis)
    return specs


def shard_halo_batch(batch, mesh, data_axis='data', graph_axis='graph'):
    '''Device-put a (pre-sorted, padded) global batch with halo shardings.'''
    from jax.sharding import NamedSharding
    specs = halo_batch_specs(data_axis, graph_axis,
                             tensor_labels=[k for k in ('stress', 'virial')
                                            if k in batch])
    return {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
            if k in specs else v for k, v in batch.items()}
