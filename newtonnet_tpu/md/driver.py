'''All-on-device MD: the whole trajectory under one lax.scan.

The reference's MD hot loop crosses host<->device every step (ASE integrator
calling the calculator, ase_interface.py:52-81 -- SURVEY.md section 3.4
flags the h2d+d2h per step). On TPU that boundary dominates for small
systems, so this driver keeps positions, momenta, forces and the thermostat
RNG on device and runs N steps inside a single compiled scan; only the
(strided) observables come back to the host at the end.

The Langevin update uses exactly the same Vanden-Eijnden / Ciccotti
coefficients as newtonnet_tpu/md/integrators.py (== ASE's).
'''
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from newtonnet_tpu.data.units import kB



def _pad_systems(systems, dtype, multiple=8):
    '''Pad a list of Systems into one (M, n_pad, ...) replica batch.'''
    n_max = max(len(s) for s in systems)
    n_pad = max(multiple, ((n_max + multiple - 1) // multiple) * multiple)
    M = len(systems)
    z = np.zeros((M, n_pad), dtype=np.int32)
    pos = np.zeros((M, n_pad, 3), dtype=dtype)
    mom = np.zeros((M, n_pad, 3), dtype=dtype)
    masses = np.ones((M, n_pad), dtype=dtype)
    cell = np.zeros((M, 3, 3), dtype=dtype)
    for i, s in enumerate(systems):
        n = len(s)
        z[i, :n] = s.numbers
        pos[i, :n] = s.positions
        mom[i, :n] = s.momenta
        masses[i, :n] = s.masses
        cell[i] = s.cell
    return z, pos, mom, masses, cell


def _make_nlist_builder(model, z, cell, skin, nlist_grid, nlist_capacity):
    '''Skin-radius list builder: the list stays valid until any atom moves
    ~skin/2; stale pairs beyond the true cutoff are re-masked inside the
    model every step.'''

    def build_nlist(pos):
        if nlist_grid:
            from newtonnet_tpu.ops.cellgrid import cell_grid_neighbor_list
            idx, kmask, _, ovf = cell_grid_neighbor_list(
                pos, cell, z > 0, model.cutoff + skin, model.k_max,
                nlist_grid, nlist_capacity, mic_mode=model.mic_mode)
        else:
            from newtonnet_tpu.ops.nlist import neighbor_list
            idx, kmask, _, ovf = neighbor_list(
                pos, cell, z > 0, model.cutoff + skin, model.k_max,
                mic_mode=model.mic_mode)
        if getattr(model, 'reverse_lists', False):
            # amortize the transpose-list build with the rebuild
            from newtonnet_tpu.ops.nlist import build_reverse_list
            rev, rev_mask = build_reverse_list(idx, kmask)
            return (idx, kmask, rev, rev_mask), jnp.sum(ovf)
        return (idx, kmask), jnp.sum(ovf)

    return build_nlist


@partial(jax.jit, static_argnames=('model', 'n_steps', 'log_every',
                                   'nlist_every', 'skin', 'nlist_grid',
                                   'nlist_capacity'))
def _run_langevin(model, params, z, pos0, mom0, masses, cell, *, dt, temp,
                  friction, n_steps, log_every, key, nlist_every=0,
                  skin=1.0, nlist_grid=(), nlist_capacity=0):
    '''Batched-replica Langevin: all arrays carry a leading replica axis M
    (z (M, N), pos/mom (M, N, 3), masses (M, N), cell (M, 3, 3)); M
    independent trajectories integrate in lockstep through the batched
    model -- ensemble/replica sampling at near-single-trajectory cost for
    small systems.'''
    masses_c = masses[..., None]                       # (M, N, 1)
    atom_mask = (z > 0).astype(pos0.dtype)[..., None]  # (M, N, 1)
    c1, c2, c3, c4, c5 = _langevin_coeffs(masses_c, dt, temp, friction)

    amortize = (nlist_every > 1
                and getattr(model, 'graph_mode', 'dense') == 'neighborlist')

    def energy_forces(pos, nlist=None):
        out = model.apply(params, z, pos, cell, nlist=nlist)
        return out['energy'], out['gradient_force']   # (M,), (M, N, 3)

    build_nlist = _make_nlist_builder(model, z, cell, skin, nlist_grid,
                                      nlist_capacity)

    def body(carry, key, nlist=None, pos_ref=None):
        pos, vel, f, _ = carry
        xi = jax.random.normal(key, pos.shape, pos.dtype)
        key2 = jax.random.fold_in(key, 1)
        eta = jax.random.normal(key2, pos.shape, pos.dtype)
        vel = (vel + c1 * f / masses_c - c2 * vel
               + c3 * xi - c4 * eta) * atom_mask
        pos = pos + dt * vel + c5 * eta * atom_mask
        epot, f = energy_forces(pos, nlist=nlist)
        vel = (vel + c1 * f / masses_c - c2 * vel
               + c3 * xi - c4 * eta) * atom_mask
        ekin = 0.5 * jnp.sum(masses_c * vel * vel, axis=(-1, -2))  # (M,)
        # max displacement since the chunk's list rebuild: an atom past
        # skin/2 can have a NEW neighbor inside the true cutoff that the
        # stale list cannot supply (the in-model re-mask only drops pairs)
        disp = 0.0 if pos_ref is None else jnp.max(
            jnp.sum((pos - pos_ref) ** 2, axis=-1))
        return (pos, vel, f, epot), (epot, ekin, disp)

    vel0 = mom0 / masses_c
    e0, f0 = energy_forces(pos0)
    carry0 = (pos0, vel0, f0, e0)
    if amortize:
        assert n_steps % nlist_every == 0, \
            'n_steps must be divisible by nlist_every'
        n_chunks = n_steps // nlist_every

        def chunk(carry, keys):
            state, counters = carry
            nlist, ovf = build_nlist(state[0])
            state, (ep, ek, disp2) = jax.lax.scan(
                partial(body, nlist=nlist, pos_ref=state[0]), state, keys)
            counters = (counters[0] + ovf.astype(jnp.int32),
                        counters[1] + (jnp.max(disp2)
                                       > (skin / 2.0) ** 2).astype(jnp.int32))
            return (state, counters), (ep, ek)

        keys = jax.random.split(key, n_steps).reshape(
            n_chunks, nlist_every, -1)
        counters0 = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        ((pos, vel, f, epot), counters), (epots, ekins) = jax.lax.scan(
            chunk, (carry0, counters0), keys)
        # (n_chunks, nlist_every, M) -> (n_steps, M): keep the replica axis
        epots = epots.reshape(n_steps, *epots.shape[2:])
        ekins = ekins.reshape(n_steps, *ekins.shape[2:])
    else:
        (pos, vel, f, epot), (epots, ekins, _) = jax.lax.scan(
            body, carry0, jax.random.split(key, n_steps))
        counters = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    return (pos, vel * masses_c, epots[::log_every], ekins[::log_every],
            counters[0], counters[1])


def _langevin_coeffs(masses_c, dt, temp, friction):
    sigma = jnp.sqrt(2 * temp * friction / masses_c)
    c1 = dt / 2.0 - dt * dt * friction / 8.0
    c2 = dt * friction / 2.0 - dt * dt * friction * friction / 8.0
    c3 = jnp.sqrt(dt) * sigma / 2.0 - dt ** 1.5 * friction * sigma / 8.0
    c5 = dt ** 1.5 * sigma / (2.0 * jnp.sqrt(3.0))
    c4 = friction / 2.0 * c5
    return c1, c2, c3, c4, c5


@partial(jax.jit, static_argnames=('model',), donate_argnums=(2,))
def _langevin_chunk(model, params, carry, z, masses, cell, nlist, keys, *,
                    dt, temp, friction):
    '''One fixed-neighbor-list chunk of Langevin steps (host-rebuild mode).

    Used when the model runs with inverse_lists: the symmetric-slotted
    lists must be recolored on the host (native/symslots.cpp) at each skin
    rebuild, so the trajectory advances in host-dispatched chunks of
    nlist_every steps instead of one all-on-device double scan. carry is
    (pos, vel, f, epot) and is donated.
    '''
    masses_c = masses[..., None]
    atom_mask = (z > 0).astype(carry[0].dtype)[..., None]
    c1, c2, c3, c4, c5 = _langevin_coeffs(masses_c, dt, temp, friction)

    def body(carry, key):
        pos, vel, f, _ = carry
        xi = jax.random.normal(key, pos.shape, pos.dtype)
        eta = jax.random.normal(jax.random.fold_in(key, 1), pos.shape,
                                pos.dtype)
        vel = (vel + c1 * f / masses_c - c2 * vel
               + c3 * xi - c4 * eta) * atom_mask
        pos = pos + dt * vel + c5 * eta * atom_mask
        out = model.apply(params, z, pos, cell, nlist=nlist)
        epot, f = out['energy'], out['gradient_force']
        vel = (vel + c1 * f / masses_c - c2 * vel
               + c3 * xi - c4 * eta) * atom_mask
        ekin = 0.5 * jnp.sum(masses_c * vel * vel, axis=(-1, -2))
        return (pos, vel, f, epot), (epot, ekin)

    return jax.lax.scan(body, carry, keys)


@partial(jax.jit, static_argnames=('model',))
def _apply_ef(model, params, z, pos, cell, nlist):
    out = model.apply(params, z, pos, cell, nlist=nlist)
    return out['energy'], out['gradient_force']


@partial(jax.jit, static_argnames=('cutoff', 'k', 'mic_mode'))
def _jit_neighbor_list(pos, cell, z, cutoff, k, mic_mode):
    # module-level so the jit cache persists across skin rebuilds (a
    # fresh lambda per call would re-trace every chunk)
    from newtonnet_tpu.ops.nlist import neighbor_list
    idx, kmask, _, _ = neighbor_list(pos, cell, z > 0, cutoff, k,
                                     mic_mode=mic_mode)
    return idx, kmask


def host_symmetric_nlist(model, z, pos, cell, skin=1.0):
    '''Build + recolor neighbor lists for the inverse_lists / newton3 MD
    paths: returns the 4-tuple (idx, kmask, inv, inv_mask) the model
    expects (inv lists in K-major orientation). One native C++ pass per
    replica: shared-slot recoloring (native/symslots.cpp) for
    inverse_lists, or Eulerian orientation + Konig half-list coloring
    (native/newton3.cpp) when the model runs in newton3 mode -- there
    model.k_max is the HALF-list slot capacity, so the full symmetric
    list is built at 2*k_max + 8 capacity first.
    '''
    from newtonnet_tpu import native
    from newtonnet_tpu.ops.nlist import symmetrize_slots
    pos = np.asarray(pos)
    z = np.asarray(z)
    cell = np.asarray(cell)
    M, N = z.shape
    newton3 = getattr(model, 'newton3', False)
    k = model.k_max
    k_full = 2 * k + 8 if newton3 else k
    idxs = np.zeros((M, N, k), np.int32)
    masks = np.zeros((M, N, k), bool)
    use_native = native.available() or native.ensure_built()
    for m in range(M):
        if use_native:
            # padding rows sit at the end (z == 0); build on real atoms only
            n_real = int((z[m] > 0).sum())
            idx_r, count, ovf = native.cell_list_neighbors(
                pos[m, :n_real], cell[m] if cell[m].any() else None,
                model.cutoff + skin, k_full)
            if ovf:
                raise ValueError(
                    f'neighbor overflow ({ovf} atoms > k_max={k_full})')
            idx = np.zeros((N, k_full), np.int32)
            idx[:n_real] = idx_r
            kmask = np.zeros((N, k_full), bool)
            kmask[:n_real] = np.arange(k_full)[None, :] < count[:, None]
        else:  # pure-python fallback (tests without a toolchain)
            idx_d, kmask_d = _jit_neighbor_list(
                jnp.asarray(pos[m][None]), jnp.asarray(cell[m][None]),
                jnp.asarray(z[m][None]), model.cutoff + skin, k_full,
                model.mic_mode)
            idx, kmask = np.asarray(idx_d[0]), np.asarray(kmask_d[0])
        if newton3:
            if use_native:
                half = native.newton3_half_list_native(idx, kmask, k_out=k)
                if half is None:
                    raise ValueError(
                        f'newton3 half list needs more than k_max={k} '
                        f'slots at build radius cutoff+skin='
                        f'{model.cutoff + skin:g} A; raise model k_max '
                        f'or lower the skin')
                idx2, kmask2 = half
            else:
                from newtonnet_tpu.ops.nlist import newton3_half_list
                idx2, kmask2 = newton3_half_list(idx, kmask, k_max=k)
        else:
            idx2, kmask2 = symmetrize_slots(idx, kmask, k_max=k)
        idxs[m], masks[m] = idx2, kmask2
    # minimal wire format: one sentinel-coded index array (invalid -> N),
    # int16 when it fits; mask and the K-major transposes are derived on
    # device. On the axon-tunneled dev chip h2d runs at ~30 MB/s, so wire
    # bytes dominate the rebuild cost; on directly-attached TPUs this is
    # immaterial but still free.
    sent = np.where(masks, idxs, N)
    wire = sent.astype(np.int16 if N < 2 ** 15 - 1 else np.int32)
    if newton3:
        return _unpack_newton3_nlist(jnp.asarray(wire))
    return _unpack_symmetric_nlist(jnp.asarray(wire))


@jax.jit
def _unpack_symmetric_nlist(wire):
    idx = wire.astype(jnp.int32)
    n = wire.shape[1]
    mask = idx < n
    idx = jnp.where(mask, idx, 0)
    return (idx, mask, jnp.swapaxes(idx, 1, 2), jnp.swapaxes(mask, 1, 2))


def host_staircase_nlist(model, z, pos, cell, skin, plan_box):
    '''Staircase half lists for the newton3_compact MD path.

    Per skin rebuild: build the full symmetric list at cutoff+skin per
    replica, run the native color+compact phase (ops/staircase.py ->
    native/staircase.cpp), chunk under a shared static shape plan (fixed
    by the FIRST rebuild in `plan_box`, a mutable dict, with spare rows
    and colors so later rebuilds keep the same compiled shapes), and
    ship sentinel-coded per-chunk indices; masks and per-color inverse
    lists are derived on device. Returns (nlist, perm (M, N) int32) --
    the caller permutes the device state by `perm` (atoms re-sorted by
    slot need each rebuild) and composes `perm` into its cumulative
    permutation for final output ordering.
    '''
    from newtonnet_tpu.ops.staircase import (staircase_chunks,
                                             staircase_colors)
    pos = np.asarray(pos)
    z = np.asarray(z)
    cell = np.asarray(cell)
    M, N = z.shape
    k = model.k_max
    k_full = 2 * k + 8
    from newtonnet_tpu import native
    use_native = native.available() or native.ensure_built()
    perms = np.zeros((M, N), np.int32)

    def full_list(m):
        if use_native:
            n_real = int((z[m] > 0).sum())
            idx_r, count, ovf = native.cell_list_neighbors(
                pos[m, :n_real], cell[m] if cell[m].any() else None,
                model.cutoff + skin, k_full)
            if ovf:
                raise ValueError(
                    f'neighbor overflow ({ovf} atoms > k_max={k_full})')
            idx = np.zeros((N, k_full), np.int32)
            idx[:n_real] = idx_r
            kmask = np.zeros((N, k_full), bool)
            kmask[:n_real] = np.arange(k_full)[None, :] < count[:, None]
            return idx, kmask
        idx_d, kmask_d = _jit_neighbor_list(
            jnp.asarray(pos[m][None]), jnp.asarray(cell[m][None]),
            jnp.asarray(z[m][None]), model.cutoff + skin, k_full,
            model.mic_mode)
        return np.asarray(idx_d[0]), np.asarray(kmask_d[0])

    had_plan = plan_box.get('plan') is not None
    lists = [full_list(m) for m in range(M)]  # capacity errors raise as-is
    try:
        coloreds = [staircase_colors(idx, kmask,
                                     plan=plan_box.get('plan'))
                    for idx, kmask in lists]
        if not had_plan:
            # fix the shared static shape plan from ALL replicas' first
            # rebuild (heterogeneous replicas need the elementwise max):
            # uniform chunks of `cw` colors covering the LARGEST
            # replica's palette, so chunk boundaries align across
            # replicas with different color caps.
            # QUANTIZED drift headroom: widths wobble a few percent
            # between skin rebuilds as atoms diffuse, and separate
            # driver calls must land on the SAME plan so the chunk jit
            # (and the persistent compilation cache) is reused -- round
            # each width up to a coarse grid plus one grid step
            firsts = [staircase_chunks(c, pad=8) for c in coloreds]
            cw = 4  # staircase_chunks default colors per chunk
            max_cap = max((int(c[3].max()) + 1 if len(c[3]) else 1)
                          for c in coloreds)
            n_chunks = -(-max_cap // cw)
            q = max(32, N // 16)

            def width(n):
                return min((n // q + 2) * q, N)
            plan = [(cw, width(max(
                (f.widths[ci][1] if ci < len(f.widths) else 0)
                for f in firsts))) for ci in range(n_chunks)]
            plan.append((cw, plan[-1][1]))  # spare colors
            plan_box['plan'] = tuple(plan)
        sls = [staircase_chunks(c, pad=8, plan=plan_box['plan'])
               for c in coloreds]
    except ValueError as e:
        if not had_plan:
            raise
        raise ValueError(
            f'{e} -- a skin rebuild outgrew the staircase shape plan '
            'fixed at the first rebuild (atoms drifted into a denser '
            'configuration); enlarge model k_max headroom or restart '
            'the trajectory to re-plan') from None
    for m, sl in enumerate(sls):
        perms[m] = sl.perm
    widths = plan_box['plan']
    wires = []
    for ci, (c, n) in enumerate(widths):
        w = np.full((M, c, n), n,
                    np.int16 if n < 2 ** 15 - 1 else np.int32)
        for m, sl in enumerate(sls):
            ch = sl.chunks[ci]
            w[m] = np.where(ch.mask[0], ch.idx[0], n)
        wires.append(jnp.asarray(w))
    return _unpack_stair_nlist(tuple(wires)), jnp.asarray(perms)


@jax.jit
def _unpack_stair_nlist(wires):
    # per-chunk mask + per-color inverse lists derived on device (each
    # chunk is a square K-major block, so build_inverse_list applies)
    from newtonnet_tpu.ops.nlist import build_inverse_list
    out = []
    for w in wires:
        n = w.shape[-1]
        idx = w.astype(jnp.int32)
        mask = idx < n
        idx = jnp.where(mask, idx, 0)
        inv, inv_mask = build_inverse_list(idx, mask)
        out.append((idx, mask, inv, inv_mask))
    return tuple(out)


@jax.jit
def _permute_state(carry, perm):
    '''Re-sort the (pos, vel, f, epot) carry by a per-replica atom
    permutation (staircase rebuilds re-sort atoms by slot need).'''
    pos, vel, f, epot = carry

    def take(a):
        return jnp.take_along_axis(a, perm[..., None], axis=1)
    return (take(pos), take(vel), take(f), epot)


@jax.jit
def _unpack_newton3_nlist(wire):
    # a half list is not an involution: the K-major inverse lists are
    # rebuilt on device (cheap: one scatter-max over the half list)
    from newtonnet_tpu.ops.nlist import build_inverse_list
    idx = wire.astype(jnp.int32)
    n = wire.shape[1]
    mask = idx < n
    idx = jnp.where(mask, idx, 0)
    inv, inv_mask = build_inverse_list(jnp.swapaxes(idx, 1, 2),
                                       jnp.swapaxes(mask, 1, 2))
    return (idx, mask, inv, inv_mask)


def run_langevin_on_device(model, params, system, *, timestep, temperature_K,
                           friction, n_steps, log_every=100, seed=0,
                           dtype=np.float32, matmul_precision='highest',
                           nlist_every=0, skin=1.0, stair_plan=None):
    '''Run Langevin MD fully on device.

    `system` may be a single System or a list of Systems: a list runs as a
    batched replica ensemble (independent trajectories, independent noise),
    at near-single-trajectory cost for small systems -- the TPU-native way
    to gather sampling statistics.

    matmul_precision defaults to 'highest' (full-fp32 MXU passes): with the
    TPU default (bf16 passes), force round-off acts as white-noise heating
    and biases the thermostat temperature upward by >100 K.

    Returns (system(s), log): the input System(s) updated in place to the
    final state, and a dict with strided 'epot', 'ekin', 'temperature'
    arrays -- shape (n_logged,) for a single system, (n_logged, M) for a
    replica list.
    '''
    systems = system if isinstance(system, (list, tuple)) else [system]
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    z, pos, mom, masses, cell = _pad_systems(systems, dtype)

    compact = getattr(model, 'newton3_compact', False)
    if compact and not (nlist_every > 1 and getattr(
            model, 'graph_mode', 'dense') == 'neighborlist'):
        raise ValueError(
            'newton3_compact MD requires the host-rebuild mode: '
            "graph_mode='neighborlist' and nlist_every > 1 (staircase "
            'lists are recolored on the host per skin rebuild; there is '
            'no in-jit build for them)')
    if (nlist_every > 1
            and (getattr(model, 'inverse_lists', False)
                 or getattr(model, 'newton3', False) or compact)
            and getattr(model, 'graph_mode', 'dense') == 'neighborlist'):
        # host-rebuild mode: symmetric-slotted (or newton3 half /
        # staircase) lists (scatter-free model backward) are recolored
        # natively on the host per skin rebuild, so the trajectory
        # advances in chunks of nlist_every dispatches. In staircase
        # mode each rebuild also re-sorts atoms by slot need: the device
        # state is permuted per rebuild and the cumulative permutation
        # is undone before writing results back into the Systems.
        assert n_steps % nlist_every == 0
        kB_T = float(kB * temperature_K)
        z_cur = z
        masses_cur = masses
        cell_j = jnp.asarray(cell)
        vel = jnp.asarray(mom / masses[..., None])
        pos_j = jnp.asarray(pos)
        keys = jax.random.split(jax.random.PRNGKey(seed), n_steps).reshape(
            n_steps // nlist_every, nlist_every, -1)
        ep_list, ek_list = [], []
        M, N = z.shape
        cum = np.tile(np.arange(N, dtype=np.int64), (M, 1))
        # staircase shape plan: quantized per-chunk widths, fixed at the
        # first rebuild. Callers making SEVERAL driver calls on the same
        # system (warmup + production legs) should pass one shared
        # mutable dict as `stair_plan` so every leg compiles to the same
        # shapes -- a fresh plan re-derived from slightly-evolved
        # positions can flip a quantization boundary and force a full
        # recompile of the chunk program (~45 s at N=4096)
        plan_box = stair_plan if stair_plan is not None else {}

        # z/masses are uploaded once and refreshed only when a staircase
        # rebuild re-sorts atoms (constant uploads were previously paid
        # per chunk on the newton3/inverse paths too)
        zm_dev = {'z': jnp.asarray(z_cur), 'm': jnp.asarray(masses_cur)}

        def rebuild(pos_now, carry=None):
            nonlocal z_cur, masses_cur, cum
            if not compact:
                return (host_symmetric_nlist(model, z_cur, pos_now, cell,
                                             skin=skin), carry)
            nl, perm = host_staircase_nlist(model, z_cur, pos_now, cell,
                                            skin, plan_box)
            p = np.asarray(perm)
            z_cur = np.take_along_axis(z_cur, p, axis=1)
            masses_cur = np.take_along_axis(masses_cur, p, axis=1)
            cum = np.take_along_axis(cum, p, axis=1)
            zm_dev['z'] = jnp.asarray(z_cur)
            zm_dev['m'] = jnp.asarray(masses_cur)
            if carry is not None:
                carry = _permute_state(carry, perm)
            return nl, carry

        with jax.default_matmul_precision(matmul_precision):
            nlist, _ = rebuild(pos_j)
            if compact:
                # enter the first sorted order (cum was identity before
                # the rebuild, so cum IS the first permutation)
                pos_j, vel, _, _ = _permute_state(
                    (pos_j, vel, pos_j, None), jnp.asarray(cum))
            epot, f = _apply_ef(model, params, zm_dev['z'], pos_j,
                                cell_j, nlist)
            carry = (pos_j, vel, f, epot)
            for c in range(n_steps // nlist_every):
                if c > 0:
                    nlist, carry = rebuild(np.asarray(carry[0]), carry)
                carry, (ep, ek) = _langevin_chunk(
                    model, params, carry, zm_dev['z'],
                    zm_dev['m'], cell_j, nlist,
                    keys[c], dt=float(timestep), temp=kB_T,
                    friction=float(friction))
                ep_list.append(np.asarray(ep))
                ek_list.append(np.asarray(ek))
        pos_s = np.asarray(carry[0])
        mom_s = np.asarray(carry[1]) * masses_cur[..., None]
        # undo the cumulative staircase re-sorts (identity when not compact)
        pos_f = np.empty_like(pos_s)
        mom_f = np.empty_like(mom_s)
        for m in range(M):
            pos_f[m, cum[m]] = pos_s[m]
            mom_f[m, cum[m]] = mom_s[m]
        epots = np.concatenate(ep_list)[::log_every]
        ekins = np.concatenate(ek_list)[::log_every]
        for i, s in enumerate(systems):
            n = len(s)
            s.positions = pos_f[i, :n].astype(np.float64)
            s.momenta = mom_f[i, :n].astype(np.float64)
        dof = np.array([3 * len(s) for s in systems])
        log = {'epot': epots, 'ekin': ekins,
               'temperature': 2.0 * ekins / (dof[None, :] * kB)}
        if not isinstance(system, (list, tuple)):
            log = {k: v[:, 0] for k, v in log.items()}
            return systems[0], log
        return systems, log
    # O(N) cell-grid rebuilds when the (identical, periodic) replica cells
    # allow it: grid/capacity are static, picked on the host for
    # cutoff + skin (ops/cellgrid.py)
    nlist_grid, nlist_capacity = (), 0
    if (nlist_every > 1
            and getattr(model, 'graph_mode', 'dense') == 'neighborlist'
            and np.abs(np.linalg.det(cell[0])) > 0
            and all(np.allclose(c, cell[0]) for c in cell)):
        from newtonnet_tpu.ops.cellgrid import suggest_capacity, suggest_grid
        g = suggest_grid(cell[0], model.cutoff + skin)
        if min(g) >= 3:  # below that the O(N^2) build is as good
            nlist_grid = g
            nlist_capacity = suggest_capacity(z.shape[1], g)
    with jax.default_matmul_precision(matmul_precision):
        (pos_f, mom_f, epots, ekins, n_overflow,
         n_skin_violations) = _run_langevin(
            model, params, jnp.asarray(z), jnp.asarray(pos),
            jnp.asarray(mom), jnp.asarray(masses), jnp.asarray(cell),
            dt=float(timestep), temp=float(kB * temperature_K),
            friction=float(friction), n_steps=int(n_steps),
            log_every=int(log_every), key=jax.random.PRNGKey(seed),
            nlist_every=int(nlist_every), skin=float(skin),
            nlist_grid=nlist_grid, nlist_capacity=nlist_capacity)
    pos_f, mom_f = np.asarray(pos_f), np.asarray(mom_f)
    n_overflow = int(n_overflow)
    n_skin_violations = int(n_skin_violations)
    if n_overflow or n_skin_violations:
        import warnings
        warnings.warn(
            f'amortized MD list quality: {n_overflow} neighbor-capacity '
            f'overflows, {n_skin_violations} chunks where an atom moved '
            f'> skin/2 before the rebuild -- forces in those chunks '
            f'missed neighbors; raise k_max/cell capacity, shrink '
            f'nlist_every, or enlarge skin', stacklevel=2)
    for i, s in enumerate(systems):
        n = len(s)
        s.positions = pos_f[i, :n].astype(np.float64)
        s.momenta = mom_f[i, :n].astype(np.float64)
    dof = np.array([3 * len(s) for s in systems])
    epots, ekins = np.asarray(epots), np.asarray(ekins)
    log = {'epot': epots, 'ekin': ekins,
           'temperature': 2.0 * ekins / (dof[None, :] * kB),
           'nlist_overflow': n_overflow,
           'skin_violations': n_skin_violations}
    if not isinstance(system, (list, tuple)):
        log = {k: v[:, 0] if np.ndim(v) == 2 else v
               for k, v in log.items()}
        return systems[0], log
    return systems, log


# ------------------------------------------------------------------ #
# Deterministic NVT on device: Nose-Hoover chain under lax.scan
# (host-loop counterpart with identical algebra:
#  md/integrators.NoseHooverChain)

_SY_WEIGHTS = (1.3512071919596578, -1.7024143839193155, 1.3512071919596578)


def _nhc_update(vel, masses_c, xi, vxi, Q, kT, dof, dt, n_sub=1):
    '''Vectorized (replica-batched) MTK chain propagation for dt/2.

    vel (M, N, 3), xi/vxi (M, C), Q (M, C), dof (M,). Returns the
    momentum scale (M,) and the updated chain state. The chain length C
    is static, so the per-link loops unroll at trace time.
    '''
    C = Q.shape[1]
    akin = jnp.sum(masses_c * vel * vel, axis=(-1, -2))  # (M,)
    scale = jnp.ones_like(akin)

    def g(j, akin, vxi):
        if j == 0:
            return (akin - dof * kT) / Q[:, 0]
        return (Q[:, j - 1] * vxi[:, j - 1] ** 2 - kT) / Q[:, j]

    for _ in range(n_sub):
        for w in _SY_WEIGHTS:
            wdt = w * dt / n_sub
            vxi = vxi.at[:, C - 1].add(0.25 * wdt * g(C - 1, akin, vxi))
            for j in range(C - 2, -1, -1):
                aa = jnp.exp(-0.125 * wdt * vxi[:, j + 1])
                vxi = vxi.at[:, j].set(
                    (vxi[:, j] * aa + 0.25 * wdt * g(j, akin, vxi)) * aa)
            s = jnp.exp(-0.5 * wdt * vxi[:, 0])
            scale = scale * s
            akin = akin * s * s
            xi = xi + 0.5 * wdt * vxi
            for j in range(C - 1):
                aa = jnp.exp(-0.125 * wdt * vxi[:, j + 1])
                vxi = vxi.at[:, j].set(
                    (vxi[:, j] * aa + 0.25 * wdt * g(j, akin, vxi)) * aa)
            vxi = vxi.at[:, C - 1].add(0.25 * wdt * g(C - 1, akin, vxi))
    return scale, xi, vxi


@partial(jax.jit, static_argnames=('model', 'n_steps', 'log_every',
                                   'chain_length', 'nlist_every', 'skin',
                                   'nlist_grid', 'nlist_capacity'))
def _run_nhc(model, params, z, pos0, mom0, masses, cell, *, dt, temp,
             tdamp, chain_length, n_steps, log_every, nlist_every=0,
             skin=1.0, nlist_grid=(), nlist_capacity=0):
    masses_c = masses[..., None]
    atom_mask = (z > 0).astype(pos0.dtype)[..., None]
    M = z.shape[0]
    dof = 3.0 * jnp.sum(z > 0, axis=1).astype(pos0.dtype)  # (M,)
    Q = jnp.full((M, chain_length), temp * tdamp ** 2,
                 pos0.dtype).at[:, 0].mul(dof)
    amortize = (nlist_every > 1
                and getattr(model, 'graph_mode', 'dense') == 'neighborlist')
    build_nlist = _make_nlist_builder(model, z, cell, skin, nlist_grid,
                                      nlist_capacity)

    def energy_forces(pos, nlist=None):
        out = model.apply(params, z, pos, cell, nlist=nlist)
        return out['energy'], out['gradient_force']

    def chain_energy(xi, vxi):
        return (0.5 * jnp.sum(Q * vxi ** 2, axis=1)
                + dof * temp * xi[:, 0]
                + temp * jnp.sum(xi[:, 1:], axis=1))

    def body(carry, _, nlist=None, pos_ref=None):
        pos, vel, f, _, xi, vxi = carry
        scale, xi, vxi = _nhc_update(vel, masses_c, xi, vxi, Q, temp,
                                     dof, dt)
        vel = vel * scale[:, None, None]
        vel = (vel + 0.5 * dt * f / masses_c) * atom_mask
        pos = pos + dt * vel * atom_mask
        epot, f = energy_forces(pos, nlist=nlist)
        vel = (vel + 0.5 * dt * f / masses_c) * atom_mask
        scale, xi, vxi = _nhc_update(vel, masses_c, xi, vxi, Q, temp,
                                     dof, dt)
        vel = vel * scale[:, None, None]
        ekin = 0.5 * jnp.sum(masses_c * vel * vel, axis=(-1, -2))
        disp = 0.0 if pos_ref is None else jnp.max(
            jnp.sum((pos - pos_ref) ** 2, axis=-1))
        return ((pos, vel, f, epot, xi, vxi),
                (epot, ekin, epot + ekin + chain_energy(xi, vxi), disp))

    vel0 = mom0 / masses_c
    e0, f0 = energy_forces(pos0)
    xi0 = jnp.zeros((M, chain_length), pos0.dtype)
    carry0 = (pos0, vel0, f0, e0, xi0, xi0)
    if amortize:
        assert n_steps % nlist_every == 0
        n_chunks = n_steps // nlist_every

        def chunk(carry, _):
            state, counters = carry
            nlist, ovf = build_nlist(state[0])
            state, (ep, ek, ec, disp2) = jax.lax.scan(
                partial(body, nlist=nlist, pos_ref=state[0]), state,
                None, length=nlist_every)
            counters = (counters[0] + ovf.astype(jnp.int32),
                        counters[1] + (jnp.max(disp2)
                                       > (skin / 2.0) ** 2).astype(jnp.int32))
            return (state, counters), (ep, ek, ec)

        counters0 = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        ((pos, vel, f, epot, xi, vxi), counters), (eps, eks, ecs) = \
            jax.lax.scan(chunk, (carry0, counters0), None, length=n_chunks)
        eps = eps.reshape(n_steps, *eps.shape[2:])
        eks = eks.reshape(n_steps, *eks.shape[2:])
        ecs = ecs.reshape(n_steps, *ecs.shape[2:])
    else:
        (pos, vel, f, epot, xi, vxi), (eps, eks, ecs, _) = jax.lax.scan(
            body, carry0, None, length=n_steps)
        counters = (jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
    return (pos, vel * masses_c, eps[::log_every], eks[::log_every],
            ecs[::log_every], counters[0], counters[1])


def run_nhc_on_device(model, params, system, *, timestep, temperature_K,
                      tdamp, chain_length=3, n_steps, log_every=100,
                      dtype=np.float32, matmul_precision='highest',
                      nlist_every=0, skin=1.0):
    '''Deterministic NVT (Nose-Hoover chain) fully on device.

    Same surface as run_langevin_on_device: `system` may be one System or
    a replica list; the whole trajectory runs under lax.scan. The log
    additionally carries 'conserved' -- the extended Hamiltonian
    E + sum Q v_xi^2/2 + Nf kT xi_1 + kT sum_{j>1} xi_j, whose drift is
    the integration-quality diagnostic (md/integrators.NoseHooverChain is
    the host-loop counterpart with identical algebra).
    '''
    if getattr(model, 'newton3_compact', False):
        raise ValueError(
            'newton3_compact models are not supported by the NHC driver '
            '(it has no host-rebuild mode); run Langevin with '
            'nlist_every > 1, or rebuild the model with newton3=True -- '
            'the checkpoint is layout-portable')
    systems = system if isinstance(system, (list, tuple)) else [system]
    params = jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
    z, pos, mom, masses, cell = _pad_systems(systems, dtype)

    nlist_grid, nlist_capacity = (), 0
    if (nlist_every > 1
            and getattr(model, 'graph_mode', 'dense') == 'neighborlist'
            and np.abs(np.linalg.det(cell[0])) > 0
            and all(np.allclose(c, cell[0]) for c in cell)):
        from newtonnet_tpu.ops.cellgrid import suggest_capacity, suggest_grid
        g = suggest_grid(cell[0], model.cutoff + skin)
        if min(g) >= 3:
            nlist_grid = g
            nlist_capacity = suggest_capacity(z.shape[1], g)
    with jax.default_matmul_precision(matmul_precision):
        (pos_f, mom_f, epots, ekins, econs, n_overflow,
         n_skin_violations) = _run_nhc(
            model, params, jnp.asarray(z), jnp.asarray(pos),
            jnp.asarray(mom), jnp.asarray(masses), jnp.asarray(cell),
            dt=float(timestep), temp=float(kB * temperature_K),
            tdamp=float(tdamp), chain_length=int(chain_length),
            n_steps=int(n_steps), log_every=int(log_every),
            nlist_every=int(nlist_every), skin=float(skin),
            nlist_grid=nlist_grid, nlist_capacity=nlist_capacity)
    pos_f, mom_f = np.asarray(pos_f), np.asarray(mom_f)
    n_overflow = int(n_overflow)
    n_skin_violations = int(n_skin_violations)
    if n_overflow or n_skin_violations:
        import warnings
        warnings.warn(
            f'amortized MD list quality: {n_overflow} neighbor-capacity '
            f'overflows, {n_skin_violations} chunks where an atom moved '
            f'> skin/2 before the rebuild', stacklevel=2)
    for i, s in enumerate(systems):
        n = len(s)
        s.positions = pos_f[i, :n].astype(np.float64)
        s.momenta = mom_f[i, :n].astype(np.float64)
    dof = np.array([3 * len(s) for s in systems])
    epots, ekins = np.asarray(epots), np.asarray(ekins)
    log = {'epot': epots, 'ekin': ekins,
           'temperature': 2.0 * ekins / (dof[None, :] * kB),
           'conserved': np.asarray(econs),
           'nlist_overflow': n_overflow,
           'skin_violations': n_skin_violations}
    if not isinstance(system, (list, tuple)):
        log = {k: v[:, 0] if np.ndim(v) == 2 else v for k, v in log.items()}
        return systems[0], log
    return systems, log
