'''Latent Ewald Summation (LES) equivalent: long-range electrostostatic energy
from latent charges, plus Born effective charges.

The reference delegates this to the external `les` package
(newtonnet/models/output.py:5,210-223,229-244): EnergyAggregator adds
`E_lr = les(positions, cell, latent_charges, batch, compute_energy=True)`
to the short-range energy, and BornEffectiveChargeOutput computes
`BEC = les(..., compute_bec=True)`. `les` is not available in this
environment, so this module reconstructs the published method
(B. Cheng, "Latent Ewald summation for machine learning of long-range
interactions", npj Comput. Mater. 2025; arXiv:2408.15165):

  * periodic:  E_lr = (2 pi / V) * sum_{0 < |k| <= k_c}
                   exp(-sigma^2 k^2 / 2) / k^2 * |S(k)|^2,
               S(k) = sum_i q_i exp(i k . r_i)
  * aperiodic: E_lr = 1/2 sum_{i != j} q_i q_j erf(|r_ij| / (sqrt(2) sigma))
                   / |r_ij|
  * BEC:       Z*_{i,ab} = d P_a / d r_{i,b} with polarization
               P = sum_j q_j r_j  =>  Z*_i = q_i I + sum_j (d q_j / d r_i) r_j
               (computed in newtonnet_tpu/models/output.py via jax.jacrev
               through the charge head).

All sums are over static padded shapes with masks; the reciprocal-space sum
is a dense (K, N) matmul pair that maps straight onto the MXU.

Conventions (validated in tests/test_ewald.py against an independent fp64
textbook-Ewald oracle on orthorhombic and triclinic cells, rtol 1e-10):

  * sigma is the PAIR-COMBINED Gaussian smearing width: the aperiodic
    kernel is erf(r / (sqrt(2) sigma)) / r, i.e. each charge carries a
    Gaussian of std sigma/sqrt(2);
  * the periodic E_lr is the bare reciprocal sum -- it RETAINS the
    Gaussian self-energy sum_i q_i^2 / (sqrt(2 pi) sigma), exactly as the
    published les method defines E_lr (no self-energy subtraction; the
    learned latent charges absorb it during training):
      E_lr = E_smeared_total + (1/2) sqrt(2/pi) / sigma * sum_i q_i^2;
  * neutral-cell tinfoil boundary (no k=0 term).
'''
import jax
import jax.numpy as jnp
from newtonnet_tpu.ops.linalg3 import det3x3, inv3x3

TWO_PI = 2.0 * jnp.pi


def _k_lattice(n_k):
    '''Integer reciprocal-lattice offsets within an n_k cube (static shape).

    Returns (M, 3) int offsets with M = (2 n_k + 1)^3 INCLUDING the
    origin, plus a boolean mask that is False exactly at the origin --
    every consumer must apply the mask (the k=0 term diverges).
    '''
    r = jnp.arange(-n_k, n_k + 1)
    kx, ky, kz = jnp.meshgrid(r, r, r, indexing='ij')
    k = jnp.stack([kx.ravel(), ky.ravel(), kz.ravel()], axis=-1)
    origin = jnp.all(k == 0, axis=-1)
    return k, ~origin


def ewald_energy_periodic(charge, pos, cell, atom_mask, sigma=1.0, n_k=8):
    '''Reciprocal-space latent Ewald energy for periodic graphs.

    Args:
        charge: (B, N) latent charges (padding entries must be 0).
        pos: (B, N, 3) positions.
        cell: (B, 3, 3) lattice rows.
        atom_mask: (B, N) bool.
        sigma: charge smearing width (Angstrom).
        n_k: reciprocal-space cube half-width (static); modes with
            |k| > 2 pi * k_cut are damped to ~0 by the Gaussian factor.

    Returns:
        (B,) long-range energy per graph.
    '''
    is_periodic = jnp.any(cell != 0, axis=(-1, -2))
    eye = jnp.eye(3, dtype=cell.dtype)
    safe_cell = jnp.where(is_periodic[:, None, None], cell, eye)
    # closed-form det/inv (ops/linalg3): jnp.linalg.det/inv lower to LAPACK
    # custom calls on CPU, which segfault when replayed from a jax.export
    # artifact in a fresh process (charge-head serving).
    volume = jnp.abs(det3x3(safe_cell))  # (B,)
    # reciprocal rows: b = 2 pi inv(cell)^T  (rows of cell are lattice vectors)
    recip = TWO_PI * jnp.swapaxes(inv3x3(safe_cell), -1, -2)  # (B,3,3)

    offsets, k_mask = _k_lattice(n_k)  # (M, 3), (M,)
    kvec = jnp.einsum('mx,bxy->bmy', offsets.astype(pos.dtype), recip)
    k2 = jnp.sum(kvec * kvec, axis=-1)  # (B, M)
    k2_safe = jnp.where(k_mask[None, :], k2, 1.0)

    # wrap positions into the cell before the phase: e^{ik.(r+nL)} equals
    # e^{ik.r} exactly, but unwrapped MD positions drift to many box
    # lengths and |k.r| ~ 1e3-1e4 rad costs fp32 sin/cos ~4 digits.
    # frac%1 is piecewise-identity in pos, so derivatives stay exact.
    frac = jnp.einsum('bny,byx->bnx', pos, inv3x3(safe_cell))
    pos_w = jnp.einsum('bnx,bxy->bny', frac % 1.0, safe_cell)
    pos_w = jnp.where(is_periodic[:, None, None], pos_w, pos)
    phase = jnp.einsum('bmy,bny->bmn', kvec, pos_w)  # (B, M, N)
    q = charge * atom_mask.astype(charge.dtype)
    s_re = jnp.einsum('bmn,bn->bm', jnp.cos(phase), q)
    s_im = jnp.einsum('bmn,bn->bm', jnp.sin(phase), q)
    s2 = s_re * s_re + s_im * s_im  # (B, M)

    weight = jnp.exp(-0.5 * sigma * sigma * k2_safe) / k2_safe
    weight = jnp.where(k_mask[None, :], weight, 0.0)
    energy = (TWO_PI / volume) * jnp.sum(weight * s2, axis=-1)
    return jnp.where(is_periodic, energy, 0.0)


def ewald_energy_periodic_sharded(charge, pos, cell, atom_mask, graph_axis,
                                  sigma=1.0, n_k=8):
    '''Reciprocal-space latent Ewald energy with atoms sharded over a mesh
    axis (halo graph parallelism, parallel/halo.py).

    The structure factor is a sum over atoms, so it shards naturally:
    S(k) = psum_shards S_loc(k). Called per shard inside shard_map with the
    LOCAL atom slab (charge (B, N_loc), pos (B, N_loc, 3); cell/atom
    metadata replicated along the graph axis), it returns a per-shard local
    energy contribution

        e_lr_local = sum_k P_k(cell) Re[conj(psum(S_loc)) S_loc]

    (P_k the k-weight (2 pi / V) exp(-s^2 k^2/2)/k^2) with the psum fully
    DIFFERENTIABLE. The sum over shards of e_lr_local equals
    sum_k P_k |S|^2 == ewald_energy_periodic of the full graph as a
    FUNCTIONAL IDENTITY, not merely in value -- so under shard_map's psum
    transpose (which accumulates cotangents across shards) every
    derivative order of the shard-summed energy is exact automatically:
    first-order charge/position/cell gradients (the product rule's factor
    2 on dS emerges from the transpose), and the second-order terms a
    force-mse parameter gradient needs (d^2 E / dpos dtheta couples shards
    through dS/dtheta -- a stop_gradient'd structure factor would silently
    drop exactly that coupling). No surrogate is needed here, unlike the
    per-graph energy residual in parallel/halo.py: e_lr_local is
    shard-VARYING and decomposes the global energy, whereas a replicated
    per-shard quantity would D-fold overcount under the same transpose.
    '''
    is_periodic = jnp.any(cell != 0, axis=(-1, -2))
    eye = jnp.eye(3, dtype=cell.dtype)
    safe_cell = jnp.where(is_periodic[:, None, None], cell, eye)
    volume = jnp.abs(det3x3(safe_cell))
    recip = TWO_PI * jnp.swapaxes(inv3x3(safe_cell), -1, -2)

    offsets, k_mask = _k_lattice(n_k)
    kvec = jnp.einsum('mx,bxy->bmy', offsets.astype(pos.dtype), recip)
    k2 = jnp.sum(kvec * kvec, axis=-1)
    k2_safe = jnp.where(k_mask[None, :], k2, 1.0)

    frac = jnp.einsum('bny,byx->bnx', pos, inv3x3(safe_cell))
    pos_w = jnp.einsum('bnx,bxy->bny', frac % 1.0, safe_cell)
    pos_w = jnp.where(is_periodic[:, None, None], pos_w, pos)
    phase = jnp.einsum('bmy,bny->bmn', kvec, pos_w)  # (B, M, N_loc)
    q = charge * atom_mask.astype(charge.dtype)
    s_re = jnp.einsum('bmn,bn->bm', jnp.cos(phase), q)  # local partial
    s_im = jnp.einsum('bmn,bn->bm', jnp.sin(phase), q)
    sbar_re = jax.lax.psum(s_re, graph_axis)  # differentiable (see above)
    sbar_im = jax.lax.psum(s_im, graph_axis)

    u = sbar_re * s_re + sbar_im * s_im  # (B, M)
    weight = jnp.exp(-0.5 * sigma * sigma * k2_safe) / k2_safe
    weight = jnp.where(k_mask[None, :], weight, 0.0)
    p = (TWO_PI / volume[:, None]) * weight
    e_local = jnp.sum(p * u, axis=-1)
    return jnp.where(is_periodic, e_local, 0.0)


def ewald_energy_aperiodic(charge, pos, atom_mask, sigma=1.0, eps=1e-12):
    '''Direct-space smeared Coulomb energy for isolated molecules.

    E = 1/2 sum_{i != j} q_i q_j erf(|r_ij| / (sqrt(2) sigma)) / |r_ij|
    '''
    disp = pos[:, :, None, :] - pos[:, None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(disp * disp, axis=-1), eps))  # (B,N,N)
    n = pos.shape[1]
    pair_mask = (atom_mask[:, :, None] & atom_mask[:, None, :]
                 & ~jnp.eye(n, dtype=bool))
    q = charge * atom_mask.astype(charge.dtype)
    qq = q[:, :, None] * q[:, None, :]
    kernel = jax.scipy.special.erf(d / (jnp.sqrt(2.0) * sigma)) / d
    return 0.5 * jnp.sum(jnp.where(pair_mask, qq * kernel, 0.0), axis=(1, 2))


def ewald_energy(charge, pos, cell, atom_mask, sigma=1.0, n_k=8,
                 mode='auto'):
    '''Long-range latent-charge energy.

    mode (static):
      'periodic'  -- reciprocal-space sum only (all graphs have cells);
      'aperiodic' -- direct-space smeared Coulomb only (molecular data);
      'auto'      -- per-graph runtime dispatch: computes BOTH static
                     branches and selects with `where`. Correct for mixed
                     batches, but pays for the unused branch -- set the
                     static mode when the dataset's periodicity is known.
                     Library resolution points: NewtonNet.with_ewald_mode
                     clones a model onto the static branch (the CLI, MD
                     calculator, and AOT export all resolve automatically
                     -- see models/output.py with_ewald_mode docstring).
    '''
    if mode == 'periodic':
        return ewald_energy_periodic(charge, pos, cell, atom_mask,
                                     sigma=sigma, n_k=n_k)
    if mode == 'aperiodic':
        return ewald_energy_aperiodic(charge, pos, atom_mask, sigma=sigma)
    if mode != 'auto':
        raise ValueError(f'unknown ewald mode {mode!r}')
    is_periodic = jnp.any(cell != 0, axis=(-1, -2))
    e_per = ewald_energy_periodic(charge, pos, cell, atom_mask,
                                  sigma=sigma, n_k=n_k)
    e_aper = ewald_energy_aperiodic(charge, pos, atom_mask, sigma=sigma)
    return jnp.where(is_periodic, e_per, e_aper)
