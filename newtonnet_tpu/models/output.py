'''Functional NewtonNet: output heads, scalers and aggregation.

The reference implements derivative outputs as stateful autograd heads
chained through a CustomOutputSet (newtonnet/models/output.py:51-254):
forces = -dE/dpos, virial = -dE/d(strain displacement),
stress = dE/d(displacement) / det(cell), Hessian = d2E/dpos2,
BEC via the `les` package. Here the same quantities are derivatives of one
pure energy function, taken with jax.grad / jax.jacfwd / jax.jacrev --
jit-compatible, composable, and exact to machine precision.

The strain-displacement (virial/stress) trick mirrors the reference
EmbeddingNet (newtonnet.py:146-155): an identity-valued symmetric strain is
applied to positions and cell; its gradient is the virial.

Aggregation semantics match the reference EnergyAggregator
(output.py:226-247): per-graph sum of atomic energies, plus the latent
Ewald long-range energy when a charge head is configured. As in the
reference, E_lr is evaluated at the *raw* (undisplaced) positions/cell, so
the long-range term contributes to forces but not to the virial/stress
(outputs.pos / outputs.cell leaves at newtonnet.py:97, output.py:237-241).

Head ordering constraints from the reference (charge before energy before
gradient_force/hessian, config.yml:36) are resolved here by computing in
dependency order internally, so any order in `output_properties` works.
'''
from typing import Sequence

import jax
import jax.numpy as jnp

from newtonnet_tpu.models.newtonnet import NewtonNetCore
from newtonnet_tpu.ops.ewald import ewald_energy
from newtonnet_tpu.ops.linalg3 import det3x3

DIRECT_PROPERTIES = ('energy', 'charge', 'direct_force')
DERIVATIVE_PROPERTIES = ('gradient_force', 'virial', 'stress')
SECOND_DERIVATIVE_PROPERTIES = ('hessian', 'bec')
ALL_PROPERTIES = (DIRECT_PROPERTIES + DERIVATIVE_PROPERTIES
                  + SECOND_DERIVATIVE_PROPERTIES)


class NewtonNet:
    '''User-facing model: configuration + pure init/apply functions.

    Mirrors the reference constructor signature
    (newtonnet/models/newtonnet.py:26-35). Unlike the reference nn.Module,
    this object is stateless: parameters live in a pytree returned by
    `init` and consumed by `apply`.
    '''

    def __init__(
            self,
            cutoff: float = 5.0,
            n_features: int = 128,
            n_basis: int = 20,
            n_interactions: int = 3,
            activation: str = 'swish',
            layer_norm: bool = False,
            output_properties: Sequence[str] = (),
            mic_mode: str = 'exact',
            graph_mode: str = 'dense',
            k_max: int = 48,
            cell_grid: Sequence[int] = (),
            cell_capacity: int = 0,
            reverse_lists: bool = False,
            inverse_lists: bool = False,
            newton3: bool = False,
            newton3_compact: bool = False,
            compute_dtype: str = '',
            trainable_basis: bool = False,
            hessian_block: int = 0,
            ewald_sigma: float = 1.0,
            ewald_n_k: int = 8,
            ewald_mode: str = 'auto',
            kernel: str = 'xla',
            pallas_dot_dtype: str = 'float32',
            pallas_grad_dot_dtype: str = 'bfloat16',
            param_dtype=jnp.float32,
    ):
        for key in output_properties:
            if key not in ALL_PROPERTIES:
                raise NotImplementedError(
                    f'Output type {key} is not implemented yet')
        if newton3_compact:
            if newton3 or reverse_lists or inverse_lists \
                    or graph_mode != 'neighborlist' or kernel != 'xla':
                raise ValueError(
                    'newton3_compact is its own neighborlist edge layout '
                    '(kernel=xla, no newton3/reverse_lists/inverse_lists)')
            bad = set(output_properties) & {'hessian', 'bec'}
            if bad:
                raise ValueError(
                    f'newton3_compact does not support {sorted(bad)}: '
                    'their per-graph vmap wrappers unpack flat (idx, mask) '
                    'nlists, not staircase chunk tuples -- use newton3 for '
                    'those heads')
        if kernel not in ('xla', 'pallas'):
            raise ValueError(f'kernel must be xla or pallas, got {kernel}')
        if kernel == 'pallas':
            allowed = {'energy', 'gradient_force', 'virial', 'stress'}
            bad = set(output_properties) - allowed
            if (bad or graph_mode not in ('dense', 'neighborlist')
                    or activation != 'swish' or layer_norm
                    or trainable_basis):
                raise ValueError(
                    'kernel=pallas supports the dense/neighborlist graph '
                    'modes with swish activation, no layer_norm/'
                    'trainable_basis, and outputs '
                    f'within {sorted(allowed)}; offending config: '
                    f'{sorted(bad) or [graph_mode, activation]}')
            if graph_mode == 'dense' and compute_dtype:
                raise ValueError(
                    'kernel=pallas (dense) does not take compute_dtype '
                    '(the fused kernels manage precision internally)')
            if graph_mode == 'neighborlist':
                if newton3 or reverse_lists or inverse_lists:
                    raise ValueError(
                        'kernel=pallas neighborlist uses plain full lists '
                        '(newton3/reverse_lists/inverse_lists unsupported: '
                        'aggregation happens inside the fused kernel)')
        self.output_properties = list(output_properties)
        self.cutoff = cutoff
        self.n_features = n_features
        self.n_basis = n_basis
        self.n_interactions = n_interactions
        self.activation = activation
        self.layer_norm = layer_norm
        self.mic_mode = mic_mode
        self.graph_mode = graph_mode
        self.k_max = k_max
        self.cell_grid = tuple(cell_grid)
        self.cell_capacity = cell_capacity
        self.reverse_lists = reverse_lists
        self.inverse_lists = inverse_lists
        self.newton3 = newton3
        self.newton3_compact = newton3_compact
        self.compute_dtype = compute_dtype
        self.trainable_basis = trainable_basis
        self.hessian_block = hessian_block  # >0: lax.map-blocked HVP lanes
        self.ewald_sigma = ewald_sigma
        self.ewald_n_k = ewald_n_k
        self.ewald_mode = ewald_mode
        self.kernel = kernel
        self.pallas_dot_dtype = pallas_dot_dtype
        # MXU dtype for the parameter-GRADIENT dual kernels only (the
        # loss/force path keeps pallas_dot_dtype): bf16 dots with fp32
        # accumulation on the gradient path are standard mixed-precision
        # training practice -- ~0.3% relative gradient noise, well under
        # the optimizer's own stochasticity -- and the dual backward
        # kernel is the measured hot spot of the dense train step
        # (PERF_NOTES.md round-3 trace).
        self.pallas_grad_dot_dtype = pallas_grad_dot_dtype
        self.param_dtype = param_dtype

        needs = set(self.output_properties)
        # derivative heads need the energy; bec needs charges (ref output.py:214)
        if needs & set(DERIVATIVE_PROPERTIES) or 'hessian' in needs:
            needs.add('energy')
        if 'bec' in needs:
            needs.add('charge')
        core_props = tuple(k for k in DIRECT_PROPERTIES if k in needs)
        self._needs = needs
        self.core = NewtonNetCore(
            cutoff=cutoff, n_features=n_features, n_basis=n_basis,
            n_interactions=n_interactions, activation=activation,
            layer_norm=layer_norm, output_properties=core_props,
            mic_mode=mic_mode, graph_mode=graph_mode, k_max=k_max,
            cell_grid=tuple(cell_grid), cell_capacity=cell_capacity,
            reverse_lists=reverse_lists, inverse_lists=inverse_lists,
            newton3=newton3, newton3_compact=newton3_compact,
            compute_dtype=compute_dtype,
            trainable_basis=trainable_basis, param_dtype=param_dtype)

    # ------------------------------------------------------------------ #
    def with_ewald_mode(self, mode):
        '''Clone with a statically resolved ewald_mode.

        ewald_mode='auto' (the constructor default) is per-graph runtime
        dispatch: it computes BOTH Ewald branches (reciprocal-space and
        direct-space, ops/ewald.ewald_energy) every energy evaluation and
        selects with a `where`. That is correct for genuinely mixed
        batches but pays for the unused branch when the data is statically
        all-periodic or all-aperiodic. This returns a model identical to
        self but with the single matching branch compiled
        ('periodic'/'aperiodic'); the Ewald sum is parameter-free, so the
        SAME params pytree applies unchanged.

        No-op (returns self) when the model has no charge head or already
        has a static mode. Resolution points across the framework:
        the training CLI resolves from dataset periodicity
        (scripts/newtonnet_train.py), the MD calculator resolves per
        system's cell (md/calculator.py), AOT export takes a `periodic`
        argument (utils/export.py), and halo training requires 'periodic'
        explicitly (parallel/halo.py).
        '''
        if mode not in ('periodic', 'aperiodic'):
            raise ValueError(
                f"ewald mode must be 'periodic' or 'aperiodic', got {mode!r}")
        if 'charge' not in self._needs or self.ewald_mode != 'auto':
            return self
        cfg = self.config_dict()
        cfg['ewald_mode'] = mode
        return type(self)(param_dtype=self.param_dtype, **cfg)

    @property
    def ewald_dispatches_at_runtime(self):
        '''True when apply() compiles BOTH Ewald branches (see
        with_ewald_mode); consumers that know the data's periodicity
        statically should resolve first.'''
        return 'charge' in self._needs and self.ewald_mode == 'auto'

    # ------------------------------------------------------------------ #
    def init(self, rng, z, pos, cell):
        '''Initialize the parameter pytree from example (batched) inputs.

        Jitted: on the remote-tunneled TPU backend, eager op-by-op execution
        is orders of magnitude slower than one compiled call.
        '''
        return jax.jit(self.core.init)(rng, z, pos, cell)

    def config_dict(self):
        '''Serializable model config (used by checkpoints).'''
        return {
            'cutoff': self.cutoff, 'n_features': self.n_features,
            'n_basis': self.n_basis, 'n_interactions': self.n_interactions,
            'activation': self.activation, 'layer_norm': self.layer_norm,
            'output_properties': list(self.output_properties),
            'mic_mode': self.mic_mode, 'graph_mode': self.graph_mode,
            'k_max': self.k_max, 'cell_grid': list(self.cell_grid),
            'cell_capacity': self.cell_capacity,
            'reverse_lists': self.reverse_lists,
            'inverse_lists': self.inverse_lists,
            'newton3': self.newton3,
            'newton3_compact': self.newton3_compact,
            'compute_dtype': self.compute_dtype,
            'trainable_basis': self.trainable_basis,
            'hessian_block': self.hessian_block,
            'ewald_sigma': self.ewald_sigma, 'ewald_n_k': self.ewald_n_k,
            'ewald_mode': self.ewald_mode, 'kernel': self.kernel,
            'pallas_dot_dtype': self.pallas_dot_dtype,
            'pallas_grad_dot_dtype': self.pallas_grad_dot_dtype,
        }

    # ------------------------------------------------------------------ #
    def _energy_and_aux(self, params, z, pos, displacement, cell,
                        nlist=None):
        '''Total (summed over graphs) energy and auxiliary outputs.

        The strain trick (ref newtonnet.py:146-155): `displacement` is an
        identity-valued (B, 3, 3) tensor; pos and cell are transformed by its
        symmetrization before entering the core, so
        d(energy)/d(displacement) = virial tensor.
        '''
        sym = 0.5 * (displacement + jnp.swapaxes(displacement, -1, -2))
        pos_d = jnp.einsum('bni,bij->bnj', pos, sym)
        cell_d = jnp.einsum('bxi,bij->bxj', cell, sym)
        if self.kernel == 'pallas' and self.graph_mode == 'neighborlist':
            from newtonnet_tpu.models.pallas_klist import apply_core_nlist
            out = apply_core_nlist(params, self, z, pos_d, cell_d,
                                   nlist=nlist)
        elif self.kernel == 'pallas':
            from newtonnet_tpu.models.pallas_stack import apply_core
            out = apply_core(params, self, z, pos_d, cell_d)
        else:
            out = self.core.apply(params, z, pos_d, cell_d, nlist=nlist)

        atom_mask = z > 0
        if 'energy' in self._needs:
            energy = jnp.sum(out['atomic_energy'][..., 0], axis=-1)  # (B,)
            if 'charge' in self._needs:
                # long-range latent Ewald at raw pos/cell (ref output.py:237-241)
                energy = energy + ewald_energy(
                    out['charge'], pos, cell, atom_mask,
                    sigma=self.ewald_sigma, n_k=self.ewald_n_k,
                    mode=self.ewald_mode)
            out['energy'] = energy
            return jnp.sum(energy), out
        return jnp.zeros((), pos.dtype), out

    def _identity_displacement(self, cell):
        b = cell.shape[0]
        return jnp.broadcast_to(jnp.eye(3, dtype=cell.dtype), (b, 3, 3))

    # ------------------------------------------------------------------ #
    def apply(self, params, z, pos, cell, nlist=None):
        '''Full forward pass.

        Args:
            params: parameter pytree from `init`.
            z: (B, N) int atomic numbers, 0 = padding.
            pos: (B, N, 3) positions.
            cell: (B, 3, 3) lattice rows (all-zero = aperiodic).
            nlist: optional precomputed (idx, mask) neighbor lists
                (graph_mode='neighborlist' only; see NewtonNetCore).

        Returns:
            dict of outputs; always contains the configured
            output_properties, keyed as the reference names them:
            energy (B,), gradient_force/direct_force (B, N, 3),
            hessian (B, N, 3, N, 3), virial/stress (B, 3, 3),
            charge (B, N), bec (B, N, 3, 3), plus atom_node / force_node.
        '''
        needs = self._needs
        displacement = self._identity_displacement(cell)

        need_grad = bool(needs & {'gradient_force', 'virial', 'stress',
                                  'hessian'})
        if need_grad:
            grad_fn = jax.grad(self._energy_and_aux, argnums=(2, 3),
                               has_aux=True)
            (pos_grad, disp_grad), out = grad_fn(
                params, z, pos, displacement, cell, nlist)
        else:
            _, out = self._energy_and_aux(params, z, pos, displacement, cell,
                                          nlist)

        outputs = dict(out)
        if 'gradient_force' in needs:
            outputs['gradient_force'] = -pos_grad  # (ref output.py:112)
        if 'virial' in needs:
            outputs['virial'] = -disp_grad  # (ref output.py:164)
        if 'stress' in needs:
            volume = jnp.abs(det3x3(cell))[:, None, None]
            outputs['stress'] = disp_grad / volume  # (ref output.py:174-180)
        if 'hessian' in needs:
            outputs['hessian'] = self._hessian(params, z, pos, cell, nlist)
        if 'bec' in needs:
            outputs['bec'] = self._bec(params, z, pos, cell, out['charge'],
                                       nlist)
        return outputs

    def __call__(self, params, z, pos, cell):
        return self.apply(params, z, pos, cell)

    # ------------------------------------------------------------------ #
    def _single_graph_pos_grad(self, params, z, pos, cell, nlist=None):
        '''dE/dpos for one unbatched graph (N, 3) -- used by the Hessian.'''
        def energy(p):
            disp = self._identity_displacement(cell[None])
            nl = (None if nlist is None
                  else tuple(a[None] for a in nlist))
            total, _ = self._energy_and_aux(
                params, z[None], p[None], disp, cell[None], nl)
            return total
        return jax.grad(energy)(pos)

    def _hessian(self, params, z, pos, cell, nlist=None):
        '''Per-graph Hessian d2E/dpos2: (B, N, 3, N, 3).

        Forward-over-reverse (jacfwd of grad) instead of the reference's
        vmap-of-VJP over eye(3N) rows (ref output.py:142-151); graphs are
        independent, so the Hessian is computed per graph under vmap to
        avoid the (BN3)^2 cross-graph zero blocks.

        hessian_block > 0 computes the 3N tangent lanes in lax.map blocks
        of that many HVP columns (jvp of the force function) instead of
        all at once: live memory drops from 3N x (tangent state) to
        block x (tangent state), which is what makes Hessians of
        large systems fit on one chip. Exact -- the lanes are independent.
        '''
        block = int(self.hessian_block)

        def single(z1, pos1, cell1, *nl1):
            grad_fn = lambda p: self._single_graph_pos_grad(  # noqa: E731
                params, z1, p, cell1, nl1 or None)
            n = pos1.shape[0]
            if block <= 0 or block >= 3 * n:
                return jax.jacfwd(grad_fn)(pos1)
            n_blocks = -(-3 * n // block)

            def one_block(k):
                # block one-hot seeds built from indices (never the full
                # (3N, 3N) identity -- that allocation is what blocking
                # is meant to avoid); lanes past 3N-1 seed zero and are
                # sliced off below
                lanes = k * block + jnp.arange(block)
                vs = (lanes[:, None] == jnp.arange(3 * n)[None, :]) \
                    .astype(pos1.dtype).reshape(block, n, 3)
                return jax.vmap(
                    lambda v: jax.jvp(grad_fn, (pos1,), (v,))[1])(vs)

            rows = jax.lax.map(one_block, jnp.arange(n_blocks))
            rows = rows.reshape(n_blocks * block, n, 3)[:3 * n]
            # rows[c, j, d] = d grad[j, d] / d pos_c: move the seed axis
            # last to match jacfwd's (output, direction) = (N, 3, N, 3)
            return rows.reshape(n, 3, n, 3).transpose(2, 3, 0, 1)

        return jax.vmap(single)(z, pos, cell, *(nlist or ()))

    def _bec(self, params, z, pos, cell, charge, nlist=None):
        '''Born effective charges (B, N, 3, 3).

        Z*_{i,ab} = dP_a/dr_{i,b} with polarization P = sum_j q_j r_j:
        Z*_i = q_i I + sum_j r_j (x) dq_j/dr_i. The reference obtains BEC
        from the `les` package (ref output.py:214-223); this is the LES
        method's polarization derivative computed with jax.jacrev through
        the charge head.
        '''
        def single_charges(z1, pos1, cell1, nl1):
            disp = self._identity_displacement(cell1[None])
            sym = 0.5 * (disp + jnp.swapaxes(disp, -1, -2))
            pos_d = jnp.einsum('bni,bij->bnj', pos1[None], sym)
            cell_d = jnp.einsum('bxi,bij->bxj', cell1[None], sym)
            nl = None if not nl1 else tuple(a[None] for a in nl1)
            out = self.core.apply(params, z1[None], pos_d, cell_d, nlist=nl)
            return out['charge'][0]  # (N,)

        def single_bec(z1, pos1, cell1, q1, *nl1):
            jac = jax.jacrev(
                lambda p: single_charges(z1, p, cell1, nl1))(pos1)
            # jac[j, i, b] = dq_j / dr_{i, b}
            cross = jnp.einsum('ja,jib->iab', pos1, jac)  # (N, 3, 3)
            return q1[:, None, None] * jnp.eye(3, dtype=pos1.dtype) + cross

        return jax.vmap(single_bec)(z, pos, cell, charge, *(nlist or ()))
