'''Fast parameter gradients for energy + gradient-force training.

The standard train step computes grad_params of a loss that itself contains
jax.grad(E, pos) -- reverse-over-reverse AD. For losses that depend on the
model only through E and F = -dE/dpos (the dominant MLIP training
configuration, reference train/trainer.py:243-266), the chain rule gives an
exactly equivalent *reverse-over-forward* form:

    dL/dtheta = d/dtheta [ e_bar . E(theta)  -  D_v E(theta) ],
    v = f_bar,   e_bar = dL/dE,   f_bar = dL/dF   (held constant),

where D_v E is the directional derivative of the energies along v -- a jvp.
Every AD pass is then first order: primal forward, one reverse for F, one
dual-number forward for D_v E, and one reverse over that forward for the
parameter cotangents. On TPU this avoids XLA's expensive transpose-of-
transpose program and reuses the primal subgraph across passes.

The residuals e_bar / f_bar are obtained generically as the gradient of the
configured main_loss with respect to the *predictions* dict, so every loss
mode (mse / mae / huber, weights, masking) from train/loss.py is supported
unchanged. Exactness vs the standard path is proven to float tolerance in
tests/test_train.py.
'''
import jax
import jax.numpy as jnp

# prediction keys whose parameter-dependence this path accounts for
SUPPORTED_KEYS = frozenset({'energy', 'gradient_force'})


def supports(losses):
    '''True if the configured loss dict only touches energy/gradient_force.'''
    return losses is not None and set(losses) <= SUPPORTED_KEYS


def value_and_grad(model, main_loss, params, batch, nlist=None):
    '''(loss, grads) == jax.value_and_grad over the standard loss_fn, for
    losses restricted to {energy, gradient_force}.

    Args:
        model: models.output.NewtonNet (stateless wrapper).
        main_loss: main_loss from get_loss_by_string -- must only read
            preds['energy'] / preds['gradient_force'].
        params: parameter pytree (the differentiated argument).
        batch: padded batch dict with z/pos/cell (+targets).

    Returns:
        (loss scalar, grads pytree matching params, preds dict with the
        energy/gradient_force predictions for metric evaluation).
    '''
    z, pos, cell = batch['z'], batch['pos'], batch['cell']

    if (getattr(model, 'kernel', 'xla') == 'pallas'
            and model.graph_mode == 'dense'):
        # Fused-kernel path, geometry factored out: adj/dir/rbf carry no
        # parameter dependence, so they are computed ONCE (jax.linearize
        # shares the primal between the force pullback and the tangent
        # line) instead of re-traced inside both the force vjp and the
        # grad-of-surrogate. The strain displacement is skipped: it is
        # the identity here (no virial/stress in SUPPORTED_KEYS) and
        # pos @ I == pos exactly.
        from newtonnet_tpu.models import pallas_stack as ps

        adj, feats = ps._geometry(model, z, pos, cell)
        (dir_t, rbf), feats_lin = jax.linearize(feats, pos)

        def e_from_geom(geom):
            out = ps.core_from_geom(params, model, z, adj, *geom)
            return jnp.sum(out['atomic_energy'][..., 0], axis=-1)  # (B,)

        energy, pull_geom = jax.vjp(e_from_geom, (dir_t, rbf))
        dgeom = pull_geom(jnp.ones_like(energy))[0]
        dpos = jax.linear_transpose(feats_lin, pos)(dgeom)[0]
        forces = -dpos

        preds = {'energy': energy, 'gradient_force': forces}
        loss, cots = jax.value_and_grad(main_loss)(preds, batch)
        e_bar = jax.lax.stop_gradient(cots['energy'])          # (B,)
        v = jax.lax.stop_gradient(-cots['gradient_force'])     # (B, N, 3)
        dirdot_t, rbfdot = feats_lin(v)

        def surrogate(p):
            evec, tangent = ps.dual_energy_from_geom(
                p, model, z, adj, dir_t, rbf, dirdot_t, rbfdot)
            return jnp.vdot(e_bar, evec) + jnp.sum(tangent)

        grads = jax.grad(surrogate)(params)
        return loss, grads, preds

    disp = model._identity_displacement(cell)

    def energies(p, x):
        _, out = model._energy_and_aux(p, z, x, disp, cell, nlist)
        return out['energy']  # (B,)

    # primal energies + forces (reverse pass wrt positions only)
    energy, pullback = jax.vjp(lambda x: energies(params, x), pos)
    forces = -pullback(jnp.ones_like(energy))[0]  # (B, N, 3)

    preds = {'energy': energy, 'gradient_force': forces}
    loss, cots = jax.value_and_grad(main_loss)(preds, batch)
    e_bar = jax.lax.stop_gradient(cots['energy'])            # (B,)
    v = jax.lax.stop_gradient(-cots['gradient_force'])       # (B, N, 3)

    if getattr(model, 'kernel', 'xla') == 'pallas':
        # fused-kernel dual forward (jax.jvp cannot pierce the custom-VJP
        # pallas ops; the hand-written dual stack is that jvp)
        from newtonnet_tpu.models.pallas_klist import dual_energy_nlist

        def surrogate(p):
            evec, tangent = dual_energy_nlist(p, model, z, pos, cell, v,
                                              nlist=nlist)
            return jnp.vdot(e_bar, evec) + jnp.sum(tangent)
    else:
        def surrogate(p):
            # e_bar . E + dL/dF . F  ==  e_bar . E + D_v E  with v = -f_bar
            evec, tangent = jax.jvp(lambda x: energies(p, x), (pos,), (v,))
            return jnp.vdot(e_bar, evec) + jnp.sum(tangent)

    grads = jax.grad(surrogate)(params)
    return loss, grads, preds
