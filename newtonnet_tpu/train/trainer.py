'''Training runtime (reference: newtonnet/train/trainer.py).

Same surface as the reference Trainer -- output-dir management
(training_{n}/run_scripts/models), train/val/test cadence, best/last model
saving, CSV + optional wandb logging, plateau LR stepping on val loss,
train-state checkpointing, resume, lr early stop, end-of-training re-eval
of last and best models -- but as a functional JAX loop:

  * one jitted, donated train_step (forward + grad + optax update) and one
    jitted eval_step; both compile exactly once thanks to static padded
    batch shapes;
  * optional data-parallel execution over a jax.sharding.Mesh: the batch is
    sharded over the 'data' axis, parameters are replicated, and XLA inserts
    the gradient psum over ICI (newtonnet_tpu/parallel) -- replacing the
    reference's bit-rotted DataParallel path (trainer.py:71-74, SURVEY.md
    section 7 quirks);
  * checkpoints are pytrees of arrays, never pickled code.

Reference quirks fixed here (documented in SURVEY.md section 7):
  * `val_loss` KeyError when check_val > 1 (ref trainer.py:217) -- guarded;
  * multi-GPU call-convention mismatch -- gone by construction.
'''
import os
import shutil

import jax
import numpy as np
import optax

try:
    from tqdm import tqdm
except ImportError:  # pragma: no cover
    def tqdm(x, **kw):
        return x

from newtonnet_tpu.train.loss import get_loss_by_string
from newtonnet_tpu.train.optimizer import (  # noqa: F401 (re-export)
    ReduceLROnPlateau,
    get_optimizer_by_string,
)
from newtonnet_tpu.utils import checkpoint as ckpt


def set_learning_rate(opt_state, lr):
    '''Set the injected learning rate inside a (possibly chained) opt state.'''
    def visit(state):
        if hasattr(state, 'hyperparams') and 'learning_rate' in state.hyperparams:
            state.hyperparams['learning_rate'] = jax.numpy.asarray(
                lr, state.hyperparams['learning_rate'].dtype)
            return True
        if isinstance(state, (tuple, list)):
            return any(visit(s) for s in state)
        return False
    if not visit(opt_state):
        raise ValueError('no injected learning_rate found in opt_state')
    return opt_state


def with_learning_rate(opt_state, lr):
    '''Pure (traceable) version of set_learning_rate: returns a new opt
    state whose injected learning_rate is `lr`. Used inside the jitted
    train step so per-step schedulers (OneCycleLR) can vary the lr within
    a lax.scan chunk without recompiling.'''
    import jax.numpy as jnp

    def rec(state):
        if hasattr(state, 'hyperparams') and 'learning_rate' in state.hyperparams:
            hp = dict(state.hyperparams)
            hp['learning_rate'] = jnp.asarray(lr, hp['learning_rate'].dtype)
            return state._replace(hyperparams=hp), True
        if isinstance(state, tuple) and not hasattr(state, '_fields'):
            out, found = [], False
            for s in state:
                if found:
                    out.append(s)
                else:
                    s2, found = rec(s)
                    out.append(s2)
            return tuple(out), found
        return state, False

    new_state, found = rec(opt_state)
    if not found:
        raise ValueError('no injected learning_rate found in opt_state')
    return new_state


def get_learning_rate(opt_state):
    def visit(state):
        if hasattr(state, 'hyperparams') and 'learning_rate' in state.hyperparams:
            return float(state.hyperparams['learning_rate'])
        if isinstance(state, (tuple, list)):
            for s in state:
                v = visit(s)
                if v is not None:
                    return v
        return None
    return visit(opt_state)


class Trainer:
    '''See module docstring. Parameters mirror the reference Trainer
    (trainer.py:41-58); `model` is a newtonnet_tpu NewtonNet, `optimizer`
    an optax transformation from get_optimizer_by_string, `lr_scheduler` an
    epoch scheduler from get_scheduler_by_string.'''

    def __init__(
            self,
            model,
            params,
            loss_fns=None,
            optimizer=None,
            lr_scheduler=None,
            output_base_path=None,
            script_path=None,
            settings_path=None,
            checkpoint=None,
            train_generator=None,
            val_generator=None,
            test_generator=None,
            epochs=100,
            clip_grad=0.0,
            log_wandb=False,
            mesh=None,
            steps_per_call=8,
            profile_dir=None,
            fast_grad='auto',
            halo=None,
            eval_matmul_precision='highest',
            ):
        self.model = model
        self.params = params
        # ewald_mode='auto' on a charge-head model is per-graph runtime
        # dispatch: BOTH Ewald branches compiled into every energy
        # evaluation (models/output.with_ewald_mode). The CLI resolves
        # from dataset periodicity before construction; a direct library
        # caller should not silently pay the dual-branch cost, so resolve
        # here from the first batch's static periodicity when the train
        # generator is re-iterable, else warn naming with_ewald_mode.
        # (ref output.py:237-241: the reference's les call branches on the
        # per-forward cell, the runtime analogue of 'auto'.)
        if getattr(model, 'ewald_dispatches_at_runtime', False) \
                and halo is None:
            mode = self._peek_periodicity(train_generator)
            if mode is not None:
                model = model.with_ewald_mode(mode)
                self.model = model
                print(f"ewald_mode: auto -> {mode} "
                      f"(from the first training batch)")
            else:
                import warnings
                warnings.warn(
                    "ewald_mode='auto' compiles BOTH Ewald branches every "
                    "step; resolve statically with "
                    "model.with_ewald_mode('periodic'|'aperiodic') when "
                    "the data's periodicity is known", stacklevel=2)
        if loss_fns is None:
            loss_fns = get_loss_by_string({'energy': {}})
        self.main_loss, self.eval_loss = loss_fns
        # first-order reverse-over-forward parameter gradients
        # (train/fastgrad.py). 'auto' enables it whenever the fused Pallas
        # kernel path is active (whose custom-VJP ops cannot be
        # differentiated twice); True forces it for the XLA path too
        # (exactly equivalent, often faster); False keeps the standard
        # reverse-over-reverse step.
        from newtonnet_tpu.train import fastgrad as _fastgrad
        loss_keys = getattr(self.main_loss, 'keys', None)
        if fast_grad == 'auto':
            fast_grad = (getattr(model, 'kernel', 'xla') == 'pallas'
                         and _fastgrad.supports(loss_keys))
        if fast_grad and not _fastgrad.supports(loss_keys):
            raise ValueError(
                f'fast_grad requires losses within '
                f'{sorted(_fastgrad.SUPPORTED_KEYS)}, got {loss_keys}')
        if (getattr(model, 'kernel', 'xla') == 'pallas' and not fast_grad
                and loss_keys and 'gradient_force' in loss_keys):
            raise ValueError(
                'kernel=pallas force training needs fast_grad (the fused '
                'kernels are first-order); pass fast_grad=True or "auto"')
        self.fast_grad = bool(fast_grad)
        self.tx = optimizer if optimizer is not None else \
            get_optimizer_by_string('adam', clip_grad=clip_grad)
        self.opt_state = self.tx.init(self.params)
        self.lr_scheduler = lr_scheduler
        if lr_scheduler is not None:
            # schedulers with an initial factor (LinearLR start_factor,
            # OneCycleLR initial_lr) must shape the very first step, as in
            # torch where the scheduler constructor writes param_groups lr
            self.opt_state = set_learning_rate(self.opt_state,
                                               lr_scheduler.lr)
        self.best_val_loss = float('inf')
        self.train_generator = train_generator
        self.val_generator = val_generator
        self.test_generator = test_generator
        self.start_epoch = 0
        self.start_step = 0
        self.epochs = epochs
        # batches executed per device dispatch (lax.scan over stacked
        # batches): each dispatch costs a host round trip on tunneled
        # backends, so chunking steps is a large wall-clock win
        self.steps_per_call = max(1, steps_per_call)
        self.log_rows = []
        self.log_wandb = log_wandb
        self.mesh = mesh
        # matmul precision for EVAL epochs only (see _eval_step_body);
        # None keeps the ambient default
        self.eval_matmul_precision = eval_matmul_precision
        # observability (SURVEY.md section 5): when set, the second training
        # epoch (post-compile) is captured with jax.profiler into this dir
        self.profile_dir = profile_dir
        # multi-process (multi-host) runs: every process executes the same
        # SPMD program over the global mesh; batches are assembled from
        # per-process slices (parallel/distributed.global_data_batch),
        # files (run dir, checkpoints, log.csv) are written by the chief
        # only, and the end-of-training re-eval uses in-memory params so
        # every process can participate in its collectives without a
        # shared filesystem.
        self._is_chief = jax.process_index() == 0
        self._multiproc = mesh is not None and jax.process_count() > 1
        self._best_params = None

        if output_base_path is not None and self._is_chief:
            self.make_subdirs(output_base_path, script_path, settings_path)
        else:
            self.output_path = None
            self.model_path = None

        checkpoint = checkpoint or {}
        self.check_log = checkpoint.get('check_log', 1)
        self.check_val = checkpoint.get('check_val', 1)
        self.check_test = checkpoint.get('check_test', 1)

        # per-step schedulers (torch OneCycleLR semantics) advance the lr
        # every optimizer step; the lr is threaded through the jitted
        # step/scan as a traced scalar so nothing recompiles
        self._per_step_sched = bool(
            lr_scheduler is not None and getattr(lr_scheduler, 'per_step',
                                                 False))
        # halo-exchange graph parallelism (parallel/halo.py): atoms of each
        # (large, pre-sorted) frame sharded over the mesh 'graph' axis with
        # boundary-only ppermute exchange per layer. The loss/gradients run
        # inside shard_map with their own psum algebra, so the loss config
        # is restricted to the mse battery of parallel/halo.HALO_LOSS_KEYS
        # (energy / gradient_force / direct_force / stress / virial).
        self.halo = dict(halo) if halo else None
        if self.halo and self._multiproc:
            # composed layout (SURVEY.md sections 2.3/5): 'data' OUTERMOST,
            # spanning processes (the gradient psum crosses the process
            # boundary once per step), 'graph' INNERMOST over each
            # process's local devices (per-layer halo ppermutes stay on
            # ICI). Every data row of the mesh must therefore live inside
            # one process -- jax.devices() orders devices by process, so
            # make_mesh(data=D, graph=G) satisfies this whenever G divides
            # the per-process device count.
            # Resolve the graph axis BY NAME (not by assuming a
            # ('data','graph') order): move it last, flatten everything
            # else, and require each graph-axis line to stay inside one
            # process (advisor r4: a caller-supplied ('graph','data') mesh
            # must not silently pass the guard).
            devs = np.asarray(self.mesh.devices)
            gax = self.mesh.axis_names.index('graph')
            lines = np.moveaxis(devs, gax, -1).reshape(-1, devs.shape[gax])
            for line in lines:
                procs = {d.process_index for d in line}
                if len(procs) > 1:
                    raise ValueError(
                        'halo + multi-process training needs the graph '
                        'axis process-local, but a graph-axis line spans '
                        f'processes {sorted(procs)}; build the mesh with '
                        'data spanning processes (data = a multiple of '
                        'the process count, graph <= devices per process)')
        if self._multiproc:
            # params/opt state must enter the multi-process jit as GLOBAL
            # replicated arrays (a process-local committed array cannot be
            # resharded across processes); every process initialized from
            # the same seed, so the host values agree
            _, repl = self._shardings()
            self.params = jax.device_put(jax.device_get(self.params), repl)
            self.opt_state = jax.device_put(jax.device_get(self.opt_state),
                                            repl)
        if self.halo:
            if (self.mesh is None or 'graph' not in self.mesh.axis_names
                    or self.mesh.shape['graph'] < 2):
                raise ValueError(
                    "halo training needs a mesh with a 'graph' axis of "
                    "size >= 2 (training: parallel: {data: D, graph: G})")
            cfg = getattr(self.main_loss, 'config', None)
            if cfg is None:
                raise ValueError(
                    'halo training needs a loss built by get_loss_by_string '
                    '(its .config drives the sharded loss algebra)')
            from newtonnet_tpu.parallel.halo import make_halo_grads_fn
            # validates keys/modes (energy/gradient_force/stress/virial,
            # mse) and the charge-head ewald_mode requirement
            self._halo_grads = make_halo_grads_fn(
                model, self.mesh, int(self.halo['n_halo']), loss_config=cfg)
            self._halo_eval = make_halo_grads_fn(
                model, self.mesh, int(self.halo['n_halo']), loss_config=cfg,
                with_grads=False)
            # the shard_map in_specs cover exactly the keys the loss reads;
            # extra batch keys (e.g. labels outside the config) are dropped.
            # The specs double as the multi-process global-array layout
            # (parallel/distributed.global_data_batch(specs=...)).
            from newtonnet_tpu.parallel.halo import halo_batch_specs
            self._halo_specs = halo_batch_specs(
                tensor_labels=[k for k in ('stress', 'virial') if k in cfg])
            self._halo_batch_keys = frozenset(self._halo_specs)
            self.fast_grad = False  # halo owns its gradient algebra
        self._train_step = self._build_train_step()
        self._eval_step = self._build_eval_step()
        self._train_scan = self._build_scan(self._train_step_body, train=True)
        self._eval_scan = self._build_scan(self._eval_step_body, train=False)
        self.print_layers()

    # ------------------------------------------------------------------ #
    @staticmethod
    def _peek_periodicity(generator):
        ''''periodic'/'aperiodic' when the first batch of a RE-ITERABLE
        generator (loader object, list -- not a one-shot iterator, which
        peeking would consume) is homogeneous in cell periodicity; None
        otherwise (mixed batch, empty, or unpeekable).'''
        import numpy as np
        if generator is None:
            return None
        try:
            it = iter(generator)
            if it is generator:      # one-shot: peeking would consume
                return None
            first = next(it)
        except (TypeError, StopIteration):
            return None
        if not isinstance(first, dict) or 'cell' not in first:
            return None
        cell = np.asarray(first['cell'])
        periodic = np.any(cell.reshape(cell.shape[0], -1) != 0, axis=1)
        gmask = np.asarray(first.get('graph_mask',
                                     np.ones(len(periodic), bool)))
        periodic = periodic[gmask.astype(bool)]
        if periodic.size == 0:
            return None
        if periodic.all():
            return 'periodic'
        if not periodic.any():
            return 'aperiodic'
        return None                  # genuinely mixed: keep runtime dispatch

    # ------------------------------------------------------------------ #
    def _shardings(self):
        '''(batch_sharding, replicated) NamedShardings when on a mesh.'''
        if self.mesh is None:
            return None, None
        from jax.sharding import NamedSharding, PartitionSpec as P
        batch_sh = NamedSharding(self.mesh, P('data'))
        repl = NamedSharding(self.mesh, P())
        return batch_sh, repl

    def _train_step_body(self, params, opt_state, totals, batch, lr=None):
        # `totals` accumulates per-epoch metric sums ON DEVICE -- the host
        # only fetches once per epoch (a per-step device_get would force a
        # sync round trip per step, which dominates on tunneled backends).
        # `lr` (traced scalar) is set into the opt state when a per-step
        # scheduler drives the run; None keeps the state's current lr.
        if self.halo is not None:
            batch = {k: v for k, v in batch.items()
                     if k in self._halo_batch_keys}
            grads, metrics = self._halo_grads(params, batch)
            if lr is not None:
                opt_state = with_learning_rate(opt_state, lr)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            totals = jax.tree.map(lambda t, m: t + m, totals, metrics)
            return params, opt_state, totals
        nl = self._batch_nlist(batch)
        if self.fast_grad:
            from newtonnet_tpu.train import fastgrad
            loss, grads, preds = fastgrad.value_and_grad(
                self.model, self.main_loss, params, batch, nlist=nl)
        else:
            def loss_fn(p):
                preds = self.model.apply(p, batch['z'], batch['pos'],
                                         batch['cell'], nlist=nl)
                return self.main_loss(preds, batch), preds
            (loss, preds), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
        if lr is not None:
            opt_state = with_learning_rate(opt_state, lr)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {'loss': loss, **self.eval_loss(preds, batch)}
        if self._edges_enabled:
            metrics['edges'] = self._count_edges(batch)
        totals = jax.tree.map(lambda t, m: t + m, totals, metrics)
        return params, opt_state, totals

    def _batch_nlist(self, batch):
        '''Precomputed neighbor lists riding the batch (data/prelists.py).

        Returns the nlist tuple the model expects, or None when the batch
        carries no lists (the model then builds its graph in-jit).
        '''
        if isinstance(batch, dict) and 'nlist_stair' in batch:
            # staircase chunk tuples (data/prelists.py mode='newton3c'):
            # already the model-facing payload, frames pre-permuted
            return batch['nlist_stair']
        if not isinstance(batch, dict) or 'nlist_idx' not in batch:
            return None
        import jax.numpy as jnp
        idx, mask = batch['nlist_idx'], batch['nlist_mask']
        if getattr(self.model, 'newton3', False):
            # half lists are not involutions: derive the K-major inverse
            # on device (one scatter-max -- cheap relative to a step)
            from newtonnet_tpu.ops.nlist import build_inverse_list
            inv, invm = build_inverse_list(jnp.swapaxes(idx, 1, 2),
                                           jnp.swapaxes(mask, 1, 2))
            return (idx, mask, inv, invm)
        if getattr(self.model, 'inverse_lists', False):
            # symmetric-slotted lists ARE their own inverse (involution):
            # the K-major transpose suffices, no per-step scatter-max
            return (idx, mask,
                    jnp.swapaxes(idx, 1, 2), jnp.swapaxes(mask, 1, 2))
        return (idx, mask)

    def _check_batch_nlist(self, batch):
        '''One-time (first batch) structural validation that precomputed
        lists match the model's list mode -- a mode mismatch (e.g. plain
        lists fed to a newton3/inverse_lists model) would otherwise train
        on silently wrong gradients (data/prelists.py documents the
        pairing).'''
        if not isinstance(batch, dict):
            return
        compact = getattr(self.model, 'newton3_compact', False)
        if compact != ('nlist_stair' in batch):
            raise ValueError(
                'newton3_compact models pair with staircase batches '
                "(data.precompute_nlist mode: 'newton3c') and vice versa; "
                f'model compact={compact}, batch '
                f'{"carries" if "nlist_stair" in batch else "lacks"} '
                'nlist_stair')
        if 'nlist_idx' not in batch:
            return
        import numpy as np
        idx = np.asarray(batch['nlist_idx'])
        mask = np.asarray(batch['nlist_mask'])
        b = 0
        if getattr(self.model, 'newton3', False):
            # a valid half list has NO reciprocal pair: i in row j and
            # j in row i simultaneously means a full/symmetric list
            n = idx.shape[1]
            rows = np.repeat(np.arange(n), idx.shape[2])[mask[b].ravel()]
            cols = idx[b].ravel()[mask[b].ravel()]
            fwd = set(zip(rows.tolist(), cols.tolist()))
            if any((j, i) in fwd for i, j in fwd):
                raise ValueError(
                    'newton3 model fed a full/symmetric neighbor list '
                    '(reciprocal edge found) -- set '
                    "data.precompute_nlist mode: 'newton3'")
        elif getattr(self.model, 'inverse_lists', False):
            # symmetric-slotted lists are per-slot involutions
            n = idx.shape[1]
            ii = np.where(mask[b], idx[b], np.arange(n)[:, None])
            if not (np.take_along_axis(ii, ii, axis=0)
                    == np.arange(n)[:, None]).all():
                raise ValueError(
                    'inverse_lists model fed lists that are not '
                    'symmetric-slotted (per-slot involution fails) -- set '
                    "data.precompute_nlist mode: 'inverse'")

    @property
    def _edges_enabled(self):
        return hasattr(self.model, 'cutoff') and self.halo is None

    def _count_edges(self, batch):
        '''On-device edge counter for throughput logging (one cheap O(N^2)
        distance pass, no feature dimension; skipped above 2048 atoms where
        the pair tensor would rival the model's own memory).'''
        if batch['z'].shape[-1] > 2048:
            return jax.numpy.zeros((), jax.numpy.float32)
        from newtonnet_tpu.ops.neighbors import dense_graph
        _, adj = dense_graph(batch['pos'], batch['cell'], batch['z'] > 0,
                             self.model.cutoff)
        return jax.numpy.sum(adj).astype(jax.numpy.float32)

    def _check_halo_batch(self, batch, n=1):
        '''Per-batch halo-capacity validation (EVERY batch, every epoch):
        every atom within the cutoff of a slab boundary must lie inside
        the adjacent n_halo block, and the padded atom count must split
        evenly across the graph shards (parallel/halo.py
        check_halo_capacity). Frames differ per batch, so a one-time check
        would let a violating frame deeper in the epoch train on silently
        wrong forces -- the check runs host-side on the already-host numpy
        batch in the feed loop (the same integrity role the MD driver's
        list-quality counters play, md/driver.py), mirroring the exact
        edge set the reference's per-forward dynamic graph gives for free
        (reference newtonnet/layers/representations.py:96-98).'''
        import numpy as np
        from newtonnet_tpu.parallel.halo import check_halo_capacity
        n_shards = self.mesh.shape['graph']
        z = np.asarray(batch['z'])
        if z.shape[1] % n_shards:
            raise ValueError(
                f"halo training: padded atom count {z.shape[1]} is not "
                f"divisible by the graph axis ({n_shards}); set data: "
                f"n_pad to a multiple")
        bad = check_halo_capacity(
            z, np.asarray(batch['pos']), np.asarray(batch['cell']),
            n_shards=n_shards, n_halo=int(self.halo['n_halo']),
            cutoff=self.model.cutoff)
        if bad:
            raise ValueError(
                f'halo training: {bad} capacity violations in batch {n} '
                f'-- frames must be spatially sorted (data: '
                f'spatial_sort: true) and n_halo large enough for every '
                f'boundary atom (got {self.halo["n_halo"]})')

    def _eval_step_body(self, params, totals, batch):
        # Eval epochs run at eval_matmul_precision (default 'highest'):
        # on TPU the default matmul precision is bf16, whose eval noise
        # floors force metrics around 0.1 eV/A on MD17-class models
        # (RESULTS.md section 10) -- bad metrics would then drive
        # best-model selection and the plateau scheduler. Eval is
        # forward-only (a small fraction of epoch time), so accurate
        # metrics are nearly free; TRAINING steps are untouched (the
        # benchmarked configuration trains at default precision). The
        # context manager is trace-time, so it composes with jit/scan.
        import contextlib
        prec = (jax.default_matmul_precision(self.eval_matmul_precision)
                if self.eval_matmul_precision else contextlib.nullcontext())
        with prec:
            if self.halo is not None:
                batch = {k: v for k, v in batch.items()
                         if k in self._halo_batch_keys}
                metrics = self._halo_eval(params, batch)
                return jax.tree.map(lambda t, m: t + m, totals, metrics)
            preds = self.model.apply(params, batch['z'], batch['pos'],
                                     batch['cell'],
                                     nlist=self._batch_nlist(batch))
            metrics = {'loss': self.main_loss(preds, batch),
                       **self.eval_loss(preds, batch)}
        return jax.tree.map(lambda t, m: t + m, totals, metrics)

    def _build_scan(self, body, train):
        '''Jit a lax.scan running `steps_per_call` batches per dispatch.

        On a mesh, the stacked batches are sharded over the data axis
        (scan axis unsharded) and the carried state is replicated, so the
        chunked dispatch path works under data parallelism too.
        '''
        _, repl = self._shardings()

        def stacked_sharding(stacked):
            from jax.sharding import NamedSharding, PartitionSpec as P
            return jax.tree.map(
                lambda _: NamedSharding(self.mesh, P(None, 'data')), stacked)

        if train:
            if self._per_step_sched:
                def scan_fn(params, opt_state, totals, stacked, lrs):
                    def step(carry, x):
                        batch, lr = x
                        params, opt_state, totals = carry
                        return self._train_step_body(
                            params, opt_state, totals, batch, lr), None
                    (params, opt_state, totals), _ = jax.lax.scan(
                        step, (params, opt_state, totals), (stacked, lrs))
                    return params, opt_state, totals
            else:
                def scan_fn(params, opt_state, totals, stacked):
                    def step(carry, batch):
                        params, opt_state, totals = carry
                        return self._train_step_body(params, opt_state,
                                                     totals, batch), None
                    (params, opt_state, totals), _ = jax.lax.scan(
                        step, (params, opt_state, totals), stacked)
                    return params, opt_state, totals
            if self.mesh is None or self.halo is not None:
                # halo mode: the shard_map inside _halo_grads carries its
                # own in/out specs and reshards the (replicated) batch
                return jax.jit(scan_fn, donate_argnums=(0, 1, 2))

            jitted = {}  # memoized so the jit cache persists across calls

            def sharded(params, opt_state, totals, stacked, *rest):
                if 'fn' not in jitted:
                    in_sh = (repl, repl, repl, stacked_sharding(stacked)) + \
                        tuple(repl for _ in rest)
                    jitted['fn'] = jax.jit(
                        scan_fn, donate_argnums=(0, 1, 2), in_shardings=in_sh,
                        out_shardings=(repl, repl, repl))
                return jitted['fn'](params, opt_state, totals, stacked, *rest)
            return sharded

        def scan_fn(params, totals, stacked):
            def step(totals, batch):
                return self._eval_step_body(params, totals, batch), None
            totals, _ = jax.lax.scan(step, totals, stacked)
            return totals
        if self.mesh is None or self.halo is not None:
            return jax.jit(scan_fn, donate_argnums=(1,))

        jitted = {}

        def sharded_eval(params, totals, stacked):
            if 'fn' not in jitted:
                jitted['fn'] = jax.jit(
                    scan_fn, donate_argnums=(1,),
                    in_shardings=(repl, repl, stacked_sharding(stacked)),
                    out_shardings=repl)
            return jitted['fn'](params, totals, stacked)
        return sharded_eval

    def _build_train_step(self):
        if self._per_step_sched:
            def train_step(params, opt_state, totals, batch, lr):
                return self._train_step_body(params, opt_state, totals,
                                             batch, lr)
            n_extra = 1
        else:
            train_step = self._train_step_body
            n_extra = 0

        batch_sh, repl = self._shardings()
        if self.mesh is not None and self.halo is None:
            # DP: data sharded, state replicated; XLA inserts the grad psum.
            # in_shardings are derived from the first REAL batch (not a
            # fixed key template) so extra batch keys -- precomputed
            # neighbor lists, bucketed metadata -- shard along too.
            jitted = {}

            def sharded(params, opt_state, totals, batch, *rest):
                if 'fn' not in jitted:
                    in_sh = (repl, repl, repl,
                             jax.tree.map(lambda _: batch_sh, batch)) + \
                        tuple(repl for _ in rest)
                    jitted['fn'] = jax.jit(
                        train_step, donate_argnums=(0, 1, 2),
                        in_shardings=in_sh,
                        out_shardings=(repl, repl, repl))
                return jitted['fn'](params, opt_state, totals, batch, *rest)
            return sharded
        return jax.jit(train_step, donate_argnums=(0, 1, 2))

    def _build_eval_step(self):
        eval_step = self._eval_step_body

        batch_sh, repl = self._shardings()
        if self.mesh is not None and self.halo is None:
            jitted = {}

            def sharded(params, totals, batch):
                if 'fn' not in jitted:
                    jitted['fn'] = jax.jit(
                        eval_step, donate_argnums=(1,),
                        in_shardings=(repl, repl,
                                      jax.tree.map(lambda _: batch_sh,
                                                   batch)),
                        out_shardings=repl)
                return jitted['fn'](params, totals, batch)
            return sharded
        return jax.jit(eval_step, donate_argnums=(1,))

    # ------------------------------------------------------------------ #
    def make_subdirs(self, output_base_path, script_path, settings_path):
        '''training_{n} dir + run_scripts + models (ref trainer.py:99-126).'''
        path_iter = 1
        output_path = os.path.join(output_base_path, f'training_{path_iter}')
        while os.path.exists(output_path):
            path_iter += 1
            output_path = os.path.join(output_base_path,
                                       f'training_{path_iter}')
        os.makedirs(output_path)
        self.output_path = output_path
        print(f'Output directory: {output_path}')

        script_out = os.path.join(self.output_path, 'run_scripts')
        os.makedirs(script_out)
        for src in (script_path, settings_path):
            if src is not None and os.path.exists(src):
                shutil.copyfile(
                    src, os.path.join(script_out, os.path.basename(src)))

        self.model_path = os.path.join(self.output_path, 'models')
        os.makedirs(self.model_path)

    def resume(self, checkpoint_dir):
        '''Restore from a previous training_{n} dir (ref trainer.py:128-149).

        Multi-process: the checkpoint dir must be readable by every process
        (shared filesystem, the standard pod setup); the chief copies the
        artifacts into the new run dir, the others load in place.
        '''
        if self.output_path is not None:
            for name in ('models/train_state.msgpack',
                         'models/best_model.msgpack', 'log.csv'):
                src = os.path.join(checkpoint_dir, name)
                if os.path.exists(src):
                    dst = os.path.join(self.output_path, name)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    shutil.copyfile(src, dst)
            state_dir = self.output_path
        else:
            state_dir = checkpoint_dir
        meta, params, opt_state = ckpt.load_train_state(
            os.path.join(state_dir, 'models', 'train_state.msgpack'),
            params_template=self.params,
            opt_state_template=self.opt_state)
        self.start_epoch = meta['epoch'] + 1
        self.start_step = meta['step']
        self.best_val_loss = meta['best_val_loss']
        self.params = params
        self.opt_state = opt_state
        if self.lr_scheduler is not None and meta.get('scheduler_state'):
            self.lr_scheduler.load_state_dict(meta['scheduler_state'])
            self.opt_state = set_learning_rate(self.opt_state,
                                               self.lr_scheduler.lr)
        if meta.get('loader_rng_state') and self.train_generator is not None:
            self.train_generator._rng.bit_generator.state = \
                meta['loader_rng_state']
        if self._multiproc:
            # re-enter the global mesh as replicated arrays (see __init__)
            _, repl = self._shardings()
            self.params = jax.device_put(jax.device_get(self.params), repl)
            self.opt_state = jax.device_put(jax.device_get(self.opt_state),
                                            repl)
        if self.output_path is not None:
            log_path = os.path.join(self.output_path, 'log.csv')
            if os.path.exists(log_path):
                import csv
                with open(log_path) as f:
                    self.log_rows = list(csv.DictReader(f))

    def print_layers(self):
        n = sum(x.size for x in jax.tree.leaves(self.params))
        print('Model:')
        print(f'  NewtonNet({self.model.config_dict()})')
        print(f'total trainable parameters: {n}')
        print()

    # ------------------------------------------------------------------ #
    def local_log(self, log):
        '''Append a row and rewrite log.csv (ref trainer.py:182-185).'''
        self.log_rows.append({k: str(v) for k, v in log.items()})
        cols = []
        for row in self.log_rows:
            for k in row:
                if k not in cols:
                    cols.append(k)
        import csv
        with open(os.path.join(self.output_path, 'log.csv'), 'w',
                  newline='') as f:
            w = csv.DictWriter(f, fieldnames=cols)
            w.writeheader()
            for row in self.log_rows:
                w.writerow(row)

    def _save_checkpoint(self, epoch, step):
        sched_state = (self.lr_scheduler.state_dict()
                       if self.lr_scheduler is not None else None)
        rng_state = (self.train_generator._rng.bit_generator.state
                     if self.train_generator is not None else None)
        ckpt.save_train_state(
            os.path.join(self.model_path, 'train_state.msgpack'),
            epoch=epoch, step=step, params=self.params,
            opt_state=self.opt_state, scheduler_state=sched_state,
            best_val_loss=self.best_val_loss, loader_rng_state=rng_state)

    # ------------------------------------------------------------------ #
    def train(self):
        '''Main loop (ref trainer.py:187-296).'''
        step = self.start_step
        stop = False
        import time as _time
        for epoch in tqdm(range(self.start_epoch, self.epochs)):
            log_one_epoch = {'epoch': epoch,
                             'lr': get_learning_rate(self.opt_state)}

            t_epoch = _time.perf_counter()
            profiling = (self.profile_dir is not None
                         and epoch == self.start_epoch + 1)
            if profiling:
                # second epoch: past compilation, representative steady state
                jax.profiler.start_trace(self.profile_dir)
            train_log = self.run_one_epoch(self.train_generator, step=True)
            if profiling:
                jax.profiler.stop_trace()
                print(f'profiler trace written to {self.profile_dir}')
            epoch_seconds = _time.perf_counter() - t_epoch
            step += len(self.train_generator)
            log_one_epoch['step'] = step
            n_batches = len(self.train_generator)
            edges_mean = train_log.pop('edges', None)
            log_one_epoch |= {f'train_{k}': v for k, v in train_log.items()}
            # observability: wall time + throughput (SURVEY.md section 5)
            log_one_epoch['epoch_seconds'] = round(epoch_seconds, 4)
            log_one_epoch['steps_per_s'] = round(
                n_batches / max(epoch_seconds, 1e-9), 3)
            if edges_mean:
                # edges/s: the BASELINE.json per-chip throughput metric
                log_one_epoch['edges_per_s'] = round(
                    edges_mean * n_batches / max(epoch_seconds, 1e-9), 1)

            if epoch % self.check_val == 0 and self.val_generator is not None:
                val_log = self.run_one_epoch(self.val_generator, step=False)
                log_one_epoch |= {f'val_{k}': v for k, v in val_log.items()}

            if epoch % self.check_test == 0 and self.test_generator is not None:
                test_log = self.run_one_epoch(self.test_generator, step=False)
                log_one_epoch |= {f'test_{k}': v for k, v in test_log.items()}

            if epoch % self.check_log == 0 and (self.model_path is not None
                                                or self._multiproc):
                val_loss = log_one_epoch.get('val_loss', float('inf'))
                if val_loss < self.best_val_loss:
                    self.best_val_loss = val_loss
                    if self._multiproc:
                        # every process stashes the best params in memory
                        # (a COPY: the live ones are donated next step) so
                        # the final re-eval runs without a shared FS
                        self._best_params = jax.tree.map(jax.numpy.copy,
                                                         self.params)
                    if self.model_path is not None:
                        ckpt.save_model(
                            os.path.join(self.model_path,
                                         'best_model.msgpack'),
                            self.model, self.params)
                    log_one_epoch['best_model'] = True
                if self.model_path is not None:
                    ckpt.save_model(
                        os.path.join(self.model_path, 'last_model.msgpack'),
                        self.model, self.params)

            if self.output_path is not None:
                self.local_log(log_one_epoch)
            if self.log_wandb and self._is_chief:
                import wandb
                wandb.log(log_one_epoch)

            # epoch-level LR schedule (ref trainer.py:231-236); per-step
            # schedulers (OneCycleLR) already advanced inside run_one_epoch
            if self.lr_scheduler is not None and not self._per_step_sched:
                if self.lr_scheduler.needs_metric:
                    if 'val_loss' in log_one_epoch:
                        self.lr_scheduler.step(log_one_epoch['val_loss'])
                else:
                    self.lr_scheduler.step()
                self.opt_state = set_learning_rate(self.opt_state,
                                                   self.lr_scheduler.lr)

            if epoch % self.check_log == 0 and self.model_path is not None:
                self._save_checkpoint(epoch, step)
                if (self.lr_scheduler is not None
                        and self.lr_scheduler.should_stop):
                    stop = True
            if stop:
                break

        print('Training finished')
        if self._multiproc:
            # final re-eval from in-memory params: the eval epochs are
            # collectives over the global mesh, so EVERY process must run
            # them (a chief-only disk path would deadlock the others);
            # only the chief has a model_path/log to write
            if self.model_path is not None:
                ckpt.save_model(
                    os.path.join(self.model_path, 'last_model.msgpack'),
                    self.model, self.params)
            finals = [('last', self.params)]
            if self._best_params is not None:
                finals.append(('best', self._best_params))
                if self.model_path is not None:
                    ckpt.save_model(
                        os.path.join(self.model_path, 'best_model.msgpack'),
                        self.model, self._best_params)
            for tag, params in finals:
                log_one_epoch = {'epoch': tag}
                saved, self.params = self.params, params
                for name, gen in (('train', self.train_generator),
                                  ('val', self.val_generator),
                                  ('test', self.test_generator)):
                    if gen is not None:
                        log = self.run_one_epoch(gen, step=False)
                        log_one_epoch |= {f'{name}_{k}': v
                                          for k, v in log.items()}
                self.params = saved
                if self.output_path is not None:
                    self.local_log(log_one_epoch)
                if self.log_wandb and self._is_chief:
                    import wandb
                    wandb.log(log_one_epoch)
            return
        if self.model_path is None:
            return

        # final re-eval of last and best models (ref trainer.py:259-296)
        ckpt.save_model(os.path.join(self.model_path, 'last_model.msgpack'),
                        self.model, self.params)
        for tag in ('last', 'best'):
            path = os.path.join(self.model_path, f'{tag}_model.msgpack')
            if not os.path.exists(path):
                continue
            _, params = ckpt.load_model(path)
            log_one_epoch = {'epoch': tag}
            saved = self.params
            self.params = params
            for name, gen in (('train', self.train_generator),
                              ('val', self.val_generator),
                              ('test', self.test_generator)):
                if gen is not None:
                    log = self.run_one_epoch(gen, step=False)
                    log_one_epoch |= {f'{name}_{k}': v for k, v in log.items()}
            self.params = saved
            if self.output_path is not None:
                self.local_log(log_one_epoch)
            if self.log_wandb:
                import wandb
                wandb.log(log_one_epoch)

    def run_one_epoch(self, generator, step=False):
        '''One pass over a loader; average metrics per batch
        (ref trainer.py:299-318).'''
        import numpy as np

        metric_names = ['loss'] + self._eval_metric_names()
        if step and self._edges_enabled:
            metric_names = metric_names + ['edges']
        totals = {k: jax.numpy.zeros((), jax.numpy.float32)
                  for k in metric_names}
        if self._multiproc:
            # enter the multi-process jit as global replicated arrays
            totals = jax.device_put(jax.device_get(totals),
                                    self._shardings()[1])
        n = 0
        spc = self.steps_per_call
        pending = []
        per_step_lr = step and self._per_step_sched

        def next_lr():
            # torch semantics: the lr in effect for optimizer step k is the
            # scheduler's value *before* its k-th post-step advance
            lr = self.lr_scheduler.lr
            self.lr_scheduler.step()
            return np.float32(lr)

        def run_single(batch):
            nonlocal totals
            if self._multiproc:
                from newtonnet_tpu.parallel.distributed import \
                    global_data_batch
                batch = global_data_batch(
                    self.mesh, batch,
                    specs=self._halo_specs if self.halo else None)
            if step:
                if per_step_lr:
                    self.params, self.opt_state, totals = self._train_step(
                        self.params, self.opt_state, totals, batch, next_lr())
                else:
                    self.params, self.opt_state, totals = self._train_step(
                        self.params, self.opt_state, totals, batch)
            else:
                totals = self._eval_step(self.params, totals, batch)

        def run_chunk():
            # full chunks go through one scan dispatch; short chunks (tail,
            # or a bucket-shape change) run per step -- padding them into a
            # scan would take extra optimizer steps on zero grads, and
            # variable chunk lengths would recompile
            nonlocal totals
            if len(pending) == spc:
                # tree-map (not a per-key dict comprehension): batch values
                # may be nested pytrees (staircase chunk tuples)
                stacked = jax.tree.map(lambda *xs: np.stack(xs), *pending)
                if self._multiproc:
                    from newtonnet_tpu.parallel.distributed import \
                        global_data_batch
                    stacked = global_data_batch(
                        self.mesh, stacked, stacked=True,
                        specs=self._halo_specs if self.halo else None)
                if step:
                    if per_step_lr:
                        lrs = np.asarray([next_lr() for _ in pending],
                                         np.float32)
                        (self.params, self.opt_state,
                         totals) = self._train_scan(
                            self.params, self.opt_state, totals, stacked,
                            lrs)
                    else:
                        (self.params, self.opt_state,
                         totals) = self._train_scan(
                            self.params, self.opt_state, totals, stacked)
                else:
                    totals = self._eval_scan(self.params, totals, stacked)
            else:
                for b in pending:
                    run_single(b)
            pending.clear()

        for batch in generator:
            n += 1
            if n == 1:
                self._check_batch_nlist(batch)
            if self.halo is not None:
                # EVERY batch: halo capacity depends on the frames, not
                # just the shapes (VERDICT r4 weak #2)
                self._check_halo_batch(batch, n)
            if spc > 1:
                # chunks must be shape-homogeneous (BucketedLoader emits
                # different paddings): flush on shape change
                if pending and batch['z'].shape != pending[0]['z'].shape:
                    run_chunk()
                pending.append(batch)
                if len(pending) == spc:
                    run_chunk()
                continue
            run_single(batch)
        run_chunk()
        totals = jax.device_get(totals)
        return {k: float(v) / max(n, 1) for k, v in totals.items()}

    def _eval_metric_names(self):
        if not hasattr(self, '_metric_names_cache'):
            zero = {'energy': jax.numpy.zeros(1),
                    'gradient_force': jax.numpy.zeros((1, 1, 3)),
                    'direct_force': jax.numpy.zeros((1, 1, 3)),
                    'stress': jax.numpy.zeros((1, 3, 3)),
                    'virial': jax.numpy.zeros((1, 3, 3))}
            fake_batch = {'z': jax.numpy.ones((1, 1), jax.numpy.int32),
                          'energy': jax.numpy.zeros(1),
                          'force': jax.numpy.zeros((1, 1, 3)),
                          'stress': jax.numpy.zeros((1, 3, 3)),
                          'virial': jax.numpy.zeros((1, 3, 3)),
                          'graph_mask': jax.numpy.ones(1, bool)}
            self._metric_names_cache = sorted(
                jax.eval_shape(self.eval_loss, zero, fake_batch).keys())
        return self._metric_names_cache
