'''Optimizer and LR-scheduler factories (reference: newtonnet/train/optimizer.py).

Optimizers are optax transformations with torch-default hyperparameters;
the learning rate is injected via optax.inject_hyperparams so the
epoch-level schedulers below (plain Python state machines, mirroring
torch.optim.lr_scheduler semantics) can set it between epochs without
recompilation. `clip_grad` is prepended as optax.clip_by_global_norm
(ref trainer.py:311-312).

Freeze masks implement the reference's pretrained-model freeze flags
(scripts/newtonnet_train.py:66-81) as optax.masked zeroing.
'''
import math

import optax


def get_optimizer_by_string(optimizer_name, clip_grad=0.0, freeze=None,
                            **kwargs):
    '''Build the optax chain. Returns an inject_hyperparams-wrapped
    GradientTransformation whose opt_state.hyperparams['learning_rate'] is
    mutable between steps.

    Args:
        optimizer_name: adam | sgd | rmsprop | adamw (ref optimizer.py:25-35).
        clip_grad: global-norm clip (0 disables; ref trainer.py:311).
        freeze: optional pytree-prefix predicate fn(path) -> bool (True =
            frozen); applied as a zeroing mask.
        kwargs: optimizer hyperparameters (lr, weight_decay, ...).
    '''
    lr = kwargs.pop('lr', 1e-3)

    def make(learning_rate):
        if optimizer_name == 'adam':
            tx = optax.adam(learning_rate, eps=1e-8, **kwargs)
        elif optimizer_name == 'sgd':
            tx = optax.sgd(learning_rate, **kwargs)
        elif optimizer_name == 'rmsprop':
            tx = optax.rmsprop(learning_rate, eps=1e-8, **kwargs)
        elif optimizer_name == 'adamw':
            tx = optax.adamw(learning_rate, eps=1e-8, **kwargs)
        else:
            raise ValueError(f'optimizer {optimizer_name} is not supported')
        parts = []
        if clip_grad and clip_grad > 0:
            parts.append(optax.clip_by_global_norm(clip_grad))
        parts.append(tx)
        return optax.chain(*parts)

    tx = optax.inject_hyperparams(make)(learning_rate=lr)
    if freeze is not None:
        tx = optax.chain(optax.masked(optax.set_to_zero(), freeze), tx)
    return tx


class _SchedulerBase:
    '''Epoch-level scheduler: call step(metric) after each epoch; read .lr.'''

    def __init__(self, lr):
        self.lr = lr

    def step(self, metric=None):
        raise NotImplementedError

    def state_dict(self):
        return dict(self.__dict__)

    def load_state_dict(self, state):
        self.__dict__.update(state)

    @property
    def needs_metric(self):
        return False

    @property
    def per_step(self):
        '''True if step() advances per optimizer step (torch OneCycleLR
        semantics) rather than per epoch.'''
        return False

    @property
    def should_stop(self):
        return False


class ReduceLROnPlateau(_SchedulerBase):
    '''torch ReduceLROnPlateau semantics (factor, patience, min_lr,
    rel-threshold 1e-4), stepped on the validation loss
    (ref trainer.py:232-234); `should_stop` reproduces the reference's
    lr <= min_lr early-stop (ref trainer.py:253-255).'''

    def __init__(self, lr, factor=0.1, patience=10, min_lr=0.0,
                 threshold=1e-4, cooldown=0):
        super().__init__(lr)
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.threshold = threshold
        self.cooldown = cooldown
        self.best = math.inf
        self.num_bad = 0
        self.cooldown_counter = 0

    @property
    def needs_metric(self):
        return True

    def step(self, metric=None):
        if metric is None:
            return self.lr
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad = 0
        elif self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.cooldown_counter = self.cooldown
                self.num_bad = 0
        return self.lr

    @property
    def should_stop(self):
        return self.lr <= self.min_lr


class LambdaLR(_SchedulerBase):
    def __init__(self, lr, lr_lambda):
        super().__init__(lr)
        self.base_lr = lr
        self.lr_lambda = lr_lambda if callable(lr_lambda) else eval(lr_lambda)  # noqa: S307 (config-provided lambda, as in torch LambdaLR usage)
        self.epoch = 0

    def step(self, metric=None):
        self.epoch += 1
        self.lr = self.base_lr * self.lr_lambda(self.epoch)
        return self.lr

    def state_dict(self):
        d = dict(self.__dict__)
        d.pop('lr_lambda')
        return d


class LinearLR(_SchedulerBase):
    def __init__(self, lr, start_factor=1.0 / 3, end_factor=1.0,
                 total_iters=5):
        super().__init__(lr * start_factor)
        self.base_lr = lr
        self.start_factor = start_factor
        self.end_factor = end_factor
        self.total_iters = total_iters
        self.epoch = 0

    def step(self, metric=None):
        self.epoch += 1
        t = min(self.epoch, self.total_iters) / self.total_iters
        factor = self.start_factor + (self.end_factor - self.start_factor) * t
        self.lr = self.base_lr * factor
        return self.lr


class CosineAnnealingLR(_SchedulerBase):
    def __init__(self, lr, T_max, eta_min=0.0):
        super().__init__(lr)
        self.base_lr = lr
        self.T_max = T_max
        self.eta_min = eta_min
        self.epoch = 0

    def step(self, metric=None):
        self.epoch += 1
        self.lr = self.eta_min + 0.5 * (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.epoch / self.T_max))
        return self.lr


class OneCycleLR(_SchedulerBase):
    '''torch OneCycleLR (anneal_strategy='cos', three_phase=False), stepped
    per *optimizer step* like torch (the Trainer detects `per_step` and
    advances this inside the batch loop instead of per epoch; ref
    optimizer.py:58-61 passes torch's class through, which is per-step).

    lr at step s (s = number of .step() calls since construction; torch
    calls step() once in its constructor, so lr starts at initial_lr):
      phase 1 (s <= pct_start*total_steps - 1): cos-anneal initial->max
      phase 2 (otherwise):                      cos-anneal max->min
    '''

    def __init__(self, lr, max_lr, total_steps, pct_start=0.3,
                 div_factor=25.0, final_div_factor=1e4):
        self.max_lr = max_lr
        self.total_steps = total_steps
        self.pct_start = pct_start
        self.initial_lr = max_lr / div_factor
        self.min_lr = self.initial_lr / final_div_factor
        self.last_step = 0
        super().__init__(self.lr_at(0))

    @property
    def per_step(self):
        return True

    @staticmethod
    def _anneal_cos(start, end, pct):
        # torch _annealing_cos: cosine interpolation from start to end
        return end + (start - end) / 2.0 * (1 + math.cos(math.pi * pct))

    def lr_at(self, step_num):
        '''Closed-form lr after `step_num` scheduler steps (torch-exact).'''
        phase1_end = self.pct_start * self.total_steps - 1
        phase2_end = self.total_steps - 1
        step_num = min(step_num, phase2_end)
        if step_num <= phase1_end and phase1_end > 0:
            pct = step_num / phase1_end
            return self._anneal_cos(self.initial_lr, self.max_lr, pct)
        denom = phase2_end - phase1_end
        pct = (step_num - phase1_end) / denom if denom > 0 else 1.0
        return self._anneal_cos(self.max_lr, self.min_lr, pct)

    def step(self, metric=None):
        self.last_step += 1
        self.lr = self.lr_at(self.last_step)
        return self.lr


class ChainedScheduler(_SchedulerBase):
    def __init__(self, schedulers):
        self.schedulers = schedulers
        super().__init__(schedulers[-1].lr)

    @property
    def needs_metric(self):
        return any(s.needs_metric for s in self.schedulers)

    @property
    def per_step(self):
        # torch ChainedScheduler steps all children together; a chain
        # containing a per-step member is stepped at batch granularity
        return any(s.per_step for s in self.schedulers)

    def step(self, metric=None):
        for s in self.schedulers:
            s.step(metric if s.needs_metric else None)
        self.lr = self.schedulers[-1].lr
        return self.lr

    @property
    def should_stop(self):
        return any(s.should_stop for s in self.schedulers)

    def state_dict(self):
        return {'schedulers': [s.state_dict() for s in self.schedulers],
                'lr': self.lr}

    def load_state_dict(self, state):
        for s, sd in zip(self.schedulers, state['schedulers']):
            s.load_state_dict(sd)
        self.lr = state['lr']


def get_scheduler_by_string(scheduler_list, lr):
    '''Build the (possibly chained) scheduler (ref optimizer.py:38-74).

    scheduler_list: iterable of (name, kwargs) pairs, e.g. the items() of
    the YAML `lr_scheduler` section.
    '''
    if scheduler_list is None:
        return None
    registry = {
        'plateau': ReduceLROnPlateau,
        'lambda': LambdaLR,
        'linear': LinearLR,
        'cosine': CosineAnnealingLR,
        'onecycle': OneCycleLR,
    }
    schedulers = []
    for name, kwargs in scheduler_list:
        if name not in registry:
            raise ValueError(f'scheduler {name} is not supported')
        schedulers.append(registry[name](lr, **(kwargs or {})))
    if len(schedulers) == 1:
        return schedulers[0]
    return ChainedScheduler(schedulers)
