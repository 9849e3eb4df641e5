"""Optimizers and LR schedules (optax).

Behavioral spec: reference train_model.py:392-473 (adam/adamw/sgd/
sgd_nomomentum with lr 1e-4, wd 0) and models/custom_optims.py
(CosineAnnealingWarmRestartsDecay). Schedules are driven from Python (like
torch's schedulers) via optax.inject_hyperparams, because ReduceLROnPlateau
depends on the observed validation loss.
"""
from __future__ import annotations

import math
from typing import Optional

import optax


def make_optimizer(name: str, lr: float, weight_decay: float = 0.0,
                   flatten: bool = True):
    """Reference optimizer selection (train_model.py:429-451).

    flatten=True wraps the transform in optax.flatten: the update runs on one
    concatenated parameter vector instead of ~150 small leaves. On TPU this
    removes per-fusion launch overhead that otherwise dominates the step
    (measured: 5.1ms -> sub-ms full train step for the 764K-param flagship).
    """
    name = name.lower()
    if name == "adamw":
        tx = optax.inject_hyperparams(optax.adamw)(
            learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8,
            weight_decay=weight_decay)
    elif name == "adam":
        # torch Adam applies weight decay as L2 into the gradient
        if weight_decay:
            def adam_l2(learning_rate):
                return optax.chain(optax.add_decayed_weights(weight_decay),
                                   optax.adam(learning_rate, b1=0.9, b2=0.999,
                                              eps=1e-8))
            tx = optax.inject_hyperparams(adam_l2)(learning_rate=lr)
        else:
            tx = optax.inject_hyperparams(optax.adam)(
                learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)
    elif name == "sgd":
        tx = optax.inject_hyperparams(optax.sgd)(
            learning_rate=lr, momentum=0.9, nesterov=True)
    elif name == "sgd_nomomentum":
        tx = optax.inject_hyperparams(optax.sgd)(learning_rate=lr)
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    if flatten:
        tx = optax.flatten(tx)
    return tx


def set_learning_rate(opt_state, lr: float) -> bool:
    """Update the injected learning rate in-place, walking nested optimizer
    states (chains, MultiSteps). Returns True if a hyperparams slot was found."""
    import jax.numpy as jnp

    found = False
    stack = [opt_state]
    while stack:
        s = stack.pop()
        hp = getattr(s, "hyperparams", None)
        if isinstance(hp, dict) and "learning_rate" in hp:
            hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
            found = True
            continue
        if isinstance(s, (tuple, list)):
            stack.extend(s)
        elif hasattr(s, "inner_opt_state"):
            stack.append(s.inner_opt_state)
        elif hasattr(s, "inner_state"):
            stack.append(s.inner_state)
    return found


class Scheduler:
    """Base: step(epoch_progress=None, metric=None) -> lr."""

    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.lr = base_lr

    def step(self, epoch: Optional[float] = None, metric: Optional[float] = None) -> float:
        return self.lr


class ReduceLROnPlateau(Scheduler):
    """torch semantics: factor/patience on min metric
    (reference train_model.py:456-458: factor 0.8, patience 50)."""

    def __init__(self, base_lr, factor=0.8, patience=50, min_lr=0.0):
        super().__init__(base_lr)
        self.factor = factor
        self.patience = patience
        self.min_lr = min_lr
        self.best = math.inf
        self.num_bad = 0

    def step(self, epoch=None, metric=None):
        if metric is None:
            return self.lr
        if metric < self.best:
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
            if self.num_bad > self.patience:
                self.lr = max(self.lr * self.factor, self.min_lr)
                self.num_bad = 0
        return self.lr


class CosineAnnealing(Scheduler):
    """CosineAnnealingLR(T_max, eta_min) (train_model.py:460-461)."""

    def __init__(self, base_lr, T_max=10, eta_min=0.0):
        super().__init__(base_lr)
        self.T_max = T_max
        self.eta_min = eta_min

    def step(self, epoch=None, metric=None):
        if epoch is None:
            return self.lr
        self.lr = self.eta_min + (self.base_lr - self.eta_min) * \
            (1 + math.cos(math.pi * epoch / self.T_max)) / 2
        return self.lr


class CosineAnnealingWarmRestarts(Scheduler):
    """torch CosineAnnealingWarmRestarts(T_0, T_mult) with fractional-epoch
    stepping (train_model.py:463-464)."""

    def __init__(self, base_lr, T_0=10, T_mult=1, eta_min=0.0):
        super().__init__(base_lr)
        self.T_0 = T_0
        self.T_mult = T_mult
        self.eta_min = eta_min

    def _cycle_pos(self, epoch: float):
        if self.T_mult == 1:
            t_cur = epoch % self.T_0
            t_i = self.T_0
            n = int(epoch // self.T_0)
        else:
            n = int(math.log(epoch / self.T_0 * (self.T_mult - 1) + 1, self.T_mult)) \
                if epoch >= self.T_0 else 0
            t_start = self.T_0 * (self.T_mult ** n - 1) / (self.T_mult - 1)
            t_i = self.T_0 * self.T_mult ** n
            t_cur = epoch - t_start
        return t_cur, t_i, n

    def step(self, epoch=None, metric=None):
        if epoch is None:
            return self.lr
        t_cur, t_i, _ = self._cycle_pos(max(epoch, 0.0))
        self.lr = self.eta_min + (self.base_lr - self.eta_min) * \
            (1 + math.cos(math.pi * t_cur / t_i)) / 2
        return self.lr


class CosineAnnealingWarmRestartsDecay(CosineAnnealingWarmRestarts):
    """Warm restarts with per-cycle base-LR decay
    (reference models/custom_optims.py:7-39)."""

    def __init__(self, base_lr, T_0=10, T_mult=1, eta_min=0.0, decay_rate=0.95):
        super().__init__(base_lr, T_0, T_mult, eta_min)
        self.decay_rate = decay_rate
        self.initial_lr = base_lr

    def step(self, epoch=None, metric=None):
        if epoch is None:
            return self.lr
        _, _, n_cycles = self._cycle_pos(max(epoch, 0.0))
        self.base_lr = self.initial_lr * (self.decay_rate ** n_cycles)
        return super().step(epoch, metric)


class ExponentialLR(Scheduler):
    """gamma decay per epoch (train_model.py:470-471: gamma 0.95)."""

    def __init__(self, base_lr, gamma=0.95):
        super().__init__(base_lr)
        self.gamma = gamma

    def step(self, epoch=None, metric=None):
        if epoch is not None:
            self.lr = self.base_lr * (self.gamma ** epoch)
        return self.lr


BATCH_SCHEDULERS = ("cosine", "anneal_restart", "anneal_restart_decay")


def make_scheduler(name: Optional[str], base_lr: float) -> Optional[Scheduler]:
    """Reference scheduler selection (train_model.py:455-473)."""
    if name is None:
        return None
    name = name.lower()
    if name == "plateau":
        return ReduceLROnPlateau(base_lr, factor=0.8, patience=50)
    if name == "cosine":
        return CosineAnnealing(base_lr, T_max=10)
    if name == "anneal_restart":
        return CosineAnnealingWarmRestarts(base_lr, T_0=10)
    if name == "anneal_restart_decay":
        return CosineAnnealingWarmRestartsDecay(base_lr, T_0=10, decay_rate=0.95)
    if name == "exponential":
        return ExponentialLR(base_lr, gamma=0.95)
    raise ValueError(f"unknown scheduler {name!r}")
