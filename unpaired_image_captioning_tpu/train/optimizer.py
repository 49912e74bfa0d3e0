"""Dual optimizer with the reference's schedules.

Parity: reference `misc/optimizer.py:9-131` — one `Optim` object holding
separate i2t and NMT optimizers (rmsprop/adagrad/sgd/sgdm/sgdmom/adam,
:59-74), per-model grad-norm clipping and optional noam decay in `step()`
(:89-100), epoch-based exponential LR decay (:114-131), and the scheduled
sampling probability schedule (:108-112); `NoamOpt` and
`ReduceLROnPlateau` from misc/utils.py:335-410.

Structure: optax transforms WITHOUT a learning-rate scale — the LR is a
scalar computed host-side each step (epoch decay / noam / plateau) and
passed into the jitted step, so schedule changes never recompile.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import optax


def make_transform(method: str, *, alpha: float = 0.9, beta: float = 0.999,
                   eps: float = 1e-8, momentum: float = 0.9,
                   max_grad_norm: float = 0.0,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Gradient transform WITHOUT the lr scale (applied separately)."""
    if method == "adam":
        core = optax.scale_by_adam(b1=alpha, b2=beta, eps=eps)
    elif method == "rmsprop":
        core = optax.scale_by_rms(decay=alpha, eps=eps)
    elif method == "adagrad":
        core = optax.scale_by_rss(initial_accumulator_value=0.1, eps=eps)
    elif method == "sgd":
        core = optax.identity()
    elif method == "sgdm":
        core = optax.trace(decay=momentum, nesterov=False)
    elif method == "sgdmom":
        core = optax.trace(decay=momentum, nesterov=True)
    else:
        raise ValueError(f"unknown optim method {method!r}")
    parts = []
    if max_grad_norm and max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    parts.append(core)
    if weight_decay and weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay))
    return optax.chain(*parts)


def apply_lr(updates, lr):
    return jax.tree.map(lambda u: -lr * u, updates)


def epoch_decayed_lr(base_lr: float, epoch: int, decay_start: int,
                     decay_every: int, decay_rate: float) -> float:
    """Parity: misc/optimizer.py:114-131 / train.py LR schedule."""
    if decay_start < 0 or epoch < decay_start:
        return base_lr
    frac = (epoch - decay_start) // decay_every
    return base_lr * (decay_rate ** frac)


def noam_lr(model_size: int, factor: float, warmup: int, step: int) -> float:
    """Parity: misc/utils.py NoamOpt :335-364."""
    step = max(step, 1)
    return factor * (model_size ** -0.5
                     * min(step ** -0.5, step * warmup ** -1.5))


def scheduled_sampling_prob(epoch: int, start: int, increase_every: int,
                            increase_prob: float, max_prob: float) -> float:
    """Parity: misc/optimizer.py:108-112."""
    if start < 0 or epoch < start:
        return 0.0
    frac = (epoch - start) // increase_every
    return min(increase_prob * frac, max_prob)


@dataclasses.dataclass
class PlateauScheduler:
    """ReduceLROnPlateau parity (misc/utils.py:367-410): decay when the
    tracked metric stops improving."""

    factor: float = 0.5
    patience: int = 3
    mode: str = "max"
    best: Optional[float] = None
    bad_epochs: int = 0
    scale: float = 1.0

    def update(self, metric: float) -> float:
        better = (self.best is None
                  or (metric > self.best if self.mode == "max" else metric < self.best))
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.scale


class DualOptim:
    """Holds the i2t and NMT transforms + host-side schedule state
    (parity: misc/optimizer.py Optim)."""

    def __init__(self, cfg, i2t_params=None, nmt_params=None):
        self.cfg = cfg
        self.i2t_tx = make_transform(
            cfg.i2t_optim, alpha=cfg.i2t_optim_alpha, beta=cfg.i2t_optim_beta,
            eps=cfg.i2t_optim_epsilon, momentum=cfg.i2t_momentum,
            max_grad_norm=cfg.i2t_max_grad_norm,
            weight_decay=cfg.i2t_weight_decay)
        self.nmt_tx = make_transform(
            cfg.nmt_optim, alpha=cfg.nmt_optim_alpha, beta=cfg.nmt_optim_beta,
            eps=cfg.nmt_optim_epsilon, momentum=cfg.nmt_momentum,
            max_grad_norm=cfg.nmt_max_grad_norm,
            weight_decay=cfg.nmt_weight_decay)
        self.i2t_state = self.i2t_tx.init(i2t_params) if i2t_params is not None else None
        self.nmt_state = self.nmt_tx.init(nmt_params) if nmt_params is not None else None
        self.i2t_base_lr = cfg.i2t_learning_rate
        self.nmt_base_lr = cfg.nmt_learning_rate
        self.nmt_step = 0

    def i2t_lr(self, epoch: int) -> float:
        return epoch_decayed_lr(self.i2t_base_lr, epoch,
                                self.cfg.i2t_learning_rate_decay_start,
                                self.cfg.i2t_learning_rate_decay_every,
                                self.cfg.i2t_learning_rate_decay_rate)

    def nmt_lr(self, epoch: int) -> float:
        if self.cfg.nmt_decay_method == "noam":
            return noam_lr(self.cfg.rnn_size, self.nmt_base_lr,
                           self.cfg.nmt_warmup_steps, self.nmt_step)
        return epoch_decayed_lr(self.nmt_base_lr, epoch,
                                self.cfg.nmt_learning_rate_decay_start,
                                self.cfg.nmt_learning_rate_decay_every,
                                self.cfg.nmt_learning_rate_decay_rate)

    def ss_prob(self, epoch: int) -> float:
        return scheduled_sampling_prob(
            epoch, self.cfg.scheduled_sampling_start,
            self.cfg.scheduled_sampling_increase_every,
            self.cfg.scheduled_sampling_increase_prob,
            self.cfg.scheduled_sampling_max_prob)

    def state_dict(self) -> dict:
        return {"i2t_state": self.i2t_state, "nmt_state": self.nmt_state,
                "nmt_step": self.nmt_step,
                "i2t_base_lr": self.i2t_base_lr, "nmt_base_lr": self.nmt_base_lr}

    def load_state_dict(self, d: dict) -> None:
        self.i2t_state = d.get("i2t_state", self.i2t_state)
        self.nmt_state = d.get("nmt_state", self.nmt_state)
        self.nmt_step = d.get("nmt_step", 0)
        self.i2t_base_lr = d.get("i2t_base_lr", self.i2t_base_lr)
        self.nmt_base_lr = d.get("nmt_base_lr", self.nmt_base_lr)
