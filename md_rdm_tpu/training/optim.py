"""Optimizer assembly: AdamW + ReduceLROnPlateau with torch semantics.

Reference: module.py:38-47 - ``AdamW(lr)`` with
``ReduceLROnPlateau(mode='max', patience=2)`` monitoring ``val_delta1``.

The optimizer is built with ``optax.inject_hyperparams`` so the learning
rate lives in the optimizer state; the host-side ``PlateauScheduler``
(exact torch ReduceLROnPlateau semantics: rel threshold 1e-4, cooldown 0,
factor 0.1) rewrites it between epochs without recompiling the step.
"""
from __future__ import annotations

import dataclasses
import optax


def make_optimizer(learning_rate: float,
                   weight_decay: float = 0.01) -> optax.GradientTransformation:
    """AdamW with torch defaults (betas 0.9/0.999, eps 1e-8, wd 0.01)."""
    return optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    import jax.numpy as jnp
    old = opt_state.hyperparams["learning_rate"]
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, old.dtype)
    return opt_state


@dataclasses.dataclass
class PlateauScheduler:
    """torch.optim.lr_scheduler.ReduceLROnPlateau, host-side.

    mode='max' on val_delta1 per the reference; rel-threshold comparison:
    improvement iff metric > best * (1 + threshold) for max mode.
    """

    mode: str = "max"
    factor: float = 0.1
    patience: int = 2
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = None  # type: ignore[assignment]
    num_bad_epochs: int = 0

    def __post_init__(self):
        if self.best is None:
            self.best = float("-inf") if self.mode == "max" else float("inf")

    def _is_better(self, metric: float) -> bool:
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold) \
                if self.best >= 0 else metric > self.best * (1.0 - self.threshold)
        return metric < self.best * (1.0 - self.threshold) \
            if self.best >= 0 else metric < self.best * (1.0 + self.threshold)

    def step(self, metric: float, lr: float) -> float:
        """Feed one epoch's monitored value; returns the (possibly reduced)
        learning rate."""
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            lr = max(lr * self.factor, self.min_lr)
            self.num_bad_epochs = 0
        return lr

    def state_dict(self) -> dict:
        return dataclasses.asdict(self)

    def load_state_dict(self, d: dict):
        for k, v in d.items():
            setattr(self, k, v)
