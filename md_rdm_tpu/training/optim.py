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
                   weight_decay: float = 0.01,
                   fast_modules: tuple = (),
                   fast_multiplier: float = 10.0
                   ) -> optax.GradientTransformation:
    """AdamW with torch defaults (betas 0.9/0.999, eps 1e-8, wd 0.01).

    ``fast_modules``: top-level parameter-tree keys trained at
    ``fast_multiplier``x the base LR - the legacy loop's per-param-group
    1x/10x split (main.py:156-162).
    """
    base = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate, b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=weight_decay)
    if not fast_modules:
        return base

    fast = optax.inject_hyperparams(optax.adamw)(
        learning_rate=learning_rate * fast_multiplier, b1=0.9, b2=0.999,
        eps=1e-8, weight_decay=weight_decay)

    def label(params):
        import jax
        return {k: jax.tree_util.tree_map(
            lambda _: "fast" if k in fast_modules else "base", v)
            for k, v in params.items()}

    return optax.multi_transform({"base": base, "fast": fast}, label)


def _hyperparam_dicts(opt_state):
    if hasattr(opt_state, "hyperparams"):
        return [opt_state.hyperparams]
    if hasattr(opt_state, "inner_states"):   # multi_transform (param groups)
        return [s.inner_state.hyperparams
                for s in opt_state.inner_states.values()]
    raise ValueError("optimizer state has no injected hyperparams")


def get_lr(opt_state) -> float:
    """Base-group learning rate (the smallest across param groups)."""
    return min(float(h["learning_rate"]) for h in _hyperparam_dicts(opt_state))


def set_lr(opt_state, lr: float):
    """Rescale all param groups, preserving their relative multipliers."""
    import jax.numpy as jnp
    base = get_lr(opt_state)
    factor = lr / base if base > 0 else 0.0
    for h in _hyperparam_dicts(opt_state):
        old = h["learning_rate"]
        h["learning_rate"] = jnp.asarray(float(old) * factor, old.dtype)
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
        # torch's rel-threshold formulas verbatim (lr_scheduler.py):
        # max: a > best * (1 + threshold); min: a < best * (1 - threshold)
        if self.mode == "max":
            return metric > self.best * (1.0 + self.threshold)
        return metric < self.best * (1.0 - self.threshold)

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
