"""Depth metrics with the reference's exact definitions (metrics.py:48-128).

``MetricComputation.compute`` (metrics.py:58-66) clamps predictions to
>= 1e-7 and evaluates only where target > 0.  Boolean fancy-indexing is
replaced by masked reductions (static shapes for jit).

Note: the reference's ``rmse`` is nonstandard - mean of sqrt((p-t)^2 / t)
(metrics.py:113-116), kept faithful under the name ``rmse``; the standard
root-mean-square error is available as ``rms``.

Pooling semantics: the reference validates at batch 1 and averages the
per-batch (= per-sample) metric values across the epoch
(metrics.py:48-71).  ``per_sample=True`` reproduces that exactly at any
batch size - each metric reduces over its own sample's pixels and returns
a (B,) vector; the epoch average then weights every *image* equally,
instead of pooling all pixels of a batch (which silently re-weights
images by valid-pixel count when batches mix).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp


def _masked_mean(values: jnp.ndarray, mask: jnp.ndarray,
                 axes: Optional[Tuple[int, ...]] = None) -> jnp.ndarray:
    cnt = jnp.maximum(jnp.sum(mask, axis=axes), 1)
    return jnp.sum(jnp.where(mask, values, 0.0), axis=axes) / cnt


def _delta(pred, target, mask, exp, axes):
    ratio = jnp.maximum(pred / target, target / pred)
    return _masked_mean((ratio < 1.25 ** exp).astype(jnp.float32), mask, axes)


def compute_metrics(pred: jnp.ndarray, target: jnp.ndarray,
                    names: Sequence[str],
                    sample_weight: jnp.ndarray = None,
                    per_sample: bool = False
                    ) -> Dict[str, jnp.ndarray]:
    """Evaluate the named metrics; pred/target any matching shape.

    ``sample_weight`` (optional, shape (B,)): per-sample validity - samples
    with weight 0 are excluded from every pixel pool.  Used to mask out the
    repeated-padding rows that make eval batches shardable on a mesh
    (loop.py pads the tail batch up to a multiple of the device count).

    ``per_sample``: return (B,) per-sample values (axis-0 batch) instead of
    scalars pooled over every pixel in the batch - see the module
    docstring for why epoch averages should use this.
    """
    pred = jnp.maximum(pred, 1e-7)
    mask = target > 0
    if sample_weight is not None:
        w = sample_weight.reshape(
            (-1,) + (1,) * (target.ndim - 1)) > 0
        mask = mask & w
    axes = tuple(range(1, target.ndim)) if per_sample else None
    safe_t = jnp.where(mask, target, 1.0)
    out = {}
    for name in names:
        if name.startswith("delta"):
            out[name] = _delta(pred, safe_t, mask, int(name[-1]), axes)
        elif name == "mse":
            out[name] = _masked_mean((pred - safe_t) ** 2, mask, axes)
        elif name == "mae":
            out[name] = _masked_mean(jnp.abs(pred - safe_t), mask, axes)
        elif name == "msle":
            out[name] = _masked_mean(
                (jnp.log1p(pred) - jnp.log1p(safe_t)) ** 2, mask, axes)
        elif name == "log10":
            out[name] = _masked_mean(
                jnp.abs(jnp.log10(pred) - jnp.log10(safe_t)), mask, axes)
        elif name == "absrel":
            out[name] = _masked_mean(jnp.abs(pred - safe_t) / safe_t,
                                     mask, axes)
        elif name == "sqrel":
            out[name] = _masked_mean((pred - safe_t) ** 2 / safe_t,
                                     mask, axes)
        elif name == "rmse":   # reference's nonstandard definition
            out[name] = _masked_mean(
                jnp.sqrt((pred - safe_t) ** 2 / safe_t), mask, axes)
        elif name == "rms":    # standard RMSE
            out[name] = jnp.sqrt(_masked_mean((pred - safe_t) ** 2,
                                              mask, axes))
        elif name == "berhu":
            # criteria.berHuLoss scored as a metric (the legacy loop's
            # criterion, main.py:169 + criteria.py:37): c is 0.2 * max of
            # the raw residual over all (weight-valid) pixels, the
            # concat-mean over |d| on valid pixels plus d^2 on the >c
            # subset.  Matches losses.berhu_loss when sample_weight is None.
            # Per-sample mode takes c per sample - the batch-1 semantics.
            vw = (jnp.ones_like(mask) if sample_weight is None
                  else jnp.broadcast_to(
                      sample_weight.reshape(
                          (-1,) + (1,) * (target.ndim - 1)) > 0, mask.shape))
            c = 0.2 * jnp.max(jnp.where(vw, pred - target, -jnp.inf),
                              axis=axes, keepdims=axes is not None)
            diff = jnp.where(mask, jnp.abs(pred - safe_t), 0.0)
            over = mask & (diff > c)
            total = (jnp.sum(diff, axis=axes)
                     + jnp.sum(jnp.where(over, diff * diff, 0.0), axis=axes))
            out[name] = total / jnp.maximum(
                jnp.sum(mask, axis=axes) + jnp.sum(over, axis=axes), 1)
        else:
            raise ValueError(f"unknown metric {name}")
    return out


class MetricAccumulator:
    """Host-side running averages (MetricComputation sums, metrics.py:54-71)."""

    def __init__(self, names: Sequence[str]):
        self.names = list(names)
        self.reset()

    def reset(self):
        self.count = 0.0
        self.sums = {n: 0.0 for n in self.names}

    def update(self, values: Dict[str, jnp.ndarray], weight: float = 1.0):
        """Accumulate one batch of scalar metric values with ``weight``
        (e.g. the number of samples a pooled batch value represents)."""
        self.count += weight
        for n in self.names:
            self.sums[n] += float(values[n]) * weight

    def update_per_sample(self, values: Dict[str, jnp.ndarray],
                          n_real: int):
        """Accumulate per-sample (B,) metric vectors; only the first
        ``n_real`` rows count (the rest are mesh-shardability padding).
        Every image then weighs equally in the epoch average - the
        reference's batch-1 validation semantics at any batch size."""
        import numpy as np
        self.count += n_real
        for n in self.names:
            self.sums[n] += float(np.asarray(values[n])[:n_real].sum())

    def averages(self) -> Dict[str, float]:
        c = max(self.count, 1e-12)
        return {n: self.sums[n] / c for n in self.names}
