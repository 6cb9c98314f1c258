"""Losses: DORN ordinal loss + masked regression losses.

Reference: loss.py (Ordinal_Loss :8-59, RMSE_Loss :61-67, L2_Loss :69-74)
and criteria.py (MaskedMSELoss :11, MaskedL1Loss :24, berHuLoss :37).

The reference builds the ordinal rank tensor K with a Python loop over
channels (loss.py:34-40) and uses boolean fancy-indexing; here the rank is a
``broadcasted_iota`` and the masked sums are ``where``-selects - static
shapes, one VPU pass, jit-safe.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def ordinal_loss(ord_probs: jnp.ndarray, target_labels: jnp.ndarray) -> jnp.ndarray:
    """DORN ordinal loss (loss.py:17-59).

    ord_probs: (N, C, H, W) per-threshold probabilities P(l > k).
    target_labels: (N, 1, H, W) integer-valued SID labels.
    loss = -[ sum_{k <= t} log P_k + sum_{k > t} log (1 - P_k) ] / (N*H*W)
    (note: normalized by N*H*W, not by C - faithful).
    """
    n, c, h, w = ord_probs.shape
    k = jax.lax.broadcasted_iota(jnp.float32, (n, c, h, w), 1)
    t = target_labels.astype(jnp.float32)
    mask0 = k <= t
    p = ord_probs.astype(jnp.float32)
    log_p = jnp.log(jnp.clip(p, 1e-8, 1e8))
    log_not_p = jnp.log(jnp.clip(1.0 - p, 1e-8, 1e8))
    total = jnp.sum(jnp.where(mask0, log_p, log_not_p))
    return -total / (n * h * w)


def rmse_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """sqrt(mean((a-b)^2)) (loss.py:61-67)."""
    return jnp.sqrt(jnp.mean((a - b) ** 2))


def l2_component_loss(yhat, y):
    """Per-scale summed squared error list (loss.py:69-74)."""
    return [jnp.sum(jnp.abs(y[i] - yhat[i]) ** 2) for i in range(len(yhat))]


def _masked(diff: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    cnt = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, diff, 0.0)) / cnt


def masked_mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """criteria.MaskedMSELoss: mean squared diff over target>0 pixels."""
    return _masked((target - pred) ** 2, target > 0)


def masked_l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """criteria.MaskedL1Loss."""
    return _masked(jnp.abs(target - pred), target > 0)


def berhu_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """criteria.berHuLoss: reverse Huber with c = 0.2 * max(pred - target).

    The reference concatenates |diff| (all valid pixels) with diff^2 over
    the >c subset and takes the mean of the concatenation; reproduced as a
    weighted sum over the two masked populations.
    """
    valid = target > 0
    c = 0.2 * jnp.max(pred - target)
    diff = jnp.where(valid, jnp.abs(target - pred), 0.0)
    over = jnp.logical_and(valid, diff > c)
    n_valid = jnp.sum(valid)
    n_over = jnp.sum(over)
    total = jnp.sum(diff) + jnp.sum(jnp.where(over, diff * diff, 0.0))
    return total / jnp.maximum(n_valid + n_over, 1)


def mse_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Plain MSE (module.py:29 criterion)."""
    return jnp.mean((pred - target) ** 2)
