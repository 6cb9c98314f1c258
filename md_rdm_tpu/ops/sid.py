"""Spacing-increasing discretization (SID) depth<->label converters.

Reference: computations.py:559-631 (K=68 table) and utils.py:120-211
(K=90 for NYU; ``depth2label_sid`` at utils.py:195 is the one used on the
live training path, module.py:126,142).

    label = K * ln(depth / alpha) / ln(beta / alpha)
    depth = exp(ln(alpha) + ln(beta/alpha) * label / K)
"""
from __future__ import annotations

import jax.numpy as jnp

from md_rdm_tpu.core.config import SIDConfig


def depth_to_label(depth: jnp.ndarray, sid: SIDConfig,
                   clamp_negative: bool = True,
                   integer: bool = True) -> jnp.ndarray:
    """utils.depth2label_sid: float label, clamped >= 0, truncated to int.

    ``integer=True`` reproduces the reference's ``.int()`` truncation
    (utils.py:211) but returns float32 for downstream arithmetic.
    """
    label = sid.K * jnp.log(depth / sid.alpha) / jnp.log(sid.beta / sid.alpha)
    if clamp_negative:
        label = jnp.maximum(label, 0.0)
    if integer:
        label = jnp.trunc(label)
    return label.astype(jnp.float32)


def label_to_depth(label: jnp.ndarray, sid: SIDConfig) -> jnp.ndarray:
    """utils.get_depth_sid / computations.get_depth_sid."""
    if sid.alpha != 0.0:
        depth = jnp.exp(jnp.log(sid.alpha)
                        + jnp.log(sid.beta / sid.alpha) * label / sid.K)
    else:
        depth = jnp.exp(jnp.log(sid.beta) * label / sid.K)
    return depth.astype(jnp.float32)
