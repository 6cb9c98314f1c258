"""Training/eval step functions - the RelativeDephModule equivalent.

Reference: network/module.py.  The Lightning module's responsibilities are
split TPU-style: pure jit'd step functions here (batch-sharded over the
mesh), host-side loop/optimizer/scheduler state in training/loop.py.

Faithful loss assembly (module.py:64-97):
  * GT bicubic-resized to 128 (module.py:68)
  * invalid-pixel masking y = gt*(gt>0) + ((gt<=0)+1e-4) (module.py:75-78)
  * component targets: decompose(normalize(y), 7); slot 0 overwritten with
    the D0 of the decomposed SID-label map when an ordinal head is present
    (module.py:119-133)
  * fine-detail loss: sum of per-slot MSE between the (log-space) weighted
    prediction components and the (linear-space) target components - the
    reference's log/linear mismatch is deliberate parity (SURVEY.md 7.6)
  * ordinal loss on decoder 1's probabilities vs SID labels of the GT
    resized to the ordinal head's size (module.py:86-87,135-143)
  * total = MSE(final, y) + fine_detail + ordinal
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from md_rdm_tpu.core.config import Config, SIDConfig
from md_rdm_tpu.losses import mse_loss, ordinal_loss
from md_rdm_tpu.metrics import compute_metrics
from md_rdm_tpu.models.rdm import DepthEstimationNet
from md_rdm_tpu.ops.decompose import (
    decompose_depth_map,
    optimize_components,
    recombination,
)
from md_rdm_tpu.ops.geometry import normalize_gm
from md_rdm_tpu.ops.resize import resize_bicubic
from md_rdm_tpu.ops.sid import depth_to_label


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def mask_target(y: jnp.ndarray) -> jnp.ndarray:
    """module.py:75-78: valid pixels keep gt (+1e-4), invalid become 1.0001."""
    return y * (y > 0) + ((y <= 0) + 1e-4)


def compute_final_depth(yhat, y, has_ordinal: bool, sid: SIDConfig):
    """module.py:119-133 -> (final 128x128 map, fine-detail loss)."""
    component_target = decompose_depth_map(normalize_gm(y), 7)
    if has_ordinal:
        labels8 = depth_to_label(resize_bicubic(y, 8), sid)
        ord_components = decompose_depth_map(normalize_gm(labels8), 3)
        component_target[0] = ord_components[0]
    components, fine_loss = optimize_components(yhat, component_target)
    final = recombination(components)
    return final, fine_loss


def compute_ordinal_target(y: jnp.ndarray, ord_size: int,
                           sid: SIDConfig) -> jnp.ndarray:
    """module.py:135-143: resize GT to head size, SID-discretize."""
    return depth_to_label(resize_bicubic(y, ord_size), sid)


@dataclasses.dataclass(frozen=True)
class DepthTrainer:
    """Bundles model + config into pure step functions (to be jit'd/sharded
    by the caller)."""

    config: Config

    @property
    def model(self) -> DepthEstimationNet:
        return DepthEstimationNet(self.config.model)

    # ------------------------------------------------------------- init ---
    def init(self, rng: jax.Array, tx: optax.GradientTransformation,
             sample_x: jnp.ndarray) -> TrainState:
        variables = self.model.init(rng, sample_x, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
        )

    # ------------------------------------------------------------- loss ---
    def _forward_loss(self, params, batch_stats, x, y, train: bool):
        cfg = self.config
        if train:
            out, updated = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=True, mutable=["batch_stats"])
            yhat, ord_depth, ord_probs = out
            new_stats = updated["batch_stats"]
        else:
            yhat, ord_depth, ord_probs = self.model.apply(
                {"params": params, "batch_stats": batch_stats}, x,
                train=False)
            new_stats = batch_stats

        has_ordinal = cfg.model.has_ordinal
        final, fine_loss = compute_final_depth(yhat, y, has_ordinal, cfg.sid)
        mse = mse_loss(final, y)
        if ord_probs is not None:
            ord_y = compute_ordinal_target(y, ord_depth.shape[-1], cfg.sid)
            ord_l = ordinal_loss(ord_probs, ord_y)
        else:
            ord_l = jnp.zeros(())
        total = mse + fine_loss + ord_l
        aux = {"final": final, "mse": mse, "fine_detail": fine_loss,
               "ord_loss": ord_l, "batch_stats": new_stats}
        return total, aux

    # ------------------------------------------------------------- steps ---
    def train_step(self, state: TrainState, tx: optax.GradientTransformation,
                   x: jnp.ndarray, y: jnp.ndarray
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """One optimization step.  x: (B,226,226,3) NHWC; y: (B,1,H,W)."""
        cfg = self.config
        y = mask_target(resize_bicubic(y, 128))

        def loss_fn(params):
            return self._forward_loss(params, state.batch_stats, x, y,
                                      train=True)

        (total, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  batch_stats=aux["batch_stats"],
                                  opt_state=new_opt)
        logs = {"loss": total, "MSE": aux["mse"],
                "Ord_Loss": aux["ord_loss"],
                "Fine_Detail": aux["fine_detail"]}
        logs.update(compute_metrics(self._metric_pred(aux["final"]),
                                    normalize_gm(y), cfg.train.metrics))
        return new_state, logs

    def _metric_pred(self, final: jnp.ndarray) -> jnp.ndarray:
        """Recombination returns LOG depth; 'linear' metric space maps it
        back with exp so delta/rel metrics are meaningful (faithful mode
        scores the log map directly, as the reference does)."""
        if self.config.train.metrics_space == "linear":
            return jnp.exp(final)
        return final

    def train_step_device_aug(self, state: TrainState,
                              tx: optax.GradientTransformation,
                              x_raw: jnp.ndarray, y_raw: jnp.ndarray,
                              key: jax.Array
                              ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        """Train step with on-device augmentation fused into the same
        compiled graph (BASELINE north star): x_raw/y_raw are fixed-size
        pre-crop batches; the spatial recipe + color jitter run on device
        before the forward pass.
        """
        from md_rdm_tpu.data.augment import augment_batch

        size = self.config.model.image_size
        x, y = augment_batch(key, x_raw, y_raw, out_hw=(size, size))
        return self.train_step(state, tx, x, y)

    def eval_step(self, state: TrainState, x: jnp.ndarray, y: jnp.ndarray,
                  w: jnp.ndarray = None) -> Dict[str, jnp.ndarray]:
        """Validation step (module.py:99-117): PER-SAMPLE metrics, (B,).

        The reference validates at batch 1 and averages per-batch metric
        values (metrics.py:48-71); per-sample reduction reproduces that at
        any batch size - pooling a whole batch's pixels would re-weight
        images by valid-pixel count (VERDICT r4 weak #4).

        ``w`` (optional, (B,)): 1.0 for real samples, 0.0 for the repeated
        rows that pad the tail batch up to the mesh size - padded rows are
        additionally dropped host-side by the accumulator.
        """
        cfg = self.config
        y = mask_target(resize_bicubic(y, 128))
        _, aux = self._forward_loss(state.params, state.batch_stats, x, y,
                                    train=False)
        return compute_metrics(self._metric_pred(aux["final"]),
                               normalize_gm(y), cfg.train.metrics,
                               sample_weight=w, per_sample=True)

    def predict_step(self, state: TrainState, x: jnp.ndarray) -> jnp.ndarray:
        """Inference: final fused 128x128 depth map (log-space, as the
        reference's recombination output)."""
        yhat, _, _ = self.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, x,
            train=False)
        final = recombination(list(yhat))
        return final
