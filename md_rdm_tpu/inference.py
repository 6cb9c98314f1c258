"""User-facing inference API: checkpoint -> depth maps.

The reference offers no packaged inference path (prediction happens only
inside validation); this provides the capability its users would need to
deploy the model: restore a checkpoint, jit once, predict batched depth
maps.

Output semantics: the fused map is the reference's ``recombination``
output - a log-space relative depth map at 128x128 normalized to zero
log-mean (RDM_Net forward + computations.py:394-421).  ``relative_depth``
exponentiates it to a positive map with geometric mean ~1; calibrating to
metric depth requires a scale (e.g. the known scene median), matching the
relative-depth formulation of the paper.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from md_rdm_tpu.core.config import Config, ModelConfig
from md_rdm_tpu.models.rdm import DepthEstimationNet
from md_rdm_tpu.ops.decompose import recombination


class Predictor:
    def __init__(self, variables, config: Optional[ModelConfig] = None):
        self.config = config or ModelConfig()
        self.model = DepthEstimationNet(self.config)
        # pin to device: avoids per-call parameter re-streaming
        self.variables = jax.device_put(variables, jax.devices()[0])

        @jax.jit
        def _predict(variables, x):
            yhat, ord_depth, _ = self.model.apply(variables, x, train=False)
            return recombination(list(yhat)), ord_depth

        self._predict = _predict

    @classmethod
    def from_checkpoint(cls, checkpoint_dir: str,
                        config: Optional[ModelConfig] = None,
                        step: Optional[int] = None) -> "Predictor":
        from md_rdm_tpu.training.checkpoint import CheckpointManager
        from md_rdm_tpu.training.module import DepthTrainer
        from md_rdm_tpu.training.optim import make_optimizer

        cfg = Config(model=config or ModelConfig())
        module = DepthTrainer(cfg)
        tx = make_optimizer(1e-4)
        x = jnp.zeros((1, cfg.model.image_size, cfg.model.image_size, 3))
        state = module.init(jax.random.PRNGKey(0), tx, x)
        mgr = CheckpointManager(checkpoint_dir)
        # model sub-trees only: inference must not depend on the training
        # run's optimizer structure (fast_modules/param-group checkpoints)
        _, state = mgr.restore_eval(jax.device_get(state), step=step)
        mgr.close()
        return cls({"params": state.params,
                    "batch_stats": state.batch_stats}, config)

    @classmethod
    def from_torch_checkpoint(cls, path: str,
                              config: Optional[ModelConfig] = None
                              ) -> "Predictor":
        """Load converted reference weights (tools/convert_torch_checkpoint)."""
        import pickle
        with open(path, "rb") as f:
            variables = pickle.load(f)
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
        return cls(variables, config)

    def __call__(self, images: np.ndarray
                 ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
        """images: (B, 226, 226, 3) float [0,1] -> (log map (B,1,128,128),
        ordinal decode (B,1,8,8) or None)."""
        final, ord_depth = self._predict(self.variables,
                                         jnp.asarray(images, jnp.float32))
        return np.asarray(final), (None if ord_depth is None
                                   else np.asarray(ord_depth))

    def relative_depth(self, images: np.ndarray) -> np.ndarray:
        """Positive relative depth (geometric mean ~1) at 128x128."""
        final, _ = self(images)
        return np.exp(final)
