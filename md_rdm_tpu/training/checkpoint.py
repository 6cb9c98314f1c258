"""Orbax checkpointing: top-k retention on the monitored metric + resume.

Reference behavior replaced: Lightning ModelCheckpoint(save_top_k=1,
monitor='val_delta1', mode='max', filename '{epoch}-{val_delta1}')
(train.py:41-47) and the legacy per-epoch save + model_best copy
(utils.py:63-68, main.py:126-148,221-227).
"""
from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, monitor: str = "delta1",
                 mode: str = "max", save_top_k: int = 1):
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max(save_top_k, 1),
                best_fn=lambda m: m[monitor],
                best_mode=mode,
                enable_async_checkpointing=False,
            ),
        )

    def would_keep(self, metrics: Dict[str, float]) -> bool:
        """Whether a save with these metrics would survive top-k
        eviction.  The Trainer checks this BEFORE ``jax.device_get`` of
        the full train state: on a remote-TPU relay that fetch is the
        dominant epoch cost (measured 1.6 GB / up to 20 min for the f32
        optimal-set state, round 5), and orbax only evicts AFTER
        serializing, so skipping non-keepers up front saves both the
        fetch and the write.  ``save_top_k=0`` disables saving."""
        if self.save_top_k <= 0:
            return False
        steps = self._mgr.all_steps()
        if len(steps) < self.save_top_k:
            return True
        vals = []
        for s in steps:
            m = self._mgr.metrics(s)
            if m is None or self.monitor not in m:
                return True
            vals.append(float(m[self.monitor]))
        worst = min(vals) if self.mode == "max" else max(vals)
        v = float(metrics[self.monitor])
        return v > worst if self.mode == "max" else v < worst

    def save(self, epoch: int, state: Any, metrics: Dict[str, float],
             extra: Optional[Dict[str, Any]] = None):
        if self.save_top_k <= 0:
            return
        args = {"state": ocp.args.StandardSave(state)}
        if extra:
            # extras (scheduler state etc.) may hold strings -> JSON handler
            args["extra"] = ocp.args.JsonSave(extra)
        self._mgr.save(
            epoch,
            args=ocp.args.Composite(**args),
            metrics={k: float(v) for k, v in metrics.items()},
        )
        self._mgr.wait_until_finished()

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Tuple[int, Any, Dict]:
        step = step if step is not None else self._mgr.best_step()
        if step is None:
            step = self._mgr.latest_step()
        args = {"state": ocp.args.StandardRestore(state_template)}
        if "extra" in (self._mgr.item_metadata(step) or {}):
            args["extra"] = ocp.args.JsonRestore()
        restored = self._mgr.restore(step, args=ocp.args.Composite(**args))
        return step, restored["state"], dict(restored.get("extra") or {})

    def restore_eval(self, state_template: Any,
                     step: Optional[int] = None) -> Tuple[int, Any]:
        """Restore params/batch_stats/step onto ``state_template``, keeping
        the template's optimizer state untouched.

        Evaluation/inference must not require optimizer-structure equality:
        a run trained with param groups (fast_modules -> multi_transform
        opt state) is otherwise unrestorable by an eval-side template built
        with the plain optimizer.  The checkpoint is read in its own saved
        structure and only the model sub-trees are grafted.
        """
        step = step if step is not None else self._mgr.best_step()
        if step is None:
            step = self._mgr.latest_step()
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(state=ocp.args.StandardRestore()))
        raw = restored["state"]
        return step, state_template.replace(
            step=raw["step"], params=raw["params"],
            batch_stats=raw["batch_stats"])

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def close(self):
        self._mgr.close()
