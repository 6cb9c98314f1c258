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
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=save_top_k,
                best_fn=lambda m: m[monitor],
                best_mode=mode,
                enable_async_checkpointing=False,
            ),
        )

    def save(self, epoch: int, state: Any, metrics: Dict[str, float],
             extra: Optional[Dict[str, Any]] = None):
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
