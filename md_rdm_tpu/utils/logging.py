"""Scalar logging: JSONL always, TensorBoard when available.

Replaces Lightning's TensorBoardLogger("result", name="rd") +
prog-bar running averages (train.py:61-62, metrics.py:13-46).
"""
from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Dict


class ScalarLogger:
    def __init__(self, directory: str, use_tensorboard: bool = True):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._jsonl = open(self.dir / "metrics.jsonl", "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir=str(self.dir / "tb"))
            except Exception:
                self._tb = None

    def log(self, step: int, scalars: Dict[str, float],
            prefix: str = ""):
        rec = {"step": step, "time": time.time()}
        for k, v in scalars.items():
            name = f"{prefix}{k}"
            rec[name] = float(v)
            if self._tb is not None:
                self._tb.add_scalar(name, float(v), step)
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
