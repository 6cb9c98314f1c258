"""Run-directory management (utils.py:49-59: result/<name>/run_N)."""
from __future__ import annotations

import glob
import os
from typing import Optional


def _existing_runs(root: str):
    runs = [r for r in glob.glob(os.path.join(root, "run_*"))
            if r.rsplit("_", 1)[-1].isdigit()]
    return sorted(runs, key=lambda r: int(r.rsplit("_", 1)[-1]))


def get_output_directory(base: str, name: str,
                         resume: Optional[str] = None) -> str:
    """Next ``{base}/{name}/run_N`` directory (utils.py:49-59).

    ``resume`` handling: a filesystem path (a checkpoint dir) resolves to
    its containing run directory; any other truthy value (the train CLI's
    ``--resume latest``) reuses the newest existing run under
    ``{base}/{name}`` so the restored checkpoints are found in place.
    """
    root = os.path.join(base, name)
    if resume:
        r = str(resume)
        if os.path.exists(r) or os.path.isdir(os.path.dirname(r)):
            return os.path.dirname(r)
        runs = _existing_runs(root)
        if runs:
            return runs[-1]
    runs = _existing_runs(root)
    run_id = int(runs[-1].rsplit("_", 1)[-1]) + 1 if runs else 0
    return os.path.join(root, f"run_{run_id}")
