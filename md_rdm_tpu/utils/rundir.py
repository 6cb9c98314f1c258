"""Run-directory management (utils.py:49-59: result/<name>/run_N)."""
from __future__ import annotations

import glob
import os
from typing import Optional


def get_output_directory(base: str, name: str,
                         resume: Optional[str] = None) -> str:
    """Next ``{base}/{name}/run_N`` directory, or the resume checkpoint's
    directory when resuming (utils.py:49-59)."""
    if resume:
        return os.path.dirname(resume)
    root = os.path.join(base, name)
    runs = sorted(glob.glob(os.path.join(root, "run_*")))
    run_id = int(runs[-1].split("_")[-1]) + 1 if runs else 0
    return os.path.join(root, f"run_{run_id}")
