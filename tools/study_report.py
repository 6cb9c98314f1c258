"""Summarize an optimal-set learning run: val trajectory + fusion-weight
slot movement (reads the ScalarLogger metrics.jsonl of a run directory).

Usage: python tools/study_report.py results/round5/optset_fast10 [...]
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np


def load(run_dir):
    # logger dir is <run>/rd (legacy --no_run_dirs) or <run>/logs
    for sub in ("rd", "logs", "."):
        p = os.path.join(run_dir, sub, "metrics.jsonl")
        if os.path.exists(p):
            return [json.loads(l) for l in open(p)]
    raise SystemExit(f"no metrics.jsonl under {run_dir}")


def report(run_dir):
    rows = load(run_dir)
    val = [r for r in rows if "val_delta1" in r]
    fus = [r for r in rows if any(k.startswith("fusion_") for k in r)]
    lr = {r["step"]: r["lr"] for r in rows if "lr" in r}
    print(f"\n=== {run_dir}  ({len(val)} epochs) ===")
    if not val:
        return
    best = max(val, key=lambda r: r["val_delta1"])
    print(f"val_delta1: first {val[0]['val_delta1']:.4f}  "
          f"best {best['val_delta1']:.4f} @epoch {best['step']}  "
          f"last {val[-1]['val_delta1']:.4f}")
    print(f"val_rmse:   first {val[0].get('val_rmse', float('nan')):.4f}  "
          f"last {val[-1].get('val_rmse', float('nan')):.4f}")
    eras = sorted(set(lr.values()), reverse=True)
    print(f"lr schedule: {eras[0]:.1e} -> {eras[-1]:.1e} "
          f"({len(eras)} plateaus)")
    if fus:
        keys = sorted(k for k in fus[0] if k.startswith("fusion_"))
        first, last = fus[0], fus[-1]
        deltas = {k: last[k] - first[k] for k in keys}
        moved = {k: d for k, d in deltas.items() if abs(d) > 0.05}
        print(f"fusion weights: {len(keys)} slots, "
              f"max |delta| {max(abs(d) for d in deltas.values()):.4f}, "
              f"{len(moved)} moved >0.05")
        # per-slot-group movement: which decoders' candidates engaged
        for k in keys:
            tag = " <-- moved" if k in moved else ""
            print(f"  {k:22s} {first[k]:+8.4f} -> {last[k]:+8.4f}"
                  f"  (d {deltas[k]:+.4f}){tag}")


if __name__ == "__main__":
    for d in sys.argv[1:]:
        report(d)
