"""Aggregate per-op device time from a jax.profiler xplane trace.

Reads the ``*.xplane.pb`` written by ``jax.profiler.trace`` /
``tools/profile_trace.py``, walks the TPU device planes, and sums event
durations per HLO op, then groups them into readable categories
(conv-forward, conv-backward-input/filter, fusion kinds, copies,
reductions, ALS loop, ...).  This is the evidence base for the MFU-ceiling
analysis (PERF.md round 3): which ops actually burn the wall clock, and
which of those are MXU-underfilled.

Usage:
  python tools/xplane_report.py /tmp/md_rdm_trace [--top 40]
"""
from __future__ import annotations

import argparse
import collections
import glob
import os
import re


def load_xplanes(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no .xplane.pb under {trace_dir}")
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception:
        from tensorflow.core.profiler.protobuf import xplane_pb2
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append((p, xs))
    return spaces


def device_planes(xspace):
    for plane in xspace.planes:
        name = plane.name
        if ("/device:TPU" in name or "TensorCore" in name
                or name.startswith("/device:tpu")):
            yield plane


def iter_events(plane, line_name="XLA Ops"):
    """Yield (op_name, duration_ps, stats_dict) for XEvents on the named
    line.  'XLA Ops' is the synchronous per-op device timeline; 'Async XLA
    Ops' (DMA/copy-start) and 'Steps' overlap it and would double-count."""
    meta = {m_id: m.name for m_id, m in plane.event_metadata.items()}
    stat_names = {s_id: s.name for s_id, s in plane.stat_metadata.items()}
    for line in plane.lines:
        if line.name != line_name:
            continue
        for ev in line.events:
            stats = {}
            for st in ev.stats:
                key = stat_names.get(st.metadata_id, str(st.metadata_id))
                val = (st.str_value or st.int64_value or st.uint64_value
                       or st.double_value)
                stats[key] = val
            yield meta.get(ev.metadata_id, "?"), ev.duration_ps, stats


# The event name is the full HLO instruction text, e.g.
#   %convert_reduce_fusion.8 = (f32[2736]{...}, ...) fusion(bf16[...] %pad.59)
# Categorize by the instruction's OPCODE (the token between the result
# type and the operand list), NOT by substring over the whole text — the
# operand list embeds other ops' labels (`... fusion(... %copy.955)`), so
# a text match files compute fusions under "copy".  Fusions are split by
# their label, which XLA derives from the fused root/content
# (convolution_add_fusion, convert_reduce_fusion, ...).
_OPCODE_RE = re.compile(r"[}\])]\s+([a-z][a-z0-9-]*)\(")


def _label_and_opcode(name: str):
    label = name.split(" = ", 1)[0].lstrip("%").strip()
    label = re.sub(r"\.\d+$", "", label)
    m = _OPCODE_RE.search(name)
    return label, (m.group(1) if m else label)


_LAYOUT_OPS = frozenset({
    "copy", "copy-start", "copy-done", "transpose", "pad", "reshape",
    "bitcast", "concatenate", "slice", "dynamic-slice",
    "dynamic-update-slice", "gather", "scatter", "infeed", "outfeed",
    "all-gather-start", "all-gather-done"})


def categorize(name: str) -> str:
    label, opcode = _label_and_opcode(name)
    if opcode in _LAYOUT_OPS:
        return "copy/layout"
    if opcode == "custom-call":
        return "custom-call (Pallas)"
    if opcode == "convolution":
        return "convolution"
    if opcode in ("dot", "dot-general"):
        return "matmul/dot"
    if opcode == "while":
        return "while/scan(ALS)"
    if opcode in ("reduce", "reduce-window", "select-and-scatter"):
        return "reduce/pool"
    if opcode in ("all-reduce", "all-reduce-start", "reduce-scatter"):
        return "collective"
    if opcode == "fusion":
        if "conv" in label and "convert" not in label:
            return "fusion:conv"
        if "reduce" in label:
            return "fusion:reduce"
        if re.search(r"copy|transpose|pad", label):
            return "fusion:layout"
        return "fusion:other"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--line", default="XLA Ops",
                    help="timeline to aggregate (XLA Ops | Async XLA Ops)")
    ap.add_argument("--merge-reps", action="store_true", default=True,
                    help="strip trailing .N rep suffixes when merging ops")
    args = ap.parse_args()

    per_op = collections.Counter()
    per_op_count = collections.Counter()
    total_ps = 0
    nplanes = 0
    for path, xs in load_xplanes(args.trace_dir):
        for plane in device_planes(xs):
            nplanes += 1
            for name, dur_ps, _stats in iter_events(plane, args.line):
                key = re.sub(r"\.(\d+)$", "", name) if args.merge_reps else name
                per_op[key] += dur_ps
                per_op_count[key] += 1
                total_ps += dur_ps

    if not per_op:
        raise SystemExit("no device events found (CPU-only trace?)")

    per_cat = collections.Counter()
    for name, ps in per_op.items():
        per_cat[categorize(name)] += ps

    print(f"device planes: {nplanes}   total device-event time: "
          f"{total_ps / 1e9:.3f} ms (sum over events; overlapping lines "
          f"may double-count)")
    print("\n== by category ==")
    for cat, ps in per_cat.most_common():
        print(f"  {cat:<18} {ps / 1e9:>10.3f} ms  {100 * ps / total_ps:5.1f}%")
    print(f"\n== top {args.top} ops ==")
    for name, ps in per_op.most_common(args.top):
        print(f"  {ps / 1e9:>9.3f} ms  x{per_op_count[name]:<4} "
              f"{100 * ps / total_ps:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
