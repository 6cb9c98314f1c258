"""Benchmark: NYUv2-shape depth maps/sec/chip at batch 16 (BASELINE.md).

Runs the flagship live-path forward (encoder -> d_1 DORN -> decomposition ->
fusion -> recombination to the final 128x128 map), batch 16, on the default
backend (the real TPU chip), and reports throughput vs the measured
PyTorch-CPU baseline (tools/baseline_torch.py on this image: 0.248
images/sec at batch 16, single CPU core, fusion tail included).

Timing methodology (tools/true_bench.py): the remote-TPU relay's
``block_until_ready`` acknowledges dispatch without waiting for execution,
so K forwards are chained inside one jit via ``lax.fori_loop`` with a
DYNAMIC trip count (one compile serves both K values), a scalar is fetched
to force a real sync, and two K values are differenced to cancel
dispatch/fetch overhead.  The calibration matmul reads 191.5 TFLOP/s (97%
of v5e peak) under this clock.

Budget discipline (VERDICT r3 #1: round 3's bench timed out, rc=124):
every measurement runs as a SUBPROCESS with a hard timeout carved from a
wall-clock budget (env MDRDM_BENCH_BUDGET_S, default 1200 s).  The primary
stage is the single bf16 measurement; on timeout/failure it falls back to
the round-2-proven fused=off configuration, then to a smaller K.  The f32
companion number is attempted only with the budget's leftovers.  Progress
goes to stderr; stdout carries exactly ONE final JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}
"""
import json
import os
import subprocess
import sys
import time

# Measured on this container (tools/baseline_torch.py --batch 16): the
# reference's live forward path in torch-CPU, fusion tail included.
TORCH_CPU_IMAGES_PER_SEC = 0.248

BATCH = 16
# Default sized to the observed driver kill window (~1800 s: BENCH_r03
# started 10:06:24, the next artifact's first log is 10:36:29): stay under
# it while giving the primary stage room for a cold relay compile.
BUDGET_S = float(os.environ.get("MDRDM_BENCH_BUDGET_S", "1680"))
_T0 = time.time()
_HERE = os.path.dirname(os.path.abspath(__file__))


def _log(msg):
    print(f"[bench {time.time() - _T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def _remaining():
    return BUDGET_S - (time.time() - _T0)


def _run_stage(dtype, fused, k, timeout_s, growth="auto", flat="auto"):
    """Run one forward measurement in a subprocess; return the LAST
    parseable JSON line from its stdout (progressive lines: timing first,
    flops-enriched second), or None on failure/timeout with no output."""
    cmd = [sys.executable, os.path.join(_HERE, "tools", "true_bench.py"),
           "--forward_json", dtype, "--fused", fused, "--growth", growth,
           "--flat", flat, "--batch", str(BATCH), "--k", str(k)]
    _log(f"stage: dtype={dtype} fused={fused} growth={growth} flat={flat} "
         f"k={k} timeout={timeout_s:.0f}s")
    try:
        proc = subprocess.run(cmd, stdout=subprocess.PIPE, cwd=_HERE,
                              timeout=max(timeout_s, 1))
        out_bytes = proc.stdout
    except subprocess.TimeoutExpired as e:
        _log(f"stage timed out after {timeout_s:.0f}s")
        out_bytes = e.stdout or b""
    result = None
    for line in out_bytes.decode(errors="replace").splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                result = json.loads(line)
            except json.JSONDecodeError:
                pass
    if result is not None:
        _log(f"stage result: {result}")
    else:
        _log("stage produced no parseable result")
    return result


def main():
    # Fallback ladder for the primary bf16 number.  fused="auto" is the
    # shipped config (Pallas sandwich routed where profitable); fused="off"
    # is the round-2 configuration whose bench was driver-green at 642
    # img/s; the k=4 rung shrinks the executed-iteration count (compile
    # surface is already 1 program/stage via the dynamic trip count).
    ladder = [("bfloat16", "auto", 16, "auto", "auto"),
              ("bfloat16", "off", 16, "off", "off"),
              ("bfloat16", "off", 4, "off", "off")]
    primary = None
    for i, (dtype, fused, k, growth, flat) in enumerate(ladder):
        if _remaining() < 45:
            _log("budget exhausted; skipping remaining rungs")
            break
        rungs_left = len(ladder) - i - 1
        # Reserve only a thin slice for fallbacks: when the cache is cold a
        # fallback rung is a fresh 10-20 min relay compile and cannot
        # succeed in any slice, so the primary rung's best chance IS the
        # budget (measured cold: init ~107 s cached + relay compile; see
        # PERF.md round 4).  Warm, the primary finishes in minutes anyway.
        reserve = 90.0 * rungs_left + 60.0
        timeout_s = _remaining() - reserve
        if timeout_s < 30:
            # hard-respect the budget: never let a rung run past it
            timeout_s = max(_remaining() - 15, 30)
            timeout_s = min(timeout_s, max(_remaining() - 15, 1))
        r = _run_stage(dtype, fused, k, timeout_s, growth=growth,
                       flat=flat)
        if r and r.get("dt_s"):
            primary = r
            break

    if primary is None:
        # Nothing measured inside the budget: still print a parseable line
        # so the driver records a diagnosable zero instead of a timeout.
        print(json.dumps({
            "metric": "nyu_depth_maps_per_sec_per_chip_b16",
            "value": 0.0, "unit": "images/sec", "vs_baseline": 0.0,
            "error": f"no stage finished within {BUDGET_S:.0f}s budget"}))
        return

    # Optional f32 companion, only if the leftovers plausibly cover it
    # (a fresh dtype is a fresh compile; require 90s slack past the bf16
    # stage's own wall time).
    f32 = None
    bf16_wall = time.time() - _T0
    if _remaining() > bf16_wall + 90:
        f32 = _run_stage("float32", primary["fused"], 16,
                         _remaining() - 30,
                         growth=primary.get("growth", "auto"),
                         flat=primary.get("flat", "auto"))

    ips = primary["img_per_s"]
    out = {
        "metric": "nyu_depth_maps_per_sec_per_chip_b16",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / TORCH_CPU_IMAGES_PER_SEC, 1),
        "fused": primary["fused"],
    }
    if f32 and f32.get("img_per_s"):
        out["f32_img_per_s"] = round(f32["img_per_s"], 2)
    if primary.get("mfu_pct"):
        out["mfu_pct"] = primary["mfu_pct"]
        out["gflops_per_image"] = primary["gflops_per_image"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
