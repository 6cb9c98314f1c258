"""Benchmark: NYUv2-shape depth maps/sec/chip at batch 16 (BASELINE.md).

Runs the flagship live-path forward (encoder -> d_1 DORN -> decomposition ->
fusion -> recombination to the final 128x128 map), batch 16, on the default
backend (the real TPU chip), and reports throughput vs the measured
PyTorch-CPU baseline (tools/baseline_torch.py on this image: 0.248
images/sec at batch 16, single CPU core, fusion tail included).

Timing methodology (round 2, tools/true_bench.py): the remote-TPU relay's
``block_until_ready`` acknowledges dispatch without waiting for execution
(a 1.1 TFLOP calibration matmul "finished" at 31 PFLOP/s by that clock -
156x the chip's physical peak), which had inflated round-1 numbers.  Now K
forwards are chained inside one jit via ``lax.scan`` (loop-carried operand
so XLA cannot elide the body), a scalar is fetched to force a real sync,
and two K values are differenced to cancel dispatch/fetch overhead.  The
calibration matmul measures <= the 197 TFLOP/s peak under this clock.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "mfu_pct": N}
"""
import json
import os
import sys

# Measured on this container (tools/baseline_torch.py --batch 16): the
# reference's live forward path in torch-CPU, fusion tail included.
TORCH_CPU_IMAGES_PER_SEC = 0.248

BATCH = 16


def main():
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from true_bench import V5E_PEAK_FLOPS, measure_forward

    # primary: bfloat16, the framework's (and the reference's, train.py:11
    # AMP-16) default precision; float32 - the parity/verification dtype -
    # reported alongside.  bf16 accuracy deltas are characterized in
    # PERF.md (ordinal probs <=3.3e-4 off f32).
    dt16, flops16 = measure_forward(BATCH, k_lo=4, k_hi=16,
                                    dtype="bfloat16")
    dt32, _ = measure_forward(BATCH, k_lo=4, k_hi=16, dtype="float32")
    ips = BATCH / dt16
    out = {
        "metric": "nyu_depth_maps_per_sec_per_chip_b16",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / TORCH_CPU_IMAGES_PER_SEC, 1),
        "f32_img_per_s": round(BATCH / dt32, 2),
    }
    if flops16:
        out["mfu_pct"] = round(100 * flops16 / dt16 / V5E_PEAK_FLOPS, 2)
        out["gflops_per_image"] = round(flops16 / BATCH / 1e9, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
