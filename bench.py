"""Benchmark: NYUv2-shape depth maps/sec/chip at batch 16 (BASELINE.md).

Runs the flagship live-path forward (encoder -> d_1 DORN -> decomposition ->
fusion -> recombination to the final 128x128 map) under one jit on the
default backend (the real TPU chip), batch 16, and reports throughput vs
the measured PyTorch-CPU baseline (tools/baseline_torch.py on this image:
0.248 images/sec at batch 16, single CPU core, fusion tail included).

Measured round 1 (TPU v5e single chip, batch 16, uncontended):
forward f32 20,698 img/s; forward bf16 17,010 img/s; full train step
(fwd+bwd+AdamW) f32 6.6 ms = 2,424 img/s, bf16 12.96 ms; d1+d6
relative-tail forward 17,625 img/s.  float32 beats bfloat16 throughout on
this model (the (16,128) bf16 tile constraint penalizes the heavily
concatenated DenseNet), so f32 is the default compute dtype.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import time

import numpy as np

# Measured on this container (tools/baseline_torch.py --batch 16): the
# reference's live forward path in torch-CPU, fusion tail included.
TORCH_CPU_IMAGES_PER_SEC = 0.248

BATCH = 16
WARMUP = 3
ITERS = 20


def main():
    import os
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache")
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from md_rdm_tpu.core.config import ModelConfig
    from md_rdm_tpu.models.rdm import DepthEstimationNet
    from md_rdm_tpu.ops.decompose import recombination

    model = DepthEstimationNet(
        ModelConfig(decoder_ids=(1,), compute_dtype="float32"))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, 226, 226, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
    # Pin params to the device: init-produced arrays can otherwise be
    # re-streamed host<->device on every call under the remote-TPU relay
    # (measured 45x slowdown on the multi-decoder config).
    variables = jax.device_put(variables, jax.devices()[0])

    # NOTE: variables must be an explicit argument - closing over them bakes
    # 90M parameters into the HLO as constants (oversized compile payloads).
    @jax.jit
    def forward(variables, x):
        yhat, ord_depth, _ = model.apply(variables, x, train=False)
        return recombination(list(yhat)), ord_depth

    for _ in range(WARMUP):
        jax.block_until_ready(forward(variables, x))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        jax.block_until_ready(forward(variables, x))
    dt = (time.perf_counter() - t0) / ITERS

    ips = BATCH / dt
    out = {
        "metric": "nyu_depth_maps_per_sec_per_chip_b16",
        "value": round(ips, 2),
        "unit": "images/sec",
        "vs_baseline": round(ips / TORCH_CPU_IMAGES_PER_SEC, 1),
    }
    # roofline accounting (auditability): XLA cost model flops/bytes for
    # one forward; MFU normalized to the v5e bf16 peak (197 TFLOP/s),
    # HBM utilization to 819 GB/s.
    try:
        ca = forward.lower(variables, x).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        byt = float(ca.get("bytes accessed", 0.0))
        if flops:
            out["mfu_pct"] = round(100 * flops / dt / 197e12, 2)
            out["hbm_pct"] = round(100 * byt / dt / 819e9, 2)
    except Exception:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
