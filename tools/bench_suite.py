"""Extended benchmark matrix (bench.py stays the single-line driver bench).

WARNING - DISPATCH CLOCK: this suite times with block_until_ready, which
the remote-TPU relay acknowledges without waiting for device execution
(see PERF.md "ROUND-2 CORRECTION").  Its numbers are ONLY meaningful as
relative compile/dispatch comparisons on the same shape; for honest
device throughput and MFU use tools/true_bench.py (lax.scan-chained,
scalar-fetch synced, overhead-differenced).

Measures on the default backend (TPU):
  * forward throughput, live config (decoder 1), f32 vs bf16
  * full train-step throughput (fwd+bwd+adamw), batch 16
  * relative-decoder forward (config 1,6 - the ALS fusion tail)
  * fused Pallas comparison+quantize vs the XLA path

Usage: python tools/bench_suite.py [--iters 20] [--batch 16]
"""
from __future__ import annotations

import argparse
import json
import time


_WARNED = False


def timeit(fn, iters, *args):
    """DISPATCH-CLOCK timer (see module warning) - relative use only."""
    global _WARNED
    if not _WARNED:
        print("WARNING: dispatch clock - block_until_ready does not wait "
              "for device execution through the TPU relay; absolute times "
              "are meaningless, use tools/true_bench.py (PERF.md).",
              flush=True)
        _WARNED = True
    import jax
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


# TPU v5e (v5 lite) single-chip peaks: 197 TFLOP/s bf16 MXU (MFU convention
# normalizes against the bf16 peak regardless of compute dtype), 819 GB/s
# HBM bandwidth.
V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BYTES = 819e9


def xla_cost(jitted, *args):
    """(flops, bytes accessed) from XLA's cost model for one call."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def roofline(record, name, jitted, dt, *args):
    """Record cost-model flops/bytes + arithmetic intensity.

    NO MFU/HBM%% here: this suite's dt is the dispatch clock (see module
    docstring), so utilization ratios derived from it are meaningless -
    use tools/true_bench.py for those.
    """
    flops, byt = xla_cost(jitted, *args)
    if not flops:
        return
    record(f"{name}_gflops", round(flops / 1e9, 2))
    record(f"{name}_gbytes", round(byt / 1e9, 3))
    record(f"{name}_flops_per_byte", round(flops / max(byt, 1.0), 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["fwd", "train", "relative", "pallas",
                             "train_opt"])
    ap.add_argument("--only", nargs="*", default=[],
                    choices=["fwd", "train", "relative", "pallas",
                             "train_opt"])
    args = ap.parse_args()

    import os
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    import numpy as np
    import jax
    import jax.numpy as jnp
    cache = os.path.join(repo, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.abspath(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from md_rdm_tpu.core.config import Config, ModelConfig, TrainConfig
    from md_rdm_tpu.models.rdm import DepthEstimationNet
    from md_rdm_tpu.ops.decompose import recombination
    from md_rdm_tpu.training.module import DepthTrainer
    from md_rdm_tpu.training.optim import make_optimizer

    if args.only:
        all_sections = {"fwd", "train", "relative", "pallas", "train_opt"}
        args.skip = sorted(all_sections - set(args.only))

    b = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((b, 226, 226, 3)), jnp.float32)
    y = jnp.asarray(rng.random((b, 1, 226, 226)) * 9 + 0.5, jnp.float32)
    results = {}

    def record(name, value):
        results[name] = value
        print(f"{name}: {value}", flush=True)

    if "fwd" not in args.skip:
        for dtype in ("bfloat16", "float32"):
            model = DepthEstimationNet(
                ModelConfig(decoder_ids=(1,), compute_dtype=dtype))
            variables = jax.device_put(model.init(jax.random.PRNGKey(0), x[:1], train=False), jax.devices()[0])

            @jax.jit
            def fwd(v, x):
                yhat, d, _ = model.apply(v, x, train=False)
                return recombination(list(yhat)), d

            dt = timeit(fwd, args.iters, variables, x)
            record(f"forward_{dtype}_img_per_s", round(b / dt, 1))
            roofline(record, f"forward_{dtype}", fwd, dt, variables, x)

    if "train" not in args.skip:
        cfg = Config(model=ModelConfig(decoder_ids=(1,),
                                       compute_dtype="bfloat16"),
                     train=TrainConfig(metrics=("delta1", "mse")))
        module = DepthTrainer(cfg)
        tx = make_optimizer(1e-4)
        state = module.init(jax.random.PRNGKey(0), tx, x[:1])
        step = jax.jit(lambda s, xx, yy: module.train_step(s, tx, xx, yy),
                       donate_argnums=(0,))
        state, _ = step(state, x, y)      # warmup + donate-compatible
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, logs = step(state, x, y)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / args.iters
        record("train_step_bf16_img_per_s", round(b / dt, 1))
        record("train_step_ms", round(dt * 1e3, 2))
        roofline(record, "train_step_bf16", step, dt, state, x, y)

    if "relative" not in args.skip:
        model = DepthEstimationNet(
            ModelConfig(decoder_ids=(1, 6), compute_dtype="bfloat16"))
        variables = jax.device_put(model.init(jax.random.PRNGKey(0), x[:1], train=False), jax.devices()[0])

        @jax.jit
        def fwd_rel(v, x):
            yhat, d, _ = model.apply(v, x, train=False)
            return recombination(list(yhat))

        dt = timeit(fwd_rel, args.iters, variables, x)
        record("forward_rel_d1d6_img_per_s", round(b / dt, 1))

        # in-graph Pallas-vs-XLA comparison on the paged path (d1+d9:
        # 16 tiles/image through comparison+quantize) - same weights
        for mode in ("on", "off"):
            model9 = DepthEstimationNet(
                ModelConfig(decoder_ids=(1, 9), pallas_lloyd=mode))
            v9 = jax.device_put(
                model9.init(jax.random.PRNGKey(0), x[:1], train=False),
                jax.devices()[0])

            @jax.jit
            def fwd9(v, xx, model9=model9):
                yhat, d, _ = model9.apply(v, xx, train=False)
                return recombination(list(yhat))

            dt = timeit(fwd9, args.iters, v9, x)
            record(f"forward_d1d9_pallas_{mode}_ms", round(dt * 1e3, 2))

    if "train_opt" not in args.skip:
        # authors' optimal decoder set (1,6,7,8,9) - RDM_Net.py:96-97 -
        # full train step (fwd+bwd+AdamW) with the grouped-ALS fusion tail
        cfg = Config(model=ModelConfig(decoder_ids=(1, 6, 7, 8, 9)),
                     train=TrainConfig(metrics=("delta1", "mse")))
        module = DepthTrainer(cfg)
        tx = make_optimizer(1e-4)
        state = module.init(jax.random.PRNGKey(0), tx, x[:1])
        state = jax.device_put(state, jax.devices()[0])
        step = jax.jit(lambda s, xx, yy: module.train_step(s, tx, xx, yy),
                       donate_argnums=(0,))
        state, _ = step(state, x, y)      # warmup + donated layout
        state, _ = step(state, x, y)
        jax.block_until_ready(state.params)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, logs = step(state, x, y)
        jax.block_until_ready(state.params)
        dt = (time.perf_counter() - t0) / args.iters
        record("train_step_opt_set_img_per_s", round(b / dt, 1))
        record("train_step_opt_set_ms", round(dt * 1e3, 2))
        roofline(record, "train_step_opt_set", step, dt, state, x, y)

    if "pallas" not in args.skip:
        from md_rdm_tpu.kernels.lloyd import fused_comparison_quantize
        from md_rdm_tpu.ops.comparison import comparison_cross_scale
        from md_rdm_tpu.ops.quantize import lloyd_quantize

        dn = jnp.asarray(rng.uniform(0.5, 2.0, (64, 1, 16, 16)), jnp.float32)
        dn1 = jnp.asarray(rng.uniform(0.5, 2.0, (64, 1, 8, 8)), jnp.float32)
        xla = jax.jit(
            lambda a, c: lloyd_quantize(comparison_cross_scale(a, c), 16))
        dt_x = timeit(xla, args.iters * 5, dn, dn1)
        dt_p = timeit(lambda a, c: fused_comparison_quantize(a, c, 16),
                      args.iters * 5, dn, dn1)
        record("lloyd_xla_us", round(dt_x * 1e6, 1))
        record("lloyd_pallas_us", round(dt_p * 1e6, 1))

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
