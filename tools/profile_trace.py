"""Capture a jax.profiler trace of the forward / train step.

The Lightning ``profiler=True`` analogue (train.py:54) for offline
analysis: writes a TensorBoard-profile trace directory.

Usage:
  python tools/profile_trace.py --what forward --out /tmp/trace
  python tools/profile_trace.py --what train --decoders 1 6 7 8 9
"""
from __future__ import annotations

import argparse
import os
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", choices=("forward", "train"), default="forward")
    ap.add_argument("--decoders", type=int, nargs="+", default=[1])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--dtype", choices=("float32", "bfloat16"),
                    default="float32")
    ap.add_argument("--no_remat", dest="remat", action="store_false",
                    default=True)
    ap.add_argument("--fused", default="auto",
                    choices=("auto", "on", "on_all", "on_all_bwd", "off"),
                    help="ModelConfig.fused_dense (Pallas dense sandwich)")
    ap.add_argument("--out", default="/tmp/md_rdm_trace")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import numpy as np
    import jax
    import jax.numpy as jnp
    try:   # persistent compile cache: cold relay compiles are 10-20 min
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass

    from md_rdm_tpu.core.config import Config, ModelConfig, TrainConfig
    from md_rdm_tpu.models.rdm import DepthEstimationNet
    from md_rdm_tpu.ops.decompose import recombination
    from md_rdm_tpu.training.module import DepthTrainer
    from md_rdm_tpu.training.optim import make_optimizer

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, 226, 226, 3)), jnp.float32)
    y = jnp.asarray(rng.random((args.batch, 1, 226, 226)) * 9 + 0.5,
                    jnp.float32)
    cfg = Config(model=ModelConfig(decoder_ids=tuple(args.decoders),
                                   compute_dtype=args.dtype,
                                   remat=args.remat,
                                   fused_dense=args.fused),
                 train=TrainConfig(metrics=("mse",)))

    dev = jax.devices()[0]
    if args.what == "forward":
        model = DepthEstimationNet(cfg.model)
        variables = jax.device_put(
            model.init(jax.random.PRNGKey(0), x[:1], train=False), dev)

        @jax.jit
        def fn(v, x):
            yhat, d, _ = model.apply(v, x, train=False)
            return recombination(list(yhat)), d

        run = lambda: jax.block_until_ready(fn(variables, x))
    else:
        module = DepthTrainer(cfg)
        tx = make_optimizer(1e-4)
        # pin params/opt-state on device: init-produced arrays otherwise
        # re-stream host<->device every call through the relay (PERF.md #3)
        state = jax.device_put(
            module.init(jax.random.PRNGKey(0), tx, x[:1]), dev)
        step = jax.jit(lambda s, xx, yy: module.train_step(s, tx, xx, yy))

        def run():
            nonlocal state
            state, _ = step(state, x, y)
            jax.block_until_ready(state.params)

    run()  # compile outside the trace
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            run()
    print(f"trace written to {args.out}")


if __name__ == "__main__":
    main()
