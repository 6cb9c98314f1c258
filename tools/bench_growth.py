"""Microbenchmark: full-lane matmul growth conv vs lax conv (3x3, G=48).

Measures the encoder/decoder growth-conv shapes (kernels/growth_conv.py;
reference RDM_Net.py:526-531 blocks) under the honest scan-chained clock.
MFU is reported against the ALGORITHMIC conv flops (2*B*S^2*9*G*C), so
the matmul variant's lane-pad inflation shows up as time, not as flops -
the win must be real wall-clock.

Usage: python tools/bench_growth.py [--dtype bfloat16] [--batch 16]
       [--grad] [--shapes 29,15]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from tools.true_bench import V5E_PEAK_FLOPS, _setup, scan_time  # noqa: E402

# (S, C): the conv input is the sandwich's C_mid = bn_size*48 channels;
# S=8 is the decoder block (bn 8), S=57 included for reference only.
SHAPES = [(57, 2736), (29, 1392), (15, 720), (8, 384)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--grad", action="store_true")
    ap.add_argument("--shapes", default=None)
    args = ap.parse_args()

    _setup()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from md_rdm_tpu.kernels.growth_conv import growth_conv_matmul

    def conv(z, w2):
        return jax.lax.conv_general_dilated(
            z, w2.astype(z.dtype), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dev = jax.devices()[0]
    k_lo, k_hi = max(args.k // 4, 1), args.k
    rng = np.random.default_rng(0)
    results = {}

    for s, c in SHAPES:
        if args.shapes and str(s) not in args.shapes.split(","):
            continue
        g = 48
        z = jax.device_put(jnp.asarray(
            rng.standard_normal((args.batch, s, s, c)).clip(0), dt), dev)
        w2 = jax.device_put(jnp.asarray(
            rng.standard_normal((3, 3, c, g)) * 0.02, jnp.float32), dev)

        flops = 2 * args.batch * s * s * 9 * g * c
        if args.grad:
            flops *= 3  # dz + dw2 contractions, same size each

        for name, fn in (("conv", conv), ("matmul", growth_conv_matmul)):
            if args.grad:
                def make(k, fn=fn):
                    def loss(z, w2):
                        return jnp.sum(jnp.abs(
                            fn(z, w2).astype(jnp.float32)))
                    gfn = jax.grad(loss, argnums=(0, 1))

                    @jax.jit
                    def run(z, w2):
                        def body(cc, _):
                            gz, gw = gfn(z + (cc * 1e-12).astype(dt), w2)
                            return (jnp.sum(jnp.abs(gz.astype(jnp.float32)))
                                    + jnp.sum(jnp.abs(gw))) * 1e-12, None
                        cc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                             length=k)
                        return cc
                    return lambda: float(run(z, w2))
            else:
                def make(k, fn=fn):
                    @jax.jit
                    def run(z, w2):
                        def body(cc, _):
                            y = fn(z + (cc * 1e-12).astype(dt), w2)
                            return jnp.sum(jnp.abs(
                                y.astype(jnp.float32))) * 1e-9, None
                        cc, _ = jax.lax.scan(body, jnp.float32(0), None,
                                             length=k)
                        return cc
                    return lambda: float(run(z, w2))

            dtm = scan_time(make, k_lo, k_hi)
            mfu = 100 * flops / dtm / V5E_PEAK_FLOPS
            tag = "_grad" if args.grad else ""
            key = f"s{s}c{c}_{name}{tag}"
            results[key + "_ms"] = round(dtm * 1e3, 3)
            results[key + "_mfu_pct"] = round(mfu, 1)
            print(f"S={s} C={c} {name}{tag}: {dtm*1e3:.3f} ms  "
                  f"{mfu:.1f}% MFU", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
