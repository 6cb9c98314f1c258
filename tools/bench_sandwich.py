"""Microbenchmark: fused Pallas dense-sandwich vs the XLA formulation.

Measures the encoder's hot dense-layer shapes (SURVEY §2.1 encoder,
reference RDM_Net.py:526-531 bn_size quirk) under the honest scan-chained
clock (tools/true_bench.py methodology).

Usage: python tools/bench_sandwich.py [--dtype bfloat16] [--batch 16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, repo)

from tools.true_bench import V5E_PEAK_FLOPS, _setup, scan_time  # noqa: E402

# (S, C_in, bn_size): first and last (widest) layer of each encoder block
SHAPES = [(57, 96, 57), (57, 336, 57), (29, 192, 29), (29, 720, 29),
          (15, 384, 15), (15, 2064, 15)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("float32", "bfloat16"))
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--grad", action="store_true",
                    help="measure value+grad (train-step shape) instead of "
                         "the eval forward: xla vs pallas-fwd/xla-bwd vs "
                         "fully-fused pallas")
    ap.add_argument("--shapes", default=None,
                    help="comma list of spatial sizes to restrict to")
    ap.add_argument("--layout", default="cp", choices=("cp", "nhwc"),
                    help="Pallas kernel layout: cp = transposed "
                         "[C, pixels]; nhwc = native (no prep transposes)")
    args = ap.parse_args()

    _setup()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from md_rdm_tpu.kernels.dense_sandwich import (dense_sandwich,
                                                   reference_sandwich)

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    dev = jax.devices()[0]
    k_lo, k_hi = max(args.k // 4, 1), args.k
    rng = np.random.default_rng(0)
    results = {}

    for s, c_in, bn in SHAPES:
        c_mid, g = bn * 48, 48
        xr = jax.device_put(jnp.asarray(
            rng.standard_normal((args.batch, s, s, c_in)).clip(0), dt), dev)
        w1 = jax.device_put(jnp.asarray(
            rng.standard_normal((1, 1, c_in, c_mid)) * 0.02, jnp.float32),
            dev)
        w2 = jax.device_put(jnp.asarray(
            rng.standard_normal((3, 3, c_mid, g)) * 0.02, jnp.float32), dev)
        scale = jax.device_put(jnp.ones((c_mid,), jnp.float32), dev)
        shift = jax.device_put(jnp.zeros((c_mid,), jnp.float32), dev)

        if args.shapes and str(s) not in args.shapes.split(","):
            continue

        flops = 2 * args.batch * s * s * c_mid * (c_in + 9 * g)
        if args.grad:
            # exact fwd+bwd matmul work: forward + the five backward
            # contractions (z recompute, conv-transposes, dw1, dw2)
            from md_rdm_tpu.kernels.dense_sandwich import sandwich_bwd_flops
            flops += sandwich_bwd_flops(args.batch, s, c_in, c_mid, g)

        lay = args.layout
        variants = (("xla", reference_sandwich),
                    (f"pallas_{lay}",
                     lambda *a: dense_sandwich(*a, layout=lay)))
        if args.grad:
            variants = (
                ("xla", reference_sandwich),
                (f"pallas_{lay}_xbwd",
                 lambda *a: dense_sandwich(*a, layout=lay)),
                (f"pallas_{lay}_fbwd",
                 lambda *a: dense_sandwich(*a, pallas_bwd=True, layout=lay)),
            )

        for name, fn in variants:
            if args.grad:
                def make(k, fn=fn):
                    def loss(xr, w1, scale, shift, w2):
                        y = fn(xr, w1, scale, shift, w2)
                        return jnp.sum(jnp.abs(y.astype(jnp.float32)))

                    gfn = jax.grad(loss, argnums=(0, 1, 2, 3, 4))

                    @jax.jit
                    def run(xr, w1, scale, shift, w2):
                        def body(c, _):
                            gs = gfn(xr + (c * 1e-12).astype(dt), w1,
                                     scale, shift, w2)
                            tot = sum(jnp.sum(jnp.abs(g_.astype(
                                jnp.float32))) for g_ in gs)
                            return tot * 1e-12, None
                        c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                            length=k)
                        return c
                    return lambda: float(run(xr, w1, scale, shift, w2))

                dtm = scan_time(make, k_lo, k_hi)
                mfu = 100 * flops / dtm / V5E_PEAK_FLOPS
                key = f"s{s}c{c_in}_{name}_grad"
                results[key + "_ms"] = round(dtm * 1e3, 3)
                results[key + "_mfu_pct"] = round(mfu, 1)
                print(f"S={s} C_in={c_in} C_mid={c_mid} {name} GRAD: "
                      f"{dtm*1e3:.3f} ms  {mfu:.1f}% MFU(fwd+bwd)",
                      flush=True)
                continue
            def make(k, fn=fn):
                @jax.jit
                def run(xr, w1, scale, shift, w2):
                    def body(c, _):
                        y = fn(xr + (c * 1e-12).astype(dt), w1, scale,
                               shift, w2)
                        return jnp.sum(jnp.abs(y.astype(jnp.float32))
                                       ) * 1e-9, None
                    c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
                    return c
                return lambda: float(run(xr, w1, scale, shift, w2))

            dtm = scan_time(make, k_lo, k_hi)
            mfu = 100 * flops / dtm / V5E_PEAK_FLOPS
            key = f"s{s}c{c_in}_{name}"
            results[key + "_ms"] = round(dtm * 1e3, 3)
            results[key + "_mfu_pct"] = round(mfu, 1)
            print(f"S={s} C_in={c_in} C_mid={c_mid} {name}: "
                  f"{dtm*1e3:.3f} ms  {mfu:.1f}% MFU", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
