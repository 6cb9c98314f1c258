"""Honest device-throughput measurement through the remote-TPU relay.

The axon relay's ``block_until_ready`` acknowledges dispatch without
waiting for device execution: an 8192^3 bf16 matmul (1.1 TFLOP, >= 5.6 ms
at the 197 TFLOP/s v5e peak) "completes" in 0.04 ms by that clock - a
physically impossible 31 PFLOP/s.  Only fetching result bytes forces a
real sync, and each fetch pays a relay round trip.

Methodology here: run K iterations of the workload INSIDE one jit via
``lax.scan`` (loop-carried dependency so XLA cannot hoist or elide the
body), fetch one scalar, and difference two K values:

    time_per_iter = (T(k_hi) - T(k_lo)) / (k_hi - k_lo)

which cancels dispatch latency, scalar-fetch round trip, and any constant
relay overhead.  Reports per-iter time, images/sec, and MFU from XLA's
cost model (validated exact on the calibration matmul).

Cost-model caveat: "bytes accessed" sums logical per-op accesses and is
blind to fusion, so derived HBM-bandwidth percentages are UPPER BOUNDS on
real traffic (the f32 train step's logical bytes would imply 110% of the
physical peak).  FLOP counts have no such issue.

Usage: python tools/true_bench.py [--batch 16] [--k 16] [--sections ...]
"""
from __future__ import annotations

import argparse
import json
import time

V5E_PEAK_FLOPS = 197e12
V5E_PEAK_BYTES = 819e9


def scan_time(make_scan, k_lo, k_hi, repeats=3):
    """Median of (T(k_hi)-T(k_lo))/(k_hi-k_lo) over repeats."""
    times = {}
    for k in (k_lo, k_hi):
        fn = make_scan(k)
        fn()                                   # compile + warm
        best = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn()
            best.append(time.perf_counter() - t0)
        times[k] = min(best)
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)


def dyn_scan_time(run, k_lo, k_hi, repeats=3):
    """Like scan_time, but ``run(k)`` executes ONE compiled program whose
    trip count k is a dynamic argument (lax.fori_loop / while_loop), so the
    k_lo and k_hi timings share a single compile - halves the compile
    surface vs the static-scan variant (bench budget, VERDICT r3 #1)."""
    import sys
    t0 = time.perf_counter()
    run(k_hi)                                  # compile + warm
    print(f"  [true_bench] compile+warm done in "
          f"{time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
    times = {}
    for k in (k_lo, k_hi):
        best = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run(k)
            best.append(time.perf_counter() - t0)
        times[k] = min(best)
    return (times[k_hi] - times[k_lo]) / (k_hi - k_lo)


def _setup():
    import os
    import sys
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.join(repo, ".jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    # Register the host CPU backend NEXT TO the pinned axon TPU backend
    # (axon stays the default): model/optimizer init then compiles on the
    # host instead of paying a 10-20 min cold relay compile just to draw
    # initial weights (the round-3/round-4 bench timeouts died in init).
    if os.environ.get("JAX_PLATFORMS") == "axon":
        try:
            jax.config.update("jax_platforms", "axon,cpu")
        except Exception:
            pass


def _init_on_cpu(thunk):
    """Run an init thunk on the host CPU backend when available (relay
    independence - see _setup); falls back to the default device."""
    import jax
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return thunk()
    with jax.default_device(cpu):
        return thunk()


def cost_of(jitted, *a):
    """(flops, bytes accessed) from XLA's cost model."""
    try:
        ca = jitted.lower(*a).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return (float(ca.get("flops", 0.0)),
                float(ca.get("bytes accessed", 0.0)))
    except Exception:
        return 0.0, 0.0


def flops_of(jitted, *a):
    return cost_of(jitted, *a)[0]


def measure_forward(batch: int = 16, k_lo: int = 4, k_hi: int = 16,
                    dtype: str = "float32", decoder_ids=(1,),
                    fused: str = "auto", growth: str = "auto",
                    flat: str = "off", flops: bool = True, on_dt=None):
    """(seconds per forward, flops per forward) for the given decoder set.

    K forwards run inside ONE jit via ``lax.fori_loop`` with a *dynamic*
    trip count (loop-carried operand so XLA cannot elide the body); the two
    K values share a single compiled program, and differencing them cancels
    dispatch/fetch overhead exactly as the static-scan variant did."""
    import sys
    _setup()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from md_rdm_tpu.core.config import ModelConfig
    from md_rdm_tpu.models.rdm import DepthEstimationNet
    from md_rdm_tpu.ops.decompose import recombination

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 226, 226, 3)), jnp.float32)
    model = DepthEstimationNet(
        ModelConfig(decoder_ids=tuple(decoder_ids), compute_dtype=dtype,
                    fused_dense=fused, growth_matmul=growth,
                    flat_block=flat))
    print(f"  [true_bench] init model (dtype={dtype} fused={fused})",
          file=sys.stderr, flush=True)
    # Init on the host CPU: the fused and unfused graphs register
    # identical params/variables by construction (_Kernel/_FoldedNorm,
    # models/densenet.py), so drawing weights from the fused_dense="off"
    # graph avoids lowering Pallas TPU kernels on the CPU backend.
    init_model = DepthEstimationNet(
        ModelConfig(decoder_ids=tuple(decoder_ids), compute_dtype=dtype,
                    fused_dense="off"))
    x1 = np.asarray(rng.random((1, 226, 226, 3)), np.float32)
    t0 = time.perf_counter()
    variables = _init_on_cpu(
        lambda: init_model.init(jax.random.PRNGKey(0), x1, train=False))
    variables = jax.device_put(variables, jax.devices()[0])
    print(f"  [true_bench] init done in {time.perf_counter() - t0:.1f}s",
          file=sys.stderr, flush=True)

    @jax.jit
    def run(v, x, k):
        def body(i, c):
            yhat, d, _p = model.apply(v, x + c * 1e-12, train=False)
            f = recombination(list(yhat))
            return jnp.sum(f) * 1e-9
        return jax.lax.fori_loop(0, k, body, jnp.float32(0))

    dt = dyn_scan_time(lambda k: float(run(variables, x, jnp.int32(k))),
                       k_lo, k_hi)
    if on_dt is not None:
        on_dt(dt)

    fl = 0.0
    if flops:
        @jax.jit
        def fwd1(v, x):
            yhat, d, _p = model.apply(v, x, train=False)
            return recombination(list(yhat))

        fl = flops_of(fwd1, variables, x)
        if fl:
            fl += _hidden_flops(fused, batch, flat=flat)
            fl -= _growth_inflation(growth, fused, batch, flat=flat)
    return dt, fl


def _hidden_flops(fused: str, batch: int, train: bool = False,
                  bwd: bool = False, flat: str = "off") -> int:
    """Flops inside Pallas sandwich calls, invisible to cost_analysis."""
    from md_rdm_tpu.kernels.dense_sandwich import fused_hidden_flops
    from md_rdm_tpu.models.densenet import resolve_flat, resolve_fused
    mode = resolve_fused(fused)
    fm = resolve_flat(flat, mode)
    if mode in ("on", "on_all", "on_all_bwd") or fm != "off":
        return fused_hidden_flops(batch, mode=mode, train=train, bwd=bwd,
                                  flat=fm)
    return 0


def _growth_inflation(growth: str, fused: str, batch: int,
                      train: bool = False, flat: str = "off") -> int:
    """Lane-pad flop inflation of the matmul growth conv, subtracted so
    MFU reports algorithmic conv flops (kernels/growth_conv.py)."""
    from md_rdm_tpu.kernels.growth_conv import growth_flop_inflation
    from md_rdm_tpu.models.densenet import resolve_flat, resolve_fused
    gm = resolve_fused(growth)
    fu = resolve_fused(fused)
    if gm in ("on", "on_all"):
        return growth_flop_inflation(batch, mode=gm, fused=fu,
                                     train=train,
                                     flat=resolve_flat(flat, fu))
    return 0


def forward_json(batch: int, k_lo: int, k_hi: int, dtype: str,
                 fused: str, growth: str = "auto",
                 flat: str = "off") -> None:
    """Single-dtype forward measurement for the bench.py orchestrator.

    Prints PROGRESSIVE JSON lines to stdout (each a superset of the last):
    first the timing-only result as soon as dt exists, then the
    flops-enriched one.  If the parent kills this process mid-flops (budget
    exceeded), the timing line already printed is still parseable."""
    out = {"dtype": dtype, "fused": fused, "growth": growth,
           "flat": flat, "batch": batch}

    def on_dt(dt):
        out.update(dt_s=dt, img_per_s=batch / dt)
        print(json.dumps(out), flush=True)

    dt, fl = measure_forward(batch, k_lo, k_hi, dtype, fused=fused,
                             growth=growth, flat=flat, flops=True,
                             on_dt=on_dt)
    if fl:
        out["flops"] = fl
        out["mfu_pct"] = round(100 * fl / dt / V5E_PEAK_FLOPS, 2)
        out["gflops_per_image"] = round(fl / batch / 1e9, 1)
    print(json.dumps(out), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--forward_json", default=None,
                    choices=("bfloat16", "float32"),
                    help="stage mode for bench.py: measure one dtype's "
                         "forward, print progressive JSON lines, exit")
    ap.add_argument("--sections", nargs="*",
                    default=["calib", "fwd", "train", "train_opt"],
                    choices=["calib", "fwd", "train", "train_opt",
                             "pallas", "remat", "train_opt_bf16", "fwd_opt"])
    ap.add_argument("--fused", default="auto",
                    choices=("auto", "on", "on_all", "on_all_bwd", "off",
                             "interpret"),
                    help="ModelConfig.fused_dense for every section")
    ap.add_argument("--growth", default="auto",
                    choices=("auto", "on", "on_all", "off"),
                    help="ModelConfig.growth_matmul for every section")
    ap.add_argument("--flat", default="off",
                    choices=("auto", "on", "on_all", "off", "interpret"),
                    help="ModelConfig.flat_block for every section")
    args = ap.parse_args()

    if args.forward_json:
        forward_json(args.batch, max(args.k // 4, 1), args.k,
                     args.forward_json, args.fused, args.growth,
                     args.flat)
        return

    _setup()
    import numpy as np
    import jax
    import jax.numpy as jnp

    from md_rdm_tpu.core.config import Config, ModelConfig, TrainConfig
    from md_rdm_tpu.models.rdm import DepthEstimationNet
    from md_rdm_tpu.ops.decompose import recombination
    from md_rdm_tpu.training.module import DepthTrainer
    from md_rdm_tpu.training.optim import make_optimizer

    b = args.batch
    k_lo, k_hi = max(args.k // 4, 1), args.k
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((b, 226, 226, 3)), jnp.float32)
    y = jnp.asarray(rng.random((b, 1, 226, 226)) * 9 + 0.5, jnp.float32)
    dev = jax.devices()[0]
    results = {}

    def record(name, value):
        results[name] = value
        print(f"{name}: {value}", flush=True)

    if "calib" in args.sections:
        n = 8192
        A = jnp.asarray(rng.random((n, n)), jnp.bfloat16)
        B = jnp.asarray(rng.random((n, n)), jnp.bfloat16)

        def make(k):
            @jax.jit
            def run(A, B):
                def body(c, _):
                    # carry feeds the operand (sequential, non-hoistable);
                    # sum-of-abs consumes every output element and cannot
                    # be algebraically reduced (sum(A@B) can; [0,0] can)
                    p = (A + c * 1e-9) @ B
                    c2 = jnp.sum(jnp.abs(p.astype(jnp.float32))) * 1e-12
                    return c2, None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=k)
                return c
            return lambda: float(run(A, B))

        dt = scan_time(make, k_lo, k_hi)
        tf = 2 * n**3 / dt / 1e12
        record("calib_matmul_ms", round(dt * 1e3, 3))
        record("calib_matmul_tflops", round(tf, 1))
        assert tf < 197.01, "calibration exceeds physical peak - sync broken"

    if "fwd" in args.sections:
        for dtype in ("float32", "bfloat16"):
            dt, fl = measure_forward(b, k_lo, k_hi, dtype, fused=args.fused)
            tag = {"float32": "forward", "bfloat16": "forward_bf16"}[dtype]
            record(f"{tag}_ms", round(dt * 1e3, 3))
            record(f"{tag}_img_per_s", round(b / dt, 1))
            if fl:
                record(f"{tag}_gflops", round(fl / 1e9, 1))
                record(f"{tag}_mfu_pct",
                       round(100 * fl / dt / V5E_PEAK_FLOPS, 1))

    def bench_train(tag, decoder_ids, dtype="float32", remat=True,
                    batch=None):
        bb = batch or b
        xx_ = x if bb == b else jnp.asarray(
            rng.random((bb, 226, 226, 3)), jnp.float32)
        yy_ = y if bb == b else jnp.asarray(
            rng.random((bb, 1, 226, 226)) * 9 + 0.5, jnp.float32)
        cfg = Config(model=ModelConfig(decoder_ids=decoder_ids,
                                       compute_dtype=dtype, remat=remat,
                                       fused_dense=args.fused,
                                       growth_matmul=args.growth,
                                       flat_block=args.flat),
                     train=TrainConfig(metrics=("delta1", "mse")))
        module = DepthTrainer(cfg)
        tx = make_optimizer(1e-4)
        # init on host CPU (identical param structure, see measure_forward)
        init_module = DepthTrainer(Config(
            model=ModelConfig(decoder_ids=decoder_ids, compute_dtype=dtype,
                              remat=remat, fused_dense="off"),
            train=TrainConfig(metrics=("delta1", "mse"))))
        x1 = np.asarray(jax.device_get(xx_[:1]))
        state0 = jax.device_put(_init_on_cpu(
            lambda: init_module.init(jax.random.PRNGKey(0), tx, x1)), dev)

        def make(k):
            @jax.jit
            def run(state, x, y):
                def body(st, _):
                    st, logs = module.train_step(st, tx, x, y)
                    return st, None
                st, _ = jax.lax.scan(body, state, None, length=k)
                return st.step, jnp.sum(
                    jax.tree_util.tree_leaves(st.params)[0])
            return lambda: jax.device_get(run(state0, xx_, yy_))

        dt = scan_time(make, k_lo, k_hi)
        record(f"{tag}_ms", round(dt * 1e3, 2))
        record(f"{tag}_img_per_s", round(bb / dt, 1))

        step1 = jax.jit(lambda s, xx, yy: module.train_step(s, tx, xx, yy))
        fl, byt = cost_of(step1, state0, xx_, yy_)
        if fl:
            # hidden Pallas flops in the train step: fused_hidden_flops
            # counts the remat backward's forward replay (x2) for layers
            # whose fwd routes but bwd doesn't, and a single forward for
            # bwd-routed layers (HLO inspection, round 3: the custom_vjp
            # residuals are the layer inputs, so XLA DCEs their replay),
            # plus one bwd program per bwd-routed layer.
            fl += _hidden_flops(args.fused, bb, train=True,
                                flat=args.flat)
            fl += _hidden_flops(args.fused, bb, train=True, bwd=True,
                                flat=args.flat)
            fl -= _growth_inflation(args.growth, args.fused, bb,
                                    train=True, flat=args.flat)
        if fl:
            record(f"{tag}_gflops", round(fl / 1e9, 1))
            record(f"{tag}_mfu_pct", round(100 * fl / dt / V5E_PEAK_FLOPS, 1))
        if byt:
            record(f"{tag}_gbytes", round(byt / 1e9, 2))
            record(f"{tag}_hbm_pct", round(100 * byt / dt / V5E_PEAK_BYTES, 1))

    if "train" in args.sections:
        bench_train("train_step", (1,))
        bench_train("train_step_bf16", (1,), dtype="bfloat16")
    if "train_opt" in args.sections:
        bench_train("train_step_opt_set", (1, 6, 7, 8, 9))
    if "train_opt_bf16" in args.sections:
        bench_train("train_step_opt_set_bf16", (1, 6, 7, 8, 9),
                    dtype="bfloat16")
    if "fwd_opt" in args.sections:
        dt, fl = measure_forward(b, k_lo, k_hi,
                                 decoder_ids=(1, 6, 7, 8, 9),
                                 fused=args.fused)
        record("forward_opt_set_ms", round(dt * 1e3, 3))
        record("forward_opt_set_img_per_s", round(b / dt, 1))
        if fl:
            record("forward_opt_set_gflops", round(fl / 1e9, 1))
            record("forward_opt_set_mfu_pct",
                   round(100 * fl / dt / V5E_PEAK_FLOPS, 1))
    if "remat" in args.sections:
        # round-1 claimed remat FASTER at batch 64 (dispatch clock);
        # re-measure honestly in the bf16 training configuration
        bench_train("train_b64_remat", (1,), dtype="bfloat16", batch=64)
        bench_train("train_b64_noremat", (1,), dtype="bfloat16",
                    remat=False, batch=64)

    if "pallas" in args.sections:
        # paged relative path (d1+d9, 16 tiles/img through comparison+
        # quantize): fused Pallas kernel vs the XLA formulation, in-graph
        for mode in ("on", "off"):
            model9 = DepthEstimationNet(
                ModelConfig(decoder_ids=(1, 9), pallas_lloyd=mode))
            v9 = jax.device_put(
                model9.init(jax.random.PRNGKey(0), x[:1], train=False), dev)

            def make(k, model9=model9, v9=v9):
                @jax.jit
                def run(v, x):
                    def body(c, _):
                        yhat, d, _p = model9.apply(
                            v, x + c * 1e-12, train=False)
                        f = recombination(list(yhat))
                        return jnp.sum(f) * 1e-9, None
                    c, _ = jax.lax.scan(body, jnp.float32(0), None,
                                        length=k)
                    return c
                return lambda: float(run(v9, x))

            dt = scan_time(make, k_lo, k_hi)
            record(f"forward_d1d9_pallas_{mode}_ms", round(dt * 1e3, 2))

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
