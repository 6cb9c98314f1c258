"""Evaluation CLI - the working form of the legacy main.py capabilities:
masked L1/berHu metrics, best.txt tracking, jet-colormap comparison grids
(main.py:202-375, utils.py:71-117).

Usage:
    python -m md_rdm_tpu.cli.evaluate --checkpoint result/checkpoints \
        --dataset synthetic --num_images 8 --grid_out comparison.png
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_parser():
    p = argparse.ArgumentParser("Evaluate a depth model checkpoint")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="CheckpointManager directory")
    p.add_argument("--dataset", default="synthetic",
                   choices=("nyu", "kitti", "floorplan3d", "structured3d",
                            "synthetic"))
    p.add_argument("--dataset_type", default="labeled")
    p.add_argument("--data_path", type=str, default=None)
    p.add_argument("--split", default="val", choices=("val", "test"))
    p.add_argument("--metrics", nargs="+",
                   default=["delta1", "delta2", "delta3", "mse", "mae",
                            "log10", "rmse", "absrel", "berhu"],
                   help="Metric names; 'mae' is the masked-L1 criterion "
                        "(criteria.MaskedL1Loss), 'berhu' the legacy "
                        "berHuLoss (main.py:169)")
    p.add_argument("--num_images", type=int, default=-1)
    p.add_argument("--val_samples", type=int, default=0,
                   help="Draw N samples with replacement (uniform weights) "
                        "instead of streaming the split in order - the "
                        "WeightedRandomSampler role (main.py:83-85)")
    p.add_argument("--batch_size", type=int, default=1,
                   help="Eval batch size (the reference evaluates at 1; "
                        "larger batches amortize dispatch)")
    p.add_argument("--grid_out", type=str, default=None,
                   help="Write a comparison image grid (every len/9 samples)")
    p.add_argument("--best_txt", type=str, default=None,
                   help="Write/update a best.txt with the results")
    p.add_argument("--decoders", type=int, nargs="+", default=[1])
    p.add_argument("--linear_metrics", action="store_true",
                   help="Score exp(final) instead of the log-space map "
                        "(match a --linear_metrics training run)")
    p.add_argument("--platform", type=str, default=None,
                   choices=("cpu", "tpu"), help="Force jax backend")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.best_txt and "rms" not in args.metrics:
        args.metrics.append("rms")   # best.txt ranks by standard RMSE

    from md_rdm_tpu.core.platform import (enable_compile_cache,
                                           select_platform)
    select_platform(args.platform)
    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from md_rdm_tpu.core.config import Config, ModelConfig, TrainConfig
    from md_rdm_tpu.data.base import DataLoader
    from md_rdm_tpu.metrics import MetricAccumulator, compute_metrics
    from md_rdm_tpu.ops.geometry import normalize_gm
    from md_rdm_tpu.ops.resize import resize_bicubic
    from md_rdm_tpu.training.checkpoint import CheckpointManager
    from md_rdm_tpu.training.module import DepthTrainer, mask_target
    from md_rdm_tpu.training.optim import make_optimizer
    from md_rdm_tpu.utils import viz

    config = Config(model=ModelConfig(decoder_ids=tuple(args.decoders)),
                    train=TrainConfig(metrics=tuple(args.metrics)))
    module = DepthTrainer(config)

    if args.dataset == "synthetic":
        from md_rdm_tpu.data.synthetic import SyntheticDepthDataset
        n = args.num_images if args.num_images > 0 else 8
        # correlated: rgb rendered from depth, matching the train CLI's
        # synthetic sets (uncorrelated rgb would score a trained model
        # as if untrained).  Seed is split-derived: val matches
        # cli/train.py's val split (seed 1); test gets distinct samples
        # (seed 2) so --split test doesn't silently re-score validation.
        ds = SyntheticDepthDataset(args.split, size=n,
                                   seed={"val": 1, "test": 2}[args.split],
                                   correlated=True, cache=True)
    elif args.dataset == "nyu":
        from md_rdm_tpu.data.nyu import NYUDataset
        ds = NYUDataset(args.data_path, dataset_type=args.dataset_type,
                        split=args.split, output_size=(226, 226),
                        n_images=args.num_images)
    elif args.dataset == "kitti":
        from md_rdm_tpu.data.kitti import KITTIDataset
        ds = KITTIDataset(args.data_path, args.split)
    elif args.dataset == "floorplan3d":
        from md_rdm_tpu.data.floorplan3d import Floorplan3DDataset
        ds = Floorplan3DDataset(args.data_path, args.dataset_type, args.split)
    else:
        from md_rdm_tpu.data.structured3d import Structured3DDataset
        ds = Structured3DDataset(args.data_path, split=args.split)

    if args.val_samples:
        loader = DataLoader(ds, args.batch_size,
                            sample_weights=np.ones(len(ds)),
                            num_samples=args.val_samples)
    else:
        loader = DataLoader(ds, args.batch_size, shuffle=False)

    tx = make_optimizer(config.train.learning_rate)
    x0, _ = ds[0]
    sample = jnp.asarray(np.asarray(x0, np.float32)[None])
    state = module.init(jax.random.PRNGKey(0), tx, sample)
    mgr = CheckpointManager(args.checkpoint, monitor=config.train.monitor)
    # eval-side restore: model sub-trees only, so checkpoints written by
    # param-group (fast_modules) runs restore regardless of optimizer shape
    step, state = mgr.restore_eval(jax.device_get(state))
    print(f"restored checkpoint step {step}")

    predict = jax.jit(module.predict_step)
    space = "linear" if args.linear_metrics else "faithful"

    def _metric_pred(p):
        return jnp.exp(p) if space == "linear" else p

    eval_metrics = jax.jit(
        lambda p, t: compute_metrics(_metric_pred(p), t,
                                     tuple(args.metrics), per_sample=True))

    acc = MetricAccumulator(args.metrics)
    grid = None
    grid_every = max(len(ds) // 9, 1)
    for i, (x, y) in enumerate(loader):
        xd = jnp.asarray(x)
        yd = mask_target(resize_bicubic(jnp.asarray(y), 128))
        pred = predict(state, xd)
        logs = jax.device_get(eval_metrics(pred, normalize_gm(yd)))
        # per-sample accumulation: every image counts once regardless of
        # batch size (the reference's batch-1 validation semantics)
        acc.update_per_sample(logs, x.shape[0])
        if args.grid_out and (i * args.batch_size) % grid_every == 0:
            row = viz.merge_into_row(
                np.asarray(x[0]),
                np.asarray(normalize_gm(yd))[0, 0],
                np.asarray(pred)[0, 0])
            grid = row if grid is None else viz.add_row(grid, row)

    avgs = acc.averages()
    line = "  ".join(f"{k}={v:.4f}" for k, v in avgs.items())
    print(f"eval[{args.dataset}/{args.split}] n={len(ds)}: {line}")

    if args.grid_out and grid is not None:
        viz.save_image(grid, args.grid_out)
        print(f"wrote {args.grid_out}")
    if args.best_txt:
        # rank by STANDARD root-mean-square error (the legacy loop tracked
        # best by true RMSE, main.py:206-230) - the faithful nonstandard
        # 'rmse' metric stays in the table but never drives selection
        best_path = Path(args.best_txt)
        prev_best = None
        if best_path.exists():
            for tok in best_path.read_text().split():
                if tok.startswith("rms="):
                    prev_best = float(tok.split("=")[1])
        cur = avgs.get("rms", avgs.get("mse", 0.0))
        if prev_best is None or cur < prev_best:
            best_path.write_text(f"step={step} {line}\n")
            print(f"updated {best_path}")
    mgr.close()
    return avgs


if __name__ == "__main__":
    main()
