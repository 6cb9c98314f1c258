#!/bin/sh
# Reproduce every round-2 PERF.md number (single TPU v5e chip).
# Each command prints its own results; persistent compile cache makes
# repeat runs fast.  Run ONE at a time (the relay serializes compiles).
set -x

# honest-clock calibration + forward f32/bf16 + train f32/bf16 (batch 16)
python tools/true_bench.py --sections calib fwd train

# optimal decoder set (1,6,7,8,9): f32 + bf16 train step, forward
python tools/true_bench.py --sections train_opt train_opt_bf16 fwd_opt

# Pallas vs XLA comparison+quantize in-graph (d1+d9)
python tools/true_bench.py --sections pallas

# remat on/off at batch 64 bf16
python tools/true_bench.py --sections remat --k 8

# driver headline (bf16 primary + f32 alongside)
python bench.py

# learning dynamics (results/round2/*.jsonl):
python -m md_rdm_tpu.cli.train --dataset synthetic --synthetic_size 128 \
  --batch_size 8 --max_epochs 15 --seed 0 --precision 32 --workdir /tmp/r_faithful
python -m md_rdm_tpu.cli.train --dataset synthetic --synthetic_size 128 \
  --batch_size 8 --max_epochs 15 --seed 0 --precision 32 \
  --soft_decode --linear_metrics --workdir /tmp/r_soft
python -m md_rdm_tpu.cli.train --dataset synthetic --synthetic_size 128 \
  --batch_size 8 --max_epochs 4 --seed 0 --soft_decode --linear_metrics \
  --augment device --workdir /tmp/r_devaug

# torch-CPU reference baseline
python tools/baseline_torch.py --batch 16

# multi-chip dryrun (8-device virtual CPU mesh)
python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"
