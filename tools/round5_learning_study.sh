#!/bin/bash
# Round-5 optimal-set learning study (VERDICT r4 next #1).
# Serial TPU runs; one compiled graph serves every variant (fusion_init and
# the fast-LR multiplier are runtime values, not graph structure).
# Baseline to beat: d1-only soft-decode/linear val_delta1 0.8765 (round 2).
set -u
cd /root/repo
mkdir -p results/round5

COMMON="--dataset synthetic --synthetic_size 128 --decoders 1 6 7 8 9 \
  --precision 32 --soft_decode --linear_metrics --fusion_eps 1e-2 \
  --plateau_patience 8 --batch_size 8 --max_epochs 25 --seed 0 \
  --no_run_dirs --worker 2"

run() {
  name=$1; shift
  if [ -e "results/round5/$name/DONE" ]; then
    echo "== skip $name (done)"; return
  fi
  echo "== $name: start $(date +%T)"
  mkdir -p "results/round5/$name"
  timeout 5400 python -m md_rdm_tpu.cli.train $COMMON \
    --workdir "results/round5/$name" "$@" \
    > "results/round5/$name/stdout.log" 2>&1
  rc=$?
  echo "== $name: rc=$rc $(date +%T)"
  [ $rc -eq 0 ] && touch "results/round5/$name/DONE"
}

# R1: the reference's own 1x/10x recipe (main.py:156-162), faithful init
run optset_fast10 --fast_modules weight_layer --fast_lr_multiplier 10

# R2: primary init (start == d1-only, blend relatives in) + 10x
run optset_primary_fast10 --fusion_init primary \
  --fast_modules weight_layer --fast_lr_multiplier 10

# R3: faithful init, 100x fusion LR (can AdamW traverse O(1) at all?)
run optset_fast100 --fast_modules weight_layer --fast_lr_multiplier 100

# R4: normalized init + 10x
run optset_norm_fast10 --fusion_init normalized \
  --fast_modules weight_layer --fast_lr_multiplier 10

echo "study complete $(date +%T)"
