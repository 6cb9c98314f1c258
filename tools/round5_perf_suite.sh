#!/bin/bash
# Round-5 single-chip perf measurements, run serially once the TPU frees:
#   1. growth-conv microbench (conv vs full-lane matmul, fwd + grad)
#   2. model-level fwd/train bench: baseline vs growth vs flat vs both
#   3. input-pipeline sustained-throughput probe (VERDICT r4 #6)
# Results land in results/round5/perf/.
set -u
cd /root/repo
OUT=results/round5/perf
mkdir -p "$OUT"

log() { echo "== $1 $(date +%T)"; }

if [ ! -e "$OUT/growth_micro.json" ]; then
  log "growth microbench fwd"
  timeout 1800 python tools/bench_growth.py --dtype bfloat16 --batch 16 \
    > "$OUT/growth_micro.log" 2>&1 && \
    tail -1 "$OUT/growth_micro.log" > "$OUT/growth_micro.json"
  log "growth microbench grad"
  timeout 1800 python tools/bench_growth.py --dtype bfloat16 --batch 16 \
    --grad --shapes 29,15,8 > "$OUT/growth_micro_grad.log" 2>&1 && \
    tail -1 "$OUT/growth_micro_grad.log" > "$OUT/growth_micro_grad.json"
fi

# model-level: four bf16 configs through the honest clock.  Sections:
# fwd (eval forward) + train (train step), d1 flagship.
bench() {
  name=$1; shift
  if [ -e "$OUT/$name.json" ]; then log "skip $name"; return; fi
  log "bench $name"
  timeout 3000 python tools/true_bench.py --sections fwd train \
    --batch 16 "$@" > "$OUT/$name.log" 2>&1 && \
    tail -1 "$OUT/$name.log" > "$OUT/$name.json"
  log "bench $name done rc=$?"
}

# order: new configs first (each cold compile is 15-30 min through the
# relay); the round-4 baseline numbers exist (BENCH_r04, PERF.md), so
# the same-session base control runs only if time remains.
bench growth_bf16 --fused auto --growth on --flat off
bench flat_bf16 --fused auto --growth off --flat on
bench both_bf16 --fused auto --growth on --flat on
bench flatall_bf16 --fused auto --growth on --flat on_all
bench base_bf16 --fused auto --growth off --flat off

# input-pipeline probe: device augment, uint8 wire, synthetic, bf16 b16,
# 3 epochs - steady-state wall/step vs the device step time (from the
# train bench above) goes into PERF.md.
if [ ! -e "$OUT/pipeline/DONE" ]; then
  log "pipeline probe"
  mkdir -p "$OUT/pipeline"
  timeout 3600 python -m md_rdm_tpu.cli.train \
    --dataset synthetic --synthetic_size 512 --decoders 1 \
    --precision 16 --augment device --batch_size 16 --max_epochs 3 \
    --seed 0 --no_run_dirs --worker 6 --val_samples 16 \
    --workdir "$OUT/pipeline" > "$OUT/pipeline/stdout.log" 2>&1
  rc=$?
  log "pipeline probe rc=$rc"
  [ $rc -eq 0 ] && touch "$OUT/pipeline/DONE"
fi

log "perf suite complete"
