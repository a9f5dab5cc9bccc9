#!/bin/bash
# Round-5 EMA A/B on the v2 "markov" task at 1M items / 20k users.
# Question: does --ema_decay smooth the violent post-peak drift
# (DESIGN 11e finding 11) enough to change what retention serves?
# Control = the production recipe; treatment = + --ema_decay 0.99
# (EMA horizon ~100 steps ~= 1.3 epochs at this scale: within-run
# smoothing without lagging whole epochs). Sequential: one chip.
set -u
cd "$(dirname "$0")/.."

BASE="--preset synthetic10m --synthetic_process markov
      --synthetic_users 20000 --synthetic_items 1000000
      --loss softmax --n_train_negatives 8 --neg_distribution popularity
      --select_by retrieval_hr --eval_retrieval_every 1
      --epochs 8 --early_stop 20 --resume false"

run() {
  name=$1; shift
  out=/tmp/r5ema_$name
  echo "=== $(date +%H:%M:%S) $name: $* ==="
  timeout 3600 python -m carca_tpu.cli $BASE --out_dir "$out" "$@" \
    > "$out.log" 2>&1
  echo "    rc=$? $(date +%H:%M:%S)"
  timeout 1200 python scripts/eval_retrieval_offline.py "$out" \
    --which best >> "$out.offline.jsonl" 2>> "$out.offline.err"
}

run control
run ema99 --ema_decay 0.99
echo "=== ema A/B done $(date +%H:%M:%S) ==="
