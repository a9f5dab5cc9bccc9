#!/bin/bash
# Round-5 v2 grid extensions: the core grid showed the recipe peaks at
# epoch 1 (val 0.0710 = 4.1x popularity baseline) then collapses to 0.001
# by ep10 — far more aggressive drift than v1 (DESIGN §11c finding 7).
# These runs probe how much of the 0.115 Bayes ceiling is reachable:
#   * cosine LR decay (softened the v1 drift; here the peak may move later)
#   * lower base LR (1e-3 may simply overshoot on the sparse 10M tables)
#   * K=32 popularity (v2 is not saturated — more negatives may add signal)
# Sequential: one chip. Collect with scripts/collect_objectives_v2.py.
set -u
cd "$(dirname "$0")/.."

BASE="--preset synthetic10m --synthetic_process markov --epochs 10
      --early_stop 20 --eval_retrieval_every 1 --resume false"
RECIPE="--loss softmax --n_train_negatives 8 --neg_distribution popularity
        --select_by retrieval_hr"

run() {
  name=$1; shift
  out=/tmp/r5v2_$name
  echo "=== $(date +%H:%M:%S) $name: $* ==="
  timeout 10800 python -m carca_tpu.cli $BASE --out_dir "$out" "$@" \
    > "$out.log" 2>&1
  echo "    rc=$? $(date +%H:%M:%S)"
  for which in best latest; do
    timeout 2400 python scripts/eval_retrieval_offline.py "$out" \
      --which $which >> "$out.offline.jsonl" 2>> "$out.offline.err"
  done
}

run sm_k8_pop_cos $RECIPE --lr_schedule cosine
run sm_k8_pop_lr3e4 $RECIPE --lr 3e-4
run sm_k32_pop $RECIPE --n_train_negatives 32
# Retry: the core-grid uni_sel run hung >72 min in the post-epoch-1
# orbax 'latest' save D2H (killed; best/ep1 offline row salvaged).
run sm_k8_uni_sel --loss softmax --n_train_negatives 8 \
    --select_by retrieval_hr
echo "=== ext done $(date +%H:%M:%S) ==="
