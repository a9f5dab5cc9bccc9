#!/bin/bash
# Round-5 retrieval-objective grid on the v2 "markov" 10M synthetic task
# (DESIGN §11c round-5: the v1 zipf task is saturated — finding 9 — so the
# core grid reruns on data with real preference/sequential structure, plus
# an --embedding id-vs-all ablation). Sequential: one chip.
#
#   nohup bash scripts/run_v2_objectives.sh > /tmp/r5v2_driver.log 2>&1 &
#
# Collect afterwards with scripts/collect_objectives_v2.py.
set -u
cd "$(dirname "$0")/.."

BASE="--preset synthetic10m --synthetic_process markov --epochs 10
      --early_stop 20 --eval_retrieval_every 1 --resume false"

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

# Recipe first: it carries the load-bearing claim (trained model beats the
# popularity baseline on v2), so a problem surfaces in hour 1, not hour 7.
run sm_k8_pop_sel --loss softmax --n_train_negatives 8 \
    --neg_distribution popularity --select_by retrieval_hr
run bce_k1
run sm_k8_uni_sel --loss softmax --n_train_negatives 8 \
    --select_by retrieval_hr
run sm_k8_pop_id --loss softmax --n_train_negatives 8 \
    --neg_distribution popularity --select_by retrieval_hr --embedding id
echo "=== grid done $(date +%H:%M:%S) ==="
