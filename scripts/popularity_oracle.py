"""Popularity-oracle retrieval baseline for a synthetic catalog.

The synthetic generator draws items iid from Zipf(1) (DESIGN §10), so a
static global-popularity ranking is the Bayes-optimal retriever for the
leave-one-out task — the calibration ceiling for every learned number in
`results/train_10m_objectives.json` (DESIGN §11c finding 9). This script
reproduces that ceiling under the REAL eval protocol: the user's visible
window is excluded from candidates, so an in-window positive is an
automatic miss, and the served list backfills past excluded items.

    python scripts/popularity_oracle.py [--users 100000] [--items 10000000]
        [--seed 0] [--k 10] [--mode test|val] [--seq_len 50]

Prints one JSON line. No reference counterpart (the reference has no
retrieval eval at all).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=10_000_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="test", choices=("test", "val"))
    ap.add_argument("--seq_len", type=int, default=50,
                    help="visible-window length (the model's seq_len)")
    args = ap.parse_args()

    from carca_tpu.data.synthetic import synthetic_catalog_device

    cat = synthetic_catalog_device(n_users=args.users,
                                   n_real_items=args.items, seed=args.seed)
    items = np.asarray(cat.items)
    offs = np.asarray(cat.offsets)

    # leave-one-out split (data/windowing.py contract): last event = test
    # positive, second-last = val; popularity counted over train events
    cnt: Counter = Counter()
    rows = []
    drop = 1 if args.mode == "test" else 2
    # user filter matches the real protocol exactly: window_bounds keeps a
    # user iff len > min_len, i.e. >= 4 events for test, >= 3 for val
    # (data/windowing.py _N_EXCLUDED) — shorter users the learned eval
    # excludes must not enter the oracle's denominator or counts
    # (advisor, round 4)
    min_keep = 4 if args.mode == "test" else 3
    for u in range(cat.n_users):
        seq = items[offs[u]: offs[u + 1]]
        if len(seq) < min_keep:
            continue
        pos = seq[-drop]
        window = seq[: len(seq) - drop][-args.seq_len:]
        rows.append((int(pos), set(int(x) for x in window)))
        for it in seq[:-2]:
            cnt[int(it)] += 1

    # enough popular candidates to backfill past any excluded window
    pop = [i for i, _ in cnt.most_common(args.k + args.seq_len + 20)]
    hits = naive_hits = 0
    naive_top = set(pop[: args.k])
    for pos, window in rows:
        naive_hits += pos in naive_top
        if pos in window:
            continue  # excluded from candidates → automatic miss
        served = [i for i in pop if i not in window][: args.k]
        hits += pos in served

    print(json.dumps({
        "metric": f"popularity_oracle_{args.mode}_hr{args.k}",
        "value": round(hits / len(rows), 4),
        "protocol_naive_value": round(naive_hits / len(rows), 4),
        "users": len(rows),
        "distinct_train_items": len(cnt),
        "note": ("Bayes ceiling for the iid-Zipf synthetic retrieval task "
                 "under the window-exclusion protocol (DESIGN 11c "
                 "finding 9)"),
    }))


if __name__ == "__main__":
    main()
