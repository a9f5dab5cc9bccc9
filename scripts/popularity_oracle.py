"""Retrieval oracles for the synthetic catalogs: popularity baseline +
(for the v2 "markov" process) the generative-Bayes ceiling.

v1 ("zipf"): items iid Zipf(1) (DESIGN §10), so the static global-
popularity ranking IS the Bayes-optimal retriever — the calibration
ceiling for every learned number in `results/train_10m_objectives.json`
(DESIGN §11c finding 9). v2 ("markov", round 5): the process has real
preference + sequential structure (data/synthetic.py module docstring),
so this script reports TWO numbers:

* ``popularity``: best static ranking from empirical train counts — the
  baseline a trained model must beat for personalization to be shown;
* ``bayes`` (markov only): the exact next-item posterior from the TRUE
  process parameters (α·T[c_last] + (1−α)·pref_u over clusters × the
  two-tier within-cluster rank pmf) — the ceiling nothing can beat.

Both use the REAL eval protocol: the user's visible window is excluded
from candidates, so an in-window positive is an automatic miss, and the
served list backfills past excluded items.

    python scripts/popularity_oracle.py [--process zipf|markov]
        [--users 100000] [--items 10000000] [--seed 0] [--k 10]
        [--mode test|val] [--seq_len 50]

Prints one JSON line per oracle. No reference counterpart (the
reference has no retrieval eval at all).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def split_rows(cat, mode: str, seq_len: int):
    """(pos, window, c_last_event_idx) triples + train counts under the
    leave-one-out protocol (data/windowing.py): user kept iff
    len > min_len (>= 4 events for test, >= 3 for val)."""
    items = np.asarray(cat.items)
    offs = np.asarray(cat.offsets)
    drop = 1 if mode == "test" else 2
    min_keep = 4 if mode == "test" else 3
    cnt: Counter = Counter()
    rows = []
    for u in range(cat.n_users):
        seq = items[offs[u]: offs[u + 1]]
        if len(seq) < min_keep:
            continue
        pos = seq[-drop]
        window = seq[: len(seq) - drop][-seq_len:]
        rows.append((u, int(pos), window))
        for it in seq[:-2]:
            cnt[int(it)] += 1
    return rows, cnt


def popularity_oracle(rows, cnt, k: int, seq_len: int):
    pop = [i for i, _ in cnt.most_common(k + seq_len + 20)]
    hits = naive_hits = ndcg = 0.0
    naive_top = set(pop[:k])
    for _, pos, window in rows:
        naive_hits += pos in naive_top
        wset = set(int(x) for x in window)
        if pos in wset:
            continue  # excluded from candidates → automatic miss
        served = [i for i in pop if i not in wset][:k]
        if pos in served:
            hits += 1
            ndcg += 1.0 / np.log2(served.index(pos) + 2)
    n = len(rows)
    return hits / n, ndcg / n, naive_hits / n


def bayes_oracle(rows, proc, cat, k: int, seq_len: int, mode: str):
    """Exact posterior top-k from the true process: the test cluster is
    α·T[c_last] + (1−α)·pref_u (Markov order 1 — exact, not approximate),
    the item within it the two-tier Zipf pmf. Global top-k candidates
    live in the per-cluster top ranks (pmf is monotone in rank), so a
    [K, R] candidate grid with R = k + seq_len + 20 provably contains
    the served list even after window exclusions."""
    from carca_tpu.data.synthetic import cluster_of, markov_rank_pmf

    items = np.asarray(cat.items)
    offs = np.asarray(cat.offsets)
    bounds = proc.bounds
    K = proc.n_clusters
    R = min(k + seq_len + 20, int(np.diff(bounds).min()))
    ranks = np.arange(1, R + 1, dtype=np.float64)
    pmf = markov_rank_pmf(proc, ranks[None, :],
                          np.arange(K, dtype=np.int64)[:, None])  # [K, R]
    cand_ids = (bounds[:K, None] + ranks[None, :].astype(np.int64))  # [K, R]
    drop = 1 if mode == "test" else 2

    hits = ndcg = 0.0
    for u, pos, window in rows:
        seq = items[offs[u]: offs[u + 1]]
        c_last = int(cluster_of(int(seq[-drop - 1]), bounds))
        p_c = proc.alpha * proc.trans[c_last] + (1 - proc.alpha) * proc.pref[u]
        scores = (p_c[:, None] * pmf).ravel()
        flat_ids = cand_ids.ravel()
        wset = set(int(x) for x in window)
        if pos in wset:
            continue  # protocol: automatic miss
        top = np.argpartition(-scores, min(k + len(wset), scores.size - 1))
        served = []
        for j in top[: k + len(wset) + 1][np.argsort(
                -scores[top[: k + len(wset) + 1]])]:
            i = int(flat_ids[j])
            if i not in wset:
                served.append(i)
                if len(served) == k:
                    break
        if pos in served:
            hits += 1
            ndcg += 1.0 / np.log2(served.index(pos) + 2)
    n = len(rows)
    return hits / n, ndcg / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process", default="zipf", choices=("zipf", "markov"))
    ap.add_argument("--users", type=int, default=100_000)
    ap.add_argument("--items", type=int, default=10_000_000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="test", choices=("test", "val"))
    ap.add_argument("--seq_len", type=int, default=50,
                    help="visible-window length (the model's seq_len)")
    ap.add_argument("--host_catalog", action="store_true",
                    help="use the numpy generator (tests); default is the "
                         "device generator, which is what the 10M preset "
                         "trains on")
    args = ap.parse_args()

    from carca_tpu.data.synthetic import (markov_process,
                                          synthetic_catalog,
                                          synthetic_catalog_device,
                                          synthetic_catalog_markov,
                                          synthetic_catalog_markov_device)

    proc = None
    if args.process == "markov":
        proc = markov_process(args.users, args.items, seed=args.seed)
        gen = (synthetic_catalog_markov if args.host_catalog
               else synthetic_catalog_markov_device)
        cat = gen(n_users=args.users, n_real_items=args.items,
                  seed=args.seed, proc=proc)
    else:
        gen = (synthetic_catalog if args.host_catalog
               else synthetic_catalog_device)
        cat = gen(n_users=args.users, n_real_items=args.items,
                  seed=args.seed)

    rows, cnt = split_rows(cat, args.mode, args.seq_len)
    hr, ndcg, naive = popularity_oracle(rows, cnt, args.k, args.seq_len)
    print(json.dumps({
        "metric": f"popularity_oracle_{args.process}_{args.mode}_hr{args.k}",
        "value": round(hr, 4),
        "ndcg": round(ndcg, 4),
        "protocol_naive_value": round(naive, 4),
        "users": len(rows),
        "distinct_train_items": len(cnt),
        "note": ("Bayes ceiling for the iid-Zipf task (DESIGN 11c finding "
                 "9)" if args.process == "zipf" else
                 "static-popularity BASELINE for the markov task — a "
                 "trained model must beat this for personalization to "
                 "be demonstrated"),
    }), flush=True)

    if args.process == "markov":
        bhr, bndcg = bayes_oracle(rows, proc, cat, args.k, args.seq_len,
                                  args.mode)
        print(json.dumps({
            "metric": f"bayes_oracle_markov_{args.mode}_hr{args.k}",
            "value": round(bhr, 4),
            "ndcg": round(bndcg, 4),
            "users": len(rows),
            "vs_popularity": round(bhr / max(hr, 1e-9), 2),
            "note": ("generative-model ceiling: exact next-item posterior "
                     "from the true process parameters under the window-"
                     "exclusion protocol"),
        }), flush=True)


if __name__ == "__main__":
    main()
