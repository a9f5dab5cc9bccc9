"""Offline full-catalog retrieval eval from a saved run directory.

The in-training monitor (``TrainConfig.eval_retrieval_every``) is
single-host; pod runs — and any post-hoc analysis — evaluate retrieval
from the checkpoints instead (the path ``fit`` points multi-process
users at). No reference counterpart: the reference's eval always samples
100 negatives (``src/data.py:140-192``); this ranks the held-out
positive against the full catalog (BASELINE configs[4] protocol).

    python scripts/eval_retrieval_offline.py RUN_DIR [--mode test] [--k 10]
        [--which best|latest] [--quantized] [--full_index]

Rebuilds the Config from ``RUN_DIR/args.json`` (regenerating a synthetic
catalog from its recorded seed, or reloading the data files), restores
the checkpoint, and prints one JSON line of
``retrieval_{mode}_hr/ndcg`` plus provenance.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    p = argparse.ArgumentParser()
    p.add_argument("run_dir")
    p.add_argument("--mode", default="test", choices=("val", "test"))
    p.add_argument("--k", type=int, default=0,
                   help="top-k (default: the run's top_k)")
    p.add_argument("--which", default="best", choices=("best", "latest"))
    p.add_argument("--quantized", action="store_true",
                   help="score against the int8 serving index")
    p.add_argument("--full_index", action="store_true",
                   help="rank the whole id space, not just seen items")
    args = p.parse_args(argv)

    import jax

    from carca_tpu.cli import load_catalog
    from carca_tpu.serve.recommender import config_from_run_dir
    from carca_tpu.train import sparse_adam
    from carca_tpu.train.checkpoint import CheckpointKeeper
    from carca_tpu.train.loop import evaluate_retrieval
    from carca_tpu.train.state import create_train_state, make_optimizer

    cfg = config_from_run_dir(args.run_dir)
    catalog = load_catalog(None, dc=cfg.data)

    tx = make_optimizer(cfg.train)
    template = create_train_state(jax.random.PRNGKey(0), cfg.model,
                                  cfg.train, tx,
                                  sparse_items=sparse_adam.resolve(cfg))
    keeper = CheckpointKeeper(os.path.join(args.run_dir, "ckpt"))
    try:
        restore = (keeper.restore_best if args.which == "best"
                   else keeper.restore_latest)
        got = restore(template)
        if got is None:
            raise FileNotFoundError(
                f"no {args.which!r} checkpoint under {args.run_dir}/ckpt")
        epoch, state = got
    finally:
        keeper.close()

    out = evaluate_retrieval(
        cfg, catalog, state.params, mode=args.mode,
        k=args.k or cfg.train.top_k, log=False,
        seen_only=not args.full_index, quantized=args.quantized)
    out.update({"run_dir": args.run_dir, "which": args.which,
                "epoch": int(epoch), "k": args.k or cfg.train.top_k,
                "loss": cfg.train.loss,
                "n_train_negatives": cfg.train.n_train_negatives,
                "neg_distribution": cfg.data.neg_distribution})
    print(json.dumps(out))


if __name__ == "__main__":
    main()
