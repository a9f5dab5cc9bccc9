"""Full train-state checkpointing (orbax) with best-metric retention.

The reference keeps only a whole-module pickle of the best-val-NDCG model,
deleting prior files (``src/train.py:117-124``), and cannot resume training
(no optimizer/RNG state). Here:

* ``best/`` — best-val-NDCG full state, max_to_keep=1 (the reference's
  retention policy, kept as a feature);
* ``latest/`` — every-epoch full state (params + optimizer moments + PRNG +
  step) for crash-resume (SURVEY.md §5).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointKeeper:
    def __init__(self, directory: str):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._best = ocp.CheckpointManager(
            os.path.join(directory, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                best_fn=lambda metrics: metrics["ndcg"],
                best_mode="max",
            ),
        )
        self._latest = ocp.CheckpointManager(
            os.path.join(directory, "latest"),
            options=ocp.CheckpointManagerOptions(max_to_keep=1),
        )

    def save(self, epoch: int, state: Any, metrics: Dict[str, float]) -> None:
        args = ocp.args.StandardSave(state)
        self._best.save(epoch, args=args, metrics=dict(metrics))
        self._latest.save(epoch, args=args, metrics=dict(metrics))
        self._best.wait_until_finished()
        self._latest.wait_until_finished()

    def save_latest(self, epoch: int, state: Any) -> None:
        """Refresh only the resume checkpoint (non-improving epochs)."""
        self._latest.save(epoch, args=ocp.args.StandardSave(state))
        self._latest.wait_until_finished()

    def restore_latest(self, template: Any) -> Optional[Tuple[int, Any]]:
        step = self._latest.latest_step()
        if step is None:
            return None
        state = self._latest.restore(step, args=ocp.args.StandardRestore(template))
        return step, state

    def restore_best(self, template: Any) -> Optional[Tuple[int, Any]]:
        step = self._best.best_step()
        if step is None:
            return None
        state = self._best.restore(step, args=ocp.args.StandardRestore(template))
        return step, state

    def best_metrics(self) -> Optional[Dict[str, float]]:
        step = self._best.best_step()
        if step is None:
            return None
        metrics = self._best.metrics(step)
        return dict(metrics) if metrics is not None else None

    def close(self) -> None:
        self._best.close()
        self._latest.close()
