"""Full train-state checkpointing (orbax) with best-metric retention.

The reference keeps only a whole-module pickle of the best-val-NDCG model,
deleting prior files (``src/train.py:117-124``), and cannot resume training
(no optimizer/RNG state). Here:

* ``best/`` — best-val-NDCG **params only**, max_to_keep=1 (the
  reference's retention policy kept as a feature; its ``.pth`` pickle is
  likewise weights-only — final test eval needs no optimizer moments, and
  params are ~1/3 the bytes of the full state at large table sizes);
* ``latest/`` — rolling full state (params + optimizer moments + PRNG +
  step) for crash-resume (SURVEY.md §5), refreshed every
  ``TrainConfig.checkpoint_interval`` epochs.

Saves are **asynchronous**: ``save``/``save_latest`` block only for the
device→host snapshot, then return while orbax streams to storage in a
background thread — the next epoch's forward/backward overlaps the write.
Each manager waits for its own previous in-flight save first, so back-to-
back epochs never race on the same directory.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp


def _selection_metric(metrics: Dict[str, Any], select_by: str = "ndcg") -> float:
    """The value ``fit`` compared when it decided to save, mirroring
    ``loop.py::selection_value`` exactly: under ``select_by=ndcg`` the
    sampled ndcg; under ``select_by=retrieval_*`` the saved ``select``
    entry — but ONLY when the checkpoint was saved under the SAME regime
    (its metrics carry a matching ``select_by``). A stale-regime
    checkpoint scores 0.0 so the new regime's first save outranks it —
    comparing an old retrieval-HR ``select`` against a new sampled ndcg
    (or vice versa) is incommensurable and could pin retention/GC on the
    wrong epoch across a resume whose ``select_by`` changed. Module-level
    (not a lambda) so orbax's retention and the sidecar gate provably
    share one definition."""
    if select_by == "ndcg":
        return metrics["ndcg"]
    if metrics.get("select_by") == select_by:
        return metrics["select"]
    return 0.0


class CheckpointKeeper:
    def __init__(self, directory: str, select_by: str = "ndcg"):
        directory = os.path.abspath(directory)
        os.makedirs(directory, exist_ok=True)
        self._dir = directory
        self._ema = None  # lazily created: only EMA runs pay the manager
        # distinct barrier_sync_key_prefix per manager: on a multi-process
        # run both managers' async finalize threads sync through the jax
        # coordination service, and with the default (shared) key space an
        # in-flight best/ save races an in-flight latest/ save into
        # "Barrier ThreadSaveMultiHostValueHolder:set_value_start is
        # already ongoing" (caught by tests/test_multihost.py). Harmless
        # single-process (barriers are no-ops there).
        # Retention keys on the metric fit() actually selected on: under
        # select_by=retrieval_* the saved metrics carry a "select" entry
        # (loop.py) and orbax must garbage-collect by IT, not by sampled
        # ndcg — keying on ndcg reloads the wrong checkpoint exactly when
        # the two curves diverge, which is the only regime the flag exists
        # for (config.py select_by rationale; bug found in round 3).
        self._select_fn = functools.partial(_selection_metric,
                                            select_by=select_by)
        self._best = ocp.CheckpointManager(
            os.path.join(directory, "best"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                best_fn=self._select_fn,
                best_mode="max",
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    barrier_sync_key_prefix="best"),
            ),
        )
        self._latest = ocp.CheckpointManager(
            os.path.join(directory, "latest"),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=1,
                multiprocessing_options=ocp.options.MultiprocessingOptions(
                    barrier_sync_key_prefix="latest"),
            ),
        )

    def save(self, epoch: int, state: Any, metrics: Dict[str, float]) -> None:
        """Best-val-NDCG save (improving epochs): params only."""
        self._best.wait_until_finished()
        prev = self.best_metrics()
        self._best.save(epoch, args=ocp.args.StandardSave(state.params),
                        metrics=dict(metrics))
        # human-browsable sidecar: the reference encodes
        # {epoch:03d}_{HR:.4f}_{NDCG:.4f}.pth in the checkpoint FILENAME
        # (src/train.py:124); orbax paths are step-numbered, so the
        # at-a-glance contract moves to best/metrics.json. Written only
        # when THIS save is the retained best (fit() only saves on
        # improvement, but the keeper API must stay self-consistent), and
        # only by process 0 (orbax handles multihost internally; this
        # sidecar must not race).
        import jax
        if jax.process_index() == 0 and (
                prev is None
                or self._select_fn(metrics) >= self._select_fn(prev)):
            import json
            with open(os.path.join(self._best.directory, "metrics.json"),
                      "w") as fh:
                json.dump(dict(metrics, epoch=epoch), fh)

    def save_latest(self, epoch: int, state: Any, ema: Any = None) -> None:
        """Refresh only the resume checkpoint (non-improving epochs).

        ``ema`` (a params pytree) is the optional EMA shadow
        (``TrainConfig.ema_decay``); it lives in a sibling ``ema/``
        manager rather than inside the state tree so enabling/disabling
        EMA never changes the on-disk structure of ``latest/`` (existing
        resumes keep restoring against the plain TrainState template)."""
        self._latest.wait_until_finished()
        self._latest.save(epoch, args=ocp.args.StandardSave(state))
        if ema is not None:
            self._ema_manager().wait_until_finished()
            self._ema_manager().save(epoch, args=ocp.args.StandardSave(ema))

    def _ema_manager(self):
        if self._ema is None:
            self._ema = ocp.CheckpointManager(
                os.path.join(self._dir, "ema"),
                options=ocp.CheckpointManagerOptions(
                    max_to_keep=1,
                    multiprocessing_options=ocp.options.MultiprocessingOptions(
                        barrier_sync_key_prefix="ema"),
                ),
            )
        return self._ema

    def restore_latest_ema(self, template: Any) -> Optional[Any]:
        """The EMA shadow saved alongside the latest resume state, or None
        for runs that never saved one (fit re-seeds from the live weights
        — exact for resumes interrupted before the first save_latest)."""
        if not os.path.isdir(os.path.join(self._dir, "ema")):
            return None
        mgr = self._ema_manager()
        mgr.wait_until_finished()
        step = mgr.latest_step()
        if step is None:
            return None
        return mgr.restore(step, args=ocp.args.StandardRestore(template))

    def _wait(self) -> None:
        self._best.wait_until_finished()
        self._latest.wait_until_finished()
        if self._ema is not None:
            self._ema.wait_until_finished()

    def restore_latest(self, template: Any) -> Optional[Tuple[int, Any]]:
        self._wait()
        step = self._latest.latest_step()
        if step is None:
            return None
        state = self._latest.restore(
            step, args=ocp.args.StandardRestore(template))
        return step, state

    def restore_best(self, template: Any) -> Optional[Tuple[int, Any]]:
        """Best params restored into ``template``'s (state's) params slot —
        the returned object is a full state with the best weights."""
        self._wait()
        step = self._best.best_step()
        if step is None:
            return None
        params = self._best.restore(
            step, args=ocp.args.StandardRestore(template.params))
        return step, template.replace(params=params)

    def best_metrics(self) -> Optional[Dict[str, float]]:
        self._best.wait_until_finished()
        step = self._best.best_step()
        if step is None:
            return None
        metrics = self._best.metrics(step)
        return dict(metrics) if metrics is not None else None

    def close(self) -> None:
        self._wait()
        self._best.close()
        self._latest.close()
        if self._ema is not None:
            self._ema.close()
