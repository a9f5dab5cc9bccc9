"""Vectorized batch assembly (the reference's per-example Python builders,
re-done as whole-batch numpy).

Behavioral contract:

* Train examples (``get_train_sequences``, ``src/data.py:90-137``):
  right-aligned length-L window; ``p_x[t] = item_t``, positives
  ``o_x[t] = item_{t+1}``, negatives at ``o_x[L + t]``; **negatives inherit
  the positive's context** (``src/data.py:130``); ``y_true = 1`` where
  ``p_x > 0`` in the first half, 0 elsewhere. Fresh negatives every epoch
  (``src/data.py:239-245``).
* Eval examples (``get_test_sequences``, ``src/data.py:140-192``): candidate
  slot 0 = held-out positive, slots 1..T = sampled negatives, all sharing
  the positive's context; profile = up to L preceding items right-aligned;
  ``y_true = [1, 0, …]``.

Batches are fixed-shape (jit-friendly): partial batches are padded with
all-zero rows flagged by ``n_valid`` — zero rows have ``o_x == 0``
everywhere so they contribute nothing to the masked loss, and the evaluator
only counts ``n_valid`` rows.

Attribute vectors are NOT materialized here — the model gathers them on
device from the catalog table (ids-only host→device transfer). Use
``materialize_attrs`` for the explicit-attrs plug API (KNN / parity tests).
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from carca_tpu.data.loaders import Catalog
from carca_tpu.data.sampler import sample_negatives_batch
from carca_tpu.data.windowing import window_bounds, valid_users

Batch = Dict[str, np.ndarray]


class BatchBuilder:
    """Assembles fixed-shape train/eval batches from a packed Catalog."""

    def __init__(
        self,
        catalog: Catalog,
        seq_len: int,
        target_len: int = 100,
        test: bool = True,
        native: Optional[object] = None,
    ):
        self.cat = catalog
        self.L = int(seq_len)
        self.T = int(target_len)
        self.test = bool(test)
        self.native = native  # carca_tpu.native assembler, when built
        lengths = np.diff(catalog.offsets)
        self._windows = {
            mode: window_bounds(lengths, self.L, mode, self.test)
            for mode in ("train", "val", "test")
        }
        self._valid = {
            mode: valid_users(lengths, self.L, mode, self.test)
            for mode in ("train", "val", "test")
        }
        self._profile_sets = None  # lazy; only the numpy sampler needs them

    def users(self, mode: str) -> np.ndarray:
        """Users with non-empty windows for the split (``src/data.py:247``)."""
        return self._valid[mode]

    def _sets(self):
        if self._profile_sets is None:
            off, items = self.cat.offsets, self.cat.items
            self._profile_sets = [
                items[off[u]: off[u + 1]] for u in range(self.cat.n_users)
            ]
        return self._profile_sets

    # ---- profile window gather (shared by train/eval) ----

    def _profile_slots(self, user_rows: np.ndarray, mode: str):
        """Right-aligned window positions.

        For slot j ∈ [0, L): source position pi = end − L − 1 + j; valid iff
        pi ≥ start (reference fills reversed(window[:-1]) at idx = L−1−i,
        ``src/data.py:112-127,172-179``).
        """
        start, end = self._windows[mode]
        rows = np.maximum(user_rows, 0)
        s, e = start[rows], end[rows]
        alive = (user_rows >= 0) & (e > s)
        j = np.arange(self.L, dtype=np.int64)[None, :]
        pi = e[:, None] - self.L - 1 + j
        valid = (pi >= s[:, None]) & alive[:, None]
        off = self.cat.offsets[rows]
        p_evt = np.where(valid, off[:, None] + pi, 0)
        return p_evt, valid, alive, e, off

    def train_batch(self, user_rows: np.ndarray, rng: np.random.Generator,
                    *, negatives: bool = True) -> Batch:
        """``negatives=False`` skips host negative sampling and returns
        positive-only ``o_x``/``o_c`` of width [B, L] — for steps that
        resample negatives on device (``make_sharded_train_step``'s
        ``device_negatives``), so the dominant host cost and half the H2D
        bytes disappear."""
        if not negatives:
            return self._train_batch_numpy(user_rows, rng, negatives=False)
        if self.native is not None:
            return self.native.train_batch(self, user_rows, rng)
        return self._train_batch_numpy(user_rows, rng)

    def _train_batch_numpy(self, user_rows: np.ndarray,
                           rng: np.random.Generator,
                           negatives: bool = True) -> Batch:
        cat, L = self.cat, self.L
        p_evt, valid, alive, _, _ = self._profile_slots(user_rows, "train")

        p_x = np.where(valid, cat.items[p_evt], 0).astype(np.int32)
        o_pos_evt = np.where(valid, p_evt + 1, 0)
        o_pos = np.where(valid, cat.items[o_pos_evt], 0).astype(np.int32)

        p_c = cat.ctx_vals[p_evt] * valid[..., None]
        o_pos_c = cat.ctx_vals[o_pos_evt] * valid[..., None]

        if not negatives:
            y = np.concatenate([(p_x > 0).astype(np.float32),
                                np.zeros_like(p_x, dtype=np.float32)], axis=1)
            return {
                "p_x": p_x, "p_c": p_c.astype(np.float32),
                "o_x": o_pos, "o_c": o_pos_c.astype(np.float32),
                "y_true": y, "n_valid": np.int32(alive.sum()),
            }

        counts = valid.sum(axis=1)
        packed = sample_negatives_batch(
            rng, self._sets(), user_rows, counts, cat.n_items, L
        )
        # scatter left-packed negatives into the right-aligned valid slots
        o_neg = np.zeros_like(o_pos)
        o_neg[valid] = packed[packed > 0] if packed.any() else 0

        o_x = np.concatenate([o_pos, o_neg], axis=1)
        # negatives inherit the positive's context (src/data.py:130)
        o_c = np.concatenate([o_pos_c, o_pos_c], axis=1)
        y = np.concatenate([(p_x > 0).astype(np.float32),
                            np.zeros_like(p_x, dtype=np.float32)], axis=1)
        return {
            "p_x": p_x, "p_c": p_c.astype(np.float32),
            "o_x": o_x, "o_c": o_c.astype(np.float32),
            "y_true": y, "n_valid": np.int32(alive.sum()),
        }

    def eval_batch(self, user_rows: np.ndarray, rng: np.random.Generator, mode: str) -> Batch:
        if self.native is not None:
            return self.native.eval_batch(self, user_rows, rng, mode)
        return self._eval_batch_numpy(user_rows, rng, mode)

    def _eval_batch_numpy(self, user_rows: np.ndarray, rng: np.random.Generator, mode: str) -> Batch:
        cat, L, T = self.cat, self.L, self.T
        p_evt, valid, alive, end, off = self._profile_slots(user_rows, mode)

        p_x = np.where(valid, cat.items[p_evt], 0).astype(np.int32)
        p_c = cat.ctx_vals[p_evt] * valid[..., None]

        one_out_evt = np.where(alive, off + end - 1, 0)
        pos = np.where(alive, cat.items[one_out_evt], 0).astype(np.int32)
        pos_c = cat.ctx_vals[one_out_evt] * alive[:, None]

        counts = np.where(alive, T, 0)
        negs = sample_negatives_batch(
            rng, self._sets(), np.where(alive, user_rows, -1), counts,
            cat.n_items, T,
        )

        o_x = np.concatenate([pos[:, None], negs], axis=1)
        # negatives share the one-out positive's context (src/data.py:185)
        o_c = np.broadcast_to(pos_c[:, None, :], (len(user_rows), T + 1, cat.n_ctx)).copy()
        o_c[:, 1:][negs == 0] = 0.0
        y = np.zeros((len(user_rows), T + 1), dtype=np.float32)
        y[:, 0] = alive.astype(np.float32)
        return {
            "p_x": p_x, "p_c": p_c.astype(np.float32),
            "o_x": o_x.astype(np.int32), "o_c": o_c.astype(np.float32),
            "y_true": y, "n_valid": np.int32(alive.sum()),
        }

    def materialize_attrs(self, batch: Batch) -> Batch:
        """Explicit-attrs view for the reference plug API (KNN, parity tests)."""
        out = dict(batch)
        out["p_a"] = self.cat.attrs[batch["p_x"]]
        out["o_a"] = self.cat.attrs[batch["o_x"]]
        return out


def epoch_batches(
    users: np.ndarray,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
    shuffle: bool = True,
    drop_remainder: bool = False,
) -> Iterator[np.ndarray]:
    """Yield fixed-size user-row batches; the last partial batch is padded
    with −1 rows (builder emits all-zero rows for them)."""
    users = np.asarray(users)
    if shuffle:
        if rng is None:
            raise ValueError("shuffle requires an rng")
        users = rng.permutation(users)
    n = len(users)
    for i in range(0, n, batch_size):
        chunk = users[i: i + batch_size]
        if len(chunk) < batch_size:
            if drop_remainder:
                return
            pad = np.full(batch_size - len(chunk), -1, dtype=chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        yield chunk
