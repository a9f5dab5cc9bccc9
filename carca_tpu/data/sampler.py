"""Host-side negative sampling with exact reference semantics.

Contract (``sample_negatives``, ``src/data.py:77-87``): uniform item ids in
[1, n_items−1], rejected against the user's **full** history and against
duplicates within the sample; fresh draws on every call (per epoch per user,
``src/data.py:239-245``).

The reference runs a Python ``while`` loop per id; here draws are batched
and filtered with vectorized numpy (``np.isin`` + first-occurrence dedup),
looping only on the rare shortfall. The C++ assembler
(``carca_tpu.native``) supersedes this on the hot path; the on-device
variant lives in ``carca_tpu.ops.sampling``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def sample_negatives(
    rng: np.random.Generator,
    profile_set: np.ndarray,
    n_items: int,
    n: int,
) -> np.ndarray:
    """n unique ids from [1, n_items−1] avoiding ``profile_set``.

    ``profile_set``: 1-D array of the user's item ids (any order).
    """
    if n <= 0:
        return np.zeros(0, dtype=np.int32)
    out = np.zeros(0, dtype=np.int64)
    need = n
    while need > 0:
        draws = rng.integers(1, n_items, size=max(2 * need, need + 8))
        good = draws[~np.isin(draws, profile_set)]
        if out.size:
            good = good[~np.isin(good, out)]
        # first-occurrence dedup (np.unique sorts; restore draw order)
        _, first = np.unique(good, return_index=True)
        good = good[np.sort(first)]
        out = np.concatenate([out, good[:need]])
        need = n - out.size
    return out.astype(np.int32)


def sample_negatives_batch(
    rng: np.random.Generator,
    profile_sets: Sequence[np.ndarray],
    user_rows: np.ndarray,
    counts: np.ndarray,
    n_items: int,
    width: int,
) -> np.ndarray:
    """Per-row negatives, zero-padded to [B, width].

    ``counts[b]`` negatives are drawn for user ``user_rows[b]`` (rows with
    ``user_rows[b] < 0`` are batch padding and get all zeros).
    """
    B = len(user_rows)
    out = np.zeros((B, width), dtype=np.int32)
    for b in range(B):
        u, n = int(user_rows[b]), int(counts[b])
        if u < 0 or n <= 0:
            continue
        out[b, :n] = sample_negatives(rng, profile_sets[u], n_items, n)
    return out
