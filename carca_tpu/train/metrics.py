"""Ranking metrics: HR@k and NDCG@k, on device.

Contract (``src/train.py:15-32``): sort predictions descending, gather the
labels, inspect the top k. HR = Σ labels in top-k; NDCG = Σ 1/log₂(rank+2)
over positives in the top-k. Both are **batch sums**; the evaluator divides
by the number of users (``src/train.py:53``).

Implemented with ``jax.lax.top_k`` (single fused pass, no full sort). Ties
are broken by index; the reference's ``torch.sort`` is likewise
deterministic-but-arbitrary on ties, and scores are continuous so ties have
measure zero.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def hr_ndcg_sums(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    k: int,
    row_mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """y_pred/y_true: [B, T] → (HR sum, NDCG sum) over rows.

    ``row_mask`` [B] excludes batch-padding rows (all-zero rows the
    fixed-shape pipeline appends; the reference has ragged final batches
    instead).
    """
    k = min(k, y_pred.shape[-1])
    # a NaN score must never *win* the ranking: lax.top_k would otherwise
    # surface NaNs first, reporting HR=1.0 for a diverged model — the
    # worst possible failure mode for a metric. Rank NaNs last instead
    # (loss still reports the NaN; metrics degrade toward 0).
    y_pred = jnp.where(jnp.isnan(y_pred), -jnp.inf, y_pred)
    vals, idx = jax.lax.top_k(y_pred, k)
    top_labels = jnp.take_along_axis(y_true.astype(jnp.float32), idx, axis=-1)
    # all-NaN rows tie at -inf and top_k must pick *something* — a slot
    # whose score is non-finite earns no credit
    top_labels = top_labels * jnp.isfinite(vals)
    ranks = jnp.arange(k, dtype=jnp.float32)
    gains = 1.0 / jnp.log2(ranks + 2.0)
    hr_rows = jnp.sum(top_labels, axis=-1)
    ndcg_rows = jnp.sum(top_labels * gains[None, :], axis=-1)
    if row_mask is not None:
        hr_rows = hr_rows * row_mask
        ndcg_rows = ndcg_rows * row_mask
    return jnp.sum(hr_rows), jnp.sum(ndcg_rows)
