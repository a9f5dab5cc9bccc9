"""Non-learned KNN content baseline.

Contract (``src/knn.py:8-21``): score each candidate by the dot product of
the **last profile item's attribute vector** against the candidate's
attribute vector; concatenate over target groups. Shares the evaluate()
harness with CARCA; no training.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp


def knn_apply(
    profile,
    targets: Sequence,
    *,
    attrs_table: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    p_x, p_a, _ = profile
    if p_a is None:
        p_a = jnp.take(attrs_table, p_x, axis=0)
    last_p = p_a[:, -1:, :]
    y_preds = []
    for o_x, o_a, _ in targets:
        if o_a is None:
            o_a = jnp.take(attrs_table, o_x, axis=0)
        y_preds.append(jnp.sum(last_p * o_a, axis=-1))
    return jnp.concatenate(y_preds, axis=-1)
