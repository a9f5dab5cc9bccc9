"""Masked binary cross-entropy on probabilities.

Contract (``src/carca.py:437-444``): the model outputs sigmoid
probabilities, and the loss is
``−[y·log(ŷ+1e−8) + (1−y)·log(1−ŷ+1e−8)]`` summed under the mask and
divided by the mask sum. The mask is ``get_mask(o_x)`` over the full
candidate axis (``src/train.py:92-93``), so padded target slots contribute
nothing.
"""

from __future__ import annotations

import jax.numpy as jnp


def masked_bce(
    y_pred: jnp.ndarray,
    y_true: jnp.ndarray,
    mask: jnp.ndarray,
    eps: float = 1e-8,
) -> jnp.ndarray:
    y_pred = y_pred.astype(jnp.float32)
    y_true = y_true.astype(jnp.float32)
    # The naive log(1 − ŷ + eps) is NOT safe under jit: XLA reassociates
    # it to (1 + eps) − ŷ, and in f32 1 + 1e−8 rounds back to 1, so a
    # sigmoid saturated to exactly 1.0 (routine with unnormalized dot
    # logits over large catalogs) yields log(0) = −inf and NaN grads.
    # maximum() pins the subtraction to ≥ 0 and blocks reassociation
    # across it; values match the reference formula to f32 rounding
    # everywhere the reference itself is finite.
    loss = -(y_true * jnp.log(y_pred + eps)
             + (1.0 - y_true) * jnp.log(jnp.maximum(1.0 - y_pred, 0.0) + eps))
    # guarded denominator: an all-masked batch yields 0, not NaN (the
    # reference NaNs there; reachable only via batch padding here)
    return jnp.sum(loss * mask) / jnp.maximum(jnp.sum(mask), eps)
