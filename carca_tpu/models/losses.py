"""Masked binary cross-entropy on probabilities.

Contract (``src/carca.py:437-444``): the model outputs sigmoid
probabilities, and the loss is
``−[y·log(ŷ+1e−8) + (1−y)·log(1−ŷ+1e−8)]`` summed under the mask and
divided by the mask sum. The mask is ``get_mask(o_x)`` over the full
candidate axis (``src/train.py:92-93``), so padded target slots contribute
nothing.
"""

from __future__ import annotations

import jax
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


def sampled_softmax(
    logits: jnp.ndarray,
    o_x: jnp.ndarray,
    n_groups: int,
    logq: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-position sampled-softmax loss over [positive ‖ K negatives].

    No reference counterpart (its loss is hard-wired 1-vs-1 BCE,
    ``src/train.py:86-93``); this is the retrieval-aligned objective: the
    deployed task ranks 1-vs-catalog, whose exact loss is a softmax over N
    items, and a softmax over sampled candidates is its standard surrogate
    (importance-corrected below).

    ``logits``: [B, G·L] group-major pre-sigmoid scores from
    ``carca_apply(..., return_logits=True)``; group 0 is the positives.
    ``o_x``: [B, G·L] candidate ids (group 0's zeros mark padded
    positions). ``logq``: optional [n_items] log sampling probability for
    the **logQ correction** (Bengio & Senécal 2008; Yi et al. 2019):
    under non-uniform (popularity) sampling the sampled softmax is biased
    toward frequently-drawn items unless each sampled candidate's logit
    is corrected to ``s − log q(item)``. The positive is NOT corrected —
    it is given, not sampled. Uniform sampling needs no correction
    (constant shift on all K negatives changes the loss by a smooth
    monotone reparametrization only); pass ``logq=None``.

    Mean over valid positions; an all-padded batch yields 0, not NaN.
    """
    b = logits.shape[0]
    z = logits.reshape(b, n_groups, -1).astype(jnp.float32)
    ids = o_x.reshape(b, n_groups, -1)
    if logq is not None:
        corr = jnp.where(jnp.arange(n_groups)[None, :, None] > 0,
                         logq[ids], 0.0)
        z = z - corr
    valid = (ids[:, 0] > 0).astype(jnp.float32)  # [B, L]
    logp_pos = z[:, 0] - jax.nn.logsumexp(z, axis=1)
    return -jnp.sum(logp_pos * valid) / jnp.maximum(jnp.sum(valid), 1.0)
