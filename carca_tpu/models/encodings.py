"""Positional encodings (3 variants).

Applied only to profile embeddings, never to target/candidate embeddings
(``src/carca.py:91-92`` — ``if not target``). Selected by name via
``ModelConfig.encoding``: "identity" | "learnable" | "positional"
(``scripts/training.py:66-74``).
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp

from carca_tpu.utils.initializers import xavier_uniform

Params = Dict[str, jnp.ndarray]


def encoding_init(key: jax.Array, kind: str, d: int, max_len: int) -> Params:
    if kind == "identity":
        # no-op (src/carca.py:34-39)
        return {}
    if kind == "learnable":
        # xavier-uniform position table; the reference's
        # `_fill_padding_idx_with_zero` is a no-op there (no padding_idx,
        # src/carca.py:15-22), so row 0 is NOT zeroed.
        return {"table": xavier_uniform(key, (max_len, d))}
    if kind == "positional":
        # fixed sin/cos table (src/carca.py:43-52); a constant, but stored in
        # params for uniform treatment (excluded from optimization by the
        # trainer's "no grads to non-float or frozen leaves" — it is constant
        # anyway under the additive-encoding gradient, which flows to inputs).
        position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
        div_term = jnp.exp(jnp.arange(0, d, 2, dtype=jnp.float32) * (-math.log(10000.0) / d))
        pe = jnp.zeros((max_len, d), jnp.float32)
        pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
        pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
        return {"pe": jax.lax.stop_gradient(pe)}
    raise ValueError(f"unknown encoding kind {kind!r}")


def encoding_apply(params: Params, kind: str, x: jnp.ndarray) -> jnp.ndarray:
    """x: [B, L, d] → x + positions[:L] (src/carca.py:25-31,54-60)."""
    if kind == "identity":
        return x
    if kind == "learnable":
        return x + params["table"][None, : x.shape[1], :]
    if kind == "positional":
        return x + jax.lax.stop_gradient(params["pe"])[None, : x.shape[1], :]
    raise ValueError(f"unknown encoding kind {kind!r}")
