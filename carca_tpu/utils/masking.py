"""Padding-mask semantics.

Item id 0 is the universal pad token: the attribute loader prepends a zero
row for it (``src/data.py:33-34``) and every mask in the reference is derived
from ``id != 0`` (``src/utils.py:6-7``).
"""

from __future__ import annotations

import jax.numpy as jnp


def get_mask(x: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """1.0 where ``x != 0`` else 0.0 (``src/utils.py:6-7``)."""
    return (x != 0).astype(dtype)
