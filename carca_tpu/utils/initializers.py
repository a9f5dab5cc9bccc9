"""Parameter initializers matching the reference's init scheme.

The reference initializes every weight matrix with Xavier/Glorot uniform and
every bias with zeros (e.g. ``src/carca.py:77-83,220-226,291-295``). Xavier
uniform draws from U(-a, a) with a = gain * sqrt(6 / (fan_in + fan_out)),
which is symmetric in (fan_in, fan_out), so the torch [out, in] vs JAX
[in, out] layout difference does not change the distribution. Embedding
tables are initialized the same way with fan = (num_embeddings, dim)
(torch applies xavier to the raw [n, d] weight, ``src/carca.py:77``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xavier_uniform(key: jax.Array, shape, dtype=jnp.float32, gain: float = 1.0) -> jnp.ndarray:
    """Glorot uniform over the first two axes of ``shape``.

    For a 2-D weight [in, out] this matches ``nn.init.xavier_uniform_`` on the
    torch [out, in] tensor. For k=1 conv weights the receptive field is 1 so
    fan counts coincide with the dense case (``src/carca.py:284-291``).
    """
    fan_in, fan_out = shape[0], shape[1]
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, minval=-a, maxval=a)


def zeros_init(shape, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.zeros(shape, dtype)


def embedding_init(key: jax.Array, n: int, d: int, *, zero_pad_row: bool,
                   dtype=jnp.float32) -> jnp.ndarray:
    """Xavier-uniform embedding table; optionally zero row 0 (pad).

    Mirrors ``nn.Embedding(..., padding_idx=0)`` + xavier +
    ``_fill_padding_idx_with_zero`` (``src/carca.py:73,77,81``). Row 0 receives
    no gradient in the reference (padding_idx); here pad positions are always
    multiplied by a 0 mask before use, so row 0 stays inert.
    """
    w = xavier_uniform(key, (n, d), dtype)
    if zero_pad_row:
        w = w.at[0].set(0.0)
    return w
