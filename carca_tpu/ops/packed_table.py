"""Lane-packed embedding tables.

TPU arrays are tiled (8, 128): a table whose row width is below 128 lanes
is stored physically padded to 128, so a ``[10M, 64]`` f32 item table costs
4.8 GB of HBM instead of 2.4 GB — and its two Adam moments triple that
waste. Since the gather hardware reads whole padded rows either way, the
fix is free: store ``p = 128 // d`` logical rows per physical row,

    packed[r] = concat(table[r*p], ..., table[r*p + p - 1])   # [⌈n/p⌉, p·d]

i.e. exactly ``table.reshape(⌈n/p⌉, p·d)`` after padding ``n`` up to a
multiple of ``p``. Lookup gathers the physical row then selects the d-wide
slice; autodiff turns that into a scatter-add over the packed rows — same
bytes as the padded scatter, half the storage. Unpacking is a reshape.

The reference has no notion of this (a CUDA ``nn.Embedding`` row is not
tile-padded, ``src/carca.py:73``); it exists purely because of the TPU
memory layout, and it is what makes the 10M-item single-chip configuration
(BASELINE configs[4]) fit in a v5e's 16 GB HBM: items + 2 Adam moments +
attrs drop from ~19 GB padded to ~9.5 GB.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LANES = 128


def pack_factor(width: int, n_rows: int = 0, flag="auto") -> int:
    """Physical rows-per-row for a [n_rows, width] table.

    ``flag``: True → pack whenever the width divides the lane tile;
    False → never; "auto" → pack only big tables (≥ 1M rows), where the
    saving matters and checkpoint-layout churn is justified.
    """
    if flag is False or width >= LANES or LANES % width:
        return 1
    if flag == "auto" and n_rows < 1_000_000:
        return 1
    return LANES // width


def pack_rows(table, p: int):
    """[n, w] → [⌈n/p⌉, p·w] (rows padded with zeros). numpy or jnp."""
    if p == 1:
        return table
    n, w = table.shape
    pad = (-n) % p
    xp = np if isinstance(table, np.ndarray) else jnp
    if pad:
        table = xp.concatenate(
            [table, xp.zeros((pad, w), table.dtype)], axis=0)
    return table.reshape(-1, p * w)


def unpack_rows(packed, width: int):
    """Inverse of ``pack_rows`` (keeps the zero pad rows at the end)."""
    return packed.reshape(-1, width)


def lookup_maybe_packed(lookup, table, ids, width: int):
    """Gather ``width``-wide rows by id from a packed or unpacked table.

    ``lookup(table, row_ids)`` performs the physical-row gather (plain
    ``jnp.take`` or the shard_map row-sharded collective) — packing composes
    with row sharding because packed rows are still just rows.
    """
    if table.shape[-1] == width:
        return lookup(table, ids)
    p = table.shape[-1] // width
    rows = lookup(table, ids // p)  # [..., p·w]
    rows = rows.reshape(ids.shape + (p, width))
    sub = (ids % p)[..., None, None]
    return jnp.take_along_axis(rows, sub, axis=-2)[..., 0, :]
