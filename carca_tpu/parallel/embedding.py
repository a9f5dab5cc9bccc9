"""Row-sharded embedding / attribute table lookup.

The 10M-item catalog config (BASELINE.json configs[4]) cannot replicate its
tables (10M × 128 × 4B ≈ 5 GB each). Tables are row-sharded over the
``model`` mesh axis; a lookup is a ``shard_map`` where each chip gathers the
rows it owns (others contribute zeros) followed by a ``psum`` over
``model`` — one small ICI collective per lookup instead of an all-gather of
the table. The backward pass transposes to a local scatter-add, so gradient
traffic is also rows-only.

Replaces the reference's replicated ``nn.Embedding`` gather
(``src/carca.py:73,87``) at scale; plugs into the model via the ``lookup``
parameter of ``embedding_apply``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def make_sharded_lookup(mesh: Mesh, axis: str = "model", data_axis: str = "data"):
    """Returns ``lookup(table, ids) -> rows`` with table row-sharded over
    ``axis`` and ids/rows sharded over ``data_axis`` on dim 0.

    Requires ``table.shape[0] % mesh.shape[axis] == 0`` (see
    ``mesh.pad_table_rows``).
    """

    def local_lookup(table_shard: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
        rows_per = table_shard.shape[0]
        lo = jax.lax.axis_index(axis) * rows_per
        loc = ids - lo
        valid = (loc >= 0) & (loc < rows_per)
        rows = jnp.take(table_shard, jnp.clip(loc, 0, rows_per - 1), axis=0)
        rows = jnp.where(valid[..., None], rows, 0.0)
        return jax.lax.psum(rows, axis)

    def lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
        id_spec = P(*((data_axis,) + (None,) * (ids.ndim - 1)))
        out_spec = P(*((data_axis,) + (None,) * ids.ndim))
        return jax.shard_map(
            local_lookup,
            mesh=mesh,
            in_specs=(P(axis, None), id_spec),
            out_specs=out_spec,
        )(table, ids)

    return lookup
