"""Feature-fusion embeddings (5 variants) mapping
(item id, attribute vector, context vector) → d-dim token.

Variants and math follow ``src/carca.py:66-198``:

* ``all``     — id-embed·√d ⊕ Linear(a‖c → g) → Linear(g+d → d)
* ``attrctx`` — Linear(a‖c → g) → Linear(g → d), no id table
* ``attr``    — Linear(a → g) → Linear(g → d)
* ``id``      — id table · √d
* ``mlpid``   — id table (g-dim) · √d → Linear(g → d)

Positional encoding is applied only when ``target=False``
(``src/carca.py:91-92``), then the output is zeroed at pad positions
(``e * mask``, ``src/carca.py:94``).

TPU-native departure from the reference: attribute vectors are **gathered on
device** from a catalog table resident in HBM when the caller passes
``a=None`` (ids-only host→device transfer), instead of shipping dense
``[B, L, n_attrs]`` float tensors from the host every step. Tables are
row-shardable; pass a custom ``lookup`` to route gathers through an explicit
collective (see ``carca_tpu.parallel.sharded_embedding``).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from carca_tpu.config import ModelConfig
from carca_tpu.models import encodings, layers
from carca_tpu.ops.packed_table import (lookup_maybe_packed, pack_factor,
                                        pack_rows)
from carca_tpu.utils.initializers import embedding_init as table_init

Params = Dict[str, jnp.ndarray]
Lookup = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def _default_lookup(table: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    return jnp.take(table, ids, axis=0)


def item_table_width(cfg: ModelConfig) -> int:
    """Logical row width of ``params['embed']['items']`` (mlpid uses a
    g-dim table, src/carca.py:180)."""
    return cfg.g if cfg.embedding == "mlpid" else cfg.d


def embedding_init(key: jax.Array, cfg: ModelConfig) -> Params:
    k_enc, k_items, k_feats, k_joint = jax.random.split(key, 4)
    params: Params = {
        "enc": encodings.encoding_init(k_enc, cfg.encoding, cfg.d, cfg.seq_len)
    }
    kind = cfg.embedding
    if kind == "all":
        params["items"] = table_init(k_items, cfg.n_items, cfg.d, zero_pad_row=True)
        params["feats"] = layers.dense_init(k_feats, cfg.n_ctx + cfg.n_attrs, cfg.g)
        params["joint"] = layers.dense_init(k_joint, cfg.g + cfg.d, cfg.d)
    elif kind == "attrctx":
        params["feats"] = layers.dense_init(k_feats, cfg.n_ctx + cfg.n_attrs, cfg.g)
        params["joint"] = layers.dense_init(k_joint, cfg.g, cfg.d)
    elif kind == "attr":
        params["feats"] = layers.dense_init(k_feats, cfg.n_attrs, cfg.g)
        params["joint"] = layers.dense_init(k_joint, cfg.g, cfg.d)
    elif kind == "id":
        params["items"] = table_init(k_items, cfg.n_items, cfg.d, zero_pad_row=True)
    elif kind == "mlpid":
        params["items"] = table_init(k_items, cfg.n_items, cfg.g, zero_pad_row=True)
        params["feats"] = layers.dense_init(k_feats, cfg.g, cfg.d)
    else:
        raise ValueError(f"unknown embedding kind {kind!r}")
    if "items" in params:
        # lane-pack big sub-128-wide tables (storage-only change; lookups
        # dispatch on the stored width — see ops/packed_table.py)
        p = pack_factor(item_table_width(cfg), cfg.n_items, cfg.pack_tables)
        if p > 1:
            params["items"] = pack_rows(params["items"], p)
    return params


def embedding_apply(
    params: Params,
    cfg: ModelConfig,
    x: jnp.ndarray,
    a: Optional[jnp.ndarray],
    c: Optional[jnp.ndarray],
    mask: jnp.ndarray,
    *,
    target: bool,
    attrs_table: Optional[jnp.ndarray] = None,
    lookup: Lookup = _default_lookup,
) -> jnp.ndarray:
    """Embed one (ids, attrs, ctx) group.

    x: [B, T] int32; a: [B, T, n_attrs] or None (→ gather ``attrs_table[x]``
    on device); c: [B, T, n_ctx] or None (only needed by all/attrctx);
    mask: [B, T] float. Returns [B, T, d] float32.
    """
    kind = cfg.embedding
    cd = jnp.dtype(cfg.compute_dtype)
    scale = math.sqrt(cfg.d)

    def items(width: int) -> jnp.ndarray:
        return lookup_maybe_packed(lookup, params["items"], x, width)

    def attrs() -> jnp.ndarray:
        if a is not None:
            return a
        if attrs_table is None:
            raise ValueError("need either explicit attrs `a` or an `attrs_table` catalog")
        return lookup_maybe_packed(lookup, attrs_table, x, cfg.n_attrs)

    if kind == "all":
        # src/carca.py:85-95
        q = layers.dense(params["feats"], jnp.concatenate([attrs(), c], axis=-1), cd)
        z = items(cfg.d) * scale
        e = layers.dense(params["joint"], jnp.concatenate([z, q], axis=-1), cd)
    elif kind == "attrctx":
        # src/carca.py:114-122
        q = layers.dense(params["feats"], jnp.concatenate([attrs(), c], axis=-1), cd)
        e = layers.dense(params["joint"], q, cd)
    elif kind == "attr":
        # src/carca.py:141-149
        q = layers.dense(params["feats"], attrs(), cd)
        e = layers.dense(params["joint"], q, cd)
    elif kind == "id":
        # src/carca.py:163-171
        e = items(cfg.d) * scale
    elif kind == "mlpid":
        # src/carca.py:189-198 — note the √d scale (not √g) on the g-dim table
        e = items(cfg.g) * scale
        e = layers.dense(params["feats"], e, cd)
    else:
        raise ValueError(f"unknown embedding kind {kind!r}")

    if not target:
        e = encodings.encoding_apply(params["enc"], cfg.encoding, e)

    return (e * mask[..., None]).astype(jnp.float32)
