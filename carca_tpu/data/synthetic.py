"""Deterministic synthetic dataset for tests and benchmarks.

Generates a Catalog with a fixed PRNG: zipf-ish item popularity, random
attribute vectors, and per-event context vectors. Also writes the
reference's on-disk formats (profiles txt / pickled attrs / pickled ctx
dict, ``src/data.py:17-50``) for loader round-trip tests.
"""

from __future__ import annotations

import os
import pickle
import numpy as np

from carca_tpu.data.loaders import Catalog


def synthetic_catalog(
    n_users: int = 2000,
    n_real_items: int = 1000,
    n_attrs: int = 12,
    n_ctx: int = 4,
    min_len: int = 4,
    max_len: int = 30,
    seed: int = 0,
) -> Catalog:
    rng = np.random.default_rng(seed)

    # zipf-ish popularity over real item ids [1, n_real_items]
    ranks = np.arange(1, n_real_items + 1, dtype=np.float64)
    popularity = 1.0 / ranks
    popularity /= popularity.sum()

    lengths = rng.integers(min_len, max_len + 1, size=n_users)
    offsets = np.zeros(n_users + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    n_events = int(offsets[-1])

    items = rng.choice(
        np.arange(1, n_real_items + 1, dtype=np.int32), size=n_events, p=popularity
    )
    ctx_vals = rng.standard_normal((n_events, n_ctx)).astype(np.float32)

    attrs = rng.standard_normal((n_real_items + 1, n_attrs)).astype(np.float32)
    attrs[0] = 0.0  # pad row (src/data.py:33-34)

    return Catalog(
        attrs=attrs,
        user_ids=np.arange(n_users, dtype=np.int64),
        items=items.astype(np.int32),
        offsets=offsets,
        ctx_vals=ctx_vals,
    )


def synthetic_catalog_device(
    n_users: int = 2000,
    n_real_items: int = 1000,
    n_attrs: int = 12,
    n_ctx: int = 4,
    min_len: int = 4,
    max_len: int = 30,
    seed: int = 0,
) -> Catalog:
    """``synthetic_catalog`` with the big arrays generated ON the
    accelerator.

    The host variant materializes attrs ``[n_items+1, A]`` and per-event
    context in host RAM and ships them to HBM — for the 10M-item preset
    that is ~0.5–2.6 GB of host→device traffic before the first step.
    Here only the ``[n_users+1]`` CSR offsets cross the boundary; attrs,
    items, and contexts are generated directly in HBM. The PRNG impl is
    pinned to threefry2x32 — stable across backends and XLA versions — so
    a catalog generated during TPU training is regenerated bit-identically
    by carca-serve or a resumed run on any backend (the package default is
    the faster hardware ``rbg`` impl, whose stream is backend-dependent;
    fine for dropout, wrong for data). Item popularity uses the continuous Zipf(1) inverse CDF
    (``exp(u·ln n)``) rather than numpy's exact discrete draw — the same
    1/rank shape, different PRNG stream, so the numpy generator remains
    the deterministic golden source for tests.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    lengths = rng.integers(min_len, max_len + 1, size=n_users)
    offsets = np.zeros(n_users + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    n_events = int(offsets[-1])

    root = jax.random.key(seed, impl="threefry2x32")
    k_items, k_ctx, k_attrs = jax.random.split(root, 3)

    @jax.jit
    def gen():
        u = jax.random.uniform(k_items, (n_events,), jnp.float32)
        items = jnp.clip(
            jnp.exp(u * jnp.log(float(n_real_items))).astype(jnp.int32),
            1, n_real_items)
        ctx_vals = jax.random.normal(k_ctx, (n_events, n_ctx), jnp.float32)
        attrs = jax.random.normal(
            k_attrs, (n_real_items + 1, n_attrs), jnp.float32)
        attrs = attrs.at[0].set(0.0)  # pad row (src/data.py:33-34)
        return items, ctx_vals, attrs

    items, ctx_vals, attrs = gen()
    return Catalog(
        attrs=attrs,
        user_ids=np.arange(n_users, dtype=np.int64),
        items=items,
        offsets=offsets,
        ctx_vals=ctx_vals,
    )


def write_reference_format(cat: Catalog, out_dir: str, dedup_ctx: bool = True) -> None:
    """Dump a Catalog in the reference's file formats.

    Note the ctx dict is keyed by (user, item) (``src/data.py:17-25``) — if a
    user repeats an item, only one context vector survives, exactly as in the
    reference format.
    """
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "profiles.txt"), "w") as fh:
        for u in range(cat.n_users):
            uid = int(cat.user_ids[u])
            for e in range(cat.offsets[u], cat.offsets[u + 1]):
                fh.write(f"{uid} {int(cat.items[e])}\n")

    # attrs pickle excludes the pad row (loader re-prepends it)
    with open(os.path.join(out_dir, "attrs.pkl"), "wb") as fh:
        pickle.dump(cat.attrs[1:], fh)

    ctx = {}
    for u in range(cat.n_users):
        uid = int(cat.user_ids[u])
        for e in range(cat.offsets[u], cat.offsets[u + 1]):
            ctx[(uid, int(cat.items[e]))] = cat.ctx_vals[e].tolist()
    with open(os.path.join(out_dir, "ctx.pkl"), "wb") as fh:
        pickle.dump(ctx, fh)


def canonicalize_repeat_ctx(cat: Catalog) -> Catalog:
    """Apply the reference's (user, item)-keyed context semantics: when a
    user repeats an item, every occurrence uses the dict's surviving (last)
    context vector (``src/data.py:17-25`` + dict insertion order)."""
    ctx_vals = cat.ctx_vals.copy()
    for u in range(cat.n_users):
        s, e = int(cat.offsets[u]), int(cat.offsets[u + 1])
        last = {}
        for i in range(s, e):
            last[int(cat.items[i])] = i
        for i in range(s, e):
            ctx_vals[i] = cat.ctx_vals[last[int(cat.items[i])]]
    return Catalog(cat.attrs, cat.user_ids, cat.items, cat.offsets, ctx_vals)
