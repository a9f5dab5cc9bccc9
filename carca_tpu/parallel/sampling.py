"""On-device negative sampling.

The reference draws fresh negatives per example per epoch with a Python
rejection loop (``src/data.py:77-87``) — the CPU bottleneck flagged in
SURVEY.md §3.1. At scale the framework samples on device instead: uniform
ids in ``[1, n_items-1]`` with a fixed number of retry draws, rejecting
collisions against the *visible profile window*.

Approximation note (documented at ``DataConfig.device_sampling``): the
reference rejects against the user's full history; on device only the
length-L window is resident. For the catalogs this targets (≥100k items)
the acceptance probability per draw is ≥ 1 − L/n_items ≈ 0.999, and the
chance any of the ``retries`` draws all collide is negligible; the final
draw is used unconditionally in that case (keeps shapes static).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def retries_for(reject_width: int, n_items: int,
                popularity: bool = False) -> int:
    """Retry count making the all-draws-collide fallback negligible.

    Uniform draws: collision probability per draw is ≤
    reject_width/(n_items − 1); pick R so p^R ≤ 1e−12. Production catalogs
    (≥100k items) stay at the default 8; only tiny catalogs with wide
    reject sets (tests, toy runs) pay for more draws. Capped at 64 —
    beyond that the reject set nearly covers the catalog and rejection
    sampling is the wrong tool anyway.

    Popularity draws collide with the (popularity-biased) history at a
    rate independent of catalog size — a history of popular items can
    carry tens of percent of the unigram mass — so the bound uses a
    pessimistic p = 0.35 floor (R = 24, p^R < 1e−12) instead of the
    uniform estimate.
    """
    p = min(reject_width / max(n_items - 1, 1), 0.999)
    if popularity:
        p = max(p, 0.35)
    if p <= 0.03:  # 0.03^8 < 1e-12
        return 8
    return max(8, min(64, math.ceil(-12.0 / math.log10(p))))


@partial(jax.jit, static_argnums=(2, 3, 4))
def device_sample_negatives(
    rng: jax.Array,
    profile: jnp.ndarray,
    n_items: int,
    n_slots: int,
    retries: int = 8,
    events: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Sample ``[B, n_slots]`` negative ids avoiding ``profile`` [B, L].

    Default domain matches the reference's sampler:
    ``random.randint(1, n_items-1)`` is inclusive on both ends
    (``src/data.py:82``), i.e. uniform over ``{1, …, n_items-1}`` —
    exactly ``jax.random.randint(…, 1, n_items)``.

    With ``events`` (the CSR event-item array) draws are **popularity-
    proportional** instead: a uniform random event's item id IS a draw
    from the empirical unigram distribution — one extra [B·S·R] gather,
    no CDF table. No reference counterpart (its sampler is uniform-only);
    this exists because uniform negatives over an extreme-sparsity
    catalog never teach the model about the items it actually serves
    (docs/DESIGN.md #11).
    """
    b = profile.shape[0]
    if events is None and n_slots < n_items <= 32768:
        # small catalogs (with enough ids to fill the slots): exact
        # sampling WITHOUT replacement (the
        # reference's semantics — distinct negatives, excluding the
        # reject set) via top-k of iid uniform keys. The [B, n_items] key
        # matrix is cheap here, and this is exactly the regime where the
        # independent-draw duplicate rate (~S²/2n per row) is material:
        # at 2k items / 100 eval draws it cost ~0.04 test HR@10.
        keys = jax.random.uniform(rng, (b, n_items))
        keys = keys.at[:, 0].set(-jnp.inf)  # pad id never sampled
        keys = keys.at[jnp.arange(b)[:, None], profile].set(-jnp.inf)
        _, ids = jax.lax.top_k(keys, n_slots)
        return ids.astype(profile.dtype)
    if events is not None:
        eidx = jax.random.randint(
            rng, (b, n_slots, retries), 0, events.shape[0], jnp.int32)
        draws = events[eidx].astype(profile.dtype)
    else:
        draws = jax.random.randint(
            rng, (b, n_slots, retries), 1, n_items, dtype=profile.dtype)
    # collision of each draw against the window: [B, S, R] via all-pairs
    # compare (vectorized compare beats a [B, n_items] scatter/gather bitmap
    # on TPU — measured 0.6 vs 1.9 ms/step at B=256, S=50, R=8, L=51)
    hit = jnp.any(draws[:, :, :, None] == profile[:, None, None, :], axis=-1)
    # first non-colliding draw; fall back to the last draw if all collide
    first_ok = jnp.argmax(~hit, axis=-1)  # 0 if none ok → but then use last
    any_ok = jnp.any(~hit, axis=-1)
    idx = jnp.where(any_ok, first_ok, retries - 1)
    return jnp.take_along_axis(draws, idx[..., None], axis=-1)[..., 0]
