"""CARCA model assembly.

Orchestration contract (``src/carca.py:401-431``): mask the profile
(id≠0), embed it (+positional encoding, +dropout), run the encoder stack,
apply a final LayerNorm, then for each target tuple: embed **without**
positional encoding, decode against the encoded profile, and concatenate the
per-candidate scores along the last axis.

Training calls with targets=[positives, negatives] (two [B,L] groups,
``src/train.py:86-91``); evaluation with one [B, 101] candidate group
(``src/train.py:44``).

TPU-native notes: attribute vectors may be gathered on device from
``attrs_table`` (pass ``p_a=None``/``o_a=None``); the whole forward is
jit/pjit-compatible with static ``train`` and a threaded PRNG key for the
three dropout sites (embedding, attention weights, FFN).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from carca_tpu.config import ModelConfig
from carca_tpu.models import decoders, embeddings, encoder, layers
from carca_tpu.utils.masking import get_mask

Params = Dict[str, jnp.ndarray]
Group = Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]


def carca_init(key: jax.Array, cfg: ModelConfig) -> Params:
    k_emb, k_dec, *k_blocks = jax.random.split(key, 2 + cfg.n_blocks)
    return {
        "embed": embeddings.embedding_init(k_emb, cfg),
        "blocks": [encoder.encoder_block_init(k, cfg) for k in k_blocks],
        "norm": layers.layer_norm_init(cfg.d),
        "decoder": decoders.decoder_init(k_dec, cfg),
    }


def encode_profile(
    params: Params,
    cfg: ModelConfig,
    profile: Group,
    *,
    train: bool,
    rng: Optional[jax.Array] = None,
    attrs_table: Optional[jnp.ndarray] = None,
    lookup=embeddings._default_lookup,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the profile tower: returns (encoded profile [B,L,d], p_mask)."""
    p_x, p_a, p_c = profile
    p_mask = get_mask(p_x)

    n_rngs = 1 + cfg.n_blocks
    rngs = list(jax.random.split(rng, n_rngs)) if rng is not None else [None] * n_rngs

    p_e = embeddings.embedding_apply(
        params["embed"], cfg, p_x, p_a, p_c, p_mask,
        target=False, attrs_table=attrs_table, lookup=lookup,
    )
    p_e = layers.dropout(rngs[0], p_e, cfg.dropout, train)  # src/carca.py:416

    if cfg.remat:
        # close over the static cfg/train; jax.checkpoint takes only
        # positional pytree args
        def block_fn(bp, x, mask, r):
            return encoder.encoder_block_apply(bp, cfg, x, mask,
                                               train=train, rng=r)
        block_fn = jax.checkpoint(block_fn)
    else:
        def block_fn(bp, x, mask, r):
            return encoder.encoder_block_apply(bp, cfg, x, mask,
                                               train=train, rng=r)
    for bp, br in zip(params["blocks"], rngs[1:]):
        p_e = block_fn(bp, p_e, p_mask, br)

    p_e = layers.layer_norm(params["norm"], p_e)  # src/carca.py:421
    return p_e, p_mask


def score_targets(
    params: Params,
    cfg: ModelConfig,
    p_e: jnp.ndarray,
    p_mask: jnp.ndarray,
    targets: Sequence[Group],
    *,
    train: bool,
    rng: Optional[jax.Array] = None,
    attrs_table: Optional[jnp.ndarray] = None,
    lookup=embeddings._default_lookup,
    return_logits: bool = False,
) -> jnp.ndarray:
    """Embed + decode each target group; concat scores (src/carca.py:424-431).

    The reference loops over target groups on device (``src/carca.py:424-429``
    — the per-target Python loop flagged in SURVEY §3.3). Here same-shaped
    groups (the train-time [pos, neg] pair) are folded into the batch
    dimension and decoded in ONE embedding + decoder call: every row's math
    is unchanged (attention/decoding is independent per batch element and
    each group spans target positions 0..L-1, so the causal −1 offset is
    identical), but the matmuls double in size instead of doubling in count.
    """
    b = p_e.shape[0]
    same_shape = (len(targets) > 1
                  and all(t[0].shape == targets[0][0].shape for t in targets)
                  and all((t[1] is None) == (targets[0][1] is None) and
                          (t[2] is None) == (targets[0][2] is None)
                          for t in targets))
    if same_shape:
        g = len(targets)
        cat = lambda i: (None if targets[0][i] is None else
                         jnp.concatenate([t[i] for t in targets], axis=0))
        o_x, o_a, o_c = cat(0), cat(1), cat(2)
        o_mask = get_mask(o_x)
        o_e = embeddings.embedding_apply(
            params["embed"], cfg, o_x, o_a, o_c, o_mask,
            target=True, attrs_table=attrs_table, lookup=lookup,
        )
        tile = lambda x: jnp.concatenate([x] * g, axis=0)
        y = decoders.decoder_apply(
            params["decoder"], cfg, o_e, o_mask, tile(p_e), tile(p_mask),
            train=train, rng=rng, return_logits=return_logits,
        )
        # [G·B, L] → scores concatenated group-major along the last axis
        return y.reshape(g, b, -1).transpose(1, 0, 2).reshape(b, -1)

    rngs = list(jax.random.split(rng, len(targets))) if rng is not None else [None] * len(targets)
    y_preds: List[jnp.ndarray] = []
    for (o_x, o_a, o_c), r in zip(targets, rngs):
        o_mask = get_mask(o_x)
        o_e = embeddings.embedding_apply(
            params["embed"], cfg, o_x, o_a, o_c, o_mask,
            target=True, attrs_table=attrs_table, lookup=lookup,
        )
        y = decoders.decoder_apply(
            params["decoder"], cfg, o_e, o_mask, p_e, p_mask,
            train=train, rng=r, return_logits=return_logits,
        )
        y_preds.append(y)
    return jnp.concatenate(y_preds, axis=-1)


def carca_apply(
    params: Params,
    cfg: ModelConfig,
    profile: Group,
    targets: Sequence[Group],
    *,
    train: bool,
    rng: Optional[jax.Array] = None,
    attrs_table: Optional[jnp.ndarray] = None,
    lookup=embeddings._default_lookup,
    return_logits: bool = False,
) -> jnp.ndarray:
    """Full forward: profile + target groups → concatenated scores.

    Train: targets=[(pos…), (neg…)] → [B, 2L]; with
    ``TrainConfig.n_train_negatives=K``, [B, (1+K)L]. Eval: one group →
    [B, T+1]. ``return_logits=True`` returns pre-sigmoid scores (the
    sampled-softmax objective's input; see ``decoders.decoder_apply``).
    """
    if rng is not None:
        rng_p, rng_t = jax.random.split(rng)
    else:
        rng_p = rng_t = None
    p_e, p_mask = encode_profile(
        params, cfg, profile, train=train, rng=rng_p,
        attrs_table=attrs_table, lookup=lookup,
    )
    return score_targets(
        params, cfg, p_e, p_mask, targets, train=train, rng=rng_t,
        attrs_table=attrs_table, lookup=lookup, return_logits=return_logits,
    )
