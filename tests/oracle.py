"""Pure-numpy oracle of the CARCA forward pass, re-derived step by step from
the behavioral contract in SURVEY.md §2.1 #2-9 (not imported or translated
from the reference). Deliberately written with explicit loops / per-head
slicing — structurally unlike the jnp implementation — so transcription
errors in either side surface as mismatches.

Consumes the same param pytrees as carca_tpu (weights [in, out]).
Eval-mode only (no dropout).
"""

import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def softmax(x):
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def layer_norm(p, x, eps=1e-5):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * np.asarray(p["scale"]) + np.asarray(p["bias"])


def dense(p, x):
    return x @ np.asarray(p["w"]) + np.asarray(p["b"])


def mha(params, q_in, k_in, v_in, q_mask, k_mask, causal, n_heads):
    """Reference MHA semantics: pairwise mask ⊗, tril(offset), additive
    −(2^32−1) added BEFORE the √(d/H) scale, post-softmax re-mask, no W_O."""
    q = dense(params["wq"], q_in)
    k = dense(params["wk"], k_in)
    v = dense(params["wv"], v_in)
    B, Lq, d = q.shape
    Lk = k.shape[1]
    dh = d // n_heads
    out = np.zeros((B, Lq, d))
    for b in range(B):
        pair = np.outer(q_mask[b], k_mask[b])  # [Lq, Lk]
        if causal is not None:
            tri = np.zeros((Lq, Lk))
            for i in range(Lq):
                for j in range(Lk):
                    if j <= i + causal:
                        tri[i, j] = 1.0
            pair = pair * tri
        add = np.where(pair > 0, 0.0, -(2.0**32) + 1.0)
        for h in range(n_heads):
            qh = q[b, :, h * dh: (h + 1) * dh]
            kh = k[b, :, h * dh: (h + 1) * dh]
            vh = v[b, :, h * dh: (h + 1) * dh]
            logits = (qh @ kh.T + add) / np.sqrt(d / n_heads)
            w = softmax(logits) * pair  # re-mask after softmax
            out[b, :, h * dh: (h + 1) * dh] = w @ vh
    return out


def leaky_relu(x, slope=0.01):
    return np.where(x >= 0, x, slope * x)


def embed_all(params, cfg, x, a, c, mask, target):
    """All five feature-fusion embedding kinds (src/carca.py:66-198).
    Packed item tables are unpacked before indexing (storage-only
    transform; ops/packed_table.py)."""
    kind = cfg.embedding

    def items(width):
        t = np.asarray(params["items"])
        if t.shape[-1] != width:  # lane-packed storage
            t = t.reshape(-1, width)
        return t[x]

    if kind == "all":
        q = dense(params["feats"], np.concatenate([a, c], axis=-1))
        z = items(cfg.d) * np.sqrt(cfg.d)
        e = dense(params["joint"], np.concatenate([z, q], axis=-1))
    elif kind == "attrctx":
        q = dense(params["feats"], np.concatenate([a, c], axis=-1))
        e = dense(params["joint"], q)
    elif kind == "attr":
        q = dense(params["feats"], a)
        e = dense(params["joint"], q)
    elif kind == "id":
        e = items(cfg.d) * np.sqrt(cfg.d)
    elif kind == "mlpid":
        e = items(cfg.g) * np.sqrt(cfg.d)  # √d scale on the g-dim table
        e = dense(params["feats"], e)
    else:
        raise ValueError(kind)
    if not target:
        e = apply_encoding(params["enc"], cfg.encoding, e)
    return e * mask[..., None]


def apply_encoding(p, kind, e):
    if kind == "identity":
        return e
    if kind == "learnable":
        return e + np.asarray(p["table"])[None, : e.shape[1]]
    if kind == "positional":
        return e + np.asarray(p["pe"])[None, : e.shape[1]]
    raise ValueError(kind)


def encoder_block(params, cfg, x, mask):
    q = layer_norm(params["norm1"], x)
    s = mha(params["attn"], q, x, x, mask, mask, causal=0, n_heads=cfg.n_heads)
    if cfg.residual_sa:
        s = s + q
    s = layer_norm(params["norm2"], s)
    f = dense(params["ffn1"], s)
    f = leaky_relu(f)
    f = dense(params["ffn2"], f)
    if cfg.residual_sa:
        f = f + s
    return f


def decode(params, cfg, o, o_mask, p, p_mask, train):
    if cfg.decoder == "ca":
        causal = -1 if train else None
        s = mha(params["attn"], o, p, p, o_mask, p_mask, causal, cfg.n_heads)
        if cfg.residual_ca:
            s = s + o
        return sigmoid(dense(params["ffn"], s)[..., 0])
    if cfg.decoder == "dot":
        y = (p * o).sum(-1) if train else (p[:, -1:, :] * o).sum(-1)
        return sigmoid(y)
    if cfg.decoder == "wdot":
        # naive reference construction: W[i,j] = γ^j tril'd; pw[b,i,j]=p[b,i]
        L = p.shape[1]
        W = np.tril(np.tile(cfg.gamma ** np.arange(L, dtype=np.float64), (L, 1)))
        pw = np.repeat(p[:, :, None, :], L, axis=2)
        pn = (pw * W[None, :, :, None]).sum(axis=2)
        on = o
        if cfg.l2_norm:
            pn = pn / np.maximum(np.linalg.norm(pn, axis=-1, keepdims=True), 1e-12)
            on = on / np.maximum(np.linalg.norm(on, axis=-1, keepdims=True), 1e-12)
        y = (pn * on).sum(-1) if train else (pn[:, -1:, :] * on).sum(-1)
        return (y + 1.0) / 2.0 if cfg.l2_norm else sigmoid(y)
    raise ValueError(cfg.decoder)


def carca_forward(params, cfg, profile, targets, train=False):
    """Eval-mode forward (dropout=identity). train flag only controls the
    decoder's causal/дot semantics, as in model.eval() vs .train()."""
    p_x, p_a, p_c = profile
    p_mask = (p_x != 0).astype(np.float64)
    p_e = embed_all(params["embed"], cfg, p_x, p_a, p_c, p_mask, target=False)
    for bp in params["blocks"]:
        p_e = encoder_block(bp, cfg, p_e, p_mask)
    p_e = layer_norm(params["norm"], p_e)
    ys = []
    for o_x, o_a, o_c in targets:
        o_mask = (o_x != 0).astype(np.float64)
        o_e = embed_all(params["embed"], cfg, o_x, o_a, o_c, o_mask, target=True)
        ys.append(decode(params["decoder"], cfg, o_e, o_mask, p_e, p_mask, train))
    return np.concatenate(ys, axis=-1)


def masked_bce(y_pred, y_true, mask, eps=1e-8):
    loss = -(y_true * np.log(y_pred + eps) + (1 - y_true) * np.log(1 - y_pred + eps))
    return (loss * mask).sum() / mask.sum()
