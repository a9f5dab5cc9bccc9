"""Pallas kernel vs jnp-oracle parity (interpret mode on CPU).

The fused attention kernel must reproduce the reference MHA semantics
(SURVEY.md §2.1 #4): pre-scale additive mask, post-softmax re-mask, causal
offsets 0/−1/None, no W_O — both forward values and gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carca_tpu.models import attention
from carca_tpu.ops.flash_attention import fused_attention


def _rand_inputs(key, b, lq, lk, d, frac_pad=0.3):
    ks = jax.random.split(key, 5)
    q = jax.random.normal(ks[0], (b, lq, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, lk, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, lk, d), jnp.float32)
    # right-aligned masks like real profiles; one row fully padded
    qm = (jax.random.uniform(ks[3], (b, lq)) > frac_pad).astype(jnp.float32)
    km = (jax.random.uniform(ks[4], (b, lk)) > frac_pad).astype(jnp.float32)
    qm = qm.at[0].set(0.0)
    km = km.at[0].set(0.0)
    return q, k, v, qm, km


def _oracle(q, k, v, qm, km, causal, scale, n_heads):
    b, lq, d = q.shape
    dh = d // n_heads

    def heads(x):
        return x.reshape(b, x.shape[1], n_heads, dh).transpose(0, 2, 1, 3)

    m = attention.pair_mask(qm, km, causal)
    add = jnp.where(m > 0, 0.0, attention.NEG_MASK)
    logits = jnp.einsum("bhqe,bhke->bhqk", heads(q), heads(k),
                        preferred_element_type=jnp.float32)
    logits = (logits + add[:, None]) / scale
    w = jax.nn.softmax(logits, axis=-1) * m[:, None]
    out = jnp.einsum("bhqk,bhke->bhqe", w, heads(v),
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(b, lq, d)


CASES = [
    # (b, lq, lk, d, n_heads, causal)
    (3, 10, 10, 16, 2, 0),       # encoder self-attention
    (3, 20, 10, 16, 2, -1),      # train-time cross-attention
    (3, 21, 10, 16, 4, None),    # eval cross-attention, odd Lq
    (2, 7, 13, 32, 1, None),     # single head, ragged sizes
]


@pytest.mark.parametrize("b,lq,lk,d,n_heads,causal", CASES)
def test_fused_attention_forward_matches_oracle(b, lq, lk, d, n_heads, causal):
    q, k, v, qm, km = _rand_inputs(jax.random.PRNGKey(0), b, lq, lk, d)
    scale = (d / n_heads) ** 0.5
    got = fused_attention(q, k, v, qm, km, causal=causal, scale=scale,
                          n_heads=n_heads)
    want = _oracle(q, k, v, qm, km, causal, scale, n_heads)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("b,lq,lk,d,n_heads,causal", CASES[:3])
def test_fused_attention_grads_match_oracle(b, lq, lk, d, n_heads, causal):
    q, k, v, qm, km = _rand_inputs(jax.random.PRNGKey(1), b, lq, lk, d)
    scale = (d / n_heads) ** 0.5
    co = jax.random.normal(jax.random.PRNGKey(2), (b, lq, d), jnp.float32)

    def loss_fused(q, k, v):
        out = fused_attention(q, k, v, qm, km, causal=causal, scale=scale,
                              n_heads=n_heads)
        return jnp.sum(out * co)

    def loss_oracle(q, k, v):
        return jnp.sum(_oracle(q, k, v, qm, km, causal, scale, n_heads) * co)

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    for g, w, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-4, atol=1e-4, err_msg=f"d{name}")


def test_fused_attention_padded_rows_emit_zero():
    q, k, v, qm, km = _rand_inputs(jax.random.PRNGKey(3), 2, 8, 8, 16)
    out = fused_attention(q, k, v, qm, km, causal=0, scale=2.0, n_heads=2)
    # fully-masked batch row 0 → exact zeros (post-softmax re-mask)
    np.testing.assert_array_equal(np.asarray(out[0]), 0.0)
    # padded query rows → zeros
    np.testing.assert_array_equal(np.asarray(out[1] * (1 - qm[1][:, None])), 0.0)


def test_mha_apply_pallas_path_matches_jnp_path():
    """End-to-end through mha_apply (projections included)."""
    d, h = 16, 2
    key = jax.random.PRNGKey(4)
    params = attention.mha_init(key, d)
    q, k, v, qm, km = _rand_inputs(jax.random.PRNGKey(5), 3, 12, 9, d)
    kw = dict(n_heads=h, causal=None, dropout_rate=0.0, train=False, rng=None)
    ref = attention.mha_apply(params, q, k, v, qm, km, use_pallas=False, **kw)
    fused = attention.mha_apply(params, q, k, v, qm, km, use_pallas=True, **kw)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_dropout_fallback_shape_and_scale():
    """CPU fallback path with dropout: masked-out rows stay zero, mean is
    preserved in expectation (loose statistical check)."""
    q, k, v, qm, km = _rand_inputs(jax.random.PRNGKey(6), 4, 10, 10, 16,
                                   frac_pad=0.0)
    out = fused_attention(q, k, v, qm, km, causal=0, scale=2.0, n_heads=2,
                          dropout_rate=0.5, rng=jax.random.PRNGKey(7))
    assert out.shape == (4, 10, 16)
    assert np.isfinite(np.asarray(out)).all()


def test_block_b_working_set_fits_scoped_vmem():
    """Regression: the bwd working-set estimate must keep every realistic
    shape under the kernel's scoped-VMEM limit. The folded-target decoder
    at small dims (B=128, bq=16, Lkp=128, dh=32) previously overflowed the
    16 MB default because lane padding (minor dim → 128) was ignored."""
    from carca_tpu.ops.flash_attention import (
        _VMEM_LIMIT, _bwd_vmem_bytes, _pick_block_b, _round_up)

    shapes = []
    for b in (32, 64, 128, 256, 512, 2048):
        for lq in (10, 16, 50, 101, 200, 512):
            for lk in (10, 50, 128, 200, 256):
                for dh in (16, 32, 64, 128):
                    shapes.append((b, lq, lk, dh))
    for b, lq, lk, dh in shapes:
        bq = min(512, max(8, _round_up(lq, 8)))
        lkp = _round_up(lk, 128)
        bb = _pick_block_b(b, bq, lkp, dh)
        assert b % bb == 0
        assert _bwd_vmem_bytes(bb, bq, lkp, dh) <= _VMEM_LIMIT, (b, lq, lk, dh)

    # lane padding is modeled: at dh=32 a K/V block costs 4x its logical size
    assert _bwd_vmem_bytes(8, 16, 128, 32) == _bwd_vmem_bytes(8, 16, 128, 128)


def test_fused_attention_out_of_regime_falls_back_to_jnp():
    """Shapes whose backward working set cannot fit scoped VMEM at any
    block size must produce the jnp math, not a Mosaic compile error."""
    from carca_tpu.ops import flash_attention as fa

    # huge Lk: K/V blocks alone exceed the budget even at bb=1, bq=8
    b, lq, lk, d, h = 1, 8, 70_000, 16, 2
    assert fa._bwd_vmem_bytes(1, 8, fa._round_up(lk, 128), d // h) > (
        fa._VMEM_LIMIT * 2) // 3
    q, k, v, qm, km = _rand_inputs(jax.random.PRNGKey(0), b, lq, lk, d)
    scale = (d / h) ** 0.5
    out = fused_attention(q, k, v, qm, km, causal=None, scale=scale,
                          n_heads=h)
    ref = _oracle(q, k, v, qm, km, None, scale, h)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_catalog_topk_shard_slice_pad_rows_masked():
    """Regression: a non-last shard's kernel-side zero-pad rows [r, rp)
    entered the top-k with fabricated score 0 under the NEXT shard's ids
    whenever all real scores were negative (cosine decoders, exclusion
    tails)."""
    from carca_tpu.ops.retrieval_topk import catalog_topk

    rng = np.random.default_rng(0)
    q = jnp.asarray(np.abs(rng.normal(size=(4, 16))) + 0.1, jnp.float32)
    e = jnp.asarray(-np.abs(rng.normal(size=(130, 16))) - 1.0, jnp.float32)
    # simulate shard 1 of many: rows are ids 1000..1129 of a 5000-id catalog
    v, ids = catalog_topk(q, e, 5, n_items=5000, id_offset=1000)
    ids = np.asarray(ids)
    assert (ids < 1130).all(), f"phantom pad-row ids returned: {ids}"
    assert np.isfinite(np.asarray(v)).all()
    # scores must be genuinely negative (no fabricated zeros)
    assert (np.asarray(v) < 0).all()


def test_catalog_topk_k_exceeding_chunk_raises():
    from carca_tpu.ops.retrieval_topk import catalog_topk

    q = jnp.zeros((4, 16))
    e = jnp.zeros((4096, 16))
    with pytest.raises(ValueError, match="chunk width"):
        catalog_topk(q, e, 200, n_items=4096, chunk=128)


def test_fused_path_raises_without_rng():
    """Both dispatch paths fail identically when dropout needs an rng —
    the fused kernel must not silently train without attention dropout."""
    from carca_tpu.models.attention import mha_apply, mha_init

    params = mha_init(jax.random.PRNGKey(0), 16)
    x = jnp.ones((2, 4, 16))
    m = jnp.ones((2, 4))
    for use_pallas in (False, True):
        with pytest.raises(ValueError, match="rng"):
            mha_apply(params, x, x, x, m, m, n_heads=2, causal=0,
                      dropout_rate=0.5, train=True, rng=None,
                      use_pallas=use_pallas)


def test_fused_kernel_bf16_matches_oracle_bf16():
    """compute_dtype='bfloat16' must actually reach the kernel's QK^T /
    PV matmuls and match the jnp oracle's bf16 semantics."""
    from carca_tpu.models.attention import mha_apply, mha_init

    rng = np.random.default_rng(1)
    d, H, B, L = 32, 2, 2, 16
    params = mha_init(jax.random.PRNGKey(1), d)
    x = jnp.asarray(rng.normal(size=(B, L, d)), jnp.float32)
    mask = jnp.ones((B, L))
    kw = dict(n_heads=H, causal=0, dropout_rate=0.0, train=False, rng=None,
              compute_dtype=jnp.bfloat16)
    ref = mha_apply(params, x, x, x, mask, mask, use_pallas=False, **kw)
    got = mha_apply(params, x, x, x, mask, mask, use_pallas=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)  # bf16 rounding

