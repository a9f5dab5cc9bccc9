"""Model golden tests: carca_tpu's jnp forward vs the independent numpy
oracle (tests/oracle.py), plus targeted semantics checks (SURVEY.md §2.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import oracle
from carca_tpu.config import ModelConfig
from carca_tpu.models.attention import mha_apply, mha_init, pair_mask
from carca_tpu.models.carca import carca_apply, carca_init
from carca_tpu.models.embeddings import embedding_apply, embedding_init
from carca_tpu.models.knn import knn_apply
from carca_tpu.models.losses import masked_bce
from carca_tpu.utils.masking import get_mask

B, L, NI, NA, NC, D, G = 3, 6, 40, 5, 3, 16, 24


def mk_cfg(**kw):
    base = dict(n_items=NI, n_attrs=NA, n_ctx=NC, d=D, g=G, seq_len=L,
                n_blocks=2, n_heads=2, dropout=0.0)
    base.update(kw)
    return ModelConfig(**base)


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    p_x = rng.integers(0, NI, (B, L)).astype(np.int32)
    p_x[:, : L // 2] = 0  # left padding
    o_x = rng.integers(1, NI, (B, L)).astype(np.int32)
    attrs = rng.standard_normal((NI, NA)).astype(np.float32)
    attrs[0] = 0
    p_c = rng.standard_normal((B, L, NC)).astype(np.float32)
    o_c = rng.standard_normal((B, L, NC)).astype(np.float32)
    return p_x, o_x, attrs, p_c, o_c


def to_np(tree):
    return jax.tree.map(np.asarray, tree)


@pytest.mark.parametrize("decoder", ["ca", "dot", "wdot"])
@pytest.mark.parametrize("train", [False, True])
def test_forward_matches_oracle(batch, decoder, train):
    cfg = mk_cfg(decoder=decoder)
    p_x, o_x, attrs, p_c, o_c = batch
    params = carca_init(jax.random.PRNGKey(1), cfg)
    profile = (p_x, attrs[p_x], p_c)
    targets = [(o_x, attrs[o_x], o_c), (o_x[:, ::-1], attrs[o_x[:, ::-1]], o_c)]
    # dropout=0 → train only flips decoder causal/dot semantics
    got = carca_apply(params, cfg, profile, targets, train=train,
                      rng=jax.random.PRNGKey(2))
    want = oracle.carca_forward(to_np(params), cfg, profile, targets, train=train)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("encoding", ["learnable", "positional"])
def test_encodings_match_oracle(batch, encoding):
    cfg = mk_cfg(encoding=encoding)
    p_x, o_x, attrs, p_c, o_c = batch
    params = carca_init(jax.random.PRNGKey(3), cfg)
    got = carca_apply(params, cfg, (p_x, attrs[p_x], p_c),
                      [(o_x, attrs[o_x], o_c)], train=False)
    want = oracle.carca_forward(to_np(params), cfg, (p_x, attrs[p_x], p_c),
                                [(o_x, attrs[o_x], o_c)])
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("l2_norm", [False, True])
def test_wdot_closed_form(batch, l2_norm):
    """The closed-form wdot must equal the naive [B,L,L,d] construction."""
    cfg = mk_cfg(decoder="wdot", l2_norm=l2_norm, n_blocks=1)
    p_x, o_x, attrs, p_c, o_c = batch
    params = carca_init(jax.random.PRNGKey(4), cfg)
    for train in (False, True):
        got = carca_apply(params, cfg, (p_x, attrs[p_x], p_c),
                          [(o_x, attrs[o_x], o_c)], train=train)
        want = oracle.carca_forward(to_np(params), cfg, (p_x, attrs[p_x], p_c),
                                    [(o_x, attrs[o_x], o_c)], train=train)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_pair_mask_causal_offsets():
    qm = jnp.ones((1, 4))
    km = jnp.ones((1, 5))
    # causal=0: k ≤ q
    m0 = np.asarray(pair_mask(qm, km, 0))[0]
    for i in range(4):
        for j in range(5):
            assert m0[i, j] == (1.0 if j <= i else 0.0)
    # causal=−1: k < q (train-time cross-attention, src/carca.py:339)
    m1 = np.asarray(pair_mask(qm, km, -1))[0]
    for i in range(4):
        for j in range(5):
            assert m1[i, j] == (1.0 if j < i else 0.0)
    # None: padding-only
    mn = np.asarray(pair_mask(qm, km, None))[0]
    assert (mn == 1).all()


def test_masked_query_rows_emit_zero():
    """Post-softmax re-mask: fully-masked queries output exactly 0
    (src/carca.py:256)."""
    d, H = 8, 2
    params = mha_init(jax.random.PRNGKey(0), d)
    q = jnp.ones((2, 4, d))
    q_mask = jnp.array([[0, 0, 1, 1], [1, 1, 1, 1]], jnp.float32)
    k_mask = jnp.ones((2, 4))
    out = mha_apply(params, q, q, q, q_mask, k_mask, n_heads=H, causal=None,
                    dropout_rate=0.0, train=False, rng=None)
    assert np.abs(np.asarray(out)[0, :2]).max() == 0.0
    assert np.abs(np.asarray(out)[0, 2:]).max() > 0.0


def test_first_row_causal_zero():
    """With causal=−1 the first query row attends nothing → zero output."""
    d, H = 8, 2
    params = mha_init(jax.random.PRNGKey(0), d)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, d))
    m = jnp.ones((1, 4))
    out = mha_apply(params, x, x, x, m, m, n_heads=H, causal=-1,
                    dropout_rate=0.0, train=False, rng=None)
    assert np.abs(np.asarray(out)[0, 0]).max() == 0.0


def test_embedding_semantics(batch):
    cfg = mk_cfg(embedding="id")
    p_x, o_x, attrs, p_c, o_c = batch
    params = embedding_init(jax.random.PRNGKey(5), cfg)
    mask = get_mask(jnp.asarray(p_x))
    e = embedding_apply(params, cfg, p_x, None, None, mask, target=True)
    # √d scaling of the id table (src/carca.py:88,165)
    want = np.asarray(params["items"])[p_x] * np.sqrt(D) * np.asarray(mask)[..., None]
    np.testing.assert_allclose(np.asarray(e), want, rtol=1e-5)
    # pad row embeds to zero
    assert np.abs(np.asarray(e)[p_x == 0]).max() == 0.0
    # positional encoding applied to profile but not targets (src/carca.py:91-92)
    cfg2 = mk_cfg(embedding="id", encoding="learnable")
    params2 = embedding_init(jax.random.PRNGKey(6), cfg2)
    e_prof = embedding_apply(params2, cfg2, p_x, None, None, mask, target=False)
    e_tgt = embedding_apply(params2, cfg2, p_x, None, None, mask, target=True)
    table = np.asarray(params2["enc"]["table"])
    np.testing.assert_allclose(
        np.asarray(e_prof),
        (np.asarray(e_tgt) / np.maximum(np.asarray(mask)[..., None], 1e-30)
         * np.asarray(mask)[..., None]
         + table[None, :L]) * np.asarray(mask)[..., None],
        rtol=1e-4, atol=1e-5)


def test_device_gather_equals_explicit_attrs(batch):
    cfg = mk_cfg(embedding="all", decoder="ca")
    p_x, o_x, attrs, p_c, o_c = batch
    params = carca_init(jax.random.PRNGKey(7), cfg)
    y1 = carca_apply(params, cfg, (p_x, attrs[p_x], p_c),
                     [(o_x, attrs[o_x], o_c)], train=False)
    y2 = carca_apply(params, cfg, (p_x, None, p_c), [(o_x, None, o_c)],
                     train=False, attrs_table=jnp.asarray(attrs))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_bce_matches_oracle():
    rng = np.random.default_rng(1)
    y_pred = rng.uniform(0.01, 0.99, (4, 10)).astype(np.float32)
    y_true = (rng.uniform(size=(4, 10)) > 0.5).astype(np.float32)
    mask = (rng.uniform(size=(4, 10)) > 0.3).astype(np.float32)
    got = float(masked_bce(jnp.asarray(y_pred), jnp.asarray(y_true), jnp.asarray(mask)))
    want = oracle.masked_bce(y_pred, y_true, mask)
    assert abs(got - want) < 1e-5


def test_bce_saturated_sigmoid_finite_under_jit():
    """Regression: XLA reassociates ``(1 − ŷ) + eps`` into ``(1 + eps) − ŷ``
    which is exactly 0 in f32 when a sigmoid saturates to 1.0 (routine for
    unnormalized dot logits over ≥100k-item catalogs) → −inf loss, NaN
    grads. The loss must stay finite, with finite grads, at exact 0/1
    probabilities *inside jit*."""
    y_pred = jnp.asarray([1.0, 0.0, 1.0, 0.0], jnp.float32)
    y_true = jnp.asarray([0.0, 1.0, 1.0, 0.0], jnp.float32)
    mask = jnp.ones(4, jnp.float32)
    loss = float(jax.jit(masked_bce)(y_pred, y_true, mask))
    assert np.isfinite(loss)
    assert abs(loss - (2 * -np.log(1e-8)) / 4) < 1e-3  # two saturated-wrong terms

    def through_sigmoid(logits):
        return masked_bce(jax.nn.sigmoid(logits), y_true, mask)

    g = jax.jit(jax.grad(through_sigmoid))(
        jnp.asarray([40.0, -40.0, 40.0, -40.0], jnp.float32))
    assert np.isfinite(np.asarray(g)).all()


def test_knn(batch):
    p_x, o_x, attrs, p_c, o_c = batch
    y = knn_apply((p_x, attrs[p_x], p_c), [(o_x, attrs[o_x], o_c)])
    want = (attrs[p_x][:, -1:, :] * attrs[o_x]).sum(-1)
    np.testing.assert_allclose(np.asarray(y), want, rtol=1e-5)
    # ids-only path
    y2 = knn_apply((p_x, None, None), [(o_x, None, None)],
                   attrs_table=jnp.asarray(attrs))
    np.testing.assert_allclose(np.asarray(y2), want, rtol=1e-5)


def test_dropout_changes_train_only():
    cfg = mk_cfg(dropout=0.5, decoder="ca")
    rngp = jax.random.PRNGKey(8)
    params = carca_init(rngp, cfg)
    rng = np.random.default_rng(2)
    p_x = rng.integers(1, NI, (B, L)).astype(np.int32)
    o_x = rng.integers(1, NI, (B, L)).astype(np.int32)
    attrs = rng.standard_normal((NI, NA)).astype(np.float32)
    p_c = rng.standard_normal((B, L, NC)).astype(np.float32)
    prof, tgts = (p_x, attrs[p_x], p_c), [(o_x, attrs[o_x], p_c)]
    y_a = carca_apply(params, cfg, prof, tgts, train=True, rng=jax.random.PRNGKey(1))
    y_b = carca_apply(params, cfg, prof, tgts, train=True, rng=jax.random.PRNGKey(2))
    y_c = carca_apply(params, cfg, prof, tgts, train=False)
    y_d = carca_apply(params, cfg, prof, tgts, train=False)
    assert (np.asarray(y_a) != np.asarray(y_b)).any()  # rng-dependent at train
    np.testing.assert_array_equal(np.asarray(y_c), np.asarray(y_d))  # eval deterministic


def test_remat_matches_no_remat(batch):
    """jax.checkpoint on the encoder stack must not change values or grads."""
    p_x, o_x, attrs, p_c, o_c = batch
    key = jax.random.PRNGKey(9)
    cfg0 = mk_cfg(decoder="ca", remat=False)
    cfg1 = mk_cfg(decoder="ca", remat=True)
    params = carca_init(key, cfg0)
    at = jnp.asarray(attrs)
    profile = (jnp.asarray(p_x), None, jnp.asarray(p_c))
    targets = [(jnp.asarray(o_x), None, jnp.asarray(o_c))]

    def loss(params, cfg):
        y = carca_apply(params, cfg, profile, targets, train=False,
                        attrs_table=at)
        return jnp.sum(y ** 2)

    v0, g0 = jax.value_and_grad(loss)(params, cfg0)
    v1, g1 = jax.value_and_grad(loss)(params, cfg1)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_metrics_nan_scores_rank_last():
    """A diverged model (NaN predictions) must not report HR=1.0 — NaN
    scores rank last, so metrics degrade toward 0 while the loss carries
    the NaN signal."""
    from carca_tpu.train.metrics import hr_ndcg_sums

    y_pred = jnp.asarray([[np.nan, np.nan, 0.9, 0.1],
                          [np.nan, 0.8, 0.2, 0.1]], jnp.float32)
    y_true = jnp.asarray([[1.0, 0, 0, 0],
                          [1.0, 0, 0, 0]], jnp.float32)
    hr, ndcg = jax.jit(hr_ndcg_sums, static_argnums=2)(y_pred, y_true, 2)
    assert float(hr) == 0.0 and float(ndcg) == 0.0
    # all-NaN rows likewise contribute nothing
    hr, _ = jax.jit(hr_ndcg_sums, static_argnums=2)(
        jnp.full((2, 4), jnp.nan), y_true, 2)
    assert float(hr) == 0.0


def test_wdot_l2_norm_grads_finite():
    """Regression: the cosine (l2_norm) decoder's backward pass NaN'd on
    exactly-zero candidate embeddings (pad slots) — jnp.linalg.norm's
    gradient at 0 is 0/0 even under a maximum() guard. Grads must be
    finite with padded targets present."""
    cfg = mk_cfg(decoder="wdot", l2_norm=True, n_blocks=1)
    rng = np.random.default_rng(3)
    p_x = rng.integers(1, NI, (2, L)).astype(np.int32)
    o_x = rng.integers(1, NI, (2, L)).astype(np.int32)
    o_x[:, : L // 2] = 0  # padded candidates → zero embeddings
    attrs = rng.standard_normal((NI, NA)).astype(np.float32)
    attrs[0] = 0
    p_c = rng.standard_normal((2, L, NC)).astype(np.float32)
    o_c = rng.standard_normal((2, L, NC)).astype(np.float32)
    params = carca_init(jax.random.PRNGKey(9), cfg)

    def loss(params):
        y = carca_apply(params, cfg, (p_x, attrs[p_x], p_c),
                        [(o_x, attrs[o_x], o_c)], train=True,
                        rng=jax.random.PRNGKey(0))
        return masked_bce(y, jnp.ones_like(y[..., :]) * 0.5,
                          get_mask(jnp.asarray(o_x)))

    g = jax.jit(jax.grad(loss))(params)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert np.isfinite(np.asarray(leaf)).all(), jax.tree_util.keystr(path)


@pytest.mark.parametrize("trial", range(12))
def test_fuzz_forward_parity(trial):
    """Seeded sweep over the whole plug-board (random embedding x encoding
    x decoder x dims x residual flags x masks) against the numpy oracle —
    coverage of combinations the targeted tests don't enumerate."""
    rng = np.random.default_rng(1000 + trial)
    cfg = mk_cfg(
        embedding=str(rng.choice(["all", "attrctx", "attr", "id", "mlpid"])),
        encoding=str(rng.choice(["identity", "learnable", "positional"])),
        decoder=str(rng.choice(["ca", "dot", "wdot"])),
        d=int(rng.choice([8, 16, 32])),
        g=int(rng.choice([16, 24])),
        n_blocks=int(rng.integers(1, 4)),
        n_heads=int(rng.choice([1, 2, 4])),
        residual_sa=bool(rng.integers(0, 2)),
        residual_ca=bool(rng.integers(0, 2)),
        l2_norm=bool(rng.integers(0, 2)),
        gamma=float(rng.uniform(0.5, 1.0)),
        seq_len=int(rng.integers(3, 9)),
    )
    L = cfg.seq_len
    b = int(rng.integers(1, 5))
    p_x = rng.integers(0, NI, (b, L)).astype(np.int32)
    pad = int(rng.integers(0, L))
    p_x[:, :pad] = 0
    o_x = rng.integers(1, NI, (b, L)).astype(np.int32)
    attrs = rng.standard_normal((NI, NA)).astype(np.float32)
    attrs[0] = 0
    p_c = rng.standard_normal((b, L, NC)).astype(np.float32)
    o_c = rng.standard_normal((b, L, NC)).astype(np.float32)
    train = bool(rng.integers(0, 2))

    params = carca_init(jax.random.PRNGKey(trial), cfg)
    got = carca_apply(params, cfg, (p_x, attrs[p_x], p_c),
                      [(o_x, attrs[o_x], o_c)], train=train,
                      rng=jax.random.PRNGKey(0))
    want = oracle.carca_forward(to_np(params), cfg, (p_x, attrs[p_x], p_c),
                                [(o_x, attrs[o_x], o_c)], train=train)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-5)


def test_l2_decay_never_touches_sinusoidal_table():
    """Regression: unmasked add_decayed_weights injected l2_reg*pe as a
    fake gradient into the constant sin/cos table (a torch *buffer* in the
    reference that the optimizer never touches) and eroded it every step."""
    from carca_tpu.train.state import TrainState, create_train_state, make_optimizer
    from carca_tpu.config import TrainConfig
    import optax

    cfg = mk_cfg(encoding="positional", decoder="dot")
    tc = TrainConfig(l2_reg=0.01)
    tx = make_optimizer(tc)
    state = create_train_state(jax.random.PRNGKey(0), cfg, tc, tx)
    pe0 = np.asarray(state.params["embed"]["enc"]["pe"]).copy()

    rng = np.random.default_rng(0)
    p_x = rng.integers(1, NI, (4, L)).astype(np.int32)
    o_x = rng.integers(1, NI, (4, L)).astype(np.int32)
    attrs = rng.standard_normal((NI, NA)).astype(np.float32)
    p_c = rng.standard_normal((4, L, NC)).astype(np.float32)
    o_c = rng.standard_normal((4, L, NC)).astype(np.float32)

    def loss_fn(params):
        y = carca_apply(params, cfg, (p_x, attrs[p_x], p_c),
                        [(o_x, attrs[o_x], o_c)], train=True,
                        rng=jax.random.PRNGKey(1))
        return jnp.sum(y)

    for _ in range(3):
        g = jax.grad(loss_fn)(state.params)
        up, opt = tx.update(g, state.opt_state, state.params)
        state = TrainState(params=optax.apply_updates(state.params, up),
                           opt_state=opt, rng=state.rng, step=state.step + 1)
    np.testing.assert_array_equal(
        np.asarray(state.params["embed"]["enc"]["pe"]), pe0)


def test_bf16_attrs_table_is_value_identical_to_f32():
    """The bf16-attrs storage optimization (train/loop.attrs_dtype) must
    be value-identical to passing f32 attrs into a bf16-compute model —
    the embedding layer casts rows to bf16 either way, so storing bf16
    just moves the (single) rounding earlier."""
    import jax

    from carca_tpu.config import ModelConfig
    from carca_tpu.models.carca import carca_apply, carca_init
    from carca_tpu.train.loop import attrs_dtype

    rng = np.random.default_rng(0)
    mc = ModelConfig(n_items=50, n_attrs=8, n_ctx=3, d=16, g=32, seq_len=6,
                     target_len=5, n_blocks=1, n_heads=2, dropout=0.0,
                     embedding="all", decoder="dot",
                     compute_dtype="bfloat16")
    assert attrs_dtype(mc) == jnp.bfloat16
    params = carca_init(jax.random.PRNGKey(0), mc)
    attrs_f32 = jnp.asarray(rng.normal(size=(mc.n_items, mc.n_attrs)),
                            jnp.float32)
    p_x = jnp.asarray(rng.integers(0, mc.n_items, (2, 6)), jnp.int32)
    p_c = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
    o_x = jnp.asarray(rng.integers(1, mc.n_items, (2, 5)), jnp.int32)
    o_c = jnp.asarray(rng.normal(size=(2, 5, 3)), jnp.float32)

    def fwd(tab):
        return carca_apply(params, mc, (p_x, None, p_c),
                           [(o_x, None, o_c)], train=False, attrs_table=tab)

    y32 = fwd(attrs_f32)
    y16 = fwd(attrs_f32.astype(jnp.bfloat16))
    np.testing.assert_array_equal(np.asarray(y32), np.asarray(y16))
