"""Parallelism layer tests on the 8-virtual-device CPU mesh (SURVEY.md §4):
sharded steps must match single-device math exactly; the row-sharded lookup
must match a plain gather, values and grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from carca_tpu.config import ModelConfig, TrainConfig
from carca_tpu.data.dataset import BatchBuilder
from carca_tpu.data.synthetic import synthetic_catalog
from carca_tpu.parallel import (
    device_sample_negatives,
    make_mesh,
    make_sharded_eval_step,
    make_sharded_lookup,
    make_sharded_train_step,
    shard_batch,
)
from carca_tpu.parallel.mesh import pad_table_rows, prepare_state_for_mesh
from carca_tpu.train.loop import make_eval_step, make_train_step
from carca_tpu.train.state import create_train_state, make_optimizer
from tests.conftest import skip_unless_devices


def _setup(batch=16, seq=8, users=64, items=50):
    cat = synthetic_catalog(n_users=users, n_real_items=items, seed=3)
    mc = ModelConfig(n_items=cat.n_items, n_attrs=cat.n_attrs, n_ctx=cat.n_ctx,
                     d=16, g=32, seq_len=seq, target_len=12, n_blocks=2,
                     n_heads=2, dropout=0.0, decoder="ca")
    tc = TrainConfig(batch_size=batch, seed=0)
    builder = BatchBuilder(cat, mc.seq_len, mc.target_len, test=True)
    rng = np.random.default_rng(0)
    users_arr = builder.users("train")[:batch]
    tbatch = builder.train_batch(users_arr, rng)
    tbatch.pop("n_valid")
    ebatch = builder.eval_batch(builder.users("val")[:batch], rng, "val")
    ebatch.pop("n_valid")
    return cat, mc, tc, tbatch, ebatch


def test_sharded_train_step_matches_single_device():
    """Same batch, same params: the 8-way DP step must produce the same loss
    and the same *gradients* as single-device (psum only reorders the batch
    reduction → 1e-6-level FP noise). Params-after-Adam are not compared:
    Adam's g/(√g²+ε) normalization amplifies that noise unboundedly for
    near-zero-gradient leaves."""
    skip_unless_devices(8)
    from carca_tpu.models.carca import carca_apply
    from carca_tpu.models.losses import masked_bce
    from carca_tpu.utils.masking import get_mask
    from carca_tpu.parallel.mesh import batch_shardings
    from jax.sharding import NamedSharding, PartitionSpec as P

    cat, mc, tc, batch, _ = _setup()
    tx = make_optimizer(tc)
    attrs = jnp.asarray(cat.attrs)
    state = create_train_state(jax.random.PRNGKey(1), mc, tc, tx)
    L = mc.seq_len

    def loss_fn(params, batch):
        o_x, o_c = batch["o_x"], batch["o_c"]
        targets = [(o_x[:, :L], None, o_c[:, :L]),
                   (o_x[:, L:], None, o_c[:, L:])]
        y = carca_apply(params, mc, (batch["p_x"], None, batch["p_c"]),
                        targets, train=True, rng=jax.random.PRNGKey(7),
                        attrs_table=attrs)
        return masked_bce(y, batch["y_true"], get_mask(batch["o_x"]))

    loss1, g1 = jax.jit(jax.value_and_grad(loss_fn))(state.params, dict(batch))

    mesh = make_mesh((8,), ("data",))
    repl = NamedSharding(mesh, P())
    sharded = jax.jit(
        jax.value_and_grad(loss_fn),
        in_shardings=(jax.tree_util.tree_map(lambda _: repl, state.params),
                      batch_shardings(dict(batch), mesh)),
        out_shardings=(repl, jax.tree_util.tree_map(lambda _: repl, state.params)),
    )
    loss2, g2 = sharded(state.params, shard_batch(dict(batch), mesh))

    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-6)
    for (p1, l1), (_, l2) in zip(
            jax.tree_util.tree_leaves_with_path(g1),
            jax.tree_util.tree_leaves_with_path(g2)):
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2),
                                   rtol=1e-4, atol=1e-6, err_msg=str(p1))

    # and the packaged sharded step must run one full Adam step with the
    # same loss value
    step = make_sharded_train_step(mc, tx, mesh)
    # rng differs from the jit above, so only the loss scale is comparable
    s2, loss3 = step(state, attrs, shard_batch(dict(batch), mesh))
    assert np.isfinite(float(loss3)) and int(s2.step) == 1


def test_sharded_eval_step_matches_single_device():
    skip_unless_devices(8)
    cat, mc, tc, _, ebatch = _setup()
    tx = make_optimizer(tc)
    attrs = jnp.asarray(cat.attrs)
    state = create_train_state(jax.random.PRNGKey(2), mc, tc, tx)

    h1, n1, l1 = make_eval_step(mc, tc.top_k)(state.params, attrs, dict(ebatch))
    mesh = make_mesh((8,), ("data",))
    h2, n2, l2 = make_sharded_eval_step(mc, tc.top_k, mesh)(
        state.params, attrs, shard_batch(dict(ebatch), mesh))
    np.testing.assert_allclose(float(h1), float(h2), rtol=1e-6)
    np.testing.assert_allclose(float(n1), float(n2), rtol=1e-6)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_sharded_lookup_matches_gather_and_grads():
    skip_unless_devices(8)
    mesh = make_mesh((2, 4), ("data", "model"))
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (37, 12))  # ragged rows → padding path
    table = jnp.asarray(pad_table_rows(np.asarray(table), mesh))
    ids = jax.random.randint(jax.random.PRNGKey(1), (8, 5), 0, 37)
    lookup = make_sharded_lookup(mesh)

    got = lookup(table, ids)
    want = jnp.take(table, ids, axis=0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)

    co = jax.random.normal(jax.random.PRNGKey(2), got.shape)
    g1 = jax.grad(lambda t: jnp.sum(lookup(t, ids) * co))(table)
    g2 = jax.grad(lambda t: jnp.sum(jnp.take(t, ids, axis=0) * co))(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


def test_full_sharded_step_with_sharded_tables_and_device_negatives():
    """The at-scale path: (data, model) mesh, row-sharded tables, on-device
    negative sampling — one step must run and stay finite."""
    skip_unless_devices(8)
    cat, mc, tc, batch, _ = _setup()
    mesh = make_mesh((4, 2), ("data", "model"))
    tx = make_optimizer(tc)
    # pad tables so they row-shard over model=2
    attrs = jnp.asarray(pad_table_rows(cat.attrs, mesh))
    state = create_train_state(jax.random.PRNGKey(3), mc, tc, tx)
    state = prepare_state_for_mesh(state, mesh, tx)
    step = make_sharded_train_step(mc, tx, mesh, shard_embeddings=True,
                                   device_negatives=True)
    state2, loss = step(state, attrs, shard_batch(dict(batch), mesh))
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    leaves = jax.tree_util.tree_leaves(state2.params)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_device_sample_negatives_domain_and_rejection():
    rng = jax.random.PRNGKey(0)
    profile = jnp.array([[1, 2, 3, 4, 5, 6, 7, 8]], dtype=jnp.int32)
    n_items = 12
    negs = device_sample_negatives(rng, profile, n_items, 64, retries=16)
    arr = np.asarray(negs)
    assert arr.min() >= 1 and arr.max() <= n_items - 1
    # with 16 retries and only 8 forbidden of 11, collisions are ~impossible
    assert not np.isin(arr, np.asarray(profile[0])).any()
    # deterministic under the same key
    negs2 = device_sample_negatives(rng, profile, n_items, 64, retries=16)
    np.testing.assert_array_equal(arr, np.asarray(negs2))


def test_fit_through_mesh_path(tmp_path):
    """End-to-end fit() with TrainConfig.mesh_shape: DP over 'data' +
    row-sharded tables over 'model', vs the single-device fit on the same
    catalog/seed. Same batches, same RNG threading — metrics agree to FP
    noise (psum reduction order)."""
    from carca_tpu.config import Config
    from carca_tpu.train.loop import fit

    cat = synthetic_catalog(n_users=96, n_real_items=60, seed=5)
    mc = ModelConfig(n_items=cat.n_items, n_attrs=cat.n_attrs,
                     n_ctx=cat.n_ctx, d=16, g=32, seq_len=8, target_len=12,
                     n_blocks=2, n_heads=2, dropout=0.0, decoder="ca")

    def tc(out, **kw):
        return TrainConfig(batch_size=16, epochs=2, early_stop=10, seed=0,
                           out_dir=str(tmp_path / out), **kw)

    _, m_single = fit(Config(model=mc, train=tc("single")), cat, log=False)
    _, m_mesh = fit(Config(model=mc, train=tc(
        "mesh", mesh_shape=(4, 2), mesh_axes=("data", "model"),
        shard_embeddings=True)), cat, log=False)

    for key in ("val_hr", "val_ndcg", "test_hr", "test_ndcg"):
        assert np.isfinite(m_mesh[key])
        np.testing.assert_allclose(m_mesh[key], m_single[key], atol=5e-3)


def test_fit_mesh_rejects_bad_config(tmp_path):
    from carca_tpu.config import Config, DataConfig
    from carca_tpu.train.loop import fit

    cat = synthetic_catalog(n_users=32, n_real_items=40, seed=1)
    mc = ModelConfig(n_items=cat.n_items, n_attrs=cat.n_attrs,
                     n_ctx=cat.n_ctx, d=16, g=32, seq_len=8, target_len=12,
                     n_blocks=1, n_heads=2, dropout=0.0)
    bad = TrainConfig(batch_size=15, mesh_shape=(4, 2),
                      mesh_axes=("data", "model"),
                      out_dir=str(tmp_path / "bad"))
    with pytest.raises(ValueError, match="divisible"):
        fit(Config(model=mc, train=bad), cat, log=False)
def test_sharded_device_step_matches_single_device():
    """The device-pipeline step over an 8-way mesh is op-for-op the
    single-device device step (same RNG threading, replicated catalog,
    P('data') rows) — loss and updated params must agree to FP noise."""
    skip_unless_devices(8)
    from carca_tpu.data.device_pipeline import DeviceDataset
    from carca_tpu.parallel.step import make_sharded_device_train_step
    from carca_tpu.train.loop import make_device_train_step

    cat = synthetic_catalog(n_users=128, n_real_items=80, seed=3)
    mc = ModelConfig(n_items=cat.n_items, n_attrs=cat.n_attrs,
                     n_ctx=cat.n_ctx, d=16, g=32, seq_len=8, target_len=12,
                     n_blocks=1, n_heads=2, dropout=0.0, decoder="ca")
    tc_ = TrainConfig(batch_size=16)
    tx = make_optimizer(tc_)
    dd = DeviceDataset(cat, mc.seq_len, mc.target_len)
    attrs = jnp.asarray(cat.attrs)
    rows = jnp.asarray(dd.users("train")[:16], jnp.int32)

    s0 = create_train_state(jax.random.PRNGKey(2), mc, tc_, tx)
    s1 = create_train_state(jax.random.PRNGKey(2), mc, tc_, tx)

    single = make_device_train_step(mc, tx)
    mesh = make_mesh((8,), ("data",))
    sharded = make_sharded_device_train_step(mc, tx, mesh)

    # compare losses across consecutive steps: step k's loss is computed
    # from step k-1's params, so any real divergence compounds and shows
    # up here. (Post-Adam params are not compared directly — Adam's
    # g/(√g²+ε) normalization amplifies psum-reduction FP noise
    # unboundedly on near-zero-gradient leaves, as in the DP step test.)
    all_rows = dd.users("train")
    for k in range(3):
        rows = jnp.asarray(all_rows[16 * k: 16 * (k + 1)], jnp.int32)
        s0, loss0 = single(s0, attrs, dd.arrays, rows)
        s1, loss1 = sharded(s1, attrs, dd.arrays, rows)
        np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-4,
                                   err_msg=f"step {k}")


def test_fit_device_pipeline_through_mesh(tmp_path):
    """End-to-end fit() with device_pipeline + mesh (the multi-chip
    production path): catalog replicated, rows sharded, assembly/sampling
    inside the sharded step; metrics match the single-device device-
    pipeline fit on the same catalog/seed."""
    from carca_tpu.config import Config, DataConfig
    from carca_tpu.train.loop import fit

    cat = synthetic_catalog(n_users=96, n_real_items=60, seed=5)
    mc = ModelConfig(n_items=cat.n_items, n_attrs=cat.n_attrs,
                     n_ctx=cat.n_ctx, d=16, g=32, seq_len=8, target_len=12,
                     n_blocks=2, n_heads=2, dropout=0.0, decoder="ca")
    dc = DataConfig(device_pipeline=True)

    def tc(out, **kw):
        return TrainConfig(batch_size=16, epochs=2, early_stop=10, seed=0,
                           inner_steps=2, out_dir=str(tmp_path / out), **kw)

    _, m_single = fit(Config(model=mc, data=dc, train=tc("single")), cat,
                      log=False)
    _, m_mesh = fit(Config(model=mc, data=dc, train=tc(
        "mesh", mesh_shape=(4, 2), mesh_axes=("data", "model"),
        shard_embeddings=True)), cat, log=False)

    for key in ("val_hr", "val_ndcg", "test_hr", "test_ndcg"):
        assert np.isfinite(m_mesh[key])
        np.testing.assert_allclose(m_mesh[key], m_single[key], atol=5e-3)


def test_fit_mesh_resume_and_device_sampling(tmp_path):
    """Mesh run with on-device negatives + resume: the restore template must
    carry the padded/sharded shapes (prepare-before-restore ordering)."""
    from carca_tpu.config import Config, DataConfig
    from carca_tpu.train.loop import fit

    cat = synthetic_catalog(n_users=96, n_real_items=59, seed=7)  # 60 % 2 = 0 pads
    mc = ModelConfig(n_items=cat.n_items, n_attrs=cat.n_attrs,
                     n_ctx=cat.n_ctx, d=16, g=32, seq_len=8, target_len=12,
                     n_blocks=1, n_heads=2, dropout=0.0, decoder="ca")
    dc = DataConfig(device_sampling=True)

    def tc(epochs):
        return TrainConfig(batch_size=16, epochs=epochs, early_stop=50,
                           seed=0, out_dir=str(tmp_path / "run"),
                           mesh_shape=(4, 2), mesh_axes=("data", "model"),
                           shard_embeddings=True)

    _, m1 = fit(Config(model=mc, data=dc, train=tc(2)), cat, log=False)
    assert np.isfinite(m1["val_ndcg"])
    # resume into 2 more epochs from the sharded checkpoint
    _, m2 = fit(Config(model=mc, data=dc, train=tc(4)), cat, log=False)
    assert m2["epochs_run"] == 4
    assert np.isfinite(m2["val_ndcg"])


def test_device_sample_negatives_without_replacement():
    """The overdraw-then-dedupe path is exact WOR: distinct within each
    row, window excluded, near-uniform over the allowed set, and fresh
    per key — at small AND large catalogs (the old dense-top-k guarantee
    stopped at 32768 ids)."""
    from carca_tpu.parallel.sampling import overdraw_for, retries_for

    assert overdraw_for(50, 2001, 51) is not None
    assert overdraw_for(50, 10_000_001, 51) is not None
    assert overdraw_for(18, 30, 9) is None  # coupon-collector → top-k path

    rng = np.random.default_rng(3)
    for n_items in (2001, 60_000):
        profile = jnp.asarray(rng.integers(1, n_items, (16, 51)), jnp.int32)
        negs = np.asarray(device_sample_negatives(
            jax.random.PRNGKey(5), profile, n_items, 50,
            retries_for(51, n_items)))
        assert negs.min() >= 1 and negs.max() < n_items
        for b in range(negs.shape[0]):
            assert len(set(negs[b].tolist())) == 50  # distinct
            assert not np.isin(negs[b], np.asarray(profile[b])).any()
        other = np.asarray(device_sample_negatives(
            jax.random.PRNGKey(6), profile, n_items, 50,
            retries_for(51, n_items)))
        assert (negs != other).any()  # fresh draws per key

    # uniform marginals over the allowed set (loose 5-sigma band on the
    # per-id count over many draws; catches any draw-order or dedupe bias)
    n_items, slots, reps = 401, 40, 150
    profile = jnp.zeros((32, 1), jnp.int32)  # nothing forbidden but pad
    counts = np.zeros(n_items, np.int64)
    for t in range(reps):
        out = np.asarray(device_sample_negatives(
            jax.random.PRNGKey(t), profile, n_items, slots, 8))
        np.add.at(counts, out.reshape(-1), 1)
    assert counts[0] == 0
    exp = counts[1:].mean()
    sigma = np.sqrt(exp)  # ≈ Poisson
    assert (np.abs(counts[1:] - exp) < 5 * sigma).all(), (
        counts[1:].min(), exp, counts[1:].max())


def test_device_sample_negatives_long_padded_window():
    """Men-shaped reject sets (wide, zero-padded histories): the merged
    window-into-dedupe sort must exclude every window id, never emit the
    pad id, and still return distinct rows."""
    from carca_tpu.parallel.sampling import overdraw_for

    assert overdraw_for(200, 2001, 272) is not None
    rng = np.random.default_rng(4)
    prof = jnp.asarray(np.where(rng.random((32, 272)) < 0.2, 0,
                                rng.integers(1, 2001, (32, 272))), jnp.int32)
    out = np.asarray(device_sample_negatives(
        jax.random.PRNGKey(9), prof, 2001, 200, 14))
    for b in range(32):
        row = set(out[b].tolist())
        assert len(row) == 200
        assert 0 not in row
        assert not (row & set(np.asarray(prof[b]).tolist()))


def test_sampler_tail_prefers_repeats_over_window_items():
    """The short-row fallback ranking: when there aren't enough distinct
    non-window draws, repeated draws fill slots BEFORE window items (a
    repeated negative is harmless; a window item is a false negative)."""
    from carca_tpu.parallel.sampling import _first_distinct_excluding

    window = jnp.asarray([[5]], jnp.int32)
    draws = jnp.asarray([[5, 5, 3, 3]], jnp.int32)
    out = np.asarray(_first_distinct_excluding(draws, window, 3))[0]
    assert out[0] == 3           # the one good draw, in draw order
    assert out[1] == 3           # then the repeated draw
    assert out[2] == 5           # window item only as the last resort


def test_three_axis_mesh_with_dead_seq_axis(tmp_path):
    """SURVEY §2.3/§5: TP and sequence axes stay PLUMBED — a (2, 2, 2)
    mesh with a dead 'seq' axis must flow through the sharded device-
    pipeline fit unchanged (param/batch shardings simply never use the
    extra axis). Guards against shape-rule code assuming a 2-axis mesh."""
    from carca_tpu.config import Config, DataConfig
    from carca_tpu.train.loop import fit

    cat = synthetic_catalog(n_users=96, n_real_items=60, seed=5)
    mc = ModelConfig(n_items=cat.n_items, n_attrs=cat.n_attrs,
                     n_ctx=cat.n_ctx, d=16, g=32, seq_len=8, target_len=12,
                     n_blocks=1, n_heads=2, dropout=0.0, decoder="ca")
    dc = DataConfig(device_pipeline=True)
    t = TrainConfig(batch_size=16, epochs=1, early_stop=10, seed=0,
                    inner_steps=2, out_dir=str(tmp_path / "mesh3"),
                    mesh_shape=(2, 2, 2),
                    mesh_axes=("data", "model", "seq"),
                    shard_embeddings=True)
    _, m = fit(Config(model=mc, data=dc, train=t), cat, log=False)
    assert np.isfinite(m["val_ndcg"]) and np.isfinite(m["test_ndcg"])
    assert 0.0 <= m["val_hr"] <= 1.0
