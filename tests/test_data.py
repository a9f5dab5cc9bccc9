"""Batch-assembly golden tests vs a scalar oracle re-derived from the
behavioral contract (SURVEY.md §2.1 #13-16; src/data.py:77-192)."""

import numpy as np
import pytest

from carca_tpu.data.dataset import BatchBuilder, epoch_batches
from carca_tpu.data.loaders import build_catalog
from carca_tpu.data.synthetic import synthetic_catalog, write_reference_format
from carca_tpu.data.windowing import window_bounds

L, T = 8, 10


@pytest.fixture(scope="module")
def cat():
    return synthetic_catalog(n_users=60, n_real_items=200, n_attrs=6, n_ctx=3,
                             min_len=1, max_len=20, seed=7)


@pytest.fixture(scope="module")
def builder(cat):
    return BatchBuilder(cat, seq_len=L, target_len=T, test=True)


def oracle_train_example(cat, u, L, test):
    """Scalar right-aligned train example (src/data.py:90-137), negatives
    checked structurally (they're random)."""
    length = int(cat.offsets[u + 1] - cat.offsets[u])
    start, end = window_bounds(np.array([length]), L, "train", test)
    window = list(range(int(start[0]), int(end[0])))
    items = cat.items[cat.offsets[u]: cat.offsets[u + 1]]
    ctx = cat.ctx_vals[cat.offsets[u]: cat.offsets[u + 1]]
    p_x = np.zeros(L, np.int32)
    o_pos = np.zeros(L, np.int32)
    p_c = np.zeros((L, cat.n_ctx), np.float32)
    o_c = np.zeros((L, cat.n_ctx), np.float32)
    for i, pi in enumerate(reversed(window[:-1])):
        idx = L - 1 - i
        p_x[idx] = items[pi]
        o_pos[idx] = items[pi + 1]
        p_c[idx] = ctx[pi]
        o_c[idx] = ctx[pi + 1]
    return p_x, o_pos, p_c, o_c


def test_train_batch_matches_oracle(cat, builder):
    rng = np.random.default_rng(0)
    users = builder.users("train")[:16]
    b = builder.train_batch(users, rng)
    assert b["p_x"].shape == (16, L) and b["o_x"].shape == (16, 2 * L)
    assert b["y_true"].shape == (16, 2 * L)
    for row, u in enumerate(users):
        p_x, o_pos, p_c, o_c = oracle_train_example(cat, int(u), L, True)
        np.testing.assert_array_equal(b["p_x"][row], p_x)
        np.testing.assert_array_equal(b["o_x"][row, :L], o_pos)
        np.testing.assert_allclose(b["p_c"][row], p_c, rtol=1e-6)
        np.testing.assert_allclose(b["o_c"][row, :L], o_c, rtol=1e-6)
        # negatives inherit the positive's context (src/data.py:130)
        np.testing.assert_allclose(b["o_c"][row, L:], o_c, rtol=1e-6)
        # negatives fill exactly the positive slots, ids outside the profile
        filled = p_x > 0
        negs = b["o_x"][row, L:]
        assert ((negs > 0) == filled).all()
        prof = set(cat.items[cat.offsets[u]: cat.offsets[u + 1]].tolist())
        real = negs[negs > 0]
        assert not (set(real.tolist()) & prof)
        assert len(set(real.tolist())) == len(real)  # within-sample dedup
        # y_true: 1 where p_x>0 in first half, 0 in second (src/data.py:134-135)
        np.testing.assert_array_equal(b["y_true"][row, :L], filled.astype(np.float32))
        assert (b["y_true"][row, L:] == 0).all()


def test_fresh_negatives_every_call(builder):
    users = builder.users("train")[:8]
    b1 = builder.train_batch(users, np.random.default_rng(1))
    b2 = builder.train_batch(users, np.random.default_rng(2))
    assert (b1["o_x"][:, L:] != b2["o_x"][:, L:]).any()
    # positives are deterministic
    np.testing.assert_array_equal(b1["o_x"][:, :L], b2["o_x"][:, :L])


@pytest.mark.parametrize("mode", ["val", "test"])
def test_eval_batch(cat, builder, mode):
    rng = np.random.default_rng(3)
    users = builder.users(mode)[:12]
    b = builder.eval_batch(users, rng, mode)
    assert b["o_x"].shape == (12, T + 1)
    start, end = window_bounds(np.diff(cat.offsets), L, mode, True)
    for row, u in enumerate(users):
        one_out = int(end[u]) - 1
        evt = int(cat.offsets[u]) + one_out
        assert b["o_x"][row, 0] == cat.items[evt]  # held-out positive at slot 0
        np.testing.assert_allclose(b["o_c"][row, 0], cat.ctx_vals[evt], rtol=1e-6)
        # negatives: exactly T, share the positive's context (src/data.py:185)
        negs = b["o_x"][row, 1:]
        assert (negs > 0).all() and len(set(negs.tolist())) == T
        prof = set(cat.items[cat.offsets[u]: cat.offsets[u + 1]].tolist())
        assert not (set(negs.tolist()) & prof)
        np.testing.assert_allclose(
            b["o_c"][row, 1:], np.tile(cat.ctx_vals[evt], (T, 1)), rtol=1e-6)
        # y_true = [1, 0, ...] (src/data.py:189-191)
        assert b["y_true"][row, 0] == 1 and (b["y_true"][row, 1:] == 0).all()
        # profile = window[:-1], right-aligned
        w = list(range(int(start[u]), int(end[u])))[:-1]
        tail = [int(cat.items[cat.offsets[u] + pi]) for pi in w[-L:]]
        got = b["p_x"][row][b["p_x"][row] > 0].tolist()
        assert got == tail


def test_partial_batch_padding(builder):
    users = builder.users("val")[:3]
    batches = list(epoch_batches(users, 8, shuffle=False))
    assert len(batches) == 1 and len(batches[0]) == 8
    b = builder.eval_batch(batches[0], np.random.default_rng(0), "val")
    assert int(b["n_valid"]) == 3
    assert (b["o_x"][3:] == 0).all() and (b["p_x"][3:] == 0).all()
    assert (b["y_true"][3:] == 0).all()


def test_loader_roundtrip(tmp_path, cat):
    from carca_tpu.data.loaders import load_attrs, load_ctx, load_profiles

    write_reference_format(cat, str(tmp_path))
    attrs = load_attrs(str(tmp_path / "attrs.pkl"))
    np.testing.assert_allclose(attrs, cat.attrs, rtol=1e-6)
    assert (attrs[0] == 0).all()  # pad row prepended (src/data.py:33-34)

    ctx = load_ctx(str(tmp_path / "ctx.pkl"))
    uids, iids, profiles = load_profiles(str(tmp_path / "profiles.txt"))
    cat2 = build_catalog(profiles, attrs, ctx)
    np.testing.assert_array_equal(cat2.items, cat.items)
    np.testing.assert_array_equal(cat2.offsets, cat.offsets)
    # ctx round-trips up to the (user,item)-keyed dedup of the dict format
    from carca_tpu.data.synthetic import canonicalize_repeat_ctx
    np.testing.assert_allclose(cat2.ctx_vals, canonicalize_repeat_ctx(cat).ctx_vals,
                               rtol=1e-6)


def test_epoch_batches_shuffle_determinism():
    users = np.arange(100)
    a = [b.copy() for b in epoch_batches(users, 16, np.random.default_rng(5))]
    b = [b.copy() for b in epoch_batches(users, 16, np.random.default_rng(5))]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    c = [b.copy() for b in epoch_batches(users, 16, np.random.default_rng(6))]
    assert any((x != y).any() for x, y in zip(a, c))


def test_prefetch_yields_all_and_propagates_errors():
    from carca_tpu.data.prefetch import prefetch

    assert list(prefetch(iter(range(100)), depth=3)) == list(range(100))

    def boom():
        yield 1
        raise RuntimeError("producer failed")

    out = []
    try:
        for x in prefetch(boom()):
            out.append(x)
        raised = False
    except RuntimeError as e:
        raised = "producer failed" in str(e)
    assert raised and out == [1]


def test_train_batch_without_host_negatives():
    """negatives=False (device-resampling steps): positive-only o arrays of
    width L, full [B, 2L] labels, and no sampler work."""
    from carca_tpu.data.synthetic import synthetic_catalog

    cat = synthetic_catalog(n_users=24, n_real_items=40, seed=2)
    b = BatchBuilder(cat, 8, 12, test=True)
    rows = b.users("train")[:6]
    rng = np.random.default_rng(0)
    full = b.train_batch(rows.copy(), np.random.default_rng(0))
    lean = b.train_batch(rows.copy(), rng, negatives=False)
    assert lean["o_x"].shape == (6, 8) and lean["o_c"].shape[1] == 8
    assert lean["y_true"].shape == (6, 16)
    np.testing.assert_array_equal(lean["p_x"], full["p_x"])
    np.testing.assert_array_equal(lean["o_x"], full["o_x"][:, :8])
    np.testing.assert_array_equal(lean["y_true"], full["y_true"])
