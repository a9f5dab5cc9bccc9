"""The v2 "markov" synthetic process: contract, structure (the properties
that make retrieval quality falsifiable again — DESIGN §11c finding 9),
device-twin agreement, oracle hierarchy, and CLI wiring."""

import numpy as np

from carca_tpu.data.synthetic import (MarkovProcess, cluster_bounds,
                                      cluster_of, markov_process,
                                      markov_rank_pmf,
                                      synthetic_catalog_markov,
                                      synthetic_catalog_markov_device,
                                      synthetic_generator)


def _small(seed=0, **kw):
    kw.setdefault("n_clusters", 8)
    kw.setdefault("hot_items", 40)
    return synthetic_catalog_markov(n_users=400, n_real_items=800,
                                    seed=seed, **kw)


def test_contract_and_determinism():
    a = _small(seed=3)
    b = _small(seed=3)
    np.testing.assert_array_equal(np.asarray(a.items), np.asarray(b.items))
    np.testing.assert_array_equal(np.asarray(a.attrs), np.asarray(b.attrs))
    np.testing.assert_array_equal(np.asarray(a.ctx_vals),
                                  np.asarray(b.ctx_vals))
    c = _small(seed=4)
    assert not np.array_equal(np.asarray(a.items), np.asarray(c.items))

    items = np.asarray(a.items)
    assert items.min() >= 1 and items.max() <= 800
    assert a.offsets[-1] == len(items) == len(np.asarray(a.ctx_vals))
    np.testing.assert_array_equal(np.asarray(a.attrs)[0], 0.0)  # pad row


def test_attrs_recover_clusters():
    """attrs = centroid + 0.3·noise ⇒ nearest-centroid classification of
    the attribute rows must recover the block cluster almost surely —
    this is the signal the --embedding all model gets and --embedding id
    does not."""
    proc = markov_process(400, 800, n_clusters=8, seed=0)
    cat = synthetic_catalog_markov(n_users=400, n_real_items=800, seed=0,
                                   proc=proc)
    attrs = np.asarray(cat.attrs)[1:]  # real ids
    d = ((attrs[:, None, :] - proc.centroids[None, :, :]) ** 2).sum(-1)
    pred = d.argmin(1)
    true = cluster_of(np.arange(1, 801), proc.bounds)
    assert (pred == true).mean() > 0.95


def test_markov_transition_signal():
    """Consecutive events must carry the designed cluster→cluster signal:
    the empirical probability of landing in the last cluster's top-3
    transition targets far exceeds the uniform baseline. This is what a
    popularity table cannot capture and sequential attention can."""
    proc = markov_process(1000, 800, n_clusters=8, seed=1)
    cat = synthetic_catalog_markov(n_users=1000, n_real_items=800, seed=1,
                                   proc=proc)
    items = np.asarray(cat.items)
    offs = np.asarray(cat.offsets)
    cl = cluster_of(items, proc.bounds)
    top3 = np.argsort(-proc.trans, axis=1)[:, :3]
    hits = tot = 0
    for u in range(cat.n_users):
        cu = cl[offs[u]: offs[u + 1]]
        for t in range(1, len(cu)):
            hits += cu[t] in top3[cu[t - 1]]
            tot += 1
    # alpha=0.6 puts ~0.6·0.85 on the top-3 targets alone; user prefs add
    # overlap. Uniform would give 3/8.
    assert hits / tot > 0.55, hits / tot


def test_two_tier_zipf_head():
    """Within a cluster, the hot head must concentrate mass: P(rank <=
    hot_items) >> hot fraction of the block."""
    proc = markov_process(1000, 800, n_clusters=8, hot_items=10, seed=2)
    cat = synthetic_catalog_markov(n_users=1000, n_real_items=800, seed=2,
                                   proc=proc)
    items = np.asarray(cat.items)
    cl = cluster_of(items, proc.bounds)
    rank = items - proc.bounds[cl]
    # blocks are 100 items; the 10-item head holds hot_frac + a bit of
    # the full-tier's own head (uniform would give 10%)
    assert (rank <= 10).mean() > 0.6


def test_rank_pmf_is_a_pmf():
    proc = markov_process(100, 800, n_clusters=8, hot_items=40, seed=0)
    sizes = np.diff(proc.bounds)
    for c in range(8):
        r = np.arange(1, sizes[c] + 1, dtype=np.float64)
        p = markov_rank_pmf(proc, r, np.full_like(r, c, dtype=np.int64))
        assert abs(p.sum() - 1.0) < 1e-9
        assert (np.diff(p) <= 1e-12).all()  # monotone non-increasing


def test_device_twin_shares_process():
    """The device generator must emit the same CSR/user layout and the
    same STATISTICAL process (its PRNG stream differs — the numpy
    generator is the golden source)."""
    proc = markov_process(500, 800, n_clusters=8, seed=5)
    host = synthetic_catalog_markov(n_users=500, n_real_items=800, seed=5,
                                    proc=proc)
    dev = synthetic_catalog_markov_device(n_users=500, n_real_items=800,
                                          seed=5, proc=proc)
    np.testing.assert_array_equal(host.offsets, dev.offsets)
    items = np.asarray(dev.items)
    assert items.min() >= 1 and items.max() <= 800
    np.testing.assert_array_equal(np.asarray(dev.attrs)[0], 0.0)
    # same attr geometry: device attrs classify to the same centroids
    attrs = np.asarray(dev.attrs)[1:]
    d = ((attrs[:, None, :] - proc.centroids[None, :, :]) ** 2).sum(-1)
    true = cluster_of(np.arange(1, 801), proc.bounds)
    assert (d.argmin(1) == true).mean() > 0.95
    # similar cluster marginals (loose: same process, different stream)
    ch = np.bincount(cluster_of(np.asarray(host.items), proc.bounds),
                     minlength=8) / host.items.shape[0]
    cd = np.bincount(cluster_of(items, proc.bounds),
                     minlength=8) / items.shape[0]
    assert np.abs(ch - cd).max() < 0.05

    # determinism of the device stream itself (threefry-pinned: serve
    # must regenerate the training catalog bit-identically)
    dev2 = synthetic_catalog_markov_device(n_users=500, n_real_items=800,
                                           seed=5, proc=proc)
    np.testing.assert_array_equal(items, np.asarray(dev2.items))


def test_oracle_hierarchy():
    """The reason v2 exists: the generative-Bayes oracle must beat the
    static popularity oracle by a wide margin — i.e. the task rewards
    reading the history, so a learned model has measurable headroom
    above popularity (v1 had none: DESIGN §11c finding 9)."""
    import sys
    sys.path.insert(0, "scripts")
    from popularity_oracle import bayes_oracle, popularity_oracle, split_rows

    proc = markov_process(3000, 5000, seed=0)  # default K=64 etc.
    cat = synthetic_catalog_markov(n_users=3000, n_real_items=5000, seed=0,
                                   proc=proc)
    rows, cnt = split_rows(cat, "test", 50)
    hr_pop, _, _ = popularity_oracle(rows, cnt, 10, 50)
    hr_bayes, ndcg_bayes = bayes_oracle(rows, proc, cat, 10, 50, "test")
    assert hr_bayes > 0.02
    assert hr_bayes > 1.5 * max(hr_pop, 1e-9), (hr_bayes, hr_pop)
    assert ndcg_bayes > 0


def test_cluster_bounds_partition():
    b = cluster_bounds(1000, 7)
    assert b[0] == 0 and b[-1] == 1000
    sizes = np.diff(b)
    assert sizes.sum() == 1000 and sizes.min() >= 1000 // 7
    ids = np.arange(1, 1001)
    cl = cluster_of(ids, b)
    assert cl.min() == 0 and cl.max() == 6
    # block membership: bounds[c] < id <= bounds[c+1]
    assert ((ids > b[cl]) & (ids <= b[cl + 1])).all()


def test_cli_and_serve_wiring(tmp_path):
    """--synthetic_process markov flows through DataConfig → load_catalog
    → args.json → serve regeneration (the catalog must be regenerable
    from args.json alone)."""
    from carca_tpu.cli import build_parser, config_from_args, load_catalog

    a = build_parser().parse_args(
        ["--synthetic", "true", "--synthetic_users", "50",
         "--synthetic_items", "200", "--synthetic_process", "markov",
         "--seed", "7"])
    dc = config_from_args(a, 0, 0, 0).data
    assert dc.synthetic_process == "markov"
    cat = load_catalog(a)
    direct = synthetic_catalog_markov(n_users=50, n_real_items=200, seed=7)
    np.testing.assert_array_equal(np.asarray(cat.items),
                                  np.asarray(direct.items))

    gen = synthetic_generator("markov", device=False)
    assert gen is synthetic_catalog_markov
    import pytest
    with pytest.raises(ValueError, match="synthetic_process"):
        synthetic_generator("v3", device=False)
