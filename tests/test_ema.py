"""EMA (Polyak) weight averaging — ``TrainConfig.ema_decay``.

Drift mitigation for the retrieval-objective regime (DESIGN §11e finding
11: softmax runs collapse one-three epochs past their peak, so retention
must catch a fleeting peak). The reference has no equivalent (its
retention is raw best-val-NDCG weights only, ``src/train.py:114-124``);
the contract here: shadow = d·shadow + (1−d)·params after every optimizer
step, ALL evaluation (sampled val, retrieval monitoring, retention, test)
runs on the shadow, ``best/`` retains the shadow, and ``latest/`` resumes
it exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from carca_tpu.config import Config, DataConfig, ModelConfig, TrainConfig
from carca_tpu.data.synthetic import synthetic_catalog
from carca_tpu.train.loop import ema_update, fit
from carca_tpu.train.state import create_train_state, make_optimizer


def _cfg(out_dir, epochs=2, ema_decay=0.0, seed=0):
    cat = synthetic_catalog(n_users=120, n_real_items=80, seed=1)
    mc = ModelConfig(n_items=cat.n_items, n_attrs=cat.n_attrs, n_ctx=cat.n_ctx,
                     d=16, g=32, seq_len=6, target_len=8, n_blocks=1,
                     n_heads=2, dropout=0.1, decoder="ca")
    tc = TrainConfig(batch_size=32, epochs=epochs, early_stop=50, seed=seed,
                     out_dir=out_dir, ema_decay=ema_decay)
    return cat, Config(model=mc, data=DataConfig(synthetic=True), train=tc)


def _leaves(tree):
    return [np.asarray(l) for l in jax.tree_util.tree_leaves(tree)]


def test_ema_update_math():
    """shadow' = d·shadow + (1−d)·params, leafwise, vs numpy."""
    ema = {"a": jnp.arange(6.0).reshape(2, 3), "b": jnp.full((4,), 2.0)}
    params = {"a": jnp.ones((2, 3)) * 10.0, "b": jnp.zeros((4,))}
    out = ema_update(ema, params, jnp.float32(0.75))
    np.testing.assert_allclose(
        np.asarray(out["a"]),
        0.75 * np.arange(6.0).reshape(2, 3) + 0.25 * 10.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out["b"]), 0.75 * 2.0, rtol=1e-6)


def test_decay_one_freezes_shadow_while_training_moves(tmp_path):
    """d=1.0 is the degenerate endpoint: the shadow never moves, so the
    returned (evaluated/retained) weights are bit-identical to the init —
    while the optimizer state proves training really stepped. A strong
    end-to-end check that every eval/retention surface reads the shadow,
    not the raw weights."""
    cat, cfg = _cfg(str(tmp_path / "frozen"), epochs=2, ema_decay=1.0)
    state, m = fit(cfg, cat, log=False)
    assert int(state.step) > 0 and m["epochs_run"] == 2

    init = create_train_state(jax.random.PRNGKey(cfg.train.seed), cfg.model,
                              cfg.train, make_optimizer(cfg.train)).params
    for got, want in zip(_leaves(state.params), _leaves(init)):
        np.testing.assert_array_equal(got, want)

    # and the raw weights DID move: a no-EMA run from the same seed ends
    # on different (trained) params
    cat, raw_cfg = _cfg(str(tmp_path / "raw"), epochs=2, ema_decay=0.0)
    raw_state, _ = fit(raw_cfg, cat, log=False)
    assert any(not np.array_equal(a, b) for a, b in
               zip(_leaves(raw_state.params), _leaves(init)))


def test_best_checkpoint_retains_the_shadow(tmp_path):
    """best/ must hold the EMA weights (what serving loads), equal to the
    state fit returns and distinct from the raw-run retention."""
    out = str(tmp_path / "ema_run")
    cat, cfg = _cfg(out, epochs=2, ema_decay=0.9)
    state, _ = fit(cfg, cat, log=False)

    import os
    from carca_tpu.train.checkpoint import CheckpointKeeper
    tx = make_optimizer(cfg.train)
    template = create_train_state(jax.random.PRNGKey(cfg.train.seed),
                                  cfg.model, cfg.train, tx)
    keeper = CheckpointKeeper(os.path.join(out, "ckpt"))
    try:
        assert keeper.best_metrics()["ema_decay"] == 0.9  # audit sidecar
        restored = keeper.restore_best(template)
    finally:
        keeper.close()
    assert restored is not None
    for got, want in zip(_leaves(restored[1].params), _leaves(state.params)):
        np.testing.assert_array_equal(got, want)

    cat, raw_cfg = _cfg(str(tmp_path / "raw_run"), epochs=2, ema_decay=0.0)
    raw_state, _ = fit(raw_cfg, cat, log=False)
    assert any(not np.array_equal(a, b) for a, b in
               zip(_leaves(raw_state.params), _leaves(state.params)))


def test_resume_restores_shadow_exactly(tmp_path):
    """Interrupt-at-epoch-boundary resume with EMA on must be bit-identical
    to the uninterrupted run: the shadow is restored from ckpt/ema/, not
    re-seeded from the live weights (re-seeding would forget the average)."""
    out = str(tmp_path / "interrupted")
    cat, cfg2 = _cfg(out, epochs=2, ema_decay=0.8)
    fit(cfg2, cat, log=False)
    cat, cfg4 = _cfg(out, epochs=4, ema_decay=0.8)
    resumed, m4 = fit(cfg4, cat, log=False)
    assert m4["epochs_run"] == 4

    cat, ref_cfg = _cfg(str(tmp_path / "straight"), epochs=4, ema_decay=0.8)
    straight, _ = fit(ref_cfg, cat, log=False)
    for got, want in zip(_leaves(resumed.params), _leaves(straight.params)):
        np.testing.assert_array_equal(got, want)
