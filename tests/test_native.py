"""Native C++ assembler vs numpy assembler parity.

Deterministic parts (profile windows, positives, contexts, labels) must be
bit-identical; negatives come from a different PRNG stream, so they are
checked against the sampler *contract* (domain, full-history rejection,
in-example dedup, placement, context inheritance — src/data.py:77-137).
"""

import numpy as np
import pytest

from carca_tpu.data.dataset import BatchBuilder
from carca_tpu.data.synthetic import synthetic_catalog
from carca_tpu.native import get_assembler

native = get_assembler()
pytestmark = pytest.mark.skipif(native is None, reason="no C++ toolchain")


@pytest.fixture(scope="module")
def setup():
    cat = synthetic_catalog(n_users=300, n_real_items=400, seed=7)
    b_np = BatchBuilder(cat, seq_len=12, target_len=25, test=True)
    b_nat = BatchBuilder(cat, seq_len=12, target_len=25, test=True,
                         native=native)
    return cat, b_np, b_nat


def _profile_set(cat, u):
    return set(cat.items[cat.offsets[u]: cat.offsets[u + 1]].tolist())


def test_train_batch_parity(setup):
    cat, b_np, b_nat = setup
    rows = np.concatenate([b_np.users("train")[:62], [-1, -1]])  # pad rows
    ref = b_np.train_batch(rows, np.random.default_rng(0))
    got = b_nat.train_batch(rows, np.random.default_rng(0))

    L = b_np.L
    for k in ("p_x", "p_c", "y_true"):
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)
    # positive half of o_x/o_c is deterministic
    np.testing.assert_array_equal(got["o_x"][:, :L], ref["o_x"][:, :L])
    np.testing.assert_array_equal(got["o_c"], ref["o_c"])  # negs inherit pos ctx
    assert int(got["n_valid"]) == int(ref["n_valid"])

    # negative half: contract checks
    for b, u in enumerate(rows):
        negs = got["o_x"][b, L:]
        valid = got["p_x"][b] > 0
        assert (negs[~valid] == 0).all()
        live = negs[valid]
        if u < 0:
            assert live.size == 0
            continue
        assert live.min(initial=2**31 - 1) >= 1
        assert live.max(initial=0) <= cat.n_items - 1
        assert len(set(live.tolist())) == live.size  # dedup
        assert not (set(live.tolist()) & _profile_set(cat, int(u)))


@pytest.mark.parametrize("mode", ["val", "test"])
def test_eval_batch_parity(setup, mode):
    cat, b_np, b_nat = setup
    rows = b_np.users(mode)[:48]
    ref = b_np.eval_batch(rows, np.random.default_rng(1), mode)
    got = b_nat.eval_batch(rows, np.random.default_rng(1), mode)

    for k in ("p_x", "p_c", "y_true"):
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)
    np.testing.assert_array_equal(got["o_x"][:, 0], ref["o_x"][:, 0])  # held-out pos
    assert int(got["n_valid"]) == int(ref["n_valid"])

    for b, u in enumerate(rows):
        # all candidates share the positive's context (src/data.py:185)
        np.testing.assert_array_equal(
            got["o_c"][b], np.broadcast_to(ref["o_c"][b, :1], ref["o_c"][b].shape))
        negs = got["o_x"][b, 1:]
        assert negs.min() >= 1 and negs.max() <= cat.n_items - 1
        assert len(set(negs.tolist())) == negs.size
        assert not (set(negs.tolist()) & _profile_set(cat, int(u)))


def test_native_determinism(setup):
    _, _, b_nat = setup
    rows = b_nat.users("train")[:16]
    a = b_nat.train_batch(rows, np.random.default_rng(5))
    b = b_nat.train_batch(rows, np.random.default_rng(5))
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
