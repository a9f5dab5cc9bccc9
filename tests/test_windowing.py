"""Golden tests for leave-one-out windowing vs a scalar oracle transcribed
from the behavioral contract in SURVEY.md §2.1 #12 (src/data.py:53-74)."""

import numpy as np
import pytest

from carca_tpu.data.windowing import window_bounds, valid_users


def oracle_pad_profile(length: int, max_len: int, mode: str, test: bool):
    """Scalar re-derivation of the reference window logic (not imported)."""
    start, end = 0, 0
    if mode == "train" and length > 1:
        n_exc = 2 if test else 1
        start = max(0, length - n_exc - max_len - 1)
        end = max(1, length - n_exc)
    if mode == "val" and length > 2:
        n_exc = 1 if test else 0
        start = max(0, length - n_exc - max_len - 1)
        end = max(2, length - n_exc)
    if mode == "test" and length > 3:
        start = max(0, length - max_len - 1)
        end = max(3, length)
    return list(range(start, end))


@pytest.mark.parametrize("mode", ["train", "val", "test"])
@pytest.mark.parametrize("test", [True, False])
@pytest.mark.parametrize("max_len", [5, 50])
def test_window_bounds_match_oracle(mode, test, max_len):
    lengths = np.arange(0, 2 * max_len + 10)
    start, end = window_bounds(lengths, max_len, mode, test)
    for i, ln in enumerate(lengths):
        want = oracle_pad_profile(int(ln), max_len, mode, test)
        got = list(range(start[i], end[i]))
        assert got == want, (mode, test, max_len, int(ln))


def test_valid_users_filter():
    lengths = np.array([0, 1, 2, 3, 4, 10])
    # train requires len > 1; val > 2; test > 3 (src/data.py:59-72)
    assert valid_users(lengths, 5, "train", True).tolist() == [2, 3, 4, 5]
    assert valid_users(lengths, 5, "val", True).tolist() == [3, 4, 5]
    assert valid_users(lengths, 5, "test", True).tolist() == [4, 5]


def test_invalid_mode_raises():
    with pytest.raises(ValueError):
        window_bounds(np.array([5]), 5, "bogus", True)
