"""Negative/positive controls for the oracle-compare helper: the whole
correctness gate routes through assert_frames_match, so prove it can
actually FAIL (values, dtype families, columns, row counts) and that
its deliberate insensitivities (row order) hold. Pure pandas — no
Spark session."""

from __future__ import annotations

import pandas as pd
import pytest

from tests.oracle_utils import assert_frames_match


def _df(**cols):
    return pd.DataFrame(cols)


def test_passes_on_identical_and_row_permuted():
    a = _df(k=[1, 2, 3], v=[1.5, 2.5, 3.5])
    assert_frames_match(a, a.copy(), name="identity")
    shuffled = a.iloc[[2, 0, 1]].reset_index(drop=True)
    assert_frames_match(a, shuffled, name="row-order")  # order-insensitive


def test_fails_on_value_drift_beyond_atol():
    a = _df(k=[1], v=[1.0000])
    b = _df(k=[1], v=[1.0010])  # > atol=5e-4
    with pytest.raises(AssertionError, match="col v"):
        assert_frames_match(a, b, name="drift")


def test_fails_on_dtype_family_skew():
    a = _df(v=pd.Series([1, 2], dtype="int64"))
    b = _df(v=pd.Series([1.0, 2.0], dtype="float64"))
    with pytest.raises(AssertionError, match="dtype family"):
        assert_frames_match(a, b, name="dtype")


def test_fails_on_column_and_row_count_mismatch():
    a = _df(k=[1], v=[1.0])
    with pytest.raises(AssertionError, match="column mismatch"):
        assert_frames_match(a, _df(k=[1], other=[1.0]), name="cols")
    with pytest.raises(AssertionError, match="row count"):
        assert_frames_match(a, _df(k=[1, 2], v=[1.0, 2.0]), name="rows")
