"""7-stat kernel semantics (reference calc_statistical_features,
/root/reference/rp_extract.py:218-232): population moments, Pearson kurtosis,
NaN->0."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rp_extract_ray.functions.stats import seven_stats, seven_stats_nan
from rp_extract_ray.pipelines.oracle import _stats7


def test_matches_oracle_rows():
    rng = np.random.default_rng(0)
    m = rng.normal(3, 2, size=(20, 17))
    got = seven_stats(m)
    for i in range(m.shape[0]):
        exp = _stats7(m[i])
        assert np.allclose(got[i], exp), (i, got[i], exp)


def test_zero_variance_row_nan_to_zero():
    m = np.full((3, 5), 2.5)
    got = seven_stats(m)
    # skew/kurt of constant series are 0/0 -> NaN -> 0 (reference :230)
    assert np.allclose(got[:, 2], 0.0)
    assert np.allclose(got[:, 3], 0.0)
    assert np.allclose(got[:, 0], 2.5)
    assert np.allclose(got[:, 1], 0.0)


def test_axis0_transposes():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(6, 9))
    assert np.allclose(seven_stats(m, axis=0), seven_stats(m.T, axis=1))


def test_nan_variant_full_windows_match_dense():
    rng = np.random.default_rng(2)
    m = rng.normal(size=(11, 8))
    assert np.allclose(seven_stats_nan(m), seven_stats(m))


def test_nan_variant_masks():
    w = np.array([[np.nan, np.nan, 1.0, 3.0], [np.nan] * 4])
    got = seven_stats_nan(w)
    assert np.allclose(got[0], _stats7(np.array([1.0, 3.0])))
    assert np.allclose(got[1], 0.0)  # empty window -> all-zero stats


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False, width=32),
        min_size=1,
        max_size=40,
    )
)
def test_property_matches_oracle(xs):
    arr = np.array(xs, dtype=np.float64)
    got = seven_stats(arr[None, :])[0]
    exp = np.array(_stats7(arr))
    assert np.allclose(got, exp, rtol=1e-9, atol=1e-12)
