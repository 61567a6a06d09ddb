"""Hypothesis property tests for the temporal kernels (pure numpy — no Ray
needed) and a cross-stage composition check."""

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from rp_extract_ray.functions.rounding import round_half_away
from rp_extract_ray.stages.lag import _run_ends, ffill_within, shifted
from rp_extract_ray.stages.partition import entity_starts
from rp_extract_ray.stages.session import session_ids


@st.composite
def entity_runs(draw):
    """Sorted entity array as run lengths."""
    lens = draw(st.lists(st.integers(1, 6), min_size=1, max_size=6))
    ent = np.repeat(np.arange(len(lens)), lens)
    return ent


@settings(max_examples=80, deadline=None)
@given(entity_runs(), st.integers(-3, 3))
def test_shifted_matches_pandas_groupby_shift(ent, k):
    rng = np.random.default_rng(len(ent) * 7 + k + 3)
    vals = rng.normal(size=len(ent))
    starts = entity_starts(ent)
    got = shifted(vals, k, starts)
    exp = pd.Series(vals).groupby(ent).shift(k).to_numpy()
    assert np.allclose(got, exp, equal_nan=True)


@settings(max_examples=50, deadline=None)
@given(entity_runs())
def test_run_ends_and_starts_consistent(ent):
    starts = entity_starts(ent)
    ends = _run_ends(starts)
    for i in range(len(ent)):
        assert starts[i] <= i < ends[i]
        assert (ent[starts[i] : ends[i]] == ent[i]).all()


@settings(max_examples=60, deadline=None)
@given(entity_runs(), st.floats(0.05, 0.95))
def test_ffill_matches_pandas(ent, nan_frac):
    rng = np.random.default_rng(int(nan_frac * 1000) + len(ent))
    vals = rng.normal(size=len(ent))
    vals[rng.random(len(ent)) < nan_frac] = np.nan
    starts = entity_starts(ent)
    got = ffill_within(vals, starts)
    exp = pd.Series(vals).groupby(ent).ffill().to_numpy()
    assert np.allclose(got, exp, equal_nan=True)


@settings(max_examples=60, deadline=None)
@given(entity_runs(), st.floats(1.0, 100.0))
def test_session_ids_match_pandas(ent, gap_thr):
    rng = np.random.default_rng(len(ent) + int(gap_thr))
    gaps = rng.exponential(scale=gap_thr, size=len(ent))
    ts = np.cumsum(gaps)
    # reset ts to increasing within each run only (runs are independent convs)
    ts_us = (ts * 1e6).astype(np.int64).astype("datetime64[us]")
    starts = entity_starts(ent)
    _, got = session_ids(ts_us, starts, gap_thr)
    pdf = pd.DataFrame({"e": ent, "ts": ts})
    def per(g):
        gap = g["ts"].diff().fillna(0.0)
        return (gap > gap_thr).cumsum()
    exp = pdf.groupby("e", group_keys=False).apply(per).to_numpy()
    assert (got == exp).all()


@settings(max_examples=200, deadline=None)
@given(st.floats(-1e6, 1e6, allow_nan=False), st.integers(0, 6))
def test_round_half_away_matches_decimal(x, nd):
    # domain: |x|*10**nd << 2**52 (the kernel's documented precision domain —
    # beyond it the scaling multiply rounds, exactly as SQL ROUND does)
    import decimal

    got = float(round_half_away(np.array([x]), nd)[0])
    d = decimal.Decimal(x).quantize(
        decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP
    )
    assert abs(got - float(d)) <= abs(x) * 1e-15 + 10.0**-nd * 1e-6


def test_declarative_spec_matches_hand_built(corpus):
    """A spec-compiled pipeline == the equivalent hand-chained calls."""
    import numpy as np
    import ray.data as rd

    from rp_extract_ray.pipelines.spec import (
        available_stages,
        build_pipeline,
        register_stage,
    )
    from rp_extract_ray.stages.session import sessionize
    from rp_extract_ray.stages.turns import add_turn_stats
    from rp_extract_ray.stages.window import add_window_features

    t, _ = corpus
    spec = [
        {"stage": "turn_stats"},
        {"stage": "sessionize", "order_cols": ("ts", "turn_idx"), "num_partitions": 8},
        {"stage": "window", "k": 8, "series_cols": ["text_len"],
         "order_cols": ("ts", "turn_idx"), "num_partitions": 8},
    ]
    got = (
        build_pipeline(rd.from_arrow(t), spec)
        .to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    hand = add_turn_stats(rd.from_arrow(t))
    hand = sessionize(hand, order_cols=("ts", "turn_idx"), num_partitions=8)
    hand = add_window_features(
        hand, ["text_len"], k=8, order_cols=("ts", "turn_idx"), num_partitions=8
    )
    exp = hand.to_pandas().sort_values(["conv_id", "turn_idx"], ignore_index=True)
    assert list(got.columns) == list(exp.columns)
    assert np.allclose(
        got["text_len_wmean"].to_numpy(), exp["text_len_wmean"].to_numpy()
    )
    assert "window" in available_stages()
    # extension hook + unknown-stage error
    register_stage("noop", lambda ds: ds)
    assert build_pipeline(rd.from_arrow(t), [{"stage": "noop"}]).count() == len(t)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown stage"):
        build_pipeline(rd.from_arrow(t), [{"stage": "bogus"}])


@given(
    st.lists(
        st.text(
            alphabet=" theandiogscrlßüé的这中一是ión.,0123456789",
            min_size=0,
            max_size=120,
        ),
        min_size=0,
        max_size=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_langid_single_pass_matches_naive_counts(texts):
    """The byte-stream LangId scorer == the per-gram str.count sweep on
    arbitrary text (incl. multi-byte chars and gram-dense strings) — the
    equivalence the single-pass rewrite relies on."""
    import re

    import pandas as pd

    from rp_extract_ray.functions.rounding import round_half_away
    from rp_extract_ray.stages.textstage import LangId, _LANG_PROFILES

    df = pd.DataFrame({"text": pd.Series(texts, dtype=object)})
    out = LangId()(df.copy())
    t = df["text"].fillna("").str.lower()
    scores = np.zeros((len(t), len(_LANG_PROFILES)))
    for j, gs in enumerate(_LANG_PROFILES.values()):
        for g in gs:
            scores[:, j] += t.str.count(re.escape(g)).to_numpy()
    total = np.maximum(scores.sum(axis=1), 1e-9)
    best = scores.argmax(axis=1)
    pred = pd.Series(np.array(list(_LANG_PROFILES), dtype=object)[best])
    pred[scores.max(axis=1) == 0] = "unk"
    conf = round_half_away(scores[np.arange(len(t)), best] / total, 6)
    assert (out["lang_pred"].to_numpy() == pred.to_numpy()).all()
    assert np.allclose(out["lang_conf"].to_numpy(), conf)


def test_registry_covers_round3_stages():
    """The declarative registry (§2.10 surface) exposes every round-3 stage
    family; unknown names still raise with the available list."""
    from rp_extract_ray.pipelines.spec import available_stages

    names = set(available_stages())
    for expected in (
        "merge_intervals", "time_bucket", "time_grid_lerp", "rollup", "cube",
        "grouped_reduce", "cohort_retention", "flatten", "transitions",
        "token_ids", "bigram_pmi", "boilerplate", "ntile", "longest_streak",
        "repetition", "boilerplate_share", "dedup_normalized",
    ):
        assert expected in names, expected
    assert len(names) >= 36


def test_registry_covers_round4_stages():
    from rp_extract_ray.pipelines.spec import available_stages

    names = set(available_stages())
    for expected in ("redact", "pack", "pack_stats"):
        assert expected in names, expected
    assert len(names) >= 39


def test_registry_covers_round5_stages():
    from rp_extract_ray.pipelines.spec import available_stages

    names = set(available_stages())
    for expected in ("group_mode", "group_corr", "unpivot"):
        assert expected in names, expected
    assert len(names) >= 42
