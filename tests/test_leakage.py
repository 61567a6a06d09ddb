"""Zero-temporal-leakage property test (SURVEY.md §5c, north rule).

Poison every row with ts > t0 (garbage text/value/ts ordering preserved) and
re-run the feature pipeline: every feature at as-of points <= t0 must be
IDENTICAL. The windowed stages read only rows at or before the as-of point by
construction; this test proves it empirically."""

import numpy as np
import pytest
import pyarrow as pa
import ray.data as rd

from rp_extract_ray.stages.asof import asof_join
from rp_extract_ray.stages.session import sessionize
from rp_extract_ray.stages.turns import add_turn_stats
from rp_extract_ray.stages.window import add_window_features

ORDER = ("ts", "turn_idx")


def _features(t: pa.Table, ev: pa.Table):
    ds = add_turn_stats(rd.from_arrow(t))
    ds = sessionize(ds, order_cols=ORDER, num_partitions=8)
    ds = add_window_features(ds, k=8, order_cols=ORDER, num_partitions=8)
    ds = asof_join(ds, rd.from_arrow(ev), right_value_cols=["value"], num_partitions=8)
    return (
        ds.to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )


def test_future_poisoning(corpus):
    t, ev = corpus
    pdf = t.to_pandas()
    t0 = pdf["ts"].quantile(0.5)

    # poison the future: garbage text and value-bearing columns for ts > t0
    poisoned = pdf.copy()
    fut = poisoned["ts"] > t0
    assert fut.any() and (~fut).any()
    poisoned.loc[fut, "text"] = "XXXXX GARBAGE " * 50
    poisoned.loc[fut, "role"] = "corrupted"
    ev_pdf = ev.to_pandas()
    ev_poisoned = ev_pdf.copy()
    ev_fut = ev_poisoned["ts"] > t0
    ev_poisoned.loc[ev_fut, "value"] = 1e9

    clean = _features(t, ev)
    dirty = _features(
        pa.Table.from_pandas(poisoned, preserve_index=False),
        pa.Table.from_pandas(ev_poisoned, preserve_index=False),
    )

    past = (clean["ts"] <= t0).to_numpy()
    num_cols = [
        c
        for c in clean.columns
        if clean[c].dtype.kind in "ifc" and c not in ("turn_idx",)
    ]
    assert len(num_cols) > 20
    for c in num_cols:
        a = clean.loc[past, c].to_numpy(dtype=np.float64)
        b = dirty.loc[past, c].to_numpy(dtype=np.float64)
        # bit-identical: same rows, same sequential per-conv computation
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), (c, np.flatnonzero(~same)[:5])


def test_rhythm_future_poisoning(corpus):
    """Per-segment rhythm vectors available at ts_end <= t0 are identical
    when every row after t0 is corrupted."""
    from rp_extract_ray.stages.rhythm import rhythm_features

    t, _ = corpus
    pdf = t.to_pandas()
    t0 = pdf["ts"].quantile(0.6)

    def run(table):
        ds = add_turn_stats(rd.from_arrow(table))
        return (
            rhythm_features(
                ds, seg_len=8, n_mod=8, order_cols=ORDER, per_segment=True,
                num_partitions=8,
            )
            .to_pandas()
            .sort_values(["conv_id", "seg_idx"], ignore_index=True)
        )

    clean = run(t)
    poisoned = pdf.copy()
    fut = poisoned["ts"] > t0
    poisoned.loc[fut, "text"] = "GARBAGE " * 100
    dirty = run(pa.Table.from_pandas(poisoned, preserve_index=False))

    past = clean["ts_end"] <= t0
    assert past.any()
    a = clean.loc[past].reset_index(drop=True)
    b = dirty.loc[
        dirty.set_index(["conv_id", "seg_idx"]).index.isin(
            a.set_index(["conv_id", "seg_idx"]).index
        )
    ].reset_index(drop=True)
    assert len(a) <= len(b)
    b = b.iloc[: len(a)]
    for k in ("rp", "rh", "ssd", "mvd"):
        av = np.stack(a[k].to_numpy())
        bv = np.stack(b[k].to_numpy())
        assert (av == bv).all(), k


def test_salted_lag_guards(corpus):
    from rp_extract_ray.stages.lag import add_lag_features
    from rp_extract_ray.stages.partition import SaltSpec

    t, _ = corpus
    with pytest.raises(ValueError, match="ffill"):
        add_lag_features(
            rd.from_arrow(t), ["text_len"], ffill_cols=["text_len"],
            salt=SaltSpec(chunk_turns=64, overlap=8),
        )
    with pytest.raises(ValueError, match="horizon"):
        add_lag_features(
            rd.from_arrow(t), ["text_len"], lags=(10,),
            salt=SaltSpec(chunk_turns=64, overlap=4),
        )


def test_time_window_no_future_leakage(corpus):
    """Sliding time-window aggregates read only rows with ts <= as-of point
    (same-ts peers are the as-of instant itself, included by RANGE
    semantics): poisoning strictly-later rows changes nothing at <= t0."""
    from rp_extract_ray.stages.timegrid import time_window_aggregate

    t, _ = corpus
    pdf = t.to_pandas()
    t0 = pdf["ts"].quantile(0.5)

    def run(frame):
        return (
            time_window_aggregate(
                rd.from_arrow(pa.Table.from_pandas(frame, preserve_index=False)),
                entity_col="conv_id", ts_col="ts", value_col="turn_idx",
                window_s=600.0, order_cols=ORDER, num_partitions=8,
            )
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], ignore_index=True)
        )

    clean = run(pdf)
    poisoned = pdf.copy()
    fut = poisoned["ts"] > t0
    assert fut.any() and (~fut).any()
    poisoned["turn_idx"] = poisoned["turn_idx"].astype("int64")
    poisoned.loc[fut, "turn_idx"] = poisoned.loc[fut, "turn_idx"] + 10_000_000
    dirty = run(poisoned)
    past = (clean["ts"] <= t0).to_numpy()
    for c in ("turn_idx_tsum", "turn_idx_tcnt", "turn_idx_tmean"):
        assert np.allclose(
            clean.loc[past, c].to_numpy(dtype=np.float64),
            dirty.loc[past, c].to_numpy(dtype=np.float64),
        ), c


def test_salted_fused_future_poisoning(corpus):
    """The salted fused flagship path (salted_session_apply post mode inside
    feature_backfill) has the same zero-leakage property: poisoning every
    row with ts > t0 leaves all features at as-of points <= t0 bit-identical."""
    from rp_extract_ray.pipelines.flagship import feature_backfill

    t, ev = corpus
    pdf = t.to_pandas()
    t0 = pdf["ts"].quantile(0.5)
    poisoned = pdf.copy()
    fut = poisoned["ts"] > t0
    poisoned.loc[fut, "text"] = "XXXXX GARBAGE " * 50
    ev_pdf = ev.to_pandas()
    ev_poisoned = ev_pdf.copy()
    ev_poisoned.loc[ev_poisoned["ts"] > t0, "value"] = 1e9

    def run(tt, evv):
        return (
            feature_backfill(
                rd.from_arrow(tt), rd.from_arrow(evv),
                k=8, num_partitions=8, salt_chunk_turns=32,
            )
            .to_pandas()
            .sort_values(["conv_id", "turn_idx"], ignore_index=True)
        )

    clean = run(t, ev)
    dirty = run(
        pa.Table.from_pandas(poisoned, preserve_index=False),
        pa.Table.from_pandas(ev_poisoned, preserve_index=False),
    )
    past = (clean["ts"] <= t0).to_numpy()
    num_cols = [
        c for c in clean.columns
        if clean[c].dtype.kind in "ifc" and c not in ("turn_idx",)
    ]
    assert len(num_cols) > 20
    for c in num_cols:
        a = clean.loc[past, c].to_numpy(dtype=np.float64)
        b = dirty.loc[past, c].to_numpy(dtype=np.float64)
        same = (a == b) | (np.isnan(a) & np.isnan(b))
        assert same.all(), (c, np.flatnonzero(~same)[:5])


def test_feature_matrix_future_poisoning(tmp_path):
    """The feature-store gate (pipelines/events.q_feature_matrix): spine
    features at as-of points <= t0 are bit-identical when every event after
    t0 is corrupted (value blown up, types scrambled)."""
    import pandas as pd

    from rp_extract_ray.pipelines.events import q_feature_matrix

    rng = np.random.default_rng(11)
    n = 3000
    ts = pd.Timestamp("2024-01-01").value // 1000 + np.sort(
        rng.integers(0, 90 * 86_400_000_000, size=n)
    )
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts, unit="us"),
            "user_id": rng.integers(0, 60, size=n).astype(np.int64),
            "event_type": rng.choice(
                ["click", "purchase", "view", "error"], size=n
            ),
            "value": np.round(rng.uniform(0.01, 50.0, size=n), 4),
            "props": "{}",
        }
    )
    # force some equal-ts duplicates so the dedup_right='max' contract is hit
    pdf.loc[100:140, "ts"] = pdf.loc[99, "ts"]

    t0 = pdf["ts"].quantile(0.5)
    dirty = pdf.copy()
    fut = dirty["ts"] > t0
    assert fut.any() and (~fut).any()
    dirty.loc[fut, "value"] = 1e9
    dirty.loc[fut, "event_type"] = rng.permutation(
        dirty.loc[fut, "event_type"].to_numpy()
    )

    def run(frame, name):
        d = tmp_path / name
        d.mkdir()
        frame.to_parquet(d / "events.parquet", index=False)
        return (
            q_feature_matrix(str(d))
            .to_pandas()
            .sort_values(["event_id"], ignore_index=True)
        )

    a, b = run(pdf, "clean"), run(dirty, "dirty")
    past_a = a[a["ts"] <= t0].reset_index(drop=True)
    past_b = b[b["ts"] <= t0].reset_index(drop=True)
    assert len(past_a) == len(past_b) and len(past_a) > 100
    for c in ("f_click_value", "f_sum_todate", "f_n_todate"):
        x = past_a[c].to_numpy(dtype=np.float64)
        y = past_b[c].to_numpy(dtype=np.float64)
        same = (x == y) | (np.isnan(x) & np.isnan(y))
        assert same.all(), (c, np.flatnonzero(~same)[:5])
