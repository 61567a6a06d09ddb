"""Zero-temporal-leakage property test (SURVEY.md §5c, north rule).

Poison every row with ts > t0 (garbage text/value/ts ordering preserved) and
re-run the feature pipeline: every feature at as-of points <= t0 must be
IDENTICAL. The windowed stages read only rows at or before the as-of point by
construction; this test proves it empirically."""

import numpy as np
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
