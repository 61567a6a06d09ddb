"""Range (interval) join: distributed paths vs a naive pandas oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from rp_extract_ray.stages.rangejoin import range_join


def _mk(seed=7, n_left=400, n_iv=60, n_entities=12, disjoint=False):
    rng = np.random.default_rng(seed)
    base = pd.Timestamp("2026-01-01")
    left = pd.DataFrame(
        {
            "row_id": np.arange(n_left, dtype=np.int64),
            "conv_id": rng.integers(0, n_entities, n_left).astype(np.int64),
            "ts": base + pd.to_timedelta(rng.integers(0, 100_000, n_left), unit="s"),
            "x": rng.normal(size=n_left).round(3),
        }
    )
    if disjoint:
        # per entity: consecutive non-overlapping windows
        rows = []
        iv_id = 0
        for e in range(n_entities):
            t = 0
            for _ in range(n_iv // n_entities):
                start = t + int(rng.integers(1, 2000))
                width = int(rng.integers(1, 3000))
                rows.append((iv_id, e, start, start + width))
                t = start + width + 1  # closed bounds: must not touch
                iv_id += 1
        iv = pd.DataFrame(rows, columns=["iv_id", "conv_id", "s", "e"])
        iv["start_ts"] = base + pd.to_timedelta(iv.pop("s"), unit="s")
        iv["end_ts"] = base + pd.to_timedelta(iv.pop("e"), unit="s")
    else:
        starts = rng.integers(0, 95_000, n_iv)
        iv = pd.DataFrame(
            {
                "iv_id": np.arange(n_iv, dtype=np.int64),
                "conv_id": rng.integers(0, n_entities, n_iv).astype(np.int64),
                "start_ts": base + pd.to_timedelta(starts, unit="s"),
                "end_ts": base
                + pd.to_timedelta(starts + rng.integers(100, 20_000, n_iv), unit="s"),
            }
        )
    iv["w"] = rng.normal(size=len(iv)).round(3)
    return left, iv


def _oracle(left, iv, how="inner", closed="both"):
    lo_inc = closed in ("both", "left")
    hi_inc = closed in ("both", "right")
    m = left.merge(iv, on="conv_id", how="left")
    inside = (m.ts >= m.start_ts) if lo_inc else (m.ts > m.start_ts)
    inside &= (m.ts <= m.end_ts) if hi_inc else (m.ts < m.end_ts)
    inside &= ~(m.start_ts.isna() | m.end_ts.isna())
    hit = m[inside].drop(columns=["start_ts", "end_ts"])
    if how == "inner":
        return hit.reset_index(drop=True)
    missed = left[~left.row_id.isin(hit.row_id)].copy()
    missed["iv_id"] = pd.array([pd.NA] * len(missed), dtype="Int64")
    missed["w"] = np.nan
    return pd.concat([hit, missed], ignore_index=True)


def _canon(df):
    df = df.copy()
    df["iv_id"] = df["iv_id"].astype("float64")  # null-tolerant compare
    return (
        df.sort_values(["row_id", "iv_id"], na_position="last")
        .reset_index(drop=True)[["row_id", "conv_id", "ts", "x", "iv_id", "w"]]
    )


@pytest.mark.parametrize("broadcast", [True, False])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_range_join_matches_oracle(broadcast, how):
    left, iv = _mk()
    got = range_join(
        rd.from_pandas(left),
        rd.from_pandas(iv),
        entity_col="conv_id",
        ts_col="ts",
        interval_value_cols=["iv_id", "w"],
        how=how,
        broadcast=broadcast,
        num_partitions=8,
        left_schema=pa.Schema.from_pandas(left),
    ).to_pandas()
    want = _oracle(left, iv, how=how)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


@pytest.mark.parametrize("closed", ["both", "left", "right", "neither"])
def test_closed_bounds(closed):
    left, iv = _mk(seed=11)
    # plant exact boundary hits
    left.loc[0, ["conv_id", "ts"]] = [99, iv_ts := pd.Timestamp("2026-02-01")]
    left.loc[1, ["conv_id", "ts"]] = [99, iv_ts + pd.Timedelta(seconds=50)]
    iv.loc[len(iv)] = {
        "iv_id": 999, "conv_id": 99, "start_ts": iv_ts,
        "end_ts": iv_ts + pd.Timedelta(seconds=50), "w": 1.0,
    }
    got = range_join(
        rd.from_pandas(left), rd.from_pandas(iv),
        entity_col="conv_id", ts_col="ts",
        interval_value_cols=["iv_id", "w"], closed=closed,
        broadcast=True,
    ).to_pandas()
    want = _oracle(left, iv, closed=closed)
    pd.testing.assert_frame_equal(_canon(got), _canon(want))


@pytest.mark.parametrize("broadcast", [True, False])
def test_disjoint_fast_path_equals_general(broadcast):
    left, iv = _mk(seed=3, disjoint=True)
    kw = dict(
        entity_col="conv_id", ts_col="ts", interval_value_cols=["iv_id", "w"],
        broadcast=broadcast, num_partitions=8,
        left_schema=pa.Schema.from_pandas(left),
    )
    fast = range_join(
        rd.from_pandas(left), rd.from_pandas(iv), assume_disjoint=True, **kw
    ).to_pandas()
    gen = range_join(rd.from_pandas(left), rd.from_pandas(iv), **kw).to_pandas()
    pd.testing.assert_frame_equal(_canon(fast), _canon(gen))
    pd.testing.assert_frame_equal(_canon(fast), _canon(_oracle(left, iv)))


def test_disjoint_contract_enforced():
    left, iv = _mk(seed=5)  # overlapping intervals
    with pytest.raises((ValueError, Exception)):
        range_join(
            rd.from_pandas(left), rd.from_pandas(iv),
            entity_col="conv_id", ts_col="ts",
            interval_value_cols=["iv_id", "w"],
            assume_disjoint=True, broadcast=True,
        ).materialize()


def test_entity_only_on_one_side():
    """Partitions holding only left rows (or only intervals) stay green and
    typed under the declared schema."""
    left, iv = _mk(seed=13, n_entities=6)
    iv = iv[iv.conv_id < 2].reset_index(drop=True)          # left-only parts
    left2 = left[left.conv_id >= 2].reset_index(drop=True)  # interval-only parts
    got = range_join(
        rd.from_pandas(left2), rd.from_pandas(iv),
        entity_col="conv_id", ts_col="ts",
        interval_value_cols=["iv_id", "w"], how="left",
        num_partitions=16, left_schema=pa.Schema.from_pandas(left2),
    )
    pdf = got.to_pandas()
    want = _oracle(left2, iv, how="left")
    pd.testing.assert_frame_equal(_canon(pdf), _canon(want))
    assert set(pdf.columns) == {"row_id", "conv_id", "ts", "x", "iv_id", "w"}
