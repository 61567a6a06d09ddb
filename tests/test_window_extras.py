"""EWMA / cumulative / rank primitives vs naive per-row oracles."""

import numpy as np
import pandas as pd

import ray.data as rd

from rp_extract_ray.stages.lag import (
    add_cumulative_features,
    add_ewma_features,
    cumulative_within,
    ewma_within,
    rank_within,
)
from rp_extract_ray.stages.partition import SaltSpec


def _frame(n=500, ents=7, seed=3, with_nan=False):
    rng = np.random.default_rng(seed)
    pdf = pd.DataFrame(
        {
            "conv_id": np.sort(rng.integers(0, ents, n)),
            "v": rng.normal(size=n).round(3),
        }
    )
    if with_nan:
        pdf.loc[rng.choice(n, n // 10, replace=False), "v"] = np.nan
    starts = np.zeros(n, dtype=np.int64)
    cid = pdf["conv_id"].to_numpy()
    for i in range(1, n):
        starts[i] = i if cid[i] != cid[i - 1] else starts[i - 1]
    return pdf, starts


def _naive_ewma(v, starts, alpha, window):
    out = np.full(len(v), np.nan)
    for i in range(len(v)):
        num = den = 0.0
        for j in range(window):
            t = i - j
            if t < starts[i]:
                break
            if not np.isnan(v[t]):
                w = (1 - alpha) ** j
                num += w * v[t]
                den += w
        if den > 0:
            out[i] = num / den
    return out


def test_ewma_matches_naive():
    for with_nan in (False, True):
        pdf, starts = _frame(with_nan=with_nan)
        got = ewma_within(pdf["v"].to_numpy(), starts, 0.3, 8)
        want = _naive_ewma(pdf["v"].to_numpy(), starts, 0.3, 8)
        np.testing.assert_allclose(got, want, equal_nan=True, atol=1e-12)


def test_ewma_large_window_tracks_pandas_ewm():
    """With the window far past the mass horizon, bounded EWMA converges to
    pandas' unbounded ewm(adjust=True)."""
    pdf, starts = _frame(n=300, ents=3, seed=9)
    got = ewma_within(pdf["v"].to_numpy(), starts, 0.5, 64)
    want = (
        pdf.groupby("conv_id", sort=False)["v"]
        .transform(lambda s: s.ewm(alpha=0.5, adjust=True).mean())
        .to_numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_cumulative_matches_expanding():
    pdf, starts = _frame(with_nan=True)
    got = cumulative_within(pdf, starts, "v")
    g = pdf.groupby("conv_id", sort=False)["v"]
    np.testing.assert_allclose(got["v_csum"], g.transform(lambda s: s.fillna(0).cumsum()))
    np.testing.assert_allclose(got["v_ccount"], g.transform(lambda s: s.notna().cumsum()))
    np.testing.assert_allclose(got["v_cmin"], g.cummin(), equal_nan=True)
    np.testing.assert_allclose(got["v_cmax"], g.cummax(), equal_nan=True)


def test_rank_matches_pandas():
    pdf, starts = _frame()
    got = rank_within(pdf, starts, "v")
    g = pdf.groupby("conv_id", sort=False)["v"]
    want_rank = g.rank(method="min").to_numpy()
    n = g.transform("size").to_numpy(dtype=float)
    np.testing.assert_allclose(got["v_rank"], want_rank)
    np.testing.assert_allclose(
        got["v_prank"], np.where(n > 1, (want_rank - 1) / np.maximum(n - 1, 1), 0.0)
    )


def test_ewma_salted_equals_unsalted():
    rng = np.random.default_rng(4)
    n = 2000
    conv = ["whale"] * (n // 2) + [f"c{i % 5}" for i in range(n // 2)]
    pdf = pd.DataFrame(
        {
            "conv_id": conv,
            "ts": pd.Timestamp("2026-01-01")
            + pd.to_timedelta(np.arange(n), unit="s"),
            "v": rng.normal(size=n).round(3),
        }
    )
    # proper per-entity consecutive turn index (the salting contract)
    pdf["turn_idx"] = pdf.groupby("conv_id", sort=False).cumcount().astype(np.int64)
    kw = dict(alpha=0.3, window=8, entity_col="conv_id",
              order_cols=("ts", "turn_idx"), num_partitions=8)
    plain = add_ewma_features(rd.from_pandas(pdf), ["v"], **kw).to_pandas()
    salted = add_ewma_features(
        rd.from_pandas(pdf), ["v"],
        salt=SaltSpec(chunk_turns=128, overlap=16), **kw,
    ).to_pandas()
    key = ["conv_id", "turn_idx"]
    a = plain.sort_values(key).reset_index(drop=True)
    b = salted.sort_values(key).reset_index(drop=True)
    np.testing.assert_allclose(a["v_ewma"], b["v_ewma"], atol=1e-12)


def test_cumulative_dataset_path():
    pdf, _ = _frame(n=400, ents=5)
    pdf["ts"] = pd.Timestamp("2026-01-01") + pd.to_timedelta(
        np.arange(len(pdf)), unit="s"
    )
    pdf["turn_idx"] = np.arange(len(pdf), dtype=np.int64)
    out = add_cumulative_features(
        rd.from_pandas(pdf), ["v"], entity_col="conv_id",
        order_cols=("ts", "turn_idx"), num_partitions=4,
    ).to_pandas().sort_values("turn_idx").reset_index(drop=True)
    want = pdf.groupby("conv_id", sort=False)["v"].cumsum().to_numpy()
    np.testing.assert_allclose(out["v_csum"], want)


def test_merge_intervals_islands():
    """Overlap, touching, and inverted (end<start -> point) intervals merge
    correctly and identically at any partitioning."""
    import pandas as pd
    import ray.data as rd

    from rp_extract_ray.stages.intervals import merge_intervals

    df = pd.DataFrame(
        {
            "e": ["a"] * 5 + ["b"] * 2,
            "s": [0.0, 5.0, 10.0, 30.0, 29.0, 1.0, 100.0],
            "t": [6.0, 8.0, 4.0, 40.0, 31.0, 2.0, 50.0],  # last: inverted
        }
    )
    want = [
        ("a", 0.0, 8.0, 2),    # [0,6] overlaps [5,8]
        ("a", 10.0, 10.0, 1),  # inverted [10,4] clamps to a point
        ("a", 29.0, 40.0, 2),  # [29,31] overlaps [30,40]
        ("b", 1.0, 2.0, 1),
        ("b", 100.0, 100.0, 1),
    ]
    for parts in (1, 4):
        got = (
            merge_intervals(
                rd.from_pandas(df).repartition(parts),
                entity_col="e", start_col="s", end_col="t", num_partitions=4,
            )
            .to_pandas()
            .sort_values(["e", "s"], ignore_index=True)
        )
        assert list(got.itertuples(index=False, name=None)) == want

    # touching intervals merge (closed-interval convention)
    touch = pd.DataFrame({"e": ["x", "x"], "s": [0.0, 5.0], "t": [5.0, 9.0]})
    got = merge_intervals(
        rd.from_pandas(touch), entity_col="e", start_col="s", end_col="t"
    ).to_pandas()
    assert list(got.itertuples(index=False, name=None)) == [("x", 0.0, 9.0, 2)]


def test_cohort_retention_matches_pandas():
    """Distinct-entity weekly retention equals a single-process pandas
    reference, across partitionings."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rp_extract_ray.stages.session import cohort_retention

    rng = np.random.default_rng(9)
    n = 4000
    df = pd.DataFrame(
        {
            "u": rng.integers(0, 300, n).astype(np.int64),
            "ts": pd.Timestamp("2025-01-01")
            + pd.to_timedelta(rng.uniform(0, 60 * 86400, n), unit="s"),
        }
    )
    wk = df["ts"].dt.normalize() - pd.to_timedelta(df["ts"].dt.weekday, unit="D")
    first = df.assign(wk=wk).groupby("u")["wk"].transform("min")
    pairs = (
        pd.DataFrame(
            {
                "cohort": first,
                "week_offset": ((wk - first).dt.days // 7).astype(np.int64),
                "u": df["u"],
            }
        )
        .drop_duplicates(["u", "week_offset"])
        .groupby(["cohort", "week_offset"])
        .size()
        .reset_index(name="n_users")
    )
    want = pairs.sort_values(["cohort", "week_offset"], ignore_index=True)
    for parts in (1, 6):
        got = (
            cohort_retention(
                rd.from_pandas(df).repartition(parts),
                entity_col="u", ts_col="ts", num_partitions=8,
            )
            .to_pandas()
            .sort_values(["cohort", "week_offset"], ignore_index=True)
        )
        assert got["n_users"].astype(int).tolist() == want["n_users"].tolist()
        assert got["week_offset"].astype(int).tolist() == want["week_offset"].tolist()


def test_edge_values_and_cume_dist_match_pandas():
    from rp_extract_ray.stages.lag import cume_dist_within, edge_values_within

    pdf, starts = _frame(n=400, ents=9, seed=11)
    got = edge_values_within(pdf, starts, "v")
    g = pdf.groupby("conv_id", sort=False)["v"]
    np.testing.assert_allclose(got["v_first"], g.transform("first"))
    np.testing.assert_allclose(got["v_last"], g.transform("last"))
    cd = cume_dist_within(pdf, starts, "v")
    want = g.rank(method="max").to_numpy() / g.transform("size").to_numpy()
    np.testing.assert_allclose(cd["v_cumedist"], want)


def test_cume_dist_nulls_last():
    from rp_extract_ray.stages.lag import cume_dist_within

    pdf = pd.DataFrame(
        {"conv_id": [0, 0, 0, 0], "v": [2.0, np.nan, 1.0, np.nan]}
    )
    starts = np.zeros(4, dtype=np.int64)
    got = cume_dist_within(pdf, starts, "v")["v_cumedist"]
    # SQL ORDER BY v NULLS LAST: 1.0 -> 0.25, 2.0 -> 0.5, nulls -> 1.0
    np.testing.assert_allclose(got, [0.5, 1.0, 0.25, 1.0])


def test_rolling_corr_matches_pandas():
    from rp_extract_ray.stages.lag import rolling_corr_within

    pdf, starts = _frame(n=300, ents=5, seed=13)
    rng = np.random.default_rng(4)
    # large-offset second column: the regression case (epoch-like scale)
    pdf["y"] = 8.8e8 + np.cumsum(rng.uniform(1, 60, len(pdf)))
    k = 7
    got = rolling_corr_within(
        pdf["v"].to_numpy(), pdf["y"].to_numpy(), starts, k
    )
    want = (
        pdf.groupby("conv_id", sort=False)
        .apply(
            lambda g: g["v"].rolling(k, min_periods=2).corr(g["y"]),
            include_groups=False,
        )
        .to_numpy()
    )
    # pandas emits +-inf/NaN for zero-variance windows; ours uses NaN.
    # atol 1e-6: pandas' streaming variance loses ~1e-8 on the large-offset
    # column (its 2-point corr reads 0.99999999, ours exactly 1.0 after the
    # per-run rebase; DuckDB's windowed corr agrees with ours at 6 dp)
    want[~np.isfinite(want)] = np.nan
    np.testing.assert_allclose(got, want, atol=1e-6, equal_nan=True)
