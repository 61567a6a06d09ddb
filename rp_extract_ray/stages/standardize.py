"""Global standardization (z-score) — reference M24
(/root/reference/rp_classify.py:28-37, sklearn StandardScaler semantics:
population std, zero-variance columns -> std=1).

Two-pass distributed design (SURVEY.md §2.3 M24): pass 1 is a tiny global
``aggregate`` (mean + population std per column); pass 2 broadcasts the
scaler into a vectorized ``map_batches``. No full materialization."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Mean, Std

from rp_extract_ray.functions.stats import standardize_params


def fit_scaler(ds: Dataset, cols: Sequence[str]) -> dict[str, tuple[float, float]]:
    """{col: (mean, std)} via one small aggregate over the Dataset."""
    aggs = []
    for c in cols:
        aggs += [Mean(c, alias_name=f"m_{c}"), Std(c, ddof=0, alias_name=f"s_{c}")]
    aggs.append(Count(alias_name="n"))
    row = ds.aggregate(*aggs)
    out = {}
    for c in cols:
        mean, std = standardize_params(
            np.array([row[f"m_{c}"]]), np.array([row[f"s_{c}"]]) ** 2
        )
        out[c] = (float(mean[0]), float(std[0]))
    return out


def standardize(
    ds: Dataset, cols: Sequence[str], suffix: str = "_z", round_to: int | None = None
) -> Dataset:
    """Append ``<col>_z`` columns; scaler fit once, applied per Arrow batch."""
    scaler = fit_scaler(ds, cols)

    def apply(batch: pa.Table) -> pa.Table:
        for c in cols:
            m, s = scaler[c]
            v = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            z = (v - m) / s
            if round_to is not None:
                from rp_extract_ray.functions.rounding import round_half_away

                z = round_half_away(z, round_to)
            batch = batch.append_column(f"{c}{suffix}", pa.array(z))
        return batch

    return ds.map_batches(apply, batch_format="pyarrow")


def standardize_grouped(
    ds: Dataset,
    cols: Sequence[str],
    group_col: str,
    *,
    suffix: str = "_gz",
    round_to: int | None = None,
    broadcast_limit: int = 1_000_000,
) -> Dataset:
    """Per-group z-score (population std, zero-variance groups -> std=1 —
    the M24 semantics keyed by ``group_col``).

    Pass 1 pre-aggregates (sum, sum-of-squares, count) per group INSIDE each
    batch, so the ``groupby`` exchange carries one moment row per
    (group, block) — never the data. Pass 2 applies the stats as a
    broadcast lookup when the group count is small, else as a
    hash-partitioned join (the tfidf df-table rule)."""
    import pandas as pd

    from ray.data.aggregate import Sum

    from rp_extract_ray.stages.partition import arrow_out as _arrow_out

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        tmp = pdf[[group_col, *cols]].copy()
        for c in cols:
            tmp[f"_q_{c}"] = tmp[c].to_numpy(dtype=np.float64) ** 2
        g = tmp.groupby(group_col, sort=False)
        out = {}
        for c in cols:
            out[f"_s_{c}"] = g[c].sum()
            out[f"_q_{c}"] = g[f"_q_{c}"].sum()
            out[f"_n_{c}"] = g[c].count()
        return pd.DataFrame(out).reset_index()

    moment_cols = [
        f"{p}_{c}" for c in cols for p in ("_s", "_q", "_n")
    ]
    stats = (
        ds.map_batches(
            lambda b: _arrow_out(partial(b.to_pandas())),
            batch_format="pyarrow",
        )
        .groupby(group_col)
        .aggregate(*[Sum(c, alias_name=c) for c in moment_cols])
        .materialize()
    )

    def finish(b: pa.Table) -> pa.Table:
        out = {group_col: b.column(group_col)}
        for c in cols:
            s = b.column(f"_s_{c}").to_numpy(zero_copy_only=False).astype(np.float64)
            q = b.column(f"_q_{c}").to_numpy(zero_copy_only=False).astype(np.float64)
            n = np.maximum(
                b.column(f"_n_{c}").to_numpy(zero_copy_only=False).astype(np.float64),
                1.0,
            )
            mean = s / n
            var = np.maximum(q / n - mean * mean, 0.0)
            mean, std = standardize_params(mean, var)
            out[f"_m_{c}"] = pa.array(mean)
            out[f"_sd_{c}"] = pa.array(std)
        return pa.table(out)

    stats = stats.map_batches(finish, batch_format="pyarrow")

    def apply(b: pa.Table) -> pa.Table:
        for c in cols:
            v = b.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            z = (v - b.column(f"_m_{c}").to_numpy(zero_copy_only=False)) / b.column(
                f"_sd_{c}"
            ).to_numpy(zero_copy_only=False)
            if round_to is not None:
                from rp_extract_ray.functions.rounding import round_half_away

                z = round_half_away(z, round_to)
            b = b.append_column(f"{c}{suffix}", pa.array(z))
        return b.drop_columns(
            [f"_m_{c}" for c in cols] + [f"_sd_{c}" for c in cols]
        )

    from rp_extract_ray.stages.join import broadcast_join, hash_join

    if int(stats.count()) <= broadcast_limit:
        joined = broadcast_join(ds, stats, on=group_col)
    else:
        joined = hash_join(ds, stats, on=group_col)
    return joined.map_batches(apply, batch_format="pyarrow")


def minmax_scale(
    ds: Dataset,
    cols: Sequence[str],
    *,
    suffix: str = "_mm",
    round_to: int | None = None,
) -> Dataset:
    """Append ``<col>_mm`` = (v - min) / (max - min) per column — the
    [0, 1] rescaling counterpart of :func:`standardize` (sklearn
    MinMaxScaler semantics; a zero-range column maps to 0.0 so constant
    features stay well-defined). Same two-pass shape: one tiny global
    Min/Max aggregate, then a broadcast vectorized ``map_batches``."""
    from ray.data.aggregate import Max, Min

    aggs = []
    for c in cols:
        aggs += [Min(c, alias_name=f"mn_{c}"), Max(c, alias_name=f"mx_{c}")]
    row = ds.aggregate(*aggs)
    bounds = {c: (float(row[f"mn_{c}"]), float(row[f"mx_{c}"])) for c in cols}

    def apply(batch: pa.Table) -> pa.Table:
        for c in cols:
            mn, mx = bounds[c]
            rng = mx - mn
            v = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            z = (v - mn) / rng if rng > 0 else np.zeros(len(v))
            if round_to is not None:
                from rp_extract_ray.functions.rounding import round_half_away

                z = round_half_away(z, round_to)
            batch = batch.append_column(f"{c}{suffix}", pa.array(z))
        return batch

    return ds.map_batches(apply, batch_format="pyarrow")


def minmax_scale_grouped(
    ds: Dataset,
    cols: Sequence[str],
    group_col: str,
    *,
    suffix: str = "_gmm",
    round_to: int | None = None,
    broadcast_limit: int = 1_000_000,
) -> Dataset:
    """Per-group min-max rescaling (zero-range groups -> 0.0). Pass 1
    pre-aggregates (min, max) per group INSIDE each batch so the groupby
    exchange carries one bounds row per (group, block); pass 2 applies the
    bounds as a broadcast lookup when the group count is small, else a
    hash-partitioned join — the same scale shape as
    :func:`standardize_grouped`."""
    import pandas as pd

    from ray.data.aggregate import Max, Min

    from rp_extract_ray.stages.partition import arrow_out as _arrow_out

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf[[group_col, *cols]].groupby(group_col, sort=False)
        out = {}
        for c in cols:
            out[f"_mn_{c}"] = g[c].min()
            out[f"_mx_{c}"] = g[c].max()
        return pd.DataFrame(out).reset_index()

    aggs = []
    for c in cols:
        aggs += [
            Min(f"_mn_{c}", alias_name=f"_mn_{c}"),
            Max(f"_mx_{c}", alias_name=f"_mx_{c}"),
        ]
    stats = (
        ds.map_batches(
            lambda b: _arrow_out(partial(b.to_pandas())),
            batch_format="pyarrow",
        )
        .groupby(group_col)
        .aggregate(*aggs)
        .materialize()
    )

    def apply(b: pa.Table) -> pa.Table:
        for c in cols:
            v = b.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            mn = b.column(f"_mn_{c}").to_numpy(zero_copy_only=False).astype(np.float64)
            mx = b.column(f"_mx_{c}").to_numpy(zero_copy_only=False).astype(np.float64)
            rng = mx - mn
            z = np.where(rng > 0, (v - mn) / np.where(rng > 0, rng, 1.0), 0.0)
            if round_to is not None:
                from rp_extract_ray.functions.rounding import round_half_away

                z = round_half_away(z, round_to)
            b = b.append_column(f"{c}{suffix}", pa.array(z))
        return b.drop_columns(
            [f"_mn_{c}" for c in cols] + [f"_mx_{c}" for c in cols]
        )

    from rp_extract_ray.stages.join import broadcast_join, hash_join

    if int(stats.count()) <= broadcast_limit:
        joined = broadcast_join(ds, stats, on=group_col)
    else:
        joined = hash_join(ds, stats, on=group_col)
    return joined.map_batches(apply, batch_format="pyarrow")


def quantile_normalize(
    ds: Dataset,
    *,
    group_col: str,
    value_col: str,
    id_col: str,
    out_col: str = "qnorm",
    round_to: int = 6,
    num_partitions: int = 32,
) -> Dataset:
    """Quantile normalization: force every group's value distribution onto
    the common reference distribution (mean across groups of the k-th
    smallest values) — the classic batch-effect correction / distribution
    alignment op (microarray-era QN, here for per-source score calibration).
    Ranks are row_number under the deterministic ``(value, id_col)`` order,
    so ties break stably and the result is layout-invariant; groups of
    unequal size average whichever groups reach that rank (the unequal-n QN
    convention, exactly replicable in SQL).

    Scale shape, three bounded stages: (1) ranks via ONE group-keyed
    ``partitioned_apply`` (rank = position within the sorted run — no extra
    sort beyond the exchange's); (2) the reference via ONE rank-keyed
    ``grouped_reduce`` of (sum, count) partials — at most one row per rank
    per block crosses; (3) values rejoin the reference on the int64 rank
    through the task-shuffle ``repartition_join``. The reference table has
    max-group-size rows — NOT broadcast by default (unbounded at corpus
    scale); pass-through of the distributed join keeps every side
    partitioned.
    """
    import pandas as pd

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join
    from rp_extract_ray.stages.partition import partitioned_apply

    def rank_fn(pdf: "pd.DataFrame", starts: np.ndarray) -> "pd.DataFrame":
        rk = np.arange(len(pdf), dtype=np.int64) - starts + 1
        pdf = pdf.copy()
        pdf["_rk"] = rk
        return pdf

    # two consumers (reference build + join probe): materialize the ranked
    # rows once — the exchange output, already pruned to caller's columns
    ranked = partitioned_apply(
        ds, rank_fn, entity_col=group_col,
        order_cols=(value_col, id_col), num_partitions=num_partitions,
    ).materialize()

    ref = grouped_reduce(
        ranked.select_columns(["_rk", value_col]),
        "_rk",
        {"_s": (value_col, "sum"), "_n": (value_col, "count")},
    )

    def ratio(t: pa.Table) -> pa.Table:
        s = t.column("_s").to_numpy(zero_copy_only=False)
        n = t.column("_n").to_numpy(zero_copy_only=False)
        from rp_extract_ray.functions.rounding import round_half_away

        return pa.table(
            {
                "_rk": t.column("_rk"),
                out_col: pa.array(round_half_away(s / n, round_to)),
            }
        )

    ref = ref.map_batches(ratio, batch_format="pyarrow")
    out = repartition_join(
        ranked, ref, on="_rk", how="inner",
        num_partitions=num_partitions, right_cols=["_rk", out_col],
    )
    return out.drop_columns(["_rk"])
