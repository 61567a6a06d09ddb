"""Pivot (conditional wide aggregation): one row per entity with one count
column — and optionally one value-sum column — per category of a pivot
column. The categorical-feature-engineering staple (per-user event-type
histograms, per-doc source mixes).

Scale design: the categories are fixed and small (discovered by a tiny
distinct aggregate when not given), so the wide columns are built INSIDE
``map_batches`` and pre-aggregated per batch before ONE ``groupby(key)``
sum — the exchange carries one combined row per (entity, block), never the
raw events (the brief's map-side-combine prescription; same shape as
``_partial_groupby``, pipelines/relational.py). No per-category pass, no
per-row Python.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset


def pivot_counts(
    ds: Dataset,
    key_col: str,
    pivot_col: str,
    *,
    values: Sequence[str] | None = None,
    value_col: str | None = None,
    prefix: str = "n_",
    sum_prefix: str = "sum_",
) -> Dataset:
    """One row per ``key_col``: ``{prefix}{v}`` = count of rows with
    ``pivot_col == v`` and, when ``value_col`` is given, ``{sum_prefix}{v}``
    = sum of ``value_col`` over those rows (NaN treated as 0, like SQL SUM
    of CASE with ELSE 0). Rows whose pivot value is outside ``values`` are
    ignored. ``values=None`` discovers the categories with a distinct
    aggregate (one tiny extra job — pass them explicitly in pipelines)."""
    if values is None:
        vals = (
            ds.select_columns([pivot_col])
            .map_batches(
                lambda b: b.group_by(pivot_col).aggregate([]),
                batch_format="pyarrow",
            )
            .unique(pivot_col)
        )
        values = sorted(v for v in vals if v is not None)
    values = list(values)

    cnt_cols = [f"{prefix}{v}" for v in values]
    sum_cols = [f"{sum_prefix}{v}" for v in values] if value_col else []

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        piv = pdf[pivot_col].to_numpy()
        out = {}
        for v, c in zip(values, cnt_cols):
            out[c] = (piv == v).astype(np.int64)
        if value_col:
            val = np.nan_to_num(
                pdf[value_col].to_numpy(dtype=np.float64), nan=0.0
            )
            for v, c in zip(values, sum_cols):
                out[c] = np.where(piv == v, val, 0.0)
        wide = pd.DataFrame(out)
        wide[key_col] = pdf[key_col].to_numpy()
        return wide.groupby(key_col, sort=False).sum().reset_index()

    from rp_extract_ray.stages.groupops import grouped_reduce

    from rp_extract_ray.stages.partition import arrow_out

    parts = ds.map_batches(
        lambda b: arrow_out(partial(b.to_pandas())), batch_format="pyarrow"
    )
    how = {c: (c, "sum") for c in (*cnt_cols, *sum_cols)}
    return grouped_reduce(parts, key_col, how, combine_first=False)


def unpivot(
    ds: Dataset,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
) -> Dataset:
    """Wide → long melt: one output row per (input row, value column),
    ``var_name`` holding the source column's name and ``value_name`` its
    value cast to float64 (SQL UNPIVOT / pandas melt semantics, nulls
    preserved).

    The inverse of :func:`pivot_counts` and the other half of the everyday
    reshape pair (long feature tables for per-feature grouped stats out of
    wide descriptor rows). Scale shape: a PURE per-block Arrow kernel — one
    table slice + concat per value column, no shuffle, no driver state; a
    block fans out to exactly ``len(value_cols)`` times its rows, so block
    size is the only memory knob. Output rows interleave per block (all of
    column A's rows, then B's, per block) — order-insensitive consumers
    (groupbys, the driver's sorted value-hash) see UNPIVOT exactly.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    ids = list(id_cols)
    vals = list(value_cols)

    def melt(b: pa.Table) -> pa.Table:
        parts = []
        base = b.select(ids)
        for c in vals:
            t = base.append_column(
                var_name, pa.array([c] * len(b), type=pa.string())
            )
            t = t.append_column(
                value_name, pc.cast(b.column(c), pa.float64())
            )
            parts.append(t)
        if not parts:
            return pa.table({})
        return pa.concat_tables(parts)

    return ds.select_columns(ids + vals).map_batches(
        melt, batch_format="pyarrow"
    )
