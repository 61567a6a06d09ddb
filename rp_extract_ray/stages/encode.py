"""Leakage-free (past-only) target encoding.

The classic supervised-learning feature: replace a categorical column with
the mean of the target over PAST rows of the same category — "past" under a
global (ts, tiebreak) order, the strictly-exclusive ROWS frame, so the
encoding at any row provably never reads that row's own target or any
future row (the same zero-temporal-leakage contract as the as-of join /
flagship backfill, enforced structurally rather than by masking). First
occurrence of a category → NULL (no prior evidence). No reference
counterpart (SURVEY.md §2 maps no supervised encodings); this extends the
engine's feature-engineering surface the way sessionize/lag/asof do.

Scale design — a global ordered prefix per category in the pack_sequences
shape (stages/pack.py), generalized from one running total to one per
category:

1. range-partition by epoch-us timestamp (``range_partition_bounds``:
   deterministic sampled bounds → globally ordered time slices; equal
   timestamps always co-locate, so the (ts, tiebreak) order never straddles
   a boundary);
2. per-(partition, category) target totals via ONE ``grouped_reduce`` over
   pruned (part, category, cents) rows — order-free sums, no sort;
   ``P × |categories|`` rows reach the driver (categories are the bounded
   side of target encoding by construction) and exclusive-prefix per
   category into per-partition offsets, broadcast once with ``ray.put``;
3. ONE keyed exchange co-locates each time slice; inside, a vectorized
   sort + per-category exclusive cumulative sum/count + the offset.

Exactness: targets accumulate as ``round(value * scale)`` int64 fixed-point
(``scale=100`` = cent resolution), so partial sums are EXACT and the result
is bit-identical at any partition count / block layout — the
distributed-regrouping float-association hazard is designed out rather
than rounded over. The final mean divides once, mirroring SQL
``avg(cents) / scale``.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from rp_extract_ray.stages.partition import (
    RANGE_PART_COL,
    add_range_part,
    range_partition_bounds,
    strip_meta,
)

_OTS = "_ots_us"


def target_encode_past(
    ds: Dataset,
    *,
    category_col: str,
    target_col: str,
    ts_col: str = "ts",
    order_cols: Sequence[str] = (),
    scale: int = 100,
    out_col: str = "te",
    num_partitions: int = 32,
    sample_rate: float = 0.2,
    seed: int = 1,
) -> Dataset:
    """Append ``out_col`` = mean of ``target_col`` over strictly-earlier
    rows (global ``(ts_col, *order_cols)`` order) of the same category;
    NULL where no earlier row exists. ``target_col`` must be fixed-point
    representable at ``1/scale`` resolution (asserted per block)."""

    def add_ots(t: pa.Table) -> pa.Table:
        return t.append_column(
            _OTS, t.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        )

    keyed = ds.map_batches(add_ots, batch_format="pyarrow").materialize()
    # three consumers (bounds sample, totals, final pass) — pack.py rule
    bounds = range_partition_bounds(
        keyed, _OTS, num_partitions, sample_rate=sample_rate, seed=seed
    )
    parted = add_range_part(keyed, _OTS, bounds)

    def _check_fixed_point(v: np.ndarray) -> None:
        # nulls arrive as NaN and are SKIPPED (SQL avg semantics) — they
        # are not a resolution violation; check only real values
        real = v[~np.isnan(v)]
        c = np.round(real * scale)
        if not np.allclose(c / scale, real, rtol=0, atol=1e-9):
            raise ValueError(
                f"{target_col} is not fixed-point at 1/{scale} resolution"
            )

    def slim(t: pa.Table) -> pa.Table:
        v = t.column(target_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        _check_fixed_point(v)
        nn = ~np.isnan(v)
        # null-target rows contribute neither sum nor count — drop them
        # from the totals pass entirely (the SQL window's avg() skip)
        return pa.table(
            {
                RANGE_PART_COL: t.column(RANGE_PART_COL).filter(pa.array(nn)),
                category_col: t.column(category_col).filter(pa.array(nn)),
                "_cents": pa.array(np.round(v[nn] * scale).astype(np.int64)),
            }
        )

    from rp_extract_ray.stages.groupops import grouped_reduce

    totals = grouped_reduce(
        parted.map_batches(slim, batch_format="pyarrow"),
        [RANGE_PART_COL, category_col],
        {"s": ("_cents", "sum"), "n": ("_cents", "count")},
    ).to_pandas()  # P x |categories| rows — the bounded driver merge

    # exclusive prefix per category over globally-ordered partitions
    totals = totals.sort_values([category_col, RANGE_PART_COL])
    off_sum: dict[tuple, int] = {}
    off_cnt: dict[tuple, int] = {}
    run: dict = {}
    for p, cat, s, n in zip(
        totals[RANGE_PART_COL], totals[category_col], totals["s"], totals["n"]
    ):
        s0, n0 = run.get(cat, (0, 0))
        off_sum[(int(p), cat)] = s0
        off_cnt[(int(p), cat)] = n0
        run[cat] = (s0 + int(s), n0 + int(n))
    off_ref = ray.put((off_sum, off_cnt))

    sort_cols = [_OTS, *order_cols]

    def encode(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group.drop_columns([RANGE_PART_COL, _OTS]).append_column(
                out_col, pa.array([], pa.float64())
            )
        part = int(group.column(RANGE_PART_COL)[0].as_py())
        pdf = group.to_pandas().sort_values(
            sort_cols, kind="mergesort", ignore_index=True
        )
        v = pdf[target_col].to_numpy(dtype=np.float64)
        nn = ~np.isnan(v)
        cents = np.where(nn, np.round(v * scale), 0.0).astype(np.int64)
        # null-target rows add nothing to the running (sum, count) but
        # still RECEIVE an encoding from the prior evidence (SQL window)
        work = pd.DataFrame(
            {
                "c": cents,
                "nn": nn.astype(np.int64),
                "cat": pdf[category_col].to_numpy(),
            }
        )
        g = work.groupby("cat", sort=False)
        excl_sum = g["c"].cumsum().to_numpy() - cents
        excl_cnt = g["nn"].cumsum().to_numpy() - nn.astype(np.int64)
        osum, ocnt = ray.get(off_ref)
        cats = pdf[category_col].to_numpy()
        # offsets looked up per UNIQUE category (bounded), broadcast by
        # inverse index — no per-row Python work
        uniq, inv = np.unique(cats, return_inverse=True)
        base_s = np.array(
            [osum.get((part, c), 0) for c in uniq], dtype=np.int64
        )[inv]
        base_n = np.array(
            [ocnt.get((part, c), 0) for c in uniq], dtype=np.int64
        )[inv]
        tot_s = excl_sum + base_s
        tot_n = excl_cnt + base_n
        te = np.where(
            tot_n > 0,
            (tot_s.astype(np.float64) / np.maximum(tot_n, 1)) / scale,
            np.nan,
        )
        pdf[out_col] = te
        pdf = pdf.drop(columns=[RANGE_PART_COL, _OTS])
        return strip_meta(
            pa.Table.from_pandas(pdf, preserve_index=False)
        )

    return parted.groupby(RANGE_PART_COL).map_groups(
        encode, batch_format="pyarrow"
    )
