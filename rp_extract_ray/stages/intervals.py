"""Per-entity interval overlap-merge (gaps-and-islands).

The interval dual of sessionization (stages/session.py): instead of gapping
POINT events, coalesce a set of [start, end] INTERVALS per entity into
maximal overlapping unions — the standard shape for merging detector spans,
speech/tool-activity segments, or validity windows before a range join.
Absent from the reference (its segmentation is fixed-stride windows,
rp_extract.py:453-466) and from Ray Data's operator surface.

Scale design: ONE entity-hash exchange (``partitioned_apply`` — the same
partitioner every temporal stage reuses), then a fully vectorized
gaps-and-islands kernel per partition: segmented running-max of ``end``
(C-level pandas groupby cummax over run ids), island breaks where
``start > prev_max``, and one groupby-min/max/count over island ids. No
per-row Python; output volume = number of merged islands <= input rows.

Touching intervals merge (``start == prev_end`` joins — the closed-interval
convention, matching the SQL ``start_ts > prev_max`` break test).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset

from rp_extract_ray.schema import DEFAULT_NUM_PARTITIONS
from rp_extract_ray.stages.partition import partitioned_apply


def merge_intervals(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    count_alias: str = "n_merged",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """Coalesce overlapping/touching ``[start_col, end_col]`` intervals per
    entity. Output: one row per island with columns
    ``(entity_col, start_col=min start, end_col=max end, count_alias)``.
    Intervals whose ``end < start`` are treated as points at ``start``
    (end clamped up), keeping the running-max monotone argument valid."""

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {
                    entity_col: pdf[entity_col],
                    start_col: pdf[start_col],
                    end_col: pdf[end_col],
                    count_alias: pd.Series([], dtype=np.int64),
                }
            )
        s = pdf[start_col].to_numpy()
        e = np.maximum(pdf[end_col].to_numpy(), s)
        is_run_start = np.zeros(n, dtype=bool)
        is_run_start[starts] = True
        run_id = np.cumsum(is_run_start)
        # segmented running max of end, then shift within run -> prev_max
        cm = pd.Series(e).groupby(run_id, sort=False).cummax().to_numpy()
        prev_max = np.empty(n, dtype=e.dtype)
        prev_max[1:] = cm[:-1]
        brk = is_run_start | (s > prev_max)
        island = np.cumsum(brk) - 1
        out = pd.DataFrame(
            {entity_col: pdf[entity_col].to_numpy(), "_s": s, "_e": e,
             "_i": island}
        )
        g = out.groupby("_i", sort=False).agg(
            **{
                entity_col: (entity_col, "first"),
                start_col: ("_s", "first"),   # sorted: first == min
                end_col: ("_e", "max"),
                count_alias: ("_e", "size"),
            }
        ).reset_index(drop=True)
        g[count_alias] = g[count_alias].astype(np.int64)
        return g

    return partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=(start_col, end_col),
        num_partitions=num_partitions,
    )


def interval_concurrency(
    points: Dataset,
    intervals: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    out_col: str = "n_open",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """Sweep-line stabbing count: for every point row, how many same-entity
    intervals ``[start, end]`` (closed) contain its timestamp — concurrency
    / server-load / open-sessions-at-event. The scale-superior alternative
    to counting via an interval join (whose intermediate is
    |points| x |matching intervals|): the sweep never materializes matches.

    ONE co-partitioned exchange (side-tagged union, the range_join shape);
    per partition a single lexsort over the merged boundary stream —
    interval starts (+1), point queries (0), interval ends (-1), with
    same-timestamp priority start < query < end so closed bounds hold on
    both edges — then a cumulative sum read off at the query positions.
    O((n+2m) log) per partition, output exactly the point rows + count.
    """
    import pyarrow as pa

    from rp_extract_ray.stages.asof import SIDE_COL, _arrow_schema
    from rp_extract_ray.stages.partition import PART_COL, _add_part

    p_schema = _arrow_schema(points)
    out_schema = pa.schema(
        [p_schema.field(n) for n in p_schema.names]
        + [pa.field(out_col, pa.int64())]
    )
    p_cols = list(p_schema.names)

    def tag_p(t: pa.Table) -> pa.Table:
        t = _add_part(t, entity_col, num_partitions, None)
        return t.append_column(SIDE_COL, pa.array(np.ones(len(t), np.int8)))

    def tag_iv(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # SQL comparison semantics: a null bound can never satisfy
        # s <= t <= e, so null-bounded intervals count for nothing — drop
        # them HERE (a NaN bound would otherwise sort to the stream's end
        # and corrupt the running count: open-forever / negative counts)
        keep = pc.and_(
            pc.is_valid(t.column(start_col)), pc.is_valid(t.column(end_col))
        )
        t = pa.table(
            {
                entity_col: t.column(entity_col),
                start_col: t.column(start_col),
                end_col: t.column(end_col),
            }
        ).filter(keep)
        t = _add_part(t, entity_col, num_partitions, None)
        return t.append_column(SIDE_COL, pa.array(np.zeros(len(t), np.int8)))

    pt = points.map_batches(tag_p, batch_format="pyarrow")
    it = intervals.map_batches(tag_iv, batch_format="pyarrow")

    def sweep(group: pa.Table) -> pa.Table:
        side = group.column(SIDE_COL).to_numpy()
        pmask = side == 1
        pp = group.filter(pa.array(pmask)).select(
            [c for c in p_cols if c in group.column_names]
        )
        if len(pp) == 0:
            return out_schema.empty_table()
        iv = group.filter(pa.array(~pmask))
        ent_p = pp.column(entity_col).to_numpy(zero_copy_only=False)
        t_p = pp.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(iv):
            ent_i = iv.column(entity_col).to_numpy(zero_copy_only=False)
            t_s = iv.column(start_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
            t_e = iv.column(end_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(
                zero_copy_only=False
            )
        else:
            ent_i = ent_p[:0]
            t_s = t_e = t_p[:0]
        m, n = len(ent_i), len(ent_p)
        ent_all = np.concatenate([ent_i, ent_p, ent_i])
        t_all = np.concatenate([t_s, t_p, t_e])
        # same-ts priority: start(0) < query(1) < end(2) => closed bounds
        kind = np.concatenate(
            [np.zeros(m, np.int8), np.ones(n, np.int8), np.full(m, 2, np.int8)]
        )
        delta = np.concatenate(
            [np.ones(m, np.int64), np.zeros(n, np.int64),
             np.full(m, -1, np.int64)]
        )
        order = np.lexsort((kind, t_all, ent_all))
        # entity boundaries reset the running count (cumsum of deltas is 0
        # at each entity's end anyway: every +1 has its -1 in-partition)
        open_cnt = np.cumsum(delta[order])
        qpos = np.flatnonzero(kind[order] == 1)
        counts = np.empty(n, dtype=np.int64)
        # order[qpos] - m are the ORIGINAL point-row indices of the queries
        # in sweep order; scatter the open counts straight back
        counts[order[qpos] - m] = open_cnt[qpos]
        # a null point ts can satisfy neither bound (SQL semantics) but the
        # point row still emits — it arrived as NaN, sorted to the stream's
        # tail, and read a meaningless count there; pin it to 0
        null_ts = np.isnan(t_p) if t_p.dtype.kind == "f" else np.zeros(
            n, dtype=bool
        )
        counts[null_ts] = 0
        out = pp.append_column(out_col, pa.array(counts))
        return out.replace_schema_metadata(None)

    return pt.union(it).groupby(PART_COL).map_groups(
        sweep, batch_format="pyarrow"
    )
