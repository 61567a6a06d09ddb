"""Distributed range (interval) join.

Not present in the reference (its joins are exact-id hash joins,
/root/reference/classes_io.py:294-386) and absent from Ray Data's built-in
join surface — one of the custom temporal operators the transcript engine
needs (companion to the as-of join, stages/asof.py): attach every interval
``[start, end]`` of an entity to each of the entity's rows whose timestamp
falls inside it (campaign windows, incident windows, session spans,
maintenance windows joined to turns/events).

Design mirrors ``asof_join``: co-partition both sides by
``stable_hash(entity) % P`` (the same partitioner every other stage uses),
union with a side tag, and run a vectorized per-partition probe inside ONE
``groupby(_part).map_groups`` — one shuffle total. A small interval table
broadcasts instead (``ray.put`` once, local object-store read per task, zero
shuffle).

Per-partition probe (no Python row loop):

* general path — pandas hash-merge on entity followed by a boolean
  ``start <= ts <= end`` mask. Per-entity output is intrinsically
  |rows| x |matching intervals|; memory is bounded by the PRE-filter
  per-entity cross size. Fine for realistic interval tables (tens of
  overlapping windows per entity); a corpus with thousands of mutually
  overlapping intervals per entity should bucket time first (see
  ``time_bucket`` note in the docstring of :func:`range_join`).
* ``assume_disjoint=True`` — intervals of one entity never overlap (session
  spans, SCD ranges): a ``merge_asof`` backward-on-start + end-mask finds
  the unique candidate in O(n log m) with NO cross blowup. The disjointness
  contract is asserted per partition (cheap vectorized check).

Partitioning assumption (documented per the §2-custom-operator rule): all
rows AND all intervals of one entity land in one partition; skew therefore
follows the entity key. Interval tables are per-entity small in every
motivating workload; a single whale entity can be handled by splitting its
LEFT rows across partitions and replicating only its intervals (intervals
ride with whichever left chunk needs them) — not implemented until a
workload needs it.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from rp_extract_ray.schema import DEFAULT_NUM_PARTITIONS
from rp_extract_ray.stages.asof import SIDE_COL, _arrow_schema
from rp_extract_ray.stages.partition import PART_COL, _add_part


def _probe_frames(
    left: pd.DataFrame,
    iv: pd.DataFrame,
    *,
    entity_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    value_cols: Sequence[str],
    how: str,
    closed: str,
    assume_disjoint: bool,
) -> pd.DataFrame:
    """Vectorized interval probe of one co-located frame pair."""
    lo_inc = closed in ("both", "left")
    hi_inc = closed in ("both", "right")

    if assume_disjoint and len(iv):
        iv = iv.sort_values([start_col], kind="mergesort", ignore_index=True)
        # disjointness contract: within an entity, each start must lie at or
        # after the previous interval's end (strictly after when both bounds
        # are closed, else touching endpoints double-match)
        same = iv[entity_col].to_numpy()[1:] == iv[entity_col].to_numpy()[:-1]
        prev_end = iv[end_col].to_numpy()[:-1]
        nxt_start = iv[start_col].to_numpy()[1:]
        bad = same & (
            (nxt_start <= prev_end) if (lo_inc and hi_inc) else (nxt_start < prev_end)
        )
        if bad.any():
            raise ValueError(
                "assume_disjoint=True but intervals overlap for entity "
                f"{iv[entity_col].to_numpy()[1:][bad][0]!r}"
            )
        lsort = left.sort_values(ts_col, kind="mergesort", ignore_index=True)
        merged = pd.merge_asof(
            lsort,
            iv[[entity_col, start_col, end_col, *value_cols]].rename(
                columns={start_col: "_iv_start", end_col: "_iv_end"}
            ),
            left_on=ts_col,
            right_on="_iv_start",
            by=entity_col,
            direction="backward",
            allow_exact_matches=lo_inc,
        )
        ts = merged[ts_col].to_numpy()
        end = merged["_iv_end"].to_numpy()
        inside = (ts <= end) if hi_inc else (ts < end)
        inside &= ~pd.isna(merged["_iv_start"]).to_numpy()
        if how == "inner":
            return merged[inside].drop(columns=["_iv_start", "_iv_end"]).reset_index(
                drop=True
            )
        out = merged.drop(columns=["_iv_start", "_iv_end"])
        miss = ~inside
        if miss.any():
            out.loc[miss, list(value_cols)] = None
        return out

    # general path: hash-merge on entity, then the containment mask
    merged = left.merge(
        iv[[entity_col, start_col, end_col, *value_cols]].rename(
            columns={start_col: "_iv_start", end_col: "_iv_end"}
        ),
        on=entity_col,
        how="left" if how == "left" else "inner",
    )
    ts = merged[ts_col].to_numpy()
    lo = merged["_iv_start"].to_numpy()
    hi = merged["_iv_end"].to_numpy()
    inside = (ts >= lo) if lo_inc else (ts > lo)
    inside &= (ts <= hi) if hi_inc else (ts < hi)
    inside &= ~(pd.isna(lo) | pd.isna(hi))
    if how == "inner":
        return merged[inside].drop(columns=["_iv_start", "_iv_end"]).reset_index(
            drop=True
        )
    # left join: keep ONE row per unmatched left row (null values), all rows
    # for matched ones
    merged = merged.drop(columns=["_iv_start", "_iv_end"])
    keep_cols = [c for c in left.columns]
    matched = merged[inside]
    matched_keys = pd.MultiIndex.from_frame(matched[keep_cols])
    all_keys = pd.MultiIndex.from_frame(left[keep_cols])
    unmatched = left[~all_keys.isin(set(matched_keys))].copy()
    for c in value_cols:
        unmatched[c] = None
    return pd.concat([matched, unmatched], ignore_index=True)


def range_join(
    left: Dataset,
    intervals: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    interval_value_cols: Sequence[str] | None = None,
    how: str = "inner",
    closed: str = "both",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    broadcast: bool = False,
    assume_disjoint: bool = False,
    left_schema: pa.Schema | None = None,
) -> Dataset:
    """Join each interval's value columns onto every contained left row.

    ``how='inner'`` drops left rows inside no interval; ``'left'`` keeps them
    with nulls (one row each). ``closed`` picks bound inclusivity
    (``'both'|'left'|'right'|'neither'``). Interval value columns colliding
    with left column names are renamed ``<name>_iv``.

    Broadcast path for a small interval table (zero shuffle); co-partitioned
    path for two large sides (one shuffle, same partitioner as every other
    stage — pass ``left_schema`` to avoid probing a transformed left and to
    get typed empty blocks for single-side partitions, exactly as in
    ``asof_join``).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    if closed not in ("both", "left", "right", "neither"):
        raise ValueError(f"bad closed={closed!r}")
    iv_schema = _arrow_schema(intervals)
    if interval_value_cols is None:
        interval_value_cols = [
            c for c in iv_schema.names if c not in (entity_col, start_col, end_col)
        ]
    rvc = list(interval_value_cols)
    rtypes = {c: iv_schema.field(c).type for c in rvc}

    if broadcast:
        small = intervals.select_columns(
            [entity_col, start_col, end_col, *rvc]
        ).to_pandas()
        iv_ref = ray.put(small)

        def broadcast_probe(batch: pd.DataFrame) -> pd.DataFrame:
            iv_loc = ray.get(iv_ref)
            ren = {c: (f"{c}_iv" if c in batch.columns else c) for c in rvc}
            return _probe_frames(
                batch,
                iv_loc.rename(columns=ren),
                entity_col=entity_col,
                ts_col=ts_col,
                start_col=start_col,
                end_col=end_col,
                value_cols=[ren[c] for c in rvc],
                how=how,
                closed=closed,
                assume_disjoint=assume_disjoint,
            )

        return left.map_batches(broadcast_probe, batch_format="pandas")

    # ---- co-partitioned path ----
    rename = None
    if left_schema is not None:
        left_names = list(left_schema.names)
        rename = {c: (f"{c}_iv" if c in left_names else c) for c in rvc}
    out_value_cols = [rename[c] for c in rvc] if rename else rvc
    out_rtypes = {(rename[c] if rename else c): rtypes[c] for c in rvc}
    vset = set(out_value_cols)

    def tag_left(b: pa.Table) -> pa.Table:
        if rename is None:
            clash = vset & set(b.column_names)
            if clash:
                raise ValueError(
                    f"left columns collide with interval value columns {sorted(clash)}; "
                    "pass left_schema= to enable _iv renaming"
                )
        t = _add_part(b, entity_col, num_partitions, None)
        return t.append_column(SIDE_COL, pa.array(np.ones(len(b), dtype=np.int8)))

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {
            entity_col: b.column(entity_col),
            start_col: b.column(start_col),
            end_col: b.column(end_col),
        }
        for c in rvc:
            cols[rename[c] if rename else c] = b.column(c)
        t = pa.table(cols)
        t = _add_part(t, entity_col, num_partitions, None)
        return t.append_column(SIDE_COL, pa.array(np.zeros(len(b), dtype=np.int8)))

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = intervals.map_batches(tag_right, batch_format="pyarrow")

    def out_schema() -> pa.Schema | None:
        if left_schema is None:
            return None
        return pa.schema(
            [left_schema.field(n) for n in left_schema.names]
            + [pa.field(c, out_rtypes[c]) for c in out_value_cols]
        )

    bound_types = {
        start_col: iv_schema.field(start_col).type,
        end_col: iv_schema.field(end_col).type,
    }

    def probe_group(group: pa.Table) -> pa.Table:
        side = group.column(SIDE_COL).to_numpy()
        group = group.drop_columns([SIDE_COL, PART_COL])
        lmask = side == 1
        lcols = [
            c
            for c in group.column_names
            if c not in (start_col, end_col) and c not in out_value_cols
        ]
        lpart = group.filter(pa.array(lmask)).select(
            [c for c in lcols if c in group.column_names]
        ).to_pandas()
        riv_names = [entity_col, start_col, end_col, *out_value_cols]
        present = [c for c in riv_names if c in group.column_names]
        rpart = group.filter(pa.array(~lmask)).select(present).to_pandas()
        for c in riv_names:
            if c not in rpart.columns:
                typ = out_rtypes.get(c) or bound_types.get(c)
                rpart[c] = pd.Series([], dtype=typ.to_pandas_dtype())
        if len(lpart) == 0:
            sch = out_schema()
            if sch is not None:
                return sch.empty_table()
            return group.slice(0, 0)
        merged = _probe_frames(
            lpart,
            rpart,
            entity_col=entity_col,
            ts_col=ts_col,
            start_col=start_col,
            end_col=end_col,
            value_cols=out_value_cols,
            how=how,
            closed=closed,
            assume_disjoint=assume_disjoint,
        )
        sch = out_schema()
        if sch is not None:
            t = pa.Table.from_pandas(merged, schema=sch, preserve_index=False)
        else:
            t = pa.Table.from_pandas(merged, preserve_index=False)
        # pandas metadata dicts defeat Ray's schema-dedup hashing (log noise)
        return t.replace_schema_metadata(None)

    unioned = lt.union(rt)
    return unioned.groupby(PART_COL).map_groups(probe_group, batch_format="pyarrow")


def interval_overlap_join(
    a: Dataset,
    b: Dataset,
    *,
    entity_col: str = "conv_id",
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    closed: str = "both",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """Interval × interval overlap join (inner): pair every interval of
    ``a`` with every interval of ``b`` of the SAME entity whose spans
    overlap — ``a_start <= b_end AND b_start <= a_end`` (``closed='both'``;
    ``'neither'`` makes both comparisons strict, so touching endpoints do
    not match). The two-sided generalization of :func:`range_join` (point
    in interval): incident windows × activity spans, campaign × session
    overlap reports.

    Same scale shape as every temporal join here: both sides co-partition
    by ``stable_hash(entity) % P`` and union with a side tag, ONE
    ``groupby(PART_COL).map_groups`` exchange, vectorized pandas hash-merge
    on entity + boolean overlap mask per partition. Per-entity output is
    |a intervals| × |overlapping b intervals|; memory is bounded by the
    per-entity pre-filter cross size (interval tables are per-entity small
    in the motivating workloads — same documented assumption as
    ``range_join``). Non-entity column names must be disjoint between the
    sides (rename upstream, the ``repartition_join`` contract).
    """
    if closed not in ("both", "neither"):
        raise ValueError(f"closed must be 'both' or 'neither', got {closed!r}")
    a_schema = _arrow_schema(a)
    b_schema = _arrow_schema(b)
    a_cols = [c for c in a_schema.names if c != entity_col]
    b_cols = [c for c in b_schema.names if c != entity_col]
    clash = set(a_cols) & set(b_cols)
    if clash:
        raise ValueError(f"column names collide across sides: {sorted(clash)}")
    out_schema = pa.schema(
        [a_schema.field(entity_col)]
        + [a_schema.field(c) for c in a_cols]
        + [b_schema.field(c) for c in b_cols]
    )

    def tag(side_val: int):
        def f(t: pa.Table) -> pa.Table:
            t = _add_part(t, entity_col, num_partitions, None)
            return t.append_column(
                SIDE_COL, pa.array(np.full(len(t), side_val, dtype=np.int8))
            )

        return f

    at = a.map_batches(tag(1), batch_format="pyarrow")
    bt = b.map_batches(tag(0), batch_format="pyarrow")

    def probe(group: pa.Table) -> pa.Table:
        side = group.column(SIDE_COL).to_numpy()
        amask = pa.array(side == 1)
        ap = group.filter(amask).select([entity_col, *a_cols]).to_pandas()
        bp = group.filter(pa.array(side == 0)).select(
            [entity_col, *b_cols]
        ).to_pandas()
        if len(ap) == 0 or len(bp) == 0:
            return out_schema.empty_table()
        m = ap.merge(bp, on=entity_col, how="inner")
        lo = m[a_start].to_numpy()
        hi = m[a_end].to_numpy()
        blo = m[b_start].to_numpy()
        bhi = m[b_end].to_numpy()
        if closed == "both":
            keep = (lo <= bhi) & (blo <= hi)
        else:
            keep = (lo < bhi) & (blo < hi)
        out = m[keep]
        t = pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)
        return t.replace_schema_metadata(None)

    return at.union(bt).groupby(PART_COL).map_groups(
        probe, batch_format="pyarrow"
    )


def band_join(
    a: Dataset,
    b: Dataset,
    *,
    a_key: str,
    b_key: str,
    band: float,
    entity_col: str | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """Numeric band (1-D similarity) join: pair every ``a`` row with the
    ``b`` rows whose key is within ``|a_key - b_key| <= band`` — optionally
    only within the same ``entity_col`` (the classic tolerance join on a
    measurement column; the VALUE-axis sibling of the time-axis
    :func:`range_join`).

    Scale design — bucket replication, never a cross join: keys bucket at
    width ``band`` (``floor(key/band)``); ``a`` rows land in their own
    bucket, ``b`` rows replicate into bucket-1/bucket/bucket+1, so every
    qualifying pair co-locates EXACTLY once (in a's bucket — floor buckets
    of keys within ``band`` differ by at most 1) and no dedup pass is
    needed. ONE keyed exchange on (entity, bucket); the in-partition
    kernel is a pandas hash-merge on the exact (entity, bucket) pair plus
    the |delta| <= band verify mask. The 3x replication of ``b`` is the
    only fan-out — fixed, not data-dependent. Non-key column names must be
    disjoint between the sides.
    """
    import numpy as np

    from rp_extract_ray.stages.partition import stable_hash

    a_schema = _arrow_schema(a)
    b_schema = _arrow_schema(b)
    shared = {entity_col} if entity_col else set()
    a_cols = [c for c in a_schema.names if c not in shared]
    b_cols = [c for c in b_schema.names if c not in shared]
    clash = set(a_cols) & set(b_cols)
    if clash:
        raise ValueError(f"column names collide across sides: {sorted(clash)}")
    fields = []
    if entity_col:
        fields.append(a_schema.field(entity_col))
    fields += [a_schema.field(c) for c in a_cols]
    fields += [b_schema.field(c) for c in b_cols]
    out_schema = pa.schema(fields)
    merge_keys = ([entity_col] if entity_col else []) + ["_bucket"]

    def buckets_of(t: pa.Table, col: str) -> np.ndarray:
        v = t.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return np.floor(v / band).astype(np.int64)

    def part_key(t: pa.Table, bucket: np.ndarray) -> np.ndarray:
        h = bucket.astype(np.uint64) * np.uint64(1099511628211)
        if entity_col:
            h ^= stable_hash(
                t.column(entity_col).to_numpy(zero_copy_only=False)
            )
        return h.astype(np.int64)

    def tag_a(t: pa.Table) -> pa.Table:
        bk = buckets_of(t, a_key)
        t = t.append_column("_bucket", pa.array(bk))
        t = t.append_column("_bkey", pa.array(part_key(t, bk)))
        t = _add_part(t, "_bkey", num_partitions, None)
        return t.drop_columns(["_bkey"]).append_column(
            SIDE_COL, pa.array(np.ones(len(t), dtype=np.int8))
        )

    def tag_b(t: pa.Table) -> pa.Table:
        bk = buckets_of(t, b_key)
        n = len(t)
        idx = np.repeat(np.arange(n, dtype=np.int64), 3)
        rep = t.take(pa.array(idx))
        bk3 = np.repeat(bk, 3) + np.tile(
            np.array([-1, 0, 1], dtype=np.int64), n
        )
        rep = rep.append_column("_bucket", pa.array(bk3))
        rep = rep.append_column("_bkey", pa.array(part_key(rep, bk3)))
        rep = _add_part(rep, "_bkey", num_partitions, None)
        return rep.drop_columns(["_bkey"]).append_column(
            SIDE_COL, pa.array(np.zeros(len(rep), dtype=np.int8))
        )

    at = a.map_batches(tag_a, batch_format="pyarrow")
    bt = b.map_batches(tag_b, batch_format="pyarrow")

    def probe(group: pa.Table) -> pa.Table:
        side = group.column(SIDE_COL).to_numpy()
        sel_a = ([entity_col] if entity_col else []) + ["_bucket", *a_cols]
        sel_b = ([entity_col] if entity_col else []) + ["_bucket", *b_cols]
        ap = group.filter(pa.array(side == 1)).select(sel_a).to_pandas()
        bp = group.filter(pa.array(side == 0)).select(sel_b).to_pandas()
        if len(ap) == 0 or len(bp) == 0:
            return out_schema.empty_table()
        m = ap.merge(bp, on=merge_keys, how="inner")
        d = np.abs(m[a_key].to_numpy() - m[b_key].to_numpy())
        out = m[d <= band].drop(columns=["_bucket"])
        t = pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)
        return t.replace_schema_metadata(None)

    return at.union(bt).groupby(PART_COL).map_groups(
        probe, batch_format="pyarrow"
    )
