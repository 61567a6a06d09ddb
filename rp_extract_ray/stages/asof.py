"""Distributed point-in-time (as-of) join.

Not present in the reference (its joins are exact-id hash joins,
/root/reference/classes_io.py:294-386); required by the north rule. Design
(SURVEY.md §2.5/§7.2-4): co-partition both sides by ``stable_hash(entity) % P``
(the SAME partitioner as every other stage, so a pipeline reuses one
partitioning key end-to-end), union them with a side tag and an aligned
schema, then one ``groupby(_part).map_groups`` runs a per-partition ts-sorted
``pandas.merge_asof`` (C sort-merge, ``by=entity``). One shuffle total. For a
small right side use ``broadcast=True``: the right table is materialized once,
``ray.put`` into the object store, read once per actor in ``__init__`` and
merged per batch with zero shuffle.

Semantics: ``direction='backward'`` matches the nearest right row with
``right.ts <= left.ts`` per entity (point-in-time correct: never reads the
future); ``'forward'`` matches nearest ``right.ts >= left.ts``; ``'nearest'``
matches the right row minimizing ``|left.ts - right.ts|`` (ties prefer the
earlier right row — pandas ``merge_asof`` backward preference). ``tolerance_s``
bounds the match distance — the per-entity watermark: a right row further than
the tolerance horizon can never influence a left row. Ties on equal ``ts``
match (inclusive), the last right row at that ts winning — matching DuckDB
``ASOF JOIN`` semantics.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from rp_extract_ray.schema import DEFAULT_NUM_PARTITIONS
from rp_extract_ray.stages.partition import PART_COL, _add_part

SIDE_COL = "_side"


def _arrow_schema(ds: Dataset) -> pa.Schema:
    """Arrow schema of a Dataset whether its blocks are Arrow or pandas."""
    s = ds.schema()
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, typ in zip(s.names, s.types):
        if isinstance(typ, pa.DataType):
            fields.append(pa.field(name, typ))
        else:  # numpy dtype from pandas blocks
            dt = np.dtype(typ)
            if dt == object:
                fields.append(pa.field(name, pa.string()))
            elif dt.kind == "M":
                fields.append(pa.field(name, pa.timestamp("us")))
            else:
                fields.append(pa.field(name, pa.from_numpy_dtype(dt)))
    return pa.schema(fields)


def _merge_asof_frames(
    left: pd.DataFrame,
    right: pd.DataFrame,
    *,
    entity_col: str,
    ts_col: str,
    direction: str,
    tolerance_s: float | None,
    value_cols: Sequence[str],
    dedup_right: str | None = None,
    right_prepared: bool = False,
) -> pd.DataFrame:
    """merge_asof with stable restoration of left column order/dtypes.

    ``right_prepared=True`` promises ``right`` is already deduped + ts-sorted
    (the broadcast path does both ONCE before ``ray.put`` — re-doing the
    O(|right| log |right|) sort and the dedup groupby per left batch was
    repeated work scaling with batch count, VERDICT r3 item 4)."""
    left = left.sort_values(ts_col, kind="mergesort", ignore_index=True)
    if not right_prepared:
        if dedup_right:
            right = (
                right.groupby([entity_col, ts_col], sort=False, as_index=False)
                .agg({c: dedup_right for c in value_cols})
            )
        right = right.sort_values(ts_col, kind="mergesort", ignore_index=True)
    tol = pd.Timedelta(seconds=tolerance_s) if tolerance_s is not None else None
    merged = pd.merge_asof(
        left,
        right[[entity_col, ts_col, *value_cols]],
        on=ts_col,
        by=entity_col,
        direction=direction,
        tolerance=tol,
    )
    return merged


def asof_join(
    left: Dataset,
    right: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    right_value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_s: float | None = None,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    broadcast: bool = False,
    dedup_right: str | None = None,
    left_schema: pa.Schema | None = None,
) -> Dataset:
    """As-of join ``right``'s value columns onto ``left`` (left outer).

    Right value columns whose names collide with left columns are renamed
    ``<name>_r`` before the merge. ``dedup_right='max'|'min'`` collapses
    duplicate ``(entity, ts)`` right rows to a deterministic winner INSIDE
    the merge (cheaper than a separate distributed groupby, and required for
    ties to match SQL ASOF semantics deterministically).

    Co-partitioned path only: if ``left`` is a TRANSFORMED Dataset, calling
    ``left.schema()`` launches a limit-1 probe job that executes any upstream
    all-to-all — pass ``left_schema`` explicitly to skip it (the broadcast
    path never needs it).
    """
    right_schema = _arrow_schema(right)  # right side is small/cheap to probe
    if right_value_cols is None:
        right_value_cols = [c for c in right_schema.names if c not in (entity_col, ts_col)]

    if broadcast:
        # IMPORTANT: never call left.schema() here — on a transformed Dataset
        # that launches a limit-1 probe job which still executes the full
        # upstream all-to-all sort (doubling pipeline cost). Column-collision
        # renaming is resolved per batch instead (consistent by construction).
        small = right.select_columns([entity_col, ts_col, *right_value_cols]).to_pandas()
        rvc = list(right_value_cols)
        # prepare the broadcast side ONCE: dedup collapse + stable ts sort
        # happen here, not per left batch (right_prepared=True below)
        if dedup_right:
            small = small.groupby([entity_col, ts_col], sort=False, as_index=False).agg(
                {c: dedup_right for c in rvc}
            )
        small = small.sort_values(ts_col, kind="mergesort", ignore_index=True)
        right_ref = ray.put(small)

        # stateless TASKS, not an actor pool: ray.get of the broadcast table
        # is a cheap local object-store read, and a task pool scales to every
        # free CPU instead of a fixed actor count (an actor pool here also
        # gets operator-fused with upstream stages and caps their parallelism)
        # DECLARED pyarrow, converted to pandas inside: Ray's sort planner
        # picks its shuffle block format from the declared batch_format of
        # upstream map_batches stages (measured — a batch_format="pandas"
        # stage makes every downstream Dataset.sort convert its whole
        # shuffle to pandas blocks even when the UDF returns Arrow, which
        # re-converts per reduce and tags blocks with the unhashable pandas
        # metadata blob: the "Failed to hash the schemas" spam). The
        # arrow->pandas hop for the merge_asof kernel happens either way.
        def broadcast_merge(batch: pa.Table) -> pa.Table:
            small_loc = ray.get(right_ref)
            pdf = batch.to_pandas()
            ren = {c: (f"{c}_r" if c in pdf.columns else c) for c in rvc}
            out = _merge_asof_frames(
                pdf,
                small_loc.rename(columns=ren),
                entity_col=entity_col,
                ts_col=ts_col,
                direction=direction,
                tolerance_s=tolerance_s,
                value_cols=[ren[c] for c in rvc],
                right_prepared=True,
            )
            from rp_extract_ray.stages.partition import strip_meta

            return strip_meta(pa.Table.from_pandas(out, preserve_index=False))

        return left.map_batches(broadcast_merge, batch_format="pyarrow")

    # ---- co-partitioned path (both sides large): tag, union, merge ----
    # No left-side schema probe: Ray's union/shuffle unifies heterogeneous
    # block schemas (columns missing on one side arrive as nulls), so the
    # left Dataset is NEVER executed early — the old ``left.schema()`` call
    # launched a limit-1 probe job that ran the whole upstream all-to-all.
    # With an explicit ``left_schema`` the exact output schema is enforced
    # and value-column collisions are renamed; without it collisions raise.
    rtypes = {c: right_schema.field(c).type for c in right_value_cols}
    rename = None
    if left_schema is not None:
        left_names = list(left_schema.names)
        rename = {c: (f"{c}_r" if c in left_names else c) for c in right_value_cols}
    out_value_cols = (
        [rename[c] for c in right_value_cols] if rename else list(right_value_cols)
    )
    out_rtypes = {
        (rename[c] if rename else c): rtypes[c] for c in right_value_cols
    }
    vset = set(out_value_cols)

    def tag_left(b: pa.Table) -> pa.Table:
        if rename is None:
            clash = vset & set(b.column_names)
            if clash:
                raise ValueError(
                    f"left columns collide with right value columns {sorted(clash)}; "
                    "pass left_schema= to enable _r renaming"
                )
        t = _add_part(b, entity_col, num_partitions, None)
        return t.append_column(SIDE_COL, pa.array(np.ones(len(b), dtype=np.int8)))

    def tag_right(b: pa.Table) -> pa.Table:
        cols = {entity_col: b.column(entity_col), ts_col: b.column(ts_col)}
        for c in right_value_cols:
            cols[rename[c] if rename else c] = b.column(c)
        t = pa.table(cols)
        t = _add_part(t, entity_col, num_partitions, None)
        return t.append_column(SIDE_COL, pa.array(np.zeros(len(b), dtype=np.int8)))

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    def merge_group(group: pa.Table) -> pa.Table:
        side = group.column(SIDE_COL).to_numpy()
        group = group.drop_columns([SIDE_COL, PART_COL])
        # a partition may hold rows of only one side: add any missing value
        # columns as typed nulls so the merge schema is uniform
        for c in out_value_cols:
            if c not in group.column_names:
                group = group.append_column(c, pa.nulls(len(group), out_rtypes[c]))
        lmask = pa.array(side == 1)
        lpart = group.filter(lmask).drop_columns(out_value_cols).to_pandas()
        rpart = group.filter(pa.array(side == 0)).select(
            [entity_col, ts_col, *out_value_cols]
        ).to_pandas()
        if len(lpart) == 0:
            # right-only partition: with a declared left schema, emit a typed
            # empty block in the exact OUTPUT shape (a right-shaped slice
            # would make schema-sensitive consumers — write_parquet,
            # Dataset.schema — see the wrong columns on that block)
            if left_schema is not None:
                unified = pa.schema(
                    [left_schema.field(n) for n in left_schema.names]
                    + [pa.field(c, out_rtypes[c]) for c in out_value_cols]
                )
                return unified.empty_table()
            # no declared schema: left columns are unknowable here; emit the
            # left-shaped columns present in the group (right value cols are
            # part of the output shape) and rely on downstream unification
            return group.slice(0, 0)
        merged = _merge_asof_frames(
            lpart,
            rpart,
            entity_col=entity_col,
            ts_col=ts_col,
            direction=direction,
            tolerance_s=tolerance_s,
            value_cols=out_value_cols,
            dedup_right=dedup_right,
        )
        if left_schema is not None:
            unified = pa.schema(
                [left_schema.field(n) for n in left_schema.names]
                + [pa.field(c, out_rtypes[c]) for c in out_value_cols]
            )
            return pa.Table.from_pandas(
                merged, schema=unified, preserve_index=False
            ).replace_schema_metadata(None)
        return pa.Table.from_pandas(
            merged, preserve_index=False
        ).replace_schema_metadata(None)

    unioned = lt.union(rt)
    return unioned.groupby(PART_COL).map_groups(merge_group, batch_format="pyarrow")
