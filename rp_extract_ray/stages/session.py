"""Inactivity-gap sessionization.

Generalization of the reference's segment plan (M4,
/root/reference/rp_extract.py:484-537): instead of fixed-length sample windows
the transcript engine splits each conversation into *sessions* at inactivity
gaps (>= ``gap_s`` seconds between consecutive turns; FIXTURES.md F1 treats
>=30-min gaps as session boundaries). ``session_id`` is the 0-based session
ordinal within the conversation — a prefix count of boundaries, computed
vectorized over the sorted partition (per-entity cumsum via boundary masks).

Point-in-time safe: a row's session_id depends only on gaps at or before it.
Note on salting: session_id is a prefix count from the conversation START, so
it is NOT causal-bounded — the plain salted path can't compute it. The
skew-proof forms are :func:`sessionize_salted` / :func:`salted_session_apply`
(chunk-local counts re-based by per-(entity, chunk) offsets; single-exchange
'post' mode or distributed 'copartition' mode), which are bit-equal to the
unsalted result.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset

from rp_extract_ray.schema import DEFAULT_SESSION_GAP_S
from rp_extract_ray.stages.lag import gap_seconds
from rp_extract_ray.stages.partition import partitioned_apply


def session_ids(
    ts: np.ndarray, starts: np.ndarray, gap_threshold_s: float
) -> tuple[np.ndarray, np.ndarray]:
    """(gap_s, session_id int32) for an entity-sorted frame."""
    gap = gap_seconds(ts, starts, fill_first=0.0)
    n = len(gap)
    boundary = gap > gap_threshold_s
    is_start = np.arange(n) == starts
    boundary &= ~is_start
    cum = np.cumsum(boundary)
    session = (cum - cum[starts]).astype(np.int32)  # reset at entity start
    return gap, session


def make_session_frame_fn(
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    gap_threshold_s: float = DEFAULT_SESSION_GAP_S,
):
    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        gap, session = session_ids(pdf[ts_col].to_numpy(), starts, gap_threshold_s)
        if "gap_s" not in pdf.columns:
            pdf["gap_s"] = gap
        pdf["session_id"] = session
        return pdf

    return fn


def session_aggregate(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] | None = None,
    gap_threshold_s: float = DEFAULT_SESSION_GAP_S,
    value_col: str | None = None,
    num_partitions: int = 64,
) -> Dataset:
    """One row per (entity, session): n_events, ts_min, ts_max, duration_s
    (+ value_sum when ``value_col``). The per-session analogue of the
    reference's per-segment aggregation (M20); sessions of one entity are
    always local to a partition, so the groupby is in-memory pandas."""

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        _, session = session_ids(pdf[ts_col].to_numpy(), starts, gap_threshold_s)
        pdf = pdf.assign(session_id=session)
        aggs = {"n_events": (ts_col, "size"), "ts_min": (ts_col, "min"), "ts_max": (ts_col, "max")}
        if value_col:
            aggs["value_sum"] = (value_col, "sum")
        out = (
            pdf.groupby([entity_col, "session_id"], sort=False)
            .agg(**aggs)
            .reset_index()
        )
        out["n_events"] = out["n_events"].astype(np.int64)
        out["duration_s"] = (out["ts_max"] - out["ts_min"]).dt.total_seconds()
        return out

    return partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=order_cols or (ts_col,),
        num_partitions=num_partitions,
    )


def sessionize(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] | None = None,
    gap_threshold_s: float = DEFAULT_SESSION_GAP_S,
    num_partitions: int = 64,
) -> Dataset:
    return partitioned_apply(
        ds,
        make_session_frame_fn(entity_col, ts_col, gap_threshold_s),
        entity_col=entity_col,
        order_cols=order_cols or (ts_col,),
        num_partitions=num_partitions,
    )


def session_chunk_offsets(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    turn_col: str = "turn_idx",
    gap_threshold_s: float = DEFAULT_SESSION_GAP_S,
    num_partitions: int = 64,
    chunk_turns: int = 4096,
) -> Dataset:
    """Pass A of salted sessionization: the per-(entity, chunk) session
    boundary-count table, per-entity prefix-summed into EXCLUSIVE chunk
    offsets (boundaries in all earlier chunks of the entity).

    Runs salted with overlap=1 (the gap at a chunk's first row needs one
    ghost predecessor). Output: one row per (entity, ``_chunk_id``) with
    ``offset`` — one row per ``chunk_turns`` input rows, tiny by
    construction. ``ds`` only needs ``(entity_col, turn_col, ts_col)``."""
    from rp_extract_ray.stages.partition import SaltSpec, run_bounds

    salt = SaltSpec(chunk_turns=chunk_turns, overlap=1, turn_col=turn_col)

    def local_counts(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        from rp_extract_ray.stages.partition import GHOST_COL

        ghost = pdf[GHOST_COL].to_numpy() if GHOST_COL in pdf.columns else np.zeros(
            len(pdf), dtype=bool
        )
        _, local = session_ids(pdf[ts_col].to_numpy(), starts, gap_threshold_s)
        run_start_rows, run_end = run_bounds(starts, len(pdf))
        ent = pdf[entity_col].to_numpy()
        chunk = pdf[turn_col].to_numpy() // chunk_turns
        rows = []
        for s, e in zip(run_start_rows, run_end):
            real = np.flatnonzero(~ghost[s:e]) + s
            if len(real) == 0:
                continue  # ghost-only run: entity ended at a chunk tail
            rows.append((ent[s], int(chunk[real[-1]]), int(local[e - 1])))
        return pd.DataFrame(rows, columns=[entity_col, "_chunk_id", "n_bounds"])

    counts_ds = partitioned_apply(
        ds.select_columns([entity_col, turn_col, ts_col]),
        local_counts,
        entity_col=entity_col,
        order_cols=(ts_col, turn_col),
        num_partitions=num_partitions,
        salt=salt,
        expose_ghost=True,
    ).materialize()
    # Ghost first rows are run starts and never boundaries, so local[e-1]
    # counts exactly the boundaries at real rows of the chunk.

    return _prefix_offsets(counts_ds, entity_col, num_partitions)


def _prefix_offsets(counts_ds: Dataset, entity_col: str, num_partitions: int) -> Dataset:
    """(entity, _chunk_id, n_bounds) -> (entity, _chunk_id, offset): exclusive
    per-entity prefix sum over chunk order (boundaries in all EARLIER
    chunks). One tiny exchange — counts_ds has one row per chunk_turns input
    rows."""

    def prefix_fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        pdf = pdf.reset_index(drop=True)
        nb = pdf["n_bounds"].to_numpy(dtype=np.int64)
        cs = np.cumsum(nb)
        pdf["offset"] = cs - nb - (cs[starts] - nb[starts])
        return pdf[[entity_col, "_chunk_id", "offset"]]

    return partitioned_apply(
        counts_ds,
        prefix_fn,
        entity_col=entity_col,
        order_cols=("_chunk_id",),
        num_partitions=num_partitions,
    )


def salted_session_apply(
    ds: Dataset,
    finish_fn=None,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    turn_col: str = "turn_idx",
    gap_threshold_s: float = DEFAULT_SESSION_GAP_S,
    num_partitions: int = 64,
    chunk_turns: int = 4096,
    overlap: int = 1,
    offsets: str = "auto",
    broadcast_limit: int = 5_000_000,
    metrics_sink=None,
    metrics_stage: str = "salted_session_apply",
    offsets_ds: Dataset | None = None,
) -> Dataset:
    """Salted (skew-proof) sessionize, generalized to fuse extra causal
    per-frame feature work into the same exchange.

    ``session_id`` is a prefix count of boundaries from the conversation
    START, which is not causal-bounded, so the plain salted path can't
    compute it. Two phases (SURVEY.md §7.5-6 re-merge of partial window
    states): :func:`session_chunk_offsets` produces per-(entity, chunk)
    boundary offsets from a slim (entity, turn, ts) pass, then this second
    salted pass computes gap_s + LOCAL boundary counts (masked to real
    rows) and adds the chunk offset — bit-equal to the unsalted result.

    ``finish_fn(pdf, starts) -> pdf`` (row-preserving) runs on the
    ghost-padded frame AFTER ``gap_s``/``session_id`` are assigned — pass a
    window-feature kernel here to fuse sessionization + sliding windows
    into ONE salted exchange (the flagship composition, VERDICT r3 item 1).
    ``overlap`` must cover ``finish_fn``'s causal horizon (>= k for
    k-row sliding windows; the first ghost row's gap_s is 0-filled and
    must stay outside every real row's window, hence overlap >= k not
    k-1 — same contract as ``add_window_features(salt=...)``).

    Offset delivery (``offsets=``):

    * ``"auto"`` / ``"post"`` — the SINGLE-EXCHANGE mode (default): one
      salted pass computes gap/features and LOCAL session ids; the
      per-(entity, chunk) boundary counts are derived from the pass's own
      output (max local id per chunk), prefix-summed, and applied as a
      narrow broadcast rebase map over the materialized features. Shuffle
      volume: the numeric columns ONCE. Requires ``finish_fn`` to not read
      ``session_id`` (it sees the local id) and the offset table to fit the
      driver (raises past ``broadcast_limit``).
    * ``"broadcast"`` — two-pass: a slim (entity, turn, ts) pre-pass builds
      the offsets, ``ray.put`` ships them, and the main salted pass
      assigns FINAL session ids before ``finish_fn`` runs.
    * ``"copartition"`` — two-pass, fully distributed: the offsets are
      routed through the SAME salted partitioner and ride the main
      exchange as a co-partitioned side table, so nothing ever
      materializes on the driver (the 10^12-turn path, where one row per
      4096 turns is still 2.4e8 rows).

    No partition ever holds more than ``chunk_turns + overlap`` rows of one
    entity, in any mode.
    """
    import ray

    from rp_extract_ray.stages.partition import (
        GHOST_COL,
        PART_COL,
        SaltSpec,
        _chunk_part,
        entity_starts,
        run_bounds,
        stable_hash,
    )

    salt = SaltSpec(chunk_turns=chunk_turns, overlap=overlap, turn_col=turn_col)

    def apply_frame(pdf: pd.DataFrame, starts: np.ndarray, offs: dict | None) -> pd.DataFrame:
        """Gap + session assignment (+ finish_fn) for one salted frame.
        ``offs=None`` emits LOCAL session ids (the post-rebase mode adds the
        chunk offsets in a narrow map afterwards)."""
        ghost = (
            pdf[GHOST_COL].to_numpy(dtype=bool)
            if GHOST_COL in pdf.columns
            else np.zeros(len(pdf), dtype=bool)
        )
        pdf = pdf.drop(columns=[GHOST_COL], errors="ignore")
        gap = gap_seconds(pdf[ts_col].to_numpy(), starts, fill_first=0.0)
        n = len(pdf)
        boundary = (gap > gap_threshold_s) & (np.arange(n) != starts)
        # count boundaries at REAL rows only: with overlap > 1 the ghost
        # prefix replays gaps already counted in the previous chunk
        bc = np.cumsum(boundary & ~ghost)
        local = (bc - bc[starts]).astype(np.int64)
        if offs is not None:
            ent = pdf[entity_col].to_numpy()
            chunk = pdf[turn_col].to_numpy() // chunk_turns
            rs, re_ = run_bounds(starts, n)
            # per-RUN dict lookup, then repeat — a per-ROW lookup was pure
            # Python cost over every row of every partition (measured as a
            # big slice of the salted overhead)
            base_run = np.fromiter(
                # a run's chunk id = chunk of its LAST (always real) row —
                # ghost prefix rows of a run belong to the previous chunk
                (offs.get((ent[s], int(chunk[e - 1])), 0) for s, e in zip(rs, re_)),
                dtype=np.int64,
                count=len(rs),
            )
            local = local + np.repeat(base_run, re_ - rs)
        pdf["gap_s"] = gap
        pdf["session_id"] = local.astype(np.int32)
        out = finish_fn(pdf, starts) if finish_fn is not None else pdf
        if len(out) != n:
            raise ValueError("finish_fn must preserve row count")
        return out.loc[~ghost]

    mode = offsets
    if mode in ("auto", "post"):
        # ---- single-exchange mode: ONE salted pass computes gap/windows and
        # LOCAL session ids; the per-(entity, chunk) boundary counts are then
        # derived FROM THE OUTPUT (max local id per chunk — the count of
        # boundaries in that chunk), prefix-summed into offsets, and applied
        # as a NARROW broadcast map over the materialized features. No
        # second all-to-all. Requires finish_fn to not read session_id
        # (window kernels don't); pass offsets="broadcast"/"copartition" if
        # it does, or if the offset table outgrows the driver. ----
        import pyarrow as pa

        from rp_extract_ray.stages.groupops import grouped_reduce

        feats = partitioned_apply(
            ds,
            lambda pdf, starts: apply_frame(pdf, starts, None),
            entity_col=entity_col, order_cols=(ts_col, turn_col),
            num_partitions=num_partitions, salt=salt, expose_ghost=True,
            metrics_sink=metrics_sink, metrics_stage=metrics_stage,
        ).materialize()  # consumed twice: counts derivation + rebase

        def chunk_counts(b: pa.Table) -> pa.Table:
            ch = (
                b.column(turn_col).to_numpy(zero_copy_only=False).astype(np.int64)
                // chunk_turns
            )
            return pa.table(
                {
                    entity_col: b.column(entity_col),
                    "_chunk_id": pa.array(ch),
                    "n_bounds": b.column("session_id").cast(pa.int64()),
                }
            )

        counts = grouped_reduce(
            feats.map_batches(chunk_counts, batch_format="pyarrow"),
            [entity_col, "_chunk_id"],
            {"n_bounds": ("n_bounds", "max")},
        ).materialize()  # tiny: one row per (entity, chunk)
        # guard BEFORE any driver-side collect: count() on the materialized
        # table is metadata. 'auto' falls back to the distributed two-pass
        # (pass 1's work is redone — the documented price of auto at a scale
        # the caller should have declared); explicit 'post' raises instead.
        n_off = counts.count()
        if n_off > broadcast_limit:
            if mode == "post":
                raise ValueError(
                    f"offset table ({n_off} rows) exceeds broadcast_limit; "
                    "use offsets='copartition' for driver-free delivery"
                )
            # 'auto' past the driver budget: fall THROUGH to the distributed
            # two-pass below, reusing the already-computed counts for its
            # offsets (pass 1's feature work is redone — the price of auto
            # at a scale the caller should have declared up front)
            offsets_ds = _prefix_offsets(counts, entity_col, num_partitions)
            mode = "copartition"
        else:
            off_pdf = _prefix_offsets(counts, entity_col, num_partitions).to_pandas()
            off_map = {
                (e, int(c)): int(o)
                for e, c, o in zip(
                    off_pdf[entity_col], off_pdf["_chunk_id"], off_pdf["offset"]
                )
            }
            ref = ray.put(off_map)

            # pure-arrow rebase (numpy kernel over arrow columns, no pandas
            # hop): a batch_format="pandas" stage here would flip every
            # downstream Dataset.sort in the caller's lineage to pandas
            # shuffle blocks (see partitioned_apply.run_group)
            def rebase(tbl):
                import pyarrow as _pa

                offs = ray.get(ref)
                ent = tbl.column(entity_col).to_numpy(zero_copy_only=False)
                chunk = (
                    tbl.column(turn_col)
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    // chunk_turns
                )
                starts = entity_starts(ent, chunk)
                rs, re_ = run_bounds(starts, len(ent))
                base_run = np.fromiter(
                    (offs.get((ent[s], int(chunk[s])), 0) for s in rs),
                    dtype=np.int64,
                    count=len(rs),
                )
                base = np.repeat(base_run, re_ - rs)
                new_sid = (
                    tbl.column("session_id")
                    .to_numpy(zero_copy_only=False)
                    .astype(np.int64)
                    + base
                ).astype(np.int32)
                i = tbl.column_names.index("session_id")
                return tbl.set_column(
                    i, "session_id", _pa.array(new_sid, _pa.int32())
                )

            # blocks arrive partition-sorted so runs are few; correctness
            # does not depend on contiguity (each contiguous segment looks
            # up its own (entity, chunk) key)
            return feats.map_batches(rebase, batch_format="pyarrow")

    if offsets_ds is None:
        # ``offsets_ds=`` lets a caller supply pass A from a cheaper source
        # (e.g. a pruned direct parquet read) instead of re-running ``ds``'s
        # upstream lineage for the slim (entity, turn, ts) projection
        offsets_ds = session_chunk_offsets(
            ds,
            entity_col=entity_col,
            ts_col=ts_col,
            turn_col=turn_col,
            gap_threshold_s=gap_threshold_s,
            num_partitions=num_partitions,
            chunk_turns=chunk_turns,
        )

    if mode == "broadcast":
        off_pdf = offsets_ds.to_pandas()
        off_map = {
            (e, int(c)): int(o)
            for e, c, o in zip(
                off_pdf[entity_col], off_pdf["_chunk_id"], off_pdf["offset"]
            )
        }
        ref = ray.put(off_map)

        def final(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
            return apply_frame(pdf, starts, ray.get(ref))

        return partitioned_apply(
            ds, final, entity_col=entity_col, order_cols=(ts_col, turn_col),
            num_partitions=num_partitions, salt=salt, expose_ghost=True,
            metrics_sink=metrics_sink, metrics_stage=metrics_stage,
        )

    # ---- co-partitioned offsets: route each row to its (entity, chunk)
    # partition with the SAME salted partitioner, ride the one exchange ----
    def add_part_side(b):
        import pyarrow as pa

        ent_hash = stable_hash(b.column(entity_col).to_numpy(zero_copy_only=False))
        chunk = b.column("_chunk_id").to_numpy(zero_copy_only=False).astype(np.int64)
        part = _chunk_part(ent_hash, chunk, num_partitions)
        return b.append_column(PART_COL, pa.array(part, pa.int32()))

    side = offsets_ds.map_batches(add_part_side, batch_format="pyarrow")

    def final_side(pdf: pd.DataFrame, starts: np.ndarray, side_pdf: pd.DataFrame) -> pd.DataFrame:
        offs = {
            (e, int(c)): int(o)
            for e, c, o in zip(
                side_pdf[entity_col], side_pdf["_chunk_id"], side_pdf["offset"]
            )
        }
        return apply_frame(pdf, starts, offs)

    return partitioned_apply(
        ds, final_side, entity_col=entity_col, order_cols=(ts_col, turn_col),
        num_partitions=num_partitions, salt=salt, expose_ghost=True,
        side=side, side_cols=("_chunk_id", "offset"),
        metrics_sink=metrics_sink, metrics_stage=metrics_stage,
    )


def sessionize_salted(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    turn_col: str = "turn_idx",
    gap_threshold_s: float = DEFAULT_SESSION_GAP_S,
    num_partitions: int = 64,
    chunk_turns: int = 4096,
    offsets: str = "auto",
    broadcast_limit: int = 5_000_000,
) -> Dataset:
    """Sessionize under salted chunking — the skew-proof path. Thin wrapper
    over :func:`salted_session_apply` with no fused feature work."""
    return salted_session_apply(
        ds,
        None,
        entity_col=entity_col,
        ts_col=ts_col,
        turn_col=turn_col,
        gap_threshold_s=gap_threshold_s,
        num_partitions=num_partitions,
        chunk_turns=chunk_turns,
        overlap=1,
        offsets=offsets,
        broadcast_limit=broadcast_limit,
    )



def cohort_retention(
    ds,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    num_partitions: int | None = None,
):
    """Cohort retention matrix: entities grouped by their FIRST-activity week
    (Monday-truncated, == SQL ``date_trunc('week')``), counted once per week
    they are active. Output: one row per (cohort, week_offset) with the
    distinct-entity count — the engagement-curation report shape.

    Scale design: ONE entity-hash exchange co-locates each entity's rows
    (same partitioner as sessionize above); inside the partition a vectorized
    kernel finds the first ts per run and the entity's distinct active weeks,
    emitting <= weeks-per-entity rows; a second, tiny ``groupby`` merges the
    per-partition (cohort, offset) partial counts. Entity distinctness is
    exact by construction (each entity lives in exactly one partition).
    """
    import numpy as np
    import pandas as pd

    from rp_extract_ray.schema import DEFAULT_NUM_PARTITIONS
    from rp_extract_ray.stages.partition import partitioned_apply

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        ts = pdf[ts_col]
        week = ts.dt.normalize() - pd.to_timedelta(ts.dt.weekday, unit="D")
        ent = pdf[entity_col].to_numpy()
        n = len(pdf)
        run_id = np.zeros(n, dtype=np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        d = pd.DataFrame({"_r": run_id, "_wk": week.to_numpy()})
        # first ts per run == min week (frame arrives ts-sorted per entity)
        cohort = d.groupby("_r", sort=False)["_wk"].transform("first")
        pairs = pd.DataFrame(
            {
                "cohort": cohort.to_numpy(),
                "week_offset": (
                    (d["_wk"].to_numpy() - cohort.to_numpy())
                    / np.timedelta64(7, "D")
                ).astype(np.int64),
                "_e": ent,
            }
        ).drop_duplicates(["_e", "week_offset"])
        out = (
            pairs.groupby(["cohort", "week_offset"], sort=False)
            .size()
            .reset_index(name="n_users")
        )
        out["n_users"] = out["n_users"].astype(np.int64)
        return out

    partial = partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=(ts_col,),
        num_partitions=num_partitions or DEFAULT_NUM_PARTITIONS,
    )
    from rp_extract_ray.stages.groupops import grouped_reduce

    return grouped_reduce(
        partial, ["cohort", "week_offset"], {"n_users": ("n_users", "sum")},
        combine_first=False,
    )


def flatten_ordered(
    ds,
    *,
    entity_col: str = "conv_id",
    value_col: str = "text",
    order_cols=("ts", "turn_idx"),
    sep: str = "\n",
    out_col: str = "flat",
    num_partitions: int | None = None,
):
    """Ordered per-entity flatten: concatenate ``value_col`` over each
    entity's rows in ``order_cols`` order with ``sep`` — the
    conversation-render step (turn stream -> one document per conversation)
    that feeds conversation-level dedup/quality; SQL ``string_agg(...
    ORDER BY ...)``.

    One entity-hash exchange (the shared partitioner); the concat runs as a
    single pandas groupby-join per partition. Output: one row per entity
    ``(entity_col, out_col, n_rows)``.
    """
    import numpy as np
    import pandas as pd

    from rp_extract_ray.schema import DEFAULT_NUM_PARTITIONS
    from rp_extract_ray.stages.partition import partitioned_apply

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        g = pdf.groupby(entity_col, sort=False)[value_col]
        # skip nulls like SQL string_agg (never render 'nan'/'None'); an
        # all-null group yields NULL, again matching string_agg
        out = g.agg(
            lambda s: sep.join(s.dropna().astype(str)) if s.notna().any() else None
        ).reset_index(name=out_col)
        out["n_rows"] = g.size().to_numpy().astype(np.int64)
        return out

    return partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=order_cols,
        num_partitions=num_partitions or DEFAULT_NUM_PARTITIONS,
    )
