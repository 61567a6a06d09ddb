"""Production backfill job — the `ray job submit` entry point.

Composes the whole north-rule pipeline: validate -> payload-light windowed
feature backfill (+ as-of join) -> checkpointed partitioned Parquet output
with per-partition lineage metrics sidecar. Re-running after a crash skips
completed partitions.

Usage (single node; on a cluster submit with `ray job submit -- python
tools/run_backfill.py ...`):

    python tools/run_backfill.py --input /tmp/corpus/transcripts \
        --events /tmp/corpus/conv_events.parquet --output /tmp/backfill_out \
        [--k 16] [--partitions 128] [--num-cpus 32]

This script OWNS its Ray session (guarded init); the library never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcript parquet file or shard dir")
    ap.add_argument("--events", default=None, help="as-of right-side parquet")
    ap.add_argument("--output", required=True, help="partitioned output dir")
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--partitions", type=int, default=128)
    ap.add_argument("--num-cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--session-gap-s", type=float, default=1800.0)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--salt-chunk-turns", type=int, default=None)
    ap.add_argument(
        "--generic-write",
        action="store_true",
        help="use the hash-partitioned write_partitioned sink instead of the "
        "shard-aligned sink (costs a second full-payload exchange; kept for "
        "outputs that must be co-located by conv_id hash)",
    )
    args = ap.parse_args()

    if os.path.isdir(args.input):
        shards = sorted(
            os.path.join(args.input, f)
            for f in os.listdir(args.input)
            if f.endswith(".parquet")
        )
    else:
        shards = [args.input]

    skip: set[int] = set()
    if not args.generic_write:
        os.makedirs(args.output, exist_ok=True)
        if not args.no_resume:
            done_files = {
                f[:-5] for f in os.listdir(args.output) if f.endswith(".done")
            }
            for i, p in enumerate(shards):
                base = os.path.splitext(os.path.basename(p))[0]
                if f"part-{base}.parquet" in done_files:
                    skip.add(i)
        if len(skip) == len(shards):
            # every shard already written + marked: nothing to do — exit
            # BEFORE paying ray.init and the full feature recompute
            print(json.dumps({
                "rows_written": 0,
                "partitions_written": 0,
                "partitions_skipped": len(skip),
                "wall_s": 0.0,
                "rows_per_sec": None,
                "output": args.output,
            }))
            return 0

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    import ray.data as rd
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    # measured: the executor's per-operator resource reservation idles
    # reserved slots in this map->exchange->map->exchange pipeline (see
    # bench._tune_context); GRAFT_OP_RESERVATION=1 restores the default
    if os.environ.get("GRAFT_OP_RESERVATION", "0") != "1":
        ctx.op_resource_reservation_enabled = False

    from rp_extract_ray.pipelines.flagship import feature_backfill_payload_light
    from rp_extract_ray.state.checkpoint import write_partitioned
    from rp_extract_ray.state.metrics import MetricsSink, drain_metrics

    events = rd.read_parquet(args.events) if args.events else None

    sink = MetricsSink.remote()
    t0 = time.perf_counter()
    if args.generic_write:
        ds = feature_backfill_payload_light(
            shards,
            events,
            k=args.k,
            session_gap_s=args.session_gap_s,
            num_partitions=args.partitions,
            metrics_sink=sink,
            salt_chunk_turns=args.salt_chunk_turns,
        )
        report = write_partitioned(
            ds, args.output, num_partitions=args.partitions, resume=not args.no_resume
        )
    else:
        # shard-aligned sink: one output file per input shard, written inside
        # the rejoin task — the full-payload result never re-enters an
        # exchange. Resume (skip computed above, before ray.init) = shards
        # whose .done marker exists skip their payload re-read + write
        # (features still recompute: conversations span shards).
        rep = feature_backfill_payload_light(
            shards,
            events,
            k=args.k,
            session_gap_s=args.session_gap_s,
            num_partitions=args.partitions,
            metrics_sink=sink,
            salt_chunk_turns=args.salt_chunk_turns,
            sink_dir=args.output,
            skip_shards=skip,
        ).to_pandas()  # tiny: one report row per written shard file
        report = {
            "written": sorted(int(s) for s in rep.get("shard", [])),
            "skipped": sorted(skip),
            "rows_written": int(rep["rows"].sum()) if len(rep) else 0,
        }
    wall = time.perf_counter() - t0

    metrics = drain_metrics(sink)
    if len(metrics):
        metrics.to_parquet(os.path.join(args.output, "_metrics.parquet"))
    summary = {
        "rows_written": report["rows_written"],
        "partitions_written": len(report["written"]),
        "partitions_skipped": len(report["skipped"]),
        "wall_s": round(wall, 2),
        "rows_per_sec": round(report["rows_written"] / wall, 1) if wall else None,
        "output": args.output,
    }
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
