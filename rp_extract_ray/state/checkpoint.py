"""Checkpointed, resumable partitioned output.

The Ray-native re-design of the reference's resume machinery (SURVEY.md §4):
the reference appends feature rows with per-row flush and resumes by
anti-joining the input file list against ids already in the output
(J4, /root/reference/rp_extract_batch.py:241-264; append mode
/root/reference/rp_feature_io.py:57,133-138).

Here: output is a directory of per-partition Parquet files written
ATOMICALLY (tmp file + rename) plus a ``_manifest.json`` of completed
partition ids. Resume = skip completed partitions (the anti-join is against
the manifest, not the data — O(partitions), not O(rows)). A final
``_metrics.parquet`` sidecar carries per-partition lineage
(state/metrics.py).

This is the 100 TB answer to "a 30-hour job died at hour 29": only the
partitions missing from the manifest recompute."""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from ray.data import Dataset

from rp_extract_ray.stages.partition import PART_COL, _add_part

MANIFEST = "_manifest.json"


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, MANIFEST)


def completed_partitions(out_dir: str) -> set[int]:
    """Union of per-partition ``.done`` markers and any summary manifest.

    Markers are one file per partition so concurrent partition tasks never
    contend (a shared JSON would race read-modify-write across workers /
    nodes)."""
    done: set[int] = set()
    try:
        for f in os.listdir(out_dir):
            if f.startswith("part-") and f.endswith(".done"):
                done.add(int(f[5:10]))
    except FileNotFoundError:
        pass
    try:
        with open(_manifest_path(out_dir)) as f:
            done |= set(json.load(f)["completed"])
    except (FileNotFoundError, json.JSONDecodeError, KeyError):
        pass
    return done


def _mark_complete(out_dir: str, part_id: int) -> None:
    tmp = os.path.join(out_dir, f".tmp.done.{os.getpid()}.{part_id}")
    with open(tmp, "w") as f:
        f.write("ok")
    os.replace(tmp, os.path.join(out_dir, f"part-{part_id:05d}.done"))


def write_partitioned(
    ds: Dataset,
    out_dir: str,
    *,
    entity_col: str = "conv_id",
    num_partitions: int = 64,
    resume: bool = True,
) -> dict:
    """Write ``ds`` as one Parquet file per hash partition of ``entity_col``.

    On resume, rows belonging to already-completed partitions are filtered
    out BEFORE any work (upstream stages still stream, but their output for
    finished partitions is dropped at the partitioning map — at scale, pair
    this with reading only unfinished input shards).
    Returns {"written": [...], "skipped": [...]}.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = completed_partitions(out_dir) if resume else set()

    parted = ds.map_batches(
        _add_part,
        batch_format="pyarrow",
        fn_kwargs={"entity_col": entity_col, "num_partitions": num_partitions, "salt": None},
    )
    if done:
        done_arr = pa.array(sorted(done), pa.int32())

        def drop_done(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(pc.invert(pc.is_in(b.column(PART_COL), value_set=done_arr)))

        parted = parted.map_batches(drop_done, batch_format="pyarrow")

    def write_group(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return pa.table({"part_id": pa.array([], pa.int32()), "rows": pa.array([], pa.int64())})
        part_id = int(b.column(PART_COL)[0].as_py())
        out = b.drop_columns([PART_COL])
        path = os.path.join(out_dir, f"part-{part_id:05d}.parquet")
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(out, tmp)
        os.replace(tmp, path)  # atomic publish
        _mark_complete(out_dir, part_id)
        return pa.table(
            {"part_id": pa.array([part_id], pa.int32()), "rows": pa.array([len(out)], pa.int64())}
        )

    report = (
        parted.groupby(PART_COL)
        .map_groups(write_group, batch_format="pyarrow")
        .to_pandas()
    )
    # the full input stream was consumed -> job complete (empty partitions
    # legitimately have no file); record the terminal flag for compute_or_load
    final = {"completed": sorted(completed_partitions(out_dir)), "complete": True}
    tmp = _manifest_path(out_dir) + ".tmp.final"
    with open(tmp, "w") as f:
        json.dump(final, f)
    os.replace(tmp, _manifest_path(out_dir))
    return {
        "written": sorted(int(p) for p in report.get("part_id", pd.Series(dtype=int))),
        "skipped": sorted(done),
        "rows_written": int(report["rows"].sum()) if len(report) else 0,
    }


def compute_or_load(
    out_dir: str,
    make_dataset,
    *,
    entity_col: str = "conv_id",
    num_partitions: int = 64,
):
    """Compute-or-read-cache dispatch (S18 analogue,
    /root/reference/rp_feature_io.py:695-745): if ``out_dir`` holds a
    complete partitioned output (terminal manifest flag), read it back;
    otherwise run ``make_dataset()`` and write it (resuming any partial
    progress)."""
    try:
        with open(_manifest_path(out_dir)) as f:
            if json.load(f).get("complete"):
                return read_partitioned(out_dir)
    except (FileNotFoundError, json.JSONDecodeError):
        pass
    write_partitioned(
        make_dataset(), out_dir, entity_col=entity_col, num_partitions=num_partitions
    )
    return read_partitioned(out_dir)


def read_partitioned(out_dir: str):
    """Read back a partitioned output directory (excluding sidecars)."""
    from rp_extract_ray.sources.pqio import read_parquet_clean

    files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.startswith("part-") and f.endswith(".parquet")
    )
    return read_parquet_clean(files)
