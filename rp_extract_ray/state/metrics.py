"""Per-partition lineage + metrics sidecar (north-rule requirement).

Analogue of the reference's audio-metadata and error logs (W8,
/root/reference/rp_extract_batch.py:312-320, 410-425): every partition task
emits one metrics row — rows in/out, wall-time, content checksum, error
count — into a sidecar collected alongside the data. The engine keeps
record-level error isolation the way the reference does (log-and-continue
per file): a failing conversation is recorded, the partition keeps going.

Implementation: a Ray actor accumulates rows (cheap: one small row per
partition, not per record); ``drain()`` returns a DataFrame the driver writes
next to the output (``_metrics.parquet``)."""

from __future__ import annotations

import time

import pandas as pd

import ray


@ray.remote(num_cpus=0)
class MetricsSink:
    """Tiny accumulator actor: one append per PARTITION, never per row."""

    def __init__(self):
        self.rows: list[dict] = []

    def add(self, row: dict) -> None:
        self.rows.append(row)

    def add_many(self, rows: list[dict]) -> None:
        self.rows.extend(rows)

    def drain(self) -> list[dict]:
        out, self.rows = self.rows, []
        return out


class PartitionMetrics:
    """Context helper used inside partition fns to time + checksum output."""

    def __init__(self, part_id, stage: str):
        self.part_id = part_id
        self.stage = stage
        self.t0 = time.perf_counter()
        self.errors = 0
        self.error_keys: list[str] = []

    def record_error(self, key: str) -> None:
        self.errors += 1
        if len(self.error_keys) < 20:  # bounded
            self.error_keys.append(str(key))

    def row(self, rows_in: int, rows_out: int, checksum: int = 0) -> dict:
        return {
            "stage": self.stage,
            "part_id": int(self.part_id),
            "rows_in": int(rows_in),
            "rows_out": int(rows_out),
            "wall_s": round(time.perf_counter() - self.t0, 6),
            "checksum": int(checksum) & 0x7FFFFFFFFFFFFFFF,
            "errors": int(self.errors),
            "error_keys": ",".join(self.error_keys),
        }


def frame_checksum(pdf: pd.DataFrame, cols=None) -> int:
    """Order-insensitive content checksum of selected columns."""
    cols = list(cols or pdf.columns)
    return int(pd.util.hash_pandas_object(pdf[cols], index=False).sum())


def drain_metrics(sink) -> pd.DataFrame:
    rows = ray.get(sink.drain.remote())
    return pd.DataFrame(rows)
