"""Parquet read wrapper: strip file-embedded schema metadata.

Pandas-written parquet files (the driver's testdata included) embed a
``b'pandas'`` metadata blob in the file schema. In this pyarrow version
``hash(schema)`` raises ``unhashable type: 'dict'`` on such schemas, so every
Ray Data stage that unifies block schemas (reads, shuffles, reduces) logs a
noisy "Failed to hash the schemas (for deduplication)" warning per task.
Passing an explicit metadata-free ``schema=`` to ``read_parquet`` makes every
downstream block carry a clean, hashable schema. Companion to
``stages.partition.strip_meta`` (which cleans tables we build from pandas).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd
from ray.data import Dataset


def read_parquet_clean(paths, *, columns=None, **kwargs) -> Dataset:
    """``ray.data.read_parquet`` with a metadata-stripped explicit schema.

    ``paths`` may be one path or a list; the schema is probed from the first
    file and projected to ``columns``. Falls back to a plain read when the
    schema probe fails (e.g. directory inputs with hive partition columns,
    which live outside the file schema)."""
    import os

    import pyarrow.parquet as pq

    def files_in(p):
        # flat shard directory → its sorted .parquet files (hive-partitioned
        # dirs fail the probe below and fall back — partition cols aren't in
        # the file schema, so an explicit schema= would drop them)
        if isinstance(p, str) and os.path.isdir(p):
            inner = sorted(
                f for f in os.listdir(p) if f.endswith(".parquet")
            )
            return [os.path.join(p, f) for f in inner] or [p]
        return [p]

    if isinstance(paths, (list, tuple)):
        # probe the FIRST file of the first path and the LAST file of the
        # last path, so cross-directory schema evolution is caught too
        first = files_in(paths[0])[0]
        last = files_in(paths[-1])[-1]
    else:
        inner = files_in(paths)
        first, last = inner[0], inner[-1]
    if last == first:
        last = None
    try:
        s = pq.read_schema(first).remove_metadata()
        if last is not None and last != first:
            # heterogeneous-shard guard: schema evolution usually shows
            # between the OLDEST and NEWEST shard — if the probe doesn't
            # hold for the last file too, fall back to the plain read,
            # whose reader unifies schemas instead of silently coercing
            # every shard to the first file's (two footer reads, no scan)
            if pq.read_schema(last).remove_metadata() != s:
                raise ValueError("shard schemas differ")
        if columns is not None:
            s = pa.schema([s.field(c) for c in columns])
        kwargs["schema"] = s
    except Exception:
        pass
    return rd.read_parquet(paths, columns=columns, **kwargs)
