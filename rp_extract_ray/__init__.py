"""rp_extract_ray — a Ray-Data-native point-in-time feature-engineering engine.

A from-scratch re-expression of the capabilities of tuwien-musicir/rp_extract
(reference at /root/reference, cited per-file in docstrings) over Parquet tables
of multi-turn conversation transcripts::

    (conv_id: string, turn_idx: int32, role: string,
     text: string, tool: string, ts: timestamp[us])

Everything is a ``ray.data.Dataset`` pipeline: stateless vectorized
``map_batches`` for narrow transforms, conversation-partitioned sorted
``groupby(...).map_groups`` for temporal logic (windows, lag/lead, as-of,
sessions), actor pools for stateful stages. No module in this package calls
``ray.init()`` — sessions are owned by the caller (bench.py, tests, driver).
"""

from rp_extract_ray.schema import TRANSCRIPT_SCHEMA, STAT_NAMES

__all__ = ["TRANSCRIPT_SCHEMA", "STAT_NAMES"]
__version__ = "0.1.0"
