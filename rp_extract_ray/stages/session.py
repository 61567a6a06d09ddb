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
it is NOT causal-bounded — run it unsalted (whole conversations per
partition), or pre-split skewed convs with the two-pass chunk-offset path
(state/checkpoint.py discussion).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset

from rp_extract_ray.schema import DEFAULT_SESSION_GAP_S
from rp_extract_ray.stages.lag import gap_seconds
from rp_extract_ray.stages.partition import entity_starts, partitioned_apply


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
