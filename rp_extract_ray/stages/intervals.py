"""Per-entity interval overlap-merge (gaps-and-islands).

The interval dual of sessionization (stages/session.py): instead of gapping
POINT events, coalesce a set of [start, end] INTERVALS per entity into
maximal overlapping unions — the standard shape for merging detector spans,
speech/tool-activity segments, or validity windows before a range join.
Absent from the reference (its segmentation is fixed-stride windows,
rp_extract.py:453-466) and from Ray Data's operator surface.

Scale design: ONE entity-hash exchange (``partitioned_apply`` — the same
partitioner every temporal stage reuses), then a fully vectorized
gaps-and-islands kernel per partition: segmented running-max of ``end``
(C-level pandas groupby cummax over run ids), island breaks where
``start > prev_max``, and one groupby-min/max/count over island ids. No
per-row Python; output volume = number of merged islands <= input rows.

Touching intervals merge (``start == prev_end`` joins — the closed-interval
convention, matching the SQL ``start_ts > prev_max`` break test).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset

from rp_extract_ray.schema import DEFAULT_NUM_PARTITIONS
from rp_extract_ray.stages.partition import partitioned_apply


def merge_intervals(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    count_alias: str = "n_merged",
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> Dataset:
    """Coalesce overlapping/touching ``[start_col, end_col]`` intervals per
    entity. Output: one row per island with columns
    ``(entity_col, start_col=min start, end_col=max end, count_alias)``.
    Intervals whose ``end < start`` are treated as points at ``start``
    (end clamped up), keeping the running-max monotone argument valid."""

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame(
                {
                    entity_col: pdf[entity_col],
                    start_col: pdf[start_col],
                    end_col: pdf[end_col],
                    count_alias: pd.Series([], dtype=np.int64),
                }
            )
        s = pdf[start_col].to_numpy()
        e = np.maximum(pdf[end_col].to_numpy(), s)
        is_run_start = np.zeros(n, dtype=bool)
        is_run_start[starts] = True
        run_id = np.cumsum(is_run_start)
        # segmented running max of end, then shift within run -> prev_max
        cm = pd.Series(e).groupby(run_id, sort=False).cummax().to_numpy()
        prev_max = np.empty(n, dtype=e.dtype)
        prev_max[1:] = cm[:-1]
        brk = is_run_start | (s > prev_max)
        island = np.cumsum(brk) - 1
        out = pd.DataFrame(
            {entity_col: pdf[entity_col].to_numpy(), "_s": s, "_e": e,
             "_i": island}
        )
        g = out.groupby("_i", sort=False).agg(
            **{
                entity_col: (entity_col, "first"),
                start_col: ("_s", "first"),   # sorted: first == min
                end_col: ("_e", "max"),
                count_alias: ("_e", "size"),
            }
        ).reset_index(drop=True)
        g[count_alias] = g[count_alias].astype(np.int64)
        return g

    return partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=(start_col, end_col),
        num_partitions=num_partitions,
    )
