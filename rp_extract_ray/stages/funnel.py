"""Conversion-funnel extraction over entity event streams.

Per entity, walk an ordered list of step types and record the FIRST time
each step occurs at-or-after the previous step's time:
``t_0 = min ts(step_0)``, ``t_i = min ts(step_i) with ts >= t_{i-1}`` —
the standard product-analytics funnel (strictly chained minimum
timestamps), emitted as one row per entity that reached step 0.

This is the aggregating cousin of the sessionize/window family
(SURVEY.md §2.9 streaming semantics): same ONE entity-hash exchange via
``partitioned_apply``, but the per-partition kernel is a chain of pandas
groupby-mins — no per-entity Python loop, no driver state, and the output
is one row per entity (shrinking, so the exchange dominated by the input
row volume is the only heavy move).

Scale notes: the input is pre-filtered to the step types (column- and
row-pruned before the exchange); per-partition state is bounded by the
partition's own rows; skewed entities are no worse than sessionize on the
same key (salting is unnecessary because the kernel is a groupby-min, not
a window).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from rp_extract_ray.stages.partition import partitioned_apply


def funnel(
    events: Dataset,
    steps: Sequence[str],
    *,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    num_partitions: int | None = None,
) -> Dataset:
    """One row per entity that performed ``steps[0]``: columns
    ``t_<step>`` (first chained occurrence, NaT when the chain stops
    earlier) and ``steps_completed`` (int64)."""
    steps = list(steps)
    assert len(steps) >= 1

    def prune(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.is_in(b.column(type_col), value_set=pa.array(steps)))
        return b.select([entity_col, ts_col, type_col])

    slim = events.map_batches(prune, batch_format="pyarrow")

    def per_partition(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        t_prev = (
            pdf.loc[pdf[type_col] == steps[0]]
            .groupby(entity_col, sort=False)[ts_col]
            .min()
        )
        out = pd.DataFrame(
            {entity_col: t_prev.index.to_numpy(), f"t_{steps[0]}": t_prev.to_numpy()}
        )
        for s in steps[1:]:
            rows = pdf.loc[pdf[type_col] == s, [entity_col, ts_col]]
            bound = rows[entity_col].map(t_prev)
            rows = rows.loc[rows[ts_col] >= bound]
            t_prev = rows.groupby(entity_col, sort=False)[ts_col].min()
            out[f"t_{s}"] = out[entity_col].map(t_prev)
        tcols = [f"t_{s}" for s in steps]
        out["steps_completed"] = out[tcols].notna().sum(axis=1).astype(np.int64)
        return out

    kwargs = {} if num_partitions is None else {"num_partitions": num_partitions}
    return partitioned_apply(
        slim,
        per_partition,
        entity_col=entity_col,
        order_cols=(ts_col,),
        **kwargs,
    )
