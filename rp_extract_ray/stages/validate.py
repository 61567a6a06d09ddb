"""Input validation invariants (reference runtime invariants, SURVEY.md §5-3).

``validate_transcripts`` enforces, distributed:
* duplicate ``(entity, turn)`` keys are rejected
  (/root/reference/rp_feature_io.py:274-284 — the reference fails on
  duplicate feature ids; FIXTURES.md F4 requires rejection);
* ``ts`` monotone non-decreasing along ``turn_idx`` within an entity
  (the ordering assumption every temporal stage relies on).

Runs as one entity-partitioned pass; each partition checks its own whole
conversations, so the checks are exact, not per-batch approximations. On
violation the partition task raises (fail-fast like the reference) or, with
``errors='drop'``, keeps the first row per key and drops the rest, counting
drops in the metrics sidecar if one is attached.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

from rp_extract_ray.stages.partition import partitioned_apply


def validate_transcripts(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    turn_col: str = "turn_idx",
    ts_col: str = "ts",
    errors: str = "raise",  # 'raise' | 'drop'
    num_partitions: int = 64,
    metrics_sink=None,
    require_dense: bool = False,
) -> Dataset:
    """``require_dense=True`` additionally enforces that ``turn_col`` is the
    DENSE 0-based per-conversation ordinal (starts at 0, increments by 1) —
    the precondition of the salted chunker (``SaltSpec``): ghost overlap is
    selected by ``turn % chunk_turns`` positions, so a gappy ordinal would
    under-fill the chunk-border window context SILENTLY. Run this check
    before any ``salt_chunk_turns`` pipeline on untrusted input."""

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        ent = pdf[entity_col].to_numpy()
        turn = pdf[turn_col].to_numpy()
        n = len(pdf)
        if n == 0:
            return pdf
        same_as_prev = np.zeros(n, dtype=bool)
        same_as_prev[1:] = (ent[1:] == ent[:-1]) & (turn[1:] == turn[:-1])
        if same_as_prev.any():
            if errors == "raise":
                bad = pdf.loc[same_as_prev, [entity_col, turn_col]].head(5)
                raise ValueError(
                    f"duplicate ({entity_col}, {turn_col}) keys: "
                    f"{bad.to_records(index=False).tolist()}"
                )
            pdf = pdf.loc[~same_as_prev]
            ent = pdf[entity_col].to_numpy()
        # ts monotone within entity along turn order (frame arrives sorted by
        # (entity, turn) — see order_cols below)
        ts = pdf[ts_col].to_numpy()
        n = len(pdf)
        nonmono = np.zeros(n, dtype=bool)
        nonmono[1:] = (ent[1:] == ent[:-1]) & (ts[1:] < ts[:-1])
        if nonmono.any():
            bad = pdf.loc[nonmono, [entity_col, turn_col]].head(5)
            raise ValueError(
                f"ts decreases along {turn_col} within entity: "
                f"{bad.to_records(index=False).tolist()}"
            )
        if require_dense:
            turn = pdf[turn_col].to_numpy()
            from rp_extract_ray.stages.partition import entity_starts

            st = entity_starts(pdf[entity_col].to_numpy())
            # dense 0-based ordinal: turn[i] == i - run_start(i)
            expect = np.arange(n, dtype=np.int64) - st
            bad_mask = turn.astype(np.int64) != expect
            if bad_mask.any():
                bad = pdf.loc[bad_mask, [entity_col, turn_col]].head(5)
                raise ValueError(
                    f"{turn_col} is not the dense 0-based per-entity ordinal "
                    f"(salted chunking precondition): "
                    f"{bad.to_records(index=False).tolist()}"
                )
        return pdf

    return partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=(turn_col,),
        num_partitions=num_partitions,
        metrics_sink=metrics_sink,
        metrics_stage="validate",
    )
