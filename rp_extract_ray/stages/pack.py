"""Sequence packing: assign documents to fixed token-budget training packs.

The training-data op that turns a curated corpus into packed model examples:
under a STABLE global document order, documents are laid end-to-end and cut
into packs of ``budget`` tokens — ``pack_id = floor(exclusive_prefix_tokens
/ budget)`` (contiguous token-bucket packing; a document whose tokens strad-
dle a boundary starts the next pack's budget accounting but keeps ONE pack
id — deterministic, order-stable, and exactly replicable in SQL with a
window cumsum, which is what the oracle does). No reference counterpart
(SURVEY.md §2 maps no packing op); this is part of the LLM-pipeline surface
the engine adds.

Scale design — a global ordered prefix sum in two cheap passes, the same
re-merge shape as the salted session offsets (stages/session.py):

1. range-partition by ``id_col`` (``range_partition_bounds``: deterministic
   sampled bounds, so partitions are globally ordered key ranges);
2. per-partition token TOTALS via one ``grouped_reduce`` over just
   ``(part, tokens)`` — sums need no ordering, so this pass never sorts;
   the P totals prefix-sum into per-partition offsets on the driver
   (P values, broadcast);
3. ONE keyed exchange co-locates each range partition; inside, a vectorized
   sort by ``id_col`` + exclusive cumsum + the partition offset assigns
   ``pack_id``.

Nothing materializes driver-side except P floats; shuffle volume is the
pruned ``(id, tokens)`` pair per row plus whatever columns the caller kept.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from rp_extract_ray.stages.partition import (
    RANGE_PART_COL,
    add_range_part,
    range_partition_bounds,
)


def pack_sequences(
    ds: Dataset,
    *,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 512,
    num_partitions: int = 32,
    sample_rate: float = 0.2,
    seed: int = 1,
) -> Dataset:
    """Append ``pack_id`` (int64) under stable ``id_col`` order.

    ``pack_id = floor(exclusive_prefix_sum(token_col ordered by id_col) /
    budget)`` — SQL twin: ``CAST(FLOOR(COALESCE(SUM(tok) OVER (ORDER BY id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / budget) AS
    BIGINT)``. Output columns: ``(id_col, token_col, pack_id)``.
    """
    # the slim (id, tokens) projection is consumed THREE times (bounds
    # sample, totals, final assign) — materialize it once so the caller's
    # upstream lineage (e.g. regex token counting over the full text) runs
    # exactly once; 16 B/row in the object store, spillable
    slim = ds.select_columns([id_col, token_col]).materialize()
    bounds = range_partition_bounds(
        slim, id_col, num_partitions, sample_rate=sample_rate, seed=seed
    )
    parted = add_range_part(slim, id_col, bounds)

    # pass 1: per-partition token totals (order-free -> no sort, map-side
    # combined); P rows to the driver, exclusive-prefix into offsets
    from rp_extract_ray.stages.groupops import grouped_reduce

    totals = grouped_reduce(
        parted.select_columns([RANGE_PART_COL, token_col]),
        RANGE_PART_COL,
        {"tot": (token_col, "sum")},
    ).to_pandas()
    offsets = np.zeros(num_partitions + 1, dtype=np.int64)
    for p, t in zip(totals[RANGE_PART_COL], totals["tot"]):
        offsets[int(p) + 1] = int(t)
    offsets = np.cumsum(offsets)  # offsets[p] = tokens in all earlier parts
    off_ref = ray.put(offsets)

    # pass 2: the one exchange; vectorized assign inside each range partition
    def assign(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.schema(
                [
                    group.schema.field(id_col),
                    group.schema.field(token_col),
                    pa.field("pack_id", pa.int64()),
                ]
            ).empty_table()
        part = int(group.column(RANGE_PART_COL)[0].as_py())
        group = group.drop_columns([RANGE_PART_COL]).sort_by(
            [(id_col, "ascending")]
        )
        tok = group.column(token_col).to_numpy(zero_copy_only=False).astype(np.int64)
        excl = np.concatenate([[0], np.cumsum(tok)[:-1]]) + ray.get(off_ref)[part]
        return group.append_column("pack_id", pa.array(excl // budget))

    return parted.groupby(RANGE_PART_COL).map_groups(assign, batch_format="pyarrow")


def pack_stats(
    ds: Dataset,
    *,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 512,
    num_partitions: int = 32,
) -> Dataset:
    """Per-pack utilization report: (pack_id, n_docs, tok_sum). The packing
    QA table — budget overflow/underflow distribution at a glance. One extra
    tiny keyed reduction over the packed output."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    packed = pack_sequences(
        ds, token_col=token_col, id_col=id_col, budget=budget,
        num_partitions=num_partitions,
    )
    return grouped_reduce(
        packed,
        "pack_id",
        {"n_docs": (id_col, "count"), "tok_sum": (token_col, "sum")},
    )
