"""Distributed 2-D skyline (Pareto frontier).

Keep every row not dominated by another: with objectives (minimize ``x``,
maximize ``y``), row *r* is dominated iff some *s* has ``s.x <= r.x`` and
``s.y >= r.y`` with at least one strict. The classic multi-criteria
shortlist op (cheapest-and-freshest, earliest-and-highest-value) — absent
from Ray Data's surface and from the reference (whose argmax family,
SURVEY.md §2.7, is the 1-D special case).

Scale design rests on the skyline algebra: ``skyline(A ∪ B) ==
skyline(skyline(A) ∪ skyline(B))`` — dominance is witness-independent, so
local pruning never discards a global-skyline row and never protects a
dominated one (any dominator in another block still dominates at the
merge). Two stages:

1. per-block prune (``map_batches``, the vectorized kernel below) — on
   continuous data a block's skyline is ~O(log n) rows, so the surviving
   set is tiny regardless of input size;
2. one single-partition merge running the SAME kernel over the
   concatenated survivors (``repartition(1)`` + whole-block batch). The
   merge input is the sum of per-block skylines — bounded in practice; a
   pathological corpus whose skyline IS the dataset (anti-correlated x/y)
   degrades to a single-node sort, which is also the information-theoretic
   answer for that corpus (the output itself is that large).

Kernel (no Python row loop): sort by (x asc, y desc); a row survives iff
its y equals its x-group's max (first y of the group after the sort) AND
strictly exceeds every earlier group's max (exclusive running maximum).
Equal (x, y) duplicates dominate nothing and survive together (SQL NOT
EXISTS semantics). Null x/y rows are dropped (SQL comparison semantics:
they can neither dominate nor be ranked).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


def _skyline_frame(
    pdf: pd.DataFrame, x_col: str, y_col: str
) -> pd.DataFrame:
    pdf = pdf.dropna(subset=[x_col, y_col])
    if len(pdf) == 0:
        return pdf
    pdf = pdf.sort_values(
        [x_col, y_col], ascending=[True, False], kind="mergesort",
        ignore_index=True,
    )
    x = pdf[x_col].to_numpy()
    y = pdf[y_col].to_numpy(dtype=np.float64)
    new_grp = np.ones(len(pdf), dtype=bool)
    new_grp[1:] = x[1:] != x[:-1]
    grp_id = np.cumsum(new_grp) - 1
    gmax = y[new_grp]  # first y per x-group == group max (y sorted desc)
    # exclusive prefix max over earlier groups' maxes
    prev = np.empty_like(gmax)
    prev[0] = -np.inf
    if len(gmax) > 1:
        np.maximum.accumulate(gmax[:-1], out=prev[1:])
    keep = (y == gmax[grp_id]) & (y > prev[grp_id])
    return pdf[keep]


def skyline_2d(
    ds: Dataset,
    *,
    x_col: str,
    y_col: str,
) -> Dataset:
    """Rows on the (min ``x_col``, max ``y_col``) Pareto frontier.

    Other orientations reduce to this one by negating a column upstream.
    Output keeps all input columns; row order is not defined (consumers
    sort or aggregate, like every other unordered stage here).
    """

    def local(b: pa.Table) -> pa.Table:
        out = _skyline_frame(b.to_pandas(), x_col, y_col)
        t = pa.Table.from_pandas(out, schema=b.schema, preserve_index=False)
        return t.replace_schema_metadata(None)

    pruned = ds.map_batches(local, batch_format="pyarrow")
    # global merge: survivors are tiny (see module docstring) — one block,
    # one whole-block pass of the same kernel; no driver materialization
    return pruned.repartition(1).map_batches(
        local, batch_format="pyarrow", batch_size=None
    )
