"""Multi-level aggregation: GROUPING SETS / ROLLUP / CUBE.

Not in Ray Data's aggregate surface and absent from the reference (its
aggregations are single-level per-class counts, classes_io.py-style per
SURVEY.md §2.6); the multi-level form is the standard curation-report shape
(per source × language counts plus per-source and global totals in one pass).

Scale design: every grouping set is expanded INSIDE ``map_batches`` — each
batch emits one combined partial row per (set, key-combination) with
rolled-up key positions filled by a sentinel label — so the single
``groupby(all keys)`` exchange carries per-block partials whose volume is
bounded by the key-combination cardinality, never the input rows. One
shuffle total for ALL levels; the naive alternative (one groupby per set)
is len(sets) full exchanges. Count/sum partials merge additively, so the
result is partition-invariant up to float-sum ordering (outputs are rounded
by callers, same policy as pipelines/relational.py).
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset


def grouping_sets_aggregate(
    ds: Dataset,
    sets: Sequence[Sequence[str]],
    *,
    sum_cols: Mapping[str, str] | None = None,
    count_alias: str = "n",
    total_label: str = "ALL",
) -> Dataset:
    """Aggregate ``ds`` over every grouping set in ``sets`` in one pass.

    ``sets`` — e.g. ``[("a","b"), ("a",), ()]`` (= ROLLUP(a, b)). All
    grouping columns must be string-typed: rolled-up positions carry
    ``total_label`` (callers guarantee the label is not a live key value —
    the SQL COALESCE convention). ``sum_cols`` maps output alias -> numeric
    input column; ``count_alias`` is the per-group row count. Output: one
    row per (set, key-combination) with columns = union of grouping columns
    + aliases.
    """
    sum_cols = dict(sum_cols or {})
    all_keys: list[str] = []
    for s in sets:
        for c in s:
            if c not in all_keys:
                all_keys.append(c)
    set_lists = [list(s) for s in sets]

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = {a: pdf[c].to_numpy(dtype=np.float64) for a, c in sum_cols.items()}
        frames = []
        for keys in set_lists:
            # build on an explicit index so a sum_cols-free frame still has
            # len(pdf) rows (count-only CUBE/ROLLUP)
            out = pd.DataFrame(vals, index=np.arange(len(pdf)))
            out[count_alias] = np.int64(1)
            if keys:
                for k in keys:
                    out[k] = pdf[k].to_numpy()
                g = out.groupby(keys, sort=False, as_index=False, dropna=False).sum()
            else:
                g = out.sum().to_frame().T
                g[count_alias] = g[count_alias].astype(np.int64)
            for k in all_keys:
                if k not in keys:
                    g[k] = total_label
            frames.append(g[[*all_keys, *sum_cols, count_alias]])
        return pd.concat(frames, ignore_index=True)

    from rp_extract_ray.stages.groupops import grouped_reduce

    from rp_extract_ray.stages.partition import arrow_out

    parts = ds.map_batches(
        lambda b: arrow_out(partial(b.to_pandas())), batch_format="pyarrow"
    )
    how = {a: (a, "sum") for a in sum_cols}
    how[count_alias] = (count_alias, "sum")
    return grouped_reduce(parts, all_keys, how, combine_first=False)


def rollup_aggregate(ds: Dataset, cols: Sequence[str], **kw) -> Dataset:
    """ROLLUP(c1, .., cn): prefixes (c1..cn), (c1..cn-1), .., ()."""
    cols = list(cols)
    return grouping_sets_aggregate(
        ds, [cols[:i] for i in range(len(cols), -1, -1)], **kw
    )


def cube_aggregate(ds: Dataset, cols: Sequence[str], **kw) -> Dataset:
    """CUBE(c1, .., cn): all 2^n subsets (n is small by construction)."""
    cols = list(cols)
    subsets = []
    for mask in range((1 << len(cols)) - 1, -1, -1):
        subsets.append([c for i, c in enumerate(cols) if mask >> i & 1])
    return grouping_sets_aggregate(ds, subsets, **kw)
