"""Single-pass table profiling: per-column row/null counts, min/max/sum.

The data-quality gate every ingest pipeline runs before training jobs
consume a drop. Reference analogue: the per-file consistency checks in
rp_feature_io.py (check_duplicates / check_id_consistency, SURVEY §2.1
S10/S17) generalized to column statistics over arbitrarily large tables.

Scale shape: ONE streaming pass; every block emits a bounded partial
(one row per profiled column — counts, min, max, sum, all associatively
mergeable), and the driver folds ``columns x blocks`` partial rows into
the final ``columns``-row profile. Nothing but the partials ever leaves
the workers; no shuffle at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def profile_columns(ds: Dataset, columns: "list[str]") -> pd.DataFrame:
    """Profile numeric ``columns``: one row each with ``n`` (rows),
    ``nulls``, ``vmin``, ``vmax``, ``vsum``. Values are profiled as
    float64 (SQL aggregate semantics: min/max/sum skip nulls; an all-null
    column yields null min/max and null sum)."""
    cols = list(columns)

    def partial(b: pa.Table) -> pa.Table:
        names, ns, nulls, vmins, vmaxs, vsums = [], [], [], [], [], []
        for c in cols:
            arr = b.column(c)
            names.append(c)
            ns.append(len(arr))
            nulls.append(arr.null_count)
            valid = len(arr) - arr.null_count
            if valid == 0:
                vmins.append(None)
                vmaxs.append(None)
                vsums.append(None)
            else:
                mm = pc.min_max(arr)
                vmins.append(float(mm["min"].as_py()))
                vmaxs.append(float(mm["max"].as_py()))
                vsums.append(float(pc.sum(arr).as_py()))
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n": pa.array(ns, pa.int64()),
                "nulls": pa.array(nulls, pa.int64()),
                "vmin": pa.array(vmins, pa.float64()),
                "vmax": pa.array(vmaxs, pa.float64()),
                "vsum": pa.array(vsums, pa.float64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    g = parts.groupby("column", sort=False)
    out = pd.DataFrame(
        {
            "n": g["n"].sum(),
            "nulls": g["nulls"].sum(),
            "vmin": g["vmin"].min(),
            "vmax": g["vmax"].max(),
            "vsum": g["vsum"].sum(min_count=1),
        }
    ).reset_index()
    # deterministic output order = caller's column order
    order = {c: i for i, c in enumerate(cols)}
    out = out.sort_values("column", key=lambda s: s.map(order))
    return out.reset_index(drop=True)
