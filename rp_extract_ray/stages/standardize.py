"""Global standardization (z-score) — reference M24
(/root/reference/rp_classify.py:28-37, sklearn StandardScaler semantics:
population std, zero-variance columns -> std=1).

Two-pass distributed design (SURVEY.md §2.3 M24): pass 1 is a tiny global
``aggregate`` (mean + population std per column); pass 2 broadcasts the
scaler into a vectorized ``map_batches``. No full materialization."""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Mean, Std

from rp_extract_ray.functions.stats import standardize_params


def fit_scaler(ds: Dataset, cols: Sequence[str]) -> dict[str, tuple[float, float]]:
    """{col: (mean, std)} via one small aggregate over the Dataset."""
    aggs = []
    for c in cols:
        aggs += [Mean(c, alias_name=f"m_{c}"), Std(c, ddof=0, alias_name=f"s_{c}")]
    aggs.append(Count(alias_name="n"))
    row = ds.aggregate(*aggs)
    out = {}
    for c in cols:
        mean, std = standardize_params(
            np.array([row[f"m_{c}"]]), np.array([row[f"s_{c}"]]) ** 2
        )
        out[c] = (float(mean[0]), float(std[0]))
    return out


def standardize(
    ds: Dataset, cols: Sequence[str], suffix: str = "_z", round_to: int | None = None
) -> Dataset:
    """Append ``<col>_z`` columns; scaler fit once, applied per Arrow batch."""
    scaler = fit_scaler(ds, cols)

    def apply(batch: pa.Table) -> pa.Table:
        for c in cols:
            m, s = scaler[c]
            v = batch.column(c).to_numpy(zero_copy_only=False).astype(np.float64)
            z = (v - m) / s
            if round_to is not None:
                from rp_extract_ray.functions.rounding import round_half_away

                z = round_half_away(z, round_to)
            batch = batch.append_column(f"{c}{suffix}", pa.array(z))
        return batch

    return ds.map_batches(apply, batch_format="pyarrow")
