"""Broadcast hash joins and semi/anti joins.

The reference's joins are all small-side in-memory id joins
(/root/reference/classes_io.py:269-337, 340-386): a dict or key-set is built
once and probed per record. The Ray-native equivalents broadcast the small
side through the object store (``ray.put`` once; read per actor/task) and
probe inside a vectorized ``map_batches`` — zero shuffle on the big side
(SURVEY.md §2.5 J1/J3/J5)."""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def broadcast_join(
    big: Dataset,
    small: Dataset | pd.DataFrame,
    *,
    on: str,
    small_on: str | None = None,
    value_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> Dataset:
    """Hash-join ``small``'s value columns onto ``big`` (inner or left).

    The small side is fully materialized (it must fit on one node — the same
    assumption the reference makes for its label tables) and broadcast once.
    """
    small_on = small_on or on
    small_pdf = small.to_pandas() if isinstance(small, Dataset) else small
    if value_cols is None:
        value_cols = [c for c in small_pdf.columns if c != small_on]
    small_pdf = small_pdf[[small_on, *value_cols]].drop_duplicates(subset=[small_on])
    ref = ray.put(small_pdf)

    # stateless tasks: the broadcast read is a local object-store get, and a
    # task pool uses every free CPU (an actor pool would cap + fuse upstream)
    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        return batch.merge(
            ray.get(ref), left_on=on, right_on=small_on, how=how
        ).drop(columns=[small_on] if small_on != on else [])

    return big.map_batches(probe, batch_format="pandas")


def semi_anti_join(
    big: Dataset,
    keys: Dataset | set,
    *,
    on: str,
    keys_on: str | None = None,
    anti: bool = False,
    num_partitions: int | None = None,
) -> Dataset:
    """Semi (keep matching) / anti (keep non-matching) join — the
    reference's resume primitive J4
    (/root/reference/rp_extract_batch.py:241-264) and filename matcher J1.

    Two strategies by key-side type:

    * plain ``set``/sequence — broadcast: ``ray.put`` once, vectorized
      ``is_in`` probe per batch, zero shuffle. Right for key sets that fit
      on one node (the reference's own assumption).
    * ``Dataset`` — DISTRIBUTED hash semi/anti join (``Dataset.join``
      left_semi/left_anti): both sides shuffle by key hash, nothing ever
      materializes on the driver. Right when the key side can outgrow a
      node (resume sets / filter keys at 100x corpus scale).
    """
    keys_on = keys_on or on
    if isinstance(keys, Dataset):
        if num_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            num_partitions = max(2, cpus // 2)
        side = keys.select_columns([keys_on])
        how = "left_anti" if anti else "left_semi"
        return big.join(side, how, num_partitions, on=(on,), right_on=(keys_on,))

    ref = ray.put(pa.array(sorted(set(keys))))

    def filt(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(batch.column(on), value_set=ray.get(ref))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return big.map_batches(filt, batch_format="pyarrow")
