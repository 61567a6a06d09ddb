"""Streaming ring-buffer featurizer: window state ACROSS batch boundaries.

The reference's window cursor is sequential per-document state
(ST6, /root/reference/rp_extract.py:488,762). The engine's default design
makes the partition the state boundary (whole conversations per group —
stages/partition.py), which needs no cross-batch state. This module is the
complementary STREAMING path the north rule names: a stateful actor holding a
per-conversation ring buffer of the last K turns, fed batches in order, so
features stream out incrementally without any shuffle at all.

When to use which:
* ``partitioned_apply`` (default): input in arbitrary order; one all-to-all.
* ``RingFeaturizer``: input already conversation-contiguous and ts-sorted —
  e.g. re-processing the engine's own partitioned output, a CDC/append log,
  or per-partition files read in order. Zero shuffle; state survives batch
  boundaries inside the actor.

Ordering contract (documented per the Ray guide's streaming pattern): rows of
one conversation must arrive in ts order and not interleave across actors —
run with ``concurrency=1`` and ``preserve_order=True``, or one actor per
input partition via separate per-partition Datasets. A conversation MAY span
many batches; that is the point.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset

from rp_extract_ray.functions.stats import seven_stats_nan, nan_sorted_percentiles
from rp_extract_ray.schema import DEFAULT_WINDOW_TURNS, STAT_NAMES, TRACKED_SERIES


class RingFeaturizer:
    """map_batches actor: per-conversation ring buffers of the last K values
    of each tracked series (plus the previous ts for gap_s); emits the same
    window-stat columns as ``stages.window`` for every incoming row."""

    def __init__(
        self,
        series_cols: Sequence[str] = TRACKED_SERIES,
        k: int = DEFAULT_WINDOW_TURNS,
        entity_col: str = "conv_id",
        ts_col: str = "ts",
        pctl: Sequence[float] = (25.0, 75.0),
        session_gap_s: float | None = 1800.0,
    ):
        self.series_cols = [c for c in series_cols]
        self.k = k
        self.entity_col = entity_col
        self.ts_col = ts_col
        self.pctl = list(pctl)
        self.session_gap_s = session_gap_s
        # state: conv -> {series: ring ndarray}, count, prev_ts, session
        self.buf: dict = defaultdict(
            lambda: {
                "rings": {c: np.full(self.k, np.nan) for c in self.series_cols},
                "n": 0,
                "prev_ts": None,
                "session": 0,
            }
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        out = {
            f"{c}_w{s}": np.empty(n) for c in self.series_cols for s in STAT_NAMES
        }
        for c in self.series_cols:
            out[f"{c}_wcount"] = np.empty(n, dtype=np.int64)
            for p in self.pctl:
                out[f"{c}_wp{int(p)}"] = np.empty(n)
        gaps = np.empty(n)
        sessions = np.empty(n, dtype=np.int32)

        ents = batch[self.entity_col].to_numpy()
        ts = batch[self.ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        series_vals = {
            c: batch[c].to_numpy(dtype=np.float64)
            for c in self.series_cols
            if c in batch.columns
        }
        for i in range(n):
            st = self.buf[ents[i]]
            gap = 0.0 if st["prev_ts"] is None else (ts[i] - st["prev_ts"]) / 1e6
            st["prev_ts"] = ts[i]
            gaps[i] = gap
            if self.session_gap_s is not None and gap > self.session_gap_s:
                st["session"] += 1
            sessions[i] = st["session"]
            pos = st["n"] % self.k
            for c in self.series_cols:
                v = gap if c == "gap_s" else series_vals[c][i]
                ring = st["rings"][c]
                ring[pos] = v
                w = ring[None, :]
                cnt = np.array([min(st["n"] + 1, self.k)])
                sw = np.sort(w, axis=1)
                stats = seven_stats_nan(w, sorted_w=sw, cnt=cnt)[0]
                for j, s in enumerate(STAT_NAMES):
                    out[f"{c}_w{s}"][i] = stats[j]
                out[f"{c}_wcount"][i] = cnt[0]
                if self.pctl:
                    q = nan_sorted_percentiles(sw, cnt, np.asarray(self.pctl))
                    for jj, p in enumerate(self.pctl):
                        out[f"{c}_wp{int(p)}"][i] = q[jj, 0]
            st["n"] += 1

        res = batch.copy()
        res["gap_s"] = gaps
        if self.session_gap_s is not None:
            res["session_id"] = sessions
        for name, arr in out.items():
            res[name] = arr
        return res


def streaming_window_features(
    ds: Dataset,
    series_cols: Sequence[str] = TRACKED_SERIES,
    *,
    k: int = DEFAULT_WINDOW_TURNS,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    session_gap_s: float | None = 1800.0,
    batch_size: int = 4096,
) -> Dataset:
    """Apply the ring-buffer featurizer to a conversation-contiguous,
    ts-sorted Dataset. concurrency=1 + preserve_order: the single actor sees
    every batch in order (scale-out = one such stage per partition)."""
    from ray.data import DataContext

    DataContext.get_current().execution_options.preserve_order = True
    return ds.map_batches(
        RingFeaturizer,
        fn_constructor_kwargs={
            "series_cols": series_cols,
            "k": k,
            "entity_col": entity_col,
            "ts_col": ts_col,
            "session_gap_s": session_gap_s,
        },
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=1,
    )
