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
    window-stat columns as ``stages.window`` for every incoming row.

    Vectorized: rows of one conversation arrive contiguously (the ordering
    contract above), so the batch is processed as conversation RUNS — the
    Python loop touches only run boundaries. Each run prepends its carried
    ring state to the run's series, builds one ``window_matrix`` (C strides)
    over the concatenation, and the 7-stat + percentile kernels then run
    ONCE over the whole batch's stacked window matrix per series. Measured
    >=50x over the round-1 per-row loop (see BASELINE.md)."""

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
        # state: conv -> {series: last<=k values chronological}, prev_ts, session
        self.buf: dict = defaultdict(
            lambda: {
                "tails": {c: np.empty(0, np.float64) for c in self.series_cols},
                "n": 0,
                "prev_ts": None,
                "session": 0,
            }
        )

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from rp_extract_ray.stages.partition import entity_starts, run_bounds
        from rp_extract_ray.stages.window import window_matrix

        n = len(batch)
        ents = batch[self.entity_col].to_numpy()
        ts = batch[self.ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        starts = entity_starts(ents)
        run_starts, run_ends = run_bounds(starts, n)

        # ---- gap_s: one vectorized diff; run heads read carried prev_ts ----
        gaps = np.empty(n)
        if n:
            gaps[1:] = (ts[1:] - ts[:-1]) / 1e6
            gaps[0] = 0.0
        head_prev = np.array(
            [
                self.buf[ents[s]]["prev_ts"] if self.buf[ents[s]]["prev_ts"] is not None else -1
                for s in run_starts
            ],
            dtype=np.float64,
        )
        gaps[run_starts] = np.where(
            head_prev >= 0, (ts[run_starts] - head_prev) / 1e6, 0.0
        )

        # ---- session ids: cumulative boundary count + carried base ----
        sessions = None
        if self.session_gap_s is not None:
            boundary = (gaps > self.session_gap_s).astype(np.int64)
            cs = np.cumsum(boundary)
            base = np.array(
                [self.buf[ents[s]]["session"] for s in run_starts], dtype=np.int64
            )
            # per-run: session = base + cs - (cs at run start - boundary at start)
            is_start = np.zeros(n, dtype=np.int64)
            is_start[run_starts] = 1
            run_id = np.cumsum(is_start) - 1
            cs_at_start = (cs - boundary)[run_starts]
            sessions = (base[run_id] + cs - cs_at_start[run_id]).astype(np.int32)

        # ---- window stats: per-run matrices, batch-level kernels ----
        series_vals = {
            c: (gaps if c == "gap_s" else batch[c].to_numpy(dtype=np.float64))
            for c in self.series_cols
        }
        out: dict[str, np.ndarray] = {}
        for c in self.series_cols:
            v = series_vals[c]
            mats = []
            for s, e in zip(run_starts, run_ends):
                st = self.buf[ents[s]]
                tail = st["tails"][c]
                ser = np.concatenate([tail, v[s:e]])
                w = window_matrix(ser, self.k, np.zeros(len(ser), dtype=np.int64))
                mats.append(w[len(tail):])
                st["tails"][c] = ser[-self.k:]
            w_all = np.vstack(mats) if mats else np.empty((0, self.k))
            cnt = (~np.isnan(w_all)).sum(axis=1)
            sorted_w = np.sort(w_all, axis=1)
            stats = seven_stats_nan(w_all, sorted_w=sorted_w, cnt=cnt)
            for j, s_name in enumerate(STAT_NAMES):
                out[f"{c}_w{s_name}"] = stats[:, j]
            out[f"{c}_wcount"] = cnt.astype(np.int64)
            if self.pctl:
                q = nan_sorted_percentiles(sorted_w, cnt, np.asarray(self.pctl))
                for jj, p in enumerate(self.pctl):
                    out[f"{c}_wp{int(p)}"] = q[jj]

        # ---- commit per-run scalar state ----
        for s, e in zip(run_starts, run_ends):
            st = self.buf[ents[s]]
            st["prev_ts"] = ts[e - 1]
            st["n"] += e - s
            if sessions is not None:
                st["session"] = int(sessions[e - 1])

        # ---- evict finished conversations ----
        # under the ordering contract a conversation's rows are contiguous in
        # the stream, so every conv except the batch's LAST one is complete
        # and its ring state is dead; without eviction the dict grows one
        # entry per conversation EVER seen (~400 B x millions on a long
        # stream). Only the tail conv may continue into the next batch.
        if n:
            tail = ents[n - 1]
            for key in [k for k in self.buf if k != tail]:
                del self.buf[key]

        res = batch.copy()
        res["gap_s"] = gaps
        if sessions is not None:
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
    every batch in order. ``preserve_order`` is set on the OUTPUT dataset's
    own context (each Dataset carries a DataContext copy that its whole plan
    executes under), so the session-global DataContext is untouched. For
    multi-core scale-out use :func:`streaming_window_features_sharded`."""
    out = ds.map_batches(
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
    out.context.execution_options.preserve_order = True
    return out


def streaming_window_features_sharded(
    ds: Dataset,
    series_cols: Sequence[str] = TRACKED_SERIES,
    *,
    n_shards: int = 4,
    k: int = DEFAULT_WINDOW_TURNS,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    session_gap_s: float | None = 1800.0,
    batch_size: int = 4096,
) -> Dataset:
    """Multi-actor scale-out of the streaming ring path.

    The entity space is hash-sharded into ``n_shards`` per-shard streams;
    each stream keeps the input's conversation-contiguous ts order (a filter
    never reorders under preserve_order) and feeds ITS OWN single
    ``RingFeaturizer`` actor, so the per-conversation ordering contract holds
    inside every shard while ``n_shards`` actors run concurrently — the
    docstring's "one stage per partition" scale-out made concrete. Output is
    the union of the shard streams (row order across shards is not
    meaningful; within a conversation, rows keep their stream order).

    At cluster scale, prefer one sharded stage per input partition (e.g. one
    per CDC log partition) so no filter pass is replicated; this helper
    replicates the filter per shard, which is the right trade when the
    source is one ordered stream (each pass is a cheap vectorized hash
    filter, and the alternative — a shuffle — would break stream order).
    """
    import numpy as np
    import pyarrow as pa

    from rp_extract_ray.stages.partition import stable_hash

    if n_shards <= 1:
        return streaming_window_features(
            ds, series_cols, k=k, entity_col=entity_col, ts_col=ts_col,
            session_gap_s=session_gap_s, batch_size=batch_size,
        )

    def pick(b: pa.Table, shard: int) -> pa.Table:
        h = stable_hash(b.column(entity_col).to_numpy(zero_copy_only=False))
        return b.filter(pa.array(h % np.uint64(n_shards) == shard))

    out = None
    for s in range(n_shards):
        sub = ds.map_batches(
            pick, batch_format="pyarrow", fn_kwargs={"shard": s}
        )
        feats = streaming_window_features(
            sub, series_cols, k=k, entity_col=entity_col, ts_col=ts_col,
            session_gap_s=session_gap_s, batch_size=batch_size,
        )
        out = feats if out is None else out.union(feats)
    out.context.execution_options.preserve_order = True
    return out
