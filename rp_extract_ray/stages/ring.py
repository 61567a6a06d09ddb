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
        # state: at most ONE entry — the last batch's tail conversation
        # ({"tails": {series: last<=k values}, "prev_ts", "session"}); every
        # other conversation is complete once a later one starts (ordering
        # contract), so its state would be dead weight
        self.buf: dict = {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from rp_extract_ray.stages.partition import entity_starts, run_bounds
        from rp_extract_ray.stages.window import window_matrix

        n = len(batch)
        ents = batch[self.entity_col].to_numpy()
        ts = batch[self.ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        starts = entity_starts(ents)
        run_starts, run_ends = run_bounds(starts, n)

        # Under the ordering contract (conversation-contiguous stream) at
        # most ONE conversation can carry state into this batch: the
        # previous batch's tail. Every other run starts fresh — so carried
        # state is a single O(1) lookup, not a per-run dict walk (profiled:
        # the per-run loops were half the remaining cost on short-conv
        # streams after the window matrices were batched).
        carried = self.buf.get(ents[0]) if n else None
        tail0 = (
            len(carried["tails"][self.series_cols[0]]) if carried else 0
        )

        # ---- gap_s: one vectorized diff; run heads restart at 0 except a
        # carried head, which reads the stored prev_ts ----
        gaps = np.empty(n)
        if n:
            gaps[1:] = (ts[1:] - ts[:-1]) / 1e6
        gaps[run_starts] = 0.0
        if carried is not None and carried["prev_ts"] is not None:
            gaps[0] = (ts[0] - carried["prev_ts"]) / 1e6

        # ---- session ids: cumulative boundary count, re-based per run ----
        sessions = None
        if self.session_gap_s is not None:
            boundary = (gaps > self.session_gap_s).astype(np.int64)
            cs = np.cumsum(boundary)
            # per-run rebase: session = base + cs - (cs at run start - boundary at start)
            is_start = np.zeros(n, dtype=np.int64)
            is_start[run_starts] = 1
            run_id = np.cumsum(is_start) - 1
            cs_at_start = (cs - boundary)[run_starts]
            base = np.zeros(len(run_starts), dtype=np.int64)
            if carried is not None:
                base[0] = carried["session"]
            sessions = (base[run_id] + cs - cs_at_start[run_id]).astype(np.int32)

        # ---- window stats: ONE masked matrix per series per batch ----
        # (same batch-level vectorization as the bulk stage, stages/window
        # window_stat_columns): the carried tail is prepended to the series,
        # per-position run starts (shifted by the tail length; 0 for the
        # carried run so its windows reach into the tail) mask cross-run
        # windows, and the first tail0 output rows are sliced off. One
        # window_matrix + one stat-kernel pass per series — the old shape
        # paid one numpy setup per CONVERSATION (41k calls / 20k rows on a
        # short-conv stream, 8.6k rows/s single-thread; this one: 90k+).
        series_vals = {
            c: (gaps if c == "gap_s" else batch[c].to_numpy(dtype=np.float64))
            for c in self.series_cols
        }
        pos_starts_real = starts.astype(np.int64) + tail0
        if carried is not None and len(run_ends):
            pos_starts_real[: run_ends[0]] = 0
        pos_starts = (
            np.concatenate([np.zeros(tail0, np.int64), pos_starts_real])
            if tail0
            else pos_starts_real
        )
        last_unit_start = (
            (0 if len(run_starts) == 1 and carried is not None else int(run_starts[-1]) + tail0)
            if n
            else 0
        )
        new_tails: dict[str, np.ndarray] = {}
        out: dict[str, np.ndarray] = {}
        for c in self.series_cols:
            v = series_vals[c]
            aug = np.concatenate([carried["tails"][c], v]) if tail0 else v
            w_all = (
                window_matrix(aug, self.k, pos_starts)[tail0:]
                if n
                else np.empty((0, self.k))
            )
            # copy: a view would pin the whole batch array for the life of
            # the carried state
            new_tails[c] = aug[max(last_unit_start, len(aug) - self.k):].copy()
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

        # ---- carry ONLY the batch tail's state (finished conversations'
        # state is dead under the contiguity contract; the dict stays O(1)
        # however many conversations stream through) ----
        if n:
            self.buf = {
                ents[n - 1]: {
                    "tails": new_tails,
                    "prev_ts": ts[n - 1],
                    "session": int(sessions[n - 1]) if sessions is not None else 0,
                }
            }

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
    multi-core scale-out use :func:`streaming_window_features_sharded`.

    Fusion caveat: when ``ds`` ends in plain ``map_batches`` stages (no
    sort/shuffle/materialize between them and this call), Ray Data fuses
    them INTO this concurrency-1 actor and the whole upstream runs
    single-threaded. Put a barrier (``ds.materialize()``, or any shuffle)
    before this stage so only the state actor is serial.

    Ordering contract: ``preserve_order`` governs OUTPUT block order, not
    the ARRIVAL order of inputs at a mid-plan operator — with a parallel
    upstream (a sort's reduce tasks, a sharded filter) the actor's input
    queue fills in task-completion order, which races run to run (found
    at sf0.1: an entity's stream delivered split re-set the ring state
    mid-conversation, nondeterministically). The stream is therefore
    coalesced to ONE block here — the actor slices it into ordered
    batches internally — which is exactly the stream-sized memory the
    single state actor already implies. At production scale, shard first
    (``streaming_window_features_sharded``: one block PER SHARD) or use
    the partition-as-state-boundary path (stages/partition.py)."""
    ds = ds.repartition(1)
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
        # a restarted featurizer would resume with EMPTY ring state and
        # silently mis-feature every in-flight conversation — fail loudly
        # instead (also drops the core_worker.cc:2246 ctor-args-in-store
        # E-line from run logs)
        max_restarts=0,
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
    combine: bool = True,
) -> Dataset | list[Dataset]:
    """Multi-actor scale-out of the streaming ring path.

    The entity space is hash-sharded into ``n_shards`` per-shard streams;
    each stream keeps the input's conversation-contiguous ts order (a filter
    never reorders under preserve_order) and feeds ITS OWN single
    ``RingFeaturizer`` actor, so the per-conversation ordering contract holds
    inside every shard while ``n_shards`` actors run concurrently — the
    docstring's "one stage per partition" scale-out made concrete. Output is
    the union of the shard streams (row order across shards is not
    meaningful; within a conversation, rows keep their stream order).

    ``combine`` (measured wall-clock trade): ``True`` returns ONE unioned
    Dataset — but a union executing under global ``preserve_order``
    drains its branches SEQUENTIALLY, so wall time ≈ the single-actor path
    (measured 54.8 s vs 57.7 s at 3.96M turns) and the extra actors buy
    nothing. ``False`` returns the per-shard Datasets; consume them
    CONCURRENTLY (one thread per ``count()``/write, or one downstream job
    per shard) and the actors genuinely run in parallel — measured
    270.8k turns/s vs 68.6k single, 3.9x on 8 shards. Union-combine is the
    right shape only when a single downstream Dataset is required and
    throughput is not the point (e.g. the oracle-gated query).

    At cluster scale, prefer one sharded stage per input partition (e.g. one
    per CDC log partition) so no filter pass is replicated; this helper
    replicates the filter per shard, which is the right trade when the
    source is one ordered stream (each pass is a cheap vectorized hash
    filter, and the alternative — a shuffle — would break stream order).

    Sizing: every shard pins ONE 1-CPU actor for the whole plan, so
    ``n_shards`` must leave CPU slots for the upstream feed — n_shards ==
    session CPUs starves the feed tasks and the plan livelocks (measured
    at 8/8). Keep n_shards ≤ CPUs/2; the upstream lineage is materialized
    once here so the N branch filters replay cheap object-store reads, not
    the (typically sorted) upstream computation.
    """
    import numpy as np
    import pyarrow as pa

    from rp_extract_ray.stages.partition import stable_hash

    if n_shards <= 1:
        return streaming_window_features(
            ds, series_cols, k=k, entity_col=entity_col, ts_col=ts_col,
            session_gap_s=session_gap_s, batch_size=batch_size,
        )
    ds = ds.materialize()  # N consumers below — one upstream execution

    def pick(b: pa.Table, shard: int) -> pa.Table:
        h = stable_hash(b.column(entity_col).to_numpy(zero_copy_only=False))
        return b.filter(pa.array(h % np.uint64(n_shards) == shard))

    branches = []
    for s in range(n_shards):
        sub = ds.map_batches(
            pick, batch_format="pyarrow", fn_kwargs={"shard": s}
        )
        branches.append(streaming_window_features(
            sub, series_cols, k=k, entity_col=entity_col, ts_col=ts_col,
            session_gap_s=session_gap_s, batch_size=batch_size,
        ))
    if not combine:
        return branches
    out = branches[0]
    for feats in branches[1:]:
        out = out.union(feats)
    out.context.execution_options.preserve_order = True
    return out
