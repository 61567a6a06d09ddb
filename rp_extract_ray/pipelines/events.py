"""Temporal feature queries over the driver ``events`` table.

``events(event_id, ts, user_id, event_type, value, props)`` stands in for the
transcript table with ``user_id`` as the entity key and ``(ts, event_id)`` as
the stable order (TESTDATA.md / FIXTURES.md F2). Every function takes
``sf_dir`` and returns a Dataset whose columns are named to match the DuckDB
oracle SQL in ``__ray_entry__.oracle_sql`` exactly; float columns that pass
through non-associative reductions are rounded on BOTH sides so the driver's
value-hash is stable under parallel execution."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

from rp_extract_ray.stages.lag import add_lag_features, ffill_within
from rp_extract_ray.stages.partition import partitioned_apply
from rp_extract_ray.stages.session import session_aggregate, sessionize
from rp_extract_ray.stages.standardize import standardize
from rp_extract_ray.stages.window import add_window_features
from rp_extract_ray.stages.asof import asof_join

ENTITY = "user_id"
ORDER = ("ts", "event_id")
NP = 32  # partitions for sf-scale correctness runs


def _events(sf_dir: str, columns=None) -> Dataset:
    from rp_extract_ray.sources.pqio import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/events.parquet", columns=columns)


def _round(ds: Dataset, cols: dict[str, int]) -> Dataset:
    from rp_extract_ray.functions.rounding import round_half_away

    def f(b: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            if c in b.column_names:
                v = round_half_away(b.column(c).to_numpy(zero_copy_only=False), nd)
                b = b.set_column(b.column_names.index(c), c, pa.array(v))
        return b

    return ds.map_batches(f, batch_format="pyarrow")


def q_lag_lead(sf_dir: str) -> Dataset:
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    ds = add_lag_features(
        ds, ["value"], lags=(1, 2), leads=(1,), gap=True,
        entity_col=ENTITY, ts_col="ts", order_cols=ORDER, num_partitions=NP,
    )
    ds = ds.select_columns(
        ["event_id", "user_id", "ts", "value", "value_lag1", "value_lag2", "value_lead1", "gap_s"]
    )
    return _round(ds, {"gap_s": 6})


def q_sessionize(sf_dir: str) -> Dataset:
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])
    ds = sessionize(
        ds, entity_col=ENTITY, ts_col="ts", order_cols=ORDER,
        gap_threshold_s=1800.0, num_partitions=NP,
    )

    def cast(b: pa.Table) -> pa.Table:
        i = b.column_names.index("session_id")
        return b.set_column(i, "session_id", b.column("session_id").cast(pa.int64()))

    ds = ds.map_batches(cast, batch_format="pyarrow")
    return _round(ds.select_columns(["event_id", "user_id", "ts", "gap_s", "session_id"]), {"gap_s": 6})


def q_session_agg(sf_dir: str) -> Dataset:
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    ds = session_aggregate(
        ds, entity_col=ENTITY, ts_col="ts", order_cols=ORDER,
        gap_threshold_s=1800.0, value_col="value", num_partitions=NP,
    )

    def cast(b: pa.Table) -> pa.Table:
        i = b.column_names.index("session_id")
        return b.set_column(i, "session_id", b.column("session_id").cast(pa.int64()))

    ds = ds.map_batches(cast, batch_format="pyarrow")
    return _round(
        ds.select_columns(
            ["user_id", "session_id", "n_events", "ts_min", "ts_max", "duration_s", "value_sum"]
        ),
        {"duration_s": 6, "value_sum": 6},
    )


def q_window_stats(sf_dir: str, k: int = 8) -> Dataset:
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    ds = add_window_features(
        ds, ["value"], k=k, entity_col=ENTITY, ts_col="ts", order_cols=ORDER,
        pctl=(), num_partitions=NP,
    )
    ds = ds.select_columns(
        ["event_id", "user_id", "ts", "value",
         "value_wmean", "value_wvar", "value_wmedian", "value_wmin", "value_wmax", "value_wcount"]
    )
    return _round(ds, {"value_wmean": 6, "value_wvar": 6, "value_wmedian": 6})


def _typed_events(sf_dir: str, event_type: str, value_name: str) -> Dataset:
    ds = _events(sf_dir, ["ts", "user_id", "event_type", "value"])

    def f(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = b.filter(pc.equal(b.column("event_type"), event_type))
        b = b.drop_columns(["event_type"])
        return b.rename_columns(["ts", "user_id", value_name])

    return ds.map_batches(f, batch_format="pyarrow")


def q_asof(
    sf_dir: str,
    direction: str,
    left_type: str,
    right_type: str,
    value_name: str,
    tolerance_s: float | None = None,
) -> Dataset:
    left = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def lf(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.equal(b.column("event_type"), left_type)).drop_columns(["event_type"])

    left = left.map_batches(lf, batch_format="pyarrow")
    right = _typed_events(sf_dir, right_type, value_name)
    out = asof_join(
        left, right, entity_col=ENTITY, ts_col="ts",
        right_value_cols=[value_name], direction=direction, num_partitions=NP,
        dedup_right="max", tolerance_s=tolerance_s,
    )
    out = out.select_columns(["event_id", "user_id", "ts", "value", value_name])
    return _round(out, {value_name: 6})


def q_backfill(sf_dir: str) -> Dataset:
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def add_masked(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        masked = pc.if_else(
            pc.equal(b.column("event_type"), "purchase"), b.column("value"), None
        )
        return b.append_column("purchase_value", masked)

    ds = ds.map_batches(add_masked, batch_format="pyarrow")

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        pdf["last_purchase_value"] = ffill_within(
            pdf["purchase_value"].to_numpy(dtype=np.float64), starts
        )
        return pdf

    ds = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return ds.select_columns(["event_id", "user_id", "ts", "last_purchase_value"])


def q_window_features_full(sf_dir: str, k: int = 8) -> Dataset:
    """The FULL windowed descriptor set: 7-stat kernel (population skew +
    Pearson kurtosis) + p25/p75. Oracle: window power sums in SQL —
    skew = (E3 - 3·E1·E2 + 2·E1³)/var^1.5, kurt analogous, quantile_cont
    for the percentiles (DuckDB's linear interpolation == numpy's;
    validated 0 round-6 mismatches at sf0.01). Also cross-checked against
    the single-process pandas oracle in tests/test_properties.py."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    out = add_window_features(
        ds, ["value"], k=k, entity_col=ENTITY, ts_col="ts", order_cols=ORDER,
        num_partitions=NP,
    )
    return _round(
        out,
        {"gap_s": 6, "value_wmean": 6, "value_wvar": 6, "value_wskew": 6,
         "value_wkurt": 6, "value_wmedian": 6, "value_wp25": 6,
         "value_wp75": 6},
    )


def q_rhythm(sf_dir: str) -> Dataset:
    """Rhythm-analogue conversation descriptors (RP/RH/MVD/TSSD/TRH via
    modulation FFT) over the per-user event series, reduced to per-vector
    round-6 nansum digests so the driver's scalar value-hash can gate the
    full FFT chain. Oracle: literal table of the same digests computed by
    the loop-based single-process oracle (pipelines/oracle.py via
    pipelines/oracle_literals.py). Full vectors stay available through
    stages.rhythm.rhythm_features (pytest-oracled in tests/test_rhythm.py).
    """
    from rp_extract_ray.functions.rounding import round_half_away
    from rp_extract_ray.pipelines.oracle_literals import RHYTHM_DIGEST_KEYS
    from rp_extract_ray.stages.dedup import _vec_matrix
    from rp_extract_ray.stages.rhythm import rhythm_features

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    out = rhythm_features(
        ds, series_cols=("value", "gap_s"), entity_col=ENTITY, ts_col="ts",
        order_cols=ORDER, seg_len=32, n_mod=16, num_partitions=NP,
    )

    def digests(b: pa.Table) -> pa.Table:
        nseg = b.column("n_segments").to_numpy(zero_copy_only=False)
        cols = {
            ENTITY: b.column(ENTITY).cast(pa.int64()),
            "n_turns": b.column("n_turns"),
            "n_segments": b.column("n_segments"),
            "dominant_mod_freq": b.column("dominant_mod_freq"),
        }
        empty = nseg == 0  # NaN-filled vectors -> NULL digest
        for k in RHYTHM_DIGEST_KEYS:
            M = _vec_matrix(b.column(k))
            d = round_half_away(np.nansum(M, axis=1), 6) if len(M) else np.empty(0)
            cols[f"{k}_d"] = pa.array(d, type=pa.float64(), mask=empty)
        return pa.table(cols)

    return out.map_batches(digests, batch_format="pyarrow")


def q_ring_stream(sf_dir: str, k: int = 8, n_shards: int = 1) -> Dataset:
    """The STREAMING ring-buffer path under the driver gate: events globally
    sorted to a conversation-contiguous stream, then the single-actor
    RingFeaturizer computes gap/session/window stats across batch
    boundaries with zero shuffle after the sort. Oracle: the same SQL
    window functions as window_features_full plus the sessionize boundary
    sum — so the cross-batch state carry is value-gated, not just
    pytest-gated. ``n_shards>1`` takes the hash-sharded multi-actor
    scale-out (stages/ring.streaming_window_features_sharded) — same
    oracle, so shard independence is value-gated too."""
    from rp_extract_ray.stages.ring import streaming_window_features_sharded

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    ds = ds.sort(["user_id", "ts", "event_id"])
    out = streaming_window_features_sharded(
        ds, series_cols=("value",), n_shards=n_shards, k=k,
        entity_col=ENTITY, ts_col="ts",
        session_gap_s=1800.0, batch_size=2048,
    )

    def shape(b: pa.Table) -> pa.Table:
        i = b.column_names.index("session_id")
        b = b.set_column(i, "session_id", b.column("session_id").cast(pa.int64()))
        return b

    out = out.map_batches(shape, batch_format="pyarrow").select_columns(
        ["event_id", "user_id", "ts", "value", "gap_s", "session_id",
         "value_wmean", "value_wvar", "value_wskew", "value_wkurt",
         "value_wmedian", "value_wmin", "value_wmax", "value_wcount",
         "value_wp25", "value_wp75"]
    )
    final = _round(
        out,
        {"gap_s": 6, "value_wmean": 6, "value_wvar": 6, "value_wskew": 6,
         "value_wkurt": 6, "value_wmedian": 6, "value_wp25": 6,
         "value_wp75": 6},
    )
    # preserve_order must be set on the FINAL consumed Dataset: each op
    # captures its own DataContext COPY, so the flag the ring stage set on
    # ITS output does not survive the shape/select/round wrappers — found
    # as run-to-run nondeterminism in the sharded path at sf0.1 (an
    # entity's stream split across unordered block delivery resets the
    # ring state mid-conversation)
    final.context.execution_options.preserve_order = True
    return final


def q_ring_stream_sharded(sf_dir: str, k: int = 8) -> Dataset:
    """The sharded ring path (concurrent state actors over hash-split
    entity streams) against the SAME oracle as ``ring_stream`` — values,
    not just plumbing, prove shard independence (VERDICT r4 item 7).
    Shard count is sized to the session: each shard pins one 1-CPU actor
    for the whole plan, so n_shards must leave slots for the upstream
    sort/filter tasks (8 actors on an 8-CPU session starves the feed —
    measured livelock)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # clamp to cpus//2 (floor 1) so tiny sessions never pin every slot —
    # the 2-shard floor on a 2-CPU session IS the measured livelock above
    n_shards = min(max(2, min(8, cpus // 4)), max(1, cpus // 2))
    return q_ring_stream(sf_dir, k=k, n_shards=n_shards)


def q_rhythm_segments(sf_dir: str) -> Dataset:
    """POINT-IN-TIME rhythm mode: one row per (user, segment window) with
    its ``ts_end`` as-of point (the reference's ``return_segment_features``
    switch) — per-vector digests, literal-table oracle from the loop-based
    single-process implementation."""
    from rp_extract_ray.functions.rounding import round_half_away
    from rp_extract_ray.pipelines.oracle_literals import SEGMENT_DIGEST_KEYS
    from rp_extract_ray.stages.dedup import _vec_matrix
    from rp_extract_ray.stages.rhythm import rhythm_features

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    out = rhythm_features(
        ds, series_cols=("value", "gap_s"), entity_col=ENTITY, ts_col="ts",
        order_cols=ORDER, seg_len=32, n_mod=16, num_partitions=NP,
        per_segment=True,
    )

    def digests(b: pa.Table) -> pa.Table:
        cols = {
            ENTITY: b.column(ENTITY).cast(pa.int64()),
            "seg_idx": b.column("seg_idx"),
            "turn_start": b.column("turn_start"),
            "ts_end": b.column("ts_end"),
        }
        for k in SEGMENT_DIGEST_KEYS:
            M = _vec_matrix(b.column(k))
            d = round_half_away(np.nansum(M, axis=1), 6) if len(M) else np.empty(0)
            cols[f"{k}_d"] = pa.array(d, type=pa.float64())
        return pa.table(cols)

    return out.map_batches(digests, batch_format="pyarrow")


def q_flagship(sf_dir: str) -> Dataset:
    """The full flagship point-in-time backfill pipeline, oracle-gated:
    turn stats + sessionize + k=16 windows over three series + backward
    as-of of the latest purchase value — every stage replicated in the
    generated SQL oracle (power-sum skew/kurt, quantile_cont, ASOF JOIN)."""
    from rp_extract_ray.pipelines.flagship import flagship_events_pipeline

    out = flagship_events_pipeline(sf_dir, num_partitions=NP)
    rnd = {"gap_s": 6, "value": 6}
    for s in ("text_len", "token_est", "gap_s"):
        # gap_s windows reach ~5e9 (variance of second-scale gaps): the 6th
        # decimal there is beyond double precision, so round magnitude-bound
        # columns to 2; normalized skew/kurt stay at 6
        mag = 2 if s == "gap_s" else 6
        # the VARIANCE is quadratic in the gap: windows reach ~5e9 s^2,
        # where even the 2nd decimal is ~1e-12 relative — beyond what two
        # differently-ordered float sums can agree on (found at sf0.1:
        # two cells off by 0.01). Hundreds are the honest precision there.
        magv = -2 if s == "gap_s" else 6
        for st, nd in (
            ("wmean", mag), ("wvar", magv), ("wskew", 6), ("wkurt", 6),
            ("wmedian", mag), ("wp25", mag), ("wp75", mag),
        ):
            rnd[f"{s}_{st}"] = nd
    return _round(out, rnd)


def q_time_grid(sf_dir: str) -> Dataset:
    """Tumbling 1-hour time buckets per user (S6 resample analogue)."""
    from rp_extract_ray.stages.timegrid import time_grid_aggregate

    ds = _events(sf_dir, ["ts", "user_id", "value"])
    out = time_grid_aggregate(
        ds, entity_col=ENTITY, ts_col="ts", value_col="value", interval_s=3600.0
    )
    out = out.select_columns(
        ["user_id", "bucket", "n", "value_sum", "value_mean", "value_min", "value_max"]
    )
    return _round(out, {"value_sum": 6, "value_mean": 6})


def q_time_window(sf_dir: str) -> Dataset:
    """Sliding 1-hour time-window sum/count/mean per event (RANGE-frame
    semantics; oracle: RANGE BETWEEN INTERVAL 1 HOUR PRECEDING)."""
    from rp_extract_ray.stages.timegrid import time_window_aggregate

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    out = time_window_aggregate(
        ds, entity_col=ENTITY, ts_col="ts", value_col="value",
        window_s=3600.0, order_cols=ORDER, num_partitions=NP,
    )
    return _round(out, {"value_tsum": 6, "value_tmean": 6})


def q_ewma(sf_dir: str, alpha: float = 0.25, window: int = 8) -> Dataset:
    """Bounded-window EWMA of value per user (stages/lag.ewma_within).
    Oracle: the same position-distance weighted sum spelled as ``window``
    explicit lag terms (generated SQL, __ray_entry__._ewma_sql)."""
    from rp_extract_ray.stages.lag import add_ewma_features

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    ds = add_ewma_features(
        ds, ["value"], alpha=alpha, window=window,
        entity_col=ENTITY, order_cols=ORDER, num_partitions=NP,
    )
    ds = ds.select_columns(["event_id", "user_id", "ts", "value", "value_ewma"])
    return _round(ds, {"value_ewma": 6})


def q_feature_matrix(sf_dir: str) -> Dataset:
    """Feature-store ``get_historical_features`` gate: one label spine
    (purchase events) point-in-time joined against TWO feature views —
    (a) the entity's latest click value, (b) running to-date aggregates
    (count + sum of value over ALL events) — in ONE entity exchange. All
    three stages of the chained formulation (cumulative precompute, two
    backward as-of joins) partition by the same entity key, so they FUSE:
    ``partitioned_apply`` ships each user's whole sorted history once, and
    the kernel derives the views and runs both in-partition merge_asofs
    locally (measured 6.1 s -> one exchange at sf0.1; at cluster scale,
    one all-to-all instead of three). Zero leakage: backward direction,
    ties include the as-of row itself (SQL ``ASOF JOIN .. >=`` semantics);
    equal-ts duplicates collapse per column via the same ``max`` rule as
    the chained form on BOTH sides of the oracle contract."""
    import numpy as np

    from rp_extract_ray.stages.asof import _merge_asof_frames
    from rp_extract_ray.stages.partition import partitioned_apply

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def fused(pdf: "pd.DataFrame", starts: np.ndarray) -> "pd.DataFrame":
        # pdf arrives sorted by (user_id, ts, event_id) with whole users
        # per partition. To-date view: per-run C groupby cumsum (the exact
        # formulation of stages/lag.cumulative_within post the round-5
        # cancellation fix — never partition-global cumsum minus run base).
        g = pdf.groupby("user_id", sort=False)
        cum = pd.DataFrame(
            {
                "user_id": pdf["user_id"],
                "ts": pdf["ts"],
                "f_sum_todate": g["value"].cumsum(),
                "f_n_todate": (g.cumcount() + 1).astype(np.int64),
            }
        )
        et = pdf["event_type"].to_numpy()
        cm = et == "click"
        clicks = pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy()[cm],
                "ts": pdf["ts"].to_numpy()[cm],
                "f_click_value": pdf["value"].to_numpy()[cm],
            }
        )
        spine = pdf.loc[
            et == "purchase", ["event_id", "user_id", "ts"]
        ].reset_index(drop=True)
        out = _merge_asof_frames(
            spine, clicks, entity_col="user_id", ts_col="ts",
            direction="backward", tolerance_s=None,
            value_cols=["f_click_value"], dedup_right="max",
        )
        out = _merge_asof_frames(
            out, cum, entity_col="user_id", ts_col="ts",
            direction="backward", tolerance_s=None,
            value_cols=["f_sum_todate", "f_n_todate"], dedup_right="max",
        )
        # the spine's own event row is always in the to-date view at the
        # same ts, so these never miss — pin the count back to int64
        # regardless of the merge kernel's null-capable upcast
        out["f_n_todate"] = out["f_n_todate"].round().astype(np.int64)
        return out[
            ["event_id", "user_id", "ts",
             "f_click_value", "f_sum_todate", "f_n_todate"]
        ]

    out = partitioned_apply(
        ev, fused, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return _round(out, {"f_click_value": 6, "f_sum_todate": 6})


def q_cumulative(sf_dir: str) -> Dataset:
    """Running sum/count/min/max of value per user (ROWS UNBOUNDED
    PRECEDING semantics, stages/lag.cumulative_within)."""
    from rp_extract_ray.stages.lag import add_cumulative_features

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    ds = add_cumulative_features(
        ds, ["value"], entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    ds = ds.select_columns(
        ["event_id", "user_id", "ts", "value",
         "value_csum", "value_ccount", "value_cmin", "value_cmax"]
    )
    return _round(ds, {"value_csum": 6})


def q_rank_features(sf_dir: str) -> Dataset:
    """Whole-entity rank/percent_rank of value per user
    (stages/lag.rank_within; SQL rank()/percent_rank() semantics)."""
    from rp_extract_ray.stages.lag import add_rank_features

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    ds = add_rank_features(
        ds, ["value"], entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    ds = ds.select_columns(
        ["event_id", "user_id", "value", "value_rank", "value_prank"]
    )
    return _round(ds, {"value_prank": 6})


def q_range_join(sf_dir: str) -> Dataset:
    """Interval containment join (stages/rangejoin.py): every 'error' event
    opens a 1-hour incident window; each 'click' of the same user inside a
    window joins that window's id and value. Windows of one user can overlap
    (general path, not assume_disjoint). Oracle: plain SQL
    ``JOIN ON ts BETWEEN start AND end``."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.rangejoin import range_join

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def lf(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("event_type"), "click")).drop_columns(
            ["event_type"]
        )

    def ivf(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "error"))
        ts = b.column("ts")
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "start_ts": ts,
                "end_ts": pc.add(ts, pa.scalar(3_600_000_000, pa.duration("us"))),
                "iv_id": b.column("event_id"),
                "iv_value": b.column("value"),
            }
        )

    left = ev.map_batches(lf, batch_format="pyarrow")
    iv = ev.map_batches(ivf, batch_format="pyarrow")
    left_schema = pa.schema(
        [
            pa.field("event_id", pa.int64()),
            pa.field("ts", pa.timestamp("us")),
            pa.field("user_id", pa.int64()),
            pa.field("value", pa.float64()),
        ]
    )
    out = range_join(
        left, iv, entity_col=ENTITY, ts_col="ts",
        interval_value_cols=["iv_id", "iv_value"], how="inner",
        num_partitions=NP, left_schema=left_schema,
    )
    out = out.select_columns(["event_id", "user_id", "ts", "value", "iv_id", "iv_value"])
    return _round(out, {"iv_value": 6})


def q_standardize(sf_dir: str) -> Dataset:
    ds = _events(sf_dir, ["event_id", "value"])
    ds = standardize(ds, ["value"], round_to=6)
    return ds.select_columns(["event_id", "value", "value_z"])


def q_funnel(sf_dir: str) -> Dataset:
    """view -> click -> purchase conversion funnel (stages/funnel.py): one
    entity exchange, chained groupby-min kernel, one row per user who
    viewed. Oracle: chained min-ts LEFT JOINs in SQL."""
    from rp_extract_ray.stages.funnel import funnel

    ds = _events(sf_dir, ["ts", "user_id", "event_type"])
    out = funnel(ds, ["view", "click", "purchase"], num_partitions=NP)
    return out.select_columns(
        ["user_id", "t_view", "t_click", "t_purchase", "steps_completed"]
    )


def q_pivot(sf_dir: str) -> Dataset:
    """Per-user event-type pivot (stages/pivot.py): wide count + value-sum
    columns via map-side combine, one small groupby exchange. Oracle:
    SUM(CASE ...) conditional aggregation."""
    from rp_extract_ray.stages.pivot import pivot_counts

    ds = _events(sf_dir, ["user_id", "event_type", "value"])
    out = pivot_counts(
        ds, "user_id", "event_type",
        values=["click", "error", "purchase", "signup", "view"],
        value_col="value",
    )
    return _round(
        out,
        {f"sum_{t}": 6 for t in ("click", "error", "purchase", "signup", "view")},
    )


def q_json_extract(sf_dir: str) -> Dataset:
    """Vectorized JSON integer-field extraction from the props column
    (stages/explode.py). Oracle: real json_extract — gates the regex
    kernel's equivalence on this corpus."""
    from rp_extract_ray.stages.explode import extract_json_int

    ds = _events(sf_dir, ["event_id", "props"])
    out = extract_json_int(ds, "props", "k")
    return out.select_columns(["event_id", "k"])


def q_group_standardize(sf_dir: str) -> Dataset:
    """Per-user z-score of value (stages/standardize.standardize_grouped):
    map-side moment combine + broadcast apply. Oracle: window AVG /
    STDDEV_POP with the zero-variance->1 guard."""
    from rp_extract_ray.stages.standardize import standardize_grouped

    ds = _events(sf_dir, ["event_id", "user_id", "value"])
    out = standardize_grouped(ds, ["value"], "user_id", round_to=6)
    return out.select_columns(["event_id", "user_id", "value", "value_gz"])


def q_merge_intervals(sf_dir: str) -> Dataset:
    """Coalesce per-user activity spans: each 'view' event opens an interval
    of floor(value) minutes; overlapping/touching spans merge into maximal
    islands (stages/intervals.py). Oracle: SQL gaps-and-islands (running-max
    window + island-id sum window + groupby)."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.intervals import merge_intervals

    ds = _events(sf_dir, ["ts", "user_id", "event_type", "value"])

    def mk(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "view"))
        dur_us = pc.cast(
            pc.multiply(pc.floor(b.column("value")), 60_000_000.0), pa.int64()
        )
        end = pc.add(b.column("ts"), pc.cast(dur_us, pa.duration("us")))
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "start_ts": b.column("ts"),
                "end_ts": end,
            }
        )

    iv = ds.map_batches(mk, batch_format="pyarrow")
    return merge_intervals(
        iv, entity_col="user_id", start_col="start_ts", end_col="end_ts",
        num_partitions=NP,
    )


def q_time_bucket(sf_dir: str) -> Dataset:
    """Per-user hourly OHLC downsample of the value series
    (stages/timegrid.time_bucket_agg). Oracle: window first/last_value +
    groupby over date_trunc buckets."""
    from rp_extract_ray.stages.timegrid import time_bucket_agg

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    out = time_bucket_agg(
        ds, entity_col=ENTITY, ts_col="ts", order_cols=ORDER,
        value_col="value", freq="h", num_partitions=NP,
    )
    return _round(
        out, {"open_v": 6, "close_v": 6, "min_v": 6, "max_v": 6, "sum_v": 6}
    )


def q_cohort_retention(sf_dir: str) -> Dataset:
    """Weekly cohort retention over the event stream
    (stages/session.cohort_retention). Oracle: first-week cohort join +
    DISTINCT (user, week) + day-diff/7 offsets."""
    from rp_extract_ray.stages.session import cohort_retention

    ds = _events(sf_dir, ["ts", "user_id"])
    return cohort_retention(ds, entity_col=ENTITY, ts_col="ts", num_partitions=NP)


def q_flatten_stream(sf_dir: str) -> Dataset:
    """Per-user ordered event-type stream render
    (stages/session.flatten_ordered). Oracle: string_agg with ORDER BY."""
    from rp_extract_ray.stages.session import flatten_ordered

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    return flatten_ordered(
        ds, entity_col=ENTITY, value_col="event_type", order_cols=ORDER,
        sep=",", out_col="stream", num_partitions=NP,
    )


def q_transitions(sf_dir: str) -> Dataset:
    """Per-user event-type transition matrix (stages/lag.transition_counts).
    Oracle: lead() window + groupby."""
    from rp_extract_ray.stages.lag import transition_counts

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    return transition_counts(
        ds, entity_col=ENTITY, state_col="event_type", order_cols=ORDER,
        num_partitions=NP,
    )


def q_value_share(sf_dir: str) -> Dataset:
    """Contribution analysis: each event's share of its user's total value —
    the aggregate -> broadcast-small-side -> stream-divide compose (zero
    shuffle on the event stream). Oracle: sum() OVER (PARTITION BY)."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import broadcast_join

    # two consumers (totals aggregate + the share join): read once
    ds = _events(sf_dir, ["event_id", "user_id", "value"]).materialize()

    def to_cents(b: pa.Table) -> pa.Table:
        # per-user totals accumulate in EXACT int64 cents, so the
        # distributed sum is bit-identical to the window oracle at any
        # scale — the session-7 fixed-point rule; at sf0.1 the float-sum
        # form hit 6-dp rounding boundaries on a handful of rows
        v = b.column("value").to_numpy(zero_copy_only=False)
        c = np.round(v * 100).astype(np.int64)
        return pa.table({"user_id": b.column("user_id"), "_c": pa.array(c)})

    totals = grouped_reduce(
        ds.map_batches(to_cents, batch_format="pyarrow"), "user_id",
        {"total_c": ("_c", "sum")},
    )
    joined = broadcast_join(ds, totals, on="user_id", value_cols=["total_c"])

    def fin(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        total = pc.divide(
            pc.cast(b.column("total_c"), pa.float64()), pa.scalar(100.0)
        )
        share = pc.divide(b.column("value"), total)
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "share": share,
            }
        )

    return _round(joined.map_batches(fin, batch_format="pyarrow"), {"share": 6})


def q_time_grid_lerp(sf_dir: str) -> Dataset:
    """Hourly linear-interpolation resample of each user's value series
    (stages/timegrid.time_grid_interpolate). Oracle: LATERAL prev/next
    neighbors + the same lerp formula."""
    from rp_extract_ray.stages.timegrid import time_grid_interpolate

    ds = _events(sf_dir, ["ts", "user_id", "value"])
    return time_grid_interpolate(
        ds, entity_col=ENTITY, ts_col="ts", value_col="value",
        order_cols=("ts",), num_partitions=NP,
    )


def q_trend_slope(sf_dir: str) -> Dataset:
    """Per-user OLS trend of value over time (closed-form from map-side
    moment sums — one keyed exchange carrying 5 scalars per (user, block)).
    Time is centered on a fixed epoch so the x^2 sums stay well inside
    float64 (the slope is shift-invariant). Oracle: the identical explicit
    sum formula in SQL (not regr_slope, pinning the exact arithmetic)."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.groupops import grouped_reduce

    ds = _events(sf_dir, ["ts", "user_id", "value"])
    base_us = pd.Timestamp("2025-01-01").value // 1000  # us epoch

    def moments(b: pa.Table) -> pa.Table:
        x = (
            b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
            - base_us
        ) / 1e6
        y = b.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "sx": pa.array(x),
                "sy": pa.array(y),
                "sxx": pa.array(x * x),
                "sxy": pa.array(x * y),
            }
        )

    sums = grouped_reduce(
        ds.map_batches(moments, batch_format="pyarrow"),
        "user_id",
        {
            "sx": ("sx", "sum"), "sy": ("sy", "sum"),
            "sxx": ("sxx", "sum"), "sxy": ("sxy", "sum"),
            "n": ("sx", "count"),
            "xmin": ("sx", "min"), "xmax": ("sx", "max"),
        },
    )

    def fin(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b.column("sx").to_numpy(zero_copy_only=False)
        sy = b.column("sy").to_numpy(zero_copy_only=False)
        sxx = b.column("sxx").to_numpy(zero_copy_only=False)
        sxy = b.column("sxy").to_numpy(zero_copy_only=False)
        # zero time-variance guard on EXACT min/max (denom != 0 is float
        # cancellation noise when all ts are equal — measured: 3 same-ts
        # rows give denom = -0.015625 and a garbage finite slope)
        xmin = b.column("xmin").to_numpy(zero_copy_only=False)
        xmax = b.column("xmax").to_numpy(zero_copy_only=False)
        denom = n * sxx - sx * sx
        slope = np.where(xmax > xmin, (n * sxy - sx * sy) / denom, np.nan)
        from rp_extract_ray.functions.rounding import round_half_away

        return pa.table(
            {
                "user_id": b.column("user_id"),
                "n": b.column("n").cast(pa.int64()),
                "slope": pa.array(round_half_away(slope * 86400.0, 6)),
            }
        )

    return sums.map_batches(fin, batch_format="pyarrow")


def q_ntile(sf_dir: str) -> Dataset:
    """Per-user NTILE(4) by event order (stages/lag.add_ntile)."""
    from rp_extract_ray.stages.lag import add_ntile

    ds = _events(sf_dir, ["event_id", "ts", "user_id"])
    out = add_ntile(
        ds, 4, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return out.select_columns(["event_id", "user_id", "tile"])


def q_longest_streak(sf_dir: str) -> Dataset:
    """Longest consecutive same-event-type run per user
    (stages/lag.longest_streak); ties -> earliest run. Oracle:
    gaps-and-islands rn-difference trick."""
    from rp_extract_ray.stages.lag import longest_streak

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    return longest_streak(
        ds, entity_col=ENTITY, state_col="event_type", order_cols=ORDER,
        num_partitions=NP,
    )


def q_winsorize(sf_dir: str) -> Dataset:
    """Per-user winsorization: clip value into the user's [p05, p95]
    (exact grouped quantiles broadcast back onto the stream — the numeric
    twin of the per-language length filter). Oracle: quantile_cont join +
    least/greatest."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.groupops import grouped_quantiles
    from rp_extract_ray.stages.join import broadcast_join

    ds = _events(sf_dir, ["event_id", "user_id", "value"]).materialize()
    cuts = grouped_quantiles(
        ds, "user_id", "value", [0.05, 0.95], out_names=["lo", "hi"]
    ).select_columns(["user_id", "lo", "hi"])
    joined = broadcast_join(ds, cuts, on="user_id", value_cols=["lo", "hi"])

    def clip(b: pa.Table) -> pa.Table:
        v = pc.min_element_wise(
            pc.max_element_wise(b.column("value"), b.column("lo")),
            b.column("hi"),
        )
        return pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "value_w": v,
            }
        )

    return _round(joined.map_batches(clip, batch_format="pyarrow"), {"value_w": 6})


def q_window_edges(sf_dir: str) -> Dataset:
    """first_value / last_value / cume_dist of value per user stream
    (stages/lag.add_edge_features) — the remaining SQL window-function
    family, one entity exchange, pure-indexing kernels."""
    from rp_extract_ray.stages.lag import add_edge_features

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    ds = add_edge_features(
        ds, ["value"], entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    ds = ds.select_columns(
        ["event_id", "user_id", "value", "value_first", "value_last",
         "value_cumedist"]
    )
    return _round(ds, {"value_cumedist": 6})


def q_rolling_corr(sf_dir: str) -> Dataset:
    """Trailing 16-row correlation of value vs elapsed time per user
    (stages/lag.add_rolling_corr — the windowed two-column aggregate the
    7-stat kernel family lacked; five shifted-view sums, causal). Oracle:
    windowed corr(value, epoch(ts)) with a ROWS frame; NULL where the
    frame has <2 rows or zero variance (DuckDB parity, tested)."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.lag import add_rolling_corr

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def add_tsec(b: pa.Table) -> pa.Table:
        sec = pc.divide(
            pc.cast(b.column("ts"), pa.int64()).cast(pa.float64()),
            pa.scalar(1e6),
        )
        return b.append_column("tsec", sec)

    ds = ds.map_batches(add_tsec, batch_format="pyarrow")
    out = add_rolling_corr(
        ds, "value", "tsec", k=16, out_col="value_trend_corr",
        entity_col=ENTITY, order_cols=ORDER, num_partitions=NP,
    )
    out = out.select_columns(["event_id", "user_id", "value_trend_corr"])
    return _round(out, {"value_trend_corr": 6})


def q_group_mad(sf_dir: str) -> Dataset:
    """Per-user robust dispersion: median + median-absolute-deviation of
    value (stages/groupops.grouped_mad — one keyed exchange, order
    statistics computed vectorized per group). The outlier-tolerant twin
    of the reference's std-dev stat (SURVEY.md §2.6 A1). Oracle: DuckDB
    ``median``/``mad``."""
    from rp_extract_ray.stages.groupops import grouped_mad

    ds = _events(sf_dir, ["user_id", "value"])
    out = grouped_mad(ds, "user_id", "value", round_to=6)
    return out.select_columns(["user_id", "n", "med", "mad"])


def q_group_mode(sf_dir: str) -> Dataset:
    """Dominant (most frequent) event type per user — exact per-group MODE
    with the deterministic highest-count / smallest-value tie-break
    (stages/groupops.grouped_mode). The exchange carries distinct
    (user, type) pairs, never raw events."""
    from rp_extract_ray.stages.groupops import grouped_mode

    ds = _events(sf_dir, ["user_id", "event_type"])
    return grouped_mode(ds, "user_id", "event_type", out_name="mode_event_type")


def q_rolling_median(sf_dir: str, k: int = 5) -> Dataset:
    """Trailing k-row median of value per user (stages/lag.
    rolling_quantile_within): the robust sliding-trend feature. Oracle:
    ``median(value) OVER (... ROWS k-1 PRECEDING AND CURRENT ROW)`` —
    DuckDB's quantile_cont interpolation matches np.nanquantile 'linear'."""
    from rp_extract_ray.stages.lag import add_rolling_quantile

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    ds = add_rolling_quantile(
        ds, ["value"], k=k, q=0.5,
        entity_col=ENTITY, order_cols=ORDER, num_partitions=NP,
    )
    ds = ds.select_columns(["event_id", "user_id", "ts", "value", "value_rq50"])
    return _round(ds, {"value_rq50": 6})


def q_minmax_scale(sf_dir: str) -> Dataset:
    """Global [0,1] min-max rescaling of value (stages/standardize.
    minmax_scale, the MinMaxScaler counterpart of M24). Oracle: window
    min/max over the whole table with the zero-range->0 guard."""
    from rp_extract_ray.stages.standardize import minmax_scale

    ds = _events(sf_dir, ["event_id", "value"])
    out = minmax_scale(ds, ["value"], round_to=6)
    return out.select_columns(["event_id", "value", "value_mm"])


def q_group_minmax(sf_dir: str) -> Dataset:
    """Per-event-type min-max rescaling (stages/standardize.
    minmax_scale_grouped): map-side bounds combine + broadcast apply —
    the per-feature normalization a mixed-scale feature table needs.
    Oracle: window min/max PARTITION BY event_type."""
    from rp_extract_ray.stages.standardize import minmax_scale_grouped

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    out = minmax_scale_grouped(ds, ["value"], "event_type", round_to=6)
    return out.select_columns(["event_id", "event_type", "value", "value_gmm"])


def q_latest_per_key(sf_dir: str) -> Dataset:
    """Latest event per user (stages/dedup.latest_per_key): the
    "newest version per key wins" snapshot-dedup primitive. Oracle:
    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC,
    event_id DESC) = 1."""
    from rp_extract_ray.stages.dedup import latest_per_key

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    out = latest_per_key(ds, ENTITY, ORDER, num_partitions=NP)
    return _round(
        out.select_columns(["event_id", "user_id", "ts", "value"]), {"value": 6}
    )


def q_event_paths(sf_dir: str) -> Dataset:
    """Per-user ordered event-type path (SQL string_agg ORDER BY ts,
    event_id; stages/groupops.grouped_string_agg): the collect-list op
    behind journey mining — one keyed exchange, per-partition vectorized
    groupby-join."""
    from rp_extract_ray.stages.groupops import grouped_string_agg

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])
    return grouped_string_agg(
        ds, ENTITY, "event_type", order_cols=ORDER, sep="|",
        out_name="path", num_partitions=NP,
    )


def q_cooccurrence(sf_dir: str) -> Dataset:
    """Event-type co-membership matrix: for each unordered pair of event
    types, how many users exhibit both (stages/groupops.cooccurrence_pairs
    — the market-basket complement of the ORDERED transition matrix).
    Oracle: distinct-pair self-join."""
    from rp_extract_ray.stages.groupops import cooccurrence_pairs

    ds = _events(sf_dir, ["user_id", "event_type"])
    return cooccurrence_pairs(
        ds, ENTITY, "event_type", out_names=("e1", "e2"), num_partitions=NP
    )


def q_hopping_window(sf_dir: str) -> Dataset:
    """Hopping-window aggregate (stages/timegrid.hopping_window_aggregate):
    1-hour windows advancing every 15 minutes, sum + count of value per
    (user, window) — the streaming HOP shape; each event fans out to 4
    windows inside the block, map-side combines, and ONE keyed exchange
    carries distinct (user, window) partials. Oracle: UNNEST([0..3]) window
    replication + GROUP BY."""
    from rp_extract_ray.stages.timegrid import hopping_window_aggregate

    ds = _events(sf_dir, ["ts", "user_id", "value"])
    out = hopping_window_aggregate(
        ds, entity_col=ENTITY, ts_col="ts", value_col="value",
        window_s=3600.0, hop_s=900.0, num_partitions=NP,
    )
    out = out.select_columns(["user_id", "wstart", "wsum", "wn"])
    return _round(out, {"wsum": 6})


def q_dense_grid(sf_dir: str) -> Dataset:
    """Dense cross-grid zero-fill: per-(user, event_type) counts over the
    FULL user x type grid, absent combinations explicit as 0 — the reshape
    pair (stages/pivot.pivot_counts -> unpivot) composed so the grid
    densifies inside the one pivot exchange (wide rows are born dense) and
    the melt back to long is a pure per-block kernel with zero extra
    shuffle. Oracle: CROSS JOIN of distinct users x the type list LEFT
    JOINed to GROUP BY counts, COALESCE 0."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.pivot import pivot_counts, unpivot

    types = ["click", "error", "purchase", "signup", "view"]
    ds = _events(sf_dir, ["user_id", "event_type"])
    wide = pivot_counts(ds, "user_id", "event_type", values=types)
    long = unpivot(
        wide, ["user_id"], [f"n_{t}" for t in types],
        var_name="event_type", value_name="n",
    )

    def finish(b: pa.Table) -> pa.Table:
        et = pc.utf8_replace_slice(b.column("event_type"), 0, 2, "")
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "event_type": et,
                "n": b.column("n").cast(pa.int64()),
            }
        )

    return long.map_batches(finish, batch_format="pyarrow")


def q_skyline(sf_dir: str) -> Dataset:
    """Global Pareto frontier of events: earliest-and-highest-value — rows
    no other event beats on BOTH ts (earlier-or-equal) and value
    (higher-or-equal, one strict). stages/skyline.skyline_2d: per-block
    prune + one tiny single-block merge (skyline-of-skylines algebra).
    Oracle: an independent window formulation (per-ts group max + exclusive
    running max), not the NOT EXISTS quadratic form."""
    from rp_extract_ray.stages.skyline import skyline_2d

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    out = skyline_2d(ds, x_col="ts", y_col="value")
    return out.select_columns(["event_id", "user_id", "ts", "value"])


def q_interval_overlap(sf_dir: str) -> Dataset:
    """Interval x interval overlap join (stages/rangejoin.
    interval_overlap_join): 30-minute incident windows opened by 'error'
    events paired with same-user activity spans ('view' events lasting
    floor(value) minutes) that overlap them, plus the overlap length in
    seconds. One co-partitioned exchange. Oracle: plain SQL join on the
    two-sided overlap predicate."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.rangejoin import interval_overlap_join

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def mk_a(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "error"))
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "a_id": b.column("event_id"),
                "a_start": b.column("ts"),
                "a_end": pc.add(
                    b.column("ts"), pa.scalar(1_800_000_000, pa.duration("us"))
                ),
            }
        )

    def mk_b(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "view"))
        dur = pc.cast(
            pc.multiply(pc.floor(b.column("value")), 60_000_000.0), pa.int64()
        )
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "b_id": b.column("event_id"),
                "b_start": b.column("ts"),
                "b_end": pc.add(b.column("ts"), pc.cast(dur, pa.duration("us"))),
            }
        )

    a = ev.map_batches(mk_a, batch_format="pyarrow")
    bb = ev.map_batches(mk_b, batch_format="pyarrow")
    out = interval_overlap_join(
        a, bb, entity_col=ENTITY, num_partitions=NP,
    )

    def finish(t: pa.Table) -> pa.Table:
        a0 = t.column("a_start").cast(pa.int64()).to_numpy(zero_copy_only=False)
        a1 = t.column("a_end").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b0 = t.column("b_start").cast(pa.int64()).to_numpy(zero_copy_only=False)
        b1 = t.column("b_end").cast(pa.int64()).to_numpy(zero_copy_only=False)
        ov = (np.minimum(a1, b1) - np.maximum(a0, b0)) / 1e6
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "a_id": t.column("a_id"),
                "b_id": t.column("b_id"),
                "overlap_s": pa.array(ov),
            }
        )

    out = out.map_batches(finish, batch_format="pyarrow")
    return _round(out, {"overlap_s": 6})


def q_target_encode(sf_dir: str) -> Dataset:
    """Leakage-free target encoding (stages/encode.target_encode_past):
    each event's event_type encoded as the mean value over STRICTLY earlier
    events of that type under global (ts, event_id) order — NULL at a
    type's first occurrence. Time-range partitions + per-(slice, type)
    int64 fixed-point offsets make the distributed prefix exact at any
    layout. Oracle: avg(cents) OVER (PARTITION BY type ORDER BY ts,
    event_id ROWS .. 1 PRECEDING) / 100."""
    from rp_extract_ray.stages.encode import target_encode_past

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])
    out = target_encode_past(
        ds, category_col="event_type", target_col="value",
        ts_col="ts", order_cols=("event_id",), scale=100,
        num_partitions=NP,
    )
    out = out.select_columns(["event_id", "event_type", "value", "te"])
    return _round(out, {"te": 6})


def q_quantile_normalize(sf_dir: str) -> Dataset:
    """Quantile normalization of value across event_type groups
    (stages/standardize.quantile_normalize): each event's value replaced by
    the cross-type mean at its within-type rank — rank / reference / rejoin,
    three bounded exchanges. Oracle: row_number + per-rank AVG + join."""
    from rp_extract_ray.stages.standardize import quantile_normalize

    ds = _events(sf_dir, ["event_id", "event_type", "value"])
    out = quantile_normalize(
        ds, group_col="event_type", value_col="value", id_col="event_id",
        num_partitions=NP,
    )
    return out.select_columns(["event_id", "event_type", "value", "qnorm"])


def q_connected_components(sf_dir: str) -> Dataset:
    """Connected components as a first-class gated operator: the co-purchase
    graph (users sharing a minute-bucket 'purchase') clustered by
    min-label propagation (stages/dedup.dedup_clusters, distributed mode —
    the same engine near_dup_clusters runs, here gated directly on an
    explicit edge list). Edges via cooccurrence_pairs; isolated nodes keep
    their own id. Oracle: recursive-CTE transitive closure + min reachable
    node — an independent fixpoint formulation."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.dedup import dedup_clusters
    from rp_extract_ray.stages.groupops import cooccurrence_pairs, grouped_reduce

    ev = _events(sf_dir, ["ts", "user_id", "event_type"])

    def mk(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "purchase"))
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        bucket = (t // 60_000_000) * 60_000_000
        return pa.table(
            {"bucket": pa.array(bucket), "user_id": b.column("user_id")}
        )

    p = ev.map_batches(mk, batch_format="pyarrow").materialize()
    # two consumers: the pair explode and the node roster
    pairs = cooccurrence_pairs(
        p, "bucket", "user_id", out_names=("id_a", "id_b"), num_partitions=NP
    )
    labels = dedup_clusters(pairs, mode="distributed")

    # isolated nodes never enter the pair table: union self-labels and take
    # the per-id min — nodes in a component keep the propagated label
    # (always <= self), isolated ones label themselves; a zero-edge corpus
    # (sf0.001) degenerates to the self-labels alone, no join needed
    def self_lab(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").cast(pa.int64())
        return pa.table({"id": uid, "cluster_id": uid})

    selves = p.select_columns(["user_id"]).map_batches(
        self_lab, batch_format="pyarrow"
    )
    out = grouped_reduce(
        labels.union(selves), "id",
        {"cluster_id": ("cluster_id", "min")}, num_partitions=NP,
    )

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": b.column("id").cast(pa.int64()),
                "cluster_id": b.column("cluster_id").cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def q_hopping_distinct(sf_dir: str) -> Dataset:
    """Distinct active users per hopping window (1 h / 15 min hop) —
    stages/timegrid.hopping_window_distinct, the exact two-exchange
    streaming COUNT(DISTINCT). Oracle: UNNEST window replication +
    COUNT(DISTINCT user_id)."""
    from rp_extract_ray.stages.timegrid import hopping_window_distinct

    ds = _events(sf_dir, ["ts", "user_id"])
    return hopping_window_distinct(
        ds, ts_col="ts", key_col="user_id",
        window_s=3600.0, hop_s=900.0, num_partitions=NP,
    )


def q_debounce(sf_dir: str) -> Dataset:
    """Streaming debounce / dedup-within-window: keep an event only when
    the SAME (user, type) has no prior event within 30 minutes — the
    alert-throttle / repeated-signal-suppression shape (lag-gap variant:
    the window is measured from the previous event, kept or not, so it
    stays a pure one-exchange lag kernel instead of a sequential throttle).
    One user-keyed exchange; the per-partition kernel is a composite-key
    groupby shift. Oracle: lag() OVER (user, type) + gap predicate."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        prev = pdf.groupby(["user_id", "event_type"], sort=False)["ts"].shift()
        gap = (pdf["ts"] - prev).dt.total_seconds()
        keep = prev.isna().to_numpy() | (gap.to_numpy() > 1800.0)
        return pdf[keep]

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return out.select_columns(["event_id", "user_id", "event_type", "ts"])


def q_throttle(sf_dir: str) -> Dataset:
    """Sequential rate-limit throttle: keep an event only when it is more
    than 30 minutes after the last KEPT event of the same (user, type) —
    the true stateful fold (vs q_debounce's lag-gap variant; the two differ
    by 8 rows at sf0.1). stages/lag.throttle_keep_mask: searchsorted jumps
    from kept row to kept row, so cost is bounded by time-span/W per
    series, not event density. ONE user-keyed exchange ordered
    (event_type, ts, event_id). Oracle: per-row recursive CTE carrying the
    last-kept timestamp."""
    from rp_extract_ray.stages.lag import throttle_keep_mask

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pdf
        ts = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        et = pdf["event_type"].to_numpy()
        new_run = np.zeros(n, dtype=bool)
        new_run[0] = True
        new_run[1:] = (starts[1:] != starts[:-1]) | (et[1:] != et[:-1])
        keep = throttle_keep_mask(ts, new_run, 1_800_000_000)
        return pdf[keep]

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY,
        order_cols=("event_type", "ts", "event_id"), num_partitions=NP,
    )
    return out.select_columns(["event_id", "user_id", "event_type", "ts"])


def q_band_join(sf_dir: str) -> Dataset:
    """Numeric band join (stages/rangejoin.band_join): same-user click x
    purchase pairs whose values differ by <= 0.05 — bucket-replication
    similarity join (b-side 3x fan-out, pairs co-locate exactly once, ONE
    keyed exchange). Oracle: JOIN ON user AND abs(delta) <= band."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.rangejoin import band_join

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def side(et: str, id_name: str, v_name: str):
        def f(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("event_type"), et))
            return pa.table(
                {
                    "user_id": t.column("user_id"),
                    id_name: t.column("event_id"),
                    v_name: t.column("value"),
                }
            )

        return f

    a = ev.map_batches(side("click", "a_id", "a_value"), batch_format="pyarrow")
    b = ev.map_batches(side("purchase", "b_id", "b_value"), batch_format="pyarrow")
    out = band_join(
        a, b, a_key="a_value", b_key="b_value", band=0.05,
        entity_col="user_id", num_partitions=NP,
    )
    return _round(
        out.select_columns(["user_id", "a_id", "b_id", "a_value", "b_value"]),
        {"a_value": 6, "b_value": 6},
    )


def q_concurrency(sf_dir: str) -> Dataset:
    """Open-interval concurrency at each event (stages/intervals.
    interval_concurrency): for every click, how many of the user's view
    activity spans (floor(value) minutes) are open at that instant —
    sweep-line cumsum, never materializing point x interval matches.
    Oracle: LEFT JOIN containment count (the quadratic formulation the
    sweep replaces)."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.intervals import interval_concurrency

    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def mk_p(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "click"))
        return t.select(["event_id", "user_id", "ts"])

    def mk_iv(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "view"))
        dur = pc.cast(
            pc.multiply(pc.floor(t.column("value")), 60_000_000.0), pa.int64()
        )
        return pa.table(
            {
                "user_id": t.column("user_id"),
                "start_ts": t.column("ts"),
                "end_ts": pc.add(t.column("ts"), pc.cast(dur, pa.duration("us"))),
            }
        )

    points = ev.map_batches(mk_p, batch_format="pyarrow")
    iv = ev.map_batches(mk_iv, batch_format="pyarrow")
    out = interval_concurrency(
        points, iv, entity_col=ENTITY, ts_col="ts", num_partitions=NP
    )
    return out.select_columns(["event_id", "user_id", "ts", "n_open"])


def q_weighted_median(sf_dir: str) -> Dataset:
    """Per-user weighted median of value (weight = props.k + 1): lower
    weighted median — smallest v whose inclusive cumulative weight reaches
    half the total. One entity exchange sorted by (user, value); integer
    weights make the half-total comparison exact (2*cw >= tw, no float
    boundary). Oracle: cumulative-weight window + min-over-qualifying."""
    from rp_extract_ray.stages.explode import extract_json_int

    ds = _events(sf_dir, ["user_id", "value", "props"])
    ds = extract_json_int(ds, "props", "k")

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        # absent/non-integer k -> null weight; SQL's window sum skips NULLs,
        # which is exactly weight 0 here (NaN.astype(int64) would otherwise
        # produce INT64_MIN garbage and poison the whole user's half-total)
        w = np.nan_to_num(
            pdf["k"].to_numpy(dtype=np.float64) + 1, nan=0.0
        ).astype(np.int64)
        run_id = starts  # constant per run -> usable as a group key
        cw_incl = pd.Series(w).groupby(run_id).cumsum().to_numpy()
        tw = pd.Series(w).groupby(run_id).transform("sum").to_numpy()
        # tw == 0 means EVERY weight was null: SQL's NULL total fails the
        # comparison for all rows and the user drops — mirror that
        qual = (2 * cw_incl >= tw) & (tw > 0)
        q = pdf[qual]
        out = (
            pd.DataFrame(
                {"user_id": q["user_id"].to_numpy(),
                 "wmedian": q["value"].to_numpy()}
            )
            .groupby("user_id", sort=False)
            .first()
            .reset_index()
        )
        return out

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=("value",), num_partitions=NP
    )
    return _round(out, {"wmedian": 6})


def q_time_weighted_avg(sf_dir: str) -> Dataset:
    """Per-user time-weighted average of value (value held constant until
    the next event; the last event carries no duration — single-event
    users emit nothing). One entity exchange; per-run shifted-view
    durations, two sums. Oracle: lead() duration + ratio of sums."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        ts = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = pdf["value"].to_numpy(dtype=np.float64)
        nxt = np.empty(n, dtype=np.int64)
        nxt[:-1] = ts[1:]
        nxt[-1] = ts[-1]
        # a run's LAST row has no successor inside its run
        last = np.zeros(n, dtype=bool)
        last[:-1] = starts[1:] != starts[:-1]
        last[-1] = True
        dur = (nxt - ts) / 1e6
        dur[last] = 0.0
        work = pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "_vd": v * dur,
                "_d": dur,
                # count of lead-bearing rows: the oracle's WHERE nts IS NOT
                # NULL keeps a multi-event user whose events all share one
                # ts (sum 0/0 -> NaN in DuckDB); only single-event users
                # drop entirely
                "_n": (~last).astype(np.int64),
            }
        )
        g = work.groupby("user_id", sort=False).sum().reset_index()
        g = g[g["_n"] > 0]
        with np.errstate(invalid="ignore", divide="ignore"):
            g["twa"] = g["_vd"].to_numpy() / g["_d"].to_numpy()
        return g[["user_id", "twa"]]

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return _round(out, {"twa": 6})


def _contingency(sf_dir: str):
    """Bounded contingency counts for (event_type x user_id%4 segment):
    one distinct-keys grouped_reduce exchange; |types| x 4 cells."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    ds = _events(sf_dir, ["user_id", "event_type"])

    def seg(b: pa.Table) -> pa.Table:
        s = b.column("user_id").to_numpy(zero_copy_only=False) % 4
        return pa.table(
            {"event_type": b.column("event_type"), "segment": pa.array(s)}
        )

    cells = grouped_reduce(
        ds.map_batches(seg, batch_format="pyarrow"),
        ["event_type", "segment"],
        {"n": ("segment", "count")},
    )
    return cells.to_pandas()  # bounded: |types| x |segments| rows


def q_chi_square(sf_dir: str) -> "pd.DataFrame":
    """Chi-square independence test of event_type vs user segment
    (user_id % 4): the categorical-association data-quality gate. All
    heavy work is the ONE bounded contingency exchange; the statistic is
    driver arithmetic over |types| x |segments| cells. Oracle: the same
    expected-count formula in SQL over GROUP BY counts."""
    obs = _contingency(sf_dir)
    # densify: a structurally-empty cell still contributes (0-E)^2/E = E —
    # dropping it understates the statistic on sparse contingency tables
    types = sorted(obs["event_type"].unique())
    segs = sorted(obs["segment"].unique())
    full = pd.MultiIndex.from_product(
        [types, segs], names=["event_type", "segment"]
    )
    obs = (
        obs.set_index(["event_type", "segment"])
        .reindex(full, fill_value=0)
        .reset_index()
    )
    tot = float(obs["n"].sum())
    rt = obs.groupby("event_type")["n"].transform("sum").to_numpy()
    ct = obs.groupby("segment")["n"].transform("sum").to_numpy()
    exp = rt * ct / tot
    chi2 = float((((obs["n"].to_numpy() - exp) ** 2) / exp).sum())
    n_r = len(types)
    n_c = len(segs)
    from rp_extract_ray.functions.rounding import round_half_away

    return pd.DataFrame(
        {
            "chi2": [round_half_away(np.array([chi2]), 6)[0]],
            "dof": np.array([(n_r - 1) * (n_c - 1)], dtype=np.int64),
        }
    )


def q_mutual_information(sf_dir: str) -> "pd.DataFrame":
    """Mutual information (nats) between event_type and user segment —
    the dependency-strength complement of q_chi_square, same ONE bounded
    contingency exchange. Oracle: sum p*ln(p/(px*py)) in SQL."""
    obs = _contingency(sf_dir)
    tot = float(obs["n"].sum())
    p = obs["n"].to_numpy(dtype=np.float64) / tot
    px = obs.groupby("event_type")["n"].transform("sum").to_numpy() / tot
    py = obs.groupby("segment")["n"].transform("sum").to_numpy() / tot
    mi = float((p * np.log(p / (px * py))).sum())
    from rp_extract_ray.functions.rounding import round_half_away

    return pd.DataFrame({"mi": [round_half_away(np.array([mi]), 6)[0]]})


def q_group_spearman(sf_dir: str) -> Dataset:
    """Per-user Spearman rank correlation between value and time — the
    robust (monotonic) trend complement of the Pearson gates. Average
    ranks for ties (the standard fractional convention, replicated in SQL
    as rank() + (ties-1)/2), then Pearson over the rank vectors from
    per-user moment sums — one entity exchange, all-C kernels
    (pandas .rank + groupby sums). Zero-variance users emit NULL/NaN
    (DuckDB corr parity)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        run = starts
        ts = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        work = pd.DataFrame(
            {"run": run, "v": pdf["value"].to_numpy(), "t": ts}
        )
        g = work.groupby("run", sort=False)
        rv = g["v"].rank(method="average").to_numpy()
        rt = g["t"].rank(method="average").to_numpy()
        mom = pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "n": np.ones(len(pdf), dtype=np.int64),
                "sv": rv, "st": rt,
                "svv": rv * rv, "stt": rt * rt, "svt": rv * rt,
            }
        ).groupby("user_id", sort=False).sum().reset_index()
        n = mom["n"].to_numpy(dtype=np.float64)
        cov = mom["svt"] - mom["sv"] * mom["st"] / n
        vv = mom["svv"] - mom["sv"] ** 2 / n
        tt = mom["stt"] - mom["st"] ** 2 / n
        denom = np.sqrt(vv * tt)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where(denom > 0, cov / denom, np.nan)
        return pd.DataFrame({"user_id": mom["user_id"], "spearman": r})

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return _round(out, {"spearman": 6})


def q_rolling_distinct(sf_dir: str) -> Dataset:
    """Trailing 8-row distinct count of the coarse value code
    (floor(value)) per user (stages/lag.rolling_distinct_within): the
    windowed-cardinality feature, k(k-1)/2 shifted-view comparisons, one
    entity exchange. Oracle: len(list_distinct(list() OVER ROWS 7
    PRECEDING))."""
    from rp_extract_ray.stages.lag import rolling_distinct_within

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        v = pdf["value"].to_numpy(dtype=np.float64)
        nn = ~np.isnan(v)  # null codes never count nor suppress (oracle
        # parity: list_distinct drops NULLs)
        codes = np.where(nn, np.floor(v), 0.0).astype(np.int64)
        pdf["n_distinct_w"] = rolling_distinct_within(
            codes, starts, 8, valid=nn
        )
        return pdf

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return out.select_columns(["event_id", "user_id", "ts", "n_distinct_w"])


def q_cusum(sf_dir: str) -> Dataset:
    """Per-user CUSUM drift detector over value (changepoint/anomaly
    class): S_i = max(0, S_{i-1} + value_i - k), flag where S_i > h —
    inherently a sequential fold, but computed VECTORIZED via the closed
    form S_i = cum_i - min(0, running_min(cum)) (verified identity), so
    the kernel is one cumsum + one running-min per run. Exactness: the
    fold runs in integer cents (value*100 - 1200), so engine and oracle
    are bit-identical (the target_encode fixed-point rule). Oracle: the
    literal sequential recursion (per-row recursive CTE) — a genuinely
    independent formulation of the same fold."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    K_CENTS = 1200  # drift k = 12.00 (above the corpus mean, so S resets)
    H_CENTS = 1500  # alarm threshold h = 15.00

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            pdf["cusum"] = np.array([], dtype=np.float64)
            pdf["alarm"] = np.array([], dtype=np.int64)
            return pdf
        v = pdf["value"].to_numpy(dtype=np.float64)
        y = np.round(v * 100).astype(np.int64) - K_CENTS
        run = starts
        g = pd.DataFrame({"y": y, "r": run}).groupby("r", sort=False)
        cum = g["y"].cumsum().to_numpy()
        runmin = g["y"].cumsum().groupby(run).cummin().to_numpy()
        s = cum - np.minimum(runmin, 0)
        pdf["cusum"] = s / 100.0
        pdf["alarm"] = (s > H_CENTS).astype(np.int64)
        return pdf

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return _round(
        out.select_columns(["event_id", "user_id", "ts", "cusum", "alarm"]),
        {"cusum": 6},
    )


def q_ohlc_bars(sf_dir: str) -> Dataset:
    """15-minute OHLC bars per user (stages/timegrid.ohlc_bars): open/
    high/low/close/sum/count of value per (user, bucket) — first/last are
    order-dependent aggregates the tumbling aggregate cannot express; the
    exchange ships one partial bar per (user, bucket, block). Oracle:
    first_value / last_value window functions over the bucketed frame."""
    from rp_extract_ray.stages.timegrid import ohlc_bars

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    out = ohlc_bars(
        ds, entity_col=ENTITY, ts_col="ts", order_col="event_id",
        value_col="value", bucket_s=900.0, num_partitions=NP,
    )
    out = out.select_columns(
        ["user_id", "wstart", "open", "high", "low", "close", "vsum", "n"]
    )
    return _round(out, {"vsum": 6})


def q_group_entropy(sf_dir: str) -> Dataset:
    """Per-user Shannon entropy (nats) of the event-type distribution
    (stages/groupops.grouped_entropy) — the behavioral-diversity feature;
    distinct (user, type) count partials through ONE keyed exchange.
    Oracle: ln(N) - sum(n*ln(n))/N over GROUP BY counts (the identical
    float expression, so 6-dp rounding matches)."""
    from rp_extract_ray.stages.groupops import grouped_entropy

    ds = _events(sf_dir, ["user_id", "event_type"])
    return grouped_entropy(
        ds, ENTITY, "event_type", out_col="entropy", round_to=6,
        num_partitions=NP,
    )


def q_welch_t(sf_dir: str) -> pd.DataFrame:
    """Per-segment Welch two-sample t statistic: each event type's value
    distribution vs the REST of the corpus — the A/B-test significance
    shape. One map pass of (type, n, sum, sumsq) partials (a few rows per
    block), bounded driver combine over |types| rows, closed-form t from
    the pooled complements. Oracle: the same algebra spelled out in SQL
    over GROUP BY aggregates."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame(
                {"event_type": [], "_n": [], "_s": [], "_ss": []}
            )
        v = pdf["value"].to_numpy(dtype=np.float64)
        w = pd.DataFrame(
            {
                "event_type": pdf["event_type"].to_numpy(),
                "_n": (~np.isnan(v)).astype(np.int64),
                "_s": np.where(np.isnan(v), 0.0, v),
                "_ss": np.where(np.isnan(v), 0.0, v * v),
            }
        )
        return w.groupby("event_type", sort=False).sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    g = parts.groupby("event_type", sort=False).sum().reset_index()
    n1 = g["_n"].to_numpy(dtype=np.float64)
    s1 = g["_s"].to_numpy()
    ss1 = g["_ss"].to_numpy()
    N, S, SS = n1.sum(), s1.sum(), ss1.sum()
    n2, s2, ss2 = N - n1, S - s1, SS - ss1
    m1, m2 = s1 / n1, s2 / n2
    v1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
    v2 = (ss2 - s2 * s2 / n2) / (n2 - 1)
    t = (m1 - m2) / np.sqrt(v1 / n1 + v2 / n2)
    from rp_extract_ray.functions.rounding import round_half_away

    return pd.DataFrame(
        {
            "event_type": g["event_type"],
            "n": g["_n"].astype(np.int64),
            "mean": round_half_away(m1, 6),
            "t_welch": round_half_away(t, 6),
        }
    )


def q_role_report(sf_dir: str) -> Dataset:
    """Transcript-hygiene report on the north-rule schema
    (stages/turns.role_alternation_report): per-conversation role mix +
    role-alternation violations + first/last role under stable
    (ts, turn_idx) order. Events map to transcript turns exactly as the
    flagship does (conv_id=user_id, turn_idx=event_id) with the role drawn
    from the event type (click/view -> user, purchase/signup -> assistant,
    error -> tool). Oracle: lag/row_number window recompute."""
    from rp_extract_ray.stages.turns import role_alternation_report

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def to_turns(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        et = b.column("event_type")
        role = pc.case_when(
            pc.make_struct(
                pc.is_in(et, value_set=pa.array(["click", "view"])),
                pc.is_in(et, value_set=pa.array(["purchase", "signup"])),
            ),
            "user", "assistant", "tool",
        )
        return pa.table(
            {
                "conv_id": b.column("user_id"),
                "turn_idx": b.column("event_id"),
                "ts": b.column("ts"),
                "role": role,
            }
        )

    turns = ds.map_batches(to_turns, batch_format="pyarrow")
    return role_alternation_report(
        turns, conv_col="conv_id", order_cols=("ts", "turn_idx"),
        role_col="role", num_partitions=NP,
    )


def q_rolling_zscore(sf_dir: str) -> Dataset:
    """Trailing-window anomaly flags: z-score of each value against the
    PRECEDING 8 rows (current row excluded — the leakage-free online
    form), flag |z| > 2. Pure cumsum kernel over entity runs (prefix sums
    of v and v^2, window = clip(run_start, i-8)..i-1), one entity
    exchange. z is NULL when the trailing window holds < 2 values or has
    zero variance (SQL stddev semantics); the flag is 0 there. Oracle:
    AVG / STDDEV_SAMP OVER (ROWS BETWEEN 8 PRECEDING AND 1 PRECEDING)."""
    K = 8
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            pdf["zscore"] = np.array([], dtype=np.float64)
            pdf["anomaly"] = np.array([], dtype=np.int64)
            return pdf
        v = pdf["value"].to_numpy(dtype=np.float64)
        i = np.arange(n)
        # K masked shifted views of the trailing window (run-interior rows
        # only); the variance is computed WINDOW-MEAN-CENTERED (two-pass)
        # — a one-pass sum-of-squares fold fails the 6-dp gate on
        # near-zero-variance windows where |z| is large (the rolling_corr
        # lesson), and centering also makes an all-equal window exactly 0
        V = np.full((K, n), np.nan)
        for j in range(1, K + 1):
            V[j - 1, j:] = v[:-j]
            V[j - 1, i - j < starts] = np.nan
        m = np.sum(~np.isnan(V), axis=0)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = np.nansum(V, axis=0) / m
            d = V - mean[None, :]
            var = np.nansum(d * d, axis=0) / (m - 1)
            z = (v - mean) / np.sqrt(var)
        bad = (m < 2) | ~np.isfinite(z)
        z = np.where(bad, np.nan, z)
        pdf["zscore"] = z
        pdf["anomaly"] = np.where(~bad & (np.abs(z) > 2.0), 1, 0).astype(
            np.int64
        )
        return pdf

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return _round(
        out.select_columns(["event_id", "user_id", "ts", "zscore", "anomaly"]),
        {"zscore": 6},
    )


def _covisit_edges(sf_dir: str, keep_count: bool = False) -> Dataset:
    """Shared co-visitation graph for the graph gates: distinct user pairs
    active in the same (event_type, 300 s bucket) cell
    (stages/graph.covisit_edges). 300 s keeps hot cells small (the
    bucket-width skew rule) while leaving a connected graph at every
    testdata scale. ``keep_count`` keeps the shared-cell count ``n``
    (the weighted gates' edge weight)."""
    from rp_extract_ray.stages.graph import covisit_edges

    ds = _events(sf_dir, ["ts", "user_id", "event_type"])

    def bucket(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "_bk": (t // np.int64(300_000_000)),
                "user_id": b.column("user_id"),
            }
        )

    keyed = ds.map_batches(bucket, batch_format="pyarrow")
    # pin the (small) edge list: every graph gate is multi-pass over it
    return covisit_edges(
        keyed, ["event_type", "_bk"], "user_id", out_names=("u", "v"),
        num_partitions=NP, keep_count=keep_count,
    ).materialize()


def _pr_named(pr):
    """(node, rank) -> (user_id, pr) on either pagerank return type: the
    bounded-path DataFrame, or the >2M-node path's distributed Dataset
    (which must NOT be pulled to the driver)."""
    if isinstance(pr, pd.DataFrame):
        return pd.DataFrame({"user_id": pr["node"], "pr": pr["rank"]})
    return pr.map_batches(
        lambda b: pa.table(
            {"user_id": b.column("node"), "pr": b.column("rank")}
        ),
        batch_format="pyarrow",
    )


def q_pagerank(sf_dir: str) -> pd.DataFrame:
    """PageRank (5 power iterations, d=0.85) over the co-visitation user
    graph (stages/graph.pagerank) — the influence-score feature. Bounded
    node table -> broadcast rank-vector path (the kmeans centroid-loop
    contract); the >2M-node exchange path is pytest-gated equal. Oracle:
    the same five iterations unrolled as join-aggregate CTEs."""
    from rp_extract_ray.stages.graph import pagerank

    pr = pagerank(
        _covisit_edges(sf_dir), iterations=5, damping=0.85, round_to=6,
        num_partitions=NP,
    )
    return _pr_named(pr)


def q_triangle_count(sf_dir: str) -> pd.DataFrame:
    """Triangle count of the co-visitation graph
    (stages/graph.triangle_count): wedge-generation keyed on the middle
    vertex + packed-key semi-join close — the clustering-coefficient
    numerator. Oracle: oriented 3-way self-join."""
    from rp_extract_ray.stages.graph import triangle_count

    n = triangle_count(_covisit_edges(sf_dir), num_partitions=NP)
    return pd.DataFrame({"triangles": np.array([n], dtype=np.int64)})


def q_interval_gaps(sf_dir: str) -> Dataset:
    """Idle gaps between merged activity islands: the complement of
    merge_intervals — after coalescing each user's view-spans into maximal
    islands (stages/intervals.merge_intervals), emit (gap_start, gap_end,
    gap_s) between consecutive islands. The island table is orders of
    magnitude smaller than the events, so the second entity exchange is
    nearly free. Oracle: the merge CTE + lead() over islands."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.intervals import merge_intervals

    ds = _events(sf_dir, ["ts", "user_id", "event_type", "value"])

    def mk(b: pa.Table) -> pa.Table:
        b = b.filter(pc.equal(b.column("event_type"), "view"))
        dur_us = pc.cast(
            pc.multiply(pc.floor(b.column("value")), 60_000_000.0), pa.int64()
        )
        end = pc.add(b.column("ts"), pc.cast(dur_us, pa.duration("us")))
        return pa.table(
            {
                "user_id": b.column("user_id"),
                "start_ts": b.column("ts"),
                "end_ts": end,
            }
        )

    merged = merge_intervals(
        ds.map_batches(mk, batch_format="pyarrow"),
        entity_col="user_id", start_col="start_ts", end_col="end_ts",
        num_partitions=NP,
    )

    def gaps(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        cols = ["user_id", "gap_start", "gap_end", "gap_s"]
        if n == 0:
            return pd.DataFrame({c: [] for c in cols})
        same_run = np.zeros(n, dtype=bool)
        if n > 1:
            same_run[:-1] = starts[1:] == starts[:-1]  # next row same user
        s = pdf["start_ts"].to_numpy().astype("datetime64[us]")
        e = pdf["end_ts"].to_numpy().astype("datetime64[us]")
        idx = np.flatnonzero(same_run)
        gs = e[idx]
        ge = s[idx + 1]
        return pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy()[idx],
                "gap_start": gs,
                "gap_end": ge,
                "gap_s": (ge - gs).astype(np.int64) / 1e6,
            }
        )

    out = partitioned_apply(
        merged, gaps, entity_col=ENTITY, order_cols=("start_ts", "end_ts"),
        num_partitions=NP,
    )
    return _round(out, {"gap_s": 6})


def q_pct_change(sf_dir: str) -> Dataset:
    """Per-user percent change of value vs the previous event — the
    classic relative-delta feature on top of the lag kernel
    (stages/lag.add_lag_features). NULL at run starts (no lag), SQL
    division semantics otherwise (value is never 0 in this corpus, but
    the kernel guards anyway). Oracle: (value - lag)/lag window SQL."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    ds = add_lag_features(
        ds, ["value"], lags=(1,), entity_col=ENTITY, ts_col="ts",
        order_cols=ORDER, num_partitions=NP,
    )

    def fin(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        v = b.column("value").to_numpy(zero_copy_only=False)
        l1 = b.column("value_lag1").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            p = (v - l1) / l1
        p = np.where(np.isfinite(p), p, np.nan)
        out = pa.table(
            {
                "event_id": b.column("event_id"),
                "user_id": b.column("user_id"),
                "ts": b.column("ts"),
                "pct_change": pa.array(p),
            }
        )
        return out

    out = ds.map_batches(fin, batch_format="pyarrow")
    return _round(out, {"pct_change": 6})


def q_path_counts(sf_dir: str) -> pd.DataFrame:
    """Frequent-prefix sequence mining: each user's first-5-event-type
    path (under stable (ts, event_id) order), counted across users, top
    20 by (count desc, path) — the funnel-discovery complement of the
    ORDERED transition matrix. One entity exchange builds paths
    (vectorized rebased-index prefix mask + per-run join), ONE bounded
    keyed exchange counts them (path vocabulary <= |types|^5), driver
    top-k on the bounded count table. Oracle: row_number <= 5 +
    string_agg + LIMIT under the same tie order."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.partition import arrow_out

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def paths(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({"path": [], "_n": []})
        i = np.arange(n)
        keep = (i - starts) < 5
        w = pd.DataFrame(
            {
                "_run": starts[keep],
                "event_type": pdf["event_type"].to_numpy()[keep],
            }
        )
        p = w.groupby("_run", sort=False)["event_type"].agg(">".join)
        out = p.value_counts().rename("_n").reset_index()
        out.columns = ["path", "_n"]
        out["_n"] = out["_n"].astype(np.int64)
        return out

    parts = partitioned_apply(
        ds, paths, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    counts = grouped_reduce(
        parts, "path", {"n": ("_n", "sum")}, num_partitions=NP
    ).to_pandas()  # bounded by the path vocabulary (<= |types|^5)
    counts["n"] = counts["n"].astype(np.int64)
    counts = counts.sort_values(
        ["n", "path"], ascending=[False, True], ignore_index=True
    )
    return counts.head(20)


def q_mann_whitney(sf_dir: str) -> pd.DataFrame:
    """Mann-Whitney rank statistics per event type vs the whole corpus,
    WITHOUT a global sort: tied average ranks depend only on the VALUE
    DISTRIBUTION, so one keyed exchange of distinct (value, type) counts
    (bounded by the value vocabulary — 2-decimal values here) feeds a
    driver-side cumulative pass that assigns avg-rank(v) = below(v) +
    (count(v)+1)/2 and folds rank-sum and U per type. The scale path is
    the same histogram trick the approx-quantile sketch uses. Oracle:
    rank() + (tie_count-1)/2 window SQL."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    ds = _events(sf_dir, ["event_type", "value"])

    def drop_null(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.is_valid(b.column("value")))

    counts = grouped_reduce(
        ds.map_batches(drop_null, batch_format="pyarrow"),
        ["value", "event_type"],
        {"c": ("value", "count")},
        num_partitions=NP,
    ).to_pandas()
    counts = counts.sort_values("value", ignore_index=True)
    per_v = counts.groupby("value", sort=True)["c"].sum()
    below = np.concatenate([[0], np.cumsum(per_v.to_numpy())[:-1]])
    avg_rank = pd.Series(
        below + (per_v.to_numpy() + 1) / 2.0, index=per_v.index
    )
    counts["_ar"] = counts["value"].map(avg_rank).to_numpy()
    counts["_w"] = counts["_ar"] * counts["c"].to_numpy()
    g = (
        counts.groupby("event_type", sort=False)
        .agg(n=("c", "sum"), rank_sum=("_w", "sum"))
        .reset_index()
    )
    n = g["n"].to_numpy(dtype=np.float64)
    rs = g["rank_sum"].to_numpy(dtype=np.float64)
    from rp_extract_ray.functions.rounding import round_half_away

    return pd.DataFrame(
        {
            "event_type": g["event_type"],
            "n": g["n"].astype(np.int64),
            "rank_sum": round_half_away(rs, 6),
            "u": round_half_away(rs - n * (n + 1) / 2.0, 6),
        }
    )


def q_autocorr(sf_dir: str) -> Dataset:
    """Per-user lag-1 autocorrelation of value — the serial-dependence
    descriptor (the temporal sibling of group_spearman's monotone-trend
    gate). One entity exchange; the kernel pairs each row with its
    run-interior predecessor and folds Pearson moments per run (rows with
    a NULL on either side of the pair drop, SQL corr semantics). Oracle:
    corr(value, lag(value)) per user."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({"user_id": [], "ac1": []})
        v = pdf["value"].to_numpy(dtype=np.float64)
        prev = np.full(n, np.nan)
        prev[1:] = v[:-1]
        interior = np.zeros(n, dtype=bool)
        if n > 1:
            interior[1:] = starts[1:] == starts[:-1]
        ok = interior & ~np.isnan(v) & ~np.isnan(prev)
        w = pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy()[ok],
                "n": np.ones(ok.sum(), dtype=np.int64),
                "sx": v[ok], "sy": prev[ok],
                "sxx": v[ok] * v[ok], "syy": prev[ok] * prev[ok],
                "sxy": v[ok] * prev[ok],
            }
        )
        m = w.groupby("user_id", sort=False).sum().reset_index()
        cn = m["n"].to_numpy(dtype=np.float64)
        cov = m["sxy"] - m["sx"] * m["sy"] / cn
        vx = m["sxx"] - m["sx"] ** 2 / cn
        vy = m["syy"] - m["sy"] ** 2 / cn
        denom = np.sqrt(vx * vy)
        with np.errstate(invalid="ignore", divide="ignore"):
            r = np.where(denom > 0, cov / denom, np.nan)
        # EVERY user in the frame gets a row — a user with zero valid
        # (value, lag) pairs emits NULL ac1, exactly like SQL corr() over
        # an all-dropped group (oracle row-count parity)
        users = pd.Series(pdf["user_id"].to_numpy()[starts == np.arange(n)])
        out = pd.DataFrame({"user_id": users})
        out["ac1"] = out["user_id"].map(
            pd.Series(r, index=m["user_id"])
        ).to_numpy()
        return out

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return _round(out, {"ac1": 6})


def q_clustering_coeff(sf_dir: str) -> Dataset:
    """Local clustering coefficient per user on the co-visitation graph
    (stages/graph.clustering_coefficient): 2*tri/(deg*(deg-1)), degree-1
    nodes 0.0 — the community-density feature over the same edges the
    pagerank/triangle gates use. Oracle: 3-way-join triangles UNNESTed to
    member nodes + degree table."""
    from rp_extract_ray.stages.graph import clustering_coefficient

    out = clustering_coefficient(
        _covisit_edges(sf_dir), round_to=6, num_partitions=NP
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "user_id": b.column("node"),
                "deg": b.column("deg"),
                "triangles": b.column("triangles"),
                "lcc": b.column("lcc"),
            }
        ),
        batch_format="pyarrow",
    )


def q_response_latency(sf_dir: str) -> Dataset:
    """Per-conversation assistant response latency on the north-rule
    transcript mapping (same role mapping as role_report): for every
    assistant turn, seconds since the most recent STRICTLY PRECEDING user
    turn (row-based, carried forward within the conversation), aggregated
    per conversation to (n_responses, mean, max). The carry-forward is a
    per-run cummax-then-shift — one entity exchange, no join. Oracle:
    MAX(CASE role='user' ...) OVER (ROWS ... 1 PRECEDING)."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        cols = ["conv_id", "n_responses", "mean_latency_s", "max_latency_s"]
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({c: [] for c in cols})
        et = pdf["event_type"].to_numpy()
        role_user = (et == "click") | (et == "view")
        role_asst = (et == "purchase") | (et == "signup")
        t = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        u = np.where(role_user, t, np.iinfo(np.int64).min)
        run = starts
        s = pd.Series(u)
        cm = s.groupby(run, sort=False).cummax()
        last_user = cm.groupby(run, sort=False).shift(1).to_numpy()
        ok = role_asst & ~np.isnan(last_user) & (
            np.nan_to_num(last_user, nan=np.iinfo(np.int64).min)
            > np.iinfo(np.int64).min
        )
        # exact integer-microsecond fold (the target_encode fixed-point
        # rule): float-per-element sums sit on 6-dp rounding boundaries
        lat_us = t[ok] - last_user[ok].astype(np.int64)
        w = pd.DataFrame(
            {
                "conv_id": pdf["user_id"].to_numpy()[ok],
                "n_responses": np.ones(int(ok.sum()), dtype=np.int64),
                "_s": lat_us,
                "_mx": lat_us,
            }
        )
        g = w.groupby("conv_id", sort=False).agg(
            n_responses=("n_responses", "sum"),
            _s=("_s", "sum"), _mx=("_mx", "max"),
        ).reset_index()
        from rp_extract_ray.functions.rounding import round_half_away

        g["mean_latency_s"] = round_half_away(
            g["_s"].to_numpy(dtype=np.float64)
            / g["n_responses"].to_numpy() / 1e6, 6
        )
        g["max_latency_s"] = round_half_away(
            g["_mx"].to_numpy(dtype=np.float64) / 1e6, 6
        )
        return g[cols]

    return partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )


def q_group_geomean(sf_dir: str) -> pd.DataFrame:
    """Geometric mean of value per event type: exp(mean(ln v)) — the
    multiplicative-scale average (log-domain moments make it a plain
    associative sum, so it is one bounded (type, n, sum_ln) partial
    reduce, zero shuffle). Oracle: exp(avg(ln(value)))."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"event_type": [], "_n": [], "_sl": []})
        v = pdf["value"].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v) & (v > 0)
        w = pd.DataFrame(
            {
                "event_type": pdf["event_type"].to_numpy(),
                "_n": ok.astype(np.int64),
                "_sl": np.where(ok, np.log(np.where(ok, v, 1.0)), 0.0),
            }
        )
        return w.groupby("event_type", sort=False).sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    g = parts.groupby("event_type", sort=False).sum().reset_index()
    # a type with NO positive values has no SQL group at all (the WHERE
    # clause removed every row) — drop it rather than emit (n=0, NaN)
    g = g[g["_n"] > 0].reset_index(drop=True)
    from rp_extract_ray.functions.rounding import round_half_away

    return pd.DataFrame(
        {
            "event_type": g["event_type"],
            "n": g["_n"].astype(np.int64),
            "geomean": round_half_away(
                np.exp(g["_sl"].to_numpy() / g["_n"].to_numpy()), 6
            ),
        }
    )


def q_ks_statistic(sf_dir: str) -> pd.DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic per event type vs the REST
    of the corpus — like mann_whitney, a rank statistic recovered WITHOUT
    a global sort from the distinct (value, type) count exchange: the
    driver's cumulative pass over the bounded value vocabulary evaluates
    KS = max_v |F_t(v) - F_rest(v)| with pure-integer cumulative counts
    (both sides evaluate the identical ratio expression). Oracle:
    densified grid + RANGE cumulative windows."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    ds = _events(sf_dir, ["event_type", "value"])

    def drop_null(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.is_valid(b.column("value")))

    counts = grouped_reduce(
        ds.map_batches(drop_null, batch_format="pyarrow"),
        ["value", "event_type"],
        {"c": ("value", "count")},
        num_partitions=NP,
    ).to_pandas()
    piv = (
        counts.pivot_table(
            index="value", columns="event_type", values="c",
            aggfunc="sum", fill_value=0,
        )
        .sort_index()
    )
    cum = piv.cumsum(axis=0).to_numpy(dtype=np.float64)
    ng = piv.sum(axis=0).to_numpy(dtype=np.float64)
    na = ng.sum()
    call = cum.sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore", divide="ignore"):
        d = np.abs(cum / ng[None, :] - (call - cum) / (na - ng)[None, :])
    ks = d.max(axis=0)
    from rp_extract_ray.functions.rounding import round_half_away

    return pd.DataFrame(
        {
            "event_type": piv.columns.to_numpy(),
            "ks": round_half_away(ks, 6),
        }
    )


def q_scd2_intervals(sf_dir: str) -> Dataset:
    """Slowly-changing-dimension type-2 history build: each user's value
    changes become validity intervals [valid_from, valid_to) with the
    latest row open (NULL valid_to) — the changelog-to-history shape (the
    interval complement of cdc_merge's snapshot apply). Pure lead kernel
    on the entity exchange. Oracle: lead(ts) window SQL."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            pdf["valid_to"] = np.array([], dtype="datetime64[us]")
            return pdf.rename(columns={"ts": "valid_from"})
        t = pdf["ts"].to_numpy().astype("datetime64[us]")
        nxt = np.full(n, np.datetime64("NaT", "us"))
        if n > 1:
            same = starts[1:] == starts[:-1]
            nxt[:-1][same] = t[1:][same]
        out = pd.DataFrame(
            {
                "event_id": pdf["event_id"].to_numpy(),
                "user_id": pdf["user_id"].to_numpy(),
                "valid_from": t,
                "valid_to": nxt,
                "value": pdf["value"].to_numpy(),
            }
        )
        return out

    return partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )


def q_type_jaccard(sf_dir: str) -> pd.DataFrame:
    """Jaccard similarity between event types over their USER SETS:
    J(a,b) = |users(a) & users(b)| / |users(a) | users(b)| — the
    segment-overlap matrix, assembled from the distinct co-membership
    counts (stages/groupops.cooccurrence_pairs) plus per-type distinct
    user counts; the |types|^2 driver fold is trivially bounded. Oracle:
    distinct-pair self-join + per-type distinct counts."""
    from rp_extract_ray.stages.groupops import cooccurrence_pairs, grouped_reduce

    ds = _events(sf_dir, ["user_id", "event_type"])
    co = cooccurrence_pairs(
        ds, ENTITY, "event_type", out_names=("t1", "t2"), num_partitions=NP
    ).to_pandas()
    # distinct (user, type) via one keyed count exchange, then per-type
    # distinct-user counts (the bounded |types| table)
    d1 = grouped_reduce(
        ds, ["user_id", "event_type"], {"c": ("user_id", "count")},
        num_partitions=NP,
    )
    per_type = (
        grouped_reduce(
            d1, "event_type", {"nu": ("user_id", "count")},
            num_partitions=NP,
        )
        .to_pandas()
        .set_index("event_type")["nu"]
    )
    from rp_extract_ray.functions.rounding import round_half_away

    inter = co["n"].to_numpy(dtype=np.float64)
    na = co["t1"].map(per_type).to_numpy(dtype=np.float64)
    nb = co["t2"].map(per_type).to_numpy(dtype=np.float64)
    return pd.DataFrame(
        {
            "t1": co["t1"],
            "t2": co["t2"],
            "n_both": co["n"].astype(np.int64),
            "jaccard": round_half_away(inter / (na + nb - inter), 6),
        }
    )


def q_conversion_time(sf_dir: str) -> Dataset:
    """Signup-to-first-purchase conversion latency per user: the
    two-stage funnel timing — first signup ts, then the first purchase
    STRICTLY AFTER it; users who signed up but never converted appear
    with NULL conversion (the funnel-drop row). One entity exchange,
    pure boundary kernel. Oracle: min-filter + correlated min."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        cols = ["user_id", "signup_ts", "purchase_ts", "conv_s"]
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({c: [] for c in cols})
        et = pdf["event_type"].to_numpy()
        t = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = pdf["user_id"].to_numpy()
        w = pd.DataFrame(
            {
                "user_id": uid,
                "_su": np.where(et == "signup", t, np.iinfo(np.int64).max),
            }
        )
        first_su = w.groupby("user_id", sort=False)["_su"].min()
        su = first_su[first_su < np.iinfo(np.int64).max]
        if len(su) == 0:
            return pd.DataFrame({c: [] for c in cols})
        su_arr = pd.Series(uid).map(su).to_numpy(dtype=np.float64)
        is_p = (et == "purchase") & ~np.isnan(su_arr) & (t > su_arr)
        w2 = pd.DataFrame(
            {
                "user_id": uid[is_p],
                "_pu": t[is_p],
            }
        )
        first_p = w2.groupby("user_id", sort=False)["_pu"].min()
        out = pd.DataFrame({"user_id": su.index.to_numpy(),
                            "_su": su.to_numpy()})
        pu = out["user_id"].map(first_p).to_numpy(dtype=np.float64)
        out["signup_ts"] = out["_su"].astype("datetime64[us]")
        pts = np.full(len(out), np.datetime64("NaT", "us"))
        got = ~np.isnan(pu)
        pts[got] = pu[got].astype(np.int64).astype("datetime64[us]")
        out["purchase_ts"] = pts
        from rp_extract_ray.functions.rounding import round_half_away

        out["conv_s"] = round_half_away(
            (pu - out["_su"].to_numpy()) / 1e6, 6
        )
        return out[cols]

    return partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )


def q_degree_histogram(sf_dir: str) -> Dataset:
    """Degree distribution of the co-visitation graph: node degree from
    one count exchange over the symmetrized edges, then a second bounded
    exchange counting nodes per degree value — the graph-shape sanity
    gate (power-law eyeball at scale). Oracle: two GROUP BYs over the
    symmetrized edge CTE."""
    from rp_extract_ray.stages.graph import _symmetrize
    from rp_extract_ray.stages.groupops import grouped_reduce

    deg = grouped_reduce(
        _symmetrize(_covisit_edges(sf_dir), "u", "v"),
        "src", {"deg": ("dst", "count")}, num_partitions=NP,
    )
    out = grouped_reduce(
        deg, "deg", {"n_nodes": ("src", "count")}, num_partitions=NP
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "deg": b.column("deg").cast(pa.int64()),
                "n_nodes": b.column("n_nodes").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_pagerank_weighted(sf_dir: str) -> pd.DataFrame:
    """Weight-proportional PageRank over the co-visitation graph: edge
    weight = number of shared (event_type, bucket) cells, walk probability
    proportional to weight (stages/graph.pagerank with weight_col) — the
    strength-aware influence score. Oracle: the same unrolled iterations
    with w/W ratios."""
    from rp_extract_ray.stages.graph import pagerank

    pr = pagerank(
        _covisit_edges(sf_dir, keep_count=True), iterations=5,
        damping=0.85, round_to=6, num_partitions=NP, weight_col="n",
    )
    return _pr_named(pr)


def q_dq_violations(sf_dir: str) -> pd.DataFrame:
    """Data-quality expectation suite over events: per-rule violation
    counts (null value, value out of range, unknown event type, timestamp
    out of bounds, duplicate event id) — the ingest contract gate a
    production pipeline runs before anything else. Four rules are
    zero-shuffle vectorized predicates (one int per rule per block); the
    uniqueness rule is one keyed count exchange. Oracle: per-rule SQL
    counts UNION ALL."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.groupops import grouped_reduce

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])
    TYPES = ["click", "error", "purchase", "signup", "view"]
    LO = np.datetime64("2024-01-01", "us")
    HI = np.datetime64("2031-01-01", "us")

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("value")
        ts = b.column("ts")
        et = b.column("event_type")
        n_null = v.null_count
        rng = pc.sum(
            pc.cast(
                pc.or_kleene(pc.less(v, 0.0), pc.greater(v, 1000.0)),
                pa.int64(),
            )
        ).as_py() or 0
        dom = pc.sum(
            pc.cast(
                pc.fill_null(  # NULL type is a domain violation (oracle)
                    pc.invert(pc.is_in(et, value_set=pa.array(TYPES))), True
                ),
                pa.int64(),
            )
        ).as_py() or 0
        tsv = ts.cast(pa.int64())
        tb = pc.sum(
            pc.cast(
                pc.or_kleene(
                    pc.less(tsv, int(LO.astype(np.int64))),
                    pc.greater_equal(tsv, int(HI.astype(np.int64))),
                ),
                pa.int64(),
            )
        ).as_py() or 0
        return pa.table(
            {
                "rule": pa.array(
                    ["value_null", "value_range", "type_domain", "ts_bounds"]
                ),
                "n": pa.array([n_null, rng, dom, tb], pa.int64()),
            }
        )

    parts = (
        ds.map_batches(partial, batch_format="pyarrow").to_pandas()
        .groupby("rule", sort=False).sum().reset_index()
    )
    # uniqueness: rows participating in duplicate event_ids
    idc = grouped_reduce(
        ds.select_columns(["event_id"]), "event_id",
        {"c": ("event_id", "count")}, num_partitions=NP,
    )

    def dup_rows(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc2

        c = b.column("c")
        dups = pc2.sum(
            pc2.if_else(pc2.greater(c, 1), c, pa.scalar(0, c.type))
        ).as_py() or 0
        return pa.table({"n": pa.array([dups], pa.int64())})

    nd = int(
        idc.map_batches(dup_rows, batch_format="pyarrow").to_pandas()["n"].sum()
    )
    out = pd.concat(
        [parts, pd.DataFrame({"rule": ["dup_event_id"], "n": [nd]})],
        ignore_index=True,
    )
    order = ["value_null", "value_range", "type_domain", "ts_bounds",
             "dup_event_id"]
    out["_o"] = out["rule"].map({r: i for i, r in enumerate(order)})
    out = out.sort_values("_o", ignore_index=True).drop(columns="_o")
    out["n"] = out["n"].astype(np.int64)
    return out


def q_group_winsorize(sf_dir: str) -> Dataset:
    """Per-group winsorization: value clipped to each event type's
    [p05, p95] band — the grouped form of the global winsorize gate.
    Thresholds come from one grouped-quantiles exchange (bounded |types|
    rows), broadcast back as a lookup, clip is a zero-shuffle vectorized
    map. Oracle: quantile_cont window aggregates + LEAST/GREATEST."""
    import ray

    from rp_extract_ray.stages.groupops import grouped_quantiles

    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "value"])
    th = grouped_quantiles(
        ds, "event_type", "value", [0.05, 0.95],
        out_names=["p05", "p95"],
    ).to_pandas()  # bounded: one row per type
    lut = (
        dict(zip(th["event_type"], th["p05"])),
        dict(zip(th["event_type"], th["p95"])),
    )
    ref = ray.put(lut)

    def clip(pdf: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        lo_m, hi_m = _ray.get(ref)
        lo = pdf["event_type"].map(lo_m).to_numpy(dtype=np.float64)
        hi = pdf["event_type"].map(hi_m).to_numpy(dtype=np.float64)
        v = pdf["value"].to_numpy(dtype=np.float64)
        pdf = pdf[["event_id", "user_id", "event_type"]].copy()
        pdf["value_w"] = np.minimum(np.maximum(v, lo), hi)
        return pdf

    out = ds.map_batches(clip, batch_format="pandas")
    return _round(out, {"value_w": 6})


def q_window_argmax(sf_dir: str) -> Dataset:
    """Per-(user, day) argmax: the single highest-value event of each
    user-day with a deterministic event_id tiebreak — the grouped-top-1
    resample shape (stages/groupops.grouped_topk with a derived bucket
    key; map-side prune means at most one row per (user, day) per block
    reaches the exchange). Oracle: row_number per (user, day)."""
    from rp_extract_ray.stages.groupops import grouped_topk

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])

    def day(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = (t // np.int64(86_400_000_000)) * np.int64(86_400_000_000)
        return b.append_column("day", pa.array(d).cast(pa.timestamp("us")))

    keyed = ds.map_batches(day, batch_format="pyarrow")
    out = grouped_topk(
        keyed, ["user_id", "day"], ["value", "event_id"],
        descending=[True, False], k=1,
    )
    out = out.select_columns(["user_id", "day", "event_id", "value"])
    return _round(out, {"value": 6})


def q_interarrival_hist(sf_dir: str) -> Dataset:
    """Log-binned inter-arrival-time histogram: per-user gaps between
    consecutive events, bucketed at floor(log2(gap_s)) and counted — the
    traffic-shape fingerprint (one entity exchange for the gaps, one
    bounded bin exchange for the counts; sub-second gaps clamp to bin 0).
    Oracle: lag + floor(log2) + GROUP BY."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def gaps(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({"bin": pd.Series([], dtype=np.int64)})
        t = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        interior = np.zeros(n, dtype=bool)
        if n > 1:
            interior[1:] = starts[1:] == starts[:-1]
        g = np.full(n, np.nan)
        g[1:] = (t[1:] - t[:-1]) / 1e6
        g = g[interior & (g > 0)]
        b = np.maximum(np.floor(np.log2(g)), 0.0).astype(np.int64)
        return pd.DataFrame({"bin": b})

    binned = partitioned_apply(
        ds, gaps, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    out = grouped_reduce(
        binned, "bin", {"n_gaps": ("bin", "count")}, num_partitions=NP
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "bin": b.column("bin").cast(pa.int64()),
                "n_gaps": b.column("n_gaps").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_daily_change(sf_dir: str) -> pd.DataFrame:
    """Daily event volume with day-over-day percent change — the
    monitoring dashboard primitive. Distinct-day count exchange (bounded
    by the calendar), driver lag over the tiny day table. Oracle:
    GROUP BY day + lag window."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.functions.rounding import round_half_away

    ds = _events(sf_dir, ["ts"])

    def day(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = (t // np.int64(86_400_000_000)) * np.int64(86_400_000_000)
        return pa.table({"day": pa.array(d)})

    counts = grouped_reduce(
        ds.map_batches(day, batch_format="pyarrow"),
        "day", {"n": ("day", "count")}, num_partitions=NP,
    ).to_pandas().sort_values("day", ignore_index=True)  # bounded: calendar
    n = counts["n"].to_numpy(dtype=np.float64)
    prev = np.full(len(n), np.nan)
    prev[1:] = n[:-1]
    with np.errstate(invalid="ignore", divide="ignore"):
        chg = (n - prev) / prev
    return pd.DataFrame(
        {
            "day": counts["day"].to_numpy().astype("datetime64[us]"),
            "n": counts["n"].astype(np.int64),
            "pct_change": round_half_away(chg, 6),
        }
    )


def q_survival_km(sf_dir: str) -> pd.DataFrame:
    """Kaplan-Meier survival curve for time-to-first-purchase with 5-day
    administrative censoring: per-user event time t = floor(days from
    first event to first purchase) if within 5 days, else censored at
    t=5 — the retention/conversion lifetime estimator. One entity
    exchange folds each user to (t, death); a bounded (t, death) count
    exchange reaches the driver (day grid x 2 rows) where the product
    fold runs as exp(cumsum(ln(1 - d/n))) — the exact expression the
    window-SQL oracle evaluates. Output: one row per death day."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    HORIZON_S = 5 * 86400

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def fold(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"t": [], "death": [], "_n": []})
        t = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = pdf["user_id"].to_numpy()
        et = pdf["event_type"].to_numpy()
        w = pd.DataFrame(
            {
                "u": uid,
                "_f": t,
                "_p": np.where(
                    et == "purchase", t, np.iinfo(np.int64).max
                ),
            }
        )
        g = w.groupby("u", sort=False).min()
        dt_s = (g["_p"].to_numpy() - g["_f"].to_numpy()) / 1e6
        death = (g["_p"].to_numpy() < np.iinfo(np.int64).max) & (
            dt_s < HORIZON_S
        )
        tday = np.where(death, np.floor(dt_s / 86400.0), 5.0).astype(
            np.int64
        )
        out = pd.DataFrame(
            {"t": tday, "death": death.astype(np.int64)}
        )
        c = out.value_counts().rename("_n").reset_index()
        return c

    per_user = partitioned_apply(
        ds, fold, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    counts = grouped_reduce(
        per_user, ["t", "death"], {"n": ("_n", "sum")}
    ).to_pandas()  # bounded: day grid x {death, censored}
    if len(counts) == 0 or "n" not in counts.columns:
        # empty corpus: a zero-block reduce loses its schema; the SQL
        # oracle evaluates cleanly to zero rows
        return pd.DataFrame(
            {"t_day": pd.Series([], dtype=np.int64),
             "n_risk": pd.Series([], dtype=np.int64),
             "d_events": pd.Series([], dtype=np.int64),
             "surv": pd.Series([], dtype=np.float64)}
        )
    counts["n"] = counts["n"].astype(np.int64)
    deaths = (
        counts[counts["death"] == 1]
        .sort_values("t", ignore_index=True)[["t", "n"]]
    )
    total = counts["n"].sum()
    # n_risk(t) = users with t_i >= t (deaths and censored alike)
    all_t = counts.groupby("t", sort=True)["n"].sum()
    below = np.concatenate([[0], np.cumsum(all_t.to_numpy())[:-1]])
    at_risk = total - pd.Series(below, index=all_t.index)
    n_risk = deaths["t"].map(at_risk).to_numpy(dtype=np.float64)
    d = deaths["n"].to_numpy(dtype=np.float64)
    # d == n_risk (everyone remaining converts) can only be the LAST
    # step: contribute ln(1)=0 there and pin that row's surv to 0 —
    # the exact guard the SQL oracle evaluates (DuckDB ln(0) errors)
    zero = d == n_risk
    surv = np.exp(
        np.cumsum(np.log(np.where(zero, 1.0, 1.0 - d / n_risk)))
    )
    surv = np.where(zero, 0.0, surv)
    from rp_extract_ray.functions.rounding import round_half_away

    return pd.DataFrame(
        {
            "t_day": deaths["t"].astype(np.int64),
            "n_risk": n_risk.astype(np.int64),
            "d_events": deaths["n"].astype(np.int64),
            "surv": round_half_away(surv, 6),
        }
    )


def q_ccf_profile(sf_dir: str) -> Dataset:
    """Per-user cross-correlation profile: Pearson corr(value_t,
    value_{t-k}) for lags k = 1..3 — the autocorrelation function
    (autocorr's k=1 generalized; the serial-structure fingerprint).
    One entity exchange; the kernel folds all three lags' moment sums in
    one pass over the runs. Rows with a NULL on either side of a pair
    drop (SQL corr). Oracle: one lag CTE per k, UNION ALL."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "value"])
    LAGS = (1, 2, 3)

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({"user_id": [], "k": [], "ccf": []})
        v = pdf["value"].to_numpy(dtype=np.float64)
        uid = pdf["user_id"].to_numpy()
        outs = []
        for k in LAGS:
            prev = np.full(n, np.nan)
            prev[k:] = v[:-k]
            interior = np.zeros(n, dtype=bool)
            interior[k:] = starts[k:] == starts[:-k]
            ok = interior & ~np.isnan(v) & ~np.isnan(prev)
            w = pd.DataFrame(
                {
                    "user_id": uid,
                    "n": ok.astype(np.int64),
                    "sx": np.where(ok, v, 0.0),
                    "sy": np.where(ok, prev, 0.0),
                    "sxx": np.where(ok, v * v, 0.0),
                    "syy": np.where(ok, prev * prev, 0.0),
                    "sxy": np.where(ok, v * prev, 0.0),
                }
            )
            m = w.groupby("user_id", sort=False).sum().reset_index()
            cn = m["n"].to_numpy(dtype=np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                cov = m["sxy"] - m["sx"] * m["sy"] / cn
                vx = m["sxx"] - m["sx"] ** 2 / cn
                vy = m["syy"] - m["sy"] ** 2 / cn
                denom = np.sqrt(vx * vy)
                r = np.where(denom > 0, cov / denom, np.nan)
            outs.append(
                pd.DataFrame(
                    {
                        "user_id": m["user_id"],
                        "k": np.full(len(m), k, dtype=np.int64),
                        "ccf": r,
                    }
                )
            )
        return pd.concat(outs, ignore_index=True)

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return _round(out, {"ccf": 6})


def q_transition_entropy(sf_dir: str) -> pd.DataFrame:
    """Conditional entropy of the event-type Markov chain: H(next | prev)
    = -sum p(a,b) ln(p(b|a)) over adjacent same-user transitions — the
    sequence-predictability scalar (low = rigid flows, high = random).
    Per-run shifted-view transition counts, one bounded (a, b) exchange
    (|types|^2 cells), driver arithmetic from integer counts — the same
    float expression the oracle evaluates. Output: one row (plus the
    marginal next-entropy H(next) and the information gain)."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def trans(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({"a": [], "b": [], "_n": []})
        et = pdf["event_type"].to_numpy()
        interior = np.zeros(n, dtype=bool)
        if n > 1:
            interior[1:] = starts[1:] == starts[:-1]
        w = pd.DataFrame(
            {"a": np.roll(et, 1)[interior], "b": et[interior]}
        )
        c = w.value_counts().rename("_n").reset_index()
        c["_n"] = c["_n"].astype(np.int64)
        return c

    pairs = partitioned_apply(
        ds, trans, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    c = grouped_reduce(
        pairs, ["a", "b"], {"n": ("_n", "sum")}
    ).to_pandas()  # bounded: |types|^2
    if len(c) == 0 or "n" not in c.columns:
        # zero same-user transitions: the oracle's empty-aggregate row
        # is (NULL, NULL, NULL)
        return pd.DataFrame(
            {"h_cond": [np.nan], "h_next": [np.nan], "info_gain": [np.nan]}
        )
    n = c["n"].to_numpy(dtype=np.float64)
    tot = n.sum()
    na = c.groupby("a")["n"].transform("sum").to_numpy(dtype=np.float64)
    nb = c.groupby("b")["n"].sum()
    h_cond = -np.sum((n / tot) * np.log(n / na))
    pb = nb.to_numpy(dtype=np.float64) / tot
    h_next = -np.sum(pb * np.log(pb))
    from rp_extract_ray.functions.rounding import round_half_away

    return pd.DataFrame(
        {
            "h_cond": [round_half_away(h_cond, 6)],
            "h_next": [round_half_away(h_next, 6)],
            "info_gain": [round_half_away(h_next - h_cond, 6)],
        }
    )


def q_burstiness(sf_dir: str) -> Dataset:
    """Per-user burstiness index B = (sigma - mu) / (sigma + mu) of the
    inter-arrival times (Goh-Barabasi): -1 = periodic, 0 = Poisson,
    -> 1 = bursty. Gap moments fold per run in one entity exchange;
    population sigma (the classical definition), NULL for < 2 gaps.
    Oracle: lag-gap CTE + aggregate moments."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({"user_id": [], "n_gaps": [], "b": []})
        t = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        uid = pdf["user_id"].to_numpy()
        interior = np.zeros(n, dtype=bool)
        if n > 1:
            interior[1:] = starts[1:] == starts[:-1]
        g = np.zeros(n)
        g[1:] = (t[1:] - t[:-1]) / 1e6
        w = pd.DataFrame(
            {
                "user_id": uid,
                "n": interior.astype(np.int64),
                "s": np.where(interior, g, 0.0),
                "ss": np.where(interior, g * g, 0.0),
            }
        )
        m = w.groupby("user_id", sort=False).sum().reset_index()
        cn = m["n"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            mu = m["s"] / cn
            var = np.maximum(m["ss"] / cn - mu * mu, 0.0)
            sd = np.sqrt(var)
            b = np.where(cn >= 2, (sd - mu) / (sd + mu), np.nan)
        return pd.DataFrame(
            {
                "user_id": m["user_id"],
                "n_gaps": m["n"].astype(np.int64),
                "b": b,
            }
        )

    out = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    return _round(out, {"b": 6})


def q_active_users(sf_dir: str) -> Dataset:
    """DAU / WAU / stickiness: distinct daily actives, trailing-7-day
    distinct actives, and their ratio per activity day — the
    product-analytics engagement triple. Scale shape: ONE distinct
    (day, user) exchange (8+8 B/pair), a bounded per-day count, a fixed
    7-fan window explode re-deduped through a second distinct exchange
    (a user active on several window days counts once), and a
    calendar-bounded join. Oracle: DISTINCT day-user CTE + UNNEST 7-day
    replication."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    ds = _events(sf_dir, ["ts", "user_id"])

    def day(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": t // np.int64(86_400_000_000),
                "user_id": b.column("user_id"),
            }
        )

    du = grouped_reduce(
        ds.map_batches(day, batch_format="pyarrow"),
        ["day", "user_id"], {"_c": ("user_id", "count")},
        num_partitions=NP,
    ).select_columns(["day", "user_id"]).materialize()  # distinct pairs

    dau = grouped_reduce(
        du, "day", {"dau": ("user_id", "count")}, num_partitions=NP
    )

    def fan(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        ks = np.arange(7, dtype=np.int64)
        n = len(b)
        return pa.table(
            {
                "day": np.repeat(d, 7) + np.tile(ks, n),
                "user_id": np.repeat(u, 7),
            }
        )

    win_distinct = grouped_reduce(
        du.map_batches(fan, batch_format="pyarrow"),
        ["day", "user_id"], {"_c": ("user_id", "count")},
        num_partitions=NP,
    ).select_columns(["day", "user_id"])
    wau = grouped_reduce(
        win_distinct, "day", {"wau": ("user_id", "count")},
        num_partitions=NP,
    )
    joined = repartition_join(
        dau, wau, on="day", num_partitions=NP, right_cols=["day", "wau"]
    )

    def fin(b: pa.Table) -> pa.Table:
        from rp_extract_ray.functions.rounding import round_half_away

        da = b.column("dau").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        wa = b.column("wau").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        return pa.table(
            {
                "day": b.column("day").cast(pa.int64()),
                "dau": b.column("dau").cast(pa.int64()),
                "wau": b.column("wau").cast(pa.int64()),
                "stickiness": pa.array(round_half_away(da / wa, 6)),
            }
        )

    return joined.map_batches(fin, batch_format="pyarrow")


def q_new_vs_returning(sf_dir: str) -> Dataset:
    """New vs returning actives per day: each user's FIRST-SEEN day splits
    that day's distinct actives — the acquisition/retention monitor.
    Distinct (day, user) pairs ride one exchange; the first-seen table is
    a second keyed min reduce that REJOINS DISTRIBUTED (task-shuffle join
    on user_id — the first-seen table is user-table-sized, NOT a
    broadcast candidate at corpus scale); the split folds in a bounded
    per-day count exchange. Oracle: min-day CTE + conditional counts."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    ds = _events(sf_dir, ["ts", "user_id"])

    def day(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": t // np.int64(86_400_000_000),
                "user_id": b.column("user_id"),
            }
        )

    dued = ds.map_batches(day, batch_format="pyarrow")
    du = grouped_reduce(
        dued, ["day", "user_id"], {"_c": ("user_id", "count")},
        num_partitions=NP,
    ).select_columns(["day", "user_id"]).materialize()
    first = grouped_reduce(
        du.map_batches(
            lambda b: pa.table(
                {"user_id": b.column("user_id"), "fday": b.column("day")}
            ),
            batch_format="pyarrow",
        ),
        "user_id", {"fday": ("fday", "min")}, num_partitions=NP,
    )
    joined = repartition_join(
        du, first, on="user_id", num_partitions=NP,
        right_cols=["user_id", "fday"],
    )

    def tag(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        fd = b.column("fday").to_numpy(zero_copy_only=False)
        new = (d == fd).astype(np.int64)
        return pa.table({"day": d, "n_new": new, "n_ret": 1 - new})

    out = grouped_reduce(
        joined.map_batches(tag, batch_format="pyarrow"),
        "day", {"n_new": ("n_new", "sum"), "n_ret": ("n_ret", "sum")},
        num_partitions=NP,
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "day": b.column("day").cast(pa.int64()),
                "n_new": b.column("n_new").cast(pa.int64()),
                "n_ret": b.column("n_ret").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_activity_gini(sf_dir: str) -> pd.DataFrame:
    """Gini coefficient of per-user event counts — the activity-inequality
    scalar (how concentrated the corpus is in heavy users; the Lorenz
    summary a curation pass checks before capping). Per-user counts are
    one bounded exchange (|users| rows to the driver); the sorted-rank
    formula G = 2*sum(i*x_i)/(n*sum(x)) - (n+1)/n runs on the bounded
    table, ties broken by count order only (rank formula is
    tie-invariant). Oracle: the same closed form via row_number."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.functions.rounding import round_half_away

    ds = _events(sf_dir, ["user_id"])
    counts = grouped_reduce(
        ds, "user_id", {"n": ("user_id", "count")}, num_partitions=NP
    ).to_pandas()  # bounded: per-user totals
    if len(counts) == 0 or "n" not in counts.columns:
        # empty corpus: the oracle emits (n_users=0, gini NULL)
        return pd.DataFrame(
            {"n_users": np.array([0], dtype=np.int64), "gini": [np.nan]}
        )
    x = np.sort(counts["n"].to_numpy(dtype=np.float64))
    n = len(x)
    i = np.arange(1, n + 1, dtype=np.float64)
    g = 2.0 * np.sum(i * x) / (n * np.sum(x)) - (n + 1.0) / n
    return pd.DataFrame(
        {
            "n_users": np.array([n], dtype=np.int64),
            "gini": [round_half_away(g, 6)],
        }
    )


def q_daily_quantiles(sf_dir: str) -> Dataset:
    """Per-day value quantile bands (p50 / p90) — the monitoring
    time-series of distribution drift (stages/groupops.grouped_quantiles
    keyed on the derived day). Oracle: quantile_cont GROUP BY day."""
    from rp_extract_ray.stages.groupops import grouped_quantiles

    ds = _events(sf_dir, ["ts", "value"])

    def day(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "day": t // np.int64(86_400_000_000),
                "value": b.column("value"),
            }
        )

    out = grouped_quantiles(
        ds.map_batches(day, batch_format="pyarrow"),
        "day", "value", [0.5, 0.9], out_names=["p50", "p90"], round_to=6,
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "day": b.column("day").cast(pa.int64()),
                "n": b.column("n").cast(pa.int64()),
                "p50": b.column("p50"),
                "p90": b.column("p90"),
            }
        ),
        batch_format="pyarrow",
    )


def q_group_trimmed_mean(sf_dir: str) -> Dataset:
    """Per-type 10-90 trimmed mean: the robust location estimate over the
    [p10, p90] interior (inclusive bounds, quantile_cont interpolation on
    BOTH sides) — one grouped holistic exchange (values co-located per
    type), vectorized np.quantile + masked mean per group. Oracle:
    window-quantile filter + AVG."""
    from rp_extract_ray.stages.partition import partitioned_apply

    ds = _events(sf_dir, ["event_type", "value"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        cols = ["event_type", "n_kept", "trimmed_mean"]
        if len(pdf) == 0:
            return pd.DataFrame({c: [] for c in cols})
        out = []
        for t, g in pdf.groupby("event_type", sort=False):
            v = g["value"].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            if len(v) == 0:
                # all-NULL type: the oracle's WHERE removed every row,
                # so no group exists (the q_group_geomean rule)
                continue
            lo = np.quantile(v, 0.1)
            hi = np.quantile(v, 0.9)
            keep = v[(v >= lo) & (v <= hi)]
            out.append((t, len(keep), keep.mean()))
        res = pd.DataFrame(out, columns=cols)
        res["n_kept"] = res["n_kept"].astype(np.int64)
        from rp_extract_ray.functions.rounding import round_half_away

        res["trimmed_mean"] = round_half_away(
            res["trimmed_mean"].to_numpy(), 6
        )
        return res

    return partitioned_apply(
        ds, fn, entity_col="event_type", order_cols=("value",),
        num_partitions=NP,
    )


def q_median_centered(sf_dir: str) -> Dataset:
    """Row-level robust centering: value minus its event type's median —
    the MAD-family residual feature. The medians come from ONE grouped
    holistic exchange (bounded |types| rows), broadcast back; the
    centering is a zero-shuffle vectorized map. Oracle: median window
    aggregate per type."""
    import ray

    from rp_extract_ray.stages.groupops import grouped_mad

    # two consumers (median lineage + centering map): read once
    ds = _events(
        sf_dir, ["event_id", "user_id", "event_type", "value"]
    ).materialize()
    med = grouped_mad(ds, "event_type", "value").to_pandas()
    lut = dict(zip(med["event_type"], med["med"]))
    ref = ray.put(lut)

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        m = _ray.get(ref)
        md = pdf["event_type"].map(m).to_numpy(dtype=np.float64)
        v = pdf["value"].to_numpy(dtype=np.float64)
        out = pdf[["event_id", "user_id", "event_type"]].copy()
        out["centered"] = v - md
        return out

    out = ds.map_batches(center, batch_format="pandas")
    return _round(out, {"centered": 6})


def q_lorenz_deciles(sf_dir: str) -> pd.DataFrame:
    """Lorenz curve by user decile: share of total events contributed by
    each decile of users ordered by activity — the curve behind the Gini
    scalar (which decile to cap is THE curation question). Bounded
    per-user count exchange, driver ntile fold with the same
    deterministic (n, user_id) order as the SQL. Oracle: ntile(10) +
    share-of-sum."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.functions.rounding import round_half_away

    ds = _events(sf_dir, ["user_id"])
    counts = grouped_reduce(
        ds, "user_id", {"n": ("user_id", "count")}, num_partitions=NP
    ).to_pandas()  # bounded: per-user totals
    counts = counts.sort_values(
        ["n", "user_id"], ignore_index=True
    )
    m = len(counts)
    # SQL ntile: the FIRST (m % 10) tiles get floor(m/10)+1 rows
    q, r = divmod(m, 10)
    sizes = np.array([q + 1] * r + [q] * (10 - r), dtype=np.int64)
    counts["decile"] = np.repeat(np.arange(1, 11), sizes)
    g = counts.groupby("decile", sort=True)["n"].agg(["sum", "count"])
    tot = float(counts["n"].sum())
    return pd.DataFrame(
        {
            "decile": g.index.to_numpy().astype(np.int64),
            "n_users": g["count"].to_numpy().astype(np.int64),
            "share": round_half_away(g["sum"].to_numpy() / tot, 6),
        }
    )


def q_hourly_profile(sf_dir: str) -> Dataset:
    """Hour-of-day activity profile per event type — the diurnal-shape
    fingerprint; one bounded (type, hour) count exchange. Oracle:
    GROUP BY type, hour."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    ds = _events(sf_dir, ["ts", "event_type"])

    def hour(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_type": b.column("event_type"),
                "hour": (t // np.int64(3_600_000_000)) % np.int64(24),
            }
        )

    out = grouped_reduce(
        ds.map_batches(hour, batch_format="pyarrow"),
        ["event_type", "hour"], {"n": ("hour", "count")},
        num_partitions=NP,
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "event_type": b.column("event_type"),
                "hour": b.column("hour").cast(pa.int64()),
                "n": b.column("n").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_sessions_per_user(sf_dir: str) -> Dataset:
    """Distribution of session counts: how many users have exactly k
    sessions (30-min inactivity gap — the same threshold the sessionize
    gate uses) — the engagement-depth histogram. The boundary count folds
    inside the ONE entity exchange (sessions per user = 1 + gap
    violations), then a bounded per-k count exchange. Oracle:
    gaps-and-islands count per user + histogram."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    ds = _events(sf_dir, ["event_id", "ts", "user_id"])

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        n = len(pdf)
        if n == 0:
            return pd.DataFrame({"n_sessions": pd.Series([], dtype=np.int64),
                                 "_c": pd.Series([], dtype=np.int64)})
        t = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        interior = np.zeros(n, dtype=bool)
        if n > 1:
            interior[1:] = starts[1:] == starts[:-1]
        gap = np.zeros(n)
        gap[1:] = (t[1:] - t[:-1]) / 1e6
        brk = interior & (gap > 1800.0)
        w = pd.DataFrame(
            {
                "u": pdf["user_id"].to_numpy(),
                "b": brk.astype(np.int64),
            }
        )
        per_user = w.groupby("u", sort=False)["b"].sum() + 1
        c = per_user.value_counts().rename("_c").reset_index()
        c.columns = ["n_sessions", "_c"]
        c["_c"] = c["_c"].astype(np.int64)
        return c

    per = partitioned_apply(
        ds, fn, entity_col=ENTITY, order_cols=ORDER, num_partitions=NP
    )
    out = grouped_reduce(
        per, "n_sessions", {"n_users": ("_c", "sum")}, num_partitions=NP
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "n_sessions": b.column("n_sessions").cast(pa.int64()),
                "n_users": b.column("n_users").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_user_zscore(sf_dir: str) -> pd.DataFrame:
    """Two-level aggregation: each user's mean value standardized against
    the population of USER MEANS (not raw rows) — the
    aggregate-of-aggregates shape (cohort outlier screening). Level 1:
    per-user (n, mean) in one keyed exchange; level 2: population moments
    of the means as a bounded driver fold; the standardized score maps
    back without a second exchange. Oracle: per-user CTE + AVG/STDDEV
    window over it."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.functions.rounding import round_half_away

    ds = _events(sf_dir, ["user_id", "value"])

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"user_id": [], "_n": [], "_s": []})
        v = pdf["value"].to_numpy(dtype=np.float64)
        ok = ~np.isnan(v)
        # exact integer-cents fold (the target_encode fixed-point rule):
        # float sums of 2-decimal values land on 6-dp half boundaries
        cents = np.where(ok, np.round(v * 100), 0.0).astype(np.int64)
        w = pd.DataFrame(
            {
                "user_id": pdf["user_id"].to_numpy(),
                "_n": ok.astype(np.int64),
                "_s": cents,
            }
        )
        return w.groupby("user_id", sort=False).sum().reset_index()

    from rp_extract_ray.stages.partition import arrow_out

    per_user = grouped_reduce(
        ds.map_batches(
            lambda b: arrow_out(partial(b.to_pandas())),
            batch_format="pyarrow",
        ),
        "user_id", {"_n": ("_n", "sum"), "_s": ("_s", "sum")},
        num_partitions=NP,
    ).to_pandas()  # bounded: one row per user
    per_user = per_user[per_user["_n"] > 0].reset_index(drop=True)
    mu_u = (
        per_user["_s"].to_numpy(dtype=np.float64)
        / per_user["_n"].to_numpy()
        / 100.0
    )
    m = mu_u.mean()
    sd = mu_u.std(ddof=1)
    z = (mu_u - m) / sd
    return pd.DataFrame(
        {
            "user_id": per_user["user_id"],
            "user_mean": round_half_away(mu_u, 6),
            "z": round_half_away(z, 6),
        }
    )


def q_conversion_ci(sf_dir: str) -> pd.DataFrame:
    """Purchase-share per user segment (user_id % 4) with a 95% Wald
    confidence interval — the A/B readout shape (rate, half-width, and
    bounds from bounded (segment, conversions, n) partials; zero
    shuffle). Oracle: conditional counts + the same closed form."""
    from rp_extract_ray.functions.rounding import round_half_away

    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"segment": [], "_c": [], "_n": []})
        seg = pdf["user_id"].to_numpy() % 4
        conv = (pdf["event_type"].to_numpy() == "purchase").astype(
            np.int64
        )
        w = pd.DataFrame(
            {"segment": seg, "_c": conv, "_n": np.ones(len(pdf), np.int64)}
        )
        return w.groupby("segment", sort=False).sum().reset_index()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    g = parts.groupby("segment", sort=True).sum().reset_index()
    n = g["_n"].to_numpy(dtype=np.float64)
    p = g["_c"].to_numpy(dtype=np.float64) / n
    half = 1.96 * np.sqrt(p * (1.0 - p) / n)
    return pd.DataFrame(
        {
            "segment": g["segment"].astype(np.int64),
            "n": g["_n"].astype(np.int64),
            "rate": round_half_away(p, 6),
            "ci_lo": round_half_away(p - half, 6),
            "ci_hi": round_half_away(p + half, 6),
        }
    )


def q_cohort_ltv(sf_dir: str) -> pd.DataFrame:
    """Cohort LTV matrix: cumulative value by (first-seen-day cohort,
    days-since-first-seen age) — the retention-revenue readout next to
    cohort_retention's user counts. First-seen day is a keyed min reduce
    REJOINED DISTRIBUTED onto the events (user-table-sized side); cell
    sums fold in EXACT integer cents through one bounded (cohort, age)
    exchange; the running sum over age runs on the calendar-bounded grid
    driver-side. Oracle: min-day CTE + window cumsum."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join
    from rp_extract_ray.functions.rounding import round_half_away

    ds = _events(sf_dir, ["ts", "user_id", "value"])

    def day(b: pa.Table) -> pa.Table:
        t = b.column("ts").cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = b.column("value").to_numpy(zero_copy_only=False)
        cents = np.where(np.isnan(v), 0.0, np.round(v * 100)).astype(
            np.int64
        )
        return pa.table(
            {
                "day": t // np.int64(86_400_000_000),
                "user_id": b.column("user_id"),
                "cents": cents,
            }
        )

    dued = ds.map_batches(day, batch_format="pyarrow").materialize()
    first = grouped_reduce(
        dued.map_batches(
            lambda b: pa.table(
                {"user_id": b.column("user_id"), "fd": b.column("day")}
            ),
            batch_format="pyarrow",
        ),
        "user_id", {"fd": ("fd", "min")}, num_partitions=NP,
    )
    joined = repartition_join(
        dued, first, on="user_id", num_partitions=NP,
        right_cols=["user_id", "fd"],
    )

    def cell(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        fd = b.column("fd").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort": fd,
                "age": d - fd,
                "cents": b.column("cents"),
                "_one": np.ones(len(b), dtype=np.int64),
            }
        )

    g = grouped_reduce(
        joined.map_batches(cell, batch_format="pyarrow"),
        ["cohort", "age"],
        {"n_events": ("_one", "sum"), "cents": ("cents", "sum")},
        num_partitions=NP,
    ).to_pandas()  # bounded: calendar x calendar grid
    g = g.sort_values(["cohort", "age"], ignore_index=True)
    g["_cum"] = g.groupby("cohort", sort=False)["cents"].cumsum()
    return pd.DataFrame(
        {
            "cohort": g["cohort"].astype(np.int64),
            "age": g["age"].astype(np.int64),
            "n_events": g["n_events"].astype(np.int64),
            "cum_value": round_half_away(
                g["_cum"].to_numpy(dtype=np.float64) / 100.0, 6
            ),
        }
    )
