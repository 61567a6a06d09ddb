"""Benchmark driver.

Headline: as-of join + windowed feature backfill (the north-rule metric) over
a deterministic synthetic transcript corpus (~1M turns, heavy-tailed conv
lengths, cached under /tmp so every run and both scaling levels read the same
bytes), plus representative per-query timings over $GRAFT_SF_DIR testdata.

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "turns_per_sec": ...}

--scaling: runs the headline twice in fresh processes (num_cpus=8 and 32) on
the same input and reports both throughputs + scaling efficiency
(BASELINE.md protocol; 8 vs 32 CPUs stands in for N vs 4N nodes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

# All-to-all exchanges live in the object store; the default ~43% of RAM
# starts spilling at ~10M turns and halves throughput. Must be set before
# ray.init.
os.environ.setdefault("RAY_DEFAULT_OBJECT_STORE_MEMORY_PROPORTION", "0.55")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_CORPUS = os.environ.get("GRAFT_BENCH_CORPUS", "/tmp/graft_bench_corpus_v6")
HEADLINE_ONLY = os.environ.get("GRAFT_BENCH_HEADLINE_ONLY", "0") == "1"

QUERY_NAMES = [
    "lag_lead", "sessionize", "window_stats", "asof_backward",
    "backfill", "tpch_q1", "dedup_exact", "join_agg",
    "time_grid", "knn_cosine", "minhash_pairs", "standardize",
    "window_features_full", "cosine_pairs", "top_terms",
    "hll_distinct", "near_dup_clusters", "langid",
    "range_join", "ewma", "topk_per_group", "bloom_semi_join",
    "tfidf_top_terms", "approx_quantiles", "funnel",
    "kmeans_clusters", "range_partition", "cube_orders", "heavy_hitters",
    "token_ids", "bigram_pmi", "time_bucket", "merge_intervals",
    "cohort_retention", "knn_ivf", "boilerplate",
    "curation", "nb_classify", "time_grid_lerp", "transitions",
    "redact", "pack_sequences", "pack_stats",
    "ring_stream", "group_mode", "group_corr", "unpivot",
    # round-5 additions (sweep grew 47 -> 62 names: cross-round SUM
    # comparisons must use the shared prefix; per-query values compare 1:1)
    "rolling_median", "minmax_scale", "group_minmax", "latest_per_key",
    "char_entropy", "edit_distance_pairs", "tpch_q3", "tpch_q6",
    "order_count_dist", "large_orders", "priority_returns",
    "embedding_covariance", "pca_variance", "lm_score", "knn_lsh",
    # round-5 session-3 additions (62 -> 76 names)
    "tpch_q5", "tpch_q14", "histogram", "intersect_keys", "except_keys",
    "event_paths", "hash_split", "mix_weighted", "replicate_weighted",
    "domain_cap", "weighted_avg", "profile_columns", "cooccurrence",
    "embedding_norms",
    # round-5 session-4 additions (76 -> 80 names)
    "tpch_q10", "tpch_q18", "feature_matrix", "dup_spans",
    # round-5 session-5 additions (80 -> 83 names)
    "tpch_q12", "union_keys", "cms_counts",
    # round-5 session-6 additions (83 -> 94 names)
    "tpch_q15", "tpch_q17", "tpch_q7", "tpch_q21", "tpch_q22", "group_mad",
    "tpch_q8", "tpch_q19", "window_edges", "corpus_diff", "regex_extract",
    "rolling_corr",
    # round-5 session-7 additions (94 -> 117 names)
    "hopping_window", "dense_grid", "rollup_orders", "skyline",
    "interval_overlap", "bm25", "target_encode", "quantile_normalize",
    "connected_components", "hopping_distinct", "debounce", "throttle",
    "band_join", "concurrency", "weighted_median", "time_weighted_avg",
    "cdc_merge", "chi_square", "mutual_information", "group_spearman",
    "cusum",
    "rolling_distinct",
    # round-5 session-8 additions (117 -> 165 names)
    "ohlc_bars", "group_entropy", "welch_t", "role_report",
    "rolling_zscore", "pagerank", "triangle_count", "interval_gaps",
    "pct_change", "keyword_totals", "path_counts", "mann_whitney",
    "autocorr", "clustering_coeff", "response_latency", "group_geomean",
    "ks_statistic", "scd2_intervals", "type_jaccard", "conversion_time",
    "degree_histogram", "hashed_features", "compression_ratio",
    "pagerank_weighted", "dq_violations", "top_terms_per_lang",
    "embedding_drift", "group_winsorize", "window_argmax",
    "interarrival_hist", "daily_change", "sorted_neighborhood",
    "survival_km", "ccf_profile", "transition_entropy", "burstiness",
    "active_users", "new_vs_returning", "activity_gini", "daily_quantiles",
    "group_trimmed_mean", "median_centered", "lorenz_deciles",
    "hourly_profile", "sessions_per_user", "user_zscore", "conversion_ci", "cohort_ltv",
]


def build_corpus() -> dict:
    from rp_extract_ray.synth import write_corpus

    # Shard count: 64 on the default 3.96M-turn corpus — the SAME protocol as
    # every prior round's official headline, so numbers stay comparable.
    # Round-5 A/B (32 CPUs, interleaved): 64 shards best 11.7-12.3 s vs 192
    # shards 17.9-19.2 s — at this corpus size more shards only add fixed
    # per-shard cost (a project read + a rejoin re-read per shard); the r4
    # "underfill" reading of the 32-CPU scaling leg was therefore NOT a wave
    # artifact worth fixing this way. The 63k-conv sustained-scale corpus
    # gets 192 shards (~143k turns/shard) where per-shard cost amortizes and
    # the 8-CPU leg keeps 24 task waves. GRAFT_BENCH_CONVS scales the corpus
    # (63_000 ~= the 27.4M-turn protocol); the cache dir changes with it.
    n_convs = int(os.environ.get("GRAFT_BENCH_CONVS", "9000"))
    default_shards = 64 if n_convs <= 20_000 else 192
    shards = int(os.environ.get("GRAFT_BENCH_SHARDS", str(default_shards)))
    corpus = BENCH_CORPUS if n_convs == 9000 else f"{BENCH_CORPUS}_c{n_convs}"
    if shards != default_shards:
        corpus = f"{corpus}_s{shards}"
    return write_corpus(corpus, n_convs=n_convs, seed=13, mean_turns=150, shards=shards)


def wait_for_idle(max_wait_s: float = 120.0, load_frac: float = 0.25) -> float:
    """Idle-machine guard: round-2's official bench recorded 17.1 s while
    same-code fresh runs measured 10.5-12.2 s — co-running work on this
    shared VM skews the artifact. Wait (bounded) until the 1-min load
    average drops below ``load_frac`` of the machine's CPUs AND live
    hypervisor steal is under 2%% (steal is invisible to the load average
    but dominates wall time: measured 18.6 s at 0.1%% steal vs 103 s at
    12%% steal for the same repeat); return the load at the moment we
    proceed so the artifact records the conditions."""
    ncpu = os.cpu_count() or NUM_CPUS
    deadline = time.monotonic() + max_wait_s

    def steal_now() -> float:
        s0, t0 = _stat_jiffies()
        time.sleep(2.0)
        s1, t1 = _stat_jiffies()
        return 100.0 * (s1 - s0) / max(1, t1 - t0)

    load = os.getloadavg()[0]
    while time.monotonic() < deadline:
        if load <= load_frac * ncpu and steal_now() < 2.0:
            break
        time.sleep(5.0)
        load = os.getloadavg()[0]
    return round(load, 2)


def run_headline(paths: dict) -> dict:
    import ray.data as rd

    from rp_extract_ray.pipelines.flagship import (
        feature_backfill,
        feature_backfill_payload_light,
    )
    from rp_extract_ray.state.metrics import MetricsSink, drain_metrics
    from rp_extract_ray.sources.pqio import read_parquet_clean

    # warm the page cache so we measure compute + shuffle, not first disk
    # read — a bare count() is satisfied from parquet METADATA and warms
    # nothing (measured: 75 s cold first repeat vs 16 s warm); force a full
    # byte read instead
    import pyarrow as pa

    n_turns = int(
        read_parquet_clean(paths["transcripts"])
        .map_batches(
            lambda b: pa.table({"n": pa.array([len(b)], pa.int64())}),
            batch_format="pyarrow",
        )
        .sum("n")
    )

    # single-node wall times jitter +-30% (shared VM); report the best of
    # GRAFT_BENCH_REPEATS runs as the steady-state throughput, and every
    # repeat's wall time so the artifact carries the variance. The FIRST
    # repeat always pays the Ray worker/actor spawn storm (vmstat during it:
    # up to 76% system time + 30% hypervisor steal, zero disk IO) — it
    # doubles as the worker-pool warm-up that byte-level reads cannot do.
    repeats = int(os.environ.get("GRAFT_BENCH_REPEATS", "4"))
    parts = int(os.environ.get("GRAFT_BENCH_PARTS", str(max(4 * NUM_CPUS, 32))))
    mode = os.environ.get("GRAFT_BENCH_MODE", "light")  # light | through
    metrics_dir = os.environ.get("GRAFT_BENCH_METRICS", "/tmp/graft_bench_metrics")
    shard_files = sorted(
        os.path.join(paths["transcripts"], f)
        for f in os.listdir(paths["transcripts"])
    ) if os.path.isdir(paths["transcripts"]) else [paths["transcripts"]]
    secs: list[float] = []
    steals: list[float] = []
    metrics_rows = 0
    for _ in range(repeats):
        st0, tot0 = _stat_jiffies()
        t0 = time.perf_counter()
        if mode == "light":
            # NO metrics sink inside timed repeats: the sidecar costs one
            # blocking actor RPC per partition serialized through a single
            # actor — real lineage overhead for production runs, but it
            # would contaminate the headline number being compared across
            # rounds (round 2 ran sink-less)
            ds = feature_backfill_payload_light(
                shard_files,
                read_parquet_clean(paths["conv_events"]),
                k=16,
                num_partitions=parts,
            )
        else:
            ds = feature_backfill(
                read_parquet_clean(paths["transcripts"]),
                read_parquet_clean(paths["conv_events"]),
                k=16,
                num_partitions=parts,
            )
        out_rows = ds.count()
        secs.append(round(time.perf_counter() - t0, 3))
        st1, tot1 = _stat_jiffies()
        steals.append(
            round(100.0 * (st1 - st0) / max(1, tot1 - tot0), 1)
        )
        assert out_rows == n_turns, (out_rows, n_turns)
    sink = None
    if mode == "light":
        # W8/A10 lineage sidecar: one UNTIMED instrumented pass after the
        # repeats writes the per-partition rows-in/out + latency parquet
        sink = MetricsSink.remote()
        feature_backfill_payload_light(
            shard_files,
            read_parquet_clean(paths["conv_events"]),
            k=16,
            num_partitions=parts,
            metrics_sink=sink,
        ).count()
        mdf = drain_metrics(sink)
        metrics_rows = len(mdf)
        os.makedirs(metrics_dir, exist_ok=True)
        mdf.to_parquet(os.path.join(metrics_dir, "_metrics.parquet"))
    best = min(secs)
    return {
        "sec": best,
        "turns": n_turns,
        "turns_per_sec": n_turns / best,
        "repeat_secs": secs,
        "repeat_steal_pct": steals,
        "metrics_rows": metrics_rows,
        "metrics_path": os.path.join(metrics_dir, "_metrics.parquet")
        if sink is not None
        else None,
    }


def run_ring(paths: dict) -> dict:
    """Streaming ring path at bench-corpus scale (VERDICT r4 item 7): the
    corpus rows arrive INTERLEAVED across conversations (the generator
    emits them in arrival order, like a production event log), so the feed
    build sorts to the conversation-contiguous ts stream the ring contract
    requires, materializes it once, and both ring variants then time PURE
    stream consumption. The sf0.1 events-table entry (``ring_stream`` in
    the sweep) stays the correctness-scale number; this one measures
    actor-stream throughput on 3.96M turns where spawn costs amortize.
    Output identity sharded==single is pytest-gated (test_ring_timegrid)."""
    import pyarrow as pa

    from rp_extract_ray.sources.pqio import read_parquet_clean
    from rp_extract_ray.stages.ring import (
        streaming_window_features,
        streaming_window_features_sharded,
    )
    from rp_extract_ray.stages.turns import add_turn_stats

    shard_files = sorted(
        os.path.join(paths["transcripts"], f)
        for f in os.listdir(paths["transcripts"])
    ) if os.path.isdir(paths["transcripts"]) else [paths["transcripts"]]

    # ring state tracks the numeric series only — drop the payload before
    # it enters the actor stream. materialize() is load-bearing twice over:
    # it keeps block order deterministic for the stream contract AND breaks
    # operator fusion — without it Ray Data fuses read->stats->ring into
    # the concurrency-1 ring actor and the WHOLE pipeline runs
    # single-threaded (observed: one MapWorker at 100%, 31 idle). Built
    # ONCE so both legs time the ring consumption, not the feed build.
    t0 = time.perf_counter()
    base = (
        add_turn_stats(read_parquet_clean(shard_files))
        .select_columns(["conv_id", "turn_idx", "ts", "text_len", "token_est"])
        .sort(["conv_id", "ts", "turn_idx"])
        .materialize()
    )
    out = {"ring_feed_build_sec": round(time.perf_counter() - t0, 3)}

    t0 = time.perf_counter()
    n = streaming_window_features(
        base, series_cols=("text_len", "token_est")
    ).count()
    sec = round(time.perf_counter() - t0, 3)
    out["ring_single_sec"] = sec
    out["ring_single_turns_per_sec"] = round(n / sec, 1)

    # sharded scale-out: per-shard datasets consumed CONCURRENTLY (one
    # thread per count) — the union-combined form drains branches
    # sequentially under preserve_order and measures the same as single
    # (see streaming_window_features_sharded docstring)
    from concurrent.futures import ThreadPoolExecutor

    branches = streaming_window_features_sharded(
        base, series_cols=("text_len", "token_est"), n_shards=8, combine=False
    )
    t0 = time.perf_counter()
    with ThreadPoolExecutor(len(branches)) as ex:
        n8 = sum(ex.map(lambda b: b.count(), branches))
    sec = round(time.perf_counter() - t0, 3)
    out["ring_sharded8_sec"] = sec
    out["ring_sharded8_turns_per_sec"] = round(n8 / sec, 1)
    return out


def run_queries(sf_dir: str) -> dict:
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out = {}
    for name in QUERY_NAMES:
        if name not in qs:
            continue
        t0 = time.perf_counter()
        res = qs[name](sf_dir)
        if hasattr(res, "count"):
            res.count()
        out[name] = round(time.perf_counter() - t0, 3)
    return out


def single_run() -> dict:
    import ray

    store = os.environ.get("GRAFT_OBJECT_STORE_BYTES")  # spill drill knob
    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        object_store_memory=int(store) if store else None,
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    _tune_context(ctx)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    paths = build_corpus()
    load = wait_for_idle()
    head = run_headline(paths)
    queries = {} if HEADLINE_ONLY else run_queries(SF_DIR)
    ring = {} if HEADLINE_ONLY else run_ring(paths)
    spill = _spill_stats() if store else {}
    ray.shutdown()
    return {
        "metric": "asof_join_windowed_feature_backfill_sec",
        "value": round(head["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "turns": head["turns"],
        "turns_per_sec": round(head["turns_per_sec"], 1),
        "repeat_secs": head["repeat_secs"],
        "repeat_steal_pct": head["repeat_steal_pct"],
        "load_avg_at_start": load,
        "metrics_sidecar_rows": head["metrics_rows"],
        **ring,
        **spill,
    }


def _spill_stats() -> dict:
    """Object-store spill/restore counters for the CURRENT Ray session,
    parsed from the session's raylet log (`memory_summary` needs grpc,
    which this container lacks). The raylet logs a cumulative
    ``Spilled N MiB, M objects`` line as pressure evolves — the LAST
    occurrence is the session total."""
    import glob
    import re

    try:
        import ray._private.worker as rw

        session_dir = rw._global_node.get_session_dir_path()
        log = os.path.join(session_dir, "logs", "raylet.out")
    except Exception:
        logs = sorted(
            glob.glob("/tmp/ray/*/session_*/logs/raylet.out"),
            key=os.path.getmtime,
        )
        if not logs:
            return {}
        log = logs[-1]
    try:
        with open(log, "r", errors="replace") as f:
            txt = f.read()
    except OSError:
        return {}
    out = {}
    for m in re.finditer(r"Spilled (\d+) MiB, (\d+) objects", txt):
        out["spilled_mib"] = int(m.group(1))
        out["spilled_objects"] = int(m.group(2))
    for m in re.finditer(r"Restored (\d+) MiB, (\d+) objects", txt):
        out["restored_mib"] = int(m.group(1))
        out["restored_objects"] = int(m.group(2))
    return out


def spill_drill() -> dict:
    """Memory-pressure drill (VERDICT r4 item 5): the headline pipeline with
    a deliberately UNDERSIZED object store vs the tuned store, fresh process
    each, same corpus. Pass bar: the undersized leg finishes (streaming
    executor + plasma spill-to-disk absorb the pressure — no OOM, no
    deadlock) with bounded slowdown, and the artifact carries the spill
    counters proving pressure was real. The tuned-store leg is expected to
    spill ~nothing. On a real cluster the equivalent knob is per-node
    ``object_store_memory``."""
    small = int(os.environ.get("GRAFT_SPILL_STORE_BYTES", str(2 * 1024**3)))

    def run(store_bytes: int | None) -> dict:
        env = dict(os.environ, GRAFT_BENCH_HEADLINE_ONLY="1",
                   GRAFT_BENCH_REPEATS="2")
        # the tuned leg must NOT inherit a store override from the parent
        # shell — otherwise both legs run undersized and the drill's
        # slowdown ratio falsely reads ~1.0
        env.pop("GRAFT_OBJECT_STORE_BYTES", None)
        if store_bytes:
            env["GRAFT_OBJECT_STORE_BYTES"] = str(store_bytes)
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    tuned, tiny = run(None), run(small)
    return {
        "metric": "spill_drill_headline",
        "store_tuned_sec": tuned["value"],
        "store_tiny_sec": tiny["value"],
        "store_tiny_bytes": small,
        "slowdown": round(tiny["value"] / tuned["value"], 3),
        "turns": tiny["turns"],
        "tiny_spilled_mib": tiny.get("spilled_mib", 0),
        "tiny_spilled_objects": tiny.get("spilled_objects", 0),
        "tiny_restored_mib": tiny.get("restored_mib", 0),
        "tuned_steal_pct": tuned.get("repeat_steal_pct"),
        "tiny_steal_pct": tiny.get("repeat_steal_pct"),
        "num_cpus": NUM_CPUS,
    }


def _cpu_busy_s() -> float:
    """System-wide busy cpu-seconds since boot (/proc/stat), for honest
    CPU-time accounting of a leg: wall-based efficiency readings > 1.0 only
    say the small leg wasn't compute-saturated; busy-jiffy deltas measured
    around each leg show the actual work done (the machine must be
    otherwise idle — the idle-guard runs first)."""
    with open("/proc/stat") as f:
        parts = f.readline().split()
    vals = [int(x) for x in parts[1:]]
    idle = vals[3] + vals[4]  # idle + iowait
    hz = os.sysconf("SC_CLK_TCK")
    return (sum(vals) - idle) / hz


def _stat_jiffies() -> tuple[int, int]:
    """(steal, total) jiffies since boot. Hypervisor steal is the one
    contamination the load-average idle-guard CANNOT see: a co-tenant VM
    burning the physical cores shows load 0 here while repeats run 3-5x
    slow (measured: identical code 10.6 s and 37 s twenty minutes apart).
    Recording per-repeat steal%% makes a contaminated sample self-evident
    in the artifact instead of reading as a code regression."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    steal = vals[7] if len(vals) > 7 else 0
    return steal, sum(vals)


def scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(
            os.environ,
            RAY_GRAFT_CPUS=str(ncpu),
            GRAFT_BENCH_HEADLINE_ONLY="1",
        )
        busy0, t0 = _cpu_busy_s(), time.monotonic()
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            env=env, capture_output=True, text=True, check=True,
        ).stdout
        busy1, t1 = _cpu_busy_s(), time.monotonic()
        res = json.loads(out.strip().splitlines()[-1])
        res["_cpu_busy_s"] = round(busy1 - busy0, 1)
        res["_leg_wall_s"] = round(t1 - t0, 1)
        return res

    lo, hi = run(8), run(32)
    tps_lo, tps_hi = lo["turns_per_sec"], hi["turns_per_sec"]
    eff = (tps_hi / tps_lo) / (32 / 8)
    return {
        "metric": "scaling_efficiency_8_to_32_cpus",
        "turns_per_sec_8": tps_lo,
        "turns_per_sec_32": tps_hi,
        "sec_8": lo["value"],
        "sec_32": hi["value"],
        "repeat_secs_8": lo.get("repeat_secs"),
        "repeat_secs_32": hi.get("repeat_secs"),
        "repeat_steal_pct_8": lo.get("repeat_steal_pct"),
        "repeat_steal_pct_32": hi.get("repeat_steal_pct"),
        "scaling_efficiency": round(eff, 3),
        "turns": hi["turns"],
        # whole-leg system CPU accounting (all repeats + warm-up + spawn):
        "cpu_busy_s_8": lo["_cpu_busy_s"],
        "cpu_busy_s_32": hi["_cpu_busy_s"],
        "leg_wall_s_8": lo["_leg_wall_s"],
        "leg_wall_s_32": hi["_leg_wall_s"],
    }


def _tune_context(ctx) -> None:
    """Single-node executor tuning (measured, 3.96M-turn headline):
    the streaming executor's per-operator resource reservation
    (op_resource_reservation_ratio=0.5) idles reserved slots in this
    map -> exchange -> map -> exchange -> map pipeline — 8-CPU repeat 63 s
    -> 17 s and 32-CPU 9.7 s -> 7.4 s with reservation off (ratio 0.1 does
    NOT help: 58 s — the reservation mechanism itself idles the slots).
    Reservation exists to prevent memory-pressure deadlocks in pathological
    DAGs; this pipeline's exchanges are barriers anyway. GRAFT_OP_RESERVATION=1
    restores the default."""
    if os.environ.get("GRAFT_OP_RESERVATION", "0") != "1":
        ctx.op_resource_reservation_enabled = False


def skew_stress() -> dict:
    """Skew-stress protocol (VERDICT r3 item 1): one conversation = 20% of
    the corpus. Runs the payload-light headline on a balanced corpus and on
    the skewed corpus, unsalted and salted, in ONE Ray session. The pass bar:
    salted-on-skewed within ~1.5x of the balanced run (unsalted-on-skewed is
    reported to show the stall the salt removes)."""
    import ray

    ray.init(
        address="local", num_cpus=NUM_CPUS, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    _ctx = DataContext.get_current()
    _ctx.enable_progress_bars = False
    _tune_context(_ctx)
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    from rp_extract_ray.pipelines.flagship import feature_backfill_payload_light
    from rp_extract_ray.sources.pqio import read_parquet_clean
    from rp_extract_ray.synth import write_corpus

    n_convs = int(os.environ.get("GRAFT_SKEW_CONVS", "7200"))
    chunk = int(os.environ.get("GRAFT_SKEW_CHUNK", "8192"))
    parts = int(os.environ.get("GRAFT_BENCH_PARTS", str(max(4 * NUM_CPUS, 32))))
    balanced = write_corpus(
        "/tmp/graft_skew_balanced_v1", n_convs=n_convs, seed=13, mean_turns=150,
        shards=64,
    )
    skewed = write_corpus(
        "/tmp/graft_skew_mega_v1", n_convs=n_convs, seed=13, mean_turns=150,
        shards=64, mega_frac=0.2,
    )

    def shard_list(paths):
        d = paths["transcripts"]
        return sorted(os.path.join(d, f) for f in os.listdir(d))

    def run(paths, salt, repeats=3) -> tuple[float, int]:
        files = shard_list(paths)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            n = feature_backfill_payload_light(
                files,
                read_parquet_clean(paths["conv_events"]),
                k=16,
                num_partitions=parts,
                salt_chunk_turns=chunk if salt else None,
            ).count()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3), n

    wait_for_idle()
    bal_unsalted, n_bal = run(balanced, salt=False)
    bal_salted, _ = run(balanced, salt=True)
    skew_unsalted, n_skew = run(skewed, salt=False)
    skew_salted, _ = run(skewed, salt=True)
    ray.shutdown()
    return {
        "metric": "skew_stress_mega_conv_20pct",
        "turns_balanced": n_bal,
        "turns_skewed": n_skew,
        "balanced_unsalted_sec": bal_unsalted,
        "balanced_salted_sec": bal_salted,
        "skewed_unsalted_sec": skew_unsalted,
        "skewed_salted_sec": skew_salted,
        "salted_skew_vs_balanced": round(skew_salted / bal_unsalted, 3),
        # corpora differ in size (the mega conv ADDS 25% turns): the
        # per-turn normalization is the skew-robustness signal
        "salted_skew_vs_balanced_per_turn": round(
            (skew_salted / n_skew) / (bal_unsalted / n_bal), 3
        ),
        "salt_overhead_balanced": round(bal_salted / bal_unsalted, 3),
        "unsalted_skew_penalty": round(skew_unsalted / bal_unsalted, 3),
        "chunk_turns": chunk,
        "num_cpus": NUM_CPUS,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        result = scaling()
    elif "--skew" in sys.argv:
        result = skew_stress()
    elif "--spill-drill" in sys.argv:
        result = spill_drill()
    else:
        result = single_run()
    print(json.dumps(result))
