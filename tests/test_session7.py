"""Round-5 session-7 kernels: hopping windows, dense grid, skyline,
interval-overlap join, BM25, past-only target encoding — each vs a naive
single-process recompute and (where meaningful) partition-invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _hop_naive(ts_us, ent, val, window_us, hop_us):
    rows = {}
    for t, e, v in zip(ts_us, ent, val):
        base = (t // hop_us) * hop_us
        w = base
        while w + window_us > t and w >= base - window_us:
            if w <= t:
                s, n = rows.get((e, w), (0.0, 0))
                rows[(e, w)] = (s + v, n + 1)
            w -= hop_us
    return rows


def test_hopping_window_matches_naive_and_partition_invariant():
    from rp_extract_ray.stages.timegrid import hopping_window_aggregate

    rng = np.random.default_rng(7)
    n = 500
    ts_us = rng.integers(0, 10 * 3600 * 1_000_000, n).astype(np.int64)
    ent = rng.integers(0, 9, n).astype(np.int64)
    val = rng.normal(size=n).round(3)
    tbl = pa.table(
        {
            "conv_id": ent,
            "ts": pa.array(ts_us).cast(pa.timestamp("us")),
            "value": val,
        }
    )
    expect = _hop_naive(ts_us, ent, val, 3_600_000_000, 900_000_000)

    for nblocks in (1, 7):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = hopping_window_aggregate(
            ds, entity_col="conv_id", ts_col="ts", value_col="value",
            window_s=3600.0, hop_s=900.0, num_partitions=4,
        ).to_pandas()
        got = {
            (int(e), int(w.value) // 1000): (s, int(c))
            for e, w, s, c in zip(
                out["conv_id"], out["wstart"], out["wsum"], out["wn"]
            )
        }
        assert set(got) == set(expect)
        for k, (s, c) in expect.items():
            assert got[k][1] == c
            np.testing.assert_allclose(got[k][0], s, atol=1e-9)


def test_hopping_window_rejects_non_dividing_hop():
    from rp_extract_ray.stages.timegrid import hopping_window_aggregate

    ds = rd.from_items([{"conv_id": 1, "ts": 0, "value": 1.0}])
    try:
        hopping_window_aggregate(ds, window_s=3600.0, hop_s=1000.0)
    except ValueError:
        return
    raise AssertionError("expected ValueError for non-dividing hop")


def test_skyline_matches_bruteforce_dominance():
    from rp_extract_ray.stages.skyline import skyline_2d

    rng = np.random.default_rng(3)
    n = 300
    # small discrete domains force ties in x, y, and exact (x, y) duplicates
    x = rng.integers(0, 40, n).astype(np.int64)
    y = rng.integers(0, 25, n).astype(np.float64)
    y[rng.choice(n, 10, replace=False)] = np.nan  # dropped by contract
    rid = np.arange(n, dtype=np.int64)

    def dominated(i):
        return bool(
            np.any(
                (x <= x[i]) & (y >= y[i]) & ((x < x[i]) | (y > y[i]))
                & ~np.isnan(y)
            )
        )

    expect = {
        int(i) for i in rid
        if not np.isnan(y[i]) and not dominated(i)
    }

    tbl = pa.table({"rid": rid, "x": x, "y": y})
    for nblocks in (1, 5):
        ds = rd.from_arrow(tbl).repartition(nblocks)
        out = skyline_2d(ds, x_col="x", y_col="y").to_pandas()
        assert set(out["rid"].astype(int)) == expect


def test_interval_overlap_join_matches_bruteforce():
    from rp_extract_ray.stages.rangejoin import interval_overlap_join

    rng = np.random.default_rng(5)
    na, nb = 120, 150
    ea = rng.integers(0, 8, na)
    s_a = rng.integers(0, 1000, na)
    e_a = s_a + rng.integers(0, 60, na)
    eb = rng.integers(0, 8, nb)
    s_b = rng.integers(0, 1000, nb)
    e_b = s_b + rng.integers(0, 60, nb)
    a = pa.table({"conv_id": ea, "a_id": np.arange(na, dtype=np.int64),
                  "a_start": s_a, "a_end": e_a})
    b = pa.table({"conv_id": eb, "b_id": np.arange(nb, dtype=np.int64),
                  "b_start": s_b, "b_end": e_b})

    for closed, op in (("both", lambda x, y: x <= y), ("neither", lambda x, y: x < y)):
        expect = {
            (int(i), int(j))
            for i in range(na)
            for j in range(nb)
            if ea[i] == eb[j] and op(s_a[i], e_b[j]) and op(s_b[j], e_a[i])
        }
        for nblocks in (1, 4):
            out = interval_overlap_join(
                rd.from_arrow(a).repartition(nblocks),
                rd.from_arrow(b).repartition(nblocks),
                entity_col="conv_id", closed=closed, num_partitions=5,
            ).to_pandas()
            got = {
                (int(i), int(j)) for i, j in zip(out["a_id"], out["b_id"])
            }
            assert got == expect, (closed, nblocks)


def test_interval_overlap_join_rejects_colliding_columns():
    from rp_extract_ray.stages.rangejoin import interval_overlap_join

    t = pa.table({"conv_id": [1], "a_start": [0], "a_end": [1]})
    try:
        interval_overlap_join(rd.from_arrow(t), rd.from_arrow(t),
                              entity_col="conv_id")
    except ValueError:
        return
    raise AssertionError("expected ValueError on colliding columns")


def test_bm25_matches_pure_python():
    import math
    import re

    from rp_extract_ray.stages.tfidf import bm25_scores

    docs = [
        (0, "data join sort data data"),
        (1, "vector sort sort table"),
        (2, "nothing relevant here"),
        (3, ""),  # token-less: counts toward N and avgdl denominator
        (4, "join join join data vector sort extra words pad pad"),
    ]
    q = ["data", "join", "sort", "vector"]
    tok = [re.findall(r"[0-9a-z_]+", t.lower()) for _, t in docs]
    n = float(len(docs))
    avgdl = sum(len(t) for t in tok) / n
    df = {term: sum(term in t for t in tok) for term in q}
    k1, b = 1.2, 0.75
    expect = {}
    for (did, _), t in zip(docs, tok):
        s = 0.0
        hit = False
        for term in q:
            c = t.count(term)
            if c == 0:
                continue
            hit = True
            idf = math.log(1 + (n - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * c * (k1 + 1) / (c + k1 * (1 - b + b * len(t) / avgdl))
        if hit:
            expect[did] = round(s, 6)

    tbl = pa.table(
        {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}
    )
    out = bm25_scores(rd.from_arrow(tbl).repartition(3), q).to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["bm25"]))
    assert set(got) == set(expect)
    for d in expect:
        np.testing.assert_allclose(got[d], expect[d], atol=2e-6)


def _te_naive(ts, eid, cat, val):
    order = np.lexsort((eid, ts))
    te = np.full(len(ts), np.nan)
    seen = {}
    for i in order:
        s, n = seen.get(cat[i], (0, 0))
        if n > 0:
            te[i] = (s / n) / 100.0
        seen[cat[i]] = (s + round(val[i] * 100), n + 1)
    return te


def _te_events(n, rng):
    ts = rng.integers(0, 5000, n).astype(np.int64)
    eid = np.arange(n, dtype=np.int64)
    cat = rng.choice(["a", "b", "c"], n)
    val = (rng.integers(0, 2000, n) / 100.0)
    return ts, eid, cat, val


def test_target_encode_matches_naive_and_partition_invariant():
    from rp_extract_ray.stages.encode import target_encode_past

    rng = np.random.default_rng(17)
    ts, eid, cat, val = _te_events(400, rng)
    expect = _te_naive(ts, eid, cat, val)
    tbl = pa.table(
        {"ts": ts, "event_id": eid, "event_type": cat, "value": val}
    )

    results = []
    for np_parts, nblocks in ((2, 1), (16, 7)):
        out = target_encode_past(
            rd.from_arrow(tbl).repartition(nblocks),
            category_col="event_type", target_col="value",
            ts_col="ts", order_cols=("event_id",),
            num_partitions=np_parts, sample_rate=0.5,
        ).to_pandas().sort_values("event_id", ignore_index=True)
        np.testing.assert_allclose(
            out["te"].to_numpy(), expect, equal_nan=True, atol=1e-12
        )
        results.append(out["te"].to_numpy())
    # fixed-point accumulation: BIT-identical across layouts, not just close
    np.testing.assert_array_equal(
        np.nan_to_num(results[0], nan=-1.0), np.nan_to_num(results[1], nan=-1.0)
    )


def test_target_encode_zero_temporal_leakage():
    """Poisoning every future target must not move any past encoding."""
    from rp_extract_ray.stages.encode import target_encode_past

    rng = np.random.default_rng(23)
    ts, eid, cat, val = _te_events(300, rng)
    cut = np.median(ts)
    poisoned = val.copy()
    poisoned[ts > cut] = 9999.99

    outs = []
    for v in (val, poisoned):
        tbl = pa.table(
            {"ts": ts, "event_id": eid, "event_type": cat, "value": v}
        )
        out = target_encode_past(
            rd.from_arrow(tbl).repartition(4),
            category_col="event_type", target_col="value",
            ts_col="ts", order_cols=("event_id",),
            num_partitions=8, sample_rate=0.5,
        ).to_pandas().sort_values("event_id", ignore_index=True)
        outs.append(out)
    past = ts <= cut  # every encoding at ts <= cut reads only rows < ts
    a = outs[0][past[outs[0]["event_id"].to_numpy()]]["te"].to_numpy()
    b = outs[1][past[outs[1]["event_id"].to_numpy()]]["te"].to_numpy()
    np.testing.assert_array_equal(
        np.nan_to_num(a, nan=-1.0), np.nan_to_num(b, nan=-1.0)
    )


def test_target_encode_rejects_non_fixed_point():
    from rp_extract_ray.stages.encode import target_encode_past

    tbl = pa.table(
        {"ts": [1, 2], "event_id": [0, 1], "event_type": ["a", "a"],
         "value": [0.123456, 1.0]}
    )
    try:
        # the stage executes eagerly (materialize + bounded driver merge),
        # so the resolution check fires during construction already
        target_encode_past(
            rd.from_arrow(tbl), category_col="event_type",
            target_col="value", ts_col="ts", order_cols=("event_id",),
            num_partitions=2, sample_rate=1.0,
        ).to_pandas()
    except Exception as e:
        assert "fixed-point" in str(e)
        return
    raise AssertionError("expected fixed-point resolution error")


def test_quantile_normalize_matches_pandas_recompute():
    from rp_extract_ray.stages.standardize import quantile_normalize

    rng = np.random.default_rng(29)
    n = 500
    grp = rng.choice(["x", "y", "z"], n, p=[0.5, 0.3, 0.2])  # unequal sizes
    val = rng.integers(0, 50, n).astype(np.float64)  # plenty of ties
    rid = np.arange(n, dtype=np.int64)
    pdf = pd.DataFrame({"g": grp, "v": val, "rid": rid})
    s = pdf.sort_values(["g", "v", "rid"], ignore_index=True)
    s["rk"] = s.groupby("g", sort=False).cumcount() + 1
    ref = s.groupby("rk")["v"].mean().round(6)
    s["expect"] = s["rk"].map(ref)
    expect = dict(zip(s["rid"], s["expect"]))

    tbl = pa.table({"g": grp, "v": val, "rid": rid})
    out = quantile_normalize(
        rd.from_arrow(tbl).repartition(5), group_col="g", value_col="v",
        id_col="rid", num_partitions=4,
    ).to_pandas()
    got = dict(zip(out["rid"].astype(int), out["qnorm"]))
    assert set(got) == set(expect)
    for k in expect:
        np.testing.assert_allclose(got[k], expect[k], atol=1e-9)


def test_connected_components_gate_shape_known_graph():
    """The q_connected_components composition (pairs -> propagate -> union
    self-labels -> min) on a hand-built graph: one 4-chain, one triangle,
    two isolated nodes."""
    from rp_extract_ray.stages.dedup import dedup_clusters
    from rp_extract_ray.stages.groupops import grouped_reduce

    edges = pa.table(
        {"id_a": np.array([1, 2, 3, 10, 10], dtype=np.int64),
         "id_b": np.array([2, 3, 4, 11, 12], dtype=np.int64)}
    )
    all_nodes = np.array([1, 2, 3, 4, 10, 11, 12, 50, 60], dtype=np.int64)
    labels = dedup_clusters(rd.from_arrow(edges), mode="distributed")
    selves = rd.from_arrow(
        pa.table({"id": all_nodes, "cluster_id": all_nodes})
    )
    out = grouped_reduce(
        labels.union(selves), "id", {"cluster_id": ("cluster_id", "min")},
        num_partitions=4,
    ).to_pandas()
    got = dict(zip(out["id"].astype(int), out["cluster_id"].astype(int)))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10,
                   50: 50, 60: 60}


def test_hopping_distinct_matches_naive():
    from rp_extract_ray.stages.timegrid import hopping_window_distinct

    rng = np.random.default_rng(31)
    n = 400
    ts_us = rng.integers(0, 6 * 3600 * 1_000_000, n).astype(np.int64)
    key = rng.integers(0, 12, n).astype(np.int64)
    expect = {}
    for t, k in zip(ts_us, key):
        base = (t // 900_000_000) * 900_000_000
        for j in range(4):
            expect.setdefault(base - j * 900_000_000, set()).add(int(k))
    tbl = pa.table(
        {"ts": pa.array(ts_us).cast(pa.timestamp("us")), "user_id": key}
    )
    out = hopping_window_distinct(
        rd.from_arrow(tbl).repartition(5), ts_col="ts", key_col="user_id",
        window_s=3600.0, hop_s=900.0, num_partitions=4,
    ).to_pandas()
    got = {
        int(w.value) // 1000: int(c)
        for w, c in zip(out["wstart"], out["n_distinct"])
    }
    assert got == {w: len(s) for w, s in expect.items()}


def test_debounce_matches_naive():
    from rp_extract_ray.pipelines.events import q_debounce  # noqa: F401

    # kernel-level check of the lag-gap debounce shape used by q_debounce
    from rp_extract_ray.stages.partition import partitioned_apply

    rng = np.random.default_rng(41)
    n = 300
    ts_s = np.sort(rng.integers(0, 50_000, n)).astype("datetime64[s]")
    pdf_in = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts_s.astype("datetime64[us]"),
            "user_id": rng.integers(0, 5, n).astype(np.int64),
            "event_type": rng.choice(["a", "b"], n),
        }
    )
    W = 600.0
    expect = set()
    last = {}
    for r in pdf_in.sort_values(["ts", "event_id"]).itertuples():
        k = (r.user_id, r.event_type)
        prev = last.get(k)
        if prev is None or (r.ts - prev).total_seconds() > W:
            expect.add(int(r.event_id))
        last[k] = r.ts  # lag-gap variant: window from the PREVIOUS event

    def fn(pdf, starts):
        prev = pdf.groupby(["user_id", "event_type"], sort=False)["ts"].shift()
        gap = (pdf["ts"] - prev).dt.total_seconds()
        keep = prev.isna().to_numpy() | (gap.to_numpy() > W)
        return pdf[keep]

    out = partitioned_apply(
        rd.from_pandas(pdf_in).repartition(4), fn, entity_col="user_id",
        order_cols=("ts", "event_id"), num_partitions=3,
    ).to_pandas()
    assert set(out["event_id"].astype(int)) == expect


def test_throttle_keep_mask_matches_sequential_fold():
    from rp_extract_ray.stages.lag import throttle_keep_mask

    rng = np.random.default_rng(43)
    # dense bursts force the kept/not-kept distinction vs plain debounce
    runs = []
    new_run = []
    for _ in range(20):
        k = int(rng.integers(1, 40))
        ts = np.sort(rng.integers(0, 3000, k))
        runs.append(ts)
        new_run.extend([True] + [False] * (k - 1))
    ts_us = np.concatenate(runs).astype(np.int64)
    new_run = np.array(new_run)
    W = 500

    got = throttle_keep_mask(ts_us, new_run, W)

    expect = np.zeros(len(ts_us), dtype=bool)
    i = 0
    for run in runs:
        last = None
        for j, t in enumerate(run):
            if last is None or t > last + W:
                expect[i + j] = True
                last = t
        i += len(run)
    np.testing.assert_array_equal(got, expect)


def test_throttle_differs_from_debounce_on_bursts():
    from rp_extract_ray.stages.lag import throttle_keep_mask

    # steady sub-window cadence: debounce (gap from previous event) drops
    # everything after the first; throttle keeps one per window
    ts = np.arange(0, 100, 3, dtype=np.int64)  # step 3 < W
    new_run = np.zeros(len(ts), dtype=bool)
    new_run[0] = True
    keep = throttle_keep_mask(ts, new_run, 10)
    assert keep.sum() > 1  # throttle re-emits once the window passes
    np.testing.assert_array_equal(np.flatnonzero(keep)[:3], [0, 4, 8])


def test_band_join_matches_bruteforce():
    from rp_extract_ray.stages.rangejoin import band_join

    rng = np.random.default_rng(47)
    na, nb = 150, 180
    ea = rng.integers(0, 6, na)
    # integer-grid keys (incl. negatives) force exact-boundary |d| == band
    # matches and bucket-edge candidates
    ka = (rng.integers(-40, 40, na) / 4.0)
    eb = rng.integers(0, 6, nb)
    kb = (rng.integers(-40, 40, nb) / 4.0)
    band = 0.5
    expect = {
        (int(i), int(j))
        for i in range(na)
        for j in range(nb)
        if ea[i] == eb[j] and abs(ka[i] - kb[j]) <= band
    }
    a = pa.table({"conv_id": ea, "a_id": np.arange(na, dtype=np.int64),
                  "a_key": ka})
    b = pa.table({"conv_id": eb, "b_id": np.arange(nb, dtype=np.int64),
                  "b_key": kb})
    for nblocks in (1, 4):
        out = band_join(
            rd.from_arrow(a).repartition(nblocks),
            rd.from_arrow(b).repartition(nblocks),
            a_key="a_key", b_key="b_key", band=band,
            entity_col="conv_id", num_partitions=5,
        ).to_pandas()
        got = {(int(i), int(j)) for i, j in zip(out["a_id"], out["b_id"])}
        assert got == expect, nblocks


def test_band_join_global_no_entity():
    from rp_extract_ray.stages.rangejoin import band_join

    a = pa.table({"a_id": np.arange(4, dtype=np.int64),
                  "a_key": np.array([0.0, 1.0, 5.0, -2.0])})
    b = pa.table({"b_id": np.arange(3, dtype=np.int64),
                  "b_key": np.array([0.9, 5.05, -3.0])})
    out = band_join(
        rd.from_arrow(a), rd.from_arrow(b),
        a_key="a_key", b_key="b_key", band=1.0, num_partitions=3,
    ).to_pandas()
    got = {(int(i), int(j)) for i, j in zip(out["a_id"], out["b_id"])}
    assert got == {(0, 0), (1, 0), (2, 1), (3, 2)}


def test_interval_concurrency_matches_bruteforce():
    from rp_extract_ray.stages.intervals import interval_concurrency

    rng = np.random.default_rng(53)
    n, m = 200, 120
    ep = rng.integers(0, 6, n)
    tp = rng.integers(0, 500, n)
    ei = rng.integers(0, 6, m)
    s = rng.integers(0, 500, m)
    e = s + rng.integers(0, 50, m)
    expect = np.array(
        [
            int(np.sum((ei == ep[i]) & (s <= tp[i]) & (tp[i] <= e)))
            for i in range(n)
        ],
        dtype=np.int64,
    )
    points = pa.table({"conv_id": ep, "pid": np.arange(n, dtype=np.int64),
                       "ts": tp})
    iv = pa.table({"conv_id": ei, "start_ts": s, "end_ts": e})
    for nblocks in (1, 4):
        out = interval_concurrency(
            rd.from_arrow(points).repartition(nblocks),
            rd.from_arrow(iv).repartition(nblocks),
            entity_col="conv_id", ts_col="ts", num_partitions=5,
        ).to_pandas().sort_values("pid", ignore_index=True)
        np.testing.assert_array_equal(out["n_open"].to_numpy(), expect)


def test_weighted_median_kernel_vs_naive():
    """The lower-weighted-median rule via the same kernel logic q uses."""
    rng = np.random.default_rng(59)
    for _ in range(20):
        k = int(rng.integers(1, 30))
        v = np.sort(rng.integers(0, 15, k).astype(np.float64))
        w = rng.integers(1, 9, k).astype(np.int64)
        cw = np.cumsum(w)
        got = v[np.flatnonzero(2 * cw >= cw[-1])[0]]
        # naive: smallest value whose inclusive cumulative weight >= half
        tot = w.sum()
        acc = 0
        for vi, wi in zip(v, w):
            acc += wi
            if 2 * acc >= tot:
                assert got == vi
                break


def test_time_weighted_avg_gate_matches_pandas():
    import ray

    from rp_extract_ray.pipelines.events import q_time_weighted_avg

    out = q_time_weighted_avg("/root/testdata/sf0.001").to_pandas()
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE VIEW events AS SELECT * FROM "
        "'/root/testdata/sf0.001/events.parquet'"
    )
    exp = con.sql(
        """WITH l AS (SELECT user_id, value, ts,
                             lead(ts) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS nts FROM events)
           SELECT user_id, sum(value * epoch(nts - ts))
                           / sum(epoch(nts - ts)) AS twa
           FROM l WHERE nts IS NOT NULL GROUP BY user_id"""
    ).df()
    m = out.merge(exp, on="user_id", suffixes=("", "_exp"))
    assert len(m) == len(out) == len(exp)
    np.testing.assert_allclose(m["twa"], m["twa_exp"], atol=1e-6)


def test_interval_concurrency_null_bounds_and_null_ts():
    """Review fix: null interval bounds count for nothing; a null point ts
    emits with count 0 (SQL comparison semantics) — neither may corrupt
    the sweep's running count."""
    from rp_extract_ray.stages.intervals import interval_concurrency

    points = pa.table(
        {
            "conv_id": pa.array([1, 1, 1], pa.int64()),
            "pid": pa.array([0, 1, 2], pa.int64()),
            "ts": pa.array([5, 20, None], pa.int64()),
        }
    )
    iv = pa.table(
        {
            "conv_id": pa.array([1, 1, 1], pa.int64()),
            "start_ts": pa.array([10, None, 15], pa.int64()),
            "end_ts": pa.array([None, 20, 25], pa.int64()),
        }
    )
    out = interval_concurrency(
        rd.from_arrow(points), rd.from_arrow(iv),
        entity_col="conv_id", ts_col="ts", num_partitions=2,
    ).to_pandas().sort_values("pid", ignore_index=True)
    # only [15, 25] is a real interval: ts=5 -> 0, ts=20 -> 1, null ts -> 0
    assert out["n_open"].tolist() == [0, 1, 0]


def test_target_encode_skips_null_targets():
    from rp_extract_ray.stages.encode import target_encode_past

    tbl = pa.table(
        {
            "ts": pa.array([1, 2, 3, 4], pa.int64()),
            "event_id": pa.array([0, 1, 2, 3], pa.int64()),
            "event_type": ["a", "a", "a", "a"],
            "value": pa.array([1.0, None, 3.0, None], pa.float64()),
        }
    )
    out = target_encode_past(
        rd.from_arrow(tbl), category_col="event_type", target_col="value",
        ts_col="ts", order_cols=("event_id",), num_partitions=2,
        sample_rate=1.0,
    ).to_pandas().sort_values("event_id", ignore_index=True)
    te = out["te"].to_numpy()
    # row0: no prior -> NaN; row1 (null target): prior avg 1.0;
    # row2: still avg of {1.0}; row3: avg of {1.0, 3.0} = 2.0
    assert np.isnan(te[0])
    np.testing.assert_allclose(te[1:], [1.0, 1.0, 2.0])


# ------------------------------------------------------- hypothesis gates

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 200), min_size=1, max_size=60),
    st.integers(1, 50),
)
def test_throttle_property_vs_fold(ts_list, gap):
    from rp_extract_ray.stages.lag import throttle_keep_mask

    ts = np.sort(np.array(ts_list, dtype=np.int64))
    new_run = np.zeros(len(ts), dtype=bool)
    new_run[0] = True
    got = throttle_keep_mask(ts, new_run, gap)
    last = None
    for i, t in enumerate(ts):
        keep = last is None or t > last + gap
        assert got[i] == keep, (i, ts, gap)
        if keep:
            last = t


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1, max_size=80,
    )
)
def test_skyline_kernel_property(points):
    from rp_extract_ray.stages.skyline import _skyline_frame

    pdf = pd.DataFrame(points, columns=["x", "y"])
    pdf["rid"] = np.arange(len(pdf))
    out = _skyline_frame(pdf, "x", "y")
    x = pdf["x"].to_numpy()
    y = pdf["y"].to_numpy()
    expect = {
        int(r)
        for i, r in enumerate(pdf["rid"])
        if not np.any(
            (x <= x[i]) & (y >= y[i]) & ((x < x[i]) | (y > y[i]))
        )
    }
    assert set(out["rid"].astype(int)) == expect


@settings(max_examples=40, deadline=None)
@given(
    st.lists(st.integers(0, 5), min_size=1, max_size=60),
    st.integers(1, 10),
)
def test_rolling_distinct_property(codes_list, k):
    from rp_extract_ray.stages.lag import rolling_distinct_within

    codes = np.array(codes_list, dtype=np.int64)
    n = len(codes)
    # two runs: split roughly in half
    half = max(1, n // 2)
    starts = np.concatenate(
        [np.zeros(half, dtype=np.int64), np.full(n - half, half, np.int64)]
    )
    got = rolling_distinct_within(codes, starts, k)
    for i in range(n):
        lo = max(starts[i], i - k + 1)
        assert got[i] == len(set(codes[lo : i + 1].tolist())), (i, codes, k)


def test_group_spearman_matches_scipy_free_recompute():
    from rp_extract_ray.pipelines.events import q_group_spearman

    out = q_group_spearman("/root/testdata/sf0.001").to_pandas()
    import duckdb

    exp = duckdb.sql(
        "SELECT * FROM '/root/testdata/sf0.001/events.parquet'"
    ).df()
    res = {}
    for uid, g in exp.groupby("user_id"):
        rv = g["value"].rank(method="average")
        rt = g["ts"].rank(method="average")
        res[int(uid)] = float(np.corrcoef(rv, rt)[0, 1])
    got = dict(zip(out["user_id"].astype(int), out["spearman"]))
    assert set(got) == set(res)
    for u in res:
        np.testing.assert_allclose(got[u], res[u], atol=2e-6)


def test_role_alternation_report_vs_duckdb():
    """Transcript-hygiene gate on the north-rule schema (conv_id, turn_idx,
    role, text, tool, ts): per-conv role mix + alternation violations,
    checked against a DuckDB window recompute over the synth corpus."""
    import duckdb

    from rp_extract_ray.stages.turns import role_alternation_report
    from rp_extract_ray.synth import write_corpus

    p = write_corpus("/tmp/s7_roles", n_convs=60, seed=9, mean_turns=25)
    out = role_alternation_report(
        rd.read_parquet(p["transcripts"]), num_partitions=8
    ).to_pandas().sort_values("conv_id", ignore_index=True)

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW t AS SELECT * FROM '{p['transcripts']}'"
    )
    exp = con.sql(
        """WITH o AS (SELECT conv_id, role,
                             lag(role) OVER (PARTITION BY conv_id
                                 ORDER BY ts, turn_idx) AS prev,
                             row_number() OVER (PARTITION BY conv_id
                                 ORDER BY ts, turn_idx) AS rn,
                             count(*) OVER (PARTITION BY conv_id) AS nt
                      FROM t)
           SELECT conv_id,
                  CAST(count(*) AS BIGINT) AS n_turns,
                  CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_user,
                  CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_assistant,
                  CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_tool_role,
                  CAST(sum(CASE WHEN role = prev THEN 1 ELSE 0 END)
                       AS BIGINT) AS n_violations,
                  min(CASE WHEN rn = 1 THEN role END) AS first_role,
                  min(CASE WHEN rn = nt THEN role END) AS last_role
           FROM o GROUP BY conv_id ORDER BY conv_id"""
    ).df()
    assert len(out) == len(exp)
    for c in ["n_turns", "n_user", "n_assistant", "n_tool_role",
              "n_violations", "first_role", "last_role"]:
        assert (out[c].to_numpy() == exp[c].to_numpy()).all(), c


def test_rolling_distinct_null_codes_do_not_count_or_suppress():
    from rp_extract_ray.stages.lag import rolling_distinct_within

    codes = np.array([1, 1, 2, 1, 3], dtype=np.int64)
    valid = np.array([True, False, True, True, True])
    starts = np.zeros(5, dtype=np.int64)
    got = rolling_distinct_within(codes, starts, 3, valid=valid)
    # row1 is null: window{1,N}->1; row3 window{N,2,1}->2 (null ignored);
    # row4 window{2,1,3}->3
    np.testing.assert_array_equal(got, [1, 1, 2, 2, 3])


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(-50, 50), min_size=1, max_size=80))
def test_cusum_closed_form_equals_sequential_fold(ys):
    """S_i = max(0, S_{i-1} + y_i)  ==  cum_i - min(0, running_min(cum))."""
    y = np.array(ys, dtype=np.int64)
    cum = np.cumsum(y)
    runmin = np.minimum.accumulate(cum)
    closed = cum - np.minimum(runmin, 0)
    s = 0
    for i, yi in enumerate(y):
        s = max(0, s + yi)
        assert closed[i] == s, (i, ys)
