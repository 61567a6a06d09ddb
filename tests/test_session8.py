"""Round-5 session-8 kernels: OHLC bars, grouped categorical entropy,
trailing-window z-score anomalies — naive single-process recomputes,
partition invariance, and the leakage property for the online z-score."""

import numpy as np
import pandas as pd

import ray.data as rd


def _events_frame(n=400, n_ent=7, seed=3, with_nulls=True):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 6 * 3600, n).astype("datetime64[s]").astype(
        "datetime64[us]"
    )
    v = np.round(rng.uniform(0, 100, n), 2)
    if with_nulls:
        v[rng.random(n) < 0.05] = np.nan
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts,
            "user_id": rng.integers(0, n_ent, n).astype(np.int64),
            "value": v,
        }
    )


def test_ohlc_bars_matches_naive_and_partition_invariant():
    from rp_extract_ray.stages.timegrid import ohlc_bars

    pdf = _events_frame()
    bus = 900 * 1_000_000

    def run(np_):
        return (
            ohlc_bars(
                rd.from_pandas(pdf).repartition(5),
                entity_col="user_id", ts_col="ts", order_col="event_id",
                value_col="value", bucket_s=900.0, num_partitions=np_,
            )
            .to_pandas()
            .sort_values(["user_id", "wstart"], ignore_index=True)
        )

    got = run(4)
    assert got.equals(run(1)), "partition invariance"

    w = pdf.copy()
    w["b"] = (
        w["ts"].to_numpy().astype("datetime64[us]").astype(np.int64) // bus
    ) * bus
    w = w.sort_values(["user_id", "b", "ts", "event_id"], ignore_index=True)
    for (u, b), g in w.groupby(["user_id", "b"]):
        row = got[
            (got.user_id == u)
            & (got.wstart.to_numpy().astype(np.int64) == b)
        ].iloc[0]
        # open/close: boundary ROW values (may be NaN); high/low/n skip NaN
        assert (row["open"] == g["value"].iloc[0]) or (
            np.isnan(row["open"]) and np.isnan(g["value"].iloc[0])
        )
        assert (row["close"] == g["value"].iloc[-1]) or (
            np.isnan(row["close"]) and np.isnan(g["value"].iloc[-1])
        )
        assert row["n"] == g["value"].notna().sum()
        if row["n"]:
            assert row["high"] == g["value"].max()
            assert row["low"] == g["value"].min()
            np.testing.assert_allclose(
                row["vsum"], g["value"].sum(), rtol=1e-12
            )
        else:
            assert np.isnan(row["vsum"])


def test_grouped_entropy_matches_naive():
    from rp_extract_ray.stages.groupops import grouped_entropy

    rng = np.random.default_rng(11)
    n = 600
    pdf = pd.DataFrame(
        {
            "g": rng.integers(0, 9, n).astype(np.int64),
            "item": rng.choice(list("abcde"), n),
        }
    )
    got = (
        grouped_entropy(
            rd.from_pandas(pdf).repartition(6), "g", "item",
            num_partitions=4,
        )
        .to_pandas()
        .set_index("g")
    )
    for g, grp in pdf.groupby("g"):
        c = grp["item"].value_counts().to_numpy(dtype=np.float64)
        p = c / c.sum()
        np.testing.assert_allclose(
            got.loc[g, "entropy"], -(p * np.log(p)).sum(), atol=1e-9
        )
        assert got.loc[g, "n"] == len(grp)
    # single-category group -> exactly 0.0
    one = pd.DataFrame({"g": [1, 1, 1], "item": ["x", "x", "x"]})
    out = grouped_entropy(rd.from_pandas(one), "g", "item").to_pandas()
    assert out["entropy"].iloc[0] == 0.0


def _zscore_naive(g, k=8):
    v = g["value"].to_numpy(dtype=np.float64)
    out = np.full(len(v), np.nan)
    for i in range(len(v)):
        w = v[max(0, i - k): i]
        w = w[~np.isnan(w)]
        if len(w) >= 2 and np.std(w, ddof=1) > 0:
            out[i] = (v[i] - w.mean()) / np.std(w, ddof=1)
    return out


def test_rolling_zscore_matches_naive_and_is_leakage_free(tmp_path):
    from rp_extract_ray.pipelines.events import q_rolling_zscore

    pdf = _events_frame(n=300, n_ent=4, seed=5)
    p = str(tmp_path / "events.parquet")
    pdf.assign(event_type="x", props="").to_parquet(p)
    got = (
        q_rolling_zscore(str(tmp_path))
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    exp = pdf.sort_values(["user_id", "ts", "event_id"])
    naive = {}
    for _, g in exp.groupby("user_id"):
        z = _zscore_naive(g)
        naive.update(dict(zip(g["event_id"], z)))
    for eid, zg in zip(got["event_id"], got["zscore"]):
        zn = naive[eid]
        if np.isnan(zn):
            assert np.isnan(zg)
        else:
            np.testing.assert_allclose(zg, zn, atol=2e-6)

    # leakage: poisoning every FUTURE row of one entity must not change
    # any earlier row's z (the window is strictly trailing)
    cut = exp[exp.user_id == 2]["ts"].iloc[len(exp[exp.user_id == 2]) // 2]
    poison = pdf.copy()
    mask = (poison.user_id == 2) & (poison.ts > cut)
    assert mask.sum() > 3
    poison.loc[mask, "value"] = 1e9
    p2 = str(tmp_path / "p2")
    import os

    os.makedirs(p2, exist_ok=True)
    poison.assign(event_type="x", props="").to_parquet(p2 + "/events.parquet")
    got2 = (
        q_rolling_zscore(p2)
        .to_pandas()
        .sort_values("event_id", ignore_index=True)
    )
    keep = got.event_id.isin(
        pdf[(pdf.user_id == 2) & (pdf.ts <= cut)].event_id
    )
    a = got[keep].set_index("event_id")["zscore"]
    b = got2[got2.event_id.isin(a.index)].set_index("event_id")["zscore"]
    pd.testing.assert_series_equal(a, b.loc[a.index])


def _rand_graph(n_nodes=40, n_edges=120, seed=13):
    rng = np.random.default_rng(seed)
    u = rng.integers(0, n_nodes, n_edges)
    v = rng.integers(0, n_nodes, n_edges)
    m = u != v
    lo, hi = np.minimum(u[m], v[m]), np.maximum(u[m], v[m])
    e = pd.DataFrame({"u": lo, "v": hi}).drop_duplicates(ignore_index=True)
    return e.astype(np.int64)


def test_pagerank_broadcast_equals_distributed_path():
    from rp_extract_ray.stages.graph import pagerank

    e = _rand_graph()
    ds = rd.from_pandas(e).repartition(4)
    b = pagerank(ds, iterations=4, num_partitions=8)
    d = pagerank(
        ds, iterations=4, num_partitions=8, broadcast_nodes_limit=0
    )
    dpdf = d.to_pandas().sort_values("node", ignore_index=True)
    b = b.sort_values("node", ignore_index=True)
    assert (b["node"].to_numpy() == dpdf["node"].to_numpy()).all()
    np.testing.assert_allclose(
        b["rank"].to_numpy(), dpdf["rank"].to_numpy(), rtol=1e-12
    )
    # ranks are a probability distribution
    np.testing.assert_allclose(b["rank"].sum(), 1.0, atol=1e-9)


def test_pagerank_matches_naive_power_iteration():
    from rp_extract_ray.stages.graph import pagerank

    e = _rand_graph(seed=29)
    got = (
        pagerank(rd.from_pandas(e).repartition(3), iterations=5)
        .set_index("node")["rank"]
    )
    # naive dense recompute
    nodes = np.unique(np.concatenate([e.u, e.v]))
    idx = {n: i for i, n in enumerate(nodes)}
    N = len(nodes)
    A = np.zeros((N, N))
    for u, v in zip(e.u, e.v):
        A[idx[v], idx[u]] = 1.0
        A[idx[u], idx[v]] = 1.0
    deg = A.sum(axis=0)
    r = np.full(N, 1.0 / N)
    for _ in range(5):
        r = 0.15 / N + 0.85 * (A @ (r / deg))
    for n in nodes:
        np.testing.assert_allclose(got.loc[n], r[idx[n]], atol=1e-9)


def test_triangle_count_matches_brute_force():
    from rp_extract_ray.stages.graph import triangle_count

    e = _rand_graph(n_nodes=25, n_edges=150, seed=7)
    got = triangle_count(rd.from_pandas(e).repartition(4), num_partitions=6)
    es = set(zip(e.u, e.v))
    brute = sum(
        1
        for (a, b) in es
        for c in range(25)
        if c > b and (b, c) in es and (a, c) in es
    )
    assert got == brute and brute > 0

    # empty graph degenerates cleanly
    empty = pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                          "v": pd.Series([], dtype=np.int64)})
    assert triangle_count(rd.from_pandas(empty), num_partitions=2) == 0


def test_keyword_totals_counts_and_null_text():
    from rp_extract_ray.stages.textstage import keyword_totals

    pdf = pd.DataFrame(
        {"text": ["spark spark join", None, "joinjoin", "no hits here"]}
    )
    out = keyword_totals(
        rd.from_pandas(pdf).repartition(3), "text", ["spark", "join", "zzz"]
    )
    got = dict(zip(out.keyword, zip(out.total, out.n_docs)))
    assert got["spark"] == (2, 1)
    assert got["join"] == (3, 2)  # substring semantics: joinjoin counts 2
    assert got["zzz"] == (0, 0)
    assert list(out.keyword) == ["spark", "join", "zzz"]  # caller order


def test_interval_gaps_are_strictly_positive_and_disjoint(tmp_path):
    from rp_extract_ray.pipelines.events import q_interval_gaps

    rng = np.random.default_rng(21)
    n = 500
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": rng.integers(0, 48 * 3600, n)
            .astype("datetime64[s]")
            .astype("datetime64[us]"),
            "user_id": rng.integers(0, 6, n).astype(np.int64),
            "event_type": rng.choice(["view", "click"], n),
            "value": np.round(rng.uniform(1, 120, n), 2),
            "props": "",
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    out = q_interval_gaps(str(tmp_path)).to_pandas()
    assert len(out) > 0
    assert (out["gap_s"] > 0).all()
    # gaps of one user never overlap each other
    for _, g in out.groupby("user_id"):
        g = g.sort_values("gap_start")
        assert (
            g["gap_end"].to_numpy()[:-1] <= g["gap_start"].to_numpy()[1:]
        ).all()


def test_mann_whitney_histogram_ranks_match_naive(tmp_path):
    from rp_extract_ray.pipelines.events import q_mann_whitney

    rng = np.random.default_rng(17)
    n = 800
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.zeros(n, dtype="datetime64[us]"),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b", "c"], n),
            # heavy ties on purpose: 1-decimal values
            "value": np.round(rng.uniform(0, 20, n), 1),
            "props": "",
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    out = q_mann_whitney(str(tmp_path)).set_index("event_type")
    # naive tied average ranks over the full vector
    v = pdf["value"].to_numpy()
    order = np.argsort(v, kind="mergesort")
    ranks = np.empty(n)
    sv = v[order]
    i = 0
    r = np.arange(1, n + 1, dtype=np.float64)
    while i < n:
        j = i
        while j < n and sv[j] == sv[i]:
            j += 1
        r[i:j] = (i + 1 + j) / 2.0
        i = j
    ranks[order] = r
    for t in ["a", "b", "c"]:
        m = pdf["event_type"].to_numpy() == t
        np.testing.assert_allclose(
            out.loc[t, "rank_sum"], ranks[m].sum(), atol=2e-6
        )
        np.testing.assert_allclose(
            out.loc[t, "u"],
            ranks[m].sum() - m.sum() * (m.sum() + 1) / 2.0,
            atol=2e-6,
        )


def test_path_counts_partition_invariant(tmp_path):
    from rp_extract_ray.pipelines.events import q_path_counts
    import rp_extract_ray.pipelines.events as EV

    rng = np.random.default_rng(23)
    n = 600
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": rng.integers(0, 10**6, n)
            .astype("datetime64[s]")
            .astype("datetime64[us]"),
            "user_id": rng.integers(0, 40, n).astype(np.int64),
            "event_type": rng.choice(["x", "y", "z"], n),
            "value": 1.0,
            "props": "",
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    a = q_path_counts(str(tmp_path)).reset_index(drop=True)
    old = EV.NP
    try:
        EV.NP = 3
        b = q_path_counts(str(tmp_path)).reset_index(drop=True)
    finally:
        EV.NP = old
    assert a.equals(b)
    # counts sum to the number of users
    assert a["n"].sum() <= pdf["user_id"].nunique()


def test_autocorr_matches_numpy(tmp_path):
    from rp_extract_ray.pipelines.events import q_autocorr

    pdf = _events_frame(n=400, n_ent=5, seed=31)
    pdf.assign(event_type="x", props="").to_parquet(
        str(tmp_path / "events.parquet")
    )
    got = q_autocorr(str(tmp_path)).to_pandas().set_index("user_id")
    for uid, g in pdf.sort_values(["ts", "event_id"]).groupby("user_id"):
        v = g["value"].to_numpy()
        x, y = v[1:], v[:-1]
        ok = ~np.isnan(x) & ~np.isnan(y)
        x, y = x[ok], y[ok]
        if len(x) >= 2 and x.std() > 0 and y.std() > 0:
            np.testing.assert_allclose(
                got.loc[uid, "ac1"], np.corrcoef(x, y)[0, 1], atol=2e-6
            )


def test_clustering_coefficient_matches_brute_force():
    from rp_extract_ray.stages.graph import clustering_coefficient

    e = _rand_graph(n_nodes=20, n_edges=90, seed=41)
    out = (
        clustering_coefficient(rd.from_pandas(e).repartition(3),
                               num_partitions=5)
        .to_pandas()
        .set_index("node")
    )
    es = set(zip(e.u, e.v))
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, nb in adj.items():
        tri = sum(
            1
            for a in nb
            for b in nb
            if a < b and (min(a, b), max(a, b)) in es
        )
        d = len(nb)
        lcc = 2.0 * tri / (d * (d - 1)) if d >= 2 else 0.0
        assert out.loc[v, "deg"] == d
        assert out.loc[v, "triangles"] == tri
        np.testing.assert_allclose(out.loc[v, "lcc"], lcc, atol=1e-12)


def test_repartition_join_left_outer_zero_block_right_keeps_schema():
    """Regression: a ZERO-BLOCK right side never enters the union, so its
    declared columns were silently dropped from the outer-join output
    (clustering_coefficient on a triangle-free graph crashed on the
    missing column)."""
    from rp_extract_ray.stages.join import repartition_join

    left = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "x": [1.0, 2.0, 3.0]}))
    empty = rd.from_pandas(
        pd.DataFrame(
            {"k": pd.Series([], dtype=np.int64),
             "y": pd.Series([], dtype=np.float64)}
        )
    ).filter(lambda r: False)
    out = repartition_join(
        left, empty, on="k", how="left_outer",
        right_cols=["k", "y"], num_partitions=4,
    ).to_pandas()
    assert len(out) == 3
    assert "y" in out.columns and out["y"].isna().all()


def test_ks_statistic_matches_naive(tmp_path):
    from rp_extract_ray.pipelines.events import q_ks_statistic

    rng = np.random.default_rng(47)
    n = 900
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.zeros(n, dtype="datetime64[us]"),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": rng.choice(["a", "b"], n),
            "value": np.round(rng.uniform(0, 10, n), 1),  # heavy ties
            "props": "",
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    out = q_ks_statistic(str(tmp_path)).set_index("event_type")
    vals = np.unique(pdf["value"])
    for t in ["a", "b"]:
        g = pdf[pdf.event_type == t]["value"].to_numpy()
        r = pdf[pdf.event_type != t]["value"].to_numpy()
        ks = max(
            abs((g <= v).mean() - (r <= v).mean()) for v in vals
        )
        np.testing.assert_allclose(out.loc[t, "ks"], ks, atol=2e-6)


def test_scd2_intervals_tile_the_timeline(tmp_path):
    from rp_extract_ray.pipelines.events import q_scd2_intervals

    pdf = _events_frame(n=250, n_ent=5, seed=51, with_nulls=False)
    pdf.assign(event_type="x", props="").to_parquet(
        str(tmp_path / "events.parquet")
    )
    out = (
        q_scd2_intervals(str(tmp_path))
        .to_pandas()
        .sort_values(["user_id", "valid_from", "event_id"],
                     ignore_index=True)
    )
    assert len(out) == len(pdf)
    for _, g in out.groupby("user_id"):
        vf = g["valid_from"].to_numpy()
        vt = g["valid_to"].to_numpy()
        # exactly one open row per user, and it is the last one
        assert pd.isna(vt[-1]) and (~pd.isna(vt[:-1])).all()
        # each interval closes at the next row's start (gapless history)
        assert (vt[:-1] == vf[1:]).all()


def test_conversion_time_semantics(tmp_path):
    from rp_extract_ray.pipelines.events import q_conversion_time

    ts = np.array([0, 10, 20, 30, 40, 50], dtype="datetime64[s]").astype(
        "datetime64[us]"
    )
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(6, dtype=np.int64),
            "ts": ts,
            # u0: purchase BEFORE signup only -> NULL conversion
            # u1: signup then purchase (+30 s)
            # u2: purchase only -> no row at all
            "user_id": np.array([0, 0, 1, 1, 2, 2], dtype=np.int64),
            "event_type": ["purchase", "signup", "signup", "purchase",
                           "purchase", "view"],
            "value": 1.0,
            "props": "",
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    out = (
        q_conversion_time(str(tmp_path))
        .to_pandas()
        .set_index("user_id")
        .sort_index()
    )
    assert set(out.index) == {0, 1}
    assert pd.isna(out.loc[0, "purchase_ts"]) and pd.isna(out.loc[0, "conv_s"])
    assert out.loc[1, "conv_s"] == 10.0


def test_compression_ratio_null_and_repetition_signal():
    from rp_extract_ray.stages.textstage import compression_ratios

    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["abc " * 200, None, "", "k9!q Zw@7 xV#2 mN$5 pL%8"],
        }
    )
    out = (
        compression_ratios(rd.from_pandas(pdf).repartition(2), "doc_id",
                           "text")
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    # repetitive text compresses far better than high-entropy text
    assert out.loc[0, "ratio"] < 0.1
    assert out.loc[3, "ratio"] > 0.8
    # NULL and empty text -> NULL outputs
    for i in (1, 2):
        assert pd.isna(out.loc[i, "ratio"]) and pd.isna(out.loc[i, "raw_len"])
    import zlib

    assert out.loc[0, "comp_len"] == len(zlib.compress(("abc " * 200).encode(), 6))


def test_triangle_orientation_paths_agree():
    """Degree-ordered wedge centers vs the id-order fallback must count
    the same triangles (global and per-node)."""
    from rp_extract_ray.stages.graph import per_node_triangles, triangle_count

    e = _rand_graph(n_nodes=30, n_edges=200, seed=61)
    ds = rd.from_pandas(e).repartition(4)
    a = triangle_count(ds, num_partitions=6)
    b = triangle_count(ds, num_partitions=6, degree_orient_limit=0)
    assert a == b and a > 0
    pa_ = (
        per_node_triangles(ds, num_partitions=6)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    pb = (
        per_node_triangles(ds, num_partitions=6, degree_orient_limit=0)
        .to_pandas()
        .sort_values("node", ignore_index=True)
    )
    assert pa_.equals(pb)


def test_repartition_join_broadcast_collapse_zero_block_right():
    """Regression: the size-hint broadcast collapse crashed (KeyError on
    the join key) when the right side had ZERO blocks — to_pandas() of an
    empty Dataset loses the schema."""
    from rp_extract_ray.stages.join import repartition_join

    deg = rd.from_pandas(pd.DataFrame({"src": [1, 2, 3], "deg": [2, 2, 2]}))
    empty = rd.from_pandas(
        pd.DataFrame(
            {"node": pd.Series([], dtype=np.int64),
             "tri": pd.Series([], dtype=np.int64)}
        )
    ).filter(lambda r: False)
    out = repartition_join(
        deg, empty, on="src", right_on="node", how="left_outer",
        right_cols=["node", "tri"], size_hint=3, broadcast_limit=100,
    ).to_pandas()
    assert len(out) == 3 and "tri" in out.columns and out["tri"].isna().all()


def test_pagerank_weighted_reduces_to_unweighted_on_unit_weights():
    from rp_extract_ray.stages.graph import pagerank

    e = _rand_graph(seed=71)
    e["n"] = np.int64(1)
    ds = rd.from_pandas(e).repartition(3)
    a = pagerank(ds, iterations=4).sort_values("node", ignore_index=True)
    b = pagerank(ds, iterations=4, weight_col="n").sort_values(
        "node", ignore_index=True
    )
    np.testing.assert_allclose(
        a["rank"].to_numpy(), b["rank"].to_numpy(), rtol=1e-12
    )
    # non-unit weights genuinely change the answer
    e2 = e.copy()
    e2["n"] = np.arange(1, len(e2) + 1, dtype=np.int64)
    c = pagerank(
        rd.from_pandas(e2).repartition(3), iterations=4, weight_col="n"
    ).sort_values("node", ignore_index=True)
    assert not np.allclose(a["rank"].to_numpy(), c["rank"].to_numpy())
    np.testing.assert_allclose(c["rank"].sum(), 1.0, atol=1e-9)


def test_dq_violations_detects_each_rule(tmp_path):
    from rp_extract_ray.pipelines.events import q_dq_violations

    pdf = pd.DataFrame(
        {
            # ids 0,1,2,2 -> 2 duplicate-participating rows
            "event_id": np.array([0, 1, 2, 2, 3, 4], dtype=np.int64),
            "ts": np.array(
                ["2024-02-01", "2020-01-01", "2024-02-01", "2024-02-01",
                 "2031-06-01", "2024-02-01"],
                dtype="datetime64[us]",
            ),
            "user_id": np.zeros(6, dtype=np.int64),
            "event_type": ["click", "bogus", "view", "view", "click", None],
            "value": [1.0, -5.0, 2000.0, 3.0, np.nan, 4.0],
            "props": "",
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    out = q_dq_violations(str(tmp_path)).set_index("rule")["n"]
    assert out["value_null"] == 1
    assert out["value_range"] == 2      # -5 and 2000
    assert out["type_domain"] == 2      # bogus + NULL
    assert out["ts_bounds"] == 2        # 2020 and 2031
    assert out["dup_event_id"] == 2     # both rows with id 2


def test_autocorr_emits_null_for_pairless_users(tmp_path):
    """Oracle parity: a user with a single event (or no valid pair) still
    gets a row, with NULL ac1 — SQL corr() over an all-dropped group."""
    from rp_extract_ray.pipelines.events import q_autocorr

    pdf = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": np.arange(5).astype("datetime64[s]").astype("datetime64[us]"),
            "user_id": np.array([0, 0, 0, 1, 2], dtype=np.int64),
            "event_type": "x",
            "value": [1.0, 2.0, 4.0, 7.0, np.nan],
            "props": "",
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    out = q_autocorr(str(tmp_path)).to_pandas().set_index("user_id")
    assert set(out.index) == {0, 1, 2}
    assert not np.isnan(out.loc[0, "ac1"])
    assert np.isnan(out.loc[1, "ac1"]) and np.isnan(out.loc[2, "ac1"])


def test_pagerank_query_wrappers_survive_large_node_path(tmp_path, monkeypatch):
    """The >2M-node pagerank path returns a Dataset; the query wrappers
    must pass it through (renamed) instead of crashing."""
    import rp_extract_ray.stages.graph as G
    from rp_extract_ray.pipelines import events as EV

    pdf = _events_frame(n=200, n_ent=10, seed=77, with_nulls=False)
    pdf.assign(event_type="click", props="").to_parquet(
        str(tmp_path / "events.parquet")
    )
    orig = G.pagerank

    def forced(*a, **kw):
        kw["broadcast_nodes_limit"] = 0
        return orig(*a, **kw)

    monkeypatch.setattr(G, "pagerank", forced)
    out = EV.q_pagerank(str(tmp_path))
    pdf_out = out.to_pandas() if not isinstance(out, pd.DataFrame) else out
    assert set(pdf_out.columns) == {"user_id", "pr"}
    assert len(pdf_out) > 0


def test_sorted_neighborhood_partition_invariant_and_complete():
    from rp_extract_ray.stages.dedup import sorted_neighborhood_pairs

    rng = np.random.default_rng(83)
    n = 300
    pdf = pd.DataFrame(
        {
            "_key": rng.permutation(n).astype(np.int64) * 7 + 1,
            "doc_id": np.arange(n, dtype=np.int64),
        }
    )
    ds = rd.from_pandas(pdf).repartition(5)

    def run(np_):
        return (
            sorted_neighborhood_pairs(
                ds, "_key", "doc_id", window=2, num_partitions=np_
            )
            .to_pandas()
            .sort_values(["id_a", "id_b"], ignore_index=True)
        )

    got = run(8)
    assert got.equals(run(2)), "partition invariance"
    # naive: sort by key, pairs within rank distance <= 2
    order = pdf.sort_values("_key", ignore_index=True)
    exp = set()
    for i in range(n):
        for k in (1, 2):
            if i + k < n:
                exp.add(
                    (order["doc_id"][i], order["doc_id"][i + k], k)
                )
    assert set(zip(got.id_a, got.id_b, got.dist)) == exp


def test_survival_km_matches_naive_and_handles_full_conversion(tmp_path):
    from rp_extract_ray.pipelines.events import q_survival_km

    rng = np.random.default_rng(91)
    rows = []
    eid = 0
    # 20 users: first event at day 0; some purchase on day u%7, some never
    for u in range(20):
        rows.append((eid, np.datetime64("2024-01-01", "us"), u, "view", 1.0))
        eid += 1
        if u % 4 != 0:  # 15 users purchase at day (u % 5)
            rows.append(
                (
                    eid,
                    np.datetime64("2024-01-01", "us")
                    + np.timedelta64(int((u % 5) * 86400 + 3600), "s"),
                    u, "purchase", 1.0,
                )
            )
            eid += 1
        # keep every user active later (events beyond horizon)
        rows.append(
            (eid, np.datetime64("2024-01-20", "us"), u, "click", 1.0)
        )
        eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value"]
    )
    pdf["props"] = ""
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    out = q_survival_km(str(tmp_path)).set_index("t_day")
    # naive KM
    t = {u: (u % 5 if u % 4 != 0 else 5) for u in range(20)}
    death = {u: u % 4 != 0 for u in range(20)}
    surv = 1.0
    for day in sorted(set(v for u, v in t.items() if death[u])):
        n_risk = sum(1 for u in t if t[u] >= day)
        d = sum(1 for u in t if t[u] == day and death[u])
        surv *= 1 - d / n_risk
        assert out.loc[day, "n_risk"] == n_risk
        assert out.loc[day, "d_events"] == d
        np.testing.assert_allclose(out.loc[day, "surv"], surv, atol=1e-6)

    # full conversion: everyone purchases day 0 -> single row surv 0.0
    pdf2 = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": [np.datetime64("2024-01-01", "us"),
                   np.datetime64("2024-01-01T01", "us")] * 2,
            "user_id": np.array([0, 0, 1, 1], dtype=np.int64),
            "event_type": ["view", "purchase"] * 2,
            "value": 1.0,
            "props": "",
        }
    )
    p2 = str(tmp_path / "p2"); import os; os.makedirs(p2, exist_ok=True)
    pdf2.to_parquet(p2 + "/events.parquet")
    out2 = q_survival_km(p2)
    assert len(out2) == 1 and out2["surv"].iloc[0] == 0.0


def test_degenerate_inputs_match_oracle_semantics(tmp_path):
    """Empty corpus / zero-transition corpus: the bounded reduces lose
    their schema on zero blocks; the queries must degrade to the SQL
    oracle's answer instead of crashing (review findings)."""
    import os

    from rp_extract_ray.pipelines.events import (
        q_activity_gini,
        q_survival_km,
        q_transition_entropy,
    )

    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype=np.int64),
            "ts": pd.Series([], dtype="datetime64[us]"),
            "user_id": pd.Series([], dtype=np.int64),
            "event_type": pd.Series([], dtype=str),
            "value": pd.Series([], dtype=np.float64),
            "props": pd.Series([], dtype=str),
        }
    )
    p1 = str(tmp_path / "empty"); os.makedirs(p1)
    empty.to_parquet(p1 + "/events.parquet")
    g = q_activity_gini(p1)
    assert g["n_users"].iloc[0] == 0 and pd.isna(g["gini"].iloc[0])
    assert len(q_survival_km(p1)) == 0

    # three users, one event each: zero same-user transitions
    one = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": np.zeros(3, dtype="datetime64[us]"),
            "user_id": np.arange(3, dtype=np.int64),
            "event_type": ["click", "view", "error"],
            "value": 1.0,
            "props": "",
        }
    )
    p2 = str(tmp_path / "one"); os.makedirs(p2)
    one.to_parquet(p2 + "/events.parquet")
    te = q_transition_entropy(p2)
    assert len(te) == 1 and te.isna().all(axis=None)


def test_late_gates_semantics_and_degenerates(tmp_path):
    """Pytest coverage for the final gate batch (third review): all-NULL
    value groups vanish from trimmed mean (the SQL-WHERE rule), lorenz
    ntile fill with m < 10 users, sessions-per-user hand check, cohort
    LTV cumulative exactness, conversion CI closed form."""
    import os

    from rp_extract_ray.pipelines.events import (
        q_cohort_ltv,
        q_conversion_ci,
        q_group_trimmed_mean,
        q_lorenz_deciles,
        q_median_centered,
        q_sessions_per_user,
        q_user_zscore,
    )

    base = np.datetime64("2024-01-01", "us")
    pdf = pd.DataFrame(
        {
            "event_id": np.arange(8, dtype=np.int64),
            "ts": [base, base + np.timedelta64(10, "m"),
                   base + np.timedelta64(50, "m"),  # 40-min gap: 2nd session
                   base, base + np.timedelta64(86400 + 60, "s"),
                   base, base, base + np.timedelta64(1, "h")],
            "user_id": np.array([0, 0, 0, 1, 1, 2, 3, 3], dtype=np.int64),
            "event_type": ["click", "purchase", "view", "purchase",
                           "click", "error", "view", "view"],
            # type 'error' has only a NULL value -> no trimmed-mean group
            "value": [10.0, 20.0, 30.0, 40.0, 50.0, np.nan, 60.0, 70.0],
            "props": "",
        }
    )
    p = str(tmp_path / "late"); os.makedirs(p)
    pdf.to_parquet(p + "/events.parquet")

    tm = q_group_trimmed_mean(p).to_pandas()
    assert "error" not in set(tm["event_type"])

    mc = q_median_centered(p).to_pandas()
    v = mc[mc.event_type == "view"].set_index("event_id")["centered"]
    # view median = 60 (30, 60, 70)
    assert v.loc[2] == -30.0 and v.loc[6] == 0.0 and v.loc[7] == 10.0

    lz = q_lorenz_deciles(p)
    # 4 users, ntile(10): tiles 1..4 get one user each; empty tiles
    # produce no group on either side
    assert list(lz["decile"]) == [1, 2, 3, 4]
    assert list(lz["n_users"]) == [1, 1, 1, 1]
    np.testing.assert_allclose(lz["share"].sum(), 1.0, atol=1e-9)

    sp = q_sessions_per_user(p).to_pandas().set_index("n_sessions")
    # 30-min gap rule: u0 (40-min gap), u1 (1-day gap), u3 (1-hour gap)
    # each have 2 sessions; u2 (single event) has 1
    assert sp.loc[1, "n_users"] == 1 and sp.loc[2, "n_users"] == 3

    ci = q_conversion_ci(p).set_index("segment")
    # segment 0 (u0): 1 purchase of 3; segment 1 (u1): 1 of 2
    assert ci.loc[0, "n"] == 3 and ci.loc[1, "n"] == 2
    pr = 1 / 3
    np.testing.assert_allclose(
        ci.loc[0, "ci_hi"] - ci.loc[0, "rate"],
        round(1.96 * np.sqrt(pr * (1 - pr) / 3), 6), atol=2e-6,
    )

    ltv = q_cohort_ltv(p).set_index(["cohort", "age"])
    c0 = int(pdf.ts.min().to_datetime64().astype("datetime64[D]")
             .astype("datetime64[us]").astype(np.int64)
             // 86400000000)
    # cohort day-0 cell: all day-0 events (users 0,1,2,3) = 10+20+30+40+60+70
    assert ltv.loc[(c0, 0), "cum_value"] == 230.0
    # age-1 cumulative adds user 1's 50
    assert ltv.loc[(c0, 1), "cum_value"] == 280.0

    uz = q_user_zscore(p)
    assert isinstance(uz, pd.DataFrame)
    # user 2's all-NULL mean row is dropped
    assert set(uz["user_id"]) == {0, 1, 3}
