"""Per-group top-k and quantiles vs pandas oracles."""

import numpy as np
import pandas as pd

import ray.data as rd

from rp_extract_ray.stages.groupops import grouped_quantiles, grouped_topk


def _df(n=3000, groups=17, seed=2):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "g": rng.integers(0, groups, n).astype(np.int64),
            "rid": np.arange(n, dtype=np.int64),
            "v": rng.normal(size=n).round(4),
        }
    )


def test_grouped_topk_matches_pandas():
    df = _df()
    got = (
        grouped_topk(
            rd.from_pandas(df).repartition(13), "g", ["v", "rid"],
            descending=[True, False], k=5,
        )
        .to_pandas()
        .sort_values(["g", "v", "rid"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    want = (
        df.sort_values(["v", "rid"], ascending=[False, True], kind="mergesort")
        .groupby("g", sort=False)
        .head(5)
        .sort_values(["g", "v", "rid"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["g", "rid", "v"]], want[["g", "rid", "v"]])


def test_grouped_topk_ties_deterministic():
    """Equal sort values resolve by the tiebreak column, independent of
    partitioning."""
    df = pd.DataFrame(
        {"g": [0] * 6 + [1] * 6, "rid": np.arange(12, dtype=np.int64),
         "v": [1.0] * 12}
    )
    for parts in (1, 3, 7):
        got = grouped_topk(
            rd.from_pandas(df).repartition(parts), "g", ["v", "rid"],
            descending=[True, False], k=2,
        ).to_pandas().sort_values(["g", "rid"]).reset_index(drop=True)
        assert got["rid"].tolist() == [0, 1, 6, 7]


def test_grouped_topk_small_groups():
    """Groups smaller than k return all their rows."""
    df = _df(n=40, groups=30)
    got = grouped_topk(
        rd.from_pandas(df), "g", ["v", "rid"], descending=[True, False], k=10
    ).to_pandas()
    assert len(got) == len(df)


def test_grouped_quantiles_matches_numpy():
    df = _df(n=5000, groups=9, seed=8)
    got = (
        grouped_quantiles(
            rd.from_pandas(df).repartition(11), "g", "v", [0.25, 0.5, 0.9]
        )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    for _, row in got.iterrows():
        vals = df.loc[df.g == row.g, "v"].to_numpy()
        assert row["n"] == len(vals)
        np.testing.assert_allclose(row["v_q25"], np.quantile(vals, 0.25))
        np.testing.assert_allclose(row["v_q50"], np.quantile(vals, 0.5))
        np.testing.assert_allclose(row["v_q90"], np.quantile(vals, 0.9))


def test_stratified_sample_partition_invariant():
    """Same winners under any partitioning; exactly n per (large) group."""
    from rp_extract_ray.stages.groupops import stratified_sample

    df = _df(n=2000, groups=5, seed=11)
    picks = []
    for parts in (1, 4, 16):
        got = (
            stratified_sample(
                rd.from_pandas(df).repartition(parts), "g", "rid", 7, seed=3
            )
            .to_pandas()
            .sort_values(["g", "rid"])
            .reset_index(drop=True)
        )
        assert (got.groupby("g").size() == 7).all()
        picks.append(got[["g", "rid"]])
    pd.testing.assert_frame_equal(picks[0], picks[1])
    pd.testing.assert_frame_equal(picks[0], picks[2])


def test_grouped_quantiles_nan_skipped():
    df = pd.DataFrame({"g": [0, 0, 0, 1], "v": [1.0, np.nan, 3.0, np.nan]})
    got = grouped_quantiles(rd.from_pandas(df), "g", "v", [0.5]).to_pandas()
    got = got.sort_values("g").reset_index(drop=True)
    assert got["n"].tolist() == [2, 0]
    assert got["v_q50"][0] == 2.0 and np.isnan(got["v_q50"][1])


def test_approx_quantiles_accuracy_and_partition_invariance():
    from rp_extract_ray.stages.groupops import approx_quantiles

    rng = np.random.default_rng(7)
    v = rng.lognormal(3.0, 1.0, size=20000)
    df = pd.DataFrame({"x": v})
    qs = [0.5, 0.9, 0.99]
    nbins = 512
    w = (v.max() - v.min()) / nbins

    got = approx_quantiles(rd.from_pandas(df), "x", qs, nbins=nbins)
    assert int(got["n"].iloc[0]) == len(v)
    for q in qs:
        est = got[f"x_p{int(q*100):02d}"].iloc[0]
        exact = np.quantile(v, q)
        assert abs(est - exact) <= w + 1e-9, (q, est, exact, w)

    # identical under a different partitioning (mergeable-sketch contract)
    other = approx_quantiles(
        rd.from_pandas(df).repartition(13), "x", qs, nbins=nbins
    )
    pd.testing.assert_frame_equal(got, other)


def test_approx_quantiles_constant_column():
    from rp_extract_ray.stages.groupops import approx_quantiles

    df = pd.DataFrame({"x": np.full(100, 42.5)})
    got = approx_quantiles(rd.from_pandas(df), "x", [0.5], nbins=16)
    assert got["x_p50"].iloc[0] == 42.5


def test_funnel_chained_minimums():
    from rp_extract_ray.stages.funnel import funnel

    t0 = pd.Timestamp("2026-01-01")

    def ev(u, s, typ):
        return {"user_id": u, "ts": t0 + pd.Timedelta(seconds=s),
                "event_type": typ}

    rows = [
        # u1: full funnel in order
        ev(1, 0, "view"), ev(1, 10, "click"), ev(1, 20, "purchase"),
        # u2: click BEFORE first view -> chain stops at view
        ev(2, 10, "view"), ev(2, 5, "click"),
        # u3: purchase before click -> steps 2, later purchase counts? none
        ev(3, 0, "view"), ev(3, 10, "click"), ev(3, 5, "purchase"),
        # u4: never viewed -> excluded entirely
        ev(4, 0, "click"), ev(4, 5, "purchase"),
        # u5: second click is the one followed by purchase; t_click is
        # still the FIRST click after view (chained-min, not best-path)
        ev(5, 0, "view"), ev(5, 5, "click"), ev(5, 30, "click"),
        ev(5, 10, "purchase"),
        # u6: simultaneous view/click (ts >= is inclusive)
        ev(6, 0, "view"), ev(6, 0, "click"),
    ]
    out = (
        funnel(rd.from_pandas(pd.DataFrame(rows)),
               ["view", "click", "purchase"], num_partitions=4)
        .to_pandas().set_index("user_id").sort_index()
    )
    assert list(out.index) == [1, 2, 3, 5, 6]
    assert out.loc[1, "steps_completed"] == 3
    assert out.loc[2, "steps_completed"] == 1 and pd.isna(out.loc[2, "t_click"])
    assert out.loc[3, "steps_completed"] == 2 and pd.isna(out.loc[3, "t_purchase"])
    # u5: first chained click at s=5, purchase at s=10 follows it
    assert out.loc[5, "t_click"] == t0 + pd.Timedelta(seconds=5)
    assert out.loc[5, "steps_completed"] == 3
    assert out.loc[6, "steps_completed"] == 2


def test_pivot_counts_matches_pandas_and_discovers_values():
    from rp_extract_ray.stages.pivot import pivot_counts

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 20, 500),
            "cat": rng.choice(["a", "b", "c"], 500),
            "v": rng.normal(size=500),
        }
    )
    df.loc[5, "v"] = np.nan  # NaN treated as 0 in sums
    got = (
        pivot_counts(
            rd.from_pandas(df).repartition(7), "k", "cat", value_col="v"
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    want_n = df.pivot_table(
        index="k", columns="cat", values="v", aggfunc="size", fill_value=0
    )
    want_s = df.assign(v=df["v"].fillna(0.0)).pivot_table(
        index="k", columns="cat", values="v", aggfunc="sum", fill_value=0.0
    )
    for c in ("a", "b", "c"):
        assert got[f"n_{c}"].to_numpy().tolist() == want_n[c].to_numpy().tolist()
        np.testing.assert_allclose(
            got[f"sum_{c}"].to_numpy(), want_s[c].to_numpy(), atol=1e-9
        )
    # value discovery path agrees with the explicit list
    auto = (
        pivot_counts(rd.from_pandas(df), "k", "cat", value_col="v")
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], auto[sorted(auto.columns)]
    )


def test_standardize_grouped_matches_pandas():
    from rp_extract_ray.stages.standardize import standardize_grouped

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 8, 400),
            "x": rng.normal(50, 10, 400),
        }
    )
    df.loc[df.g == 7, "x"] = 3.25  # zero-variance group -> std treated as 1
    got = (
        standardize_grouped(
            rd.from_pandas(df.reset_index(names="rid")).repartition(5),
            ["x"], "g",
        )
        .to_pandas()
        .sort_values("rid", ignore_index=True)
    )
    grp = df.groupby("g")["x"]
    mean = df["g"].map(grp.mean())
    std = df["g"].map(grp.std(ddof=0)).replace(0.0, 1.0)
    want = ((df["x"] - mean) / std).to_numpy()
    np.testing.assert_allclose(got["x_gz"].to_numpy(), want, atol=1e-9)
    assert (got.loc[got.g == 7, "x_gz"] == 0.0).all()


def test_cube_aggregate_matches_pandas():
    """CUBE over two string keys == pandas groupby at every level, invariant
    to partitioning (additively merged partials)."""
    from rp_extract_ray.stages.rollup import cube_aggregate, rollup_aggregate

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "a": rng.choice(["x", "y", "z"], 500),
            "b": rng.choice(["p", "q"], 500),
            "v": rng.normal(size=500).round(4),
        }
    )

    def level(keys):
        if keys:
            g = df.groupby(keys, as_index=False).agg(
                total=("v", "sum"), n=("v", "size")
            )
        else:
            g = pd.DataFrame({"total": [df["v"].sum()], "n": [len(df)]})
        for k in ("a", "b"):
            if k not in keys:
                g[k] = "ALL"
        return g[["a", "b", "total", "n"]]

    want = pd.concat(
        [level(["a", "b"]), level(["a"]), level(["b"]), level([])],
        ignore_index=True,
    ).sort_values(["a", "b"], ignore_index=True)
    want["n"] = want["n"].astype(np.int64)

    for parts in (1, 5):
        got = (
            cube_aggregate(
                rd.from_pandas(df).repartition(parts), ["a", "b"],
                sum_cols={"total": "v"}, count_alias="n",
            )
            .to_pandas()
            .sort_values(["a", "b"], ignore_index=True)
        )
        assert got["n"].tolist() == want["n"].tolist()
        assert np.allclose(got["total"].to_numpy(), want["total"].to_numpy())

    # rollup is the prefix subset: (a,b), (a,), ()
    ru = (
        rollup_aggregate(
            rd.from_pandas(df).repartition(3), ["a", "b"],
            sum_cols={"total": "v"}, count_alias="n",
        )
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    want_ru = pd.concat(
        [level(["a", "b"]), level(["a"]), level([])], ignore_index=True
    ).sort_values(["a", "b"], ignore_index=True)
    assert ru["n"].tolist() == [int(x) for x in want_ru["n"]]
    assert np.allclose(ru["total"].to_numpy(), want_ru["total"].to_numpy())


def test_kmeans_recovers_blobs_partition_invariant():
    """3 well-separated Gaussian blobs: every member lands with its blob's
    seed cluster, identically at any partitioning."""
    import ray.data as rd

    from rp_extract_ray.stages.kmeans import kmeans_assign, kmeans_lloyd

    rng = np.random.default_rng(11)
    centers = np.array([[0.0] * 8, [30.0] * 8, [-30.0] * 8])
    X = np.concatenate(
        [rng.normal(c, 0.5, size=(60, 8)) for c in centers], axis=0
    )
    df = pd.DataFrame(
        {"vec_id": np.arange(180, dtype=np.int64), "embedding": list(X)}
    )
    results = []
    for parts in (1, 7):
        ds = rd.from_pandas(df).repartition(parts)
        C = kmeans_lloyd(ds, n_clusters=3, n_iter=4)
        out = (
            kmeans_assign(ds, C)
            .select_columns(["vec_id", "cluster"])
            .to_pandas()
            .sort_values("vec_id", ignore_index=True)
        )
        results.append(out["cluster"].to_numpy())
        # each blob is pure: one distinct cluster id per 60-row block
        for blk in range(3):
            assert len(set(results[-1][blk * 60 : (blk + 1) * 60])) == 1
        assert len(set(results[-1])) == 3
    assert (results[0] == results[1]).all()


def test_heavy_hitters_exact_superset_guarantee():
    """Skewed corpus: the two-pass result equals exact pandas counts at the
    threshold, across partitionings (candidate pigeonhole guarantee)."""
    import ray.data as rd

    from rp_extract_ray.functions.sketch import heavy_hitters

    rng = np.random.default_rng(3)
    # hot keys 0,1 at ~20%/~10%; long uniform tail
    vals = np.concatenate(
        [np.zeros(400), np.ones(200), rng.integers(2, 300, 1400)]
    ).astype(np.int64)
    rng.shuffle(vals)
    df = pd.DataFrame({"k": vals})
    vc = df["k"].value_counts()
    thr = 0.05
    import math
    want = vc[vc >= math.ceil(thr * len(df))].sort_index()
    for parts in (1, 9):
        got = heavy_hitters(
            rd.from_pandas(df).repartition(parts), "k", threshold_frac=thr
        ).sort_values("k", ignore_index=True)
        assert got["k"].tolist() == sorted(want.index.tolist())
        assert got.set_index("k")["n"].to_dict() == want.to_dict()

    # empty result path
    got = heavy_hitters(rd.from_pandas(df), "k", threshold_frac=0.9)
    assert len(got) == 0


def _word_docs(n_docs=300, seed=13, dup_every=7):
    rng = np.random.default_rng(seed)
    words = np.array([f"w{i}" for i in range(40)])
    docs = []
    for i in range(n_docs):
        if i % dup_every == 0 and i > 0:
            docs.append(docs[i - 1])  # exact dup -> shared n-grams
        else:
            docs.append(" ".join(rng.choice(words, rng.integers(6, 30))))
    return pd.DataFrame({"doc_id": np.arange(n_docs, dtype=np.int64), "text": docs})


def test_boilerplate_ngrams_matches_pandas():
    import ray.data as rd

    from rp_extract_ray.stages.textstage import boilerplate_ngrams

    df = _word_docs()
    toks = df["text"].str.lower().str.findall(r"[0-9a-z_]+")
    rows = []
    for doc_id, a in zip(df["doc_id"], toks):
        for i in range(len(a) - 4):
            rows.append((doc_id, " ".join(a[i : i + 5])))
    want = (
        pd.DataFrame(rows, columns=["d", "gram"])
        .drop_duplicates()
        .groupby("gram")
        .size()
    )
    want = want[want >= 2].sort_index()
    for parts in (1, 6):
        got = (
            boilerplate_ngrams(
                rd.from_pandas(df).repartition(parts), n=5, min_docs=2
            )
            .to_pandas()
            .sort_values("gram", ignore_index=True)
        )
        assert got["gram"].tolist() == want.index.tolist()
        assert got["n_docs"].astype(int).tolist() == want.tolist()


def test_bigram_pmi_matches_pandas():
    import ray.data as rd

    from rp_extract_ray.stages.textstage import bigram_pmi

    df = _word_docs(200, seed=5)
    toks = df["text"].str.lower().str.findall(r"[0-9a-z_]+")
    uni = pd.Series(np.concatenate(toks.to_numpy())).value_counts()
    pairs = []
    for a in toks:
        pairs += list(zip(a[:-1], a[1:]))
    bi = pd.Series(pairs).value_counts()
    bi = bi[bi >= 5]
    n_uni = int(uni.sum())
    want = {
        (w1, w2): (int(c), round(np.log(c * n_uni / (uni[w1] * uni[w2])), 4))
        for (w1, w2), c in bi.items()
    }
    for parts in (1, 5):
        got = bigram_pmi(
            rd.from_pandas(df).repartition(parts), min_count=5
        ).to_pandas()
        gmap = {
            (r.w1, r.w2): (int(r.n_ab), float(r.pmi))
            for r in got.itertuples()
        }
        assert set(gmap) == set(want)
        for k in want:
            assert gmap[k][0] == want[k][0]
            assert abs(gmap[k][1] - want[k][1]) < 2e-4


def test_group_hll_partition_invariant_and_accurate():
    import ray.data as rd

    from rp_extract_ray.functions.sketch import group_hll_distinct

    rng = np.random.default_rng(21)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 30_000),
            "v": rng.integers(0, 5000, 30_000).astype(np.int64),
        }
    )
    truth = df.groupby("g")["v"].nunique()
    outs = []
    for parts in (1, 8):
        got = group_hll_distinct(
            rd.from_pandas(df).repartition(parts), "g", "v"
        )
        outs.append(got)
        for g, est in zip(got["g"], got["n_distinct"]):
            assert abs(est - truth[g]) / truth[g] < 0.05  # ~1.6% expected @ p=12
    pd.testing.assert_frame_equal(outs[0], outs[1])  # bit-identical merge


def test_review_fixes_regressions():
    """Round-3 self-review findings: count-only CUBE, null group keys,
    null-first OHLC open, flatten null skip."""
    import ray.data as rd

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.rollup import cube_aggregate

    # count-only CUBE (no sum_cols) works and counts correctly
    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"]})
    got = (
        cube_aggregate(rd.from_pandas(df), ["a", "b"], count_alias="n")
        .to_pandas()
        .sort_values(["a", "b"], ignore_index=True)
    )
    assert int(got.loc[(got.a == "ALL") & (got.b == "ALL"), "n"].iloc[0]) == 3
    assert int(got.loc[(got.a == "x") & (got.b == "ALL"), "n"].iloc[0]) == 2

    # null keys form a group instead of vanishing
    dfn = pd.DataFrame({"k": ["a", None, None, "b"], "v": [1.0, 2.0, 3.0, 4.0]})
    out = grouped_reduce(rd.from_pandas(dfn), "k", {"s": ("v", "sum")}).to_pandas()
    assert len(out) == 3
    null_row = out[out["k"].isna()]
    assert len(null_row) == 1 and float(null_row["s"].iloc[0]) == 5.0

    # OHLC open_v surfaces a positionally-first null
    from rp_extract_ray.stages.timegrid import time_bucket_agg

    ev = pd.DataFrame(
        {
            "e": ["u"] * 3,
            "ts": pd.to_datetime(["2025-01-01 10:00", "2025-01-01 10:10", "2025-01-01 10:20"]),
            "i": [0, 1, 2],
            "value": [np.nan, 5.0, 7.0],
        }
    )
    ob = time_bucket_agg(
        rd.from_pandas(ev), entity_col="e", ts_col="ts", order_cols=("ts", "i"),
        value_col="value", num_partitions=2,
    ).to_pandas()
    assert len(ob) == 1 and np.isnan(ob["open_v"].iloc[0]) and ob["close_v"].iloc[0] == 7.0

    # flatten skips nulls; all-null group -> null
    from rp_extract_ray.stages.session import flatten_ordered

    fr = pd.DataFrame(
        {
            "e": ["u", "u", "w"],
            "ts": [1.0, 2.0, 1.0],
            "i": [0, 1, 0],
            "t": ["a", None, None],
        }
    )
    fo = (
        flatten_ordered(
            rd.from_pandas(fr), entity_col="e", value_col="t",
            order_cols=("ts", "i"), sep=",", out_col="flat", num_partitions=2,
        )
        .to_pandas()
        .sort_values("e", ignore_index=True)
    )
    assert fo.loc[0, "flat"] == "a" and pd.isna(fo.loc[1, "flat"])


def test_trend_slope_zero_time_variance_is_null():
    """All-equal timestamps (3+ rows) must yield NULL slope, not float
    cancellation noise (round-3 self-review finding)."""
    import duckdb
    import ray.data as rd
    import ray

    import tempfile, os
    from rp_extract_ray.pipelines.events import q_trend_slope

    ts = pd.Timestamp("2025-02-14 12:00:00.123456")
    ev = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": [ts, ts, ts, ts + pd.Timedelta("1h"), ts + pd.Timedelta("2h")],
            "user_id": np.array([1, 1, 1, 2, 2], dtype=np.int64),
            "event_type": ["view"] * 5,
            "value": [3.0, 5.0, 7.0, 1.0, 2.0],
            "props": ["{}"] * 5,
        }
    )
    d = tempfile.mkdtemp()
    ev.to_parquet(os.path.join(d, "events.parquet"))
    out = q_trend_slope(d).to_pandas().sort_values("user_id", ignore_index=True)
    assert np.isnan(out.loc[0, "slope"])  # user 1: zero time variance
    assert np.isfinite(out.loc[1, "slope"])  # user 2: real slope


def test_pack_sequences_partition_invariant():
    """pack_id is a global ordered prefix: identical under any partition
    count, and equal to the single-process cumsum."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rp_extract_ray.stages.pack import pack_sequences, pack_stats

    rng = np.random.default_rng(5)
    n = 3000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "tok": rng.integers(1, 400, size=n).astype(np.int64),
        }
    )
    shuffled = df.sample(frac=1.0, random_state=2).reset_index(drop=True)
    excl = np.concatenate([[0], np.cumsum(df["tok"].to_numpy())[:-1]])
    expect = excl // 256

    for p in (3, 16):
        got = (
            pack_sequences(
                rd.from_pandas(shuffled), token_col="tok", budget=256,
                num_partitions=p,
            )
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert (got["pack_id"].to_numpy() == expect).all(), p

    st = pack_stats(
        rd.from_pandas(shuffled), token_col="tok", budget=256, num_partitions=5
    ).to_pandas()
    # every pack except possibly the last covers >= budget tokens once its
    # straddling head doc is accounted: totals must sum to the corpus
    assert int(st["tok_sum"].sum()) == int(df["tok"].sum())
    assert int(st["n_docs"].sum()) == n


def test_kmeans_tree_merge_fan_invariant(monkeypatch):
    """Forcing the fan-in to 2 exercises multi-level seed/partial merges;
    centroids must match the wide-fan run exactly (additive partials merge
    in stable block order at every fan)."""
    import ray.data as rd

    from rp_extract_ray.stages import kmeans as K

    rng = np.random.default_rng(7)
    X = rng.normal(0.0, 5.0, size=(400, 6))
    df = pd.DataFrame(
        {"vec_id": np.arange(400, dtype=np.int64), "embedding": list(X)}
    )
    ds = rd.from_pandas(df).repartition(11)
    # sliver coalescing would fold 11 blocks back to 1 at 400 rows; pin the
    # group size down so the tree actually has leaves to merge
    monkeypatch.setattr(K, "_MERGE_FAN", 2)
    real_pin = K._pinned_blocks

    def no_coalesce(d, id_col, vec_col):
        mat = d.select_columns([id_col, vec_col]).materialize()
        return [
            K._prep_block.remote(id_col, vec_col, r) for r in mat.to_arrow_refs()
        ]

    monkeypatch.setattr(K, "_pinned_blocks", no_coalesce)
    C_fan2 = K.kmeans_lloyd(ds, n_clusters=4, n_iter=3)
    monkeypatch.setattr(K, "_MERGE_FAN", 64)
    monkeypatch.setattr(K, "_pinned_blocks", real_pin)
    C_wide = K.kmeans_lloyd(ds, n_clusters=4, n_iter=3)
    assert np.allclose(C_fan2, C_wide, rtol=0, atol=1e-9)


def test_grouped_mode_tiebreak_and_partition_invariance():
    """Highest count wins; count ties resolve to the SMALLEST value —
    identically under 1 block and many slivers."""
    import ray.data as rd

    from rp_extract_ray.stages.groupops import grouped_mode

    df = pd.DataFrame(
        {
            "k": ["a"] * 5 + ["b"] * 4 + ["c"] * 1,
            # a: x:2 y:2 z:1 -> tie x/y -> 'x'; b: q:3 p:1 -> 'q'; c: single row
            "v": ["y", "x", "z", "x", "y", "q", "q", "p", "q", "solo"],
        }
    )
    want = pd.DataFrame(
        {"k": ["a", "b", "c"], "mode_v": ["x", "q", "solo"], "n": [2, 3, 1]}
    )
    for parts in (1, 7):
        got = (
            grouped_mode(rd.from_pandas(df).repartition(parts), "k", "v")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        got["n"] = got["n"].astype(np.int64)
        pd.testing.assert_frame_equal(got, want.astype({"n": np.int64}))


def test_grouped_corr_matches_numpy_and_nulls_degenerate():
    import ray.data as rd

    from rp_extract_ray.stages.groupops import grouped_corr

    rng = np.random.default_rng(11)
    n = 400
    k = rng.choice(["g1", "g2"], n)
    x = rng.normal(0, 3, n)
    y = 0.6 * x + rng.normal(0, 1, n)
    df = pd.DataFrame({"k": k, "x": x, "y": y})
    # degenerate groups: constant x (zero variance) and a single row
    df = pd.concat(
        [
            df,
            pd.DataFrame({"k": ["flat"] * 3, "x": [5.0] * 3, "y": [1.0, 2.0, 3.0]}),
            pd.DataFrame({"k": ["one"], "x": [1.0], "y": [2.0]}),
        ],
        ignore_index=True,
    )
    got = (
        grouped_corr(rd.from_pandas(df).repartition(9), "k", "x", "y")
        .to_pandas()
        .set_index("k")["corr"]
    )
    for g in ("g1", "g2"):
        sub = df[df["k"] == g]
        want = np.corrcoef(sub["x"], sub["y"])[0, 1]
        assert abs(got[g] - round(want, 6)) <= 1e-6
    assert pd.isna(got["flat"]) and pd.isna(got["one"])


def test_unpivot_matches_pandas_melt():
    import ray.data as rd

    from rp_extract_ray.stages.pivot import unpivot

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "id": np.arange(50, dtype=np.int64),
            "a": rng.normal(size=50),
            "b": rng.normal(size=50),
            "c": rng.normal(size=50),
        }
    )
    df.loc[7, "b"] = np.nan  # nulls preserved
    got = (
        unpivot(rd.from_pandas(df).repartition(6), ["id"], ["a", "b", "c"])
        .to_pandas()
        .sort_values(["id", "variable"], ignore_index=True)
    )
    want = (
        df.melt(id_vars=["id"], value_vars=["a", "b", "c"])
        .sort_values(["id", "variable"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_cms_counts_partition_invariant_and_overcount_bound():
    """Count-min: the distributed counter-sum merge must be exact under any
    partitioning (same estimates at 1 vs 13 blocks), estimates never
    undercount, and with far fewer keys than width they are exact."""
    from rp_extract_ray.functions.sketch import approx_counts

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 40, 5000).astype(np.int64)
    df = pd.DataFrame({"k": keys})
    probes = np.arange(40, dtype=np.int64)
    exact = pd.Series(keys).value_counts().reindex(probes).fillna(0).to_numpy()

    a = approx_counts(rd.from_pandas(df).repartition(1), "k", probes)
    b = approx_counts(rd.from_pandas(df).repartition(13), "k", probes)
    np.testing.assert_array_equal(a, b)
    assert (a >= exact).all()
    # 40 keys into 4x4096 cells: collisions are overwhelmingly unlikely
    np.testing.assert_array_equal(a, exact)


def test_cms_merge_equals_single_grid():
    """cms_merge(sum) over split inputs == one accumulate over the whole."""
    from rp_extract_ray.functions.sketch import (
        cms_accumulate,
        cms_merge,
        cms_query,
    )

    rng = np.random.default_rng(11)
    vals = rng.integers(0, 1000, 8000).astype(np.int64)
    whole = cms_accumulate(vals)
    parts = cms_merge(cms_accumulate(vals[:3000]), cms_accumulate(vals[3000:]))
    np.testing.assert_array_equal(whole, parts)
    probes = np.arange(50, dtype=np.int64)
    np.testing.assert_array_equal(
        cms_query(whole, probes), cms_query(parts, probes)
    )


def test_grouped_mad_matches_numpy():
    from rp_extract_ray.stages.groupops import grouped_mad

    df = _df(n=2000, groups=9, seed=7)
    # inject NaNs: they must be dropped, not poison the medians
    df.loc[df.index % 37 == 0, "v"] = np.nan
    got = (
        grouped_mad(rd.from_pandas(df).repartition(11), "g", "v")
        .to_pandas()
        .sort_values("g", ignore_index=True)
    )
    for _, row in got.iterrows():
        v = df.loc[df["g"] == row["g"], "v"].dropna().to_numpy()
        assert row["n"] == len(v)
        med = float(np.median(v))
        assert row["med"] == med
        assert row["mad"] == float(np.median(np.abs(v - med)))


def test_pdf_with_schema_preserves_empty_columns():
    from rp_extract_ray.pipelines.relational import _pdf_with_schema

    # empty dataset with zero output blocks loses columns on to_pandas
    ds = rd.from_pandas(pd.DataFrame({"a": [1], "b": [2.0]})).filter(
        lambda r: False
    )
    out = _pdf_with_schema(ds, {"a": "int64", "b": "float64"})
    assert list(out.columns) == ["a", "b"] and len(out) == 0
    # non-empty passes through with column order enforced
    out2 = _pdf_with_schema(
        pd.DataFrame({"b": [2.0], "a": [1]}), {"a": "int64", "b": "float64"}
    )
    assert list(out2.columns) == ["a", "b"] and len(out2) == 1
