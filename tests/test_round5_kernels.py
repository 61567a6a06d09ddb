"""Round-5 kernels: rolling quantile, min-max scaling, Levenshtein,
char entropy, prefix-blocked edit-distance pairs — each vs a naive oracle."""

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from rp_extract_ray.functions.editdist import levenshtein
from rp_extract_ray.stages.lag import rolling_quantile_within
from rp_extract_ray.stages.textstage import char_entropy_batch


def _starts(cid):
    starts = np.zeros(len(cid), dtype=np.int64)
    for i in range(1, len(cid)):
        starts[i] = i if cid[i] != cid[i - 1] else starts[i - 1]
    return starts


# ---------------------------------------------------------------- rolling q


def test_rolling_quantile_matches_pandas_rolling():
    rng = np.random.default_rng(11)
    cid = np.sort(rng.integers(0, 6, 400))
    v = rng.normal(size=400)
    v[rng.choice(400, 30, replace=False)] = np.nan
    starts = _starts(cid)
    for k, q in [(5, 0.5), (3, 0.25), (8, 0.9)]:
        got = rolling_quantile_within(v, starts, k, q)
        exp = (
            pd.Series(v)
            .groupby(cid)
            .rolling(k, min_periods=1)
            .quantile(q, interpolation="linear")
            .to_numpy()
        )
        np.testing.assert_allclose(got, exp, equal_nan=True, atol=1e-12)


def test_rolling_quantile_respects_run_boundaries():
    # two entities back-to-back: second run's first row must NOT see the first
    v = np.array([1.0, 2.0, 3.0, 100.0, 101.0])
    starts = np.array([0, 0, 0, 3, 3])
    got = rolling_quantile_within(v, starts, 3, 0.5)
    np.testing.assert_allclose(got, [1.0, 1.5, 2.0, 100.0, 100.5])


# ---------------------------------------------------------------- min-max


def test_minmax_scale_and_grouped(ray_session):
    from rp_extract_ray.stages.standardize import minmax_scale, minmax_scale_grouped

    pdf = pd.DataFrame(
        {
            "id": np.arange(40),
            "g": np.repeat(["a", "b", "c", "d"], 10),
            "v": np.concatenate(
                [np.linspace(-3, 7, 10), np.linspace(0, 1, 10),
                 np.full(10, 5.0), np.linspace(100, 200, 10)]
            ),
        }
    )
    ds = rd.from_pandas(pdf).repartition(4)
    out = minmax_scale(ds, ["v"]).to_pandas().sort_values("id")
    lo, hi = pdf["v"].min(), pdf["v"].max()
    np.testing.assert_allclose(out["v_mm"], (pdf["v"] - lo) / (hi - lo), atol=1e-12)

    outg = minmax_scale_grouped(ds, ["v"], "g").to_pandas().sort_values("id")
    exp = pdf.groupby("g")["v"].transform(
        lambda s: np.zeros(len(s)) if s.max() == s.min()
        else (s - s.min()) / (s.max() - s.min())
    )
    np.testing.assert_allclose(outg["v_gmm"].to_numpy(), exp.to_numpy(), atol=1e-12)
    # group "c" is constant -> zero-range guard
    assert (outg.loc[outg["g"] == "c", "v_gmm"] == 0.0).all()


# ---------------------------------------------------------------- editdist


def _naive_lev(a, b):
    m, n = len(a), len(b)
    d = np.zeros((m + 1, n + 1), dtype=np.int64)
    d[:, 0] = np.arange(m + 1)
    d[0, :] = np.arange(n + 1)
    for i in range(1, m + 1):
        for j in range(1, n + 1):
            d[i, j] = min(
                d[i - 1, j] + 1,
                d[i, j - 1] + 1,
                d[i - 1, j - 1] + (a[i - 1] != b[j - 1]),
            )
    return int(d[m, n])


def test_levenshtein_matches_naive_dp():
    rng = np.random.default_rng(7)
    alpha = "abcde"
    for _ in range(60):
        a = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        b = "".join(rng.choice(list(alpha), rng.integers(0, 12)))
        assert levenshtein(a, b) == _naive_lev(a, b), (a, b)


def test_levenshtein_edges_and_unicode():
    assert levenshtein("", "") == 0
    assert levenshtein("", "abc") == 3
    assert levenshtein("kitten", "sitting") == 3
    # codepoint (not byte) costs: one multi-byte substitution == 1
    assert levenshtein("café", "cafe") == 1
    assert levenshtein("\U0001f600ab", "ab") == 1


def test_edit_distance_pairs_blocks(ray_session):
    from rp_extract_ray.stages.dedup import edit_distance_pairs

    base = "the quick brown fox jumps over the lazy dog " * 3
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": [
                base,
                base.replace("lazy", "hazy"),          # dist 1, same prefix
                base.replace("quick", "slow"),          # changes prefix -> new block
                "completely different text here " * 5,  # own block
                base + " extra tail beyond truncate",   # same 200-prefix? dist via tail
            ],
        }
    )
    ds = rd.from_pandas(docs).repartition(2)
    out = (
        edit_distance_pairs(ds, prefix=16, truncate=200, max_dist=20, num_partitions=4)
        .to_pandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs
    assert all(a < b for a, b in pairs)
    # doc 2 and 3 share no prefix with the base family
    assert not any(2 in p or 3 in p for p in pairs)
    d01 = int(out.loc[(out["id_a"] == 0) & (out["id_b"] == 1), "dist"].iloc[0])
    assert d01 == _naive_lev(docs["text"][0][:200], docs["text"][1][:200])


def test_edit_distance_pairs_hot_block_raises(ray_session):
    import pytest

    from rp_extract_ray.stages.dedup import edit_distance_pairs

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(20, dtype=np.int64),
            "text": ["SHARED BOILERPLATE HEAD " + str(i) for i in range(20)],
        }
    )
    ds = rd.from_pandas(docs)
    with pytest.raises(Exception, match="max_block"):
        edit_distance_pairs(ds, max_block=8, num_partitions=2).materialize()


# ---------------------------------------------------------------- entropy


def test_char_entropy_known_values():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": ["", "aaaa", "aabb", "abcd"],
        }
    )
    out = char_entropy_batch(t)
    ent = out.column("char_entropy").to_pylist()
    np.testing.assert_allclose(ent, [0.0, 0.0, 1.0, 2.0], atol=1e-9)


def test_char_entropy_matches_naive_random():
    rng = np.random.default_rng(3)
    texts = [
        "".join(rng.choice(list("abcdefg h\nxyz"), rng.integers(1, 300)))
        for _ in range(25)
    ] + [None, ""]
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts}
    )
    got = char_entropy_batch(t).column("char_entropy").to_pylist()
    for txt, g in zip(texts, got):
        if not txt:
            assert g == 0.0
            continue
        _, c = np.unique(list(txt), return_counts=True)
        p = c / c.sum()
        assert abs(g - round(float(-(p * np.log2(p)).sum()), 6)) < 2e-6


# ---------------------------------------------------------------- latest


def test_latest_per_key_matches_naive_and_partitioning(ray_session):
    from rp_extract_ray.stages.dedup import latest_per_key

    rng = np.random.default_rng(5)
    n = 600
    pdf = pd.DataFrame(
        {
            "k": rng.integers(0, 40, n),
            "ts": rng.integers(0, 50, n),       # heavy ts ties within a key
            "uid": np.arange(n, dtype=np.int64),  # unique tiebreaker
            "v": rng.normal(size=n).round(4),
        }
    )
    exp = (
        pdf.sort_values(["k", "ts", "uid"])
        .groupby("k", sort=False)
        .tail(1)
        .sort_values("k")
        .reset_index(drop=True)
    )
    for nparts, nblocks in [(2, 1), (8, 5), (16, 13)]:
        got = (
            latest_per_key(
                rd.from_pandas(pdf).repartition(nblocks),
                "k", ("ts", "uid"), num_partitions=nparts,
            )
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)[exp.columns.tolist()]
        )
        pd.testing.assert_frame_equal(got, exp)


# ---------------------------------------------------------------- rejoin


def test_repartition_join_all_modes(ray_session):
    from rp_extract_ray.stages.join import repartition_join

    rng = np.random.default_rng(2)
    L = pd.DataFrame(
        {
            "k": rng.integers(0, 120, 800),
            "lv": rng.normal(size=800).round(3),
            "lid": np.arange(800, dtype=np.int64),
        }
    )
    R = pd.DataFrame(
        {
            "rk": rng.integers(60, 180, 300),  # orphans on both sides
            "rv": rng.integers(0, 100, 300),
            "rid": np.arange(300, dtype=np.int64),
        }
    )
    lds, rds = rd.from_pandas(L).repartition(5), rd.from_pandas(R).repartition(3)

    def canon(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            df[c] = df[c].astype("float64")
        return df.sort_values(list(df.columns), ignore_index=True).fillna(-9e9)

    for how, pdhow in [("inner", "inner"), ("left_outer", "left"), ("full_outer", "outer")]:
        got = repartition_join(
            lds, rds, on="k", right_on="rk", how=how, num_partitions=7
        ).to_pandas()
        exp = L.merge(R.rename(columns={"rk": "k"}), on="k", how=pdhow)
        np.testing.assert_allclose(
            canon(got).to_numpy(), canon(exp).to_numpy(), atol=0
        )
    for how in ["semi", "anti"]:
        got = repartition_join(
            lds, rds, on="k", right_on="rk", how=how, num_partitions=7
        ).to_pandas()
        mask = L["k"].isin(R["rk"])
        exp = L[mask] if how == "semi" else L[~mask]
        np.testing.assert_allclose(
            canon(got).to_numpy(), canon(exp).to_numpy(), atol=0
        )


def test_repartition_join_no_int_dtype_drift(ray_session):
    # a partitioning where SOME partitions have orphans and others don't
    # must still yield ONE integer-typed column, not a float/int mix
    from rp_extract_ray.stages.join import repartition_join

    L = pd.DataFrame({"k": np.arange(100, dtype=np.int64)})
    R = pd.DataFrame(
        {"k": np.arange(0, 100, 2, dtype=np.int64),
         "rv": np.arange(50, dtype=np.int64)}
    )
    out = repartition_join(
        rd.from_pandas(L).repartition(4), rd.from_pandas(R).repartition(2),
        on="k", how="left_outer", num_partitions=6,
    )
    sch = out.schema().base_schema  # block-level Arrow schema, pre-pandas
    assert pa.types.is_integer(sch.field("rv").type), sch
    pdf = out.to_pandas()
    assert int(pdf["rv"].isna().sum()) == 50


def test_grouped_reduce_join_matches_two_step(ray_session):
    from rp_extract_ray.stages.groupops import grouped_reduce_join

    rng = np.random.default_rng(9)
    data = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 2000),
            "v": rng.normal(size=2000).round(3),
        }
    )
    side = pd.DataFrame(
        {
            "sk": np.arange(0, 70, dtype=np.int64),  # side orphans beyond k range
            "attr": [f"a{i}" for i in range(70)],
        }
    )
    exp_inner = (
        data.groupby("k")
        .agg(total=("v", "sum"), n=("v", "count"))
        .reset_index()
        .merge(side.rename(columns={"sk": "k"}), on="k", how="inner")
        .sort_values("k", ignore_index=True)
    )
    got = (
        grouped_reduce_join(
            rd.from_pandas(data).repartition(6),
            "k",
            {"total": ("v", "sum"), "n": ("v", "count")},
            side=rd.from_pandas(side).repartition(3),
            side_on="sk",
            side_cols=["attr"],
            num_partitions=8,
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)[exp_inner.columns.tolist()]
    )
    got["n"] = got["n"].astype(exp_inner["n"].dtype)
    pd.testing.assert_frame_equal(got, exp_inner, atol=1e-9)

    # left join keeps reduced groups with no side row
    side2 = side[side["sk"] < 25]
    exp_left = (
        data.groupby("k")
        .agg(total=("v", "sum"))
        .reset_index()
        .merge(side2.rename(columns={"sk": "k"}), on="k", how="left")
        .sort_values("k", ignore_index=True)
    )
    got2 = (
        grouped_reduce_join(
            rd.from_pandas(data).repartition(6),
            "k",
            {"total": ("v", "sum")},
            side=rd.from_pandas(side2).repartition(2),
            side_on="sk",
            side_cols=["attr"],
            join="left",
            num_partitions=8,
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)[exp_left.columns.tolist()]
    )
    pd.testing.assert_frame_equal(got2, exp_left, atol=1e-9)


# ---------------------------------------------------------------- pca


def test_pca_fit_project_properties(ray_session):
    from rp_extract_ray.stages.pca import covariance_moments, pca_fit, pca_project

    rng = np.random.default_rng(4)
    d, n, k = 12, 400, 4
    # anisotropic data: a well-separated spectrum so components are stable
    scales = np.array([8, 6, 4, 3, 1, 1, 1, 1, 1, 1, 1, 1], dtype=np.float64)
    X = rng.normal(size=(n, d)) * scales
    pdf = pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X.astype(np.float32))}
    )
    ds = rd.from_pandas(pdf).repartition(5)

    nn, mean, cov = covariance_moments(ds)
    Xf = X.astype(np.float32).astype(np.float64)
    exp_cov = np.cov(Xf.T, bias=True)
    assert nn == n
    np.testing.assert_allclose(cov, exp_cov, atol=1e-9)

    comps, w, mu = pca_fit(ds, k)
    # orthonormal rows
    np.testing.assert_allclose(comps @ comps.T, np.eye(k), atol=1e-9)
    # eigenvalues descending and matching numpy
    exp_w = np.sort(np.linalg.eigvalsh(exp_cov))[::-1][:k]
    np.testing.assert_allclose(w, exp_w, atol=1e-9)
    # projection equals single-process PCA up to per-component sign
    Z = (
        pca_project(ds, comps, mu)
        .to_pandas()
        .sort_values("vec_id")["pca"]
        .pipe(lambda s: np.stack(s.to_numpy()))
    )
    Vref = np.linalg.eigh(exp_cov)[1][:, ::-1][:, :k]
    Zref = (Xf - Xf.mean(0)) @ Vref
    for c in range(k):
        same = np.allclose(Z[:, c], Zref[:, c], atol=1e-6)
        flip = np.allclose(Z[:, c], -Zref[:, c], atol=1e-6)
        assert same or flip
    # variance along component c equals eigenvalue c
    np.testing.assert_allclose(Z.var(axis=0), w, rtol=1e-9)


# ---------------------------------------------------------------- lm score


def test_lm_trigram_score_matches_naive(ray_session):
    from collections import Counter

    from rp_extract_ray.stages.textstage import lm_trigram_score

    texts = [
        "the cat sat on the mat",
        "the dog sat on the log",
        "zz",                      # < 3 chars -> 0
        "",                        # empty -> 0
        "completely different words here",
        "caférépété unicode grams",  # multi-byte codepoints
    ]
    pdf = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts})
    # naive reference
    grams = [
        [t[i : i + 3] for i in range(len(t) - 2)] for t in texts
    ]
    cnt = Counter(g for gs in grams for g in gs)
    T, V = sum(cnt.values()), len(cnt)
    import math

    exp = [
        0.0 if not gs
        else round(-sum(math.log2((cnt[g] + 1) / (T + V)) for g in gs) / len(gs), 6)
        for gs in grams
    ]
    got = (
        lm_trigram_score(rd.from_pandas(pdf).repartition(3), num_partitions=4)
        .to_pandas()
        .sort_values("doc_id")["lm_score"]
        .to_numpy()
    )
    np.testing.assert_allclose(got, exp, atol=2e-6)


def test_lm_trigram_score_unseen_floor(ray_session):
    # score a corpus, then score different text against the SAME packing:
    # unseen grams must take the smoothed floor, not crash or zero
    from rp_extract_ray.stages.textstage import _pack_char_trigrams
    import pyarrow as pa

    d, k = _pack_char_trigrams(pa.chunked_array([pa.array(["abcd", "xy", None])]))
    # "abcd" -> 2 windows (abc, bcd); "xy" and None -> none
    assert list(d) == [0, 0]
    assert len(set(k)) == 2


def test_repartition_join_broadcast_collapse_same_truth(ray_session):
    from rp_extract_ray.stages.join import repartition_join

    rng = np.random.default_rng(13)
    L = pd.DataFrame({"k": rng.integers(0, 80, 500), "lv": np.arange(500, dtype=np.int64)})
    R = pd.DataFrame({"rk": rng.integers(40, 120, 200), "rv": np.arange(200, dtype=np.int64)})
    lds, rds = rd.from_pandas(L).repartition(4), rd.from_pandas(R).repartition(2)

    def run(how, **kw):
        return (
            repartition_join(lds, rds, on="k", right_on="rk", how=how,
                             num_partitions=5, **kw)
            .to_pandas()
            .sort_values(["k", "lv"], ignore_index=True)
            .reset_index(drop=True)
        )

    for how in ["semi", "anti", "inner", "left_outer"]:
        dist = run(how)
        bcast = run(how, size_hint=len(R), broadcast_limit=1000)
        a = dist[sorted(dist.columns)].astype("float64").fillna(-9e9)
        b = bcast[sorted(bcast.columns)].astype("float64").fillna(-9e9)
        a = a.sort_values(list(a.columns), ignore_index=True)
        b = b.sort_values(list(b.columns), ignore_index=True)
        np.testing.assert_allclose(a.to_numpy(), b.to_numpy(), atol=0, err_msg=how)
    # over-limit hint must NOT collapse (stays on the exchange, same truth)
    over = run("semi", size_hint=len(R), broadcast_limit=10)
    np.testing.assert_allclose(
        over[sorted(over.columns)].astype("float64").to_numpy(),
        run("semi")[sorted(over.columns)].astype("float64").to_numpy(),
    )


def test_grouped_reduce_join_right_keeps_spine(ray_session):
    from rp_extract_ray.stages.groupops import grouped_reduce_join

    data = pd.DataFrame({"k": [1, 1, 2, 5], "v": [1.0, 2.0, 3.0, 4.0]})
    spine = pd.DataFrame({"sk": np.arange(4, dtype=np.int64)})  # 0..3: 0,3 have no data; 5 not in spine
    got = (
        grouped_reduce_join(
            rd.from_pandas(data).repartition(2),
            "k", {"total": ("v", "sum")},
            side=rd.from_pandas(spine).repartition(2),
            side_on="sk", side_cols=[], join="right",
            num_partitions=4,
        )
        .to_pandas()
        .sort_values("k", ignore_index=True)
    )
    assert got["k"].tolist() == [0, 1, 2, 3]          # spine kept, group 5 dropped
    t = got["total"].tolist()
    assert t[1] == 3.0 and t[2] == 3.0
    assert pd.isna(t[0]) and pd.isna(t[3])            # zero-data spine rows -> null


# ---------------------------------------------------------------- lsh ann


def test_lsh_partial_probe_recall_on_clustered_data(ray_session):
    from rp_extract_ray.stages.simsearch import knn_cosine, lsh_index, lsh_search

    rng = np.random.default_rng(21)
    d, n_clusters, per = 16, 8, 40
    centers = rng.normal(size=(n_clusters, d)) * 4.0
    X = np.concatenate([c + rng.normal(size=(per, d)) * 0.2 for c in centers])
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(len(X), dtype=np.int64),
            "embedding": list(X.astype(np.float32)),
        }
    )
    ds = rd.from_pandas(pdf).repartition(4)
    assigned, planes = lsh_index(ds, n_planes=8)
    q = X[3][None, :]
    exact = knn_cosine(ds, q, k=10)["vec_id"].tolist()
    # full probe == exact (the oracle-gate property)
    full = lsh_search(assigned, planes, q, k=10, max_hamming=8)["vec_id"].tolist()
    assert full == exact
    # partial probe: clustered neighbors share buckets; recall@10 stays high
    part = lsh_search(assigned, planes, q, k=10, max_hamming=1)["vec_id"].tolist()
    recall = len(set(part) & set(exact)) / 10
    assert recall >= 0.7, recall
    # bucket column is deterministic across repartitionings
    b1 = assigned.to_pandas().sort_values("vec_id")["bucket"].to_numpy()
    assigned2, _ = lsh_index(ds.repartition(9), n_planes=8)
    b2 = assigned2.to_pandas().sort_values("vec_id")["bucket"].to_numpy()
    np.testing.assert_array_equal(b1, b2)


def test_repartition_join_null_keys_sql_semantics(ray_session):
    # SQL truth: null keys never match. Covers BOTH the dtype-stability fix
    # in stable_hash (a value in a null-bearing block must co-locate with
    # the same value in a clean block) and the null-match rules.
    from rp_extract_ray.stages.join import repartition_join

    L = pa.table(
        {"k": pa.array([1, 2, None, None], pa.int64()),
         "lv": pa.array([10, 20, 30, 40], pa.int64())}
    )
    R = pa.table(
        {"k": pa.array([2, None], pa.int64()),
         "rv": pa.array([200, 999], pa.int64())}
    )
    # repartition(2) puts L's null rows in a separate block from k=1,2 —
    # the exact layout that exposed the float64-bits routing bug
    lds = rd.from_arrow(L).repartition(2)
    rds = rd.from_arrow(R)

    def run(how, **kw):
        return (
            repartition_join(lds, rds, on="k", how=how, num_partitions=3, **kw)
            .to_pandas()
            .sort_values("lv", ignore_index=True)
        )

    for kw in [{}, {"size_hint": 2, "broadcast_limit": 10}]:
        inner = run("inner", **kw)
        assert inner["lv"].tolist() == [20] and inner["rv"].tolist() == [200], kw
        lo = run("left_outer", **kw)
        assert lo["lv"].tolist() == [10, 20, 30, 40]
        assert lo["rv"].fillna(-1).tolist() == [-1, 200, -1, -1]
        semi = run("semi", **kw)
        assert semi["lv"].tolist() == [20]
        anti = run("anti", **kw)
        assert anti["lv"].tolist() == [10, 30, 40]


def test_stable_hash_value_stable_across_null_blocks():
    from rp_extract_ray.stages.partition import stable_hash

    clean = pa.array([1, 2, 3], pa.int64()).to_numpy(zero_copy_only=False)
    dirty = pa.array([2, None], pa.int64()).to_numpy(zero_copy_only=False)
    assert clean.dtype.kind == "i" and dirty.dtype.kind == "f"
    assert stable_hash(clean)[1] == stable_hash(dirty)[0]  # k=2 both paths
    # NaN hashes to ONE constant -> null keys co-locate
    two_nans = pa.array([None, None], pa.int64()).to_numpy(zero_copy_only=False)
    h = stable_hash(two_nans)
    assert h[0] == h[1]


def test_repartition_join_full_outer_null_keys(ray_session):
    from rp_extract_ray.stages.join import repartition_join

    L = pa.table(
        {"k": pa.array([1, None], pa.int64()), "lv": pa.array([10, 30], pa.int64())}
    )
    R = pa.table(
        {"k": pa.array([1, None, 7], pa.int64()),
         "rv": pa.array([100, 999, 700], pa.int64())}
    )
    out = (
        repartition_join(
            rd.from_arrow(L).repartition(2), rd.from_arrow(R),
            on="k", how="full_outer", num_partitions=3,
        )
        .to_pandas()
        .sort_values(["lv", "rv"], ignore_index=True, na_position="last")
    )
    # SQL full outer: (1,10,100); left null-key orphan (null,30,null);
    # right orphans (7,null,700) and (null,null,999) — NaN never matches NaN
    assert len(out) == 4
    matched = out[(out["lv"] == 10)]
    assert matched["rv"].tolist() == [100]
    assert out["rv"].fillna(-1).tolist().count(999) == 1
    lv30 = out[out["lv"] == 30]
    assert len(lv30) == 1 and pd.isna(lv30["rv"].iloc[0])


def test_vector_kernels_survive_empty_blocks(ray_session):
    # a filter that empties SOME blocks must not crash the matrix kernels
    from rp_extract_ray.stages.dedup import _vec_matrix
    from rp_extract_ray.stages.simsearch import knn_cosine, lsh_index, lsh_search

    empty = pa.chunked_array([pa.array([], pa.list_(pa.float32()))])
    assert _vec_matrix(empty).shape == (0, 0)

    rng = np.random.default_rng(2)
    X = rng.normal(size=(60, 8))
    pdf = pd.DataFrame(
        {"vec_id": np.arange(60, dtype=np.int64), "embedding": list(X.astype(np.float32))}
    )
    ds = rd.from_pandas(pdf).repartition(6)
    # filter keeps only 3 ids -> most blocks empty downstream
    few = ds.map_batches(
        lambda b: b.filter(pa.compute.is_in(b.column("vec_id"),
                                            value_set=pa.array([5, 20, 40], pa.int64()))),
        batch_format="pyarrow",
    )
    out = knn_cosine(few, X[5][None, :], k=3)
    assert out["vec_id"].iloc[0] == 5
    assigned, planes = lsh_index(ds, n_planes=6)
    res = lsh_search(assigned, planes, X[20][None, :], k=3, max_hamming=0)
    assert 20 in res["vec_id"].tolist()
