"""Feature-table IO, invariants, and the train/score seam."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rp_extract_ray.classify import (
    FeatureClassifier,
    cross_validate,
    score_dataset,
    train_on_dataset,
)
from rp_extract_ray.sources.csvio import (
    check_duplicates,
    check_id_consistency,
    concat_feature_tables,
    concatenate_feature_columns,
    read_class_file,
    read_feature_csv,
    read_manifest,
    read_multi_class_file,
    write_feature_csv,
    write_manifest,
)


def _make_features(n=120, d=6, seed=4):
    rng = np.random.default_rng(seed)
    centers = rng.normal(scale=4.0, size=(3, d))
    y = rng.integers(0, 3, size=n)
    X = centers[y] + rng.normal(size=(n, d))
    labels = np.array(["rock", "jazz", "pop"])[y]
    return X, labels


def test_feature_csv_roundtrip(tmp_path):
    X, labels = _make_features()
    ids = [f"song_{i:03d}.mp3" for i in range(len(X))]
    import pyarrow as pa

    t = pa.table(
        {"id": pa.array(ids),
         "vec": pa.FixedSizeListArray.from_arrays(pa.array(X.reshape(-1)), X.shape[1])}
    )
    p = str(tmp_path / "feat.csv")
    write_feature_csv(rd.from_arrow(t), p)
    back = read_feature_csv(p).to_pandas()
    assert list(back["id"]) == ids
    assert np.allclose(np.stack(back["vec"].to_numpy()), X)


def test_invariants(tmp_path):
    with pytest.raises(ValueError, match="duplicate"):
        check_duplicates(np.array(["a", "b", "a"]))
    with pytest.raises(ValueError, match="disagree"):
        check_id_consistency(np.array(["a", "b"]), np.array(["a", "c"]))
    check_id_consistency(np.array(["b", "a"]), np.array(["a", "b"]))


def test_class_files(tmp_path):
    p = str(tmp_path / "labels.tsv")
    with open(p, "w") as f:
        f.write("a.mp3\trock\nb.mp3\tjazz\n")
    pdf = read_class_file(p)
    assert pdf.set_index("id")["label"]["a.mp3"] == "rock"

    m = str(tmp_path / "multi.tsv")
    with open(m, "w") as f:
        f.write("id\trock\tjazz\na.mp3\tx\t\nb.mp3\t\tx\n")
    wide = read_multi_class_file(m)
    assert wide["rock"].tolist() == [1, 0]
    bad = str(tmp_path / "bad.tsv")
    with open(bad, "w") as f:
        f.write("id\trock\na.mp3\tq\n")
    with pytest.raises(ValueError, match="invalid cell"):
        read_multi_class_file(bad)


def test_manifest(tmp_path):
    p = str(tmp_path / "list.txt")
    write_manifest(["x.parquet", "y.parquet"], p)
    assert read_manifest(p) == ["x.parquet", "y.parquet"]


def test_concat_columns_and_tables():
    import pyarrow as pa

    def tab(offset):
        m1 = np.arange(8, dtype=np.float64).reshape(4, 2) + offset
        m2 = np.arange(12, dtype=np.float64).reshape(4, 3) + offset
        return pa.table(
            {"id": pa.array([f"d{offset}_{i}" for i in range(4)]),
             "rp": pa.FixedSizeListArray.from_arrays(pa.array(m1.reshape(-1)), 2),
             "ssd": pa.FixedSizeListArray.from_arrays(pa.array(m2.reshape(-1)), 3)}
        )

    ds = concat_feature_tables([rd.from_arrow(tab(0)), rd.from_arrow(tab(100))])
    assert ds.count() == 8
    out = concatenate_feature_columns(ds, ["rp", "ssd"]).to_pandas()
    v = np.stack(out["vec"].to_numpy())
    assert v.shape == (8, 5)  # rp(2) + ssd(3), series order preserved
    row0 = out[out["id"] == "d0_0"].iloc[0]["vec"]
    assert list(row0[:2]) == [0.0, 1.0] and list(row0[2:]) == [0.0, 1.0, 2.0]


def test_train_score_seam():
    X, labels = _make_features()
    clf = FeatureClassifier().fit(X, labels)
    assert clf.accuracy(X, labels) > 0.9
    mean_acc, std_acc = cross_validate(FeatureClassifier, X, labels, folds=5)
    assert mean_acc > 0.85

    # dimension check at predict time (reference rp_classify.py:313-315)
    with pytest.raises(ValueError, match="dim"):
        clf.predict(X[:, :3])


def test_persistence_and_distributed_scoring(tmp_path):
    import pyarrow as pa

    X, labels = _make_features()
    ids = np.arange(len(X))
    t = pa.table(
        {"id": pa.array(ids),
         "vec": pa.FixedSizeListArray.from_arrays(pa.array(X.reshape(-1)), X.shape[1]),
         "label": pa.array(labels)}
    )
    ds = rd.from_arrow(t)
    clf = train_on_dataset(ds, "vec", "label")
    p = str(tmp_path / "model.pkl")
    clf.save(p)
    loaded = FeatureClassifier.load(p)
    scored = score_dataset(ds, loaded, "vec").to_pandas()
    acc = (scored["pred"] == scored["label"]).mean()
    assert acc > 0.9


def test_strip_ids_and_classes_from_ids():
    from rp_extract_ray.functions.ids import classes_from_ids, strip_ids

    ids = ["pop/track01.wav", "rock/sub/track02.MP3", "Jazz\\track03.wav", "plain"]
    stripped = strip_ids(ids).to_pylist()
    assert stripped == ["track01", "track02", "track03", "plain"]
    assert strip_ids(ids, cut_ext=False).to_pylist()[0] == "track01.wav"
    assert strip_ids(["A/B.WAV"], lower=True).to_pylist() == ["b"]
    labels = classes_from_ids(["pop/a.wav", "pop/b.wav", "rock/c.wav"])
    assert list(labels) == ["pop", "pop", "rock"]
    # GTZAN-style split on '.'
    labels = classes_from_ids(["pop.0001.wav", "pop.0002.wav", "rock.0001.wav"], ".")
    assert list(labels) == ["pop", "pop", "rock"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="label file"):
        classes_from_ids(["a/x.wav", "b/y.wav", "c/z.wav"])


def test_normalized_join_helpers():
    import pandas as pd
    import ray.data as rd

    from rp_extract_ray.stages.join import broadcast_join, semi_anti_join

    big = rd.from_pandas(
        pd.DataFrame({"fid": ["dir/a.wav", "dir/b.wav", "x/c.wav"], "v": [1, 2, 3]})
    )
    labels = pd.DataFrame({"fid": ["a", "b"], "label": ["pop", "rock"]})
    joined = broadcast_join(
        big, labels, on="fid", normalize_ids={"cut_path": True, "cut_ext": True}
    ).to_pandas().sort_values("v", ignore_index=True)
    assert list(joined["label"]) == ["pop", "rock"]
    assert joined["fid"].iloc[0] == "dir/a.wav"  # original ids untouched

    kept = semi_anti_join(
        big, {"A"}, on="fid",
        normalize_ids={"cut_path": True, "cut_ext": True, "lower": True},
    ).to_pandas()
    assert list(kept["fid"]) == ["dir/a.wav"]
    # Dataset key side through the distributed path
    keys = rd.from_pandas(pd.DataFrame({"k": ["b.flac"]}))
    kept2 = semi_anti_join(
        big, keys, on="fid", keys_on="k",
        normalize_ids={"cut_path": True, "cut_ext": True},
    ).to_pandas()
    assert list(kept2["fid"]) == ["dir/b.wav"]


def test_align_predictions():
    import pandas as pd
    import pytest as _pytest
    import ray.data as rd

    from rp_extract_ray.classify import align_predictions

    pred = rd.from_pandas(
        pd.DataFrame({"id": ["p/a.wav", "p/b.wav", "p/zz.wav"], "label": ["x", "y", "q"]})
    )
    truth = rd.from_pandas(
        pd.DataFrame({"id": ["a", "b", "c"], "label": ["x", "z", "w"]})
    )
    out = (
        align_predictions(pred, truth, on="id")
        .to_pandas()
        .sort_values("id", ignore_index=True)
    )
    assert list(out["id"]) == ["a", "b"]       # only matched ids survive
    assert list(out["label"]) == ["x", "y"]
    assert list(out["label_truth"]) == ["x", "z"]
    bad = rd.from_pandas(pd.DataFrame({"id": ["a"], "other": ["x"]}))
    with _pytest.raises(ValueError, match="do not match"):
        align_predictions(pred, bad)


def test_feature_csv_id2_and_multitype(tmp_path):
    import pandas as pd

    from rp_extract_ray.sources.csvio import read_feature_csv, read_feature_csvs

    stub = str(tmp_path / "feat")
    for ext, d in (("rh", 3), ("ssd", 2)):
        rows = [[f"f{i}", str(100 + i)] + [float(i * 10 + j) for j in range(d)] for i in range(4)]
        pd.DataFrame(rows).to_csv(f"{stub}.{ext}", header=False, index=False)
    ds = read_feature_csv(f"{stub}.rh", id2=True)
    pdf = ds.to_pandas()
    assert list(pdf.columns) == ["id", "id2", "vec"]
    assert pdf["id2"].iloc[0] == "100"
    assert len(pdf["vec"].iloc[0]) == 3
    tables = read_feature_csvs(stub, exts=("rh", "ssd"), id2=True)
    assert set(tables) == {"rh", "ssd"}
    # mismatched ids raise
    rows = [["OTHER", "1", 0.0, 1.0]]
    pd.DataFrame(rows).to_csv(f"{stub}.bad", header=False, index=False)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="IDs not matching"):
        read_feature_csvs(stub, exts=("rh", "bad"), id2=True)


def test_deterministic_sample_reproducible():
    import pandas as pd
    import ray.data as rd

    from rp_extract_ray.pipelines.relational import deterministic_sample

    ds = rd.from_pandas(pd.DataFrame({"k": list(range(10_000))}))
    a = deterministic_sample(ds, "k", 0.1, seed=1).to_pandas()
    b = deterministic_sample(ds, "k", 0.1, seed=1).to_pandas()
    c = deterministic_sample(ds, "k", 0.1, seed=2).to_pandas()
    assert (a["k"].to_numpy() == b["k"].to_numpy()).all()  # reproducible
    assert abs(len(a) / 10_000 - 0.1) < 0.02               # ~rate
    assert set(a["k"]) != set(c["k"])                      # seed-sensitive
    # nested property: a 5% sample with the same seed is a subset of 10%
    d = deterministic_sample(ds, "k", 0.05, seed=1).to_pandas()
    assert set(d["k"]) <= set(a["k"])


def test_hash_join_big_big():
    import pandas as pd
    import ray.data as rd

    from rp_extract_ray.stages.join import hash_join

    left = pd.DataFrame({"k": [1, 2, 3, 4], "x": [10.0, 20.0, 30.0, 40.0]})
    right = pd.DataFrame({"kk": [2, 3, 5], "y": ["b", "c", "e"]})
    inner = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k", right_on="kk")
        .to_pandas().sort_values("k", ignore_index=True)
    )
    assert list(inner["k"]) == [2, 3] and list(inner["y"]) == ["b", "c"]
    louter = (
        hash_join(rd.from_pandas(left), rd.from_pandas(right), on="k",
                  right_on="kk", how="left_outer")
        .to_pandas().sort_values("k", ignore_index=True)
    )
    assert len(louter) == 4 and louter["y"].isna().sum() == 2


def test_run_classify_cli_train_predict(tmp_path):
    """§3.2/§3.3 entry points in-process (Ray session shared with pytest)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys_path_added = "/root/repo/tools"
    import sys as _sys

    if sys_path_added not in _sys.path:
        _sys.path.insert(0, sys_path_added)
    import run_classify

    rng = np.random.default_rng(11)
    n, d = 240, 8
    y = rng.integers(0, 3, n)
    X = rng.normal(size=(n, d)) + y[:, None] * 3.0
    ids = [f"dir/f{i}.wav" for i in range(n)]
    t = pa.table(
        {
            "id": pa.array(ids),
            "vec": pa.FixedSizeListArray.from_arrays(pa.array(X.reshape(-1)), d),
        }
    )
    fpath = str(tmp_path / "feat.parquet")
    pq.write_table(t, fpath)
    labels = pd.DataFrame({"id": [f"f{i}" for i in range(n)],
                           "label": [f"c{v}" for v in y]})
    cls_path = str(tmp_path / "labels.tsv")
    labels.to_csv(cls_path, sep="\t", header=False, index=False)
    model = str(tmp_path / "m.pkl")
    rc = run_classify.main(
        ["train", "--features", fpath, "--classfile", cls_path,
         "--model", model, "--strip-ids", "--cv", "3"]
    )
    assert rc == 0
    out = str(tmp_path / "pred.tsv")
    rc = run_classify.main(
        ["predict", "--features", fpath, "--model", model, "--out", out]
    )
    assert rc == 0
    pred = pd.read_csv(out, sep="\t", header=None, names=["id", "label"])
    assert len(pred) == n
    truth = dict(zip(labels["id"], labels["label"]))
    from rp_extract_ray.functions.ids import strip_ids

    acc = np.mean(
        [truth[s] == l for s, l in zip(strip_ids(pred["id"]).to_pylist(), pred["label"])]
    )
    assert acc > 0.9  # well-separated clusters


def test_naive_bayes_learns_separable_vocab():
    """Two classes with disjoint indicative vocabularies: NB predicts the
    training labels perfectly and is partition-invariant."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from rp_extract_ray.classify import nb_predict, nb_train

    rng = np.random.default_rng(6)
    a_words = ["alpha", "beta", "gamma"]
    b_words = ["delta", "eps", "zeta"]
    rows = []
    for i in range(200):
        lab = "A" if i % 2 == 0 else "B"
        w = a_words if lab == "A" else b_words
        rows.append((i, lab, " ".join(rng.choice(w, 12)) + " common filler"))
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "text"])
    preds = []
    for parts in (1, 5):
        ds = rd.from_pandas(df).repartition(parts)
        model = nb_train(ds, text_col="text", label_col="lang")
        out = (
            nb_predict(ds, model, text_col="text", id_col="doc_id")
            .to_pandas()
            .sort_values("doc_id", ignore_index=True)
        )
        assert (out["pred"].to_numpy() == df["lang"].to_numpy()).all()
        preds.append(out["pred"].to_numpy())
    assert (preds[0] == preds[1]).all()


def test_npz_roundtrip_and_arff(tmp_path):
    """W6 NPZ bundle (/root/reference/rp_feature_io.py:790-812): Dataset ->
    NPZ -> Dataset round-trip preserves ids/labels/values, and the
    reference-parity npz2arff converter emits a re-parseable ARFF."""
    import pyarrow as pa

    from rp_extract_ray.sources.arff import read_arff
    from rp_extract_ray.sources.npzio import (
        npz_to_arff,
        npz_to_parquet,
        read_npz_features,
        write_npz_features,
    )

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(20, 4)).round(6)
    ids = np.array([f"doc{i:03d}.wav" for i in range(20)])
    labels = np.array(["rock" if i % 2 else "jazz" for i in range(20)])
    tbl = pa.table(
        {
            "id": pa.array(ids),
            "label": pa.array(labels),
            "vec": pa.FixedSizeListArray.from_arrays(
                pa.array(mat.reshape(-1)), 4
            ),
        }
    )
    npz_path = str(tmp_path / "feat.npz")
    n = write_npz_features(
        rd.from_arrow(tbl).repartition(3), npz_path, [f"a{i}" for i in range(4)]
    )
    assert n == 20

    ds, attrs = read_npz_features(npz_path)
    assert attrs == ["a0", "a1", "a2", "a3"]
    back = ds.to_pandas().sort_values("id", ignore_index=True)
    assert (back["id"].to_numpy() == ids).all()
    assert (back["label"].to_numpy() == labels).all()
    np.testing.assert_allclose(np.stack(back["vec"].to_numpy()), mat)

    arff_path = str(tmp_path / "feat.arff")
    npz_to_arff(npz_path, arff_path, "feat", include_filenames=True)
    adf = read_arff(arff_path).to_pandas().sort_values("ID", ignore_index=True)
    assert len(adf) == 20 and "class" in adf.columns
    np.testing.assert_allclose(
        adf[["a0", "a1", "a2", "a3"]].to_numpy(), mat, rtol=1e-6
    )

    pq_dir = str(tmp_path / "pq")
    assert npz_to_parquet(npz_path, pq_dir) == 20
    pq = rd.read_parquet(pq_dir).to_pandas().sort_values("id", ignore_index=True)
    np.testing.assert_allclose(np.stack(pq["vec"].to_numpy()), mat)


def test_npz_no_filenames(tmp_path):
    """include_filenames=False reference case: ids synthesize from row index;
    labels column optional."""
    from rp_extract_ray.sources.npzio import read_npz_features

    np.savez(
        str(tmp_path / "nf.npz"),
        data=np.arange(12, dtype=np.float64).reshape(6, 2),
        attribute_names=np.array(["x", "y"], dtype=object),
    )
    ds, attrs = read_npz_features(str(tmp_path / "nf.npz"))
    pdf = ds.to_pandas()
    assert attrs == ["x", "y"] and "label" not in pdf.columns
    assert sorted(pdf["id"]) == [str(i) for i in range(6)]
