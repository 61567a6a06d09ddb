"""ARFF source/sink: round-trip, reference header layout, sharded sink."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from rp_extract_ray.sources.arff import (
    merge_arff_shards,
    parse_arff_header,
    read_arff,
    read_arff_features,
    save_arff,
    write_arff_shards,
)


def _df(n=30, seed=4):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "ID": [f"doc{i:03d}.wav" for i in range(n)],
            "f0": rng.normal(size=n).round(6),
            "f1": rng.normal(size=n).round(6),
            "f2": rng.normal(size=n).round(6),
            "class": rng.choice(["rock", "jazz", "pop"], n),
        }
    )


def test_save_load_roundtrip(tmp_path):
    df = _df()
    path = str(tmp_path / "t.arff")
    n = save_arff(df, path, relation_name="rp_test")
    assert n == len(df)
    got = read_arff(path).to_pandas()
    assert list(got.columns) == list(df.columns)
    np.testing.assert_allclose(got[["f0", "f1", "f2"]], df[["f0", "f1", "f2"]])
    assert (got["ID"] == df["ID"]).all()
    assert (got["class"] == df["class"]).all()


def test_header_layout_matches_reference(tmp_path):
    """ID -> string, class -> nominal {observed}, rest numeric
    (/root/reference/rp_feature_io.py:524-537)."""
    df = _df(n=6)
    path = str(tmp_path / "h.arff")
    save_arff(df, path, relation_name="rel")
    lines = open(path).read().splitlines()
    assert lines[0] == "@Relation rel"
    assert lines[1] == "@Attribute ID string"
    assert lines[2] == "@Attribute f0 numeric"
    assert lines[4] == "@Attribute f2 numeric"
    assert lines[5].startswith("@Attribute class {")
    assert set(lines[5].split("{")[1].rstrip("}").split(",")) == set(df["class"])
    assert "@Data" in lines


def test_features_shape(tmp_path):
    """read_arff_features == the reference load_arff (features, classes)."""
    df = _df()
    path = str(tmp_path / "f.arff")
    save_arff(df, path)
    ds = read_arff_features(path)
    got = ds.to_pandas()
    mat = np.stack(got["vec"].to_numpy())
    np.testing.assert_allclose(mat, df[["f0", "f1", "f2"]].to_numpy())
    assert (got["class"] == df["class"]).all()


def test_missing_and_comments(tmp_path):
    text = (
        "% comment\n@relation r\n"
        "@attribute a numeric\n@attribute b string\n@attribute c {x,y}\n"
        "@data\n% another\n1.5,hello,x\n?,?,?\n2.5,world,y\n"
    )
    path = tmp_path / "m.arff"
    path.write_text(text)
    got = read_arff(str(path)).to_pandas()
    assert np.isnan(got["a"][1]) and got["b"][1] is None
    assert got["a"].tolist()[::2] == [1.5, 2.5]
    assert got["c"].tolist() == ["x", None, "y"]


def test_undeclared_nominal_rejected(tmp_path):
    path = tmp_path / "bad.arff"
    path.write_text("@relation r\n@attribute c {x,y}\n@data\nz\n")
    with pytest.raises(ValueError, match="not declared"):
        read_arff(str(path))


def test_sharded_sink_and_merge(tmp_path):
    df = _df(n=200, seed=9)
    ds = rd.from_pandas(df).repartition(7)
    shard_dir = str(tmp_path / "shards")
    n = write_arff_shards(
        ds, shard_dir, "rel",
        columns=list(df.columns), class_values=["rock", "jazz", "pop"],
    )
    assert n == len(df)
    merged = str(tmp_path / "merged.arff")
    assert merge_arff_shards(shard_dir, merged) == len(df)
    got = read_arff(merged).to_pandas().sort_values("ID").reset_index(drop=True)
    want = df.sort_values("ID").reset_index(drop=True)
    np.testing.assert_allclose(got[["f0", "f1", "f2"]], want[["f0", "f1", "f2"]])
    assert (got["class"] == want["class"]).all()
    # every shard independently loadable with the same header
    import os
    shards = [f for f in os.listdir(shard_dir) if f.endswith(".arff")]
    assert len(shards) >= 2
    heads = set()
    for s in shards:
        lines = open(os.path.join(shard_dir, s)).read().splitlines()
        _, attrs, start = parse_arff_header(lines)
        heads.add("\n".join(lines[:start]))
        assert [a[0] for a in attrs] == list(df.columns)
    assert len(heads) == 1
