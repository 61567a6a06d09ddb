"""Tests for stages/splits.py (hash split, weighted mix, histogram),
stages/setops.py (distinct INTERSECT/EXCEPT/UNION), and
groupops.grouped_string_agg — the round-5 session-3 additions."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from rp_extract_ray.stages.setops import distinct_set_op
from rp_extract_ray.stages.splits import hash_split, value_histogram, weighted_mix


def _ds(df: pd.DataFrame, blocks: int = 3):
    return rd.from_pandas(df).repartition(blocks)


FRACS = [("train", 0.8), ("val", 0.1), ("test", 0.1)]


class TestHashSplit:
    def test_fractions_cover_and_sizes(self):
        df = pd.DataFrame({"k": np.arange(10_000, dtype=np.int64)})
        out = hash_split(_ds(df), "k", FRACS).to_pandas()
        counts = out["split"].value_counts()
        assert set(counts.index) == {"train", "val", "test"}
        # Knuth hash is uniform: 80/10/10 within a loose tolerance
        assert abs(counts["train"] / 10_000 - 0.8) < 0.03
        assert abs(counts["val"] / 10_000 - 0.1) < 0.02

    def test_partitioning_invariance(self):
        df = pd.DataFrame({"k": np.arange(500, dtype=np.int64)})
        a = hash_split(_ds(df, 1), "k", FRACS).to_pandas().sort_values("k")
        b = hash_split(_ds(df, 7), "k", FRACS).to_pandas().sort_values("k")
        assert list(a["split"]) == list(b["split"])

    def test_same_key_same_split(self):
        df = pd.DataFrame({"k": np.array([7, 7, 7, 9, 9], dtype=np.int64)})
        out = hash_split(_ds(df), "k", FRACS).to_pandas()
        assert out.groupby("k")["split"].nunique().max() == 1

    def test_bad_fractions_raise(self):
        ds = _ds(pd.DataFrame({"k": [1]}))
        with pytest.raises(ValueError):
            hash_split(ds, "k", [("a", 0.5), ("b", 0.3)])


class TestWeightedMix:
    def test_weight_bounds(self):
        df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64), "g": "x"})
        ds = _ds(df)
        # weight 1 keeps everything, weight 0 drops everything
        assert weighted_mix(ds, "k", "g", {"x": 1.0}).count() == 1000
        assert weighted_mix(ds, "k", "g", {"x": 0.0}).count() == 0

    def test_default_rate_applies_to_unknown_groups(self):
        df = pd.DataFrame(
            {"k": np.arange(2000, dtype=np.int64), "g": ["a", "b"] * 1000}
        )
        out = weighted_mix(
            _ds(df), "k", "g", {"a": 1.0}, default_rate=0.0
        ).to_pandas()
        assert set(out["g"]) == {"a"} and len(out) == 1000

    def test_invalid_weight_raises(self):
        ds = _ds(pd.DataFrame({"k": [1], "g": ["a"]}))
        with pytest.raises(ValueError):
            weighted_mix(ds, "k", "g", {"a": 1.5})
        with pytest.raises(ValueError):
            weighted_mix(ds, "k", "g", {}, default_rate=-0.1)

    def test_deterministic_across_partitioning(self):
        df = pd.DataFrame(
            {"k": np.arange(1000, dtype=np.int64), "g": ["a", "b"] * 500}
        )
        w = {"a": 0.5, "b": 0.25}
        a = weighted_mix(_ds(df, 1), "k", "g", w).to_pandas()
        b = weighted_mix(_ds(df, 9), "k", "g", w).to_pandas()
        assert sorted(a["k"]) == sorted(b["k"])


class TestValueHistogram:
    def test_matches_pandas(self):
        rng = np.random.default_rng(3)
        v = rng.uniform(0, 100, size=5000)
        df = pd.DataFrame({"v": v})
        out = (
            value_histogram(_ds(df), "v", 10.0)
            .to_pandas()
            .sort_values("bin")
            .reset_index(drop=True)
        )
        exp = (
            df.assign(bin=np.floor(v / 10.0).astype(np.int64))
            .groupby("bin")
            .agg(n=("v", "size"), s=("v", "sum"))
            .reset_index()
        )
        assert list(out["bin"]) == list(exp["bin"])
        assert list(out["n"]) == list(exp["n"])
        np.testing.assert_allclose(out["s"], exp["s"], rtol=1e-12)

    def test_origin_and_no_sum(self):
        df = pd.DataFrame({"v": [0.0, 5.0, 10.0, 15.0]})
        out = (
            value_histogram(_ds(df, 1), "v", 10.0, origin=5.0, sum_col=None)
            .to_pandas()
            .sort_values("bin")
        )
        # bins: floor((v-5)/10) -> -1, 0, 0, 1
        assert list(out["bin"]) == [-1, 0, 1]
        assert list(out["n"]) == [1, 2, 1]
        assert "s" not in out.columns


class TestSetOps:
    def _sides(self):
        a = _ds(pd.DataFrame({"k": np.array([1, 2, 2, 3, 4], dtype=np.int64)}))
        b = _ds(
            pd.DataFrame({"j": np.array([3, 4, 4, 5], dtype=np.int64)}), 2
        )
        return a, b

    def test_intersect(self):
        a, b = self._sides()
        out = distinct_set_op(a, b, on="k", right_on="j", op="intersect")
        assert sorted(out.to_pandas()["k"]) == [3, 4]

    def test_except(self):
        a, b = self._sides()
        out = distinct_set_op(a, b, on="k", right_on="j", op="except")
        assert sorted(out.to_pandas()["k"]) == [1, 2]

    def test_union_distinct(self):
        a, b = self._sides()
        out = distinct_set_op(a, b, on="k", right_on="j", op="union")
        assert sorted(out.to_pandas()["k"]) == [1, 2, 3, 4, 5]

    def test_null_keys_compare_equal(self):
        # SQL INTERSECT: a null key on both sides survives as one row
        a = rd.from_arrow(pa.table({"k": pa.array([1, None], pa.int64())}))
        b = rd.from_arrow(pa.table({"k": pa.array([None, 2], pa.int64())}))
        out = distinct_set_op(a, b, on="k", op="intersect").to_pandas()
        assert len(out) == 1 and pd.isna(out["k"].iloc[0])

    def test_unknown_op_raises(self):
        a, b = self._sides()
        with pytest.raises(ValueError):
            distinct_set_op(a, b, on="k", right_on="j", op="minus")


class TestGroupedStringAgg:
    def test_ordered_paths(self):
        from rp_extract_ray.stages.groupops import grouped_string_agg

        df = pd.DataFrame(
            {
                "u": [1, 1, 1, 2, 2],
                "t": [3, 1, 2, 2, 1],
                "e": ["c", "a", "b", "y", "x"],
            }
        )
        out = (
            grouped_string_agg(
                _ds(df), "u", "e", order_cols=("t",), sep="|",
                out_name="path", num_partitions=4,
            )
            .to_pandas()
            .sort_values("u")
        )
        assert list(out["path"]) == ["a|b|c", "x|y"]

    def test_partitioning_invariance(self):
        from rp_extract_ray.stages.groupops import grouped_string_agg

        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "u": rng.integers(0, 20, 500),
                "t": np.arange(500),
                "e": rng.choice(list("abcd"), 500),
            }
        )
        outs = []
        for blocks in (1, 8):
            o = (
                grouped_string_agg(
                    _ds(df, blocks), "u", "e", order_cols=("t",),
                    out_name="p", num_partitions=6,
                )
                .to_pandas()
                .sort_values("u")
                .reset_index(drop=True)
            )
            outs.append(o)
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestReplicateWeighted:
    def test_integer_weights_exact(self):
        from rp_extract_ray.stages.splits import replicate_weighted

        df = pd.DataFrame(
            {"k": np.arange(100, dtype=np.int64), "g": ["a", "b"] * 50}
        )
        out = replicate_weighted(
            _ds(df), "k", "g", {"a": 3.0, "b": 1.0}
        ).to_pandas()
        counts = out.groupby("g")["k"].size()
        assert counts["a"] == 150 and counts["b"] == 50
        # every key of group a appears exactly 3 times
        assert out[out["g"] == "a"].groupby("k").size().eq(3).all()

    def test_fractional_expected_multiplicity(self):
        from rp_extract_ray.stages.splits import replicate_weighted

        df = pd.DataFrame({"k": np.arange(4000, dtype=np.int64), "g": "a"})
        out = replicate_weighted(_ds(df), "k", "g", {"a": 2.5}).to_pandas()
        per_key = out.groupby("k").size()
        assert set(per_key.unique()) == {2, 3}
        assert abs(len(out) / 4000 - 2.5) < 0.05

    def test_zero_weight_drops_and_partition_invariance(self):
        from rp_extract_ray.stages.splits import replicate_weighted

        df = pd.DataFrame(
            {"k": np.arange(500, dtype=np.int64), "g": ["a", "b"] * 250}
        )
        w = {"a": 0.0, "b": 1.5}
        a = replicate_weighted(_ds(df, 1), "k", "g", w).to_pandas()
        b = replicate_weighted(_ds(df, 9), "k", "g", w).to_pandas()
        assert (a["g"] == "b").all()
        assert sorted(a["k"]) == sorted(b["k"])

    def test_negative_weight_raises(self):
        from rp_extract_ray.stages.splits import replicate_weighted

        ds = _ds(pd.DataFrame({"k": [1], "g": ["a"]}))
        with pytest.raises(ValueError):
            replicate_weighted(ds, "k", "g", {"a": -1.0})


class TestProfileColumns:
    def test_counts_nulls_and_all_null_column(self):
        from rp_extract_ray.stages.profile import profile_columns

        df = pd.DataFrame(
            {
                "a": [1.0, None, 3.0, None],
                "b": [None, None, None, None],
                "c": [2, 4, 6, 8],
            }
        )
        out = profile_columns(_ds(df, 2), ["a", "b", "c"])
        assert list(out["column"]) == ["a", "b", "c"]
        assert list(out["n"]) == [4, 4, 4]
        assert list(out["nulls"]) == [2, 4, 0]
        row_a = out[out["column"] == "a"].iloc[0]
        assert row_a["vmin"] == 1.0 and row_a["vmax"] == 3.0 and row_a["vsum"] == 4.0
        row_b = out[out["column"] == "b"].iloc[0]
        assert pd.isna(row_b["vmin"]) and pd.isna(row_b["vsum"])
        row_c = out[out["column"] == "c"].iloc[0]
        assert row_c["vsum"] == 20.0


class TestSetOpsStringKeys:
    def test_intersect_except_on_strings(self):
        a = _ds(pd.DataFrame({"k": ["x", "y", "y", "z"]}))
        b = _ds(pd.DataFrame({"k": ["y", "w"]}), 2)
        inter = distinct_set_op(a, b, on="k", op="intersect").to_pandas()
        assert sorted(inter["k"]) == ["y"]
        exc = distinct_set_op(a, b, on="k", op="except").to_pandas()
        assert sorted(exc["k"]) == ["x", "z"]


from hypothesis import given, settings
from hypothesis import strategies as st


class TestSplitProperties:
    @settings(max_examples=20, deadline=None)
    @given(
        keys=st.lists(
            st.integers(min_value=0, max_value=2**40), min_size=1, max_size=200
        )
    )
    def test_split_is_total_and_deterministic(self, keys):
        """Every key gets exactly one split, and pure recompute agrees with
        the distributed assignment (the SQL-replicability contract)."""
        import numpy as np

        from rp_extract_ray.stages.splits import _hash32

        df = pd.DataFrame({"k": np.asarray(keys, dtype=np.int64)})
        out = hash_split(_ds(df, 2), "k", FRACS).to_pandas()
        assert len(out) == len(df)
        bucket = _hash32(out["k"].to_numpy(np.int64), 1) % np.uint64(10_000)
        exp = np.where(bucket < 8000, "train", np.where(bucket < 9000, "val", "test"))
        assert (out["split"].to_numpy() == exp).all()

    @settings(max_examples=15, deadline=None)
    @given(
        keys=st.lists(
            st.integers(min_value=0, max_value=2**40), min_size=1, max_size=100
        ),
        w=st.floats(min_value=0.0, max_value=4.0, allow_nan=False),
    )
    def test_replicate_multiplicity_matches_recompute(self, keys, w):
        import numpy as np

        from rp_extract_ray.stages.splits import _hash32, replicate_weighted

        df = pd.DataFrame(
            {"k": np.asarray(sorted(set(keys)), dtype=np.int64), "g": "a"}
        )
        out = replicate_weighted(_ds(df, 2), "k", "g", {"a": w}).to_pandas()
        h = _hash32(df["k"].to_numpy(np.int64), 1)
        exp = int(np.floor(w)) + (
            h < np.uint64(int((w - np.floor(w)) * 2**32))
        ).astype(np.int64)
        if len(out) == 0:
            # Ray to_pandas drops the schema when every output block is
            # empty (a from_pandas+repartition harness quirk) — assert the
            # recompute agrees that nothing should survive
            assert exp.sum() == 0
            return
        got = out.groupby("k").size().reindex(df["k"], fill_value=0).to_numpy()
        assert (got == exp).all()


class TestSetOpProperties:
    @settings(max_examples=20, deadline=None)
    @given(
        a=st.lists(st.integers(min_value=-50, max_value=50), max_size=80),
        b=st.lists(st.integers(min_value=-50, max_value=50), max_size=80),
    )
    def test_matches_python_sets(self, a, b):
        import numpy as np

        da = _ds(pd.DataFrame({"k": pd.array(a, dtype="int64")}), 2)
        db = _ds(pd.DataFrame({"k": pd.array(b, dtype="int64")}), 2)
        sa, sb = set(a), set(b)
        for op, exp in (
            ("intersect", sa & sb),
            ("except", sa - sb),
            ("union", sa | sb),
        ):
            pdf = distinct_set_op(da, db, on="k", op=op).to_pandas()
            # empty-result schema quirk: see TestSplitProperties note
            got = sorted(pdf["k"]) if len(pdf) else []
            assert got == sorted(exp), op


class TestCooccurrence:
    def test_matches_pandas_selfjoin(self):
        from rp_extract_ray.stages.groupops import cooccurrence_pairs

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "u": rng.integers(0, 40, 600),
                "it": rng.choice(list("abcde"), 600),
            }
        )
        got = (
            cooccurrence_pairs(_ds(df, 4), "u", "it", out_names=("e1", "e2"))
            .to_pandas()
            .sort_values(["e1", "e2"])
            .reset_index(drop=True)
        )
        d = df.drop_duplicates()
        m = d.merge(d, on="u")
        m = m[m["it_x"] < m["it_y"]]
        exp = (
            m.groupby(["it_x", "it_y"]).size().reset_index(name="n")
            .rename(columns={"it_x": "e1", "it_y": "e2"})
            .sort_values(["e1", "e2"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got.astype({"n": "int64"}), exp.astype({"n": "int64"}))

    def test_partition_invariance(self):
        from rp_extract_ray.stages.groupops import cooccurrence_pairs

        df = pd.DataFrame(
            {"u": [1, 1, 1, 2, 2, 3], "it": ["a", "b", "a", "b", "c", "a"]}
        )
        outs = []
        for blocks in (1, 6):
            o = (
                cooccurrence_pairs(
                    _ds(df, blocks), "u", "it", num_partitions=5
                )
                .to_pandas().sort_values(["item1", "item2"]).reset_index(drop=True)
            )
            outs.append(o)
        pd.testing.assert_frame_equal(outs[0], outs[1])
        # user 1 = {a,b}, user 2 = {b,c}, user 3 = {a}
        assert outs[0].set_index(["item1", "item2"])["n"].to_dict() == {
            ("a", "b"): 1, ("b", "c"): 1
        }


class TestHardening:
    def test_string_agg_skips_nulls_keeps_group(self):
        from rp_extract_ray.stages.groupops import grouped_string_agg

        df = pd.DataFrame(
            {
                "u": [1, 1, 1, 2, 2],
                "t": [1, 2, 3, 1, 2],
                "e": ["a", None, "c", None, None],
            }
        )
        out = (
            grouped_string_agg(
                _ds(df, 2), "u", "e", order_cols=("t",), out_name="p",
                num_partitions=3,
            )
            .to_pandas().sort_values("u").reset_index(drop=True)
        )
        assert out["p"].iloc[0] == "a|c"
        assert pd.isna(out["p"].iloc[1])  # all-null group -> NULL, row kept

    def test_setop_mixed_key_dtypes(self):
        a = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3], pa.int64())}))
        b = rd.from_arrow(pa.table({"k": pa.array([2, 4], pa.int32())}))
        out = distinct_set_op(a, b, on="k", op="intersect").to_pandas()
        assert sorted(out["k"]) == [2]

    def test_histogram_bad_width_raises(self):
        ds = _ds(pd.DataFrame({"v": [1.0]}))
        with pytest.raises(ValueError):
            value_histogram(ds, "v", 0.0)
        with pytest.raises(ValueError):
            value_histogram(ds, "v", -1.0)
