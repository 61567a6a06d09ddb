import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rp_extract_ray.stages.validate import validate_transcripts


def _mk(rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    pdf["turn_idx"] = pdf["turn_idx"].astype(np.int32)
    return rd.from_pandas(pdf)


def test_clean_passes(corpus):
    t, _ = corpus
    out = validate_transcripts(rd.from_arrow(t), num_partitions=4)
    assert out.count() == t.num_rows


def test_duplicate_keys_rejected():
    ds = _mk([("a", 0, 10), ("a", 1, 20), ("a", 1, 30)])
    with pytest.raises(Exception, match="duplicate"):
        validate_transcripts(ds, num_partitions=2).count()


def test_duplicate_keys_dropped():
    ds = _mk([("a", 0, 10), ("a", 1, 20), ("a", 1, 30), ("b", 0, 5)])
    out = validate_transcripts(ds, errors="drop", num_partitions=2).to_pandas()
    assert len(out) == 3
    assert out[out.conv_id == "a"]["turn_idx"].tolist() == [0, 1]


def test_nonmonotone_ts_rejected():
    ds = _mk([("a", 0, 100), ("a", 1, 50)])
    with pytest.raises(Exception, match="decreases"):
        validate_transcripts(ds, num_partitions=2).count()


def test_require_dense_ordinal():
    """require_dense enforces the salted-chunker precondition: turn_idx is
    the dense 0-based per-conversation ordinal."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data as rd

    from rp_extract_ray.stages.validate import validate_transcripts

    ok = pd.DataFrame(
        {
            "conv_id": ["a"] * 3 + ["b"] * 2,
            "turn_idx": np.array([0, 1, 2, 0, 1], dtype=np.int32),
            "ts": pd.to_datetime(
                [1_700_000_000 + i for i in (0, 5, 9, 0, 3)], unit="s"
            ),
        }
    )
    out = validate_transcripts(
        rd.from_pandas(ok), num_partitions=2, require_dense=True
    ).to_pandas()
    assert len(out) == 5

    gappy = ok.copy()
    gappy.loc[2, "turn_idx"] = 7  # a filtered-row hole
    with pytest.raises(Exception, match="dense 0-based"):
        validate_transcripts(
            rd.from_pandas(gappy), num_partitions=2, require_dense=True
        ).to_pandas()


def test_read_parquet_clean_heterogeneous_shards(tmp_path):
    """Schema-evolution guard (ADVICE r4): when the first and last shard
    disagree, the explicit-schema fast path must fall back to the plain
    read so later shards' wider types/extra columns unify instead of being
    coerced to the first file's schema."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rp_extract_ray.sources.pqio import read_parquet_clean

    a = str(tmp_path / "a.parquet")
    b = str(tmp_path / "b.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1, 2], pa.int64()),
                  "v": pa.array([1.0, 2.0], pa.float64())}), a)
    pq.write_table(
        pa.table({"id": pa.array([3, 4], pa.int64()),
                  "v": pa.array([3.0, 4.0], pa.float64()),
                  "extra": pa.array(["x", "y"], pa.string())}), b)

    pdf = read_parquet_clean([a, b]).to_pandas().sort_values("id", ignore_index=True)
    assert len(pdf) == 4
    assert "extra" in pdf.columns          # unified, not dropped
    assert pdf["extra"].isna().sum() == 2  # nulls for the old shard

    # homogeneous shards still take the explicit-schema fast path
    pdf2 = read_parquet_clean([a, a], columns=["id"]).to_pandas()
    assert list(pdf2.columns) == ["id"] and len(pdf2) == 4


def test_read_parquet_clean_cross_directory_evolution(tmp_path):
    """The probe must reach the LAST path element's last file: with a list
    of shard paths where only the final one evolved, the guard still has to
    fall back (the old code probed first/last within the FIRST directory
    only, so cross-path evolution was silently coerced)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from rp_extract_ray.sources.pqio import read_parquet_clean

    old = tmp_path / "old"
    old.mkdir()
    p0, p1 = str(old / "p0.parquet"), str(old / "p1.parquet")
    p_new = str(tmp_path / "new.parquet")
    pq.write_table(pa.table({"id": pa.array([1, 2], pa.int64())}), p0)
    pq.write_table(pa.table({"id": pa.array([3, 4], pa.int64())}), p1)
    pq.write_table(
        pa.table({"id": pa.array([5], pa.int64()),
                  "extra": pa.array(["x"], pa.string())}), p_new)

    pdf = read_parquet_clean([p0, p1, p_new]).to_pandas()
    assert "extra" in pdf.columns and len(pdf) == 5
    assert pdf["extra"].notna().sum() == 1

    # a directory as a path element resolves to its files for the probe;
    # homogeneous dir keeps the fast path
    pdf2 = read_parquet_clean(str(old)).to_pandas()
    assert list(pdf2.columns) == ["id"] and len(pdf2) == 4
