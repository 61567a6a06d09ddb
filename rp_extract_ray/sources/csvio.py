"""Feature-table CSV / label-table IO.

Re-expression of the reference's feature file formats (SURVEY.md §1.2/§2.1):

* feature CSV: rows ``[id, (id2,) f0..fD-1]``, no header
  (/root/reference/rp_feature_io.py:66-85, read back :302-356) — here read
  into a Dataset with an explicit schema (id + fixed-size vector column), and
  written from one. Parquet is the engine's native format; CSV exists for
  interchange with the reference's files.
* label table: TSV ``<id>\\t<label>`` (/root/reference/classes_io.py:22-49)
  and the wide multi-label table (``x``/empty -> 1/0,
  /root/reference/classes_io.py:60-110).
* manifest: one path per line (/root/reference/classes_io.py:523-535).

Invariants enforced at read (reference runtime invariants, SURVEY.md §5-3):
duplicate-id check (/root/reference/rp_feature_io.py:274-284) and cross-table
id consistency (:286-295).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset


def read_feature_csv(
    path: str,
    dim: int | None = None,
    id_col: str = "id",
    vec_col: str = "vec",
    id2: bool = False,
    id2_col: str = "id2",
) -> Dataset:
    """Read a reference-style headerless feature CSV -> Dataset(id[, id2],
    vec). ``id2=True`` reads a SECOND id column (the reference's optional
    numeric/index id, /root/reference/rp_feature_io.py:302-356 id_column
    list form) before the feature values."""
    pdf = pd.read_csv(path, header=None)
    ids = pdf.iloc[:, 0].astype(str)
    first_feat = 2 if id2 else 1
    mat = pdf.iloc[:, first_feat:].to_numpy(dtype=np.float64)
    if dim is not None and mat.shape[1] != dim:
        raise ValueError(f"expected dim {dim}, file has {mat.shape[1]}")
    check_duplicates(ids.to_numpy())
    cols = {id_col: pa.array(ids, pa.string())}
    if id2:
        cols[id2_col] = pa.array(pdf.iloc[:, 1].astype(str), pa.string())
    cols[vec_col] = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1)), mat.shape[1]
    )
    return rd.from_arrow(pa.table(cols))


def read_feature_csvs(
    stub: str,
    exts: tuple[str, ...] = ("rh", "ssd", "rp"),
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    id2: bool = False,
) -> dict[str, Dataset]:
    """Multi-feature-type dispatch (S17 tail): read ``<stub>.<ext>`` per
    feature type into {ext: Dataset(id, vec)} and enforce the reference's
    cross-type id-consistency invariant
    (/root/reference/rp_feature_io.py:286-295, 359-427): every type file
    must carry the SAME id set in the SAME order."""
    out: dict[str, Dataset] = {}
    ref_ids: np.ndarray | None = None
    for ext in exts:
        ds = read_feature_csv(f"{stub}.{ext}", id_col=id_col, vec_col=vec_col, id2=id2)
        ids = np.asarray(
            pd.read_csv(f"{stub}.{ext}", header=None, usecols=[0]).iloc[:, 0].astype(str)
        )
        if ref_ids is None:
            ref_ids = ids
        elif len(ids) != len(ref_ids) or (ids != ref_ids).any():
            raise ValueError(f"IDs not matching across feature files: .{ext}")
        out[ext] = ds
    return out


def write_feature_csv(ds: Dataset, path: str, id_col: str = "id", vec_col: str = "vec") -> int:
    """Write Dataset(id, vec) to a reference-style headerless CSV (driver
    collects — interchange only, not a scale path). Returns rows written."""
    pdf = ds.to_pandas()
    mat = np.stack(pdf[vec_col].to_numpy())
    out = pd.concat(
        [pdf[id_col].reset_index(drop=True), pd.DataFrame(mat)], axis=1
    )
    out.to_csv(path, header=False, index=False)
    return len(out)


def check_duplicates(ids: np.ndarray) -> None:
    """Duplicate-id invariant (/root/reference/rp_feature_io.py:274-284)."""
    uniq, counts = np.unique(ids, return_counts=True)
    dups = uniq[counts > 1]
    if len(dups):
        raise ValueError(f"duplicate ids in feature table: {dups[:10].tolist()}")


def check_id_consistency(ids_a: np.ndarray, ids_b: np.ndarray) -> None:
    """Cross-table id equality (/root/reference/rp_feature_io.py:286-295)."""
    if len(ids_a) != len(ids_b) or (np.sort(ids_a) != np.sort(ids_b)).any():
        raise ValueError("feature tables disagree on id sets")


def read_class_file(path: str, delimiter: str = "\t") -> pd.DataFrame:
    """TSV id -> label (/root/reference/classes_io.py:22-49). Small side
    table: returned as pandas for broadcasting."""
    return pd.read_csv(
        path, sep=delimiter, header=None, names=["id", "label"], dtype=str
    )


def write_class_file(pdf: pd.DataFrame, path: str, delimiter: str = "\t") -> None:
    pdf[["id", "label"]].to_csv(path, sep=delimiter, header=False, index=False)


def read_multi_class_file(path: str, delimiter: str = "\t") -> pd.DataFrame:
    """Wide multi-label table: header = categories, cells 'x'/'' -> 1/0 with
    validity check (/root/reference/classes_io.py:60-110)."""
    pdf = pd.read_csv(path, sep=delimiter, dtype=str).fillna("")
    id_col = pdf.columns[0]
    out = {id_col: pdf[id_col]}
    for c in pdf.columns[1:]:
        vals = pdf[c].str.strip().str.lower()
        bad = ~vals.isin(["", "x"])
        if bad.any():
            raise ValueError(f"invalid cell values in column {c}: {vals[bad].unique()[:5]}")
        out[c] = (vals == "x").astype(np.int8)
    return pd.DataFrame(out)


def read_manifest(path: str) -> list[str]:
    """One path per line (/root/reference/classes_io.py:523-535)."""
    with open(path) as f:
        return [ln.strip() for ln in f if ln.strip()]


def write_manifest(paths: list[str], path: str) -> None:
    with open(path, "w") as f:
        f.write("\n".join(paths) + "\n")


def concat_feature_tables(datasets: list[Dataset]) -> Dataset:
    """Union-all of feature shards — the reference's shard-merge tools
    (/root/reference/rp_feature_io.py:481-485, 647-665) collapse to
    ``Dataset.union`` (a multi-file Parquet read needs not even that)."""
    out = datasets[0]
    for d in datasets[1:]:
        out = out.union(d)
    return out


def concatenate_feature_columns(
    ds: Dataset, vec_cols: list[str], out_col: str = "vec"
) -> Dataset:
    """hstack aligned feature types — 'rp+ssd' syntax
    (/root/reference/rp_feature_io.py:872-896, M22). Schema-level zip: no
    shuffle, vectorized per batch."""

    def f(b: pa.Table) -> pa.Table:
        mats = []
        for c in vec_cols:
            col = b.column(c)
            width = col.type.list_size
            mats.append(
                np.asarray(col.combine_chunks().flatten()).reshape(len(b), width)
            )
        cat = np.hstack(mats)
        out = b.drop_columns(vec_cols)
        return out.append_column(
            out_col,
            pa.FixedSizeListArray.from_arrays(pa.array(cat.reshape(-1)), cat.shape[1]),
        )

    return ds.map_batches(f, batch_format="pyarrow")
