"""NPZ feature-bundle IO (W6 — /root/reference/rp_feature_io.py:790-812).

The reference's NPZ interchange layout (Schindler's ``npz2arff`` bundle) is a
single ``.npz`` with keys:

* ``data``            — (n, d) float feature matrix
* ``attribute_names`` — (d,) feature column names
* ``labels``          — (n,) class labels
* ``filenames``       — (n,) document ids (optional in the reference reader,
  gated by ``include_filenames``)

Here it round-trips with the engine's native Dataset(id, vec[, label]) shape
(same column conventions as ``sources/csvio.read_feature_csv``) plus the
reference-parity wide-frame converter to ARFF. NPZ is a single-node
interchange format — readers/writers collect on the driver by design, like
the CSV/ARFF single-file paths; parquet remains the scale format (use
``npz_to_parquet`` once, then the normal pruned parquet read).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset


def read_npz_features(
    path: str,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    label_col: str = "label",
) -> tuple[Dataset, list[str]]:
    """Load a reference-style NPZ bundle -> (Dataset(id[, label], vec),
    attribute names). Ids come from ``filenames`` when present, else the row
    index as a string (the reference's ``include_filenames=False`` case).
    Duplicate-id invariant enforced as for the CSV readers."""
    from rp_extract_ray.sources.csvio import check_duplicates

    with np.load(path, allow_pickle=True) as npz:
        mat = np.asarray(npz["data"], dtype=np.float64)
        attrs = [str(a) for a in npz["attribute_names"]]
        ids = (
            np.asarray(npz["filenames"]).astype(str)
            if "filenames" in npz.files
            else np.arange(len(mat)).astype(str)
        )
        labels = (
            np.asarray(npz["labels"]).astype(str) if "labels" in npz.files else None
        )
    if mat.ndim != 2 or mat.shape[1] != len(attrs):
        raise ValueError(
            f"npz data shape {mat.shape} inconsistent with "
            f"{len(attrs)} attribute names"
        )
    check_duplicates(ids)
    cols: dict[str, pa.Array] = {id_col: pa.array(ids, pa.string())}
    if labels is not None:
        cols[label_col] = pa.array(labels, pa.string())
    cols[vec_col] = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1)), mat.shape[1]
    )
    return rd.from_arrow(pa.table(cols)), attrs


def write_npz_features(
    ds: Dataset,
    path: str,
    attribute_names: list[str] | None = None,
    *,
    id_col: str = "id",
    vec_col: str = "vec",
    label_col: str = "label",
) -> int:
    """Write Dataset(id[, label], vec) as a reference-style NPZ bundle.
    Driver collects — interchange only, not a scale path. Returns rows."""
    pdf = ds.to_pandas().sort_values(id_col, ignore_index=True)
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    if attribute_names is None:
        attribute_names = [f"f{i}" for i in range(mat.shape[1])]
    if len(attribute_names) != mat.shape[1]:
        raise ValueError("attribute_names length != feature dim")
    arrays = {
        "data": mat,
        "attribute_names": np.array(attribute_names, dtype=object),
        "filenames": pdf[id_col].to_numpy().astype(str),
    }
    if label_col in pdf.columns:
        arrays["labels"] = pdf[label_col].to_numpy().astype(str)
    np.savez(path, **arrays)
    return len(pdf)


def npz_to_arff(
    in_file: str,
    out_file: str,
    relation_name: str | None = None,
    include_filenames: bool = False,
) -> int:
    """Reference-parity converter (/root/reference/rp_feature_io.py:790-812):
    NPZ bundle -> single Weka ARFF with one column per attribute name plus
    ``class`` (and ``ID`` when ``include_filenames``). Returns rows."""
    from rp_extract_ray.sources.arff import save_arff

    with np.load(in_file, allow_pickle=True) as npz:
        df = pd.DataFrame(
            np.asarray(npz["data"], dtype=np.float64),
            columns=[str(a) for a in npz["attribute_names"]],
        )
        if include_filenames:
            df["ID"] = np.asarray(npz["filenames"]).astype(str)
        if "labels" in npz.files:
            df["class"] = np.asarray(npz["labels"]).astype(str)
    return save_arff(df, out_file, relation_name)


def npz_to_parquet(in_file: str, out_dir: str, **kw) -> int:
    """One-time promotion of an NPZ bundle into the engine's scale format:
    partitioned parquet written by Ray (vec stays a fixed-size list column).
    Returns rows written."""
    ds, _attrs = read_npz_features(in_file, **kw)
    ds.write_parquet(out_dir)
    return ds.count()
