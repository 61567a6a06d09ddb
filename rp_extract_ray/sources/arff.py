"""Weka ARFF source + sink, from scratch (no scipy/liac dependency).

Reference semantics (/root/reference/rp_feature_io.py:488-543): ``load_arff``
returns ``(features, classes)`` where features are every numeric attribute and
classes the nominal ``class`` attribute; ``save_arff`` writes ``@Relation``,
one ``@Attribute`` per column (``ID`` -> string, ``class`` -> nominal with the
observed value set, everything else numeric) and the rows as CSV under
``@Data``. This module re-expresses both over Arrow:

* :func:`read_arff` — generic columnar parse: one Dataset column per
  attribute (numeric -> float64, nominal/string -> string), ``?`` -> null,
  ``%`` comments and blank lines skipped, case-insensitive keywords.
* :func:`read_arff_features` — the reference's ``(features, classes)`` shape
  as a Dataset ``(id?, vec, class?)`` with the numeric attributes packed into
  one FixedSizeList vector column (interchange with the feature-CSV tables,
  sources/csvio.py).
* :func:`save_arff` — reference-style single file (driver collect;
  interchange-only, like ``write_feature_csv``).
* :func:`write_arff_shards` / :func:`merge_arff_shards` — the scale path:
  each map_batches task streams its block to its own ``part-*.arff`` with an
  identical header (class value set passed up-front — at 100 TB a global
  unique pass is one small groupby, not a driver collect), so the sink never
  materializes the Dataset; shards concatenate by stripping repeat headers.

ARFF subset: dense rows; ``numeric``/``real``/``integer``, ``string``, and
``{...}`` nominal attributes. Sparse ``{i v}`` rows and date attributes are
out of scope (absent from the reference's files too).
"""

from __future__ import annotations

import io
import os
import uuid
from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset


def _split_csvline(line: str) -> list[str]:
    """One data row; handles quoted fields with embedded commas."""
    return next(iter(__import__("csv").reader([line], skipinitialspace=True)))


def parse_arff_header(lines) -> tuple[str, list[tuple[str, str, list[str] | None]], int]:
    """Parse header lines -> (relation, [(name, kind, nominal_values)], data_start).

    ``kind`` is ``'numeric'`` | ``'string'`` | ``'nominal'``. ``data_start``
    is the index of the first line AFTER ``@data``.
    """
    relation = ""
    attrs: list[tuple[str, str, list[str] | None]] = []
    for i, raw in enumerate(lines):
        line = raw.strip()
        if not line or line.startswith("%"):
            continue
        low = line.lower()
        if low.startswith("@relation"):
            relation = line.split(None, 1)[1].strip().strip("'\"") if " " in line else ""
        elif low.startswith("@attribute"):
            rest = line.split(None, 1)[1].strip()
            if rest.startswith(("'", '"')):
                q = rest[0]
                end = rest.index(q, 1)
                name, typ = rest[1:end], rest[end + 1:].strip()
            else:
                parts = rest.split(None, 1)
                name, typ = parts[0], (parts[1].strip() if len(parts) > 1 else "numeric")
            tl = typ.lower()
            if typ.startswith("{"):
                vals = [v.strip().strip("'\"") for v in typ.strip("{}").split(",")]
                attrs.append((name, "nominal", vals))
            elif tl in ("numeric", "real", "integer"):
                attrs.append((name, "numeric", None))
            elif tl == "string":
                attrs.append((name, "string", None))
            else:
                raise ValueError(f"unsupported ARFF attribute type: {typ!r}")
        elif low.startswith("@data"):
            return relation, attrs, i + 1
    raise ValueError("ARFF file has no @data section")


def _rows_to_table(
    rows: list[list[str]], attrs: list[tuple[str, str, list[str] | None]]
) -> pa.Table:
    if rows and any(len(r) != len(attrs) for r in rows):
        bad = next(r for r in rows if len(r) != len(attrs))
        raise ValueError(f"ARFF row has {len(bad)} fields, expected {len(attrs)}")
    cols = {}
    mat = np.array(rows, dtype=object) if rows else np.empty((0, len(attrs)), object)
    for j, (name, kind, vals) in enumerate(attrs):
        col = mat[:, j] if len(mat) else np.array([], dtype=object)
        missing = np.array([v == "?" for v in col], dtype=bool)
        if kind == "numeric":
            out = np.full(len(col), np.nan)
            if len(col):
                ok = ~missing
                out[ok] = np.array([float(v) for v in col[ok]])
            cols[name] = pa.array(out, pa.float64())
        else:
            vals_clean = [None if m else str(v).strip().strip("'\"") for v, m in zip(col, missing)]
            if kind == "nominal" and vals is not None:
                bad = {v for v in vals_clean if v is not None} - set(vals)
                if bad:
                    raise ValueError(f"nominal attribute {name!r}: values {sorted(bad)} not declared")
            cols[name] = pa.array(vals_clean, pa.string())
    return pa.table(cols)


def read_arff(path: str) -> Dataset:
    """Parse one ARFF file into a Dataset, one column per attribute."""
    with open(path) as f:
        lines = f.read().splitlines()
    _, attrs, start = parse_arff_header(lines)
    rows = [
        _split_csvline(ln.strip())
        for ln in lines[start:]
        if ln.strip() and not ln.strip().startswith("%")
    ]
    return rd.from_arrow(_rows_to_table(rows, attrs))


def read_arff_features(
    path: str,
    *,
    vec_col: str = "vec",
) -> Dataset:
    """Reference ``load_arff`` shape (/root/reference/rp_feature_io.py:494-509):
    numeric attributes packed into one FixedSizeList ``vec`` column; any
    string/nominal attributes (``ID``, ``class``) pass through as columns."""
    with open(path) as f:
        lines = f.read().splitlines()
    _, attrs, start = parse_arff_header(lines)
    rows = [
        _split_csvline(ln.strip())
        for ln in lines[start:]
        if ln.strip() and not ln.strip().startswith("%")
    ]
    t = _rows_to_table(rows, attrs)
    num_names = [n for n, k, _ in attrs if k == "numeric"]
    other = [n for n, k, _ in attrs if k != "numeric"]
    mat = np.column_stack(
        [t.column(n).to_numpy(zero_copy_only=False) for n in num_names]
    ) if num_names else np.empty((len(t), 0))
    cols = {n: t.column(n) for n in other}
    cols[vec_col] = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.reshape(-1), pa.float64()), mat.shape[1]
    )
    return rd.from_arrow(pa.table(cols))


def _header_text(
    relation: str,
    columns: Sequence[str],
    *,
    id_col: str = "ID",
    class_col: str = "class",
    class_values: Sequence[str] | None = None,
) -> str:
    """Reference header layout (/root/reference/rp_feature_io.py:524-537)."""
    buf = io.StringIO()
    buf.write(f"@Relation {relation}\n")
    for c in columns:
        if c == id_col:
            buf.write(f"@Attribute {id_col} string\n")
        elif c == class_col:
            if class_values is None:
                raise ValueError("class column present but class_values unknown")
            buf.write("@Attribute class {" + ",".join(class_values) + "}\n")
        else:
            buf.write(f"@Attribute {c} numeric\n")
    buf.write("\n@Data\n")
    return buf.getvalue()


def save_arff(
    df: pd.DataFrame | Dataset,
    path: str,
    relation_name: str | None = None,
    *,
    id_col: str = "ID",
    class_col: str = "class",
) -> int:
    """Single-file reference-style writer (W5). Driver collects — interchange
    with Weka only, not a scale path (use :func:`write_arff_shards`)."""
    if isinstance(df, Dataset):
        df = df.to_pandas()
    relation = relation_name if relation_name is not None else path
    class_values = (
        list(pd.unique(df[class_col].astype(str))) if class_col in df.columns else None
    )
    with open(path, "w") as f:
        f.write(
            _header_text(
                relation, list(df.columns),
                id_col=id_col, class_col=class_col, class_values=class_values,
            )
        )
        df.to_csv(f, header=False, index=False)
    return len(df)


def write_arff_shards(
    ds: Dataset,
    out_dir: str,
    relation_name: str,
    *,
    columns: Sequence[str],
    id_col: str = "ID",
    class_col: str = "class",
    class_values: Sequence[str] | None = None,
) -> int:
    """Distributed ARFF sink: every task streams its batch to its own
    ``part-*.arff`` with an IDENTICAL header, so output order/assignment never
    matters and nothing funnels through the driver. ``columns`` and (when a
    class column exists) ``class_values`` are declared up-front — the header
    must be knowable before the first row, the same schema-first inversion as
    the parquet sinks (state/checkpoint.py W3 note). Returns rows written."""
    os.makedirs(out_dir, exist_ok=True)
    header = _header_text(
        relation_name, columns,
        id_col=id_col, class_col=class_col, class_values=class_values,
    )
    cols = list(columns)

    def write_batch(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) == 0:
            return pd.DataFrame({"rows": pd.Series([], dtype=np.int64)})
        fname = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.arff")
        tmp = fname + ".tmp"
        with open(tmp, "w") as f:
            f.write(header)
            pdf[cols].to_csv(f, header=False, index=False)
        os.replace(tmp, fname)  # atomic publish, resumable like the W2 sink
        return pd.DataFrame({"rows": [len(pdf)]})

    counts = ds.map_batches(write_batch, batch_format="pandas").to_pandas()
    return int(counts["rows"].sum())


def merge_arff_shards(shard_dir: str, out_path: str) -> int:
    """Concatenate ``part-*.arff`` shards into one Weka-loadable file: first
    shard's header + every shard's data section (shard-merge analogue of
    /root/reference/rp_feature_io.py:647-665). Returns data rows written."""
    shards = sorted(
        os.path.join(shard_dir, f)
        for f in os.listdir(shard_dir)
        if f.endswith(".arff")
    )
    if not shards:
        raise ValueError(f"no .arff shards in {shard_dir}")
    n = 0
    with open(out_path, "w") as out:
        for i, s in enumerate(shards):
            with open(s) as f:
                lines = f.read().splitlines()
            _, _, start = parse_arff_header(lines)
            if i == 0:
                out.write("\n".join(lines[: start]) + "\n")
            data = [ln for ln in lines[start:] if ln.strip() and not ln.strip().startswith("%")]
            n += len(data)
            if data:
                out.write("\n".join(data) + "\n")
    return n
