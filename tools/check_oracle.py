"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side-by-side on a testdata dir, compare row-count,
column names, and an order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query ...]

When running against a NON-default sf_dir, also export
GRAFT_ORACLE_SF_DIR=<sf_dir>: the literal-table oracles
(pipelines/oracle_literals.py — simhash/fingerprint/HLL/CMS/rhythm/kmeans)
recompute their expected values from that directory and default to
sf0.01 (the driver's gate scale); without the override they compare
sf0.01 literals against sf_dir results and fail spuriously.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(obj, Dataset):
        return obj.to_pandas()
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "M":
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype.kind == "f":
            # + 0.0 folds -0.0 to +0.0, and NaNs re-write to the ONE
            # canonical quiet NaN: both classes compare equal but hash
            # their raw bits (found via bigram_pmi's zero-pmi row and
            # flagship_backfill's NaN windows at sf0.1)
            v = df[c].astype(np.float64).to_numpy(copy=True) + 0.0
            v[np.isnan(v)] = np.nan
            df[c] = v
    return df.sort_values(list(df.columns), ignore_index=True)


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(canon(df), index=False).sum())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            raw = to_pandas(fn(sf_dir))
            if name not in oracles:
                print(f"{name:18s} rows-only: {len(raw)} rows, cols={sorted(raw.columns)}")
                continue
            got = canon(raw)
        except Exception as e:
            print(f"{name:18s} RAY ERROR: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        exp = canon(con.execute(oracles[name]).fetchdf())
        problems = []
        if len(got) != len(exp):
            problems.append(f"rows {len(got)} != {len(exp)}")
        if list(got.columns) != list(exp.columns):
            problems.append(f"cols {list(got.columns)} != {list(exp.columns)}")
        if not problems and value_hash(got) != value_hash(exp):
            diff_cols = []
            for c in got.columns:
                a, b = got[c], exp[c]
                if a.dtype.kind == "f":
                    same = np.allclose(a, b, equal_nan=True)
                else:
                    same = a.equals(b)
                if not same:
                    diff_cols.append(c)
            problems.append(f"value-hash mismatch (diff cols: {diff_cols or 'ordering/NaN'})")
        status = "OK" if not problems else "FAIL " + "; ".join(problems)
        print(f"{name:18s} {len(got):6d} rows  {status}")
        if problems:
            failed.append(name)
    ray.shutdown()
    if failed:
        print("FAILED:", failed)
        return 1
    print("ALL ORACLE CHECKS PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
