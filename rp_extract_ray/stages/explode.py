"""Row-expanding and field-extracting maps: token explode with ordinality
(the flat_map pattern) and JSON field extraction.

Both are single ``map_batches`` passes over zero-copy Arrow batches — the
explode builds positions straight from the ListArray offsets (no Python
per-row), and the JSON extract is one RE2 kernel pass (semantically
``json_extract`` for the flat numeric fields it targets; the DuckDB oracle
uses real ``json_extract`` so the equivalence is gated, not assumed).
Reference analogue: the segment-explode maps (SURVEY.md §2.3 M4 family) —
one input row fanning out to position-indexed rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def explode_tokens_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = " ",
) -> pa.Table:
    """One row per token with its 1-based position: (id, pos, token).
    Split semantics == SQL ``string_split`` (empty text yields one empty
    token; adjacent separators yield empty tokens)."""
    text = pc.fill_null(batch.column(text_col), "")
    toks = pc.split_pattern(text, sep).combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lens = np.diff(offsets)
    ids = np.repeat(
        batch.column(id_col).to_numpy(zero_copy_only=False), lens
    )
    pos = np.arange(int(offsets[-1]), dtype=np.int64) - np.repeat(
        offsets[:-1], lens
    ) + 1
    return pa.table(
        {
            id_col: pa.array(ids),
            "pos": pa.array(pos),
            "token": toks.values,
        }
    )


def explode_tokens(
    ds: Dataset, *, text_col: str = "text", id_col: str = "doc_id", sep: str = " "
) -> Dataset:
    return ds.map_batches(
        explode_tokens_batch,
        batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "id_col": id_col, "sep": sep},
    )


def extract_regex_groups(
    ds: Dataset,
    text_col: str,
    pattern: str,
    out_cols: "list[str]",
) -> Dataset:
    """First-match capture-group extraction into typed columns (the
    log/URL/field-parsing map of an ingest pipeline). ``pattern`` uses
    named groups matching ``out_cols``; one vectorized RE2 pass per batch
    (``pc.extract_regex`` — the same regex engine DuckDB uses, so
    leftmost-match semantics agree exactly). Non-matching rows yield null
    in every group column (pair the SQL oracle with
    ``NULLIF(regexp_extract(...), '')`` — DuckDB returns '' for misses)."""

    def f(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(pc.fill_null(b.column(text_col), ""), pattern)
        for name in out_cols:
            b = b.append_column(name, pc.struct_field(m, name))
        return b

    return ds.map_batches(f, batch_format="pyarrow")


def extract_json_int(
    ds: Dataset,
    json_col: str,
    field: str,
    *,
    out_col: str | None = None,
) -> Dataset:
    """Extract a flat integer ``field`` from a JSON-object string column as
    int64 (null when the field is absent/non-integer). One vectorized RE2
    pass; matches ``json_extract(col, '$.field')`` for unnested integer
    fields with JSON string escaping limited to the key (sufficient for
    flat telemetry props; nested/quoted payloads would need a real parser
    actor — the seam is this function)."""
    out_col = out_col or field
    pat = r'"' + field + r'"\s*:\s*(?P<v>-?\d+)'

    def f(b: pa.Table) -> pa.Table:
        m = pc.extract_regex(pc.fill_null(b.column(json_col), ""), pat)
        v = pc.struct_field(m, "v").cast(pa.int64())
        return b.append_column(out_col, v)

    return ds.map_batches(f, batch_format="pyarrow")
