"""Stateless per-turn derived columns (vectorized Arrow map_batches).

Analogue of the reference's per-sample normalization chain (M1-M3:
/root/reference/audiofile_read.py:44-49, /root/reference/rp_extract.py:477-481,
525): collapse the raw turn record into the numeric series the feature stages
consume — ``text_len``, ``token_est``, role/tool indicators. Everything here
is a pyarrow.compute kernel over zero-copy Arrow batches; no Python row loop.

``gap_s`` (inter-turn gap) needs per-conversation sorted context and therefore
lives in the partitioned stages (stages/lag.py), not here.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

# BPE-ish token pattern: word runs or single non-space punctuation (RE2 syntax).
TOKEN_PATTERN = r"\w+|[^\w\s]"


def add_turn_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append text_len, token_est, is_user/is_assistant/is_tool_role, has_tool."""
    text = batch.column(text_col)
    text_nn = pc.fill_null(text, "")
    batch = batch.append_column("text_len", pc.cast(pc.utf8_length(text_nn), pa.int64()))
    batch = batch.append_column(
        "token_est", pc.cast(pc.count_substring_regex(text_nn, TOKEN_PATTERN), pa.int64())
    )
    if "role" in batch.column_names:
        role = batch.column("role")
        for r in ("user", "assistant", "tool"):
            batch = batch.append_column(
                f"is_{r}", pc.cast(pc.equal(role, r), pa.int8())
            )
    if "tool" in batch.column_names:
        tool = batch.column("tool")
        has_tool = pc.and_(pc.is_valid(tool), pc.not_equal(pc.fill_null(tool, ""), ""))
        batch = batch.append_column("has_tool", pc.cast(has_tool, pa.int8()))
    return batch


def add_turn_stats(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        add_turn_stats_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )
