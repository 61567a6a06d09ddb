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


def role_alternation_report(
    ds: Dataset,
    *,
    conv_col: str = "conv_id",
    order_cols=("ts", "turn_idx"),
    role_col: str = "role",
    num_partitions: int = 32,
) -> Dataset:
    """Per-conversation transcript-hygiene report: turn counts per role,
    and the count of ROLE-ALTERNATION VIOLATIONS (consecutive turns with
    the same role under stable turn order) — the standard validity gate a
    training pipeline runs before packing multi-turn conversations. One
    conv-keyed exchange; the kernel is a shifted-view equality over runs
    plus one per-conversation groupby (all C kernels).

    Output: one row per conversation — n_turns, n_user, n_assistant,
    n_tool_role, n_violations, first/last role.
    """
    import numpy as np
    import pandas as pd

    from rp_extract_ray.stages.partition import partitioned_apply

    def fn(pdf: "pd.DataFrame", starts: np.ndarray) -> "pd.DataFrame":
        n = len(pdf)
        cols = [conv_col, "n_turns", "n_user", "n_assistant",
                "n_tool_role", "n_violations", "first_role", "last_role"]
        if n == 0:  # empty-frame contract, same as the other kernels here
            return pd.DataFrame({c: [] for c in cols})
        role = pdf[role_col].to_numpy()
        same = np.zeros(n, dtype=np.int64)
        if n > 1:
            interior = starts[1:] == starts[:-1]  # same conversation run
            same[1:] = (role[1:] == role[:-1]) & interior
        # first/last turn per run under the exchange's sort; groups come
        # out of groupby(sort=False) in run order, so boundary slices
        # align with the aggregate rows directly — no merge needed
        is_first = np.zeros(n, dtype=bool)
        is_first[starts] = True
        run_end = np.zeros(n, dtype=bool)
        run_end[:-1] = starts[1:] != starts[:-1]
        run_end[-1] = True
        work = pd.DataFrame(
            {
                conv_col: pdf[conv_col].to_numpy(),
                "n_turns": np.ones(n, dtype=np.int64),
                "n_user": (role == "user").astype(np.int64),
                "n_assistant": (role == "assistant").astype(np.int64),
                "n_tool_role": (role == "tool").astype(np.int64),
                "n_violations": same,
            }
        )
        g = work.groupby(conv_col, sort=False).sum().reset_index()
        g["first_role"] = role[is_first]
        g["last_role"] = role[run_end]
        return g[cols]

    return partitioned_apply(
        ds, fn, entity_col=conv_col, order_cols=order_cols,
        num_partitions=num_partitions,
    )
