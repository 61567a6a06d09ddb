"""Distributed distinct set operations: INTERSECT / EXCEPT / UNION.

SURVEY.md §2.8 set-op coverage. The reference's nearest analogues are the
id-consistency check (set equality via sorted-id comparison,
rp_feature_io.py check_id_consistency) and the resume anti-join
(rp_extract_batch.py done-file set difference); this is the distributed
generalization over arbitrarily large key sets.

Shape: tag each side with presence flags (map-side, zero cost), union the
two lineages, then ONE distinct-keys exchange — ``grouped_reduce`` with
``max`` flags collapses each block to its distinct keys BEFORE the shuffle,
so the exchange carries distinct-keys-per-block, never raw rows. The final
filter is a vectorized mask per partition. SQL-set semantics: NULL keys
compare equal (one null group survives an INTERSECT when both sides have
nulls), matching DuckDB's INTERSECT/EXCEPT.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def distinct_set_op(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    op: str = "intersect",
    num_partitions: int | None = None,
) -> Dataset:
    """Distinct keys of ``left`` <op> ``right``; op in
    {'intersect', 'except', 'union'}. Output: one column named ``on``,
    one row per surviving distinct key."""
    if op not in ("intersect", "except", "union"):
        raise ValueError(f"unknown set op {op!r}")
    from rp_extract_ray.stages.groupops import grouped_reduce

    right_on = right_on or on
    # the union below needs ONE key type; unify the right side to the
    # left's (int32 keys meeting int64 keys is routine schema drift)
    try:
        left_type = left.schema().base_schema.field(on).type
    except Exception:
        left_type = None

    def tag(side_a: bool):
        def f(b: pa.Table) -> pa.Table:
            keys = b.column(on if side_a else right_on)
            if not side_a and left_type is not None and keys.type != left_type:
                keys = keys.cast(left_type)
            one = pa.array([1] * len(b), type=pa.int8())
            zero = pa.array([0] * len(b), type=pa.int8())
            return pa.table(
                {
                    on: keys,
                    "_in_a": one if side_a else zero,
                    "_in_b": zero if side_a else one,
                }
            )

        return f

    tagged = left.select_columns([on]).map_batches(
        tag(True), batch_format="pyarrow"
    ).union(
        right.select_columns([right_on]).map_batches(
            tag(False), batch_format="pyarrow"
        )
    )
    flags = grouped_reduce(
        tagged,
        on,
        {"_in_a": ("_in_a", "max"), "_in_b": ("_in_b", "max")},
        num_partitions=num_partitions,
    )

    def keep(b: pa.Table) -> pa.Table:
        a = pc.equal(b.column("_in_a"), 1)
        bb = pc.equal(b.column("_in_b"), 1)
        if op == "intersect":
            mask = pc.and_(a, bb)
        elif op == "except":
            mask = pc.and_(a, pc.invert(bb))
        else:  # union: every distinct key survives
            mask = pc.or_(a, bb)
        return b.filter(mask).select([on])

    return flags.map_batches(keep, batch_format="pyarrow")
