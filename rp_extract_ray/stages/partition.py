"""Conversation partitioning: the engine's one big shuffle.

Design (SURVEY.md §7.4/§7.5-1): every temporal operator (windows, lag/lead,
as-of, sessions) runs over **entity-partitioned, ts-sorted** frames. We add a
small-int partition key ``_part = stable_hash(entity) % P`` in a vectorized
``map_batches``, then ``groupby("_part").map_groups(fn)`` — a single
all-to-all exchange keyed by an int32, after which ``fn`` sees a whole
partition (a set of WHOLE conversations) as one sorted DataFrame and computes
fully vectorized with entity-boundary masks. No per-conversation Python loop,
no cross-batch mutable state to carry — the partition IS the state boundary.

Skew (SURVEY.md §7.5-6): one conversation can dwarf the rest (heavy-tailed
lengths). For **causal** operators (horizon of at most ``overlap`` past rows:
sliding windows, lag, gap), :class:`SaltSpec` chunks conversations by
``turn_idx`` into fixed-size salted chunks and duplicates the ``overlap`` tail
rows of each chunk into the next chunk as ghost rows — the analogue of the
reference's 50%-overlap spectrogram frames (/root/reference/rp_extract.py:186).
Each chunk becomes its own partition unit; ghost rows provide full window
context and are dropped from the output. This needs no pre-pass over the data
(chunking is derived from ``turn_idx`` itself) and bounds any partition's size
by ``chunk_turns + overlap`` rows per conversation.

The stable hash is ``pandas.util.hash_array`` (SipHash with a fixed key) —
deterministic across processes and nodes, unlike Python's seeded ``hash``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from rp_extract_ray.schema import DEFAULT_NUM_PARTITIONS

PART_COL = "_part"
GHOST_COL = "_ghost"
CHUNK_COL = "_chunk"

_MIX = np.uint64(0x9E3779B97F4A7C15)


def arrow_out(df: pd.DataFrame) -> pa.Table:
    """Convert a kernel's pandas result to a metadata-free Arrow table.

    Use as the RETURN conversion of any map stage whose lineage later hits a
    ``sort``/``groupby``: Ray's sort picks its shuffle block format from the
    DECLARED ``batch_format`` of upstream map_batches stages, so a
    pandas-declared stage flips the whole downstream shuffle to pandas
    blocks (re-converted per reduce task, plus the unhashable pandas
    metadata blob). Declare ``batch_format="pyarrow"`` and convert inside."""
    return strip_meta(pa.Table.from_pandas(df, preserve_index=False))


def strip_meta(t: pa.Table) -> pa.Table:
    """Drop schema metadata (zero-copy). Ray's pandas->arrow block conversion
    attaches a ``b'pandas'`` metadata blob whose schema hash raises
    ``unhashable type: 'dict'`` in this pyarrow version, making every shuffle
    reduce task log a (harmless, noisy) dedup warning — strip it before any
    table enters an exchange."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def arrow_clean(ds: Dataset) -> Dataset:
    """Convert a Dataset's blocks to metadata-free Arrow. Use on the inputs
    of ``Dataset.join``: its hash-shuffle aggregators unify block schemas,
    and pandas-derived blocks carry the unhashable pandas metadata blob (see
    :func:`strip_meta`) — one warning line per aggregator task otherwise.
    The pandas->arrow conversion happens either way; this just fronts it."""
    return ds.map_batches(strip_meta, batch_format="pyarrow")


def stable_hash(values) -> np.ndarray:
    """Deterministic uint64 hash of an array of keys (any dtype).

    VALUE-stable across block dtypes: an int64 arrow column converts to
    float64 wherever a BLOCK happens to contain a null
    (``to_numpy(zero_copy_only=False)``), and hashing the float bit
    pattern would route the same key value to different partitions
    depending on its block's null content (found via a null-key join
    repro: k=2 in a null-bearing block landed in a different partition
    than k=2 in a clean block). Integral finite floats therefore hash as
    their int64 value; non-integral/NaN elements hash as floats (NaN's
    hash is a constant, so null keys co-locate)."""
    arr = np.asarray(values)
    if arr.dtype == object or arr.dtype.kind in ("U", "S"):
        return pd.util.hash_array(arr.astype(object))
    if arr.dtype.kind == "f":
        with np.errstate(invalid="ignore"):
            integral = (
                np.isfinite(arr)
                & (np.floor(arr) == arr)
                & (np.abs(arr) < 2**63)
            )
        out = pd.util.hash_array(arr)  # NaN/inf/fractional path
        if integral.any():
            out[integral] = pd.util.hash_array(
                arr[integral].astype(np.int64)
            )
        return out
    return pd.util.hash_array(arr)


@dataclass(frozen=True)
class SaltSpec:
    """Causal chunking spec for skewed entities.

    ``chunk_turns`` rows of an entity per chunk (by ``turn_col`` floor-div);
    ``overlap`` trailing rows of each chunk are replicated into the next chunk
    as ghost context. Only valid for operators whose output at row *i* depends
    on at most ``overlap`` preceding rows of the same entity.

    ``lead_overlap`` additionally replicates the first ``lead_overlap`` rows
    of each chunk into the PREVIOUS chunk as forward-ghost context, so
    operators that read up to ``lead_overlap`` FUTURE rows (leads) are exact
    at chunk tails too. Without it, a lead column under salting is silently
    NaN at every chunk tail where the unsalted path has real values.

    CONTRACT: ``turn_col`` must be the DENSE 0-based per-entity ordinal (the
    transcript input contract). Chunk membership and ghost overlap are
    selected by ``turn % chunk_turns`` POSITIONS — a gappy ordinal would
    under-fill the ghost context and silently truncate chunk-border windows.
    Guard untrusted input with ``validate_transcripts(require_dense=True)``.
    """

    chunk_turns: int = 4096
    overlap: int = 64
    turn_col: str = "turn_idx"
    lead_overlap: int = 0

    def __post_init__(self):
        if self.overlap >= self.chunk_turns:
            raise ValueError("overlap must be < chunk_turns")
        if self.lead_overlap >= self.chunk_turns:
            raise ValueError("lead_overlap must be < chunk_turns")


def _chunk_part(ent_hash: np.ndarray, chunk: np.ndarray, num_partitions: int) -> np.ndarray:
    mixed = (ent_hash + np.uint64(1) + chunk.astype(np.uint64)) * _MIX
    mixed ^= mixed >> np.uint64(31)
    return (mixed % np.uint64(num_partitions)).astype(np.int32)


def _add_part(
    batch: pa.Table, entity_col: str, num_partitions: int, salt: SaltSpec | None
) -> pa.Table:
    batch = strip_meta(batch)  # pre-exchange hygiene: see strip_meta
    ent_hash = stable_hash(batch.column(entity_col).to_numpy(zero_copy_only=False))
    if salt is None:
        part = (ent_hash % np.uint64(num_partitions)).astype(np.int32)
        return batch.append_column(PART_COL, pa.array(part, pa.int32()))
    turn = batch.column(salt.turn_col).to_numpy(zero_copy_only=False).astype(np.int64)
    chunk = turn // salt.chunk_turns
    in_tail = (turn % salt.chunk_turns) >= (salt.chunk_turns - salt.overlap)

    real = batch.append_column(GHOST_COL, pa.array(np.zeros(len(turn), dtype=bool)))
    real = real.append_column(CHUNK_COL, pa.array(chunk, pa.int64()))
    real = real.append_column(
        PART_COL, pa.array(_chunk_part(ent_hash, chunk, num_partitions), pa.int32())
    )
    parts = [real]
    if in_tail.any():
        # replicate tail rows into the NEXT chunk as ghost context; CHUNK_COL
        # is the DESTINATION chunk so (entity, _chunk) is the window-state
        # unit even when two chunks of one entity collide into one partition
        ghosts = batch.filter(pa.array(in_tail))
        ghosts = ghosts.append_column(GHOST_COL, pa.array(np.ones(len(ghosts), dtype=bool)))
        ghosts = ghosts.append_column(CHUNK_COL, pa.array(chunk[in_tail] + 1, pa.int64()))
        ghosts = ghosts.append_column(
            PART_COL,
            pa.array(_chunk_part(ent_hash[in_tail], chunk[in_tail] + 1, num_partitions), pa.int32()),
        )
        parts.append(ghosts)
    if salt.lead_overlap:
        # forward ghosts: each chunk's head rows into the PREVIOUS chunk so
        # leads are exact at chunk tails (chunk 0 has no predecessor)
        in_head = ((turn % salt.chunk_turns) < salt.lead_overlap) & (chunk > 0)
        if in_head.any():
            fwd = batch.filter(pa.array(in_head))
            fwd = fwd.append_column(GHOST_COL, pa.array(np.ones(len(fwd), dtype=bool)))
            fwd = fwd.append_column(CHUNK_COL, pa.array(chunk[in_head] - 1, pa.int64()))
            fwd = fwd.append_column(
                PART_COL,
                pa.array(_chunk_part(ent_hash[in_head], chunk[in_head] - 1, num_partitions), pa.int32()),
            )
            parts.append(fwd)
    return parts[0] if len(parts) == 1 else pa.concat_tables(parts)


def entity_starts(*key_arrays: np.ndarray) -> np.ndarray:
    """Per-row index of the first row of this row's key run.

    Accepts one or more parallel key arrays (rows are in the same run iff all
    keys are equal); arrays must be grouped (sorted) so equal keys are
    contiguous. Returns int64 array, same length.
    """
    n = len(key_arrays[0])
    if n == 0:
        return np.empty(0, dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for arr in key_arrays:
        change[1:] |= arr[1:] != arr[:-1]
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, n))
    return np.repeat(starts, counts)


def run_bounds(starts: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(run_starts, run_ends) index pairs of the key runs encoded by a
    per-row ``starts`` array (as produced by :func:`entity_starts`).

    Handles the empty-frame case: ``np.append(run_starts[1:], n)`` on an
    empty input yields a shape-(1,) array against shape-(0,) ``run_starts``
    and every downstream arithmetic broadcast raises — groupby CAN deliver
    empty partition frames, so every partition fn must use this helper."""
    run_starts = np.unique(starts).astype(np.int64)
    if len(run_starts) == 0:
        return run_starts, run_starts.copy()
    return run_starts, np.append(run_starts[1:], n).astype(np.int64)


def partitioned_apply(
    ds: Dataset,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    entity_col: str = "conv_id",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    salt: SaltSpec | None = None,
    metrics_sink=None,
    metrics_stage: str = "partitioned_apply",
    expose_ghost: bool = False,
    side: Dataset | None = None,
    side_cols: Sequence[str] = (),
) -> Dataset:
    """Run ``fn`` over each entity-partitioned, sorted frame.

    ``fn(sorted_pdf, starts) -> pdf`` receives a pandas DataFrame sorted by
    ``(entity_col, *order_cols)`` containing only whole conversations (or
    whole salted chunk-units with their ghost prefix) plus the per-row run
    start indices (``starts``), and must be vectorized. With ``salt``, the
    run unit is ``(entity, chunk)`` and ``fn``'s output for a row may depend
    on at most ``salt.overlap`` preceding rows of the same entity; ghost rows
    flow through ``fn`` (as context) and are dropped from the output here.

    ``side``: optional CO-PARTITIONED side table — a Dataset that already
    carries :data:`PART_COL` values computed with the SAME partitioner, so
    each side row rides the one exchange into its data partition (the
    broadcast-free alternative for side state too large for ``ray.put``).
    Its rows are split off before sorting and handed to ``fn`` as a third
    argument ``fn(pdf, starts, side_pdf)`` with columns
    ``[entity_col, *side_cols]``; the data frame never sees ``side_cols``.
    """
    sort_cols = [entity_col, *order_cols]
    if salt is not None:
        sort_cols = [entity_col, CHUNK_COL, salt.turn_col]

    SIDE_MARK = "_side_row"

    def run_group(pdf: pd.DataFrame, side_pdf: pd.DataFrame | None = None) -> pd.DataFrame:
        rows_in = len(pdf)
        part_id = int(pdf[PART_COL].iloc[0]) if rows_in else -1
        if metrics_sink is not None:
            from rp_extract_ray.state.metrics import PartitionMetrics

            pm = PartitionMetrics(part_id, metrics_stage)
        pdf = pdf.sort_values(sort_cols, kind="mergesort", ignore_index=True)
        ghost = chunk = None
        if GHOST_COL in pdf.columns:
            if expose_ghost:
                chunk = pdf.pop(CHUNK_COL).to_numpy()
                ghost = None  # fn handles ghosts itself (reads GHOST_COL)
            else:
                # dtype=bool matters: after a heterogeneous union (side
                # tables) the column arrives as object, and ~object_array
                # yields Python ints (-1), not a boolean mask
                ghost = pdf.pop(GHOST_COL).to_numpy(dtype=bool)
                chunk = pdf.pop(CHUNK_COL).to_numpy(dtype=np.int64)
        pdf = pdf.drop(columns=[PART_COL])
        keys = [pdf[entity_col].to_numpy()]
        if chunk is not None:
            keys.append(chunk)
        starts = entity_starts(*keys)
        out = fn(pdf, starts) if side is None else fn(pdf, starts, side_pdf)
        if ghost is not None and len(out) == len(ghost):
            out = out.loc[~ghost]
        if metrics_sink is not None:
            import ray as _ray

            # blocking: the metrics row is durable once the partition task
            # reports success (one tiny actor call per PARTITION, not per row)
            _ray.get(metrics_sink.add.remote(pm.row(rows_in, len(out))))
        # return ARROW, not the kernel's DataFrame: one pandas-block stage in
        # a lineage makes every DOWNSTREAM Dataset.sort emit pandas blocks
        # (measured: the flagship's rejoin exchange ran its whole reduce on
        # pandas and re-converted per group), and pandas blocks carry the
        # metadata blob whose schema hash fails in every shuffle reduce task
        if isinstance(out, pd.DataFrame):
            out = pa.Table.from_pandas(out, preserve_index=False)
        return strip_meta(out)

    parted = ds.map_batches(
        _add_part,
        batch_format="pyarrow",
        fn_kwargs={"entity_col": entity_col, "num_partitions": num_partitions, "salt": salt},
    )
    if side is None:
        return parted.groupby(PART_COL).map_groups(run_group, batch_format="pandas")

    def mark_side(b: pa.Table) -> pa.Table:
        return strip_meta(b).append_column(
            SIDE_MARK, pa.array(np.ones(len(b), dtype=bool))
        )

    def mark_data(b: pa.Table) -> pa.Table:
        return b.append_column(SIDE_MARK, pa.array(np.zeros(len(b), dtype=bool)))

    unioned = parted.map_batches(mark_data, batch_format="pyarrow").union(
        side.map_batches(mark_side, batch_format="pyarrow")
    )

    def run_group_split(tbl: pa.Table) -> pd.DataFrame:
        # split side rows while still ARROW: the unified schema has nulls in
        # each side's missing columns, and a pandas conversion of the WHOLE
        # group would upcast null-bearing int columns to float64. Filtering
        # first leaves the data part null-free, so dtypes survive.
        mark = np.asarray(
            tbl.column(SIDE_MARK).to_numpy(zero_copy_only=False), dtype=bool
        )
        keep = [c for c in tbl.column_names if c != SIDE_MARK and c not in side_cols]
        data_pdf = tbl.filter(pa.array(~mark)).select(keep).to_pandas()
        if not all(c in tbl.column_names for c in side_cols):
            # a LEGITIMATELY EMPTY side input contributes zero blocks to the
            # union, so its columns never enter the unified schema (found:
            # tpch_q3 at sf0.001, where the date filter empties orders).
            # Emit a typed-key empty side frame; value columns default
            # float64 (only the merge key's dtype matters for the join).
            side_pdf = pd.DataFrame(
                {
                    entity_col: pd.Series(dtype=data_pdf[entity_col].dtype),
                    **{c: pd.Series(dtype="float64") for c in side_cols},
                }
            )
        else:
            side_pdf = (
                tbl.filter(pa.array(mark))
                .select([entity_col, *side_cols])
                .to_pandas()
            )
        return run_group(data_pdf, side_pdf)

    return unioned.groupby(PART_COL).map_groups(
        run_group_split, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Range partitioning (the north rule's "conv_id-range-partitioned, ts-sorted
# partitions"): deterministic sampled bounds + searchsorted assignment +
# sorted partitioned write. Hash partitioning (above) balances load for
# exchanges; RANGE partitioning additionally gives globally ordered output
# files whose [min,max] key ranges are disjoint — the layout a consumer
# needs for merge reads and key-range pruning.
# ---------------------------------------------------------------------------


def range_partition_bounds(
    ds: Dataset,
    key_col: str,
    num_partitions: int,
    *,
    sample_rate: float = 0.1,
    seed: int = 1,
) -> np.ndarray:
    """``num_partitions - 1`` split bounds from a DETERMINISTIC keyed sample.

    Spark-RangePartitioner shape, made reproducible: the sample is the rows
    whose Knuth-hash of ``key_col`` falls under ``sample_rate`` (identical
    across runs/cluster sizes, exactly replicable in SQL — same formula as
    ``pipelines.relational.deterministic_sample``), and the bounds are the
    sample's EXACT ``quantile_disc`` values at ``i/P`` (rank ``ceil(q*n)``,
    numpy ``inverted_cdf`` == DuckDB ``quantile_disc``). Only the pruned,
    sampled key column is ever collected (choose ``sample_rate`` so
    ``rate × rows`` fits one worker — the standard bounds-fitting budget).
    """
    threshold = np.uint64(int(np.floor(sample_rate * 2**32)))

    def sample(b: pa.Table) -> pa.Table:
        k = b.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (
            k.astype(np.uint64) * np.uint64(2654435761)
            + np.uint64(seed) * np.uint64(2654435769)
        ) & np.uint64(0xFFFFFFFF)
        return b.select([key_col]).filter(pa.array(h < threshold))

    qs = [i / num_partitions for i in range(1, num_partitions)]

    def bounds_of(b: pa.Table) -> pa.Table:
        v = b.column(key_col).to_numpy(zero_copy_only=False)
        if len(v) == 0:
            return pa.table({"bound": pa.array([], pa.float64())})
        bs = np.quantile(v, qs, method="inverted_cdf")
        return pa.table({"bound": pa.array(np.asarray(bs, dtype=np.float64))})

    small = (
        ds.select_columns([key_col])
        .map_batches(sample, batch_format="pyarrow")
        .repartition(1)  # one exchange of the pruned sample only
        .map_batches(bounds_of, batch_format="pyarrow")
        .to_pandas()  # <= P-1 rows
    )
    return small["bound"].to_numpy()


RANGE_PART_COL = "_rpart"


def add_range_part(ds: Dataset, key_col: str, bounds: np.ndarray) -> Dataset:
    """Append the range-partition id: ``#{b in bounds : b < key}``
    (searchsorted-left — matches the SQL ``sum(key > bound)`` convention)."""
    b = np.sort(np.asarray(bounds, dtype=np.float64))

    def f(t: pa.Table) -> pa.Table:
        k = t.column(key_col).cast(pa.float64()).to_numpy(zero_copy_only=False)
        part = np.searchsorted(b, k, side="left").astype(np.int64)
        return t.append_column(RANGE_PART_COL, pa.array(part))

    return ds.map_batches(f, batch_format="pyarrow")


def write_range_sorted(
    ds: Dataset,
    path: str,
    key_col: str,
    *,
    order_cols: Sequence[str] = ("ts",),
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    sample_rate: float = 0.1,
    seed: int = 1,
) -> np.ndarray:
    """Write ``ds`` as range-partitioned Parquet, sorted within partitions.

    One exchange: bounds from :func:`range_partition_bounds`, assignment is
    a pure map, then ``groupby(part).map_groups`` sorts each partition by
    ``(key_col, *order_cols)`` and the partitioned write puts each key range
    in its own directory (resumable layout: a re-run can skip finished
    ranges). Returns the bounds so readers can prune by key range.
    """
    bounds = range_partition_bounds(
        ds, key_col, num_partitions, sample_rate=sample_rate, seed=seed
    )
    parted = add_range_part(ds, key_col, bounds)

    def sort_part(g: pa.Table) -> pa.Table:
        return g.sort_by([(c, "ascending") for c in (key_col, *order_cols)])

    (
        parted.groupby(RANGE_PART_COL)
        .map_groups(sort_part, batch_format="pyarrow")
        .write_parquet(path, partition_cols=[RANGE_PART_COL])
    )
    return bounds
