"""Broadcast hash joins and semi/anti joins.

The reference's joins are all small-side in-memory id joins
(/root/reference/classes_io.py:269-337, 340-386): a dict or key-set is built
once and probed per record. The Ray-native equivalents broadcast the small
side through the object store (``ray.put`` once; read per actor/task) and
probe inside a vectorized ``map_batches`` — zero shuffle on the big side
(SURVEY.md §2.5 J1/J3/J5)."""

from __future__ import annotations

from typing import Sequence

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def broadcast_join(
    big: Dataset,
    small: Dataset | pd.DataFrame,
    *,
    on: str,
    small_on: str | None = None,
    value_cols: Sequence[str] | None = None,
    how: str = "inner",
    normalize_ids: dict | None = None,
) -> Dataset:
    """Hash-join ``small``'s value columns onto ``big`` (inner or left).

    The small side is fully materialized (it must fit on one node — the same
    assumption the reference makes for its label tables) and broadcast once.
    ``normalize_ids`` (strip_ids kwargs) matches on path/ext-stripped,
    optionally lowercased keys — the reference's filename matching
    (/root/reference/classes_io.py:340-386) — while original columns pass
    through untouched.
    """
    small_on = small_on or on
    norm = _normalizer(normalize_ids)
    small_pdf = small.to_pandas() if isinstance(small, Dataset) else small
    if value_cols is None:
        value_cols = [c for c in small_pdf.columns if c != small_on]
    small_pdf = small_pdf[[small_on, *value_cols]].copy()
    right_key = small_on
    if norm is not None:
        # rename the key so the merge never collides with big's own column
        right_key = "_rkey"
        small_pdf[right_key] = norm(small_pdf[small_on].to_numpy()).to_numpy(
            zero_copy_only=False
        )
        small_pdf = small_pdf[[right_key, *value_cols]]
    small_pdf = small_pdf.drop_duplicates(subset=[right_key])
    ref = ray.put(small_pdf)

    # stateless tasks: the broadcast read is a local object-store get, and a
    # task pool uses every free CPU (an actor pool would cap + fuse upstream)
    def probe(batch: pd.DataFrame) -> pd.DataFrame:
        left_key = on
        if norm is not None:
            batch = batch.copy()
            batch["_norm_key"] = norm(batch[on].to_numpy()).to_numpy(
                zero_copy_only=False
            )
            left_key = "_norm_key"
        out = batch.merge(
            ray.get(ref), left_on=left_key, right_on=right_key, how=how
        )
        drop = ["_norm_key", "_rkey"] + ([small_on] if small_on != on else [])
        return out.drop(columns=[c for c in drop if c in out.columns])

    return big.map_batches(probe, batch_format="pandas")


def _normalizer(normalize_ids: dict | None):
    """Key-normalization fn from a strip_ids kwargs dict (M26 tail:
    cut_path/cut_ext/lower — /root/reference/classes_io.py:546-558). None ->
    identity."""
    if normalize_ids is None:
        return None
    from rp_extract_ray.functions.ids import strip_ids

    def norm(arr):
        return strip_ids(arr, **normalize_ids)

    return norm


def semi_anti_join(
    big: Dataset,
    keys: Dataset | set,
    *,
    on: str,
    keys_on: str | None = None,
    anti: bool = False,
    num_partitions: int | None = None,
    normalize_ids: dict | None = None,
) -> Dataset:
    """Semi (keep matching) / anti (keep non-matching) join — the
    reference's resume primitive J4
    (/root/reference/rp_extract_batch.py:241-264) and filename matcher J1.

    Two strategies by key-side type:

    * plain ``set``/sequence — broadcast: ``ray.put`` once, vectorized
      ``is_in`` probe per batch, zero shuffle. Right for key sets that fit
      on one node (the reference's own assumption).
    * ``Dataset`` — DISTRIBUTED hash semi/anti join (``Dataset.join``
      left_semi/left_anti): both sides shuffle by key hash, nothing ever
      materializes on the driver. Right when the key side can outgrow a
      node (resume sets / filter keys at 100x corpus scale).
    """
    keys_on = keys_on or on
    norm = _normalizer(normalize_ids)
    if isinstance(keys, Dataset):
        if num_partitions is None:
            cpus = int(ray.cluster_resources().get("CPU", 8))
            num_partitions = max(2, cpus // 2)
        how = "left_anti" if anti else "left_semi"
        if norm is None:
            # task-shuffle path: same hash-partitioned both-sides shape,
            # without Dataset.join's per-actor startup floor (see
            # repartition_join docstring for the measurement)
            return repartition_join(
                big, keys, on=on, right_on=keys_on,
                how="anti" if anti else "semi",
                num_partitions=num_partitions,
            )
        # match on a normalized temp key; original columns pass through
        KEY = "_norm_key"

        def add_key_big(b: pa.Table) -> pa.Table:
            return b.append_column(KEY, norm(b.column(on)))

        def key_only(b: pa.Table) -> pa.Table:
            return pa.table({KEY: norm(b.column(keys_on))})

        out = big.map_batches(add_key_big, batch_format="pyarrow").join(
            keys.map_batches(key_only, batch_format="pyarrow"),
            how, num_partitions, on=(KEY,),
        )
        return out.map_batches(
            lambda b: b.drop_columns([KEY]), batch_format="pyarrow"
        )

    key_arr = pa.array(sorted(set(keys)))
    if norm is not None:
        key_arr = norm(key_arr)
    ref = ray.put(key_arr)

    def filt(batch: pa.Table) -> pa.Table:
        probe = batch.column(on) if norm is None else norm(batch.column(on))
        mask = pc.is_in(probe, value_set=ray.get(ref))
        if anti:
            mask = pc.invert(mask)
        return batch.filter(mask)

    return big.map_batches(filt, batch_format="pyarrow")


def bloom_semi_join(
    big: Dataset,
    keys: Dataset,
    *,
    on: str,
    keys_on: str | None = None,
    n_keys_hint: int | str = "count",
    fpp: float = 0.01,
    exact: bool = True,
    num_partitions: int | None = None,
    broadcast_keys_limit: int = 2_000_000,
) -> Dataset:
    """Semi join accelerated by a distributed-built Bloom filter.

    The middle ground between ``semi_anti_join``'s two strategies: the key
    side is too big to broadcast EXACTLY (a set of 10^9 64-bit keys is tens
    of GB with Python overhead) but its Bloom filter is small (10^9 keys at
    1% fpp ≈ 1.2 GB of bits; at 10^7 ≈ 12 MB). Build: one pass over ``keys``
    emitting an m-bit partial per block (bitwise-OR mergeable,
    functions/bloom.py), driver ORs the handful of partials, ``ray.put`` the
    merged filter once. Probe: vectorized membership mask per batch — no
    false negatives, so the pass-through set is a SUPERSET of the true semi
    join.

    ``exact=True`` (default) feeds only the surviving ~(match + fpp·miss)
    rows into the distributed ``left_semi`` hash join — the join's shuffle
    volume drops by the filter's selectivity while the result stays exact.
    ``exact=False`` returns the superset directly (documented fpp) — the
    right trade when a downstream stage tolerates strays.

    ``n_keys_hint`` sizes the filter: an int, ``"count"`` (default — the key
    ROW count, which on a bare parquet read is metadata-only, no scan; a
    safe upper bound on distinct that oversizes the filter when keys repeat
    heavily), or ``"hll"`` (one constant-shuffle HLL pass,
    functions/sketch.py — pay it when the key side is much bigger than its
    distinct set and filter memory matters).

    ``broadcast_keys_limit``: when the size hint says the key side fits a
    broadcast anyway (< limit keys; int64 keys at the 2M default are a
    ~16 MB Arrow array, one plasma copy per node), the Bloom machinery is
    skipped ENTIRELY: per-batch-distinct keys collapse on the driver and a
    zero-shuffle broadcast ``is_in`` filter gives the exact answer. The
    filter build + distributed join only pay off when the key side
    genuinely cannot broadcast — below the limit they are pure fixed cost
    (measured: the bloom path was ~2x a plain broadcast at TPC-H sf0.1).
    """
    import numpy as np

    from rp_extract_ray.functions.bloom import (
        bloom_accumulate,
        bloom_contains,
        bloom_merge,
        bloom_params,
    )

    keys_on = keys_on or on
    key_ds = keys.select_columns([keys_on])
    if n_keys_hint == "count":
        # row count, NOT distinct. Bare read lineages answer from parquet
        # metadata (no scan); a COMPUTED keys lineage would pay a full
        # execution for count() and then a SECOND one in whichever path
        # consumes key_ds below — so materialize the projected key column
        # once instead and count its blocks for free (both paths reuse it)
        try:
            meta = keys._meta_count()
        except Exception:
            meta = None
        if meta is None:
            key_ds = key_ds.materialize()
            meta = key_ds.count()
        n_keys = max(meta, 1)
    elif n_keys_hint == "hll":
        from rp_extract_ray.functions.sketch import approx_distinct

        n_keys = max(approx_distinct(key_ds, keys_on), 1)
    else:
        n_keys = max(int(n_keys_hint), 1)

    if n_keys <= broadcast_keys_limit:
        # exact broadcast collapse: per-batch distinct bounds what reaches
        # the driver by the true distinct count, one ray.put ships the set
        parts = key_ds.map_batches(
            lambda b: pa.table({keys_on: pc.unique(b.column(keys_on))}),
            batch_format="pyarrow",
        ).to_pandas()
        if len(parts) == 0:  # empty key side: typed empty set, all-false mask
            key_arr = pa.array([], type=key_ds.schema().base_schema.field(keys_on).type)
        else:
            key_arr = pc.unique(pa.array(parts[keys_on]))
        ref = ray.put(key_arr)

        def bfilt(batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column(on), value_set=ray.get(ref))
            return batch.filter(mask)

        return big.map_batches(bfilt, batch_format="pyarrow")

    # big key side: one materialize so the TWO consumers below (filter
    # build, exact join) don't replay the key lineage; blocks stay in the
    # object store, never on the driver
    key_ds = key_ds.materialize()
    n_bits, n_hashes = bloom_params(n_keys, fpp)

    def partial(b: pa.Table) -> pa.Table:
        words = bloom_accumulate(
            b.column(keys_on).to_numpy(zero_copy_only=False), n_bits, n_hashes
        )
        return pa.table({"words": pa.array([words.tobytes()], pa.binary())})

    parts = key_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = np.zeros(n_bits // 64, dtype=np.uint64)
    for buf in parts["words"]:
        merged = bloom_merge(merged, np.frombuffer(buf, dtype=np.uint64))
    filt_ref = ray.put(merged)

    def prefilter(batch: pa.Table) -> pa.Table:
        words = ray.get(filt_ref)
        mask = bloom_contains(
            batch.column(on).to_numpy(zero_copy_only=False), words, n_bits, n_hashes
        )
        return batch.filter(pa.array(mask))

    survivors = big.map_batches(prefilter, batch_format="pyarrow")
    if not exact:
        return survivors
    return semi_anti_join(
        survivors, key_ds, on=on, keys_on=keys_on, num_partitions=num_partitions
    )


def hash_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
    right_suffix: str = "_r",
) -> Dataset:
    """Distributed big-big equi-join: BOTH sides hash-partition by key and
    partitions join independently — the path for when neither side fits a
    broadcast (J2/J3 at 100x label-table scale; ``broadcast_join`` remains
    the zero-shuffle choice for genuinely small sides). ``how``: inner /
    left_outer / right_outer / full_outer. Colliding right column names get
    ``right_suffix``. Aggregator sizing note: Ray spawns ``num_partitions``
    join actors at 0.125 CPU each — the default scales with the cluster.
    """
    from rp_extract_ray.stages.partition import arrow_clean

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 2)
    return arrow_clean(left).join(
        arrow_clean(right),
        how,
        num_partitions,
        on=(on,),
        right_on=(right_on or on,),
        right_suffix=right_suffix,
    )


def repartition_join(
    left: Dataset,
    right: Dataset,
    *,
    on: str,
    right_on: str | None = None,
    how: str = "inner",
    num_partitions: int | None = None,
    right_cols: Sequence[str] | None = None,
    size_hint: int | None = None,
    broadcast_limit: int = 0,
) -> Dataset:
    """Distributed equi-join through the repo's own keyed exchange
    (partition.``_add_part`` tag -> union -> ONE ``groupby(PART_COL)``
    shuffle -> vectorized pandas hash-merge per partition) — the
    ``grouped_reduce`` argument applied to joins: Ray's native
    ``Dataset.join`` spawns ``num_partitions`` dedicated join actors whose
    startup (~0.3 s each, measured) dominates small and medium joins
    (np=2 -> 2 s, np=16 -> 5 s, np=32 -> 10 s at sf0.1), while this path
    reuses the ordinary task-based shuffle (~0.5-1.5 s for the same
    inputs) and scales the same way: both sides hash-partition by key,
    partitions merge independently, nothing materializes on the driver.

    ``how``: inner / left_outer / full_outer / semi / anti. For semi/anti
    the right side is projected to bare distinct-per-block keys before the
    exchange and the kernel is an ``isin`` mask — same truth as
    ``semi_anti_join`` without the JoinOperator fixed cost.

    Contracts (documented, not silently broken):
    * non-key column names must be DISJOINT between the sides (the union
      would alias them) — rename upstream, as all pipelines here do;
    * the join key arrives under the LEFT name (right key renamed), like
      Ray's native join;
    * outer nulls follow pandas dtype rules (int + null -> float64):
      fill/cast downstream, or use ``hash_join`` when typed-null columns
      must survive verbatim;
    * ``right_cols``: the right side's column names (pre-rename). Pass it
      when the right lineage is expensive — omitted, it is read from
      ``right.schema()``, which may execute the lineage's first block.

    Null keys follow SQL semantics on every path (exchange and broadcast
    collapse): a null key never matches — inner and semi drop null-key
    left rows, left_outer keeps them with null right values, anti keeps
    them, and null right keys never produce matches (pandas merge alone
    would match NaN == NaN; the right side is null-key-filtered before it
    can).

    ``size_hint``/``broadcast_limit`` (the bloom_semi_join pattern): when
    the caller knows an UPPER BOUND on the right side's rows (typically a
    metadata-only parquet count of its pre-filter source) and it is at or
    under ``broadcast_limit``, the exchange collapses to the zero-shuffle
    broadcast path — distinct keys + ``is_in`` for semi/anti, a
    driver-materialized ``broadcast_join`` for inner/left_outer — which is
    exactly what a planner should pick for a broadcastable side at any
    cluster size. Default limit 0 = never collapse (the caller opts in
    with an honest bound; full_outer never collapses).

    Use ``hash_join`` when the fixed actor cost amortizes (very large
    inputs, many partitions) or full typed-null fidelity matters; use this
    for everything interactive and for join-shaped finals.
    """
    import numpy as np

    from rp_extract_ray.stages.partition import (
        PART_COL,
        _add_part,
        strip_meta,
    )

    right_on = right_on or on
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 2)
    SIDE = "_side"
    semi = how in ("semi", "anti")
    anti = how == "anti"

    if (
        size_hint is not None
        and size_hint <= broadcast_limit
        and how in ("semi", "anti", "inner", "left_outer")
    ):
        if semi:
            # distinct keys collapse: per-batch unique bounds what reaches
            # the driver by the true distinct count; one ray.put, is_in probe
            parts = right.map_batches(
                lambda b: pa.table(
                    {right_on: pc.unique(b.column(right_on)).drop_null()}
                ),
                batch_format="pyarrow",
            ).to_pandas()
            key_arr = pc.unique(pa.array(parts[right_on])) if len(parts) else None
            ref = ray.put(key_arr)

            def bfilt(batch: pa.Table) -> pa.Table:
                ks = ray.get(ref)
                if ks is None:
                    m = pa.array(np.zeros(len(batch), dtype=bool))
                else:
                    m = pc.fill_null(
                        pc.is_in(batch.column(on), value_set=ks), False
                    )
                return batch.filter(pc.invert(m) if anti else m)

            return left.map_batches(bfilt, batch_format="pyarrow")
        # multiplicity-preserving broadcast merge (broadcast_join dedups its
        # small side — right for dimension tables, wrong for a general join)
        small_pdf = right.to_pandas()
        if right_on not in small_pdf.columns:
            # zero-block right side loses its schema entirely; rebuild the
            # declared empty frame so the merge keeps its column contract
            # (same bug as the exchange path's absent-column fix)
            rnames_b = (
                list(right_cols) if right_cols is not None
                else (right.schema().names if right.schema() else [right_on])
            )
            small_pdf = pd.DataFrame({c: pd.Series([]) for c in rnames_b})
        if right_on != on:
            small_pdf = small_pdf.rename(columns={right_on: on})
        small_pdf = small_pdf[small_pdf[on].notna()]  # SQL: nulls never match
        sref = ray.put(small_pdf)
        int_rcols = [
            c for c in small_pdf.columns
            if c != on and small_pdf[c].dtype.kind in "iu"
        ]
        how_b = "left" if how == "left_outer" else "inner"

        def bmerge(b: pa.Table) -> pa.Table:
            merged = b.to_pandas().merge(ray.get(sref), on=on, how=how_b)
            for c in int_rcols:  # same Int64 normalization as the exchange path
                if merged[c].dtype.kind == "f":
                    merged[c] = merged[c].astype("Int64")
            return strip_meta(pa.Table.from_pandas(merged, preserve_index=False))

        return left.map_batches(bmerge, batch_format="pyarrow")

    def tag_left(b: pa.Table) -> pa.Table:
        t = _add_part(strip_meta(b), on, num_partitions, None)
        return t.append_column(SIDE, pa.array(np.ones(len(b), dtype=np.int8)))

    def tag_right(b: pa.Table) -> pa.Table:
        if semi:
            # distinct NON-NULL keys per block (SQL: null keys never match)
            t = pa.table({on: pc.unique(b.column(right_on)).drop_null()})
        else:
            names = [on if c == right_on else c for c in b.column_names]
            t = strip_meta(b).rename_columns(names)
            if how != "full_outer":
                # null right keys can never match; dropping them keeps the
                # pandas merge (which WOULD match NaN == NaN) on SQL
                # semantics. full_outer keeps them — they surface as
                # orphans (split off before the merge in the kernel).
                t = t.filter(pc.is_valid(t.column(on)))
        t = _add_part(t, on, num_partitions, None)
        return t.append_column(SIDE, pa.array(np.zeros(len(t), dtype=np.int8)))

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")
    how_pd = {"inner": "inner", "left_outer": "left", "full_outer": "outer"}.get(how)
    if how_pd is None and not semi:
        raise ValueError(f"repartition_join: unsupported how={how!r}")
    if semi:
        r_value_cols: list[str] = []
    else:
        # the explicit right column set (NOT provenance-guessed from nulls:
        # a legitimately all-null left column in one partition would be
        # misattributed and dropped, drifting the schema across partitions)
        rnames = list(right_cols) if right_cols is not None else right.schema().names
        r_value_cols = [on if c == right_on else c for c in rnames]
        r_value_cols = [c for c in r_value_cols if c != on]

    def merge_group(group: pa.Table) -> pa.Table:
        side = group.column(SIDE).to_numpy()
        group = group.drop_columns([SIDE, PART_COL])
        lmask = pa.array(side == 1)
        ltbl = group.filter(lmask)
        rtbl = group.filter(pa.array(side == 0))
        if semi:
            keys = pc.unique(rtbl.column(on))
            # null probe -> no match: semi drops it, anti keeps it (the
            # native left_anti semantics this path replaced); fill_null
            # makes the invert well-defined
            m = pc.fill_null(pc.is_in(ltbl.column(on), value_set=keys), False)
            out = ltbl.filter(pc.invert(m) if anti else m)
            return strip_meta(out)
        # union-unified schema: each side's missing columns arrive all-null
        # in the other side's rows; split by the declared column sets.
        # Integer columns convert to pandas NULLABLE ints BEFORE the merge:
        # letting the outer merge upcast int64 -> float64 and casting back
        # would silently round values above 2^53 (found via corpus_diff's
        # 64-bit content hashes: a partition with only LEFT orphans kept
        # hash_a exact while hash_b round-tripped through float64, so
        # identical hashes compared unequal). Width-matched nullable dtypes
        # also kill the old cross-partition drift (int32 with vs without
        # orphans) at the source; the merge itself never sees a float.
        def to_pdf(t: pa.Table):
            return t.to_pandas(
                types_mapper=lambda at: (
                    getattr(
                        pd,
                        ("UInt" if pa.types.is_unsigned_integer(at) else "Int")
                        + f"{at.bit_width}Dtype",
                    )()
                    if pa.types.is_integer(at)
                    else None
                )
            )

        lcols = [c for c in group.column_names if c not in r_value_cols]
        lpdf = to_pdf(ltbl.select(lcols))
        rsel = [on, *[c for c in r_value_cols if c in group.column_names]]
        if how == "full_outer":
            # null-key right rows reach here only under full_outer: split
            # them off so the merge cannot pair NaN == NaN, then re-enter
            # the output as right orphans
            valid = pc.is_valid(rtbl.column(on))
            rnull_pdf = to_pdf(rtbl.filter(pc.invert(valid)).select(rsel))
            rtbl = rtbl.filter(valid)
        else:
            rnull_pdf = None
        rpdf = to_pdf(rtbl.select(rsel))
        merged = lpdf.merge(rpdf, on=on, how=how_pd)
        if rnull_pdf is not None and len(rnull_pdf):
            merged = pd.concat([merged, rnull_pdf], ignore_index=True)
        # a ZERO-BLOCK right side never enters the union, so its columns
        # are absent from the unified schema entirely — emit the declared
        # right columns as nulls so outer joins keep their schema contract
        # (found via clustering_coefficient on a triangle-free graph)
        for c in r_value_cols:
            if c not in merged.columns:
                merged[c] = pd.Series(
                    pd.NA, index=merged.index, dtype="object"
                )
        return strip_meta(pa.Table.from_pandas(merged, preserve_index=False))

    unioned = lt.union(rt)
    return unioned.groupby(PART_COL).map_groups(merge_group, batch_format="pyarrow")
