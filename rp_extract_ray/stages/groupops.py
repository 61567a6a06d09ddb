"""Grouped order-statistics operators: per-group top-k and quantiles.

Neither exists in Ray Data's aggregate surface; both are everyday
training-data-pipeline ops (best-N documents per source/domain for curation,
per-language length percentiles for quality cutoffs). Reference analogue:
the reference keeps only global argmax/sort paths (SURVEY.md §2.7); the
per-group forms are the distributed generalization.

Scale design:

* ``grouped_topk`` — map-side prune first: every batch keeps its LOCAL
  per-group top-k (one vectorized sort + groupby-head per batch), so the
  exchange carries at most ``k × groups-per-block`` rows instead of the whole
  table; the final per-group top-k runs inside ``groupby(key).map_groups``.
  Same shape as ``distributed_topk`` (pipelines/relational.py) generalized to
  a keyed exchange.
* ``grouped_quantiles`` — exact quantiles need each group's values
  co-located: ONE hash exchange of just ``(keys, value)`` (columns pruned
  before the shuffle), then a vectorized ``np.quantile`` (linear
  interpolation == SQL ``quantile_cont``) per group. Groups are assumed
  per-key small relative to worker heap (true for categorical keys).
* ``approx_quantiles`` — the sketch escape hatch for when a column (or a
  group) outgrows a worker: two metadata-light passes, (1) global min/max
  aggregate, (2) per-block ``bincount`` partial histograms merged by a
  ``groupby(bin).sum`` whose exchange carries at most ``nbins`` rows per
  block REGARDLESS of data size. Counts merge additively, so the estimate
  is bit-identical under any partitioning (same determinism argument as the
  HLL register-max merge, functions/sketch.py), and the within-bin linear
  interpolation is exactly replicable in SQL — the oracle gates values, not
  just rows. Error bound: one bin width (hi-lo)/nbins per estimate.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd

from ray.data import Dataset


def _local_topk(
    batch: pd.DataFrame,
    group_cols: list[str],
    sort_cols: list[str],
    ascending: list[bool],
    k: int,
) -> pd.DataFrame:
    if len(batch) == 0:
        return batch
    out = batch.sort_values(sort_cols, ascending=ascending, kind="mergesort")
    return out.groupby(group_cols, sort=False).head(k).reset_index(drop=True)


def grouped_topk(
    ds: Dataset,
    group_cols: Sequence[str] | str,
    sort_cols: Sequence[str] | str,
    *,
    descending: Sequence[bool] | bool = True,
    k: int = 10,
) -> Dataset:
    """Top-``k`` rows of every group, ordered by ``sort_cols``.

    ``sort_cols`` should end in a unique tiebreak column for deterministic
    output (the same contract as ``distributed_topk``). Two-phase: per-batch
    local prune, then per-group final select — only pruned partials shuffle.
    """
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    scols = [sort_cols] if isinstance(sort_cols, str) else list(sort_cols)
    if isinstance(descending, bool):
        asc = [not descending] * len(scols)
    else:
        asc = [not d for d in descending]

    from rp_extract_ray.stages.partition import arrow_out

    # declared pyarrow: the pruned partials feed a keyed exchange — a
    # pandas-declared stage would flip that sort to pandas blocks
    pruned = ds.map_batches(
        lambda b: arrow_out(_local_topk(b.to_pandas(), gcols, scols, asc, k)),
        batch_format="pyarrow",
    )

    # final select: ONE keyed exchange co-locating whole groups, then ONE
    # vectorized sort + groupby-head per PARTITION. (groupby().map_groups
    # pays a Python call per group — measured 6 s for 5k groups at sf0.1;
    # this shape is ~constant in group count.)
    from rp_extract_ray.stages.partition import partitioned_apply, stable_hash

    def final(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        return _local_topk(pdf, gcols, scols, asc, k)

    if len(gcols) == 1:
        return partitioned_apply(
            pruned, final, entity_col=gcols[0], order_cols=()
        )

    # multi-column groups: pack a surrogate hash key to partition on; a
    # collision only co-locates two groups — the kernel still groups by the
    # real columns, so results are unaffected
    import pyarrow as pa

    def add_key(b: pa.Table) -> pa.Table:
        h = np.zeros(len(b), dtype=np.uint64)
        for c in gcols:
            h = h * np.uint64(1099511628211) ^ stable_hash(
                b.column(c).to_numpy(zero_copy_only=False)
            )
        return b.append_column("_gkey", pa.array(h.astype(np.int64)))

    keyed = pruned.map_batches(add_key, batch_format="pyarrow")
    out = partitioned_apply(keyed, final, entity_col="_gkey", order_cols=())
    return out.drop_columns(["_gkey"])


def stratified_sample(
    ds: Dataset,
    group_cols: Sequence[str] | str,
    key_col: str,
    n_per_group: int,
    *,
    seed: int = 1,
) -> Dataset:
    """Deterministic fixed-``n`` sample per group: rows ordered by a Knuth
    multiplicative hash of ``key_col`` (same formula as the global
    ``deterministic_sample``, pipelines/relational.py — SQL-replicable),
    first ``n`` kept. Balanced-curation op: same keys win under ANY
    partitioning, so resumed/incremental runs agree. Cost = one
    ``grouped_topk`` (map-side pruned exchange)."""
    import pyarrow as pa

    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)

    def add_hash(b: pa.Table) -> pa.Table:
        k = b.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (
            k.astype(np.uint64) * np.uint64(2654435761)
            + np.uint64(seed) * np.uint64(2654435769)
        ) & np.uint64(0xFFFFFFFF)
        return b.append_column("_h", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    out = grouped_topk(
        hashed, gcols, ["_h", key_col], descending=False, k=n_per_group
    )
    return out.drop_columns(["_h"])


def grouped_quantiles(
    ds: Dataset,
    group_cols: Sequence[str] | str,
    value_col: str,
    quantiles: Sequence[float],
    *,
    out_names: Sequence[str] | None = None,
    round_to: int | None = None,
    method: str = "cont",
) -> Dataset:
    """Exact per-group quantiles of ``value_col``. ``method='cont'`` is
    linear interpolation (DuckDB/Postgres ``quantile_cont`` == default
    ``numpy.quantile``); ``method='disc'`` is the rank-``ceil(q*n)`` element
    (DuckDB ``quantile_disc`` == numpy ``inverted_cdf``). Output: one row
    per group with one column per requested quantile. Prune to
    ``(group_cols, value_col)`` BEFORE the exchange.
    """
    np_method = {"cont": "linear", "disc": "inverted_cdf"}[method]
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    if out_names is None:
        out_names = [f"{value_col}_q{int(round(q * 100)):02d}" for q in quantiles]
    qs = list(quantiles)
    names = list(out_names)

    slim = ds.select_columns([*gcols, value_col])

    def per_group(group: pd.DataFrame) -> pd.DataFrame:
        from rp_extract_ray.functions.rounding import round_half_away

        v = group[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        row = {c: [group[c].iloc[0]] for c in gcols}
        row["n"] = [np.int64(len(v))]
        for q, name in zip(qs, names):
            val = float(np.quantile(v, q, method=np_method)) if len(v) else np.nan
            # half-away, matching DuckDB ROUND (Python round is half-even)
            row[name] = [
                float(round_half_away(val, round_to))
                if round_to is not None
                else val
            ]
        return pd.DataFrame(row)

    return slim.groupby(gcols).map_groups(per_group, batch_format="pandas")


def grouped_mad(
    ds: Dataset,
    group_cols: Sequence[str] | str,
    value_col: str,
    *,
    round_to: int | None = None,
) -> Dataset:
    """Per-group median + median-absolute-deviation (robust dispersion —
    the outlier-tolerant sibling of the reference's std-dev stat,
    SURVEY.md §2.6 A1). Both statistics are order statistics, so a group's
    values must be co-located: ONE hash exchange of ``(keys, value)`` via
    ``groupby().map_groups`` (the ``grouped_quantiles`` shape), then a
    vectorized two-step per group — ``med = median(v)`` and
    ``mad = median(|v - med|)`` (interpolating median == DuckDB
    ``median``/``mad`` on DOUBLE). NaNs dropped; empty group -> NaN.
    Output: one row per group: ``(keys..., n, med, mad)``."""
    gcols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    slim = ds.select_columns([*gcols, value_col])

    def per_group(group: pd.DataFrame) -> pd.DataFrame:
        v = group[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        row = {c: [group[c].iloc[0]] for c in gcols}
        row["n"] = [np.int64(len(v))]
        if len(v):
            med = float(np.median(v))
            mad = float(np.median(np.abs(v - med)))
        else:
            med = mad = np.nan
        if round_to is not None:
            # half-away, matching DuckDB ROUND (Python round is half-even)
            from rp_extract_ray.functions.rounding import round_half_away

            med = float(round_half_away(med, round_to))
            mad = float(round_half_away(mad, round_to))
        row["med"] = [med]
        row["mad"] = [mad]
        return pd.DataFrame(row)

    return slim.groupby(gcols).map_groups(per_group, batch_format="pandas")


def approx_quantiles(
    ds: Dataset,
    value_col: str,
    quantiles: Sequence[float],
    *,
    nbins: int = 256,
    round_to: int | None = None,
) -> pd.DataFrame:
    """Approximate quantiles via a mergeable equi-width histogram sketch.

    Estimator (replicated exactly by the SQL oracle): with ``lo``/``hi`` the
    global min/max and ``w = (hi-lo)/nbins``, value ``v`` lands in bin
    ``min(floor((v-lo)/w), nbins-1)``; for quantile ``q`` the target rank is
    ``r = q*n`` and the estimate is ``lo + w*(b + (r - cum_before_b)/cnt_b)``
    for the first bin ``b`` whose cumulative count reaches ``r``. NaNs are
    dropped. Returns ONE pandas row (bounded driver result): ``n`` plus one
    column per quantile.
    """
    import pyarrow as pa
    from ray.data.aggregate import Max, Min, Sum

    mm = ds.aggregate(Min(value_col), Max(value_col))
    lo = float(mm[f"min({value_col})"])
    hi = float(mm[f"max({value_col})"])
    w = (hi - lo) / float(nbins)

    def hist(b: pa.Table) -> pa.Table:
        v = b.column(value_col).to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        v = v[~np.isnan(v)]
        if w > 0:
            bins = np.minimum(
                np.floor((v - lo) / w).astype(np.int64), nbins - 1
            )
        else:  # degenerate constant column
            bins = np.zeros(len(v), dtype=np.int64)
        h = np.bincount(bins, minlength=nbins)
        return pa.table(
            {
                "bin": pa.array(np.arange(nbins, dtype=np.int64)),
                "cnt": pa.array(h.astype(np.int64)),
            }
        )

    merged = (
        ds.select_columns([value_col])
        .map_batches(hist, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()  # <= nbins rows: bounded driver-side finish
        .sort_values("bin", ignore_index=True)
    )
    cnt = np.zeros(nbins, dtype=np.float64)
    cnt[merged["bin"].to_numpy()] = merged["cnt"].to_numpy(dtype=np.float64)
    cum = np.cumsum(cnt)
    n = float(cum[-1])
    row: dict[str, list] = {"n": [np.int64(n)]}
    for q in quantiles:
        name = f"{value_col}_p{int(round(q * 100)):02d}"
        if n == 0:
            est = np.nan
        elif w == 0:
            est = lo
        else:
            r = q * n
            b = int(np.searchsorted(cum, r, side="left"))
            b = min(b, nbins - 1)
            cum_before = cum[b] - cnt[b]
            est = lo + w * (b + (r - cum_before) / cnt[b])
        if round_to is not None:
            from rp_extract_ray.functions.rounding import round_half_away

            est = float(round_half_away(np.array([est]), round_to)[0])
        row[name] = [est]
    return pd.DataFrame(row)


def grouped_reduce(
    ds: Dataset,
    keys: Sequence[str] | str,
    how: "dict[str, tuple[str, str]]",
    *,
    combine_first: bool = True,
    num_partitions: int | None = None,
    surrogate: bool = False,
) -> Dataset:
    """Distributed keyed reduction without Ray's sort-based aggregate.

    ``how`` maps output column -> (source column, reduction) with reduction
    in {'sum', 'min', 'max', 'count'} (associative, so partial-combine is
    exact). Two stages: (1) per-batch pandas combine (map-side, shrinks the
    exchange to distinct-keys-per-block), (2) ONE hash exchange via
    ``partitioned_apply`` on the key (surrogate FNV mix for multi-key) and a
    vectorized groupby merge per partition.

    Motivation (measured, 32 CPUs, sf0.1-scale): ``groupby().aggregate()``
    costs 3.4-8 s nearly independent of data size — its sort-based
    all-to-all dominates every small/medium aggregation — while this path
    is ~0.35 s for the same reduction. Use Ray's aggregate only when its
    operator fusion matters; use this for interactive-scale finals.

    ``surrogate=True`` forces the int64 surrogate-hash exchange even for a
    single key: the partition sort runs on 8-byte ints instead of the key
    strings (hash collisions are harmless — the merge groups by the REAL
    keys). Measured ~neutral on the 4M-doc n-gram miner (the exchange is
    volume-bound there, not sort-bound); reach for it when keys are much
    longer than 8 bytes AND profiling shows the partition sort dominating.
    """
    import pyarrow as pa

    from rp_extract_ray.stages.partition import partitioned_apply, stable_hash

    klist = [keys] if isinstance(keys, str) else list(keys)

    def spec_after_combine():
        # after stage 1 the data column is the OUTPUT name; count becomes sum
        return {
            out: (out, "sum" if red == "count" else red)
            for out, (src, red) in how.items()
        }

    def agg(pdf: pd.DataFrame, spec) -> pd.DataFrame:
        # dropna=False: null keys form a group, matching the Ray aggregate
        # this path replaces (pandas default would silently drop those rows)
        g = pdf.groupby(klist, sort=False, dropna=False)
        cols = {}
        for out, (src, red) in spec.items():
            if red == "count":
                cols[out] = g[src].size()
            else:
                cols[out] = getattr(g[src], red)()
        res = pd.DataFrame(cols).reset_index()
        return res

    # map-side combine runs on pyarrow's C++ hash aggregate, not pandas:
    # measured 6x per block (1.20 s -> 0.2 s over the sf0.1 events pairs),
    # and it is the stage every block of the input passes through. Arrow's
    # semantics match the pandas final agg: null keys form a group
    # (= dropna=False), count_all counts rows including null values
    # (= g.size()), sum/min/max skip nulls, and an all-null group's null
    # partial re-aggregates to the same final as pandas' (sum: NaN adds as
    # 0; min/max: NaN ignored). Sums upcast (float32->double, int->int64)
    # which only widens the partials the final stage re-reduces.
    def combine_block(b: pa.Table) -> pa.Table:
        specs, named = [], []
        need_count = False
        for out, (src, red) in how.items():
            if red == "count":
                need_count = True
            elif (src, red) not in named:
                named.append((src, red))
                specs.append((src, red))
        if need_count:
            specs.append(([], "count_all"))
        r = b.select(
            klist + sorted({s for s, _ in named if s not in klist})
        ).group_by(klist, use_threads=False).aggregate(specs)
        cols = {k: r.column(k) for k in klist}
        for out, (src, red) in how.items():
            cols[out] = r.column(
                "count_all" if red == "count" else f"{src}_{red}"
            )
        return pa.table(cols)

    parts = (
        ds.map_batches(combine_block, batch_format="pyarrow")
        if combine_first
        else ds
    )
    final_spec = spec_after_combine() if combine_first else dict(how)

    if len(klist) == 1 and not surrogate:
        return partitioned_apply(
            parts,
            lambda pdf, starts: agg(pdf, final_spec),
            entity_col=klist[0],
            order_cols=(),
            num_partitions=num_partitions or 32,
        )

    def add_gkey(b: pa.Table) -> pa.Table:
        h = np.zeros(len(b), dtype=np.uint64)
        for c in klist:
            h = h * np.uint64(1099511628211) ^ stable_hash(
                b.column(c).to_numpy(zero_copy_only=False)
            )
        return b.append_column("_gkey", pa.array(h.astype(np.int64)))

    keyed = parts.map_batches(add_gkey, batch_format="pyarrow")
    out = partitioned_apply(
        keyed,
        lambda pdf, starts: agg(pdf, final_spec),
        entity_col="_gkey",
        order_cols=(),
        num_partitions=num_partitions or 32,
    )
    return out


def grouped_mode(
    ds: Dataset,
    key: str,
    val: str,
    *,
    out_name: str | None = None,
    count_name: str = "n",
    num_partitions: int | None = None,
) -> Dataset:
    """Exact per-group MODE (most frequent value) with a deterministic
    tie-break: highest count first, then the smallest value.

    Everyday curation op (dominant event type per user, dominant language
    per source) with no Ray Data aggregate. Scale shape: ONE exchange,
    keyed by ``key`` alone — each block first collapses to its local
    (key, val) pair counts with pyarrow's C++ hash aggregate (measured 6×
    the per-block pandas groupby; a two-exchange grouped_reduce variant
    measured 3.3 s vs ~1.2 s for this at sf0.1), so the exchange carries
    distinct-pairs-per-block, never raw rows; the partition task merges
    pair counts and takes the per-key argmax vectorized. Reference
    analogue: none (the reference's only categorical reduction is the
    class-count table, classes_io.py per SURVEY.md §2.7); this is the
    distributed generalization.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from rp_extract_ray.stages.partition import partitioned_apply

    out_name = out_name or f"mode_{val}"

    def local_counts(b: pa.Table) -> pa.Table:
        t = b.select([key, val]).group_by([key, val], use_threads=False)
        t = t.aggregate([([], "count_all")])
        return t.rename_columns([key, val, count_name])

    counts = ds.map_batches(local_counts, batch_format="pyarrow")

    def pick(pdf: pd.DataFrame, starts) -> pd.DataFrame:
        # merge per-block partials, then argmax with the deterministic
        # (count desc, value asc) tie-break — all vectorized
        g = (
            pdf.groupby([key, val], sort=False, dropna=False)[count_name]
            .sum()
            .reset_index()
        )
        g = g.sort_values(
            [key, count_name, val],
            ascending=[True, False, True],
            kind="stable",
        )
        top = g.drop_duplicates(subset=[key], keep="first")
        return top.rename(columns={val: out_name})[[key, out_name, count_name]]

    return partitioned_apply(
        counts,
        pick,
        entity_col=key,
        order_cols=(),
        num_partitions=num_partitions or 32,
    )


def grouped_corr(
    ds: Dataset,
    keys: "Sequence[str] | str",
    x: str,
    y: str,
    *,
    out_name: str = "corr",
    round_to: int | None = 6,
    num_partitions: int | None = None,
) -> Dataset:
    """Exact per-group Pearson correlation of two numeric columns via
    additive moment partials (n, Σx, Σy, Σxy, Σx², Σy²).

    The moments are associative sums, so :func:`grouped_reduce`'s map-side
    combine makes the exchange carry six numbers per distinct key per block
    regardless of row count; the closed form
    ``(nΣxy − ΣxΣy) / sqrt((nΣx² − (Σx)²)(nΣy² − (Σy)²))`` is algebraically
    identical for the sample and population conventions (the 1/(n−1)
    factors cancel), so it matches SQL ``corr``. Degenerate groups (n < 2
    or zero variance in either column) yield NULL, matching SQL. Rounded to
    ``round_to`` decimals half-away-from-zero (SQL ROUND) so float-sum
    ordering noise can't flip an oracle hash; pass ``round_to=None`` for
    raw doubles.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    klist = [keys] if isinstance(keys, str) else list(keys)

    def moments(b: pa.Table) -> pa.Table:
        xf = pc.cast(b.column(x), pa.float64())
        yf = pc.cast(b.column(y), pa.float64())
        t = b.select(klist)
        t = t.append_column("_x", xf)
        t = t.append_column("_y", yf)
        t = t.append_column("_xy", pc.multiply(xf, yf))
        t = t.append_column("_xx", pc.multiply(xf, xf))
        t = t.append_column("_yy", pc.multiply(yf, yf))
        return t

    red = grouped_reduce(
        ds.select_columns(klist + [x, y]).map_batches(
            moments, batch_format="pyarrow"
        ),
        klist,
        {
            "_n": ("_x", "count"),
            "_sx": ("_x", "sum"),
            "_sy": ("_y", "sum"),
            "_sxy": ("_xy", "sum"),
            "_sxx": ("_xx", "sum"),
            "_syy": ("_yy", "sum"),
        },
        num_partitions=num_partitions,
    )

    def finish(b: pa.Table) -> pa.Table:
        from rp_extract_ray.functions.rounding import round_half_away

        n = b.column("_n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = b.column("_sx").to_numpy(zero_copy_only=False)
        sy = b.column("_sy").to_numpy(zero_copy_only=False)
        sxy = b.column("_sxy").to_numpy(zero_copy_only=False)
        sxx = b.column("_sxx").to_numpy(zero_copy_only=False)
        syy = b.column("_syy").to_numpy(zero_copy_only=False)
        cov = n * sxy - sx * sy
        vx = n * sxx - sx * sx
        vy = n * syy - sy * sy
        with np.errstate(invalid="ignore", divide="ignore"):
            denom = np.sqrt(vx * vy)
            c = cov / denom
        valid = (n >= 2) & (denom > 0) & np.isfinite(c)
        if round_to is not None:
            c = np.where(valid, round_half_away(np.where(valid, c, 0.0), round_to), c)
        arr = pa.array(c, type=pa.float64(), mask=~valid)
        return b.select(klist).append_column(out_name, arr)

    return red.map_batches(finish, batch_format="pyarrow")


def grouped_reduce_join(
    ds: Dataset,
    key: str,
    how: "dict[str, tuple[str, str]]",
    side: Dataset,
    *,
    side_on: str | None = None,
    side_cols: Sequence[str],
    join: str = "inner",
    num_partitions: int = 32,
) -> Dataset:
    """``grouped_reduce(ds, key, how)`` ⨝ ``side`` on ``key`` — fused into
    ONE keyed exchange. The side table's rows are tagged with the SAME
    hash partitioner and ride the same shuffle (partition.partitioned_apply
    ``side=``), so each partition reduces its data rows and immediately
    merges its co-located side rows: two exchanges' worth of work for one
    exchange's fixed cost (~2-2.5 s per exchange at 32 CPUs, measured —
    the dominant term of every join-shaped final at bench scale, and at
    cluster scale one fewer all-to-all over the reduced table).

    Exact when the side's non-key columns are what a post-reduce join
    would attach (one fewer shuffle, same dataflow as TPC-H Q3's
    "group lineitem revenue by orderkey, then attach order attributes").
    ``join``: inner / left / right (left = keep reduced groups with no
    side row, dropping side orphans; right = keep EVERY side row — the
    "spine" join, e.g. TPC-H Q13's all-customers-even-with-zero-orders —
    dropping unmatched groups; use ``repartition_join`` for full outer).
    Single key column only: the fusion trades generality for the
    exchange count."""
    import pyarrow as pa

    from rp_extract_ray.stages.partition import (
        PART_COL,
        partitioned_apply,
        stable_hash,
    )

    import pyarrow.compute as pc

    if join not in ("inner", "left", "right"):
        raise ValueError(f"grouped_reduce_join: unsupported join={join!r}")
    side_on = side_on or key

    # stage 1: per-block map-side combine on pyarrow's C++ hash aggregate
    # (same kernel shape as grouped_reduce's stage 1; single-key variant)
    specs = {out: (src, red) for out, (src, red) in how.items()}

    def combine_block(b: pa.Table) -> pa.Table:
        aggs, named = [], []
        need_count = False
        for out, (src, red) in specs.items():
            if red == "count":
                need_count = True
            elif (src, red) not in named:
                named.append((src, red))
                aggs.append((src, red))
        if need_count:
            aggs.append(([], "count_all"))
        r = b.select(
            [key] + sorted({s for s, _ in named if s != key})
        ).group_by([key], use_threads=False).aggregate(aggs)
        cols = {key: r.column(key)}
        for out, (src, red) in specs.items():
            cols[out] = r.column(
                "count_all" if red == "count" else f"{src}_{red}"
            )
        return pa.table(cols)

    parts = ds.map_batches(combine_block, batch_format="pyarrow")
    final_spec = {
        out: (out, "sum" if red == "count" else red)
        for out, (src, red) in specs.items()
    }

    def tag_side(b: pa.Table) -> pa.Table:
        cols = {key: b.column(side_on)}
        for c in side_cols:
            cols[c] = b.column(c)
        t = pa.table(cols)
        # null side keys never match (SQL join semantics; the pandas merge
        # below would pair NaN == NaN with the null-key GROUP otherwise)
        t = t.filter(pc.is_valid(t.column(key)))
        h = stable_hash(t.column(key).to_numpy(zero_copy_only=False))
        part = (h % np.uint64(num_partitions)).astype(np.int32)
        return t.append_column(PART_COL, pa.array(part, pa.int32()))

    tagged = side.map_batches(tag_side, batch_format="pyarrow")

    def fin(pdf: pd.DataFrame, starts: np.ndarray, side_pdf: pd.DataFrame) -> pd.DataFrame:
        g = pdf.groupby(key, sort=False, dropna=False)
        cols = {}
        for out, (src, red) in final_spec.items():
            cols[out] = getattr(g[src], red)()
        agg = pd.DataFrame(cols).reset_index()
        return agg.merge(side_pdf, on=key, how=join)

    return partitioned_apply(
        parts, fin, entity_col=key, order_cols=(),
        num_partitions=num_partitions, side=tagged, side_cols=tuple(side_cols),
    )


def grouped_string_agg(
    ds: Dataset,
    key: str,
    val: str,
    *,
    order_cols: Sequence[str] = (),
    sep: str = "|",
    out_name: str | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Per-group ordered string concatenation (SQL ``string_agg(val, sep
    ORDER BY ...)``) — the collect-list/path-assembly op behind user-journey
    mining and per-conversation prompt assembly; no Ray Data aggregate
    exists for it and the reference's only concatenation is driver-side
    feature hstack (rp_feature_io.py concatenate_features, SURVEY §2.3 M22).

    Scale shape: ONE hash exchange keyed by ``key`` (partitioned_apply
    sorts each partition by ``(key, *order_cols)``), then a per-partition
    pandas groupby join. The join-per-group is irreducibly per-group work —
    the output string must be materialized — but everything reaching it is
    one exchange of just ``(key, order_cols, val)`` with columns pruned by
    the caller. Groups are assumed worker-heap-bounded (same contract as
    grouped_quantiles)."""
    from rp_extract_ray.stages.partition import partitioned_apply

    out_name = out_name or f"{val}_path"

    def agg(pdf: pd.DataFrame, starts) -> pd.DataFrame:
        # SQL string_agg skips NULL values but keeps the group (an all-null
        # group aggregates to NULL); ''.join would TypeError on None instead
        g = pdf.groupby(key, sort=False, dropna=False)[val].agg(
            lambda s: sep.join(s.dropna()) if s.notna().any() else None
        )
        return g.reset_index().rename(columns={val: out_name})

    return partitioned_apply(
        ds,
        agg,
        entity_col=key,
        order_cols=tuple(order_cols),
        num_partitions=num_partitions or 32,
    )


def cooccurrence_pairs(
    ds: Dataset,
    key: str,
    item: str,
    *,
    out_names: "tuple[str, str]" = ("item1", "item2"),
    count_name: str = "n",
    num_partitions: int | None = None,
) -> Dataset:
    """Within-group item co-occurrence counts (market-basket shape): for
    every unordered pair of DISTINCT items appearing under the same key,
    count how many keys contain both. SQL shape: distinct (key, item)
    self-joined on key with ``item1 < item2``. Reference analogue: none —
    the nearest is the transition matrix (stages/lag.py), which counts
    ORDERED adjacent pairs; this is the set-co-membership complement.

    Scale: per-block arrow distinct shrinks stage 1 to distinct pairs per
    block; ONE keyed exchange co-locates each key's items; the in-partition
    self-merge is pandas' C hash join whose output is bounded by
    sum(items_per_key^2) — safe while per-key item cardinality is small
    (event vocabularies, tags, SKU baskets), which is the op's domain. The
    final reduction is a second exchange bounded by the pair vocabulary.
    """
    import pyarrow as pa

    from rp_extract_ray.stages.partition import partitioned_apply

    i1, i2 = out_names

    def local_distinct(b: pa.Table) -> pa.Table:
        t = b.select([key, item]).group_by([key, item], use_threads=False)
        return t.aggregate([]).rename_columns([key, item])

    pairs_in = ds.map_batches(local_distinct, batch_format="pyarrow")

    def explode(pdf: pd.DataFrame, starts) -> pd.DataFrame:
        # global per-key distinct (blocks may repeat a pair), then the
        # C-level self-merge; the i1 < i2 filter halves + dedups pairs
        d = pdf[[key, item]].drop_duplicates()
        m = d.merge(d, on=key, suffixes=("_a", "_b"))
        m = m[m[f"{item}_a"] < m[f"{item}_b"]]
        g = (
            m.groupby([f"{item}_a", f"{item}_b"], sort=False)
            .size()
            .reset_index(name=count_name)
        )
        return g.rename(columns={f"{item}_a": i1, f"{item}_b": i2})

    partial = partitioned_apply(
        pairs_in,
        explode,
        entity_col=key,
        order_cols=(),
        num_partitions=num_partitions or 32,
    )
    out = grouped_reduce(
        partial, [i1, i2], {count_name: (count_name, "sum")},
        combine_first=False, num_partitions=num_partitions,
    )

    def fin(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.column_names.index(count_name),
            count_name,
            b.column(count_name).cast(pa.int64()),
        )

    return out.map_batches(fin, batch_format="pyarrow")


def grouped_entropy(
    ds: Dataset,
    group_col: str,
    item_col: str,
    *,
    out_col: str = "entropy",
    round_to: int | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Shannon entropy (nats) of the categorical ``item_col`` distribution
    per ``group_col`` — the behavioral-diversity feature (a transcript
    pipeline scores each conversation's role/tool mix with exactly this).
    Computed as ``H = ln(N) - sum(n_i * ln(n_i)) / N`` over per-item counts
    (algebraically equal to ``-sum(p_i ln p_i)`` but built from integer
    counts only, so engine and SQL oracle evaluate the identical float
    expression). NULL items count as their own category (SQL GROUP BY
    semantics).

    Scale design: per-block pandas value-counts collapse each block to
    distinct (group, item, n) partials; ONE keyed exchange on the group
    (``partitioned_apply``) merges counts and folds to one row per group.
    """
    import pandas as pd

    from rp_extract_ray.stages.partition import (
        DEFAULT_NUM_PARTITIONS,
        partitioned_apply,
    )

    def partial(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) == 0:
            return pd.DataFrame({group_col: [], item_col: [], "_n": []})
        out = (
            pdf.groupby([group_col, item_col], sort=False, dropna=False)
            .size()
            .rename("_n")
            .reset_index()
        )
        out["_n"] = out["_n"].astype(np.int64)
        return out

    def merge(pdf: "pd.DataFrame", starts) -> "pd.DataFrame":
        if len(pdf) == 0:
            return pd.DataFrame({group_col: [], "n": [], out_col: []})
        c = (
            pdf.groupby([group_col, item_col], sort=False, dropna=False)["_n"]
            .sum()
            .reset_index()
        )
        n = c["_n"].to_numpy(dtype=np.float64)
        work = pd.DataFrame(
            {
                group_col: c[group_col].to_numpy(),
                "n": c["_n"].to_numpy(),
                "_nlogn": n * np.log(n),
            }
        )
        g = work.groupby(
            group_col, sort=False, dropna=False
        ).sum().reset_index()
        tot = g["n"].to_numpy(dtype=np.float64)
        h = np.log(tot) - g["_nlogn"].to_numpy() / tot
        if round_to is not None:
            from rp_extract_ray.functions.rounding import round_half_away

            h = round_half_away(h, round_to)
        return pd.DataFrame(
            {group_col: g[group_col], "n": g["n"].astype(np.int64),
             out_col: h}
        )

    from rp_extract_ray.stages.partition import arrow_out

    parts = ds.select_columns([group_col, item_col]).map_batches(
        lambda b: arrow_out(partial(b.to_pandas())), batch_format="pyarrow"
    )
    return partitioned_apply(
        parts, merge, entity_col=group_col, order_cols=(item_col,),
        num_partitions=num_partitions or DEFAULT_NUM_PARTITIONS,
    )
