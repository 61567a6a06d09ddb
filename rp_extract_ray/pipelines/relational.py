"""Relational queries over the driver testdata tables.

Coverage of the reference's table operations (SURVEY.md §2.5/§2.6/§2.8):
groupby-count (A3), HAVING-filter (A5), baseline share (A4), duplicate check
(A6), exact dedup, broadcast inner join (J2/J3), semi/anti join (J1/J4/J5),
multi-hop dimension join, top-k (§2.7). Column names match the DuckDB oracle
SQL; non-associative float aggregates are rounded on both sides."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Mean, Min, Sum

from rp_extract_ray.stages.join import broadcast_join, semi_anti_join


def _read(sf_dir: str, table: str, columns=None) -> Dataset:
    from rp_extract_ray.sources.pqio import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{table}.parquet", columns=columns)


def _round_cols(ds: Dataset, cols: dict[str, int]) -> Dataset:
    from rp_extract_ray.functions.rounding import round_half_away

    def f(b: pa.Table) -> pa.Table:
        for c, nd in cols.items():
            v = round_half_away(b.column(c).to_numpy(zero_copy_only=False), nd)
            b = b.set_column(b.column_names.index(c), c, pa.array(v))
        return b

    return ds.map_batches(f, batch_format="pyarrow")


def q_class_counts(sf_dir: str) -> Dataset:
    """A3: /root/reference/classes_io.py:475-491."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    return grouped_reduce(
        _read(sf_dir, "documents", ["lang"]), "lang", {"n": ("lang", "count")}
    )


def q_min_instances(sf_dir: str, min_n: int = 50) -> Dataset:
    """A5: HAVING count >= N (/root/reference/classes_io.py:445-472)."""
    counts = q_class_counts(sf_dir)
    return counts.map_batches(
        lambda b: b.filter(pc.greater_equal(b.column("n"), min_n)),
        batch_format="pyarrow",
    )


def q_baseline(sf_dir: str):
    """A4: majority-class share (/root/reference/classes_io.py:507-517)."""
    import pandas as pd

    counts = q_class_counts(sf_dir).to_pandas()
    n_total = int(counts["n"].sum())
    n_max = int(counts["n"].max())
    return pd.DataFrame(
        {"n_total": [n_total], "n_max": [n_max], "baseline": [round(n_max / n_total, 6)]}
    )


def q_dup_check(sf_dir: str) -> Dataset:
    """A6: duplicate-key detection (/root/reference/rp_feature_io.py:274-284)."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    g = grouped_reduce(
        _read(sf_dir, "documents", ["lang", "source"]),
        ["lang", "source"],
        {"n": ("lang", "count")},
    )
    return g.map_batches(
        lambda b: b.filter(pc.greater(b.column("n"), 1)), batch_format="pyarrow"
    )


def q_dedup_exact(sf_dir: str) -> Dataset:
    """Exact dedup: first (min doc_id) per identical text (SURVEY.md §2.8).

    Groups by a 64-bit CONTENT HASH, not the text itself — the shuffle
    carries one int64 per row instead of the payload (the text-keyed
    groupby was the one payload-through-the-exchange left in the engine).
    The SQL oracle groups by text; a hash collision would diverge, at
    ~1e-11 probability for these cardinalities."""
    from rp_extract_ray.stages.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = exact_dedup(ds, text_col="text", id_col="doc_id")
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_dups"]).rename_columns(["doc_id", "n"]),
        batch_format="pyarrow",
    )



def _partial_groupby(ds: Dataset, keys: list[str], sums: dict[str, str], count_col: str | None):
    """Map-side combine before the shuffle: each batch pre-aggregates to one
    row per key, so the groupby exchange carries O(distinct keys x blocks)
    rows instead of the full table (the brief's pre-aggregate pattern).
    ``sums`` maps output column -> source column; ``count_col`` adds a row
    count. Returns the final combined Dataset."""
    import pandas as pd

    from rp_extract_ray.stages.groupops import grouped_reduce

    how = {out_col: (src, "sum") for out_col, src in sums.items()}
    if count_col:
        how[count_col] = (keys[0], "count")
    return grouped_reduce(ds, keys, how)


def q_tpch_q1(sf_dir: str) -> Dataset:
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def add_rev(b: pa.Table) -> pa.Table:
        rev = pc.multiply(b.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), b.column("l_discount")))
        return b.append_column("revenue", rev)

    ds = ds.map_batches(add_rev, batch_format="pyarrow")
    out = _partial_groupby(
        ds, ["l_returnflag", "l_linestatus"],
        {"sum_qty": "l_quantity", "sum_revenue": "revenue", "_sum_disc": "l_discount"},
        "n",
    )

    def finish(b: pa.Table) -> pa.Table:
        avg = pc.divide(b.column("_sum_disc"), pc.cast(b.column("n"), pa.float64()))
        return b.drop_columns(["_sum_disc"]).append_column("avg_disc", avg)

    out = out.map_batches(finish, batch_format="pyarrow")
    return _round_cols(out, {"sum_qty": 2, "sum_revenue": 2, "avg_disc": 6})


def q_tpch_q6(sf_dir: str):
    """TPC-H Q6 shape (filter + global sum): one column-pruned read, a
    vectorized Arrow filter, per-block partial revenue sums, one tiny
    final aggregate — nothing but the filtered revenue column ever moves."""
    import datetime as _dt

    import pandas as pd

    from ray.data.aggregate import Sum as _Sum

    ds = _read(
        sf_dir, "lineitem",
        ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo = pa.scalar(_dt.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1997, 1, 1), type=pa.timestamp("us"))

    def rev(b: pa.Table) -> pa.Table:
        ship, disc = b.column("l_shipdate"), b.column("l_discount")
        m = pc.and_(
            pc.and_(pc.greater_equal(ship, lo), pc.less(ship, hi)),
            pc.and_(
                pc.and_(
                    pc.greater_equal(disc, pa.scalar(0.05)),
                    pc.less_equal(disc, pa.scalar(0.07)),
                ),
                pc.less(b.column("l_quantity"), pa.scalar(24.0)),
            ),
        )
        f = b.filter(m)
        r = pc.multiply(f.column("l_extendedprice"), f.column("l_discount"))
        # per-block partial: one float64 per block crosses to the driver
        return pa.table({"rev": pa.array([pc.sum(r).as_py() or 0.0], pa.float64())})

    total = ds.map_batches(rev, batch_format="pyarrow").aggregate(_Sum("rev"))
    return pd.DataFrame({"revenue": [round(float(total["sum(rev)"]), 2)]})


def q_tpch_q3(
    sf_dir: str, segment: str = "BUILDING", cutoff: str = "1996-06-30", k: int = 10
):
    """TPC-H Q3 shape (3-way join + grouped sum + top-k). Shuffle-minimal
    plan: revenue pre-aggregates to ONE row per orderkey BEFORE the join
    (o_orderdate/o_orderpriority are functionally dependent on the key, so
    grouping early is exact and cuts join volume by the lineitems-per-order
    factor), the segment semi-filter runs on the orders side in parallel,
    one repartition join attaches the order attributes, and the top-k is
    the per-block-partial merge (no global sort). Composite pipeline gate
    over J1/J2/A-family/§2.7 primitives."""
    import datetime as _dt

    from rp_extract_ray.stages.groupops import grouped_reduce_join
    from rp_extract_ray.stages.join import repartition_join

    cut = pa.scalar(
        _dt.datetime.fromisoformat(cutoff), type=pa.timestamp("us")
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), segment)).select(
            ["c_custkey"]
        ),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"), cut)),
        batch_format="pyarrow",
    )
    # metadata-only upper bound on the key side (pre-filter customer rows):
    # under the broadcast budget the semi collapses to a zero-shuffle probe
    hint = _read(sf_dir, "customer", ["c_custkey"])._meta_count()
    orders = repartition_join(
        orders, cust, on="o_custkey", right_on="c_custkey", how="semi",
        size_hint=hint, broadcast_limit=2_000_000,
    ).drop_columns(["o_custkey"])

    def rev(b: pa.Table) -> pa.Table:
        f = b.filter(pc.greater(b.column("l_shipdate"), cut))
        r = pc.multiply(
            f.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), f.column("l_discount")),
        )
        return pa.table({"l_orderkey": f.column("l_orderkey"), "rev": r})

    line = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(rev, batch_format="pyarrow")

    joined = grouped_reduce_join(
        line, "l_orderkey", {"revenue": ("rev", "sum")},
        side=orders, side_on="o_orderkey",
        side_cols=["o_orderdate", "o_orderpriority"],
    )
    agg = _round_cols(joined, {"revenue": 2})
    agg = agg.select_columns(
        ["l_orderkey", "o_orderdate", "o_orderpriority", "revenue"]
    )
    return distributed_topk(agg, ["revenue", "l_orderkey"], [True, False], k)


def q_join_agg(sf_dir: str) -> Dataset:
    """Broadcast inner join orders->customer (J2/J3 analogue) + aggregate.
    The small side is read driver-side with pyarrow (a dimension table does
    not need a Ray job of its own)."""
    import pyarrow.parquet as pq

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).to_pandas()
    joined = broadcast_join(
        orders, cust, on="o_custkey", small_on="c_custkey", value_cols=["c_mktsegment"]
    )
    out = _partial_groupby(
        joined, ["c_mktsegment"], {"total": "o_totalprice"}, "n_orders"
    )
    return _round_cols(out, {"total": 2})


def q_semi_join(sf_dir: str) -> Dataset:
    """J1/J5: customers having orders — DISTRIBUTED hash semi join (the key
    side stays a Dataset; nothing materializes on the driver)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    keys = _read(sf_dir, "orders", ["o_custkey"])
    return semi_anti_join(cust, keys, on="c_custkey", keys_on="o_custkey", anti=False)


def q_bloom_semi_join(sf_dir: str) -> Dataset:
    """Same truth as ``semi_join``, through the Bloom-prefiltered path
    (stages/join.bloom_semi_join): distributed OR-merged filter build,
    broadcast probe, exact left_semi join on the survivors. Gates that the
    prefilter never drops a true match under any partitioning."""
    from rp_extract_ray.stages.join import bloom_semi_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    keys = _read(sf_dir, "orders", ["o_custkey"])
    return bloom_semi_join(cust, keys, on="c_custkey", keys_on="o_custkey")


def q_anti_join(sf_dir: str) -> Dataset:
    """J4 resume primitive: customers with no high-value (>400k) order
    (/root/reference/rp_extract_batch.py:241-264)."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    keys = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: b.filter(pc.greater(b.column("o_totalprice"), 400000.0)),
        batch_format="pyarrow",
    )
    return semi_anti_join(cust, keys, on="c_custkey", keys_on="o_custkey", anti=True)


def _rename_on(ds: Dataset, mapping: dict[str, str]) -> Dataset:
    def f(b: pa.Table) -> pa.Table:
        return b.rename_columns([mapping.get(n, n) for n in b.column_names])

    return ds.map_batches(f, batch_format="pyarrow")


def q_region_customers(sf_dir: str) -> Dataset:
    """Multi-hop broadcast dimension join: region <- nation <- customer."""
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]).to_pandas()
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    joined = broadcast_join(
        cust, dim[["n_nationkey", "r_name"]], on="c_nationkey", small_on="n_nationkey",
        value_cols=["r_name"],
    )
    return joined.groupby("r_name").aggregate(Count(alias_name="n_customers"))


def q_distinct(sf_dir: str) -> "pd.DataFrame":
    """§2.8 set op: distinct-key counts WITHOUT driver materialization.

    ``Dataset.unique`` pulls every distinct key to the driver; at 100x key
    cardinality that is a scale-killer. Instead: distributed
    ``groupby(col).aggregate(Count)`` (map-side combine + one shuffle keyed
    by the column) and ``.count()`` the grouped rows — only the final int
    reaches the driver."""
    import pandas as pd

    from rp_extract_ray.stages.groupops import grouped_reduce

    n_cust = grouped_reduce(
        _read(sf_dir, "orders", ["o_custkey"]),
        "o_custkey", {"n": ("o_custkey", "count")},
    ).count()
    n_part = grouped_reduce(
        _read(sf_dir, "lineitem", ["l_partkey"]),
        "l_partkey", {"n": ("l_partkey", "count")},
    ).count()
    return pd.DataFrame({"n_custkeys": [int(n_cust)], "n_partkeys": [int(n_part)]})


def q_hll_distinct(sf_dir: str) -> "pd.DataFrame":
    """Approximate distinct customer count via the HyperLogLog sketch
    (constant shuffle volume: one 4 KiB register row per block) alongside
    the exact distributed count. Oracle: the same estimate recomputed by an
    independent single-process HLL embedded as a literal (deterministic —
    the sketch's value is fixed by the hash spec), gating that the
    distributed register-max merge is exact across any partitioning."""
    import pandas as pd

    from rp_extract_ray.functions.sketch import approx_distinct

    ds = _read(sf_dir, "orders", ["o_custkey"])
    est = approx_distinct(ds, "o_custkey", p=12)
    exact = ds.groupby("o_custkey").aggregate(Count(alias_name="n")).count()
    return pd.DataFrame(
        {"n_custkeys_hll": [int(est)], "n_custkeys_exact": [int(exact)]}
    )


def q_topk(sf_dir: str, k: int = 10) -> "pd.DataFrame":
    """§2.7 top-k via per-block partials + tiny merge (no global sort)."""
    return distributed_topk(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        ["o_totalprice", "o_orderkey"], [True, False], k,
    )


def q_topk_per_group(sf_dir: str, k: int = 3) -> Dataset:
    """Per-group top-k (stages/groupops.py): the 3 highest-value orders of
    every order priority, deterministic tiebreak by orderkey. Oracle:
    ``row_number() OVER (PARTITION BY ...) <= k``."""
    from rp_extract_ray.stages.groupops import grouped_topk

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    out = grouped_topk(
        ds, "o_orderpriority", ["o_totalprice", "o_orderkey"],
        descending=[True, False], k=k,
    )
    return out.select_columns(["o_orderpriority", "o_orderkey", "o_totalprice"])


def q_group_quantiles(sf_dir: str) -> Dataset:
    """Exact per-language text-length percentiles (stages/groupops.py) — the
    quality-cutoff op of a curation pipeline. Oracle: ``quantile_cont``."""
    import pandas as pd

    from rp_extract_ray.stages.groupops import grouped_quantiles

    ds = _read(sf_dir, "documents", ["lang", "text"])

    def to_len(b: pa.Table) -> pa.Table:
        n = pc.utf8_length(b.column("text")).cast(pa.float64())
        return pa.table({"lang": b.column("lang"), "len": n})

    slim = ds.map_batches(to_len, batch_format="pyarrow")
    return grouped_quantiles(
        slim, "lang", "len", [0.25, 0.5, 0.9], round_to=6
    ).select_columns(["lang", "n", "len_q25", "len_q50", "len_q90"])


def q_approx_quantiles(sf_dir: str) -> "pd.DataFrame":
    """Histogram-sketch quantiles of l_extendedprice (stages/groupops.py
    approx_quantiles): constant shuffle volume (<= nbins rows per block) at
    any data size — the 100-TB path the exact per-group quantile op can't
    take. Oracle: the SAME estimator in SQL (bin floor, double cumsum in bin
    order, within-bin interpolation) — values gated, not just rows."""
    from rp_extract_ray.stages.groupops import approx_quantiles

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    out = approx_quantiles(
        ds, "l_extendedprice", [0.5, 0.9, 0.99], nbins=256, round_to=6
    )
    return out[
        ["n", "l_extendedprice_p50", "l_extendedprice_p90", "l_extendedprice_p99"]
    ]


def q_stratified_sample(sf_dir: str, n: int = 20, seed: int = 1) -> Dataset:
    """Deterministic n-per-group sample of orders by priority
    (stages/groupops.stratified_sample; Knuth-hash order, SQL-replicable)."""
    from rp_extract_ray.stages.groupops import stratified_sample

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"])
    out = stratified_sample(ds, "o_orderpriority", "o_orderkey", n, seed=seed)
    return out.select_columns(["o_orderpriority", "o_orderkey", "o_totalprice"])


def q_filter_sort(sf_dir: str) -> Dataset:
    """M25 filters + stable sort: high-value open orders."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"])

    def f(b: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(b.column("o_orderstatus"), "O"),
            pc.greater(b.column("o_totalprice"), 200000.0),
        )
        return b.filter(m)

    return ds.map_batches(f, batch_format="pyarrow").sort("o_orderkey")


def deterministic_sample(
    ds: Dataset, key_col: str, rate: float, seed: int = 1
) -> Dataset:
    """Deterministic keyed Bernoulli sample (§2.7 sampling): keep a row iff
    ``(key * 2654435761 + seed * 2654435769) mod 2^32 < rate * 2^32`` —
    Knuth's multiplicative hash, chosen over ``Dataset.random_sample``
    because it is reproducible across runs/cluster sizes AND exactly
    replicable in the SQL oracle. Stateless vectorized filter; zero shuffle.
    """
    import numpy as np

    threshold = np.uint64(int(rate * 2**32))

    def f(b: pa.Table) -> pa.Table:
        k = b.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (
            k.astype(np.uint64) * np.uint64(2654435761)
            + np.uint64(seed) * np.uint64(2654435769)
        ) & np.uint64(0xFFFFFFFF)
        return b.filter(pa.array(h < threshold))

    return ds.map_batches(f, batch_format="pyarrow")


def q_sample(sf_dir: str, rate: float = 0.05, seed: int = 1) -> Dataset:
    """Keyed deterministic 5% sample of orders."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return deterministic_sample(ds, "o_orderkey", rate, seed)


def q_top_terms(sf_dir: str, k: int = 20) -> "pd.DataFrame":
    """Vocabulary head: token explode (flat_map pattern) -> distributed
    count -> global top-k. The training-data vocab-building op; tokens are
    lowercased ``\\w+`` runs matching the SQL oracle's regexp_extract_all."""
    import numpy as np
    import pandas as pd

    ds = _read(sf_dir, "documents", ["text"])

    def explode_counts(batch: pd.DataFrame) -> pd.DataFrame:
        # map-side combine: one (token, n) row per DISTINCT token per batch
        toks = batch["text"].fillna("").str.lower().str.findall(r"[0-9a-z_]+")
        counts = toks.str.len().to_numpy()
        flat = (
            np.concatenate([np.array(t, dtype=object) for t in toks])
            if counts.sum()
            else np.array([], dtype=object)
        )
        vc = pd.Series(flat).value_counts()
        return pd.DataFrame({"token": vc.index.to_numpy(), "n": vc.to_numpy()})

    from rp_extract_ray.stages.groupops import grouped_reduce

    from rp_extract_ray.stages.partition import arrow_out

    counted = grouped_reduce(
        ds.map_batches(
            lambda b: arrow_out(explode_counts(b.to_pandas())),
            batch_format="pyarrow",
        ),
        "token", {"n": ("n", "sum")}, combine_first=False,
    )
    return distributed_topk(counted, ["n", "token"], [True, False], k)


def distributed_topk(
    ds: Dataset, cols: list[str], descending: list[bool], k: int
) -> "pd.DataFrame":
    """Global top-k WITHOUT a global sort: each block keeps its local top-k
    (vectorized Arrow sort per batch), and only the tiny partials
    (k x n_blocks rows) reach the final merge. A `Dataset.sort().limit(k)`
    moves every block through an all-to-all range shuffle to discard all but
    k rows — this keeps the exchange at O(k) per block. Returns a pandas
    DataFrame of exactly k rows with deterministic tie order."""
    import pandas as pd

    keys = [
        (c, "descending" if d else "ascending") for c, d in zip(cols, descending)
    ]

    def partial(b: pa.Table) -> pa.Table:
        idx = pc.sort_indices(b, sort_keys=keys)
        return b.take(idx[:k])

    small = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    small = small.sort_values(
        cols, ascending=[not d for d in descending], ignore_index=True, kind="mergesort"
    )
    return small.head(k).reset_index(drop=True)


def q_cube_orders(sf_dir: str) -> Dataset:
    """Multi-level curation report: order counts + spend totals at every
    status × priority granularity (CUBE = 4 grouping sets) in ONE exchange.
    Oracle: GROUP BY CUBE with COALESCE'd sentinel labels."""
    from rp_extract_ray.stages.rollup import cube_aggregate

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    out = cube_aggregate(
        ds,
        ["o_orderstatus", "o_orderpriority"],
        sum_cols={"total": "o_totalprice"},
        count_alias="n_orders",
    )
    return _round_cols(out, {"total": 2})


def q_rollup_orders(sf_dir: str) -> Dataset:
    """ROLLUP report: the hierarchical-prefix half of the grouping-sets
    surface (stages/rollup.rollup_aggregate) — (status, priority), (status,),
    () totals in the same ONE-exchange plan as CUBE, but with the 3 prefix
    sets only. Oracle: GROUP BY ROLLUP with COALESCE'd sentinel labels."""
    from rp_extract_ray.stages.rollup import rollup_aggregate

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority", "o_totalprice"])
    out = rollup_aggregate(
        ds,
        ["o_orderstatus", "o_orderpriority"],
        sum_cols={"total": "o_totalprice"},
        count_alias="n_orders",
    )
    return _round_cols(out, {"total": 2})


def q_heavy_hitters(sf_dir: str):
    """Exact hot-key detection on lineitem supplier keys: values covering
    >= 1.07% of all rows, exact counts (functions/sketch.heavy_hitters —
    two bounded passes, no raw-row shuffle). Oracle: GROUP BY + HAVING
    against the same ceil threshold."""
    from rp_extract_ray.functions.sketch import heavy_hitters

    ds = _read(sf_dir, "lineitem", ["l_suppkey"])
    return heavy_hitters(ds, "l_suppkey", threshold_frac=0.0107)


def q_range_partition(sf_dir: str) -> Dataset:
    """Range-partition assignment summary (stages/partition.py): deterministic
    hash-sampled quantile_disc bounds, searchsorted part ids, per-part
    count/min/max. Disjoint [min_key, max_key] ranges per part are the
    sorted-layout invariant (tests/test_range_partition.py checks the write
    path); the oracle replicates sample, bounds and assignment in SQL."""
    from ray.data.aggregate import Count, Max, Min

    from rp_extract_ray.stages.partition import (
        RANGE_PART_COL,
        add_range_part,
        range_partition_bounds,
    )

    ds = _read(sf_dir, "orders", ["o_custkey"])
    bounds = range_partition_bounds(ds, "o_custkey", 4, sample_rate=0.25, seed=1)
    parted = add_range_part(ds, "o_custkey", bounds)
    out = parted.groupby(RANGE_PART_COL).aggregate(
        Count(alias_name="n_rows"),
        Min("o_custkey", alias_name="min_key"),
        Max("o_custkey", alias_name="max_key"),
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "part": b.column(RANGE_PART_COL).cast(pa.int64()),
                "n_rows": b.column("n_rows").cast(pa.int64()),
                "min_key": b.column("min_key").cast(pa.int64()),
                "max_key": b.column("max_key").cast(pa.int64()),
            }
        )

    return out.map_batches(fin, batch_format="pyarrow")


def q_full_outer_join(sf_dir: str) -> Dataset:
    """Distributed big-big FULL OUTER join with orphans on BOTH sides
    (high-value orders x BUILDING-segment customers). Gates the
    stages/join.hash_join outer path: unmatched rows surface with typed
    nulls, keys coalesce."""
    from rp_extract_ray.stages.join import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    orders = orders.map_batches(
        lambda b: b.filter(pc.greater(b.column("o_totalprice"), 200000.0)),
        batch_format="pyarrow",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])
    cust = cust.map_batches(
        lambda b: b.filter(pc.equal(b.column("c_mktsegment"), "BUILDING")).drop_columns(
            ["c_mktsegment"]
        ),
        batch_format="pyarrow",
    )
    j = hash_join(orders, cust, on="o_custkey", right_on="c_custkey", how="full_outer")

    def fin(b: pa.Table) -> pa.Table:
        # Ray's hash join emits ONE key column (the left name), already
        # coalesced: right-orphan rows carry their key in o_custkey
        custkey = b.column("o_custkey").cast(pa.int64())
        from rp_extract_ray.functions.rounding import round_half_away
        import numpy as np

        def rnd(col):
            v = b.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
            return pa.array(round_half_away(v, 2))

        return pa.table(
            {
                "custkey": custkey,
                "o_orderkey": b.column("o_orderkey").cast(pa.int64()),
                "o_totalprice": rnd("o_totalprice"),
                "c_acctbal": rnd("c_acctbal"),
            }
        )

    return j.map_batches(fin, batch_format="pyarrow")


def weighted_sample(
    ds: Dataset, key_col: str, weight_col: str, n: int, *, seed: int = 1
) -> "pd.DataFrame":
    """Deterministic weight-proportional sample WITHOUT replacement
    (Efraimidis-Spirakis A-Res, public algorithm): each row draws
    u = (knuth_hash(key)+1)/2^32 in (0,1] and ranks by ln(u)/weight; the
    top-n ranks are the sample. P(row in sample) is proportional to weight
    in the without-replacement sense, yet the winners are identical across
    runs, partitionings and cluster sizes (and exactly replicable in SQL).
    Cost = one map pass + the pruned ``distributed_topk`` exchange
    (O(n) rows per block); weights must be > 0."""
    import numpy as np

    def add_rank(b: pa.Table) -> pa.Table:
        k = b.column(key_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        h = (
            k.astype(np.uint64) * np.uint64(2654435761)
            + np.uint64(seed) * np.uint64(2654435769)
        ) & np.uint64(0xFFFFFFFF)
        u = (h.astype(np.float64) + 1.0) / 4294967296.0
        w = b.column(weight_col).to_numpy(zero_copy_only=False).astype(np.float64)
        return b.append_column("_wk", pa.array(np.log(u) / w))

    ranked = ds.map_batches(add_rank, batch_format="pyarrow")
    out = distributed_topk(ranked, ["_wk", key_col], [True, False], n)
    return out.drop(columns=["_wk"])


def q_weighted_sample(sf_dir: str, n: int = 100):
    """Price-weighted order sample (see :func:`weighted_sample`). Oracle:
    same hash/ln ranking in SQL, ORDER BY ... LIMIT n."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    out = weighted_sample(ds, "o_orderkey", "o_totalprice", n)
    out = out.reset_index(drop=True)
    from rp_extract_ray.functions.rounding import round_half_away

    out["o_totalprice"] = round_half_away(out["o_totalprice"].to_numpy(), 2)
    return out


def q_group_quantiles_disc(sf_dir: str) -> Dataset:
    """Discrete (rank-ceil(q*n)) per-group quantiles — the quantile_disc
    semantics used for range-partition bounds, gated directly."""
    from rp_extract_ray.stages.groupops import grouped_quantiles

    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])
    out = grouped_quantiles(
        ds, "o_orderstatus", "o_totalprice", [0.25, 0.5, 0.75],
        out_names=["q25", "q50", "q75"], round_to=2, method="disc",
    )
    return out


def q_group_hll(sf_dir: str):
    """Distinct customers per order priority via the grouped HLL sketch
    (functions/sketch.group_hll_distinct). Oracle: literal table from an
    independent single-process HLL recompute per group
    (pipelines/oracle_literals.group_hll_sql)."""
    from rp_extract_ray.functions.sketch import group_hll_distinct

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])
    return group_hll_distinct(ds, "o_orderpriority", "o_custkey")


def q_group_distinct(sf_dir: str) -> Dataset:
    """EXACT distinct customers per order priority: map-side (group, key)
    dedup shrinks the exchange to distinct pairs per block, one keyed
    reduction dedups globally, a second tiny one counts — the exact
    complement of the grouped HLL sketch (same truth, key-cardinality
    shuffle instead of constant)."""
    import pandas as pd

    from rp_extract_ray.stages.groupops import grouped_reduce

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_custkey"])

    def local_distinct(tbl):
        from rp_extract_ray.stages.partition import arrow_out

        return arrow_out(tbl.to_pandas().drop_duplicates())

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow")
    uniq = grouped_reduce(
        pairs, ["o_orderpriority", "o_custkey"],
        {"_n": ("o_custkey", "count")}, combine_first=False,
    )
    out = grouped_reduce(
        uniq.select_columns(["o_orderpriority"]), "o_orderpriority",
        {"n_distinct": ("o_orderpriority", "count")}, combine_first=False,
    )
    return out


def q_group_corr(sf_dir: str) -> Dataset:
    """Per-(returnflag, linestatus) Pearson correlation of quantity and
    extended price via additive moment partials
    (stages/groupops.grouped_corr) — six numbers per key per block cross
    the exchange regardless of row count."""
    from rp_extract_ray.stages.groupops import grouped_corr

    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )
    return grouped_corr(
        ds, ["l_returnflag", "l_linestatus"], "l_quantity", "l_extendedprice",
        out_name="corr_qty_price",
    )


def q_unpivot(sf_dir: str) -> Dataset:
    """Wide → long melt of four lineitem measures (stages/pivot.unpivot):
    a pure per-block Arrow kernel, no shuffle — the inverse reshape of
    pivot_counts."""
    from rp_extract_ray.stages.pivot import unpivot

    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
         "l_discount", "l_tax"],
    )
    return unpivot(
        ds, ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )


def q_order_count_dist(sf_dir: str) -> Dataset:
    """TPC-H Q13 shape (outer join + two-level aggregate): how many
    customers placed exactly N orders, INCLUDING the zero-order tail that
    an inner join would drop. Orders pre-aggregate to one count row per
    customer through grouped_reduce's keyed exchange (map-side combine),
    the customer spine LEFT-OUTER hash-joins that small per-key table, and
    the final histogram is a second tiny keyed reduction — at 100 TB the
    only full-table shuffle is the per-custkey combine, whose exchange
    volume is distinct-keys-per-block, not rows."""
    from rp_extract_ray.stages.groupops import grouped_reduce, grouped_reduce_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    # fused: per-custkey count reduce + the customer spine ride ONE keyed
    # exchange; join="right" keeps zero-order customers (the Q13 tail)
    j = grouped_reduce_join(
        _read(sf_dir, "orders", ["o_custkey"]),
        "o_custkey",
        {"n_orders": ("o_custkey", "count")},
        side=cust, side_on="c_custkey", side_cols=[], join="right",
    )

    def fill(b: pa.Table) -> pa.Table:
        n = pc.fill_null(b.column("n_orders"), 0).cast(pa.int64())
        return pa.table({"n_orders": n})

    hist = grouped_reduce(
        j.map_batches(fill, batch_format="pyarrow"),
        "n_orders",
        {"n_custs": ("n_orders", "count")},
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "n_orders": b.column("n_orders").cast(pa.int64()),
                "n_custs": b.column("n_custs").cast(pa.int64()),
            }
        )

    return hist.map_batches(fin, batch_format="pyarrow")


def q_large_orders(sf_dir: str, min_qty: float = 200.0) -> Dataset:
    """TPC-H Q18 shape (grouped HAVING feeding a join chain): orders whose
    total lineitem quantity exceeds ``min_qty``, annotated with the
    customer name. The HAVING side collapses lineitem to one (orderkey,
    sum_qty) row per order map-side before its single keyed exchange; only
    the few survivors hash-join orders, and the customer dimension rides a
    broadcast. Output: c_name, o_orderkey, o_orderdate, o_totalprice,
    sum_qty."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    qty = grouped_reduce(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        "l_orderkey",
        {"sum_qty": ("l_quantity", "sum")},
    ).map_batches(
        lambda b: b.filter(pc.greater(b.column("sum_qty"), min_qty)),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    )
    # upper bound on the reduced side: distinct orderkeys <= lineitem rows
    hint = _read(sf_dir, "lineitem", ["l_orderkey"])._meta_count()
    j = repartition_join(
        orders, qty, on="o_orderkey", right_on="l_orderkey",
        right_cols=["l_orderkey", "sum_qty"],
        size_hint=hint, broadcast_limit=2_000_000,
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    out = broadcast_join(j, cust.to_pandas(), on="o_custkey", small_on="c_custkey")
    out = out.select_columns(
        ["c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]
    )
    return _round_cols(out, {"o_totalprice": 2, "sum_qty": 2})


def q_priority_returns(sf_dir: str) -> Dataset:
    """TPC-H Q4 shape (EXISTS decorrelated to a semi join + grouped
    count): orders in a one-quarter window with at least one RETURNED
    lineitem, counted per priority. The key side projects to bare
    orderkeys before the semi join (distinct-keys exchange), the count is
    a keyed reduction."""
    import datetime as _dt

    from rp_extract_ray.stages.groupops import grouped_reduce

    lo = pa.scalar(_dt.datetime(1996, 7, 1), type=pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1996, 10, 1), type=pa.timestamp("us"))
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi),
            )
        ),
        batch_format="pyarrow",
    )
    returned = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]).map_batches(
        lambda b: pa.table(
            {
                "l_orderkey": b.filter(
                    pc.equal(b.column("l_returnflag"), "R")
                ).column("l_orderkey")
            }
        ),
        batch_format="pyarrow",
    )
    from rp_extract_ray.stages.join import repartition_join

    hint = _read(sf_dir, "lineitem", ["l_orderkey"])._meta_count()
    semi = repartition_join(
        orders, returned, on="o_orderkey", right_on="l_orderkey", how="semi",
        size_hint=hint, broadcast_limit=2_000_000,
    )
    out = grouped_reduce(
        semi.select_columns(["o_orderpriority"]),
        "o_orderpriority",
        {"n": ("o_orderpriority", "count")},
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "o_orderpriority": b.column("o_orderpriority"),
                "n": b.column("n").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_tpch_q5(sf_dir: str, region: str = "ASIA") -> Dataset:
    """TPC-H Q5 shape (6-table join + grouped sum): revenue of lineitems
    whose supplier and ordering customer share a nation inside one region,
    per nation. Shuffle-minimal plan: the three dimension chains
    (region->nation, supplier, customer) are bounded and broadcast — the
    supplier and customer maps carry ONE int column each — so the only
    exchange in the whole query is the orderkey repartition join between
    the two big tables; the nation-equality filter runs vectorized inside
    that join's output, and the final reduction is a distinct-nations
    exchange. Composite gate over J1/J2/J3/A-family primitives."""
    import datetime as _dt

    import pyarrow.parquet as pq

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    asia = nation.merge(
        reg[reg["r_name"] == region], left_on="n_regionkey", right_on="r_regionkey"
    )
    nation_names = dict(zip(asia["n_nationkey"], asia["n_name"]))
    keys = set(int(k) for k in nation_names)

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    supp = supp[supp["s_nationkey"].isin(keys)]
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    cust = cust[cust["c_nationkey"].isin(keys)]

    lo = pa.scalar(_dt.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1998, 1, 1), type=pa.timestamp("us"))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def owin(b: pa.Table) -> pa.Table:
        d = b.column("o_orderdate")
        return b.filter(
            pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        ).select(["o_orderkey", "o_custkey"])

    orders = broadcast_join(
        orders.map_batches(owin, batch_format="pyarrow"),
        cust, on="o_custkey", small_on="c_custkey", value_cols=["c_nationkey"],
    ).select_columns(["o_orderkey", "c_nationkey"])

    line = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def rev(b: pa.Table) -> pa.Table:
        r = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "rev": r,
            }
        )

    line = broadcast_join(
        line.map_batches(rev, batch_format="pyarrow"),
        supp, on="l_suppkey", small_on="s_suppkey", value_cols=["s_nationkey"],
    ).select_columns(["l_orderkey", "rev", "s_nationkey"])

    hint = _read(sf_dir, "orders", ["o_orderkey"])._meta_count()
    j = repartition_join(
        line, orders, on="l_orderkey", right_on="o_orderkey",
        right_cols=["o_orderkey", "c_nationkey"],
        size_hint=hint, broadcast_limit=2_000_000,
    )

    def same_nation(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("s_nationkey"), b.column("c_nationkey")))
        return pa.table(
            {"n_nationkey": f.column("s_nationkey"), "rev": f.column("rev")}
        )

    agg = grouped_reduce(
        j.map_batches(same_nation, batch_format="pyarrow"),
        "n_nationkey",
        {"revenue": ("rev", "sum")},
    )

    def finish(b: pa.Table) -> pa.Table:
        import pandas as pd

        nk = b.column("n_nationkey").to_pandas()
        return pa.table(
            {
                "n_name": pa.array(nk.map(nation_names), pa.string()),
                "revenue": b.column("revenue"),
            }
        )

    return _round_cols(
        agg.map_batches(finish, batch_format="pyarrow"), {"revenue": 2}
    )


def q_tpch_q14(sf_dir: str) -> "pd.DataFrame":
    """TPC-H Q14 shape (join + conditional global ratio): share of revenue
    from PROMO parts inside a 3-month ship window. The part->is_promo map
    is ONE broadcast boolean column; per-block partial (promo_rev, rev)
    pairs reduce to a single driver division — nothing but two floats per
    block ever moves."""
    import datetime as _dt

    import pandas as pd
    import pyarrow.parquet as pq

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    part["is_promo"] = part["p_type"].str.startswith("PROMO").astype("int8")

    lo = pa.scalar(_dt.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1996, 4, 1), type=pa.timestamp("us"))
    line = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def win(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate")
        return b.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))).select(
            ["l_partkey", "l_extendedprice", "l_discount"]
        )

    joined = broadcast_join(
        line.map_batches(win, batch_format="pyarrow"),
        part[["p_partkey", "is_promo"]],
        on="l_partkey", small_on="p_partkey", value_cols=["is_promo"],
    )

    def partial(b: pa.Table) -> pa.Table:
        import numpy as np

        r = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        ).to_numpy(zero_copy_only=False)
        promo = b.column("is_promo").to_numpy(zero_copy_only=False).astype(bool)
        return pa.table(
            {
                "promo_rev": pa.array([float(r[promo].sum())]),
                "rev": pa.array([float(r.sum())]),
            }
        )

    parts = joined.map_batches(partial, batch_format="pyarrow").to_pandas()
    total, promo = float(parts["rev"].sum()), float(parts["promo_rev"].sum())
    from rp_extract_ray.functions.rounding import round_half_away

    val = float(round_half_away(100.0 * promo / total, 6)) if total else 0.0
    return pd.DataFrame({"promo_revenue": [val]})


def q_histogram(sf_dir: str, width: float = 50_000.0) -> Dataset:
    """Fixed-width distribution profile of order totals (§2.6 A-family
    generalization; stages/splits.value_histogram): per-bin count + sum,
    bounded exchange (distinct bins per block)."""
    from rp_extract_ray.stages.splits import value_histogram

    ds = _read(sf_dir, "orders", ["o_totalprice"])
    out = value_histogram(ds, "o_totalprice", width, sum_col="s")
    return _round_cols(out, {"s": 2})


def q_intersect_keys(sf_dir: str) -> Dataset:
    """§2.8 set op INTERSECT: distinct part keys that appear BOTH in
    lineitem and in the large-size part subset (stages/setops.py — one
    distinct-keys exchange, flags max-merged)."""
    from rp_extract_ray.stages.setops import distinct_set_op

    line = _read(sf_dir, "lineitem", ["l_partkey"])
    big_parts = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        lambda b: b.filter(pc.greater(b.column("p_size"), 25)).select(
            ["p_partkey"]
        ),
        batch_format="pyarrow",
    )
    return distinct_set_op(
        line, big_parts, on="l_partkey", right_on="p_partkey", op="intersect"
    )


def q_except_keys(sf_dir: str) -> Dataset:
    """§2.8 set op EXCEPT: distinct customers that placed orders but have
    no event activity... expressed on testdata as custkeys in orders EXCEPT
    custkeys with an open (status 'O') order."""
    from rp_extract_ray.stages.setops import distinct_set_op

    all_cust = _read(sf_dir, "orders", ["o_custkey"])
    open_cust = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderstatus"), "O")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    return distinct_set_op(all_cust, open_cust, on="o_custkey", op="except")


def q_weighted_avg(sf_dir: str) -> Dataset:
    """Grouped weighted mean (price-weighted average discount per return
    flag): two associative sums per group through ONE distinct-keys
    exchange, then a vectorized divide — the ratio-of-sums compose the
    reference's stats kernel never needed but every billing/curation
    pipeline does."""
    from rp_extract_ray.stages.groupops import grouped_reduce

    line = _read(
        sf_dir, "lineitem", ["l_returnflag", "l_discount", "l_extendedprice"]
    )

    def pre(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "num": pc.multiply(
                    b.column("l_discount"), b.column("l_extendedprice")
                ),
                "den": b.column("l_extendedprice"),
            }
        )

    agg = grouped_reduce(
        line.map_batches(pre, batch_format="pyarrow"),
        "l_returnflag",
        {"num": ("num", "sum"), "den": ("den", "sum")},
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "wavg_disc": pc.divide(b.column("num"), b.column("den")),
            }
        )

    return _round_cols(
        agg.map_batches(fin, batch_format="pyarrow"), {"wavg_disc": 6}
    )


def q_profile_columns(sf_dir: str) -> "pd.DataFrame":
    """Single-pass numeric column profile of orders
    (stages/profile.profile_columns): per-column rows/nulls/min/max/sum,
    bounded per-block partials, zero shuffle."""
    from rp_extract_ray.functions.rounding import round_half_away
    from rp_extract_ray.stages.profile import profile_columns

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    out = profile_columns(ds, ["o_orderkey", "o_custkey", "o_totalprice"])
    out["vsum"] = round_half_away(out["vsum"].to_numpy(), 2)
    out["vmin"] = round_half_away(out["vmin"].to_numpy(), 6)
    out["vmax"] = round_half_away(out["vmax"].to_numpy(), 6)
    return out


def q_tpch_q10(sf_dir: str, k: int = 20) -> "pd.DataFrame":
    """TPC-H Q10 shape (returned-item revenue, 4-table join + grouped sum +
    top-k): revenue of RETURNED lineitems per customer for orders in one
    quarter, annotated with the customer's nation. Shuffle-minimal plan:
    returned-lineitem revenue pre-aggregates per orderkey, the
    window-filtered orders attach o_custkey through the size-hint join
    (broadcast-collapsed under the budget, hash exchange above it), the
    per-customer reduction is a distinct-custkeys exchange, customer/nation
    attributes broadcast, and the top-k is per-block partials — no global
    sort, no full-table shuffle besides the one orderkey exchange."""
    import datetime as _dt

    import pyarrow.parquet as pq

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    lo = pa.scalar(_dt.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1996, 4, 1), type=pa.timestamp("us"))

    def rev(b: pa.Table) -> pa.Table:
        f = b.filter(pc.equal(b.column("l_returnflag"), "R"))
        r = pc.multiply(
            f.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), f.column("l_discount")),
        )
        return pa.table({"l_orderkey": f.column("l_orderkey"), "rev": r})

    line = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(rev, batch_format="pyarrow")
    per_order = grouped_reduce(line, "l_orderkey", {"rev": ("rev", "sum")})

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("o_orderdate"), lo),
                pc.less(b.column("o_orderdate"), hi),
            )
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    hint = _read(sf_dir, "orders", ["o_orderkey"])._meta_count()
    j = repartition_join(
        per_order, orders, on="l_orderkey", right_on="o_orderkey",
        right_cols=["o_orderkey", "o_custkey"],
        size_hint=hint, broadcast_limit=2_000_000,
    )
    per_cust = grouped_reduce(
        j.select_columns(["o_custkey", "rev"]),
        "o_custkey",
        {"revenue": ("rev", "sum")},
    )

    cust = pq.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    ).to_pandas()
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    dim = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    annotated = broadcast_join(
        _round_cols(per_cust, {"revenue": 2}),
        dim[["c_custkey", "c_name", "c_acctbal", "n_name"]],
        on="o_custkey", small_on="c_custkey",
        value_cols=["c_name", "c_acctbal", "n_name"],
    )
    out = distributed_topk(annotated, ["revenue", "o_custkey"], [True, False], k)
    out = out.rename(columns={"o_custkey": "c_custkey"})
    return out[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]


def q_tpch_q18(sf_dir: str, threshold: float = 150.0, k: int = 100) -> "pd.DataFrame":
    """TPC-H Q18 shape (large-volume orders: HAVING-sum gate + join-back +
    top-k). Plan: ONE distinct-orderkeys exchange computes per-order quantity
    sums; the HAVING filter runs on the already-aggregated rows (so the
    decorrelated `IN (GROUP BY .. HAVING)` subquery costs nothing extra —
    the aggregate IS the key set); surviving orders attach their attributes
    through the size-hint join, the customer name broadcasts, and the top-k
    is per-block partials. Total shuffle volume: one orderkey exchange of
    (key, sum) pairs."""
    import pyarrow.parquet as pq

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    per_order = grouped_reduce(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]),
        "l_orderkey",
        {"sum_qty": ("l_quantity", "sum")},
    ).map_batches(
        lambda b: b.filter(pc.greater(b.column("sum_qty"), pa.scalar(threshold))),
        batch_format="pyarrow",
    )

    hint = _read(sf_dir, "orders", ["o_orderkey"])._meta_count()
    j = repartition_join(
        per_order,
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]),
        on="l_orderkey", right_on="o_orderkey",
        right_cols=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        size_hint=hint, broadcast_limit=2_000_000,
    )
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    ).to_pandas()
    annotated = broadcast_join(
        _round_cols(j, {"sum_qty": 2}),
        cust, on="o_custkey", small_on="c_custkey", value_cols=["c_name"],
    )
    out = distributed_topk(
        annotated,
        ["o_totalprice", "o_orderdate", "l_orderkey"],
        [True, False, False],
        k,
    )
    out = out.rename(columns={"l_orderkey": "o_orderkey", "o_custkey": "c_custkey"})
    return out[
        ["c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"]
    ]


def q_tpch_q12(sf_dir: str) -> Dataset:
    """TPC-H Q12 shape (shipping-mode priority histogram, adapted to the
    testdata's columns: group by l_returnflag): lineitems shipped in a
    one-year window join their order's priority, counted as high
    (1-URGENT / 2-HIGH) vs low per flag. The join rides the size-hint
    path — orders broadcast-collapse under the budget (zero shuffle at
    bench scale), hash-partitioned repartition_join above it — and the
    final reduction is ONE exchange bounded by distinct flags."""
    import datetime as _dt

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    lo = pa.scalar(_dt.datetime(1995, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1996, 1, 1), type=pa.timestamp("us"))
    lines = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"]
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater_equal(b.column("l_shipdate"), lo),
                pc.less(b.column("l_shipdate"), hi),
            )
        ).select(["l_orderkey", "l_returnflag"]),
        batch_format="pyarrow",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    hint = _read(sf_dir, "orders", ["o_orderkey"])._meta_count()
    joined = repartition_join(
        lines, orders, on="l_orderkey", right_on="o_orderkey", how="inner",
        right_cols=["o_orderpriority"], size_hint=hint,
        broadcast_limit=2_000_000,
    )

    def indicators(b: pa.Table) -> pa.Table:
        hi_mask = pc.is_in(
            b.column("o_orderpriority"),
            value_set=pa.array(["1-URGENT", "2-HIGH"]),
        )
        ones = pc.cast(hi_mask, pa.int64())
        return pa.table(
            {
                "l_returnflag": b.column("l_returnflag"),
                "high_line_count": ones,
                "low_line_count": pc.subtract(pa.scalar(1, pa.int64()), ones),
            }
        )

    out = grouped_reduce(
        joined.map_batches(indicators, batch_format="pyarrow"),
        "l_returnflag",
        {
            "high_line_count": ("high_line_count", "sum"),
            "low_line_count": ("low_line_count", "sum"),
        },
    )
    return out.sort("l_returnflag")


def _pdf_with_schema(ds, cols: "dict[str, str]") -> "pd.DataFrame":
    """Bounded-result finish that survives EMPTY pipelines: a Ray Dataset
    with zero output blocks loses its column names on ``to_pandas()``, so a
    legitimately-empty query (selective filters at tiny scale) would fail
    the driver's schema compare. ``cols`` maps name -> pandas dtype; rows
    pass through untouched when present."""
    import pandas as pd

    df = ds.to_pandas() if not isinstance(ds, pd.DataFrame) else ds
    if df.empty and not set(cols) <= set(df.columns):
        return pd.DataFrame({c: pd.Series(dtype=t) for c, t in cols.items()})
    return df[list(cols)]


def q_tpch_q15(sf_dir: str) -> "pd.DataFrame":
    """TPC-H Q15 shape (top supplier by revenue: grouped sum -> global-max
    scalar subquery -> argmax filter -> dimension attach). Plan: the
    window-filtered revenue reduces through ONE distinct-suppkeys exchange
    (bounded by the supplier dimension); the max is a scalar aggregate over
    that bounded table; the `= max` filter re-reads the same materialized
    aggregate (no recompute); supplier names broadcast. The scalar-subquery
    decorrelation pattern — nothing bigger than the per-supplier aggregate
    ever moves."""
    import datetime as _dt

    import pandas as pd
    import pyarrow.parquet as pq
    from ray.data.aggregate import Max

    from rp_extract_ray.stages.groupops import grouped_reduce

    lo = pa.scalar(_dt.datetime(1996, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1996, 4, 1), type=pa.timestamp("us"))

    def rev(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate")
        f = b.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        r = pc.multiply(
            f.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), f.column("l_discount")),
        )
        return pa.table({"l_suppkey": f.column("l_suppkey"), "rev": r})

    line = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(rev, batch_format="pyarrow")
    # bounded: one row per supplier — safe to materialize for the two reads
    per_supp = _round_cols(
        grouped_reduce(line, "l_suppkey", {"total_revenue": ("rev", "sum")}),
        {"total_revenue": 2},
    ).materialize()
    schema = {"s_suppkey": "int64", "s_name": "object",
              "total_revenue": "float64"}
    best = per_supp.aggregate(Max("total_revenue"))["max(total_revenue)"]
    if best is None:  # empty ship window: no supplier has revenue
        return _pdf_with_schema(pd.DataFrame(), schema)
    best = float(best)
    top = per_supp.map_batches(
        lambda b: b.filter(pc.equal(b.column("total_revenue"), best)),
        batch_format="pyarrow",
    )
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    out = broadcast_join(
        top, supp, on="l_suppkey", small_on="s_suppkey", value_cols=["s_name"]
    ).to_pandas()
    out = out.rename(columns={"l_suppkey": "s_suppkey"}).sort_values(
        "s_suppkey", ignore_index=True
    )
    return _pdf_with_schema(out, schema)


def q_tpch_q17(sf_dir: str, brand: str = "Brand#4") -> "pd.DataFrame":
    """TPC-H Q17 shape (small-quantity-order revenue: correlated per-part
    AVG decorrelated into a grouped reduce + broadcast-back). Plan: the
    brand's partkeys broadcast as an `is_in` filter (two column-pruned
    passes over lineitem, never a full-table shuffle); pass 1 reduces
    (sum, count) per partkey through a bounded exchange (<= |brand parts|
    rows); the 0.2*avg thresholds broadcast back and pass 2 filters +
    sums to one float per block. Re-reading the pruned projection twice
    beats pinning the filtered table in the object store at corpus scale."""
    import pandas as pd
    import pyarrow.parquet as pq

    from rp_extract_ray.functions.rounding import round_half_away
    from rp_extract_ray.stages.groupops import grouped_reduce

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    keys = pa.array(part.loc[part["p_brand"] == brand, "p_partkey"].to_numpy())

    def only_brand(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b.column("l_partkey"), value_set=keys))

    branded = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(only_brand, batch_format="pyarrow")

    agg = grouped_reduce(
        branded.map_batches(
            lambda b: b.select(["l_partkey", "l_quantity"]),
            batch_format="pyarrow",
        ),
        "l_partkey",
        {"s": ("l_quantity", "sum"), "c": ("l_quantity", "count")},
    ).to_pandas()  # bounded: one row per brand part
    if agg.empty or "l_partkey" not in agg.columns:
        # no lineitem for this brand: SQL sum over zero rows is NULL
        return pd.DataFrame({"avg_yearly": [float("nan")]})
    thr = pd.DataFrame(
        {
            "p_partkey": agg["l_partkey"],
            "thresh": 0.2 * agg["s"].to_numpy() / agg["c"].to_numpy(),
        }
    )

    j = broadcast_join(
        branded, thr, on="l_partkey", small_on="p_partkey", value_cols=["thresh"]
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b["l_quantity"].to_numpy() < b["thresh"].to_numpy()
        return pd.DataFrame(
            {
                "s": [float(b["l_extendedprice"].to_numpy()[m].sum())],
                "c": [int(m.sum())],
            }
        )

    parts = j.map_batches(partial, batch_format="pandas").to_pandas()
    if int(parts["c"].sum()) == 0:  # qualifying set empty -> SQL NULL
        return pd.DataFrame({"avg_yearly": [float("nan")]})
    total = float(parts["s"].sum())
    val = float(round_half_away(total / 7.0, 2))
    return pd.DataFrame({"avg_yearly": [val]})


def q_tpch_q7(
    sf_dir: str, nation_a: str = "NATION_1", nation_b: str = "NATION_2"
) -> "pd.DataFrame":
    """TPC-H Q7 shape (bi-directional nation-pair shipping volume by year).
    Plan: supplier->nation and customer->nation maps are one broadcast
    column each, pre-filtered to the two nations (so the `is_in` on
    suppkey prunes lineitem BEFORE anything moves); lineitem attaches
    o_custkey through the size-hint orderkey join (broadcast-collapsed
    under budget, hash exchange above); the inner broadcast on custkey
    drops non-pair customers; the final reduction is ONE exchange bounded
    by 2 nation-pairs x years. Only the orderkey attach touches a
    big-big edge."""
    import datetime as _dt

    import pyarrow.parquet as pq

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    pair = nation[nation["n_name"].isin([nation_a, nation_b])]
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas().merge(pair, left_on="s_nationkey", right_on="n_nationkey")
    supp = supp.rename(columns={"n_name": "supp_nation"})[
        ["s_suppkey", "supp_nation"]
    ]
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas().merge(pair, left_on="c_nationkey", right_on="n_nationkey")
    cust = cust.rename(columns={"n_name": "cust_nation"})[
        ["c_custkey", "cust_nation"]
    ]

    lo = pa.scalar(_dt.datetime(1995, 1, 1), type=pa.timestamp("us"))
    hi = pa.scalar(_dt.datetime(1999, 1, 1), type=pa.timestamp("us"))
    skeys = pa.array(supp["s_suppkey"].to_numpy())

    def pre(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate")
        f = b.filter(
            pc.and_(
                pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)),
                pc.is_in(b.column("l_suppkey"), value_set=skeys),
            )
        )
        vol = pc.multiply(
            f.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), f.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": f.column("l_orderkey"),
                "l_suppkey": f.column("l_suppkey"),
                "l_year": pc.year(f.column("l_shipdate")).cast(pa.int64()),
                "volume": vol,
            }
        )

    line = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(pre, batch_format="pyarrow")

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    hint = _read(sf_dir, "orders", ["o_orderkey"])._meta_count()
    j = repartition_join(
        line, orders, on="l_orderkey", right_on="o_orderkey",
        right_cols=["o_orderkey", "o_custkey"],
        size_hint=hint, broadcast_limit=2_000_000,
    )
    j = broadcast_join(j, supp, on="l_suppkey", value_cols=["supp_nation"],
                       small_on="s_suppkey")
    j = broadcast_join(j, cust, on="o_custkey", value_cols=["cust_nation"],
                       small_on="c_custkey")
    j = j.map_batches(
        lambda b: b.filter(
            pc.not_equal(b.column("supp_nation"), b.column("cust_nation"))
        ),
        batch_format="pyarrow",
    )
    out = grouped_reduce(
        j.select_columns(["supp_nation", "cust_nation", "l_year", "volume"]),
        ["supp_nation", "cust_nation", "l_year"],
        {"revenue": ("volume", "sum")},
    )
    out = _round_cols(out, {"revenue": 2}).sort(
        ["supp_nation", "cust_nation", "l_year"]
    )
    return _pdf_with_schema(
        out,
        {"supp_nation": "object", "cust_nation": "object",
         "l_year": "int64", "revenue": "float64"},
    )


def q_tpch_q8(
    sf_dir: str, region: str = "EUROPE", nation: str = "NATION_1"
) -> "pd.DataFrame":
    """TPC-H Q8 shape (national market share: per-year conditional revenue
    ratio inside one customer region; the part-type filter is dropped —
    adaptation documented). Plan: the supplier->nation map and the
    region-filtered customer key set are one broadcast column each;
    lineitem attaches (o_custkey, o_orderdate) through the size-hint
    orderkey join; the inner customer broadcast drops out-of-region
    orders; per-year (nation_volume, total_volume) pairs reduce through
    an exchange bounded by years; the share is a vectorized divide."""
    import numpy as np
    import pyarrow.parquet as pq

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    nat = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    ).to_pandas()
    reg = pq.read_table(
        f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"]
    ).to_pandas()
    region_keys = reg.loc[reg["r_name"] == region, "r_regionkey"]
    region_nations = nat.loc[nat["n_regionkey"].isin(region_keys), "n_nationkey"]
    cust = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    cust = cust[cust["c_nationkey"].isin(region_nations)][["c_custkey"]]
    cust["in_region"] = np.int8(1)
    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas().merge(nat[["n_nationkey", "n_name"]],
                        left_on="s_nationkey", right_on="n_nationkey")
    supp = supp.rename(columns={"n_name": "supp_nation"})[
        ["s_suppkey", "supp_nation"]
    ]

    def vol(b: pa.Table) -> pa.Table:
        r = pc.multiply(
            b.column("l_extendedprice"),
            pc.subtract(pa.scalar(1.0), b.column("l_discount")),
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "volume": r,
            }
        )

    line = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(vol, batch_format="pyarrow")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
    hint = _read(sf_dir, "orders", ["o_orderkey"])._meta_count()
    j = repartition_join(
        line, orders, on="l_orderkey", right_on="o_orderkey",
        right_cols=["o_orderkey", "o_custkey", "o_orderdate"],
        size_hint=hint, broadcast_limit=2_000_000,
    )
    j = broadcast_join(j, cust, on="o_custkey", small_on="c_custkey",
                       value_cols=["in_region"])
    j = broadcast_join(j, supp, on="l_suppkey", small_on="s_suppkey",
                       value_cols=["supp_nation"])

    def pre(b: pa.Table) -> pa.Table:
        is_nat = pc.cast(
            pc.equal(b.column("supp_nation"), nation), pa.float64()
        )
        return pa.table(
            {
                "o_year": pc.year(b.column("o_orderdate")).cast(pa.int64()),
                "nat_vol": pc.multiply(b.column("volume"), is_nat),
                "tot_vol": b.column("volume"),
            }
        )

    agg = grouped_reduce(
        j.map_batches(pre, batch_format="pyarrow"),
        "o_year",
        {"nat_vol": ("nat_vol", "sum"), "tot_vol": ("tot_vol", "sum")},
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "o_year": b.column("o_year"),
                "mkt_share": pc.divide(b.column("nat_vol"), b.column("tot_vol")),
            }
        )

    out = _round_cols(
        agg.map_batches(fin, batch_format="pyarrow"), {"mkt_share": 6}
    ).sort("o_year")
    return _pdf_with_schema(out, {"o_year": "int64", "mkt_share": "float64"})


def q_tpch_q19(sf_dir: str) -> "pd.DataFrame":
    """TPC-H Q19 shape (disjunctive predicate-class revenue; container/
    shipmode predicates replaced by size windows — adaptation documented).
    Plan: the (brand, size) attributes broadcast once as part-dimension
    columns; each block evaluates the three (brand x size-window x
    quantity-window) branches as one vectorized boolean fold and emits a
    single float — zero shuffle, the predicate never materializes a
    joined table."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from rp_extract_ray.functions.rounding import round_half_away

    part = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()

    branches = [
        ("Brand#2", 1, 10, 1.0, 20.0),
        ("Brand#4", 5, 25, 5.0, 35.0),
        ("Brand#19", 10, 40, 10.0, 45.0),
    ]

    j = broadcast_join(
        _read(
            sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        ),
        part, on="l_partkey", small_on="p_partkey",
        value_cols=["p_brand", "p_size"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        brand = b["p_brand"].to_numpy()
        size = b["p_size"].to_numpy()
        qty = b["l_quantity"].to_numpy()
        keep = np.zeros(len(b), dtype=bool)
        for br, s_lo, s_hi, q_lo, q_hi in branches:
            keep |= (
                (brand == br)
                & (size >= s_lo) & (size <= s_hi)
                & (qty >= q_lo) & (qty <= q_hi)
            )
        rev = (
            b["l_extendedprice"].to_numpy()[keep]
            * (1.0 - b["l_discount"].to_numpy()[keep])
        ).sum()
        return pd.DataFrame({"s": [float(rev)]})

    parts = j.map_batches(partial, batch_format="pandas").to_pandas()
    val = float(round_half_away(float(parts["s"].sum()), 2))
    return pd.DataFrame({"revenue": [val]})


def q_tpch_q21(sf_dir: str, k: int = 100) -> "pd.DataFrame":
    """TPC-H Q21 shape, adapted to this schema (no commit/receipt dates):
    suppliers SOLELY responsible for returns on multi-supplier finalized
    orders — l1 rows with returnflag 'R' on status-'F' orders where
    another supplier EXISTS on the order but NO other supplier has an 'R'
    row. The correlated EXISTS / NOT EXISTS pair decorrelates into per-
    order counting: stage 1 reduces lineitem to (orderkey, suppkey)
    grains with their R-row counts (one exchange, distinct pairs per
    block); stage 2 reduces pairs per orderkey into (#suppliers,
    #R-suppliers, R-rows, the R-supplier key) — expressible because
    max(suppkey WHERE has_r) is the unique key exactly when #R-suppliers
    == 1; the F-order gate rides the size-hint semi join; supplier names
    broadcast and the per-name count is a bounded final."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    line = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_returnflag"])
    forders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderstatus"), "F")).select(
            ["o_orderkey"]
        ),
        batch_format="pyarrow",
    )
    hint = _read(sf_dir, "orders", ["o_orderkey"])._meta_count()
    line = repartition_join(
        line, forders, on="l_orderkey", right_on="o_orderkey", how="semi",
        size_hint=hint, broadcast_limit=2_000_000,
    )

    def pre(b: pa.Table) -> pa.Table:
        isr = pc.cast(pc.equal(b.column("l_returnflag"), "R"), pa.int64())
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "r_rows": isr,
            }
        )

    per_pair = grouped_reduce(
        line.map_batches(pre, batch_format="pyarrow"),
        ["l_orderkey", "l_suppkey"],
        {"r_rows": ("r_rows", "sum")},
    )

    def tag(b: pa.Table) -> pa.Table:
        has_r = pc.greater(b.column("r_rows"), pa.scalar(0, pa.int64()))
        r_key = pc.if_else(
            has_r, b.column("l_suppkey"), pa.scalar(None, pa.int64())
        )
        return pa.table(
            {
                "l_orderkey": b.column("l_orderkey"),
                "l_suppkey": b.column("l_suppkey"),
                "r_rows": b.column("r_rows"),
                "has_r": pc.cast(has_r, pa.int64()),
                "r_key": r_key,
            }
        )

    per_order = grouped_reduce(
        per_pair.map_batches(tag, batch_format="pyarrow"),
        "l_orderkey",
        {
            "n_supp": ("l_suppkey", "count"),
            "n_r_supp": ("has_r", "sum"),
            "r_rows": ("r_rows", "sum"),
            "r_suppkey": ("r_key", "max"),
        },
    ).map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.greater(b.column("n_supp"), pa.scalar(1, pa.int64())),
                pc.equal(b.column("n_r_supp"), pa.scalar(1, pa.int64())),
            )
        ).select(["r_suppkey", "r_rows"]),
        batch_format="pyarrow",
    )

    import pyarrow.parquet as pq

    supp = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    named = broadcast_join(
        per_order, supp, on="r_suppkey", small_on="s_suppkey",
        value_cols=["s_name"],
    )
    counts = grouped_reduce(named, "s_name", {"numwait": ("r_rows", "sum")})
    return distributed_topk(counts, ["numwait", "s_name"], [True, False], k)


def q_tpch_q22(sf_dir: str) -> "pd.DataFrame":
    """TPC-H Q22 shape, adapted to this schema (nation instead of phone
    prefix, and 'no OPEN order' instead of 'no order' — every testdata
    customer has some order, which would make the original predicate
    degenerate): per-nation count + balance of ABOVE-AVERAGE-balance
    customers with no open (status 'O') order. Plan: the global
    positive-balance average is two floats per block; the no-open-orders
    gate is an ANTI join whose right side is the status-filtered distinct
    custkeys (size-hint broadcast-collapse under budget, hash exchange
    above); nation names broadcast; the final reduction is one exchange
    bounded by nations."""
    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_nationkey"])

    def bal_partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.greater(b.column("c_acctbal"), 0.0))
        s = pc.sum(f.column("c_acctbal")).as_py() or 0.0
        return pa.table(
            {"s": pa.array([float(s)]), "c": pa.array([len(f)], pa.int64())}
        )

    parts = cust.map_batches(bal_partial, batch_format="pyarrow").to_pandas()
    avg_bal = float(parts["s"].sum()) / max(1, int(parts["c"].sum()))

    rich = cust.map_batches(
        lambda b: b.filter(pc.greater(b.column("c_acctbal"), avg_bal)),
        batch_format="pyarrow",
    )
    open_orders = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderstatus"), "O")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    hint = _read(sf_dir, "orders", ["o_custkey"])._meta_count()
    idle = repartition_join(
        rich, open_orders,
        on="c_custkey", right_on="o_custkey", how="anti",
        size_hint=hint, broadcast_limit=2_000_000,
    )

    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    named = broadcast_join(
        idle, nation, on="c_nationkey", small_on="n_nationkey",
        value_cols=["n_name"],
    )
    out = grouped_reduce(
        named,
        "n_name",
        {"numcust": ("c_custkey", "count"), "totacctbal": ("c_acctbal", "sum")},
    )
    out = _round_cols(out, {"totacctbal": 2}).sort("n_name")
    return _pdf_with_schema(
        out, {"n_name": "object", "numcust": "int64", "totacctbal": "float64"}
    )


def q_union_keys(sf_dir: str) -> Dataset:
    """§2.8 set op UNION (the third distinct_set_op mode, gate-completing
    intersect/except): custkeys with an open (status 'O') order UNION
    custkeys with an urgent-priority order — two genuinely overlapping
    subsets merged in ONE flags-max distinct-keys exchange."""
    from rp_extract_ray.stages.setops import distinct_set_op

    open_cust = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"]).map_batches(
        lambda b: b.filter(pc.equal(b.column("o_orderstatus"), "O")).select(
            ["o_custkey"]
        ),
        batch_format="pyarrow",
    )
    urgent_cust = _read(
        sf_dir, "orders", ["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda b: b.filter(
            pc.equal(b.column("o_orderpriority"), "1-URGENT")
        ).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    return distinct_set_op(open_cust, urgent_cust, on="o_custkey", op="union")


def q_cms_counts(sf_dir: str) -> "pd.DataFrame":
    """Approximate point-frequency counts via the count-min sketch
    (constant shuffle volume: one 128 KiB counter grid per block, summed)
    alongside the exact distributed counts, probed at user ids 0..31.
    Oracle: the same estimates recomputed by an independent single-process
    CMS embedded as a literal (deterministic — the sketch's value is fixed
    by the hash spec), gating that the distributed counter-sum merge is
    exact across any partitioning; exact counts come from plain SQL."""
    import numpy as np
    import pandas as pd

    from rp_extract_ray.functions.sketch import approx_counts
    from rp_extract_ray.stages.groupops import grouped_reduce

    probes = np.arange(32, dtype=np.int64)
    ds = _read(sf_dir, "events", ["user_id"])
    est = approx_counts(ds, "user_id", probes)
    exact = grouped_reduce(
        ds, "user_id", {"n_exact": ("user_id", "count")}
    ).to_pandas().set_index("user_id")["n_exact"]
    return pd.DataFrame(
        {
            "user_id": probes,
            "n_cms": est,
            "n_exact": exact.reindex(probes).fillna(0).astype(np.int64).to_numpy(),
        }
    )
