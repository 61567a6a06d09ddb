"""Time-grid regularization — the resample analogue (S6,
/root/reference/audiofile_read.py:96-124): put each entity's irregular event
series onto a fixed time grid (tumbling time buckets), aggregating rows per
bucket. Unlike turn-count windows (stages/window.py) these are TIME windows.

Pure vectorized map + groupby: bucket = floor(ts / interval) computed per
batch (no per-entity state needed), then one grouped aggregate. Partial
aggregation happens inside Ray's sort-based aggregate; keys are
(entity, bucket) so the shuffle carries one row per pair at most after
map-side combine."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data import Dataset


def add_time_bucket(
    ds: Dataset, *, ts_col: str = "ts", interval_s: float = 3600.0,
    bucket_col: str = "bucket",
) -> Dataset:
    """Append the bucket start timestamp (floor of ts to the interval)."""
    us = np.int64(interval_s * 1e6)

    def f(b: pa.Table) -> pa.Table:
        t = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        start = (t // us) * us
        return b.append_column(
            bucket_col, pa.array(start).cast(pa.timestamp("us"))
        )

    return ds.map_batches(f, batch_format="pyarrow")


def time_grid_aggregate(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str | None = None,
    interval_s: float = 3600.0,
) -> Dataset:
    """One row per (entity, bucket): n events [+ sum/mean/min/max of value].

    Implemented as one entity-partitioned sorted pass with per-(entity,
    bucket) sub-runs computed via ``np.add.reduceat`` — measured ~1.7x faster
    than Ray's multi-key ``groupby().aggregate`` at 100k groups (and up to
    ~30x on the many-tiny-groups shapes of the dedup pair tables)."""
    import pandas as pd

    from rp_extract_ray.stages.partition import (
        entity_starts,
        partitioned_apply,
        run_bounds,
    )

    b = add_time_bucket(ds, ts_col=ts_col, interval_s=interval_s)

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        sub = entity_starts(
            pdf[entity_col].to_numpy(), pdf["bucket"].to_numpy()
        )
        run_starts, run_ends = run_bounds(sub, len(pdf))
        out = {
            entity_col: pdf[entity_col].to_numpy()[run_starts],
            "bucket": pdf["bucket"].to_numpy()[run_starts],
            "n": (run_ends - run_starts).astype(np.int64),
        }
        if value_col:
            v = pdf[value_col].to_numpy(dtype=np.float64)
            out["value_sum"] = np.add.reduceat(v, run_starts)
            out["value_mean"] = out["value_sum"] / out["n"]
            out["value_min"] = np.minimum.reduceat(v, run_starts)
            out["value_max"] = np.maximum.reduceat(v, run_starts)
        return pd.DataFrame(out)

    return partitioned_apply(
        b, fn, entity_col=entity_col, order_cols=("bucket",), num_partitions=64
    )


def time_window_aggregate(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: float = 3600.0,
    order_cols=("ts",),
    num_partitions: int = 64,
) -> Dataset:
    """SLIDING time-window aggregates per row: sum/count/mean of ``value``
    over the entity's rows with ``ts in [ts_i - window_s, ts_i]`` — SQL
    ``RANGE BETWEEN INTERVAL w PRECEDING AND CURRENT ROW`` semantics
    (same-timestamp peers are all included, exactly like the SQL frame; a
    peer is the same instant, not the future).

    Vectorized per entity run: two ``np.searchsorted`` passes bound each
    row's window, run-LOCAL prefix sums difference into windowed sums
    (local, so float error stays O(run values), never O(partition totals)).
    The per-run Python loop touches only run boundaries; all arithmetic is
    C kernels. Appends ``{value}_tsum/_tcnt/_tmean``.
    """
    import pandas as pd

    from rp_extract_ray.stages.partition import partitioned_apply, run_bounds

    w_us = np.int64(window_s * 1e6)

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        ts = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        n = len(pdf)
        tsum = np.empty(n)
        tcnt = np.empty(n, dtype=np.int64)
        run_starts, run_ends = run_bounds(starts, n)
        for s, e in zip(run_starts, run_ends):
            tsr = ts[s:e]
            left = np.searchsorted(tsr, tsr - w_us, side="left")
            right = np.searchsorted(tsr, tsr, side="right")
            cum = np.concatenate([[0.0], np.cumsum(v[s:e])])
            tsum[s:e] = cum[right] - cum[left]
            tcnt[s:e] = right - left
        pdf[f"{value_col}_tsum"] = tsum
        pdf[f"{value_col}_tcnt"] = tcnt
        pdf[f"{value_col}_tmean"] = tsum / np.maximum(tcnt, 1)
        return pdf

    return partitioned_apply(
        ds, fn, entity_col=entity_col, order_cols=order_cols,
        num_partitions=num_partitions,
    )


def time_bucket_agg(
    ds,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols=("ts", "turn_idx"),
    value_col: str = "value",
    freq: str = "h",
    num_partitions: int | None = None,
):
    """Ordered downsample (OHLC resample): one row per (entity, time bucket)
    with open (first by order), close (last), min, max, sum, count of
    ``value_col``. The reference's per-segment reduction (SURVEY.md M20)
    generalized to calendar buckets — the series-compaction step before
    cheap coarse-grained features.

    Scale design: ONE entity-hash exchange (``partitioned_apply`` — same
    partitioner as every temporal stage), then a vectorized
    ``groupby([entity, bucket])`` with positional first/last (the frame
    arrives sorted by ``(entity, *order_cols)``, so first/last are exact
    order statistics, not arrival artifacts). Output volume = bucket count.
    """
    import numpy as np
    import pandas as pd

    from rp_extract_ray.schema import DEFAULT_NUM_PARTITIONS
    from rp_extract_ray.stages.partition import partitioned_apply

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        tagged = pdf.assign(_bucket=pdf[ts_col].dt.floor(freq))
        gb = tagged.groupby([entity_col, "_bucket"], sort=False)
        g = (
            gb[value_col]
            .agg(min_v="min", max_v="max", sum_v="sum", n="size")
            .reset_index()
        )
        # POSITIONAL first/last rows (head/tail on the ordered frame), not
        # pandas agg first/last which skip NaN — a null first value must
        # surface as null, matching SQL first_value. MERGED on the group
        # keys (not positionally aligned): head-order is first-occurrence
        # while tail-order is last-occurrence, and the two only coincide
        # when groups are contiguous — true for (ts, ...) order but not for
        # arbitrary order_cols this generic stage accepts.
        first = gb.head(1)[[entity_col, "_bucket", value_col]].rename(
            columns={value_col: "open_v"}
        )
        last = gb.tail(1)[[entity_col, "_bucket", value_col]].rename(
            columns={value_col: "close_v"}
        )
        g = g.merge(first, on=[entity_col, "_bucket"]).merge(
            last, on=[entity_col, "_bucket"]
        )
        g = g.rename(columns={"_bucket": "bucket"})
        g["n"] = g["n"].astype(np.int64)
        return g[[entity_col, "bucket", "open_v", "close_v",
                  "min_v", "max_v", "sum_v", "n"]]

    return partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=order_cols,
        num_partitions=num_partitions or DEFAULT_NUM_PARTITIONS,
    )


def time_grid_interpolate(
    ds,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols=("ts",),
    interval_s: float = 3600.0,
    round_to: int = 6,
    num_partitions: int | None = None,
):
    """Linear-interpolation resample: each entity's irregular value series
    evaluated on the fixed time grid INSIDE its [min ts, max ts] span —
    the lerp complement of the ffill grid (``time_grid_aggregate`` +
    ``q_time_grid``) and of the reference's signal ``resample`` (S6).
    Duplicate (entity, ts) rows collapse to max(value) first (the same
    deterministic tie winner as the as-of join's ``dedup_right='max'``).

    One entity-hash exchange; per run it is one ``np.interp`` call over the
    deduped node arrays (C kernel). Output: (entity, bucket, v).
    """
    import numpy as np
    import pandas as pd

    from rp_extract_ray.schema import DEFAULT_NUM_PARTITIONS
    from rp_extract_ray.stages.partition import partitioned_apply, run_bounds

    step = float(interval_s)

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        if not len(pdf):
            return pd.DataFrame(
                {entity_col: [], "bucket": pd.Series([], dtype="datetime64[us]"),
                 "v": pd.Series([], dtype=np.float64)}
            )
        run_starts, run_ends = run_bounds(starts, len(pdf))
        t = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64) / 1e6
        val = pdf[value_col].to_numpy(dtype=np.float64)
        ents, buckets, out = [], [], []
        ent_arr = pdf[entity_col].to_numpy()
        for s, e in zip(run_starts, run_ends):
            tt, vv = t[s:e], val[s:e]
            # collapse duplicate ts to max(value): segmented max over runs
            # of equal ts (already sorted)
            keep = np.concatenate([tt[1:] != tt[:-1], [True]])
            seg_id = np.concatenate([[0], np.cumsum(tt[1:] != tt[:-1])])
            vmax = pd.Series(vv).groupby(seg_id).max().to_numpy()
            tu = tt[keep]
            g0 = np.ceil(tu[0] / step) * step
            g1 = np.floor(tu[-1] / step) * step
            if g1 < g0:
                continue
            grid = np.arange(g0, g1 + step / 2, step)
            out.append(np.interp(grid, tu, vmax))
            buckets.append(grid)
            ents.append(np.full(len(grid), ent_arr[s]))
        if not out:
            return pd.DataFrame(
                {entity_col: [], "bucket": pd.Series([], dtype="datetime64[us]"),
                 "v": pd.Series([], dtype=np.float64)}
            )
        from rp_extract_ray.functions.rounding import round_half_away

        return pd.DataFrame(
            {
                entity_col: np.concatenate(ents),
                "bucket": (np.concatenate(buckets) * 1e6).astype(np.int64).astype(
                    "datetime64[us]"
                ),
                "v": round_half_away(np.concatenate(out), round_to),
            }
        )

    return partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=order_cols,
        num_partitions=num_partitions or DEFAULT_NUM_PARTITIONS,
    )


def hopping_window_aggregate(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    value_col: str = "value",
    window_s: float = 3600.0,
    hop_s: float = 900.0,
    wstart_col: str = "wstart",
    sum_col: str = "wsum",
    count_col: str = "wn",
    num_partitions: int | None = None,
) -> Dataset:
    """Hopping (sliding, overlapping) time-window aggregate: sum + count of
    ``value_col`` per (entity, window), where windows are ``window_s`` long
    and advance by ``hop_s`` (epoch-aligned). Each event belongs to exactly
    ``window_s / hop_s`` windows — the streaming-SQL HOP / sliding-window
    shape (tumbling is the ``hop_s == window_s`` special case, already
    covered by :func:`time_grid_aggregate`).

    Scale design: the window-membership explode is a pure per-block Arrow/
    numpy kernel (``np.repeat`` of the row ids/values x a tiled offset
    vector — the row fan-out is the fixed small ratio ``window_s/hop_s``,
    the only memory knob), immediately map-side combined to one partial row
    per (entity, window, block) by ``grouped_reduce``'s arrow hash
    aggregate, so the ONE keyed exchange carries distinct keys per block,
    never the exploded rows. Window starts travel as int64 epoch-us through
    the exchange (8 B, hashable) and are cast to timestamp at the end.
    Emits only non-empty windows (SQL GROUP BY semantics); dense zero-fill
    is a grid cross (stages/pivot.py) downstream if needed.
    """
    hop_us = np.int64(round(hop_s * 1e6))
    win_us = np.int64(round(window_s * 1e6))
    n_win = int(win_us // hop_us)
    if n_win * hop_us != win_us:
        raise ValueError(
            f"hop_s must divide window_s (got {hop_s} / {window_s})"
        )
    offsets = (np.arange(n_win, dtype=np.int64) * hop_us)[::-1].copy()

    def explode(b: pa.Table) -> pa.Table:
        t = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (t // hop_us) * hop_us  # latest window containing the event
        n = len(b)
        ws = np.repeat(base, n_win) - np.tile(offsets, n)
        ent = np.repeat(
            b.column(entity_col).to_numpy(zero_copy_only=False), n_win
        )
        val = np.repeat(
            b.column(value_col).to_numpy(zero_copy_only=False), n_win
        )
        return pa.table({entity_col: ent, "_ws_us": ws, value_col: val})

    from rp_extract_ray.stages.groupops import grouped_reduce

    exploded = ds.select_columns(
        [entity_col, ts_col, value_col]
    ).map_batches(explode, batch_format="pyarrow")
    out = grouped_reduce(
        exploded,
        [entity_col, "_ws_us"],
        {sum_col: (value_col, "sum"), count_col: (value_col, "count")},
        num_partitions=num_partitions,
    )

    def finish(b: pa.Table) -> pa.Table:
        ws = b.column("_ws_us").cast(pa.timestamp("us"))
        b = b.drop_columns(["_ws_us"])
        return b.append_column(wstart_col, ws)

    return out.map_batches(finish, batch_format="pyarrow")


def hopping_window_distinct(
    ds: Dataset,
    *,
    ts_col: str = "ts",
    key_col: str = "conv_id",
    window_s: float = 3600.0,
    hop_s: float = 900.0,
    wstart_col: str = "wstart",
    count_col: str = "n_distinct",
    num_partitions: int | None = None,
) -> Dataset:
    """Distinct ``key_col`` values per hopping window (global windows, no
    entity key) — the streaming COUNT(DISTINCT) over sliding windows shape
    (active-users-per-hour-every-15-min). Exact two-exchange count-distinct:
    the window explode (same fixed ``window_s/hop_s`` fan-out kernel as
    :func:`hopping_window_aggregate`) feeds a (window, key) distinct
    exchange — map-side combined to distinct pairs per block — then a tiny
    per-window count reduce. No sketch: the distinct exchange carries 16
    B/pair; swap in ``functions/sketch.hll`` upstream when approximate
    counts suffice."""
    hop_us = np.int64(round(hop_s * 1e6))
    win_us = np.int64(round(window_s * 1e6))
    n_win = int(win_us // hop_us)
    if n_win * hop_us != win_us:
        raise ValueError(
            f"hop_s must divide window_s (got {hop_s} / {window_s})"
        )
    offsets = (np.arange(n_win, dtype=np.int64) * hop_us)[::-1].copy()

    def explode(b: pa.Table) -> pa.Table:
        t = b.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        base = (t // hop_us) * hop_us
        n = len(b)
        ws = np.repeat(base, n_win) - np.tile(offsets, n)
        key = np.repeat(
            b.column(key_col).to_numpy(zero_copy_only=False), n_win
        )
        return pa.table({"_ws_us": ws, key_col: key})

    from rp_extract_ray.stages.groupops import grouped_reduce

    exploded = ds.select_columns([ts_col, key_col]).map_batches(
        explode, batch_format="pyarrow"
    )
    distinct = grouped_reduce(
        exploded, ["_ws_us", key_col], {"_n": (key_col, "count")},
        num_partitions=num_partitions,
    )
    out = grouped_reduce(
        distinct.select_columns(["_ws_us", key_col]),
        "_ws_us",
        {count_col: (key_col, "count")},
        num_partitions=num_partitions,
    )

    def finish(b: pa.Table) -> pa.Table:
        ws = b.column("_ws_us").cast(pa.timestamp("us"))
        return pa.table(
            {
                wstart_col: ws,
                count_col: b.column(count_col).cast(pa.int64()),
            }
        )

    return out.map_batches(finish, batch_format="pyarrow")


def ohlc_bars(
    ds: Dataset,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_col: str = "turn_idx",
    value_col: str = "value",
    bucket_s: float = 900.0,
    num_partitions: int | None = None,
) -> Dataset:
    """Open/high/low/close time bars per (entity, fixed bucket) — the
    resample-to-bars shape (first/last are ORDER-dependent aggregates the
    plain tumbling aggregate cannot express). Open/close carry SQL
    ``first_value``/``last_value`` semantics under the stable order
    ``(ts, order_col)``: the value of the boundary ROW, even if NULL;
    high/low/vsum/n are null-skipping (SQL aggregate semantics; an
    all-null bar gets NULL vsum).

    Scale design: per-block pandas partial collapses each block to one row
    per (entity, bucket) carrying the block-local open/close tagged with
    their int64 (epoch_us, order) coordinates plus min/max/sum/count
    partials, so the ONE keyed exchange (``partitioned_apply`` on the
    entity) ships distinct bars per block, never rows. The merge re-picks
    the lexicographically earliest open / latest close across block
    partials with two boundary-mask passes (no per-group Python), exact
    because (ts, order) is unique per row.
    """
    import pandas as pd

    from rp_extract_ray.stages.partition import (
        DEFAULT_NUM_PARTITIONS,
        partitioned_apply,
    )

    bus = np.int64(round(bucket_s * 1e6))
    PCOLS = [entity_col, "_b", "_o_us", "_o_id", "open", "_c_us", "_c_id",
             "close", "high", "low", "vsum", "n"]

    def partial(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) == 0:
            return pd.DataFrame({c: [] for c in PCOLS})
        t = pdf[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        oid = pdf[order_col].to_numpy(dtype=np.int64)
        v = pdf[value_col].to_numpy(dtype=np.float64)
        w = pd.DataFrame(
            {
                entity_col: pdf[entity_col].to_numpy(),
                "_b": (t // bus) * bus,
                "_t": t,
                "_oid": oid,
                "v": v,
            }
        ).sort_values([entity_col, "_b", "_t", "_oid"], kind="mergesort",
                      ignore_index=True)
        keys = [entity_col, "_b"]
        first = ~w.duplicated(keys, keep="first").to_numpy()
        last = ~w.duplicated(keys, keep="last").to_numpy()
        g = w.groupby(keys, sort=False)["v"]
        agg = g.agg(high="max", low="min", vsum="sum", n="count").reset_index()
        # groupby(sort=False) yields groups in first-occurrence order ==
        # sorted order here, so boundary slices align with agg rows
        agg["_o_us"] = w["_t"].to_numpy()[first]
        agg["_o_id"] = w["_oid"].to_numpy()[first]
        agg["open"] = w["v"].to_numpy()[first]
        agg["_c_us"] = w["_t"].to_numpy()[last]
        agg["_c_id"] = w["_oid"].to_numpy()[last]
        agg["close"] = w["v"].to_numpy()[last]
        agg["n"] = agg["n"].astype(np.int64)
        return agg[PCOLS]

    def merge(pdf: "pd.DataFrame", starts) -> "pd.DataFrame":
        if len(pdf) == 0:
            return pd.DataFrame(
                {c: [] for c in [entity_col, "_b", "open", "high", "low",
                                 "close", "vsum", "n"]}
            )
        keys = [entity_col, "_b"]
        # arrives sorted by (entity, _b, _o_us, _o_id): first mask == open
        first = ~pdf.duplicated(keys, keep="first").to_numpy()
        g = pdf.groupby(keys, sort=False)
        agg = g.agg(
            high=("high", "max"), low=("low", "min"),
            vsum=("vsum", "sum"), n=("n", "sum"),
        ).reset_index()
        agg["open"] = pdf["open"].to_numpy()[first]
        # close: re-sort by the close coordinate, pick each group's last
        c = pdf.sort_values([*keys, "_c_us", "_c_id"], kind="mergesort")
        clast = ~c.duplicated(keys, keep="last").to_numpy()
        agg["close"] = c["close"].to_numpy()[clast]
        agg["n"] = agg["n"].astype(np.int64)
        agg.loc[agg["n"] == 0, "vsum"] = np.nan
        return agg[[entity_col, "_b", "open", "high", "low", "close",
                    "vsum", "n"]]

    from rp_extract_ray.stages.partition import arrow_out

    parts = ds.select_columns(
        [entity_col, ts_col, order_col, value_col]
    ).map_batches(
        lambda b: arrow_out(partial(b.to_pandas())), batch_format="pyarrow"
    )
    out = partitioned_apply(
        parts, merge, entity_col=entity_col,
        order_cols=("_b", "_o_us", "_o_id"),
        num_partitions=num_partitions or DEFAULT_NUM_PARTITIONS,
    )

    def finish(b: pa.Table) -> pa.Table:
        ws = b.column("_b").cast(pa.timestamp("us"))
        b = b.drop_columns(["_b"])
        return b.append_column("wstart", ws)

    return out.map_batches(finish, batch_format="pyarrow")
