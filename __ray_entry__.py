"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at sf=0.01 and
compares against ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash). Column names AND float rounding match between
the Ray pipelines (rp_extract_ray.pipelines.*) and the SQL here.

No ray.init()/ray.shutdown() anywhere in this module or the library.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline: events -> transcript-shaped turns -> sessionize ->
    sliding-window SSD features -> backward as-of join of purchase values.
    One feature row per event at its point in time."""
    from rp_extract_ray.pipelines.flagship import flagship_events_pipeline

    return flagship_events_pipeline(SF0001)


def queries() -> dict[str, Callable[[str], Any]]:
    from rp_extract_ray.pipelines import documents as D
    from rp_extract_ray.pipelines import events as E
    from rp_extract_ray.pipelines import relational as R

    q: dict[str, Callable[[str], Any]] = {
        # temporal / point-in-time engine (SURVEY.md §2.5, §2.9, north rule)
        "lag_lead": E.q_lag_lead,
        "sessionize": E.q_sessionize,
        "session_agg": E.q_session_agg,
        "window_stats": E.q_window_stats,
        "asof_backward": lambda sf: E.q_asof(sf, "backward", "click", "purchase", "pvalue"),
        "asof_forward": lambda sf: E.q_asof(sf, "forward", "view", "error", "fvalue"),
        "backfill": E.q_backfill,
        "standardize": E.q_standardize,
        "time_grid": E.q_time_grid,
        "json_extract": E.q_json_extract,
        # relational coverage (SURVEY.md §2.5-§2.8)
        "class_counts": R.q_class_counts,
        "min_instances": R.q_min_instances,
        "baseline": R.q_baseline,
        "dup_check": R.q_dup_check,
        "dedup_exact": R.q_dedup_exact,
        "tpch_q1": R.q_tpch_q1,
        "join_agg": R.q_join_agg,
        "semi_join": R.q_semi_join,
        "anti_join": R.q_anti_join,
        "region_customers": R.q_region_customers,
        "topk": R.q_topk,
        "filter_sort": R.q_filter_sort,
        "distinct": R.q_distinct,
        # text analysis / dedup / similarity (training-data extensions)
        "token_count": D.q_token_count,
        "text_quality": D.q_text_quality,
        "langid": D.q_langid,                       # rows-only
        "fingerprint": D.q_fingerprint,             # rows-only
        "minhash_pairs": D.q_minhash_pairs,         # rows-only
        "simhash_pairs": D.q_simhash_pairs,         # rows-only
        "embedding_near_dup": D.q_embedding_near_dup,  # rows-only
        "knn_cosine": D.q_knn,
        "embedding_label_stats": D.q_embedding_label_stats,
        # full windowed/rhythm feature stages (rows-only; pytest oracles)
        "window_features_full": E.q_window_features_full,
        "rhythm_features": E.q_rhythm,
        "flagship_backfill": E.q_flagship,
    }
    return q


_W = "PARTITION BY user_id ORDER BY ts, event_id"
_GAP = f"coalesce(date_diff('microsecond', lag(ts) OVER ({_W}), ts)/1000000.0, 0)"


def oracle_sql() -> dict[str, str]:
    return {
        "lag_lead": f"""
            SELECT event_id, user_id, ts, value,
                   lag(value)    OVER ({_W}) AS value_lag1,
                   lag(value, 2) OVER ({_W}) AS value_lag2,
                   lead(value)   OVER ({_W}) AS value_lead1,
                   round({_GAP}, 6) AS gap_s
            FROM events""",
        "sessionize": f"""
            WITH b AS (
              SELECT event_id, user_id, ts, {_GAP} AS gap_s,
                     CASE WHEN {_GAP} > 1800 THEN 1 ELSE 0 END AS boundary
              FROM events)
            SELECT event_id, user_id, ts, round(gap_s, 6) AS gap_s,
                   CAST(sum(boundary) OVER ({_W} ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS session_id
            FROM b""",
        "session_agg": f"""
            WITH b AS (
              SELECT event_id, user_id, ts, value,
                     CASE WHEN {_GAP} > 1800 THEN 1 ELSE 0 END AS boundary
              FROM events),
            s AS (
              SELECT *, CAST(sum(boundary) OVER ({_W} ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_id
              FROM b)
            SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
                   min(ts) AS ts_min, max(ts) AS ts_max,
                   round(date_diff('microsecond', min(ts), max(ts))/1000000.0, 6)
                     AS duration_s,
                   round(sum(value), 6) AS value_sum
            FROM s GROUP BY user_id, session_id""",
        "window_stats": f"""
            SELECT event_id, user_id, ts, value,
                   round(avg(value)     OVER w, 6) AS value_wmean,
                   round(var_pop(value) OVER w, 6) AS value_wvar,
                   round(median(value)  OVER w, 6) AS value_wmedian,
                   min(value) OVER w AS value_wmin,
                   max(value) OVER w AS value_wmax,
                   CAST(count(value) OVER w AS BIGINT) AS value_wcount
            FROM events
            WINDOW w AS ({_W} ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)""",
        "asof_backward": """
            WITH r AS (SELECT user_id, ts, max(value) AS pvalue FROM events
                       WHERE event_type='purchase' GROUP BY user_id, ts),
                 l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type='click')
            SELECT l.event_id, l.user_id, l.ts, l.value, round(r.pvalue, 6) AS pvalue
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "asof_forward": """
            WITH r AS (SELECT user_id, ts, max(value) AS fvalue FROM events
                       WHERE event_type='error' GROUP BY user_id, ts),
                 l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type='view')
            SELECT l.event_id, l.user_id, l.ts, l.value, round(r.fvalue, 6) AS fvalue
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts""",
        "backfill": f"""
            SELECT event_id, user_id, ts,
                   last_value(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
                     OVER ({_W} ROWS UNBOUNDED PRECEDING) AS last_purchase_value
            FROM events""",
        "json_extract": r"""
            SELECT event_id,
                   CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS k
            FROM events""",
        "time_grid": """
            SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 6) AS value_sum,
                   round(avg(value), 6) AS value_mean,
                   min(value) AS value_min, max(value) AS value_max
            FROM events GROUP BY user_id, bucket""",
        "standardize": """
            SELECT event_id, value,
                   round((value - avg(value) OVER ()) / stddev_pop(value) OVER (), 6)
                     AS value_z
            FROM events""",
        "class_counts": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang""",
        "min_instances": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents
            GROUP BY lang HAVING count(*) >= 50""",
        "baseline": """
            SELECT CAST(sum(n) AS BIGINT) AS n_total, CAST(max(n) AS BIGINT) AS n_max,
                   round(max(n) / CAST(sum(n) AS DOUBLE), 6) AS baseline
            FROM (SELECT count(*) AS n FROM documents GROUP BY lang)""",
        "dup_check": """
            SELECT lang, source, CAST(count(*) AS BIGINT) AS n FROM documents
            GROUP BY lang, source HAVING count(*) > 1""",
        "dedup_exact": """
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, CAST(count(*) AS BIGINT) AS n
            FROM documents GROUP BY text""",
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue,
                   round(avg(l_discount), 6) AS avg_disc,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "join_agg": """
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
                   round(sum(o_totalprice), 2) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
        "anti_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 400000.0)""",
        "region_customers": """
            SELECT r_name, CAST(count(*) AS BIGINT) AS n_customers
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name""",
        "topk": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
        "filter_sort": """
            SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders
            WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
            ORDER BY o_orderkey""",
        "distinct": """
            SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custkeys,
                   (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem)
                     AS n_partkeys
            FROM orders""",
        "token_count": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                     AS n_tokens,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                     AS n_ws_tokens
            FROM documents""",
        "text_quality": r"""
            SELECT doc_id,
                   round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
                         / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS alpha_ratio,
                   round(length(regexp_replace(text, '[^0-9]', '', 'g'))
                         / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS digit_ratio,
                   round((length(text) - length(regexp_replace(text, '\s', '', 'g')))
                         / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS space_ratio
            FROM documents""",
        "knn_cosine": """
            SELECT vec_id,
                   round(CAST(list_cosine_similarity(
                       embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS DOUBLE),
                         4) AS cos
            FROM embeddings
            ORDER BY list_cosine_similarity(
                       embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 0)) DESC,
                     vec_id
            LIMIT 10""",
        "embedding_label_stats": """
            SELECT CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) AS n,
                   round(avg(sqrt(list_sum(
                       list_transform(embedding,
                                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 4)
                     AS mean_norm
            FROM embeddings GROUP BY label""",
    }
