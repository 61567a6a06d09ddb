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
        "range_join": E.q_range_join,
        "asof_backward": lambda sf: E.q_asof(sf, "backward", "click", "purchase", "pvalue"),
        "asof_forward": lambda sf: E.q_asof(sf, "forward", "view", "error", "fvalue"),
        "asof_tolerance": lambda sf: E.q_asof(
            sf, "backward", "click", "purchase", "pvalue", tolerance_s=86400.0
        ),
        "asof_nearest": lambda sf: E.q_asof(sf, "nearest", "click", "error", "nvalue"),
        "backfill": E.q_backfill,
        "ewma": E.q_ewma,
        "funnel": E.q_funnel,
        "pivot": E.q_pivot,
        "group_standardize": E.q_group_standardize,
        "cumulative": E.q_cumulative,
        "feature_matrix": E.q_feature_matrix,
        "rank_features": E.q_rank_features,
        "standardize": E.q_standardize,
        "merge_intervals": E.q_merge_intervals,
        "time_bucket": E.q_time_bucket,
        "cohort_retention": E.q_cohort_retention,
        "flatten_stream": E.q_flatten_stream,
        "transitions": E.q_transitions,
        "value_share": E.q_value_share,
        "trend_slope": E.q_trend_slope,
        "ntile": E.q_ntile,
        "winsorize": E.q_winsorize,
        "longest_streak": E.q_longest_streak,
        "time_grid": E.q_time_grid,
        "time_grid_lerp": E.q_time_grid_lerp,
        "time_window": E.q_time_window,
        "rolling_median": E.q_rolling_median,
        "minmax_scale": E.q_minmax_scale,
        "group_minmax": E.q_group_minmax,
        "latest_per_key": E.q_latest_per_key,
        # relational coverage (SURVEY.md §2.5-§2.8)
        "class_counts": R.q_class_counts,
        "min_instances": R.q_min_instances,
        "baseline": R.q_baseline,
        "dup_check": R.q_dup_check,
        "dedup_exact": R.q_dedup_exact,
        "dedup_normalized": D.q_dedup_normalized,
        "tpch_q1": R.q_tpch_q1,
        "tpch_q3": R.q_tpch_q3,
        "tpch_q6": R.q_tpch_q6,
        "tpch_q5": R.q_tpch_q5,
        "tpch_q10": R.q_tpch_q10,
        "tpch_q18": R.q_tpch_q18,
        "tpch_q14": R.q_tpch_q14,
        "tpch_q12": R.q_tpch_q12,
        "tpch_q15": R.q_tpch_q15,
        "tpch_q17": R.q_tpch_q17,
        "tpch_q7": R.q_tpch_q7,
        "tpch_q8": R.q_tpch_q8,
        "tpch_q19": R.q_tpch_q19,
        "tpch_q21": R.q_tpch_q21,
        "tpch_q22": R.q_tpch_q22,
        "histogram": R.q_histogram,
        "union_keys": R.q_union_keys,
        "intersect_keys": R.q_intersect_keys,
        "except_keys": R.q_except_keys,
        "order_count_dist": R.q_order_count_dist,
        "large_orders": R.q_large_orders,
        "priority_returns": R.q_priority_returns,
        "join_agg": R.q_join_agg,
        "semi_join": R.q_semi_join,
        "bloom_semi_join": R.q_bloom_semi_join,
        "anti_join": R.q_anti_join,
        "full_outer_join": R.q_full_outer_join,
        "region_customers": R.q_region_customers,
        "topk": R.q_topk,
        "topk_per_group": R.q_topk_per_group,
        "stratified_sample": R.q_stratified_sample,
        "weighted_sample": R.q_weighted_sample,
        "group_quantiles": R.q_group_quantiles,
        "group_quantiles_disc": R.q_group_quantiles_disc,
        "approx_quantiles": R.q_approx_quantiles,
        "sample": R.q_sample,
        "top_terms": R.q_top_terms,
        "filter_sort": R.q_filter_sort,
        "distinct": R.q_distinct,
        "cube_orders": R.q_cube_orders,
        "heavy_hitters": R.q_heavy_hitters,
        "range_partition": R.q_range_partition,
        "hll_distinct": R.q_hll_distinct,
        "cms_counts": R.q_cms_counts,
        "group_hll": R.q_group_hll,
        "group_distinct": R.q_group_distinct,
        "group_mode": E.q_group_mode,
        "group_mad": E.q_group_mad,
        "window_edges": E.q_window_edges,
        "rolling_corr": E.q_rolling_corr,
        "corpus_diff": D.q_corpus_diff,
        "regex_extract": D.q_regex_extract,
        "hopping_window": E.q_hopping_window,
        "skyline": E.q_skyline,
        "interval_overlap": E.q_interval_overlap,
        "bm25": D.q_bm25,
        "target_encode": E.q_target_encode,
        "quantile_normalize": E.q_quantile_normalize,
        "connected_components": E.q_connected_components,
        "hopping_distinct": E.q_hopping_distinct,
        "debounce": E.q_debounce,
        "throttle": E.q_throttle,
        "band_join": E.q_band_join,
        "concurrency": E.q_concurrency,
        "weighted_median": E.q_weighted_median,
        "time_weighted_avg": E.q_time_weighted_avg,
        "cdc_merge": D.q_cdc_merge,
        "chi_square": E.q_chi_square,
        "mutual_information": E.q_mutual_information,
        "group_spearman": E.q_group_spearman,
        "rolling_distinct": E.q_rolling_distinct,
        "cusum": E.q_cusum,
        "ohlc_bars": E.q_ohlc_bars,
        "group_entropy": E.q_group_entropy,
        "welch_t": E.q_welch_t,
        "role_report": E.q_role_report,
        "rolling_zscore": E.q_rolling_zscore,
        "pagerank": E.q_pagerank,
        "triangle_count": E.q_triangle_count,
        "interval_gaps": E.q_interval_gaps,
        "pct_change": E.q_pct_change,
        "keyword_totals": D.q_keyword_totals,
        "path_counts": E.q_path_counts,
        "mann_whitney": E.q_mann_whitney,
        "autocorr": E.q_autocorr,
        "clustering_coeff": E.q_clustering_coeff,
        "response_latency": E.q_response_latency,
        "group_geomean": E.q_group_geomean,
        "ks_statistic": E.q_ks_statistic,
        "scd2_intervals": E.q_scd2_intervals,
        "type_jaccard": E.q_type_jaccard,
        "conversion_time": E.q_conversion_time,
        "degree_histogram": E.q_degree_histogram,
        "hashed_features": D.q_hashed_features,
        "compression_ratio": D.q_compression_ratio,
        "pagerank_weighted": E.q_pagerank_weighted,
        "dq_violations": E.q_dq_violations,
        "top_terms_per_lang": D.q_top_terms_per_lang,
        "embedding_drift": D.q_embedding_drift,
        "group_winsorize": E.q_group_winsorize,
        "window_argmax": E.q_window_argmax,
        "interarrival_hist": E.q_interarrival_hist,
        "daily_change": E.q_daily_change,
        "sorted_neighborhood": D.q_sorted_neighborhood,
        "survival_km": E.q_survival_km,
        "ccf_profile": E.q_ccf_profile,
        "transition_entropy": E.q_transition_entropy,
        "burstiness": E.q_burstiness,
        "active_users": E.q_active_users,
        "new_vs_returning": E.q_new_vs_returning,
        "activity_gini": E.q_activity_gini,
        "daily_quantiles": E.q_daily_quantiles,
        "group_trimmed_mean": E.q_group_trimmed_mean,
        "median_centered": E.q_median_centered,
        "lorenz_deciles": E.q_lorenz_deciles,
        "hourly_profile": E.q_hourly_profile,
        "sessions_per_user": E.q_sessions_per_user,
        "user_zscore": E.q_user_zscore,
        "conversion_ci": E.q_conversion_ci,
        "cohort_ltv": E.q_cohort_ltv,
        "dense_grid": E.q_dense_grid,
        "rollup_orders": R.q_rollup_orders,
        "group_corr": R.q_group_corr,
        "unpivot": R.q_unpivot,
        "event_paths": E.q_event_paths,
        "cooccurrence": E.q_cooccurrence,
        "embedding_norms": D.q_embedding_norms,
        # text analysis / dedup / similarity (training-data extensions)
        "hash_split": D.q_hash_split,
        "mix_weighted": D.q_mix_weighted,
        "replicate_weighted": D.q_replicate_weighted,
        "domain_cap": D.q_domain_cap,
        "weighted_avg": R.q_weighted_avg,
        "profile_columns": R.q_profile_columns,
        "token_count": D.q_token_count,
        "redact": D.q_redact,
        "pack_sequences": D.q_pack_sequences,
        "pack_stats": D.q_pack_stats,
        "text_quality": D.q_text_quality,
        "char_entropy": D.q_char_entropy,
        "edit_distance_pairs": D.q_edit_distance_pairs,
        "embedding_covariance": D.q_embedding_covariance,
        "pca_variance": D.q_pca_variance,
        "lm_score": D.q_lm_score,
        "curation": D.q_curation,
        "nb_classify": D.q_nb_classify,
        "tfidf_top_terms": D.q_tfidf,
        "quantile_filter": D.q_quantile_filter,
        "token_explode": D.q_token_explode,
        "token_ids": D.q_token_ids,
        "bigram_pmi": D.q_bigram_pmi,
        "boilerplate": D.q_boilerplate,
        "repetition": D.q_repetition,
        "boilerplate_share": D.q_boilerplate_share,
        "json_extract": E.q_json_extract,
        "langid": D.q_langid,
        "fingerprint": D.q_fingerprint,
        "dup_spans": D.q_dup_spans,
        "minhash_pairs": D.q_minhash_pairs,
        "ngram_jaccard_pairs": D.q_ngram_jaccard,
        "contamination": D.q_contamination,
        "simhash_pairs": D.q_simhash_pairs,
        "near_dup_clusters": D.q_near_dup_clusters,
        "dedup_drop": D.q_dedup_drop,
        "embedding_near_dup": D.q_embedding_near_dup,
        "cosine_pairs": D.q_cosine_pairs,
        "knn_cosine": D.q_knn,
        "knn_ivf": D.q_knn_ivf,
        "knn_lsh": D.q_knn_lsh,
        "embedding_label_stats": D.q_embedding_label_stats,
        "kmeans_clusters": D.q_kmeans,
        # full windowed/rhythm feature stages
        "window_features_full": E.q_window_features_full,
        "rhythm_features": E.q_rhythm,
        "rhythm_segments": E.q_rhythm_segments,
        "ring_stream": E.q_ring_stream,
        "ring_stream_sharded": E.q_ring_stream_sharded,
        "flagship_backfill": E.q_flagship,
    }
    return q


_JACCARD_SQL = r"""
    WITH sh AS (
      SELECT DISTINCT doc_id, substring(text, CAST(u.i AS INTEGER), 5) AS g
      FROM documents,
           LATERAL unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u(i)
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           round(ni / CAST(ca.n + cb.n - ni AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN cnt ca ON ca.doc_id = id_a
    JOIN cnt cb ON cb.doc_id = id_b
    WHERE ni / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.5"""

# transitive closure (recursive CTE) over the exact-Jaccard pair set:
# min reachable id == the engine's min-label connected components
_CLUSTERS_CTE = r"""
    WITH RECURSIVE sh AS (
      SELECT DISTINCT doc_id, substring(text, CAST(u.i AS INTEGER), 5) AS g
      FROM documents,
           LATERAL unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS u(i)
    ),
    cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS ni
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
      SELECT id_a, id_b FROM inter
      JOIN cnt ca ON ca.doc_id = id_a
      JOIN cnt cb ON cb.doc_id = id_b
      WHERE ni / CAST(ca.n + cb.n - ni AS DOUBLE) >= 0.5
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs),
    reach AS (
      SELECT u AS id, u AS lab FROM edges
      UNION
      SELECT e.v AS id, r.lab AS lab FROM reach r JOIN edges e ON e.u = r.id
    ),
    clusters AS (
      SELECT CAST(id AS BIGINT) AS id, CAST(min(lab) AS BIGINT) AS cluster_id
      FROM reach GROUP BY id
    )"""

_CLUSTERS_SQL = _CLUSTERS_CTE + "\n    SELECT id, cluster_id FROM clusters"

_DEDUP_DROP_SQL = _CLUSTERS_CTE + r"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id FROM documents
    WHERE doc_id NOT IN (SELECT id FROM clusters WHERE id <> cluster_id)"""


def _embedding_bucket_sql(n_planes: int = 4, seed: int = 5, dim: int = 64) -> str:
    """Bucket expression replicating stages/dedup.embedding_near_dup's
    hyperplane LSH: the seed-deterministic planes become SQL literals, so
    DuckDB computes the identical sign-pattern bucket in float64."""
    import numpy as np

    planes = np.random.default_rng(seed).normal(size=(dim, n_planes))
    terms = []
    for j in range(n_planes):
        lit = "[" + ", ".join(repr(float(x)) for x in planes[:, j]) + "]"
        terms.append(
            f"(CASE WHEN list_inner_product(CAST(embedding AS DOUBLE[]), {lit}) > 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


# cast inputs (not just the result) to DOUBLE: on FLOAT lists DuckDB
# accumulates in float32 (~1e-7 error), enough to flip round-4 digits
_COS_EXPR = (
    "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), "
    "CAST(b.embedding AS DOUBLE[]))"
)

_COSINE_PAIRS_SQL = f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({_COS_EXPR}, 4) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_EXPR} >= 0.25"""


def _embedding_near_dup_sql() -> str:
    return f"""
    WITH bk AS (SELECT vec_id, embedding, {_embedding_bucket_sql()} AS bucket
                FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, round({_COS_EXPR}, 4) AS cos
    FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_COS_EXPR} >= 0.25"""



def _curation_sql() -> str:
    """q_curation's oracle: the text-quality replica composed with
    per-language quantile_cont length cutoffs (both filters on the SAME
    rounded/raw values as the engine)."""
    return r"""
    WITH q AS (
        SELECT doc_id, lang,
               CAST(length(text) AS DOUBLE) AS len,
               CAST(greatest(length(text), 1) AS DOUBLE) AS n,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
               length(text) - length(regexp_replace(text, '\s', '', 'g')) AS n_space
        FROM documents),
    qq AS (
        SELECT doc_id, lang, len,
               round(least(greatest(
                   0.5 * (n_alpha / n)
                   + 0.3 * least((n_space / n) / 0.2, 1.0)
                   + 0.2 * (1.0 - least((n_digit / n) / 0.3, 1.0)),
                   0.0), 1.0), 6) AS quality
        FROM q),
    cuts AS (SELECT lang, quantile_cont(len, 0.10) AS lo,
                    quantile_cont(len, 0.90) AS hi
             FROM qq GROUP BY lang)
    SELECT qq.doc_id, qq.lang, qq.quality
    FROM qq JOIN cuts USING (lang)
    WHERE qq.quality >= 0.5 AND qq.len >= cuts.lo AND qq.len <= cuts.hi"""


def _text_quality_sql() -> str:
    """Replicate stages/textstage.quality_score_batch in SQL: same RE2
    character classes, whole-word stopword regex, max(.,1) guards, and the
    composite clip formula computed over UNROUNDED doubles then rounded —
    identical IEEE operation order, so values match bit-for-bit at round-6."""
    from rp_extract_ray.stages.textstage import STOPWORD_RE

    stop_re = STOPWORD_RE.replace("'", "''")
    return rf"""
    WITH q AS (
        SELECT doc_id,
               CAST(greatest(length(text), 1) AS DOUBLE) AS n,
               length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha,
               length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit,
               length(text) - length(regexp_replace(text, '\s', '', 'g')) AS n_space,
               length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct,
               greatest(len(regexp_extract_all(text, '\S+')), 1) AS n_words,
               greatest(len(regexp_extract_all(lower(text), '[a-z0-9_]+')), 1)
                   AS n_tok,
               len(regexp_extract_all(lower(text), '{stop_re}')) AS n_stop
        FROM documents)
    SELECT doc_id,
           round(n_alpha / n, 6) AS alpha_ratio,
           round(n_digit / n, 6) AS digit_ratio,
           round(n_space / n, 6) AS space_ratio,
           round(n_punct / n, 6) AS punct_ratio,
           round(n_stop / CAST(n_tok AS DOUBLE), 6) AS stopword_ratio,
           round((n - n_space) / CAST(n_words AS DOUBLE), 6) AS mean_word_len,
           round(least(greatest(
               0.5 * (n_alpha / n)
               + 0.3 * least((n_space / n) / 0.2, 1.0)
               + 0.2 * (1.0 - least((n_digit / n) / 0.3, 1.0)),
               0.0), 1.0), 6) AS quality
    FROM q"""


def _langid_sql() -> str:
    """Replicate stages/textstage.LangId in SQL: per-language score = sum of
    non-overlapping profile-gram occurrence counts in lower(text) (the
    length-replace trick counts exactly like the engine's str.count), argmax
    with first-max-wins tie order = the profile dict order, 'unk' when every
    score is zero, conf = best/total guarded by 1e-9."""
    from rp_extract_ray.stages.textstage import _LANG_PROFILES

    langs = list(_LANG_PROFILES)
    score_cols = []
    for lang, grams in _LANG_PROFILES.items():
        terms = [
            f"(length(t) - length(replace(t, '{g}', ''))) / {len(g)}"
            for g in grams
        ]
        score_cols.append(f"({' + '.join(terms)}) AS s_{lang}")
    all_scores = ", ".join(f"s_{l}" for l in langs)
    # first-max-wins: lang i is argmax iff s_i >= every LATER score (all
    # earlier WHEN branches having failed implies every earlier score is
    # strictly below the running max)
    whens = []
    for i, l in enumerate(langs):
        rest = [f"s_{l} >= s_{m}" for m in langs[i + 1:]]
        cond = " AND ".join(rest) if rest else "TRUE"
        whens.append(f"WHEN {cond} THEN '{l}'")
    case_pred = "CASE " + " ".join(whens) + " END"
    return f"""
    WITH t0 AS (SELECT doc_id, lang, lower(coalesce(text, '')) AS t
                FROM documents),
    sc AS (SELECT doc_id, lang, {", ".join(score_cols)} FROM t0)
    SELECT doc_id, lang,
           CASE WHEN greatest({all_scores}) = 0 THEN 'unk'
                ELSE {case_pred} END AS lang_pred,
           round(greatest({all_scores})
                 / greatest({" + ".join("s_" + l for l in langs)}, 1e-9), 6)
             AS lang_conf
    FROM sc"""


def _flagship_sql() -> str:
    """Generated oracle for the flagship backfill: events shaped to the
    transcript schema, turn stats, sessionize, k=16 window descriptors over
    (text_len, token_est, gap_s) via power sums + quantile_cont, backward
    ASOF join of the latest purchase value (ties collapsed by max, matching
    the pipeline's dedup_right='max')."""
    w = "PARTITION BY conv_id ORDER BY ts, turn_idx"
    f = f"{w} ROWS BETWEEN 15 PRECEDING AND CURRENT ROW"
    gap = (
        f"coalesce(date_diff('microsecond', lag(ts) OVER ({w}), ts)"
        "/1000000.0, 0)"
    )
    pieces, outs = [], []
    for s in ("text_len", "token_est", "gap_s"):
        mag = 2 if s == "gap_s" else 6  # see q_flagship: magnitude-bound
        magv = -2 if s == "gap_s" else 6  # variance is QUADRATIC in gap
        pieces.append(
            f"""avg({s}) OVER wf AS {s}_e1,
             avg({s}*{s}) OVER wf AS {s}_e2,
             avg({s}*{s}*{s}) OVER wf AS {s}_e3,
             avg({s}*{s}*{s}*{s}) OVER wf AS {s}_e4,
             var_pop({s}) OVER wf AS {s}_v,
             median({s}) OVER wf AS {s}_med,
             quantile_cont({s}, 0.25) OVER wf AS {s}_p25,
             quantile_cont({s}, 0.75) OVER wf AS {s}_p75,
             min({s}) OVER wf AS {s}_wmin,
             max({s}) OVER wf AS {s}_wmax,
             CAST(count({s}) OVER wf AS BIGINT) AS {s}_wcount"""
        )
        outs.append(
            f"""round({s}_e1, {mag}) AS {s}_wmean,
           round({s}_v, {magv}) AS {s}_wvar,
           round(CASE WHEN {s}_v <= 0 THEN 0.0
                      WHEN {s}_wcount = 2 THEN 0.0
                      ELSE ({s}_e3 - 3*{s}_e1*{s}_e2 + 2*{s}_e1*{s}_e1*{s}_e1)
                           / pow({s}_v, 1.5) END, 6) + 0 AS {s}_wskew,
           round(CASE WHEN {s}_v <= 0 THEN 0.0
                      WHEN {s}_wcount = 2 THEN 1.0
                      ELSE ({s}_e4 - 4*{s}_e1*{s}_e3 + 6*{s}_e1*{s}_e1*{s}_e2
                            - 3*pow({s}_e1, 4)) / ({s}_v*{s}_v) END, 6) + 0
             AS {s}_wkurt,
           round({s}_med, {mag}) AS {s}_wmedian,
           CAST({s}_wmin AS DOUBLE) AS {s}_wmin,
           CAST({s}_wmax AS DOUBLE) AS {s}_wmax,
           {s}_wcount,
           round({s}_p25, {mag}) AS {s}_wp25,
           round({s}_p75, {mag}) AS {s}_wp75"""
        )
    return rf"""
    WITH t0 AS (
      SELECT CAST(user_id AS VARCHAR) AS conv_id,
             CAST(event_id AS INTEGER) AS turn_idx,
             event_type AS role, props AS text,
             CAST(NULL AS VARCHAR) AS tool, ts, value
      FROM events),
    t1 AS (
      SELECT conv_id, turn_idx, role, text, tool, ts,
             CAST(length(coalesce(text, '')) AS BIGINT) AS text_len,
             CAST(len(regexp_extract_all(coalesce(text, ''), '\w+|[^\w\s]'))
               AS BIGINT) AS token_est,
             CAST(CASE WHEN role = 'user' THEN 1 ELSE 0 END AS TINYINT) AS is_user,
             CAST(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END AS TINYINT)
               AS is_assistant,
             CAST(CASE WHEN role = 'tool' THEN 1 ELSE 0 END AS TINYINT) AS is_tool,
             CAST(0 AS TINYINT) AS has_tool,
             {gap} AS gap_s
      FROM t0),
    t2 AS (
      SELECT *,
             CAST(sum(CASE WHEN gap_s > 1800 THEN 1 ELSE 0 END)
                  OVER ({w} ROWS UNBOUNDED PRECEDING) AS INTEGER) AS session_id,
             {",".join(pieces)}
      FROM t1
      WINDOW wf AS ({f})),
    pur AS (
      SELECT CAST(user_id AS VARCHAR) AS conv_id, ts, max(value) AS pvalue
      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
    SELECT t2.conv_id AS conv_id, turn_idx, role, text, tool, t2.ts AS ts,
           text_len, token_est,
           is_user, is_assistant, is_tool, has_tool,
           round(gap_s, 6) AS gap_s, session_id,
           {",".join(outs)},
           round(pur.pvalue, 6) AS value
    FROM t2 ASOF LEFT JOIN pur
      ON t2.conv_id = pur.conv_id AND t2.ts >= pur.ts"""


_W = "PARTITION BY user_id ORDER BY ts, event_id"
_GAP = f"coalesce(date_diff('microsecond', lag(ts) OVER ({_W}), ts)/1000000.0, 0)"


def _ewma_sql(alpha: float = 0.25, window: int = 8) -> str:
    """Bounded-window EWMA as explicit lag terms: numerator
    Σ_j (1-α)^j·lag(value,j), denominator Σ_j (1-α)^j·[lag non-null] —
    exactly stages/lag.ewma_within's formula (same weights, same null
    semantics), so round-6 values match."""
    r = 1.0 - alpha
    num_terms, den_terms = [], []
    for j in range(window):
        src = "value" if j == 0 else f"lag(value, {j}) OVER ({_W})"
        num_terms.append(f"coalesce({r!r}^{j} * ({src}), 0)")
        den_terms.append(f"(CASE WHEN ({src}) IS NOT NULL THEN {r!r}^{j} ELSE 0 END)")
    return f"""
            SELECT event_id, user_id, ts, value,
                   round(({" + ".join(num_terms)})
                         / ({" + ".join(den_terms)}), 6) AS value_ewma
            FROM events"""


def oracle_sql() -> dict[str, str]:
    from rp_extract_ray.pipelines import oracle_literals as _lit

    out = {
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
        # full windowed descriptor set: power-sum skew/kurt (population /
        # Pearson, NaN->0 via the zero-variance guard), quantile_cont ==
        # numpy linear interpolation; 0 round-6 mismatches vs the kernel
        "window_features_full": f"""
            WITH m AS (
              SELECT event_id, user_id, ts, value,
                     round({_GAP}, 6) AS gap_s,
                     avg(value) OVER w AS e1,
                     avg(value*value) OVER w AS e2,
                     avg(value*value*value) OVER w AS e3,
                     avg(value*value*value*value) OVER w AS e4,
                     var_pop(value) OVER w AS v,
                     median(value) OVER w AS med,
                     quantile_cont(value, 0.25) OVER w AS p25,
                     quantile_cont(value, 0.75) OVER w AS p75,
                     min(value) OVER w AS value_wmin,
                     max(value) OVER w AS value_wmax,
                     CAST(count(value) OVER w AS BIGINT) AS value_wcount
              FROM events
              WINDOW w AS ({_W} ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
            SELECT event_id, user_id, ts, value, gap_s,
                   round(e1, 6) AS value_wmean,
                   round(v, 6) AS value_wvar,
                   round(CASE WHEN v <= 0 THEN 0.0
                              WHEN value_wcount = 2 THEN 0.0
                              ELSE (e3 - 3*e1*e2 + 2*e1*e1*e1) / pow(v, 1.5)
                         END, 6) + 0 AS value_wskew,  -- +0: -0.0 -> 0.0
                   round(CASE WHEN v <= 0 THEN 0.0
                              WHEN value_wcount = 2 THEN 1.0
                              ELSE (e4 - 4*e1*e3 + 6*e1*e1*e2 - 3*pow(e1, 4))
                                   / (v*v)
                         END, 6) + 0 AS value_wkurt,
                   round(med, 6) AS value_wmedian,
                   value_wmin, value_wmax, value_wcount,
                   round(p25, 6) AS value_wp25,
                   round(p75, 6) AS value_wp75
            FROM m""",
        # the streaming ring path: window stats + gap + session boundaries,
        # all in one pass of a single stateful actor on the engine side
        "ring_stream": f"""
            WITH g AS (
              SELECT event_id, user_id, ts, value, {_GAP} AS gap_raw
              FROM events),
            m AS (
              SELECT event_id, user_id, ts, value,
                     round(gap_raw, 6) AS gap_s,
                     CAST(sum(CASE WHEN gap_raw > 1800 THEN 1 ELSE 0 END)
                          OVER ({_W} ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_id,
                     avg(value) OVER w AS e1,
                     avg(value*value) OVER w AS e2,
                     avg(value*value*value) OVER w AS e3,
                     avg(value*value*value*value) OVER w AS e4,
                     var_pop(value) OVER w AS v,
                     median(value) OVER w AS med,
                     quantile_cont(value, 0.25) OVER w AS p25,
                     quantile_cont(value, 0.75) OVER w AS p75,
                     min(value) OVER w AS value_wmin,
                     max(value) OVER w AS value_wmax,
                     CAST(count(value) OVER w AS BIGINT) AS value_wcount
              FROM g
              WINDOW w AS ({_W} ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
            SELECT event_id, user_id, ts, value, gap_s, session_id,
                   round(e1, 6) AS value_wmean,
                   round(v, 6) AS value_wvar,
                   round(CASE WHEN v <= 0 THEN 0.0
                              WHEN value_wcount = 2 THEN 0.0
                              ELSE (e3 - 3*e1*e2 + 2*e1*e1*e1) / pow(v, 1.5)
                         END, 6) + 0 AS value_wskew,
                   round(CASE WHEN v <= 0 THEN 0.0
                              WHEN value_wcount = 2 THEN 1.0
                              ELSE (e4 - 4*e1*e3 + 6*e1*e1*e2 - 3*pow(e1, 4))
                                   / (v*v)
                         END, 6) + 0 AS value_wkurt,
                   round(med, 6) AS value_wmedian,
                   value_wmin, value_wmax, value_wcount,
                   round(p25, 6) AS value_wp25,
                   round(p75, 6) AS value_wp75
            FROM m""",
        "range_join": """
            WITH iv AS (SELECT user_id, ts AS start_ts,
                               ts + INTERVAL 1 HOUR AS end_ts,
                               event_id AS iv_id, value AS iv_value
                        FROM events WHERE event_type = 'error'),
                 l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type = 'click')
            SELECT l.event_id, l.user_id, l.ts, l.value,
                   iv.iv_id, round(iv.iv_value, 6) AS iv_value
            FROM l JOIN iv ON l.user_id = iv.user_id
                          AND l.ts >= iv.start_ts AND l.ts <= iv.end_ts""",
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
        "dedup_normalized": r"""
            SELECT CAST(min(doc_id) AS BIGINT) AS doc_id,
                   CAST(count(*) AS BIGINT) AS n
            FROM (SELECT doc_id,
                         trim(regexp_replace(lower(text), '\s+', ' ', 'g'))
                           AS canon
                  FROM documents)
            GROUP BY canon""",
        "ntile": """
            SELECT event_id, user_id,
                   CAST(ntile(4) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS BIGINT)
                     AS tile
            FROM events""",
        "winsorize": """
            WITH c AS (SELECT user_id,
                              quantile_cont(value, 0.05) AS lo,
                              quantile_cont(value, 0.95) AS hi
                       FROM events GROUP BY user_id)
            SELECT e.event_id, e.user_id,
                   round(least(greatest(e.value, c.lo), c.hi), 6) AS value_w
            FROM events e JOIN c USING (user_id)""",
        # longest equal-value run per user; ties break to the EARLIEST run
        "longest_streak": """
            WITH o AS (SELECT user_id, event_type,
                              row_number() OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id) AS rn,
                              row_number() OVER (PARTITION BY user_id,
                                                              event_type
                                                 ORDER BY ts, event_id) AS rnt
                       FROM events),
                 isl AS (SELECT user_id, event_type,
                                CAST(count(*) AS BIGINT) AS len,
                                min(rn) AS first_rn
                         FROM o GROUP BY user_id, event_type, rn - rnt),
                 r AS (SELECT user_id, event_type AS streak_state,
                              len AS streak_len,
                              row_number() OVER (PARTITION BY user_id
                                                 ORDER BY len DESC, first_rn)
                                AS k
                       FROM isl)
            SELECT user_id, streak_state, streak_len FROM r WHERE k = 1""",
        # OLS slope per day, explicit sum formula with centered time on
        # both sides (identical arithmetic; regr_slope would differ in ulps)
        "trend_slope": """
            WITH m AS (SELECT user_id,
                              epoch(ts) - epoch(TIMESTAMP '2025-01-01') AS x,
                              value AS y
                       FROM events),
                 s AS (SELECT user_id, sum(x) AS sx, sum(y) AS sy,
                              sum(x * x) AS sxx, sum(x * y) AS sxy,
                              min(x) AS xmin, max(x) AS xmax,
                              CAST(count(*) AS BIGINT) AS n
                       FROM m GROUP BY user_id)
            SELECT user_id, n,
                   round(CASE WHEN xmax <= xmin THEN NULL
                         ELSE (n * sxy - sx * sy) / (n * sxx - sx * sx)
                              * 86400.0 END, 6) AS slope
            FROM s""",
        # totals in exact integer cents on BOTH sides (fixed-point rule):
        # identical division operands -> identical doubles at any scale
        "value_share": """
            SELECT event_id, user_id,
                   round(value / (sum(CAST(round(value * 100) AS BIGINT))
                                  OVER (PARTITION BY user_id) / 100.0), 6)
                     AS share
            FROM events""",
        "transitions": """
            WITH w AS (SELECT event_type AS from_state,
                              lead(event_type) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id) AS to_state
                       FROM events)
            SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n
            FROM w WHERE to_state IS NOT NULL
            GROUP BY from_state, to_state""",
        "flatten_stream": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS stream,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM events GROUP BY user_id""",
        # cohort retention: Monday-truncated weeks on both sides; offsets are
        # exact multiples of 7 days (both endpoints week-truncated)
        "cohort_retention": """
            WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cohort
                       FROM events GROUP BY user_id),
                 a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk
                       FROM events),
                 j AS (SELECT a.user_id, f.cohort,
                              CAST(date_diff('day', f.cohort, a.wk) // 7
                                   AS BIGINT) AS week_offset
                       FROM a JOIN f USING (user_id))
            SELECT CAST(cohort AS TIMESTAMP) AS cohort, week_offset,
                   CAST(count(*) AS BIGINT) AS n_users
            FROM j GROUP BY cohort, week_offset""",
        # ordered downsample: first/last are ORDER-BY-(ts,event_id) window
        # order statistics (constant within the group, so max() projects them)
        "time_bucket": """
            WITH b AS (SELECT user_id, date_trunc('hour', ts) AS bucket,
                              ts, event_id, value FROM events),
                 w AS (SELECT *,
                         first_value(value) OVER (
                             PARTITION BY user_id, bucket
                             ORDER BY ts, event_id) AS fv,
                         last_value(value) OVER (
                             PARTITION BY user_id, bucket
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND UNBOUNDED FOLLOWING) AS lv
                       FROM b)
            SELECT user_id, bucket,
                   round(max(fv), 6) AS open_v, round(max(lv), 6) AS close_v,
                   round(min(value), 6) AS min_v, round(max(value), 6) AS max_v,
                   round(sum(value), 6) AS sum_v,
                   CAST(count(*) AS BIGINT) AS n
            FROM w GROUP BY user_id, bucket""",
        # gaps-and-islands: prev_max = running max of end over EARLIER rows
        # (ROWS ... 1 PRECEDING); an island breaks where start > prev_max;
        # touching intervals (start == prev_max) merge — closed-interval
        # convention, same as the engine's `s > prev_max` test
        "merge_intervals": """
            WITH iv AS (SELECT user_id, ts AS start_ts,
                               ts + to_seconds(CAST(floor(value) * 60 AS BIGINT))
                                 AS end_ts
                        FROM events WHERE event_type = 'view'),
                 o AS (SELECT *, max(end_ts) OVER (
                           PARTITION BY user_id ORDER BY start_ts, end_ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         AS prev_max FROM iv),
                 g AS (SELECT *, CASE WHEN prev_max IS NULL
                                        OR start_ts > prev_max
                                      THEN 1 ELSE 0 END AS brk FROM o),
                 h AS (SELECT *, sum(brk) OVER (
                           PARTITION BY user_id ORDER BY start_ts, end_ts
                           ROWS UNBOUNDED PRECEDING) AS island FROM g)
            SELECT user_id, min(start_ts) AS start_ts, max(end_ts) AS end_ts,
                   CAST(count(*) AS BIGINT) AS n_merged
            FROM h GROUP BY user_id, island""",
        # nearest semantics: the right row minimizing |l.ts - r.ts|; on an
        # exact distance tie the EARLIER right row wins (merge_asof prefers
        # backward on ties — pinned by the ORDER BY r.ts ASC tie-break)
        "asof_nearest": """
            WITH r AS (SELECT user_id, ts, max(value) AS nvalue FROM events
                       WHERE event_type='error' GROUP BY user_id, ts),
                 l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type='click')
            SELECT l.event_id, l.user_id, l.ts, l.value,
                   round(m.nvalue, 6) AS nvalue
            FROM l LEFT JOIN LATERAL (
                SELECT r.nvalue FROM r WHERE r.user_id = l.user_id
                ORDER BY abs(epoch(l.ts) - epoch(r.ts)) ASC, r.ts ASC LIMIT 1
            ) m ON true""",
        # tolerance (watermark) semantics: the nearest prior match is kept
        # only when it falls inside the horizon — ASOF join, then NULL the
        # payload beyond the tolerance (if the NEAREST prior is outside the
        # horizon, no prior inside it exists, so this equals merge_asof's
        # tolerance)
        "asof_tolerance": """
            WITH r AS (SELECT user_id, ts, max(value) AS pvalue FROM events
                       WHERE event_type='purchase' GROUP BY user_id, ts),
                 l AS (SELECT event_id, user_id, ts, value FROM events
                       WHERE event_type='click')
            SELECT l.event_id, l.user_id, l.ts, l.value,
                   round(CASE WHEN l.ts - r.ts <= INTERVAL '86400' SECOND
                         THEN r.pvalue END, 6) AS pvalue
            FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""",
        "ewma": _ewma_sql(),
        # chained-minimum funnel: t_click is the first click at-or-after the
        # first view; t_purchase the first purchase at-or-after that click
        "funnel": """
            WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
                       WHERE event_type = 'view' GROUP BY user_id),
                 c AS (SELECT e.user_id, min(e.ts) AS t_click
                       FROM events e JOIN v ON e.user_id = v.user_id
                                          AND e.ts >= v.t_view
                       WHERE e.event_type = 'click' GROUP BY e.user_id),
                 p AS (SELECT e.user_id, min(e.ts) AS t_purchase
                       FROM events e JOIN c ON e.user_id = c.user_id
                                          AND e.ts >= c.t_click
                       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
            SELECT v.user_id, v.t_view, c.t_click, p.t_purchase,
                   CAST(1 + (CASE WHEN c.t_click IS NULL THEN 0 ELSE 1 END)
                          + (CASE WHEN p.t_purchase IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS steps_completed
            FROM v LEFT JOIN c ON v.user_id = c.user_id
                   LEFT JOIN p ON v.user_id = p.user_id""",
        # per-group z-score, population std, zero-variance -> 1 (M24 keyed);
        # round-6 on both sides absorbs summation-order float noise
        "group_standardize": """
            SELECT event_id, user_id, value,
                   round((value - avg(value) OVER w) /
                         (CASE WHEN stddev_pop(value) OVER w = 0
                               OR stddev_pop(value) OVER w IS NULL
                          THEN 1 ELSE stddev_pop(value) OVER w END), 6)
                     AS value_gz
            FROM events WINDOW w AS (PARTITION BY user_id)""",
        "pivot": """
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type='click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(sum(CASE WHEN event_type='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
                   CAST(sum(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(sum(CASE WHEN event_type='signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(sum(CASE WHEN event_type='view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   round(sum(CASE WHEN event_type='click' THEN value ELSE 0 END), 6) AS sum_click,
                   round(sum(CASE WHEN event_type='error' THEN value ELSE 0 END), 6) AS sum_error,
                   round(sum(CASE WHEN event_type='purchase' THEN value ELSE 0 END), 6) AS sum_purchase,
                   round(sum(CASE WHEN event_type='signup' THEN value ELSE 0 END), 6) AS sum_signup,
                   round(sum(CASE WHEN event_type='view' THEN value ELSE 0 END), 6) AS sum_view
            FROM events GROUP BY user_id""",
        "cumulative": f"""
            SELECT event_id, user_id, ts, value,
                   round(sum(value) OVER w, 6) AS value_csum,
                   CAST(count(value) OVER w AS BIGINT) AS value_ccount,
                   min(value) OVER w AS value_cmin,
                   max(value) OVER w AS value_cmax
            FROM events
            WINDOW w AS ({_W} ROWS UNBOUNDED PRECEDING)""",
        "rank_features": """
            SELECT event_id, user_id, value,
                   CAST(rank() OVER wv AS BIGINT) AS value_rank,
                   round(percent_rank() OVER wv, 6) AS value_prank
            FROM events
            WINDOW wv AS (PARTITION BY user_id ORDER BY value)""",
        # feature-store spine: chained ASOF joins; equal-ts dup collapse via
        # per-column max on both sides (same contract as asof_backward)
        "feature_matrix": f"""
            WITH s AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type='purchase'),
                 c AS (SELECT user_id, ts, max(value) AS f_click_value
                       FROM events WHERE event_type='click'
                       GROUP BY user_id, ts),
                 cum0 AS (SELECT user_id, ts,
                                 sum(value) OVER w AS csum,
                                 count(value) OVER w AS ccount
                          FROM events
                          WINDOW w AS ({_W} ROWS UNBOUNDED PRECEDING)),
                 cum AS (SELECT user_id, ts,
                                max(csum) AS f_sum_todate,
                                CAST(max(ccount) AS BIGINT) AS f_n_todate
                         FROM cum0 GROUP BY user_id, ts)
            SELECT s.event_id, s.user_id, s.ts,
                   round(c.f_click_value, 6) AS f_click_value,
                   round(m.f_sum_todate, 6) AS f_sum_todate,
                   m.f_n_todate
            FROM s
            ASOF LEFT JOIN c ON s.user_id = c.user_id AND s.ts >= c.ts
            ASOF LEFT JOIN cum m ON s.user_id = m.user_id AND s.ts >= m.ts""",
        "backfill": f"""
            SELECT event_id, user_id, ts,
                   last_value(CASE WHEN event_type='purchase' THEN value END IGNORE NULLS)
                     OVER ({_W} ROWS UNBOUNDED PRECEDING) AS last_purchase_value
            FROM events""",
        "time_grid": """
            SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(value), 6) AS value_sum,
                   round(avg(value), 6) AS value_mean,
                   min(value) AS value_min, max(value) AS value_max
            FROM events GROUP BY user_id, bucket""",
        # lerp resample: grid inside each user's span; duplicate-ts nodes
        # collapse to max(value) on both sides; same lerp formula
        "time_grid_lerp": """
            WITH d AS (SELECT user_id, ts, max(value) AS v FROM events
                       GROUP BY user_id, ts),
                 span AS (SELECT user_id, min(ts) AS lo, max(ts) AS hi
                          FROM d GROUP BY user_id),
                 grid AS (SELECT user_id,
                                 TIMESTAMP '1970-01-01' + to_seconds(u.g)
                                   AS bucket
                          FROM span, LATERAL unnest(range(
                               CAST(ceil(epoch(lo) / 3600) AS BIGINT) * 3600,
                               CAST(floor(epoch(hi) / 3600) AS BIGINT) * 3600
                                 + 1,
                               3600)) AS u(g)),
                 l AS (SELECT g.user_id, g.bucket,
                              p.ts AS t0, p.v AS v0, n.ts AS t1, n.v AS v1
                       FROM grid g
                       JOIN LATERAL (SELECT ts, v FROM d
                                     WHERE d.user_id = g.user_id
                                       AND d.ts <= g.bucket
                                     ORDER BY ts DESC LIMIT 1) p ON true
                       JOIN LATERAL (SELECT ts, v FROM d
                                     WHERE d.user_id = g.user_id
                                       AND d.ts >= g.bucket
                                     ORDER BY ts ASC LIMIT 1) n ON true)
            SELECT user_id, bucket,
                   round(CASE WHEN t1 = t0 THEN v0
                         ELSE v0 + (v1 - v0) * (epoch(bucket) - epoch(t0))
                                   / (epoch(t1) - epoch(t0)) END, 6) AS v
            FROM l""",
        "time_window": """
            SELECT event_id, user_id, ts, value,
                   round(sum(value) OVER w, 6) AS value_tsum,
                   CAST(count(value) OVER w AS BIGINT) AS value_tcnt,
                   round(sum(value) OVER w
                         / greatest(count(value) OVER w, 1), 6) AS value_tmean
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)""",
        "standardize": """
            SELECT event_id, value,
                   round((value - avg(value) OVER ()) / stddev_pop(value) OVER (), 6)
                     AS value_z
            FROM events""",
        # trailing k=5 rolling median; quantile_cont == np.nanquantile 'linear'
        "rolling_median": f"""
            SELECT event_id, user_id, ts, value,
                   round(quantile_cont(value, 0.5)
                         OVER ({_W} ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)
                     AS value_rq50
            FROM events""",
        # global [0,1] min-max; zero-range -> 0.0 (engine guard; can't fire
        # on this corpus but keeps the expressions aligned)
        "minmax_scale": """
            SELECT event_id, value,
                   round(CASE WHEN max(value) OVER () = min(value) OVER ()
                              THEN 0.0
                              ELSE (value - min(value) OVER ())
                                   / (max(value) OVER () - min(value) OVER ())
                         END, 6) AS value_mm
            FROM events""",
        "group_minmax": """
            SELECT event_id, event_type, value,
                   round(CASE WHEN max(value) OVER w = min(value) OVER w
                              THEN 0.0
                              ELSE (value - min(value) OVER w)
                                   / (max(value) OVER w - min(value) OVER w)
                         END, 6) AS value_gmm
            FROM events WINDOW w AS (PARTITION BY event_type)""",
        # snapshot dedup: newest row per user, (ts, event_id) total order
        "latest_per_key": """
            SELECT event_id, user_id, ts, round(value, 6) AS value
            FROM (SELECT event_id, user_id, ts, value,
                         row_number() OVER (PARTITION BY user_id
                                            ORDER BY ts DESC, event_id DESC)
                           AS rn
                  FROM events)
            WHERE rn = 1""",
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
        "tpch_q6": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24""",
        "tpch_q5": """
            SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
            GROUP BY n_name""",
        # round-then-topk ordering, same contract as tpch_q3's oracle
        "tpch_q10": """
            SELECT c_custkey, c_name,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
                   c_acctbal, n_name
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN nation   ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-04-01'
              AND l_returnflag = 'R'
            GROUP BY c_custkey, c_name, c_acctbal, n_name
            ORDER BY revenue DESC, c_custkey LIMIT 20""",
        # HAVING-sum gate decorrelated; round-then-topk like tpch_q3/q10
        "tpch_q18": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
                   round(sum(l_quantity), 2) AS sum_qty
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON o_orderkey = l_orderkey
            WHERE o_orderkey IN (
                SELECT l_orderkey FROM lineitem
                GROUP BY l_orderkey HAVING sum(l_quantity) > 150.0)
            GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
            ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""",
        "tpch_q14": """
            SELECT round(
                100.0 * sum(CASE WHEN p_type LIKE 'PROMO%'
                                 THEN l_extendedprice * (1 - l_discount)
                                 ELSE 0 END)
                      / sum(l_extendedprice * (1 - l_discount)), 6
            ) AS promo_revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1996-04-01'""",
        "tpch_q12": """
            SELECT l_returnflag,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                   CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                                 THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate <  TIMESTAMP '1996-01-01'
            GROUP BY l_returnflag ORDER BY l_returnflag""",
        "tpch_q15": """
            WITH revenue AS (
                SELECT l_suppkey AS s_suppkey,
                       round(sum(l_extendedprice * (1 - l_discount)), 2)
                         AS total_revenue
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate <  TIMESTAMP '1996-04-01'
                GROUP BY l_suppkey)
            SELECT r.s_suppkey, s_name, total_revenue
            FROM revenue r JOIN supplier s ON s.s_suppkey = r.s_suppkey
            WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
            ORDER BY r.s_suppkey""",
        "tpch_q17": """
            SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE p_brand = 'Brand#4'
              AND l_quantity < (
                  SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                  WHERE l2.l_partkey = p_partkey)""",
        "tpch_q7": """
            SELECT supp_nation, cust_nation, l_year,
                   round(sum(volume), 2) AS revenue
            FROM (
                SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                       l_extendedprice * (1 - l_discount) AS volume
                FROM supplier
                JOIN lineitem ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN customer ON c_custkey = o_custkey
                JOIN nation n1 ON s_nationkey = n1.n_nationkey
                JOIN nation n2 ON c_nationkey = n2.n_nationkey
                WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
                  AND l_shipdate >= TIMESTAMP '1995-01-01'
                  AND l_shipdate <  TIMESTAMP '1999-01-01') shipping
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year""",
        "tpch_q8": """
            SELECT o_year,
                   round(sum(CASE WHEN supp_nation = 'NATION_1'
                                  THEN volume ELSE 0 END) / sum(volume), 6)
                     AS mkt_share
            FROM (
                SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
                       l_extendedprice * (1 - l_discount) AS volume,
                       n2.n_name AS supp_nation
                FROM lineitem
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region   ON n1.n_regionkey = r_regionkey
                JOIN supplier ON l_suppkey = s_suppkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
                WHERE r_name = 'EUROPE') all_nations
            GROUP BY o_year ORDER BY o_year""",
        "tpch_q19": """
            SELECT round(coalesce(sum(l_extendedprice * (1 - l_discount)), 0),
                         2) AS revenue
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE (p_brand = 'Brand#2'  AND p_size BETWEEN 1  AND 10
                   AND l_quantity BETWEEN 1.0  AND 20.0)
               OR (p_brand = 'Brand#4'  AND p_size BETWEEN 5  AND 25
                   AND l_quantity BETWEEN 5.0  AND 35.0)
               OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 40
                   AND l_quantity BETWEEN 10.0 AND 45.0)""",
        "tpch_q21": """
            SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
            FROM supplier, lineitem l1, orders
            WHERE s_suppkey = l1.l_suppkey
              AND o_orderkey = l1.l_orderkey
              AND o_orderstatus = 'F'
              AND l1.l_returnflag = 'R'
              AND EXISTS (
                  SELECT * FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
              AND NOT EXISTS (
                  SELECT * FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
            GROUP BY s_name
            ORDER BY numwait DESC, s_name LIMIT 100""",
        "tpch_q22": """
            SELECT n_name, CAST(count(*) AS BIGINT) AS numcust,
                   round(sum(c_acctbal), 2) AS totacctbal
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            WHERE c_acctbal > (
                  SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
              AND NOT EXISTS (
                  SELECT * FROM orders
                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
            GROUP BY n_name ORDER BY n_name""",
        "union_keys": """
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
            UNION
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'""",
        "histogram": """
            SELECT CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bin,
                   CAST(count(*) AS BIGINT) AS n,
                   round(sum(o_totalprice), 2) AS s
            FROM orders GROUP BY 1""",
        "intersect_keys": """
            SELECT l_partkey FROM lineitem
            INTERSECT
            SELECT p_partkey FROM part WHERE p_size > 25""",
        "except_keys": """
            SELECT o_custkey FROM orders
            EXCEPT
            SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'""",
        "event_paths": """
            SELECT user_id,
                   string_agg(event_type, '|' ORDER BY ts, event_id) AS path
            FROM events GROUP BY user_id""",
        "cooccurrence": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS e1, b.event_type AS e2,
                   CAST(count(*) AS BIGINT) AS n
            FROM d a JOIN d b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2""",
        "embedding_norms": """
            SELECT vec_id,
                   round(sqrt(list_sum(list_transform(
                       embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                   ))), 6) AS l2
            FROM embeddings""",
        "hash_split": """
            SELECT doc_id, source,
                   CASE WHEN b < 8000 THEN 'train'
                        WHEN b < 9000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id, source,
                         ((doc_id * 2654435761 + 1 * 2654435769) % 4294967296)
                             % 10000 AS b
                  FROM documents) t""",
        "replicate_weighted": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       CAST(CASE source WHEN 'src0' THEN 2 WHEN 'src1' THEN 2
                            ELSE 1 END AS BIGINT)
                       + CASE WHEN source = 'src0'
                              AND (doc_id * 2654435761 + 1 * 2654435769)
                                  % 4294967296
                                  < CAST(floor(0.5 * 4294967296.0) AS BIGINT)
                              THEN 1 ELSE 0 END AS reps
                FROM documents) t, UNNEST(range(reps))""",
        "domain_cap": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       row_number() OVER (
                           PARTITION BY source
                           ORDER BY (doc_id * 2654435761 + 1 * 2654435769)
                                    % 4294967296, doc_id
                       ) AS rn
                FROM documents) t
            WHERE rn <= 10""",
        "profile_columns": """
            SELECT 'o_orderkey' AS column, CAST(count(*) AS BIGINT) AS n,
                   CAST(count(*) - count(o_orderkey) AS BIGINT) AS nulls,
                   round(CAST(min(o_orderkey) AS DOUBLE), 6) AS vmin,
                   round(CAST(max(o_orderkey) AS DOUBLE), 6) AS vmax,
                   round(CAST(sum(o_orderkey) AS DOUBLE), 2) AS vsum
            FROM orders
            UNION ALL
            SELECT 'o_custkey', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(o_custkey) AS BIGINT),
                   round(CAST(min(o_custkey) AS DOUBLE), 6),
                   round(CAST(max(o_custkey) AS DOUBLE), 6),
                   round(CAST(sum(o_custkey) AS DOUBLE), 2)
            FROM orders
            UNION ALL
            SELECT 'o_totalprice', CAST(count(*) AS BIGINT),
                   CAST(count(*) - count(o_totalprice) AS BIGINT),
                   round(min(o_totalprice), 6),
                   round(max(o_totalprice), 6),
                   round(sum(o_totalprice), 2)
            FROM orders""",
        "weighted_avg": """
            SELECT l_returnflag,
                   round(sum(l_discount * l_extendedprice)
                         / sum(l_extendedprice), 6) AS wavg_disc
            FROM lineitem GROUP BY l_returnflag""",
        "mix_weighted": """
            SELECT doc_id, source FROM (
                SELECT doc_id, source,
                       (doc_id * 2654435761 + 1 * 2654435769) % 4294967296 AS h,
                       CASE source WHEN 'src0' THEN 0.9
                                   WHEN 'src1' THEN 0.5
                                   WHEN 'src2' THEN 0.25
                                   ELSE 0.1 END AS w
                FROM documents) t
            WHERE h < CAST(floor(w * 4294967296.0) AS BIGINT)""",
        # ORDER BY the ROUNDED revenue (matches the engine's round-then-topk);
        # l_orderkey tiebreak makes the limit set deterministic
        "tpch_q3": """
            SELECT l_orderkey, o_orderdate, o_orderpriority,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
            FROM customer
            JOIN orders   ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1996-06-30'
              AND l_shipdate  > TIMESTAMP '1996-06-30'
            GROUP BY l_orderkey, o_orderdate, o_orderpriority
            ORDER BY revenue DESC, l_orderkey LIMIT 10""",
        # Q13 shape: zero-order customers kept by the LEFT JOIN
        "order_count_dist": """
            SELECT n_orders, CAST(count(*) AS BIGINT) AS n_custs
            FROM (SELECT c_custkey,
                         CAST(coalesce(t.cnt, 0) AS BIGINT) AS n_orders
                  FROM customer
                  LEFT JOIN (SELECT o_custkey, count(*) AS cnt
                             FROM orders GROUP BY o_custkey) t
                    ON c_custkey = t.o_custkey)
            GROUP BY n_orders""",
        "large_orders": """
            SELECT c_name, o_orderkey, o_orderdate,
                   round(o_totalprice, 2) AS o_totalprice,
                   round(t.sum_qty, 2) AS sum_qty
            FROM orders
            JOIN (SELECT l_orderkey, sum(l_quantity) AS sum_qty
                  FROM lineitem GROUP BY l_orderkey
                  HAVING sum(l_quantity) > 200.0) t
              ON o_orderkey = t.l_orderkey
            JOIN customer ON o_custkey = c_custkey""",
        "priority_returns": """
            SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1996-07-01'
              AND o_orderdate <  TIMESTAMP '1996-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority""",
        "join_agg": """
            SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
                   round(sum(o_totalprice), 2) AS total
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment""",
        "semi_join": """
            SELECT c_custkey, c_name FROM customer
            WHERE c_custkey IN (SELECT o_custkey FROM orders)""",
        "bloom_semi_join": """
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
        "topk_per_group": """
            SELECT o_orderpriority, o_orderkey, o_totalprice
            FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                         row_number() OVER (PARTITION BY o_orderpriority
                                            ORDER BY o_totalprice DESC, o_orderkey)
                           AS rn
                  FROM orders)
            WHERE rn <= 3""",
        "stratified_sample": """
            SELECT o_orderpriority, o_orderkey, o_totalprice
            FROM (SELECT o_orderpriority, o_orderkey, o_totalprice,
                         row_number() OVER (
                             PARTITION BY o_orderpriority
                             ORDER BY (o_orderkey * 2654435761
                                       + 1 * 2654435769) % 4294967296,
                                      o_orderkey) AS rn
                  FROM orders)
            WHERE rn <= 20""",
        # SAME histogram estimator as the engine sketch: identical bin
        # floor, exact-integer count sums (order-free in double), identical
        # within-bin interpolation expression — values match bit-for-bit
        "approx_quantiles": """
            WITH s AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v
                       FROM lineitem WHERE l_extendedprice IS NOT NULL),
                 mm AS (SELECT min(v) AS lo, max(v) AS hi,
                               (max(v) - min(v)) / 256.0 AS w FROM s),
                 b AS (SELECT least(CAST(floor((v - lo) / w) AS BIGINT), 255)
                                  AS bin
                       FROM s, mm),
                 h AS (SELECT bin, CAST(count(*) AS DOUBLE) AS cnt
                       FROM b GROUP BY bin),
                 c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum
                       FROM h),
                 t AS (SELECT (SELECT sum(cnt) FROM h) AS n, lo, hi, w FROM mm)
            SELECT CAST(t.n AS BIGINT) AS n,
                   round((SELECT t.lo + t.w *
                              (bin + (0.5 * t.n - (cum - cnt)) / cnt)
                          FROM c WHERE cum >= 0.5 * t.n
                          ORDER BY bin LIMIT 1), 6) AS l_extendedprice_p50,
                   round((SELECT t.lo + t.w *
                              (bin + (0.9 * t.n - (cum - cnt)) / cnt)
                          FROM c WHERE cum >= 0.9 * t.n
                          ORDER BY bin LIMIT 1), 6) AS l_extendedprice_p90,
                   round((SELECT t.lo + t.w *
                              (bin + (0.99 * t.n - (cum - cnt)) / cnt)
                          FROM c WHERE cum >= 0.99 * t.n
                          ORDER BY bin LIMIT 1), 6) AS l_extendedprice_p99
            FROM t""",
        # deterministic mode tie-break mirrored exactly: highest count,
        # then smallest value (ROW_NUMBER, not DuckDB's mode() whose
        # tie-break is unspecified)
        "group_mode": """
            WITH c AS (SELECT user_id, event_type,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY user_id, event_type),
                 r AS (SELECT user_id, event_type, n,
                              ROW_NUMBER() OVER (
                                  PARTITION BY user_id
                                  ORDER BY n DESC, event_type ASC) AS rn
                       FROM c)
            SELECT user_id, event_type AS mode_event_type, n
            FROM r WHERE rn = 1""",
        "group_mad": """
            SELECT user_id, CAST(count(value) AS BIGINT) AS n,
                   round(median(value), 6) AS med,
                   round(mad(value), 6) AS mad
            FROM events GROUP BY user_id""",
        "window_edges": """
            SELECT event_id, user_id, value,
                   first_value(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                     AS value_first,
                   last_value(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING
                            AND UNBOUNDED FOLLOWING) AS value_last,
                   round(cume_dist() OVER (
                       PARTITION BY user_id ORDER BY value), 6)
                     AS value_cumedist
            FROM events""",
        "rolling_corr": """
            SELECT event_id, user_id,
                   round(corr(value, epoch(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 15 PRECEDING AND CURRENT ROW), 6)
                     AS value_trend_corr
            FROM events""",
        # connected components of the minute-bucket co-purchase graph:
        # recursive transitive closure (UNION-dedup fixpoint), cluster =
        # min reachable node; self-rows make isolated nodes their own label
        "connected_components": """
            WITH RECURSIVE
                 p AS (SELECT DISTINCT user_id, date_trunc('minute', ts) AS h
                       FROM events WHERE event_type = 'purchase'),
                 e AS (SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
                       FROM p a JOIN p b ON a.h = b.h
                                        AND a.user_id < b.user_id),
                 ee AS (SELECT ua AS a, ub AS b FROM e
                        UNION ALL SELECT ub, ua FROM e),
                 nodes AS (SELECT DISTINCT user_id AS n FROM p),
                 reach(n, m) AS (
                     SELECT n, n FROM nodes
                     UNION
                     SELECT r.n, ee.b FROM reach r JOIN ee ON ee.a = r.m)
            SELECT n AS user_id, CAST(min(m) AS BIGINT) AS cluster_id
            FROM reach GROUP BY n""",
        # quantile normalization: row_number ranks under deterministic
        # (value, id) tie-break; reference = cross-group mean at each rank
        "quantile_normalize": """
            WITH r AS (SELECT event_id, event_type, value,
                              row_number() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rk
                       FROM events),
                 m AS (SELECT rk, round(avg(value), 6) AS qnorm
                       FROM r GROUP BY rk)
            SELECT r.event_id, r.event_type, r.value, m.qnorm
            FROM r JOIN m USING (rk)""",
        # past-only target encoding: strictly-exclusive ROWS frame under
        # global (ts, event_id) order; cents fixed-point matches the
        # engine's exact int64 accumulation, then ONE divide pair
        "target_encode": """
            SELECT event_id, event_type, value,
                   round(avg(CAST(round(value * 100) AS BIGINT)) OVER (
                       PARTITION BY event_type ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       / 100, 6) AS te
            FROM events""",
        # Okapi BM25 (Lucene idf), k1=1.2, b=0.75; avgdl over ALL docs
        # (token-less docs count in the denominator); docs containing no
        # query term emit nothing
        "bm25": r"""
            WITH ex AS (SELECT doc_id,
                               unnest(regexp_extract_all(lower(text),
                                                         '[0-9a-z_]+')) AS token
                        FROM documents),
                 tc AS (SELECT doc_id, token, count(*) AS cnt
                        FROM ex GROUP BY doc_id, token),
                 nd AS (SELECT doc_id, count(*) AS n_doc
                        FROM ex GROUP BY doc_id),
                 st AS (SELECT (SELECT count(*) FROM ex)
                               / (SELECT CAST(count(*) AS DOUBLE)
                                  FROM documents) AS avgdl,
                               (SELECT CAST(count(*) AS DOUBLE)
                                FROM documents) AS n),
                 q AS (SELECT unnest(['data', 'join', 'sort', 'vector'])
                         AS token),
                 df AS (SELECT tc.token, CAST(count(*) AS DOUBLE) AS df_n
                        FROM tc JOIN q ON tc.token = q.token
                        GROUP BY tc.token)
            SELECT tc.doc_id,
                   round(sum(ln(1 + (st.n - df.df_n + 0.5) / (df.df_n + 0.5))
                             * cnt * 2.2
                             / (cnt + 1.2 * (0.25 + 0.75 * nd.n_doc
                                                    / st.avgdl))), 6) AS bm25
            FROM tc JOIN df ON tc.token = df.token
                    JOIN nd ON tc.doc_id = nd.doc_id, st
            GROUP BY tc.doc_id""",
        # two-sided interval overlap: closed bounds, overlap length in sec
        "interval_overlap": """
            WITH a AS (SELECT user_id, event_id AS a_id, ts AS a_start,
                              ts + INTERVAL 30 MINUTE AS a_end
                       FROM events WHERE event_type = 'error'),
                 b AS (SELECT user_id, event_id AS b_id, ts AS b_start,
                              ts + to_seconds(CAST(floor(value) * 60 AS BIGINT))
                                AS b_end
                       FROM events WHERE event_type = 'view')
            SELECT a.user_id, a_id, b_id,
                   round((epoch_us(least(a_end, b_end))
                          - epoch_us(greatest(a_start, b_start))) / 1e6, 6)
                     AS overlap_s
            FROM a JOIN b ON a.user_id = b.user_id
                         AND a_start <= b_end AND b_start <= a_end""",
        # skyline: survive iff value == its ts-group max AND beats the
        # exclusive running max over strictly-earlier ts groups — the same
        # dominance truth as NOT EXISTS (s.ts <= r.ts AND s.value >= r.value
        # AND one strict) but O(n log n), usable at sf0.1
        "skyline": """
            WITH g AS (SELECT ts, max(value) AS gmax FROM events GROUP BY ts),
                 p AS (SELECT ts, gmax,
                              max(gmax) OVER (ORDER BY ts
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS pmax
                       FROM g)
            SELECT e.event_id, e.user_id, e.ts, e.value
            FROM events e JOIN p ON e.ts = p.ts
            WHERE e.value = p.gmax AND (p.pmax IS NULL OR e.value > p.pmax)""",
        # hopping windows: every event replicated into its 4 containing
        # 15-min-hop / 1-h windows (epoch-aligned via epoch_us, matching the
        # engine's int64 floor — no time_bucket origin dependence)
        "hopping_window": """
            WITH x AS (SELECT user_id, value,
                              make_timestamp(
                                  (epoch_us(ts) // 900000000) * 900000000
                                  - CAST(u.j AS BIGINT) * 900000000) AS wstart
                       FROM events, UNNEST([0, 1, 2, 3]) AS u(j))
            SELECT user_id, wstart, round(sum(value), 6) AS wsum,
                   CAST(count(*) AS BIGINT) AS wn
            FROM x GROUP BY user_id, wstart""",
        # CUSUM drift fold in exact integer cents — the literal sequential
        # recursion; the engine computes the same fold via the closed form
        # cum - min(0, running_min(cum)), bit-identical on integer input
        "cusum": """
            WITH RECURSIVE
              nb AS (SELECT event_id, user_id, ts,
                            CAST(round(value * 100) AS BIGINT) - 1200 AS y,
                            row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
                     FROM events),
              r AS (
                SELECT event_id, user_id, ts, rn,
                       greatest(0, y) AS s
                FROM nb WHERE rn = 1
                UNION ALL
                SELECT n.event_id, n.user_id, n.ts, n.rn,
                       greatest(0, r.s + n.y)
                FROM r JOIN nb n ON n.user_id = r.user_id
                                AND n.rn = r.rn + 1)
            SELECT event_id, user_id, ts,
                   round(s / 100.0, 6) AS cusum,
                   CAST(CASE WHEN s > 1500 THEN 1 ELSE 0 END AS BIGINT)
                     AS alarm
            FROM r""",
        # trailing-window distinct count via the list window aggregate
        "rolling_distinct": """
            SELECT event_id, user_id, ts,
                   CAST(len(list_distinct(
                       list(CAST(floor(value) AS BIGINT)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)))
                     AS BIGINT) AS n_distinct_w
            FROM events""",
        # Spearman = Pearson over fractional (average-tie) ranks:
        # avg rank == rank() + (tie_count - 1)/2
        "group_spearman": """
            WITH r AS (SELECT user_id,
                              rank() OVER (PARTITION BY user_id
                                  ORDER BY value)
                                + (count(*) OVER (PARTITION BY user_id,
                                                  value) - 1) / 2.0 AS rv,
                              rank() OVER (PARTITION BY user_id ORDER BY ts)
                                + (count(*) OVER (PARTITION BY user_id, ts)
                                   - 1) / 2.0 AS rt
                       FROM events)
            SELECT user_id, round(corr(rv, rt), 6) AS spearman
            FROM r GROUP BY user_id""",
        # 15-min OHLC bars: open/close via first_value/last_value under the
        # stable (ts, event_id) order; high/low/sum/count null-skipping
        "ohlc_bars": """
            WITH b AS (SELECT user_id,
                              make_timestamp(
                                  (epoch_us(ts) // 900000000) * 900000000)
                                AS wstart,
                              ts, event_id, value
                       FROM events),
                 w AS (SELECT user_id, wstart, value,
                              first_value(value) OVER (
                                  PARTITION BY user_id, wstart
                                  ORDER BY ts, event_id) AS o,
                              first_value(value) OVER (
                                  PARTITION BY user_id, wstart
                                  ORDER BY ts DESC, event_id DESC) AS c
                       FROM b)
            SELECT user_id, wstart,
                   min(o) AS open, max(value) AS high, min(value) AS low,
                   min(c) AS close, round(sum(value), 6) AS vsum,
                   CAST(count(value) AS BIGINT) AS n
            FROM w GROUP BY user_id, wstart""",
        # Shannon entropy (nats) per user over event-type counts — the
        # same integer-count float expression the engine evaluates
        "group_entropy": """
            WITH c AS (SELECT user_id, event_type,
                              CAST(count(*) AS DOUBLE) AS cn
                       FROM events GROUP BY user_id, event_type)
            SELECT user_id, CAST(sum(cn) AS BIGINT) AS n,
                   round(ln(sum(cn))
                         - sum(cn * ln(cn)) / sum(cn), 6) AS entropy
            FROM c GROUP BY user_id""",
        # Welch two-sample t: each event type vs the REST of the corpus,
        # closed form from (n, sum, sumsq) and their complements
        "welch_t": """
            WITH s AS (SELECT event_type,
                              CAST(count(value) AS DOUBLE) AS n,
                              sum(value) AS s, sum(value * value) AS ss
                       FROM events GROUP BY event_type),
                 tot AS (SELECT sum(n) AS tn, sum(s) AS tss,
                                sum(ss) AS tsq FROM s)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   round(s / n, 6) AS mean,
                   round((s / n - (tss - s) / (tn - n))
                         / sqrt(((ss - s * s / n) / (n - 1)) / n
                                + (((tsq - ss)
                                    - (tss - s) * (tss - s) / (tn - n))
                                   / (tn - n - 1)) / (tn - n)), 6)
                     AS t_welch
            FROM s, tot""",
        # transcript-hygiene report on the north-rule schema: role mix,
        # alternation violations, first/last role under (ts, turn_idx)
        "role_report": """
            WITH t AS (SELECT user_id AS conv_id, event_id AS turn_idx, ts,
                              CASE WHEN event_type IN ('click', 'view')
                                     THEN 'user'
                                   WHEN event_type IN ('purchase', 'signup')
                                     THEN 'assistant'
                                   ELSE 'tool' END AS role
                       FROM events),
                 o AS (SELECT conv_id, role,
                              lag(role) OVER w AS prev,
                              row_number() OVER w AS rn,
                              count(*) OVER (PARTITION BY conv_id) AS nt
                       FROM t
                       WINDOW w AS (PARTITION BY conv_id
                                    ORDER BY ts, turn_idx))
            SELECT conv_id,
                   CAST(count(*) AS BIGINT) AS n_turns,
                   CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_user,
                   CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_assistant,
                   CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_tool_role,
                   CAST(sum(CASE WHEN role = prev THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_violations,
                   min(CASE WHEN rn = 1 THEN role END) AS first_role,
                   min(CASE WHEN rn = nt THEN role END) AS last_role
            FROM o GROUP BY conv_id""",
        # cohort LTV: cumulative cents by (first-seen cohort, age)
        "cohort_ltv": """
            WITH f AS (SELECT user_id,
                              min(epoch_us(ts)
                                  // CAST(86400000000 AS BIGINT)) AS fd
                       FROM events GROUP BY user_id),
                 e AS (SELECT f.fd AS cohort,
                              epoch_us(ts) // CAST(86400000000 AS BIGINT)
                                - f.fd AS age,
                              CAST(round(value * 100) AS BIGINT) AS cents
                       FROM events JOIN f USING (user_id)),
                 g AS (SELECT cohort, age,
                              CAST(count(*) AS BIGINT) AS n_events,
                              coalesce(sum(cents), 0) AS cents
                       FROM e GROUP BY cohort, age)
            SELECT cohort, age, n_events,
                   round(CAST(sum(cents) OVER (PARTITION BY cohort
                                               ORDER BY age) AS DOUBLE)
                         / 100.0, 6) AS cum_value
            FROM g""",
        # two-level aggregate: user means standardized vs the population
        # of user means
        "user_zscore": """
            WITH u AS (SELECT user_id,
                              CAST(sum(CAST(round(value * 100) AS BIGINT))
                                   AS DOUBLE) / count(value) / 100.0 AS um
                       FROM events
                       WHERE value IS NOT NULL GROUP BY user_id),
                 s AS (SELECT avg(um) AS m, stddev_samp(um) AS sd FROM u)
            SELECT user_id, round(um, 6) AS user_mean,
                   round((um - s.m) / s.sd, 6) AS z
            FROM u, s""",
        # purchase share per segment with a 95% Wald interval
        "conversion_ci": """
            WITH c AS (SELECT user_id % 4 AS segment,
                              CAST(count(*) FILTER (
                                  WHERE event_type = 'purchase')
                                AS DOUBLE) AS conv,
                              CAST(count(*) AS DOUBLE) AS n
                       FROM events GROUP BY user_id % 4)
            SELECT CAST(segment AS BIGINT) AS segment,
                   CAST(n AS BIGINT) AS n,
                   round(conv / n, 6) AS rate,
                   round(conv / n
                         - 1.96 * sqrt((conv / n) * (1 - conv / n) / n),
                         6) AS ci_lo,
                   round(conv / n
                         + 1.96 * sqrt((conv / n) * (1 - conv / n) / n),
                         6) AS ci_hi
            FROM c""",
        # Lorenz decile shares: users ordered by (activity, id), ntile(10)
        "lorenz_deciles": """
            WITH c AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS n
                       FROM events GROUP BY user_id),
                 t AS (SELECT n, ntile(10) OVER (ORDER BY n, user_id)
                                AS decile
                       FROM c)
            SELECT CAST(decile AS BIGINT) AS decile,
                   CAST(count(*) AS BIGINT) AS n_users,
                   round(sum(n) / (SELECT sum(n) FROM c), 6) AS share
            FROM t GROUP BY decile""",
        # hour-of-day activity counts per type
        "hourly_profile": """
            SELECT event_type,
                   (epoch_us(ts) // CAST(3600000000 AS BIGINT)) % 24
                     AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM events GROUP BY event_type, hour""",
        # sessions-per-user histogram (30-min gap islands)
        "sessions_per_user": """
            WITH g AS (SELECT user_id,
                              CASE WHEN epoch_us(ts)
                                        - lag(epoch_us(ts)) OVER (
                                            PARTITION BY user_id
                                            ORDER BY ts, event_id)
                                        > 1800000000
                                   THEN 1 ELSE 0 END AS brk
                       FROM events),
                 s AS (SELECT user_id,
                              CAST(1 + sum(brk) AS BIGINT) AS n_sessions
                       FROM g GROUP BY user_id)
            SELECT n_sessions, CAST(count(*) AS BIGINT) AS n_users
            FROM s GROUP BY n_sessions""",
        # 10-90 trimmed mean per type (inclusive interior, quantile_cont)
        "group_trimmed_mean": """
            WITH q AS (SELECT event_type, value,
                              quantile_cont(value, 0.1)
                                OVER (PARTITION BY event_type) AS lo,
                              quantile_cont(value, 0.9)
                                OVER (PARTITION BY event_type) AS hi
                       FROM events WHERE value IS NOT NULL)
            SELECT event_type,
                   CAST(count(*) FILTER (WHERE value >= lo
                                           AND value <= hi) AS BIGINT)
                     AS n_kept,
                   round(avg(value) FILTER (WHERE value >= lo
                                              AND value <= hi), 6)
                     AS trimmed_mean
            FROM q GROUP BY event_type""",
        # value minus its type's median (median == np.quantile linear)
        "median_centered": """
            SELECT event_id, user_id, event_type,
                   round(value - median(value)
                             OVER (PARTITION BY event_type), 6)
                     AS centered
            FROM events""",
        # new vs returning distinct actives per day (first-seen split)
        "new_vs_returning": """
            WITH du AS (SELECT DISTINCT
                            epoch_us(ts) // CAST(86400000000 AS BIGINT)
                              AS day,
                            user_id
                        FROM events),
                 f AS (SELECT user_id, min(day) AS fday FROM du
                       GROUP BY user_id)
            SELECT du.day,
                   CAST(sum(CASE WHEN du.day = f.fday THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_new,
                   CAST(sum(CASE WHEN du.day = f.fday THEN 0 ELSE 1 END)
                        AS BIGINT) AS n_ret
            FROM du JOIN f USING (user_id) GROUP BY du.day""",
        # Gini of per-user event counts via the sorted-rank closed form
        "activity_gini": """
            WITH c AS (SELECT user_id, CAST(count(*) AS DOUBLE) AS n
                       FROM events GROUP BY user_id),
                 r AS (SELECT n, row_number() OVER (ORDER BY n) AS i
                       FROM c)
            SELECT CAST((SELECT count(*) FROM c) AS BIGINT) AS n_users,
                   round(2.0 * sum(i * n)
                         / ((SELECT count(*) FROM c) * sum(n))
                         - ((SELECT count(*) FROM c) + 1.0)
                           / (SELECT count(*) FROM c), 6) AS gini
            FROM r""",
        # per-day p50/p90 value bands (quantile_cont == np.quantile linear)
        "daily_quantiles": """
            SELECT epoch_us(ts) // CAST(86400000000 AS BIGINT) AS day,
                   CAST(count(value) AS BIGINT) AS n,
                   round(quantile_cont(value, 0.5), 6) AS p50,
                   round(quantile_cont(value, 0.9), 6) AS p90
            FROM events GROUP BY 1""",
        # DAU / trailing-7-day WAU / stickiness per activity day
        "active_users": """
            WITH du AS (SELECT DISTINCT
                            epoch_us(ts) // CAST(86400000000 AS BIGINT)
                              AS day,
                            user_id
                        FROM events),
                 dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau
                         FROM du GROUP BY day),
                 f AS (SELECT DISTINCT du.day + u.j AS day, du.user_id
                       FROM du, UNNEST([0, 1, 2, 3, 4, 5, 6]) AS u(j)),
                 wau AS (SELECT day, CAST(count(*) AS BIGINT) AS wau
                         FROM f GROUP BY day)
            SELECT dau.day, dau.dau, wau.wau,
                   round(CAST(dau.dau AS DOUBLE) / wau.wau, 6)
                     AS stickiness
            FROM dau JOIN wau USING (day)""",
        # autocorrelation function at lags 1..3 per user
        "ccf_profile": """
            WITH L AS (SELECT user_id, value,
                              lag(value, 1) OVER w AS p1,
                              lag(value, 2) OVER w AS p2,
                              lag(value, 3) OVER w AS p3
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id))
            SELECT user_id, CAST(1 AS BIGINT) AS k,
                   round(corr(value, p1), 6) AS ccf
            FROM L GROUP BY user_id
            UNION ALL
            SELECT user_id, CAST(2 AS BIGINT),
                   round(corr(value, p2), 6)
            FROM L GROUP BY user_id
            UNION ALL
            SELECT user_id, CAST(3 AS BIGINT),
                   round(corr(value, p3), 6)
            FROM L GROUP BY user_id""",
        # Markov conditional entropy H(next|prev) + marginal H(next)
        "transition_entropy": """
            WITH t AS (SELECT event_type AS b,
                              lag(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS a
                       FROM events),
                 c AS (SELECT a, b, CAST(count(*) AS DOUBLE) AS n
                       FROM t WHERE a IS NOT NULL GROUP BY a, b),
                 tot AS (SELECT sum(n) AS s FROM c),
                 na AS (SELECT a, sum(n) AS sa FROM c GROUP BY a),
                 hc AS (SELECT -sum((c.n / (SELECT s FROM tot))
                                    * ln(c.n / na.sa)) AS h
                        FROM c JOIN na USING (a)),
                 nb AS (SELECT b, sum(n) AS sb FROM c GROUP BY b),
                 hn AS (SELECT -sum((sb / (SELECT s FROM tot))
                                    * ln(sb / (SELECT s FROM tot))) AS h
                        FROM nb)
            SELECT round((SELECT h FROM hc), 6) AS h_cond,
                   round((SELECT h FROM hn), 6) AS h_next,
                   round((SELECT h FROM hn) - (SELECT h FROM hc), 6)
                     AS info_gain""",
        # Goh-Barabasi burstiness of inter-arrival times (population
        # sigma, identical moment expression both sides)
        "burstiness": """
            WITH g AS (SELECT user_id,
                              (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                                  PARTITION BY user_id
                                  ORDER BY ts, event_id)) / 1000000.0
                                AS gap
                       FROM events),
                 m AS (SELECT user_id,
                              CAST(count(gap) AS BIGINT) AS n_gaps,
                              sum(gap) AS s, sum(gap * gap) AS ss
                       FROM g GROUP BY user_id)
            SELECT user_id, n_gaps,
                   CASE WHEN n_gaps >= 2 THEN round(
                       (sqrt(greatest(ss / n_gaps
                                      - (s / n_gaps) * (s / n_gaps), 0))
                        - s / n_gaps)
                       / (sqrt(greatest(ss / n_gaps
                                        - (s / n_gaps) * (s / n_gaps), 0))
                          + s / n_gaps), 6) END AS b
            FROM m""",
        # Kaplan-Meier: time to first purchase, 5-day administrative
        # censoring; surv = exp(running sum of ln(1 - d/n_risk))
        "survival_km": """
            WITH f AS (SELECT user_id, min(ts) AS f0 FROM events
                       GROUP BY user_id),
                 p AS (SELECT user_id, min(ts) AS pt FROM events
                       WHERE event_type = 'purchase' GROUP BY user_id),
                 u AS (SELECT f.user_id,
                              CASE WHEN p.pt IS NOT NULL
                                    AND epoch(p.pt - f.f0) < 432000
                                   THEN CAST(floor(epoch(p.pt - f.f0)
                                                   / 86400.0) AS BIGINT)
                                   ELSE 5 END AS t,
                              CASE WHEN p.pt IS NOT NULL
                                    AND epoch(p.pt - f.f0) < 432000
                                   THEN 1 ELSE 0 END AS death
                       FROM f LEFT JOIN p USING (user_id)),
                 d AS (SELECT t, CAST(count(*) AS BIGINT) AS d FROM u
                       WHERE death = 1 GROUP BY t),
                 r AS (SELECT d.t, d.d,
                              (SELECT CAST(count(*) AS BIGINT) FROM u
                               WHERE u.t >= d.t) AS n_risk
                       FROM d),
                 s AS (SELECT t, d, n_risk,
                              -- d = n_risk (everyone remaining converts)
                              -- can only be the LAST step: contribute
                              -- ln(1)=0 there and CASE the row to 0
                              CASE WHEN d = n_risk THEN 0.0
                                   ELSE exp(sum(ln(CASE WHEN d = n_risk
                                                THEN 1.0
                                                ELSE 1 - CAST(d AS DOUBLE)
                                                         / n_risk END))
                                            OVER (ORDER BY t)) END AS surv
                       FROM r)
            SELECT t AS t_day, n_risk, d AS d_events,
                   round(surv, 6) AS surv
            FROM s""",
        # sorted-neighborhood blocking: rank under (n_chars, doc_id),
        # candidate pairs within rank distance <= 3
        "sorted_neighborhood": """
            WITH r AS (SELECT doc_id,
                              row_number() OVER (ORDER BY n_chars, doc_id)
                                AS rk
                       FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(b.rk - a.rk AS BIGINT) AS dist
            FROM r a JOIN r b ON b.rk > a.rk AND b.rk <= a.rk + 3""",
        # per-(user, day) argmax with deterministic event_id tiebreak
        "window_argmax": """
            WITH d AS (SELECT event_id, user_id, value,
                              make_timestamp(
                                  (epoch_us(ts) // 86400000000)
                                  * 86400000000) AS day,
                              row_number() OVER (
                                  PARTITION BY user_id,
                                      epoch_us(ts) // 86400000000
                                  ORDER BY value DESC, event_id) AS rn
                       FROM events)
            SELECT user_id, day, event_id, round(value, 6) AS value
            FROM d WHERE rn = 1""",
        # log2-binned inter-arrival gaps per user (sub-second clamps to 0)
        "interarrival_hist": """
            WITH g AS (SELECT (epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id))
                           / 1000000.0 AS gap_s
                       FROM events),
                 b AS (SELECT CAST(greatest(floor(log2(gap_s)), 0)
                                   AS BIGINT) AS bin
                       FROM g WHERE gap_s > 0)
            SELECT bin, CAST(count(*) AS BIGINT) AS n_gaps
            FROM b GROUP BY bin""",
        # daily volume + day-over-day percent change
        "daily_change": """
            WITH c AS (SELECT make_timestamp(
                                  (epoch_us(ts) // 86400000000)
                                  * 86400000000) AS day,
                              CAST(count(*) AS BIGINT) AS n
                       FROM events GROUP BY 1)
            SELECT day, n,
                   round((n - lag(n) OVER (ORDER BY day))
                         / CAST(lag(n) OVER (ORDER BY day) AS DOUBLE),
                         6) AS pct_change
            FROM c""",
        # top-5 tokens per language, (n DESC, token) tie order
        "top_terms_per_lang": """
            WITH tok AS (SELECT lang,
                                unnest(string_split(text, ' ')) AS token
                         FROM documents WHERE text IS NOT NULL),
                 c AS (SELECT lang, token, CAST(count(*) AS BIGINT) AS n
                       FROM tok GROUP BY lang, token),
                 r AS (SELECT *, row_number() OVER (
                           PARTITION BY lang
                           ORDER BY n DESC, token) AS rn
                       FROM c)
            SELECT lang, token, n FROM r WHERE rn <= 5""",
        # consecutive-vector cosine drift (vector LAG via vec_id + 1
        # self-join). Longhand DOUBLE dot/norms — list_cosine_similarity
        # computes in float32 and missed the 4-dp gate by 1e-4 at sf0.1;
        # the denominator is (sqrt * sqrt), the engine's exact expression
        "embedding_drift": """
            SELECT a.vec_id,
                   round(
                       list_sum(list_transform(
                           list_zip(a.embedding, b.embedding),
                           x -> CAST(x[1] AS DOUBLE)
                                * CAST(x[2] AS DOUBLE)))
                       / (sqrt(list_sum(list_transform(a.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
                          * sqrt(list_sum(list_transform(b.embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
                       4) AS drift
            FROM embeddings a
            JOIN embeddings b ON b.vec_id = a.vec_id + 1""",
        # per-type winsorize: clip to the type's [p05, p95] band
        "group_winsorize": """
            SELECT event_id, user_id, event_type,
                   round(least(greatest(value,
                       quantile_cont(value, 0.05) OVER w),
                       quantile_cont(value, 0.95) OVER w), 6) AS value_w
            FROM events
            WINDOW w AS (PARTITION BY event_type)""",
        # weight-proportional PageRank: edge weight = shared-cell count,
        # W_s = total incident weight, contributions w/W-scaled
        "pagerank_weighted": """
            WITH b AS (SELECT DISTINCT event_type,
                              epoch_us(ts) // CAST(300000000 AS BIGINT)
                                AS bk,
                              user_id
                       FROM events),
                 e0 AS (SELECT a.user_id AS u, c.user_id AS v,
                               CAST(count(*) AS DOUBLE) AS w
                        FROM b a JOIN b c USING (event_type, bk)
                        WHERE a.user_id < c.user_id
                        GROUP BY a.user_id, c.user_id),
                 e AS (SELECT u AS src, v AS dst, w FROM e0
                       UNION ALL SELECT v, u, w FROM e0),
                 deg AS (SELECT src, sum(w) AS d FROM e GROUP BY src),
                 nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
                 r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS r
                        FROM deg),
                 r1 AS (SELECT e.dst AS node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * sum(p.r * e.w / deg.d) AS r
                        FROM e JOIN r0 p ON p.node = e.src
                               JOIN deg ON deg.src = e.src
                        GROUP BY e.dst),
                 r2 AS (SELECT e.dst AS node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * sum(p.r * e.w / deg.d) AS r
                        FROM e JOIN r1 p ON p.node = e.src
                               JOIN deg ON deg.src = e.src
                        GROUP BY e.dst),
                 r3 AS (SELECT e.dst AS node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * sum(p.r * e.w / deg.d) AS r
                        FROM e JOIN r2 p ON p.node = e.src
                               JOIN deg ON deg.src = e.src
                        GROUP BY e.dst),
                 r4 AS (SELECT e.dst AS node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * sum(p.r * e.w / deg.d) AS r
                        FROM e JOIN r3 p ON p.node = e.src
                               JOIN deg ON deg.src = e.src
                        GROUP BY e.dst),
                 r5 AS (SELECT e.dst AS node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * sum(p.r * e.w / deg.d) AS r
                        FROM e JOIN r4 p ON p.node = e.src
                               JOIN deg ON deg.src = e.src
                        GROUP BY e.dst)
            SELECT node AS user_id, round(r, 6) AS pr FROM r5""",
        # data-quality expectation suite: per-rule violation counts
        "dq_violations": """
            SELECT 'value_null' AS rule,
                   CAST(count(*) FILTER (WHERE value IS NULL) AS BIGINT)
                     AS n FROM events
            UNION ALL
            SELECT 'value_range',
                   CAST(count(*) FILTER (WHERE value < 0 OR value > 1000)
                        AS BIGINT) FROM events
            UNION ALL
            SELECT 'type_domain',
                   CAST(count(*) FILTER (WHERE event_type NOT IN
                        ('click', 'error', 'purchase', 'signup', 'view')
                        OR event_type IS NULL) AS BIGINT) FROM events
            UNION ALL
            SELECT 'ts_bounds',
                   CAST(count(*) FILTER (WHERE ts < TIMESTAMP '2024-01-01'
                        OR ts >= TIMESTAMP '2031-01-01') AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'dup_event_id',
                   CAST(coalesce(sum(c), 0) AS BIGINT)
            FROM (SELECT count(*) AS c FROM events GROUP BY event_id
                  HAVING count(*) > 1)""",
        # degree distribution of the co-visitation graph
        "degree_histogram": """
            WITH b AS (SELECT DISTINCT event_type,
                              epoch_us(ts) // CAST(300000000 AS BIGINT)
                                AS bk,
                              user_id
                       FROM events),
                 e0 AS (SELECT DISTINCT a.user_id AS u, c.user_id AS v
                        FROM b a JOIN b c USING (event_type, bk)
                        WHERE a.user_id < c.user_id),
                 e AS (SELECT u AS src FROM e0
                       UNION ALL SELECT v FROM e0),
                 deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg
                         FROM e GROUP BY src)
            SELECT deg, CAST(count(*) AS BIGINT) AS n_nodes
            FROM deg GROUP BY deg""",
        # hashing-trick features: the token_ids vocabulary folded mod 64,
        # OOV (id 0) dropped, counted per (doc, bucket)
        "hashed_features": r"""
            WITH tok AS (
              SELECT doc_id, ts[CAST(u.i AS INTEGER)] AS token
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '[0-9a-z_]+') AS ts
                    FROM documents),
                   LATERAL unnest(range(1, len(ts) + 1)) AS u(i)),
                 cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
                 vocab AS (SELECT token,
                                  row_number() OVER (ORDER BY n DESC, token)
                                    AS tid
                           FROM cnt QUALIFY tid <= 1000)
            SELECT t.doc_id, CAST(v.tid % 64 AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n
            FROM tok t JOIN vocab v USING (token)
            GROUP BY t.doc_id, v.tid % 64""",
        # SCD2 validity intervals: lead(ts) per user, latest row open
        "scd2_intervals": """
            SELECT event_id, user_id, ts AS valid_from,
                   lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS valid_to,
                   value
            FROM events""",
        # Jaccard overlap between event types over their distinct user
        # sets, from co-membership counts + per-type distinct users
        "type_jaccard": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
                 co AS (SELECT a.event_type AS t1, b.event_type AS t2,
                               CAST(count(*) AS BIGINT) AS n_both
                        FROM d a JOIN d b ON a.user_id = b.user_id
                                         AND a.event_type < b.event_type
                        GROUP BY a.event_type, b.event_type),
                 pt AS (SELECT event_type,
                               CAST(count(*) AS DOUBLE) AS nu
                        FROM d GROUP BY event_type)
            SELECT co.t1, co.t2, co.n_both,
                   round(co.n_both / (pa.nu + pb.nu - co.n_both), 6)
                     AS jaccard
            FROM co JOIN pt pa ON pa.event_type = co.t1
                    JOIN pt pb ON pb.event_type = co.t2""",
        # signup -> first strictly-later purchase per user; NULL when the
        # user signed up but never converted
        "conversion_time": """
            WITH su AS (SELECT user_id, min(ts) AS signup_ts FROM events
                        WHERE event_type = 'signup' GROUP BY user_id),
                 pu AS (SELECT e.user_id, min(e.ts) AS purchase_ts
                        FROM events e JOIN su ON su.user_id = e.user_id
                        WHERE e.event_type = 'purchase'
                          AND e.ts > su.signup_ts
                        GROUP BY e.user_id)
            SELECT su.user_id, su.signup_ts, pu.purchase_ts,
                   round((epoch_us(pu.purchase_ts)
                          - epoch_us(su.signup_ts)) / 1000000.0, 6)
                     AS conv_s
            FROM su LEFT JOIN pu ON pu.user_id = su.user_id""",
        # local clustering coefficient: triangles per member node (each
        # 3-way-join triangle UNNESTed to a, b, c) over deg-choose-2
        "clustering_coeff": """
            WITH b AS (SELECT DISTINCT event_type,
                              epoch_us(ts) // CAST(300000000 AS BIGINT)
                                AS bk,
                              user_id
                       FROM events),
                 e0 AS (SELECT DISTINCT a.user_id AS u, c.user_id AS v
                        FROM b a JOIN b c USING (event_type, bk)
                        WHERE a.user_id < c.user_id),
                 e AS (SELECT u AS src, v AS dst FROM e0
                       UNION ALL SELECT v, u FROM e0),
                 deg AS (SELECT src AS node, count(*) AS d
                         FROM e GROUP BY src),
                 t AS (SELECT ab.u AS a, ab.v AS m, bc.v AS c
                       FROM e0 ab JOIN e0 bc ON bc.u = ab.v
                                  JOIN e0 ac ON ac.u = ab.u
                                            AND ac.v = bc.v),
                 tn AS (SELECT node, count(*) AS tri
                        FROM (SELECT a AS node FROM t
                              UNION ALL SELECT m FROM t
                              UNION ALL SELECT c FROM t)
                        GROUP BY node)
            SELECT deg.node AS user_id, CAST(deg.d AS BIGINT) AS deg,
                   CAST(coalesce(tn.tri, 0) AS BIGINT) AS triangles,
                   round(CASE WHEN deg.d >= 2
                              THEN 2.0 * coalesce(tn.tri, 0)
                                   / (deg.d * (deg.d - 1.0))
                              ELSE 0.0 END, 6) AS lcc
            FROM deg LEFT JOIN tn ON tn.node = deg.node""",
        # assistant response latency vs the most recent strictly-preceding
        # user turn (row-frame carry-forward), per-conversation aggregates
        "response_latency": """
            WITH t AS (SELECT user_id AS conv_id, event_id AS turn_idx, ts,
                              CASE WHEN event_type IN ('click', 'view')
                                     THEN 'user'
                                   WHEN event_type IN ('purchase', 'signup')
                                     THEN 'assistant'
                                   ELSE 'tool' END AS role
                       FROM events),
                 o AS (SELECT conv_id, role, ts,
                              max(CASE WHEN role = 'user' THEN ts END)
                                OVER (PARTITION BY conv_id
                                      ORDER BY ts, turn_idx
                                      ROWS BETWEEN UNBOUNDED PRECEDING
                                               AND 1 PRECEDING) AS lu
                       FROM t),
                 a AS (SELECT conv_id, epoch_us(ts) - epoch_us(lu) AS lat
                       FROM o WHERE role = 'assistant' AND lu IS NOT NULL)
            SELECT conv_id, CAST(count(*) AS BIGINT) AS n_responses,
                   round(CAST(sum(lat) AS DOUBLE) / count(*) / 1000000.0,
                         6) AS mean_latency_s,
                   round(CAST(max(lat) AS DOUBLE) / 1000000.0, 6)
                     AS max_latency_s
            FROM a GROUP BY conv_id""",
        # geometric mean per type: exp of the log-domain average
        "group_geomean": """
            SELECT event_type,
                   CAST(count(value) AS BIGINT) AS n,
                   round(exp(avg(ln(value))), 6) AS geomean
            FROM events WHERE value IS NOT NULL AND value > 0
            GROUP BY event_type""",
        # two-sample KS per type vs rest: densified (value x type) grid,
        # RANGE cumulative windows, identical ratio expression
        "ks_statistic": """
            WITH c AS (SELECT value, event_type,
                              CAST(count(*) AS DOUBLE) AS cnt
                       FROM events WHERE value IS NOT NULL
                       GROUP BY value, event_type),
                 grid AS (SELECT v.value, ty.event_type,
                                 coalesce(c.cnt, 0) AS cnt
                          FROM (SELECT DISTINCT value FROM c) v
                          CROSS JOIN (SELECT DISTINCT event_type FROM c) ty
                          LEFT JOIN c ON c.value = v.value
                                     AND c.event_type = ty.event_type),
                 cum AS (SELECT value, event_type,
                                sum(cnt) OVER (PARTITION BY event_type
                                               ORDER BY value) AS cg,
                                sum(cnt) OVER (ORDER BY value
                                    RANGE BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS call
                         FROM grid),
                 tot AS (SELECT event_type, sum(cnt) AS ng
                         FROM grid GROUP BY event_type),
                 tt AS (SELECT sum(cnt) AS na FROM grid)
            SELECT cum.event_type,
                   round(max(abs(cg / ng - (call - cg) / (na - ng))), 6)
                     AS ks
            FROM cum JOIN tot USING (event_type), tt
            GROUP BY cum.event_type""",
        # first-5-event-type path per user, counted, top 20 under the
        # deterministic (n DESC, path) tie order both sides use
        "path_counts": """
            WITH o AS (SELECT user_id, event_type, ts, event_id,
                              row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
                       FROM events),
                 p AS (SELECT user_id,
                              string_agg(event_type, '>'
                                         ORDER BY rn) AS path
                       FROM o WHERE rn <= 5 GROUP BY user_id),
                 c AS (SELECT path, CAST(count(*) AS BIGINT) AS n
                       FROM p GROUP BY path)
            SELECT path, n FROM c ORDER BY n DESC, path LIMIT 20""",
        # Mann-Whitney rank-sum / U per event type vs the whole corpus,
        # tied ranks as averages: rank() + (tie_count - 1)/2
        "mann_whitney": """
            WITH r AS (SELECT event_type,
                              rank() OVER (ORDER BY value)
                                + (count(*) OVER (PARTITION BY value)
                                   - 1) / 2.0 AS ar
                       FROM events WHERE value IS NOT NULL),
                 s AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
                              sum(ar) AS rs
                       FROM r GROUP BY event_type)
            SELECT event_type, CAST(n AS BIGINT) AS n,
                   round(rs, 6) AS rank_sum,
                   round(rs - n * (n + 1) / 2.0, 6) AS u
            FROM s""",
        # per-user lag-1 autocorrelation; corr drops pairs with a NULL
        "autocorr": """
            WITH l AS (SELECT user_id, value,
                              lag(value) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS pv
                       FROM events)
            SELECT user_id, round(corr(value, pv), 6) AS ac1
            FROM l GROUP BY user_id""",
        # idle gaps between merged view-span islands: the merge CTE
        # (identical to merge_intervals) + lead() per user
        "interval_gaps": """
            WITH iv AS (SELECT user_id, ts AS start_ts,
                               ts + to_seconds(CAST(floor(value) * 60
                                                    AS BIGINT)) AS end_ts
                        FROM events WHERE event_type = 'view'),
                 o AS (SELECT *, max(end_ts) OVER (
                           PARTITION BY user_id ORDER BY start_ts, end_ts
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                         AS prev_max FROM iv),
                 g AS (SELECT *, CASE WHEN prev_max IS NULL
                                        OR start_ts > prev_max
                                      THEN 1 ELSE 0 END AS brk FROM o),
                 h AS (SELECT *, sum(brk) OVER (
                           PARTITION BY user_id ORDER BY start_ts, end_ts
                           ROWS UNBOUNDED PRECEDING) AS island FROM g),
                 m AS (SELECT user_id, min(start_ts) AS s,
                              max(end_ts) AS e
                       FROM h GROUP BY user_id, island),
                 g2 AS (SELECT user_id, e AS gap_start,
                               lead(s) OVER (PARTITION BY user_id
                                             ORDER BY s) AS gap_end
                        FROM m)
            SELECT user_id, gap_start, gap_end,
                   round(epoch(gap_end - gap_start), 6) AS gap_s
            FROM g2 WHERE gap_end IS NOT NULL""",
        # per-user relative delta vs previous event; NULL at run starts
        "pct_change": """
            SELECT event_id, user_id, ts,
                   round((value - lag(value) OVER w)
                         / lag(value) OVER w, 6) AS pct_change
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""",
        # fixed keyword list: substring occurrence totals + containing-doc
        # counts via the length-difference trick
        "keyword_totals": """
            WITH kw(k) AS (VALUES ('spark'), ('join'), ('window'),
                                  ('hash'), ('scan')),
                 c AS (SELECT k, (length(text) - length(replace(text, k, '')))
                              / length(k) AS cnt
                       FROM documents, kw WHERE text IS NOT NULL)
            SELECT k AS keyword, CAST(sum(cnt) AS BIGINT) AS total,
                   CAST(count(*) FILTER (WHERE cnt > 0) AS BIGINT) AS n_docs
            FROM c GROUP BY k""",
        # PageRank, 5 unrolled power iterations (d=0.85) over the
        # symmetrized distinct co-visitation edges; every node has
        # in-edges (symmetric), so the join-aggregate form is exact
        "pagerank": """
            WITH b AS (SELECT DISTINCT event_type,
                              epoch_us(ts) // CAST(300000000 AS BIGINT)
                                AS bk,
                              user_id
                       FROM events),
                 e0 AS (SELECT DISTINCT a.user_id AS u, c.user_id AS v
                        FROM b a JOIN b c USING (event_type, bk)
                        WHERE a.user_id < c.user_id),
                 e AS (SELECT u AS src, v AS dst FROM e0
                       UNION ALL SELECT v, u FROM e0),
                 deg AS (SELECT src, CAST(count(*) AS DOUBLE) AS d
                         FROM e GROUP BY src),
                 nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg),
                 r0 AS (SELECT src AS node, 1.0 / (SELECT n FROM nn) AS r
                        FROM deg),
                 r1 AS (SELECT e.dst AS node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * sum(p.r / deg.d) AS r
                        FROM e JOIN r0 p ON p.node = e.src
                               JOIN deg ON deg.src = e.src
                        GROUP BY e.dst),
                 r2 AS (SELECT e.dst AS node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * sum(p.r / deg.d) AS r
                        FROM e JOIN r1 p ON p.node = e.src
                               JOIN deg ON deg.src = e.src
                        GROUP BY e.dst),
                 r3 AS (SELECT e.dst AS node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * sum(p.r / deg.d) AS r
                        FROM e JOIN r2 p ON p.node = e.src
                               JOIN deg ON deg.src = e.src
                        GROUP BY e.dst),
                 r4 AS (SELECT e.dst AS node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * sum(p.r / deg.d) AS r
                        FROM e JOIN r3 p ON p.node = e.src
                               JOIN deg ON deg.src = e.src
                        GROUP BY e.dst),
                 r5 AS (SELECT e.dst AS node,
                               0.15 / (SELECT n FROM nn)
                               + 0.85 * sum(p.r / deg.d) AS r
                        FROM e JOIN r4 p ON p.node = e.src
                               JOIN deg ON deg.src = e.src
                        GROUP BY e.dst)
            SELECT node AS user_id, round(r, 6) AS pr FROM r5""",
        # triangle count: oriented (u < v) distinct co-visitation edges,
        # 3-way self-join (each triangle matches exactly once)
        "triangle_count": """
            WITH b AS (SELECT DISTINCT event_type,
                              epoch_us(ts) // CAST(300000000 AS BIGINT)
                                AS bk,
                              user_id
                       FROM events),
                 e0 AS (SELECT DISTINCT a.user_id AS u, c.user_id AS v
                        FROM b a JOIN b c USING (event_type, bk)
                        WHERE a.user_id < c.user_id)
            SELECT CAST(count(*) AS BIGINT) AS triangles
            FROM e0 ab JOIN e0 bc ON bc.u = ab.v
                       JOIN e0 ac ON ac.u = ab.u AND ac.v = bc.v""",
        # trailing-window z-score anomaly flags: mean/stddev over the 8
        # PRECEDING rows (current excluded), NULL z when <2 values or
        # zero variance; flag |z| > 2
        "rolling_zscore": """
            WITH w AS (SELECT event_id, user_id, ts, value,
                              avg(value) OVER win AS m,
                              stddev_samp(value) OVER win AS sd,
                              count(value) OVER win AS wm
                       FROM events
                       WINDOW win AS (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS BETWEEN 8 PRECEDING
                                               AND 1 PRECEDING))
            SELECT event_id, user_id, ts,
                   CASE WHEN wm >= 2 AND sd > 0
                        THEN round((value - m) / sd, 6) END AS zscore,
                   CAST(CASE WHEN wm >= 2 AND sd > 0
                                  AND abs((value - m) / sd) > 2.0
                             THEN 1 ELSE 0 END AS BIGINT) AS anomaly
            FROM w""",
        # chi-square independence: expected = row_total*col_total/total,
        # DENSIFIED over the full type x segment grid — a structurally-
        # empty cell still contributes (0-E)^2/E = E
        "chi_square": """
            WITH c AS (SELECT event_type, user_id % 4 AS segment,
                              CAST(count(*) AS DOUBLE) AS n
                       FROM events GROUP BY event_type, user_id % 4),
                 o AS (SELECT ty.event_type, sg.segment,
                              COALESCE(c.n, 0.0) AS n
                       FROM (SELECT DISTINCT event_type FROM c) ty
                       CROSS JOIN (SELECT DISTINCT segment FROM c) sg
                       LEFT JOIN c ON c.event_type = ty.event_type
                                  AND c.segment = sg.segment),
                 t AS (SELECT o.*,
                              sum(n) OVER (PARTITION BY event_type) AS rt,
                              sum(n) OVER (PARTITION BY segment) AS ct,
                              sum(n) OVER () AS tot
                       FROM o)
            SELECT round(sum((n - rt * ct / tot) * (n - rt * ct / tot)
                             / (rt * ct / tot)), 6) AS chi2,
                   CAST((count(DISTINCT event_type) - 1)
                        * (count(DISTINCT segment) - 1) AS BIGINT) AS dof
            FROM t""",
        # mutual information in nats over the same contingency table
        "mutual_information": """
            WITH o AS (SELECT event_type, user_id % 4 AS segment,
                              CAST(count(*) AS DOUBLE) AS n
                       FROM events GROUP BY event_type, user_id % 4),
                 t AS (SELECT n / (sum(n) OVER ()) AS p,
                              (sum(n) OVER (PARTITION BY event_type))
                                / (sum(n) OVER ()) AS px,
                              (sum(n) OVER (PARTITION BY segment))
                                / (sum(n) OVER ()) AS py
                       FROM o)
            SELECT round(sum(p * ln(p / (px * py))), 6) AS mi FROM t""",
        # CDC merge: ordered changelog applied to the base snapshot —
        # newest version per id wins, delete tombstones (v2) drop the id
        "cdc_merge": """
            WITH log AS (
                SELECT doc_id, text, 0 AS v, false AS del FROM documents
                UNION ALL
                SELECT doc_id, text || '!', 1, false FROM documents
                WHERE doc_id % 5 = 0
                UNION ALL
                SELECT doc_id, NULL, 2, true FROM documents
                WHERE doc_id % 7 = 0
                UNION ALL
                SELECT doc_id + 10000000,
                       'new doc ' || CAST(doc_id AS VARCHAR), 1, false
                FROM documents WHERE doc_id % 11 = 0),
                 r AS (SELECT *, row_number() OVER (PARTITION BY doc_id
                           ORDER BY v DESC) AS rn FROM log)
            SELECT doc_id, text FROM r WHERE rn = 1 AND NOT del""",
        # lower weighted median: smallest v with 2*cum_weight >= total
        # (integer weights -> exact comparison, no float boundary)
        "weighted_median": """
            WITH w AS (SELECT user_id, value,
                              CAST(json_extract(props, '$.k') AS BIGINT) + 1
                                AS wt
                       FROM events),
                 o AS (SELECT user_id, value, wt,
                              sum(wt) OVER (PARTITION BY user_id
                                  ORDER BY value ROWS UNBOUNDED PRECEDING)
                                AS cw,
                              sum(wt) OVER (PARTITION BY user_id) AS tw
                       FROM w)
            SELECT user_id, round(min(value), 6) AS wmedian
            FROM o WHERE 2 * cw >= tw GROUP BY user_id""",
        # time-weighted average: value held to the next event; last event
        # carries no duration; single-event users emit nothing
        "time_weighted_avg": """
            WITH l AS (SELECT user_id, value, ts,
                              lead(ts) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nts
                       FROM events)
            SELECT user_id,
                   round(sum(value * epoch(nts - ts))
                         / sum(epoch(nts - ts)), 6) AS twa
            FROM l WHERE nts IS NOT NULL GROUP BY user_id""",
        # interval concurrency: closed-bound containment count per click
        "concurrency": """
            WITH iv AS (SELECT user_id, ts AS s,
                               ts + to_seconds(CAST(floor(value) * 60
                                                    AS BIGINT)) AS e
                        FROM events WHERE event_type = 'view'),
                 p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'click')
            SELECT p.event_id, p.user_id, p.ts,
                   CAST(count(iv.s) AS BIGINT) AS n_open
            FROM p LEFT JOIN iv ON p.user_id = iv.user_id
                               AND p.ts >= iv.s AND p.ts <= iv.e
            GROUP BY p.event_id, p.user_id, p.ts""",
        # numeric band join: same-user click x purchase value-tolerance
        # pairs, |delta| <= 0.05 (closed)
        "band_join": """
            WITH a AS (SELECT user_id, event_id AS a_id, value AS a_value
                       FROM events WHERE event_type = 'click'),
                 b AS (SELECT user_id, event_id AS b_id, value AS b_value
                       FROM events WHERE event_type = 'purchase')
            SELECT a.user_id, a_id, b_id,
                   round(a_value, 6) AS a_value, round(b_value, 6) AS b_value
            FROM a JOIN b ON a.user_id = b.user_id
                         AND abs(a_value - b_value) <= 0.05""",
        # sequential throttle: the stateful fold — window measured from the
        # last KEPT event; per-row recursive CTE walks each (user, type)
        # series carrying the last-kept timestamp
        "throttle": """
            WITH RECURSIVE
              nb AS (SELECT event_id, user_id, event_type, ts,
                            row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
                     FROM events),
              r AS (
                SELECT event_id, user_id, event_type, ts, rn,
                       ts AS last_kept, true AS kept
                FROM nb WHERE rn = 1
                UNION ALL
                SELECT n.event_id, n.user_id, n.event_type, n.ts, n.rn,
                       CASE WHEN n.ts > r.last_kept + INTERVAL 30 MINUTE
                            THEN n.ts ELSE r.last_kept END,
                       n.ts > r.last_kept + INTERVAL 30 MINUTE
                FROM r JOIN nb n ON n.user_id = r.user_id
                                AND n.event_type = r.event_type
                                AND n.rn = r.rn + 1)
            SELECT event_id, user_id, event_type, ts FROM r WHERE kept""",
        # debounce: suppress same-(user, type) events within 30 min of the
        # previous one (lag-gap variant, strictly-greater keep predicate)
        "debounce": """
            WITH l AS (SELECT event_id, user_id, event_type, ts,
                              lag(ts) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS prev_ts
                       FROM events)
            SELECT event_id, user_id, event_type, ts FROM l
            WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE""",
        "hopping_distinct": """
            WITH x AS (SELECT user_id,
                              make_timestamp(
                                  (epoch_us(ts) // 900000000) * 900000000
                                  - CAST(u.j AS BIGINT) * 900000000) AS wstart
                       FROM events, UNNEST([0, 1, 2, 3]) AS u(j))
            SELECT wstart, CAST(count(DISTINCT user_id) AS BIGINT)
                     AS n_distinct
            FROM x GROUP BY wstart""",
        # dense grid zero-fill: full user x type cross with absent combos = 0
        "dense_grid": """
            WITH u AS (SELECT DISTINCT user_id FROM events),
                 t AS (SELECT unnest(['click', 'error', 'purchase',
                                      'signup', 'view']) AS event_type),
                 c AS (SELECT user_id, event_type, count(*) AS n
                       FROM events GROUP BY user_id, event_type)
            SELECT u.user_id, t.event_type,
                   CAST(COALESCE(c.n, 0) AS BIGINT) AS n
            FROM u CROSS JOIN t
            LEFT JOIN c ON c.user_id = u.user_id
                       AND c.event_type = t.event_type""",
        "rollup_orders": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   round(sum(o_totalprice), 2) AS total,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""",
        "corpus_diff": """
            WITH b AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0 THEN text || '!'
                            ELSE text END AS text
                FROM documents WHERE doc_id % 7 <> 0
                UNION ALL
                SELECT doc_id + 10000000 AS doc_id,
                       'new doc ' || CAST(doc_id AS VARCHAR) AS text
                FROM documents WHERE doc_id % 11 = 0)
            SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
                   CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        WHEN a.text = b.text THEN 'same'
                        ELSE 'changed' END AS status
            FROM documents a FULL OUTER JOIN b ON a.doc_id = b.doc_id""",
        "regex_extract": """
            SELECT doc_id,
                   NULLIF(regexp_extract(
                       text, '\\b(join|merge|sort) (\\w+)', 1), '') AS op,
                   NULLIF(regexp_extract(
                       text, '\\b(join|merge|sort) (\\w+)', 2), '') AS arg
            FROM documents""",
        # corr's closed form is convention-free (sample/population factors
        # cancel), so SQL corr() matches the engine's moment formula;
        # round(6) on both sides absorbs float-sum-order noise
        "group_corr": """
            SELECT l_returnflag, l_linestatus,
                   round(corr(CAST(l_quantity AS DOUBLE),
                              CAST(l_extendedprice AS DOUBLE)), 6)
                     AS corr_qty_price
            FROM lineitem GROUP BY l_returnflag, l_linestatus""",
        "unpivot": """
            SELECT l_orderkey, l_linenumber,
                   'l_quantity' AS variable,
                   CAST(l_quantity AS DOUBLE) AS value
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                   CAST(l_extendedprice AS DOUBLE)
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_discount',
                   CAST(l_discount AS DOUBLE)
            FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax',
                   CAST(l_tax AS DOUBLE)
            FROM lineitem""",
        "group_quantiles": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n,
                   round(quantile_cont(CAST(length(text) AS DOUBLE), 0.25), 6)
                     AS len_q25,
                   round(quantile_cont(CAST(length(text) AS DOUBLE), 0.50), 6)
                     AS len_q50,
                   round(quantile_cont(CAST(length(text) AS DOUBLE), 0.90), 6)
                     AS len_q90
            FROM documents GROUP BY lang""",
        # Knuth multiplicative hash replicated exactly (BIGINT arithmetic
        # stays far below 2^63 for these keys). floor() before CAST: the
        # engine truncates int(rate * 2**32); a bare CAST rounds half-up and
        # would diverge for a row landing exactly on the boundary.
        # Efraimidis-Spirakis weighted sample: identical hash-uniform and
        # ln(u)/w ranking on both sides; cutoff-boundary ties broken by key
        "weighted_sample": """
            WITH w AS (SELECT o_orderkey, o_totalprice,
                              ln(CAST(((o_orderkey * 2654435761
                                        + 1 * 2654435769) % 4294967296) + 1
                                      AS DOUBLE) / 4294967296.0)
                                / o_totalprice AS wk
                       FROM orders)
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM w ORDER BY wk DESC, o_orderkey LIMIT 100""",
        "group_quantiles_disc": """
            SELECT o_orderstatus,
                   CAST(count(*) AS BIGINT) AS n,
                   round(quantile_disc(o_totalprice, 0.25), 2) AS q25,
                   round(quantile_disc(o_totalprice, 0.50), 2) AS q50,
                   round(quantile_disc(o_totalprice, 0.75), 2) AS q75
            FROM orders GROUP BY o_orderstatus""",
        "sample": """
            SELECT o_orderkey, o_custkey, o_totalprice FROM orders
            WHERE (o_orderkey * 2654435761 + 1 * 2654435769) % 4294967296
                  < CAST(floor(0.05 * 4294967296) AS BIGINT)""",
        "top_terms": r"""
            SELECT t AS token, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[0-9a-z_]+'))
                    AS t FROM documents)
            GROUP BY t ORDER BY n DESC, t LIMIT 20""",
        "full_outer_join": """
            WITH o AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
                       WHERE o_totalprice > 200000.0),
                 c AS (SELECT c_custkey, c_acctbal FROM customer
                       WHERE c_mktsegment = 'BUILDING')
            SELECT COALESCE(o.o_custkey, c.c_custkey) AS custkey,
                   o.o_orderkey,
                   round(o.o_totalprice, 2) AS o_totalprice,
                   round(c.c_acctbal, 2) AS c_acctbal
            FROM o FULL OUTER JOIN c ON o.o_custkey = c.c_custkey""",
        "filter_sort": """
            SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate FROM orders
            WHERE o_orderstatus = 'O' AND o_totalprice > 200000.0
            ORDER BY o_orderkey""",
        "distinct": """
            SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custkeys,
                   (SELECT CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem)
                     AS n_partkeys
            FROM orders""",
        # multi-level aggregation (stages/rollup.py): CUBE's 4 grouping sets
        # built map-side and merged in one exchange; rolled-up key positions
        # carry the 'ALL' sentinel (COALESCE convention, keys are non-null)
        "cube_orders": """
            SELECT COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
                   COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
                   round(sum(o_totalprice), 2) AS total,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
        # two-pass exact heavy hitters: HAVING over the identical ceil cut
        "heavy_hitters": """
            SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_suppkey
            HAVING count(*) >= CAST(ceil(0.0107 *
                (SELECT count(*) FROM lineitem)) AS BIGINT)""",
        # range partitioner: deterministic Knuth-hash sample -> quantile_disc
        # bounds (rank ceil(q*n) == numpy inverted_cdf) -> part = #bounds < key
        "range_partition": """
            WITH s AS (SELECT o_custkey FROM orders
                       WHERE (o_custkey * 2654435761 + 1 * 2654435769) % 4294967296
                             < CAST(floor(0.25 * 4294967296) AS BIGINT)),
                 b AS (SELECT quantile_disc(o_custkey, [0.25, 0.5, 0.75]) AS q
                       FROM s),
                 a AS (SELECT o_custkey,
                              ((CASE WHEN o_custkey > q[1] THEN 1 ELSE 0 END) +
                               (CASE WHEN o_custkey > q[2] THEN 1 ELSE 0 END) +
                               (CASE WHEN o_custkey > q[3] THEN 1 ELSE 0 END))
                                AS part
                       FROM orders, b)
            SELECT CAST(part AS BIGINT) AS part,
                   CAST(count(*) AS BIGINT) AS n_rows,
                   CAST(min(o_custkey) AS BIGINT) AS min_key,
                   CAST(max(o_custkey) AS BIGINT) AS max_key
            FROM a GROUP BY part""",
        "group_distinct": """
            SELECT o_orderpriority,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_distinct
            FROM orders GROUP BY o_orderpriority""",
        "token_count": r"""
            SELECT doc_id,
                   CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS BIGINT)
                     AS n_tokens,
                   CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                     AS n_ws_tokens
            FROM documents""",
        "redact": r"""
            SELECT doc_id,
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(COALESCE(text, ''),
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                         '<EMAIL>', 'g'),
                       'https?://\S+', '<URL>', 'g'),
                     '\+?\d[\d\-\s()]{7,}\d', '<PHONE>', 'g') AS text,
                   CAST(len(regexp_extract_all(COALESCE(text, ''),
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
                     AS n_emails,
                   CAST(len(regexp_extract_all(COALESCE(text, ''),
                     'https?://\S+')) AS BIGINT) AS n_urls,
                   CAST(len(regexp_extract_all(COALESCE(text, ''),
                     '\+?\d[\d\-\s()]{7,}\d')) AS BIGINT) AS n_phones
            FROM documents""",
        # packing: exclusive window cumsum over the SAME whitespace-token
        # count, integer-bucketed by the 512-token budget. Integer division
        # (DuckDB // on BIGINT) keeps the oracle exact past 2^53 cumulative
        # tokens, matching the engine's int64 floor division bit-for-bit.
        "pack_sequences": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                       AS n_ws_tokens
              FROM documents)
            SELECT doc_id, n_ws_tokens,
                   CAST(COALESCE(SUM(n_ws_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     // 512 AS BIGINT) AS pack_id
            FROM t""",
        "pack_stats": r"""
            WITH t AS (
              SELECT doc_id,
                     CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT)
                       AS n_ws_tokens
              FROM documents),
            p AS (
              SELECT doc_id, n_ws_tokens,
                     CAST(COALESCE(SUM(n_ws_tokens) OVER (
                         ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       // 512 AS BIGINT) AS pack_id
              FROM t)
            SELECT pack_id, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_ws_tokens) AS BIGINT) AS tok_sum
            FROM p GROUP BY pack_id""",
        # ratios, stopword share, mean word length and the composite score,
        # replicated with the SAME RE2 regexes (Arrow count_substring_regex
        # and DuckDB regexp_* are both RE2 with non-overlapping leftmost
        # matches) and the same clip formula on unrounded doubles
        # naive Bayes: identical add-1 log-likelihood on both sides; ties
        # (incl. zero-token docs scored by prior alone) break to lowest label
        "nb_classify": r"""
            WITH tok AS (
              SELECT doc_id, ts[CAST(u.i AS INTEGER)] AS token
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '[0-9a-z_]+') AS ts
                    FROM documents),
                   LATERAL unnest(range(1, len(ts) + 1)) AS u(i)),
                 ct AS (SELECT d.lang, t.token, CAST(count(*) AS DOUBLE) AS n
                        FROM tok t JOIN documents d USING (doc_id)
                        GROUP BY 1, 2),
                 tot AS (SELECT lang, sum(n) AS tot FROM ct GROUP BY lang),
                 voc AS (SELECT CAST(count(DISTINCT token) AS DOUBLE) AS V
                         FROM ct),
                 pri AS (SELECT lang,
                                ln(count(*) / (SELECT CAST(count(*) AS DOUBLE)
                                               FROM documents)) AS lpri
                         FROM documents GROUP BY lang),
                 sc AS (SELECT t.doc_id, p.lang,
                               any_value(p.lpri)
                                 + sum(ln((COALESCE(ct.n, 0) + 1)
                                          / (COALESCE(tot.tot, 0) + voc.V)))
                                 AS s
                        FROM tok t CROSS JOIN pri p
                        LEFT JOIN tot ON tot.lang = p.lang
                        LEFT JOIN ct ON ct.lang = p.lang
                                    AND ct.token = t.token, voc
                        GROUP BY t.doc_id, p.lang),
                 r AS (SELECT doc_id, lang,
                              row_number() OVER (PARTITION BY doc_id
                                                 ORDER BY s DESC, lang) AS rn
                       FROM sc),
                 empty AS (SELECT doc_id FROM documents
                           WHERE doc_id NOT IN (SELECT doc_id FROM tok)),
                 bp AS (SELECT lang FROM pri ORDER BY lpri DESC, lang LIMIT 1)
            SELECT doc_id, lang AS pred FROM r WHERE rn = 1
            UNION ALL
            SELECT e.doc_id, bp.lang AS pred FROM empty e, bp""",
        "text_quality": _text_quality_sql(),
        # per-doc char-distribution Shannon entropy; round-6 absorbs the
        # summation-order difference vs the engine's sorted-codepoint fold
        "char_entropy": """
            WITH cnt AS (
              SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
              FROM (SELECT doc_id,
                           unnest(string_split(coalesce(text, ''), '')) AS ch
                    FROM documents)
              GROUP BY doc_id, ch),
            tot AS (SELECT doc_id, sum(c) AS n FROM cnt GROUP BY doc_id),
            e AS (SELECT cnt.doc_id, -sum((c / n) * log2(c / n)) AS ent
                  FROM cnt JOIN tot USING (doc_id) GROUP BY cnt.doc_id)
            SELECT d.doc_id, round(coalesce(e.ent, 0.0), 6) AS char_entropy
            FROM documents d LEFT JOIN e USING (doc_id)""",
        # add-one char-trigram LM: counts joined back to gram instances,
        # cross entropy = avg -log2 p; round-6 absorbs summation order
        "lm_score": """
            WITH g AS (
              SELECT doc_id, substr(text, CAST(u.i AS INTEGER), 3) AS g
              FROM documents,
                   LATERAL unnest(range(1, greatest(length(text) - 2, 0) + 1))
                     AS u(i)),
            cnt AS (SELECT g, CAST(count(*) AS DOUBLE) AS c FROM g GROUP BY g),
            tot AS (SELECT sum(c) AS t, CAST(count(*) AS DOUBLE) AS v FROM cnt),
            s AS (SELECT doc_id, avg(-log2((c + 1) / (t + v))) AS xent
                  FROM g JOIN cnt USING (g), tot GROUP BY doc_id)
            SELECT d.doc_id, round(coalesce(s.xent, 0.0), 6) + 0 AS lm_score
            FROM documents d LEFT JOIN s USING (doc_id)""",
        # prefix-blocked exact Levenshtein; DuckDB levenshtein counts bytes,
        # == codepoints on this ASCII corpus (functions/editdist.py docstring)
        "edit_distance_pairs": """
            WITH t AS (SELECT doc_id,
                              substr(coalesce(text, ''), 1, 16)  AS blk,
                              substr(coalesce(text, ''), 1, 200) AS tt
                       FROM documents)
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(levenshtein(a.tt, b.tt) AS BIGINT) AS dist
            FROM t a JOIN t b ON a.blk = b.blk AND a.doc_id < b.doc_id
            WHERE levenshtein(a.tt, b.tt) <= 20""",
        "curation": _curation_sql(),
        "token_explode": r"""
            SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
                   toks[CAST(u.i AS INTEGER)] AS token
            FROM (SELECT doc_id, string_split(text, ' ') AS toks
                  FROM documents) t,
                 LATERAL unnest(range(1, len(toks) + 1)) AS u(i)""",
        "boilerplate_share": r"""
            WITH w AS (SELECT doc_id,
                              array_to_string(
                                ts[CAST(u.i AS INTEGER):CAST(u.i + 4 AS INTEGER)],
                                ' ') AS gram
                       FROM (SELECT doc_id,
                                    regexp_extract_all(lower(text),
                                                       '[0-9a-z_]+') AS ts
                             FROM documents),
                            LATERAL unnest(range(1, greatest(len(ts) - 4, 0) + 1))
                              AS u(i)),
                 bp AS (SELECT gram FROM (SELECT DISTINCT doc_id, gram FROM w)
                        GROUP BY gram HAVING count(*) >= 2),
                 sc AS (SELECT w.doc_id,
                               round(sum(CASE WHEN bp.gram IS NULL
                                              THEN 0.0 ELSE 1.0 END)
                                     / CAST(count(*) AS DOUBLE), 6) AS sh
                        FROM w LEFT JOIN bp USING (gram)
                        GROUP BY w.doc_id)
            SELECT d.doc_id, COALESCE(sc.sh, 0.0) AS bp_share
            FROM documents d LEFT JOIN sc USING (doc_id)""",
        # intra-doc repetition: 1 - distinct/total 3-grams; <3-token docs -> 0
        "repetition": r"""
            WITH g AS (SELECT doc_id,
                              array_to_string(
                                ts[CAST(u.i AS INTEGER):CAST(u.i + 2 AS INTEGER)],
                                ' ') AS gram
                       FROM (SELECT doc_id,
                                    regexp_extract_all(lower(text),
                                                       '[0-9a-z_]+') AS ts
                             FROM documents),
                            LATERAL unnest(range(1, greatest(len(ts) - 2, 0) + 1))
                              AS u(i)),
                 r AS (SELECT doc_id,
                              round(1.0 - count(DISTINCT gram)
                                          / CAST(count(*) AS DOUBLE), 6) AS rr
                       FROM g GROUP BY doc_id)
            SELECT d.doc_id, COALESCE(r.rr, 0.0) AS rep_ratio
            FROM documents d LEFT JOIN r USING (doc_id)""",
        # boilerplate: 1-based INCLUSIVE list slices build the same 5-grams
        "boilerplate": r"""
            WITH g AS (SELECT DISTINCT doc_id,
                              array_to_string(
                                ts[CAST(u.i AS INTEGER):CAST(u.i + 4 AS INTEGER)],
                                ' ') AS gram
                       FROM (SELECT doc_id,
                                    regexp_extract_all(lower(text),
                                                       '[0-9a-z_]+') AS ts
                             FROM documents),
                            LATERAL unnest(range(1, greatest(len(ts) - 4, 0) + 1))
                              AS u(i))
            SELECT gram, CAST(count(*) AS BIGINT) AS n_docs
            FROM g GROUP BY gram HAVING count(*) >= 2""",
        # collocations: PMI = ln(n_ab * N / (n_a * n_b)) over adjacent pairs
        "bigram_pmi": r"""
            WITH tok AS (
              SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
                     ts[CAST(u.i AS INTEGER)] AS token
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '[0-9a-z_]+') AS ts
                    FROM documents),
                   LATERAL unnest(range(1, len(ts) + 1)) AS u(i)),
                 bi AS (SELECT a.token AS w1, b.token AS w2,
                               count(*) AS n_ab
                        FROM tok a JOIN tok b
                          ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
                        GROUP BY 1, 2 HAVING count(*) >= 5),
                 uni AS (SELECT token AS w, count(*) AS n FROM tok GROUP BY 1),
                 tot AS (SELECT CAST(count(*) AS DOUBLE) AS nu FROM tok)
            SELECT bi.w1, bi.w2, CAST(bi.n_ab AS BIGINT) AS n_ab,
                   round(ln(bi.n_ab * nu / (ua.n * ub.n)), 4) + 0 AS pmi
            FROM bi JOIN uni ua ON ua.w = bi.w1
                    JOIN uni ub ON ub.w = bi.w2, tot""",
        # token-id encode: rank-ordered frequency vocab (count desc, token
        # asc), OOV -> 0, 1-based positions from the ordinality explode
        "token_ids": r"""
            WITH tok AS (
              SELECT doc_id, CAST(u.i AS BIGINT) AS pos, ts[CAST(u.i AS INTEGER)] AS token
              FROM (SELECT doc_id,
                           regexp_extract_all(lower(text), '[0-9a-z_]+') AS ts
                    FROM documents),
                   LATERAL unnest(range(1, len(ts) + 1)) AS u(i)),
                 cnt AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
                 vocab AS (SELECT token,
                                  row_number() OVER (ORDER BY n DESC, token)
                                    AS tid
                           FROM cnt QUALIFY tid <= 1000)
            SELECT t.doc_id, t.pos,
                   CAST(COALESCE(v.tid, 0) AS BIGINT) AS token_id
            FROM tok t LEFT JOIN vocab v USING (token)""",
        "json_extract": """
            SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k
            FROM events""",
        # inclusive [p10, p90] window; quantile_cont == np.quantile linear
        # interpolation, and integer lengths make boundary hits exact
        "quantile_filter": """
            WITH q AS (SELECT lang,
                              quantile_cont(CAST(length(text) AS DOUBLE), 0.10)
                                AS lo,
                              quantile_cont(CAST(length(text) AS DOUBLE), 0.90)
                                AS hi
                       FROM documents GROUP BY lang)
            SELECT d.doc_id, d.lang, CAST(length(d.text) AS BIGINT) AS len
            FROM documents d JOIN q USING (lang)
            WHERE length(d.text) >= q.lo AND length(d.text) <= q.hi""",
        # rank on the ROUNDED score (round-half-away == DuckDB round) with
        # token tiebreak, so engine and oracle orderings agree exactly
        "tfidf_top_terms": r"""
            WITH ex AS (SELECT doc_id,
                               unnest(regexp_extract_all(lower(text),
                                                         '[0-9a-z_]+')) AS token
                        FROM documents),
                 tc AS (SELECT doc_id, token, count(*) AS cnt
                        FROM ex GROUP BY doc_id, token),
                 nd AS (SELECT doc_id, count(*) AS n_doc FROM ex GROUP BY doc_id),
                 df AS (SELECT token, count(*) AS df_n FROM tc GROUP BY token),
                 n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
                 scored AS (SELECT tc.doc_id, tc.token,
                                   round((cnt / CAST(n_doc AS DOUBLE))
                                         * ln(n_docs / CAST(df_n AS DOUBLE)), 6)
                                     AS tfidf
                            FROM tc JOIN nd USING (doc_id)
                                    JOIN df USING (token), n),
                 ranked AS (SELECT doc_id, token, tfidf,
                                   row_number() OVER (PARTITION BY doc_id
                                       ORDER BY tfidf DESC, token) AS rn
                            FROM scored)
            SELECT doc_id, token, tfidf FROM ranked WHERE rn <= 3""",
        # exact all-pairs character-5-gram Jaccard (documents are ASCII, so
        # SQL char grams == the engine's byte shingles; DISTINCT grams ==
        # distinct 64-bit shingle hashes, collision-free at these sizes)
        "flagship_backfill": _flagship_sql(),
        "langid": _langid_sql(),
        # literal-table oracles: expected values recomputed by an independent
        # single-process implementation and embedded as VALUES literals
        # (pipelines/oracle_literals.py; the golden-vector doctest strategy,
        # /root/reference/rp_extract.py:424-445)
        "fingerprint": _lit.fingerprint_sql(),
        "compression_ratio": _lit.compression_sql(),
        # span-level dedup: 40-char window explode; a span is duplicated iff
        # it occurs in >=2 distinct docs (min != max doc id)
        "dup_spans": """
            WITH w AS (
              SELECT doc_id,
                     substr(text, CAST(u.i AS BIGINT) * 40 + 1, 40) AS win
              FROM (SELECT doc_id, text,
                           range(CAST(floor(length(text) / 40) AS BIGINT))
                             AS idxs
                    FROM documents),
                   UNNEST(idxs) AS u(i)),
                 d AS (SELECT win FROM w
                       GROUP BY win HAVING min(doc_id) <> max(doc_id))
            SELECT w.doc_id AS doc_id,
                   CAST(count(*) AS BIGINT) AS n_windows,
                   CAST(count(d.win) AS BIGINT) AS n_dup_windows
            FROM w LEFT JOIN d USING (win)
            GROUP BY w.doc_id""",
        "kmeans_clusters": _lit.kmeans_sql(),
        "pca_variance": _lit.pca_variance_sql(),
        # covar_pop over index-exploded vectors; round-6 on both sides
        "embedding_covariance": """
            WITH e AS (SELECT vec_id, CAST(u.i AS BIGINT) - 1 AS i,
                              CAST(embedding[u.i] AS DOUBLE) AS x
                       FROM embeddings,
                            LATERAL unnest(range(1, len(embedding) + 1)) AS u(i))
            SELECT a.i AS i, b.i AS j,
                   round(covar_pop(a.x, b.x), 6) + 0 AS cov
            FROM e a JOIN e b ON a.vec_id = b.vec_id
            GROUP BY a.i, b.i""",
        "group_hll": _lit.group_hll_sql(),
        "simhash_pairs": _lit.simhash_pairs_sql(),
        "rhythm_features": _lit.rhythm_sql(),
        "rhythm_segments": _lit.rhythm_segments_sql(),
        "hll_distinct": f"""
            SELECT CAST({_lit.hll_custkeys_literal()} AS BIGINT) AS n_custkeys_hll,
                   CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_custkeys_exact
            FROM orders""",
        "cms_counts": _lit.cms_user_counts_sql(),
        "minhash_pairs": _JACCARD_SQL,
        "ngram_jaccard_pairs": _JACCARD_SQL,
        # decontamination: distinct-gram containment |C∩B|/|B| (grams as
        # strings == the engine's collision-free 64-bit shingle hashes)
        "contamination": r"""
            WITH c AS (SELECT doc_id, text FROM documents
                       WHERE source NOT IN ('src0', 'src1')),
                 b AS (SELECT doc_id, text FROM documents
                       WHERE source IN ('src0', 'src1')),
                 cs AS (SELECT DISTINCT doc_id,
                               substring(text, CAST(u.i AS INTEGER), 5) AS g
                        FROM c, LATERAL unnest(
                            range(1, greatest(length(text) - 4, 1) + 1)) AS u(i)),
                 bs AS (SELECT DISTINCT doc_id,
                               substring(text, CAST(u.i AS INTEGER), 5) AS g
                        FROM b, LATERAL unnest(
                            range(1, greatest(length(text) - 4, 1) + 1)) AS u(i)),
                 bn AS (SELECT doc_id, count(*) AS n FROM bs GROUP BY doc_id),
                 sh AS (SELECT cs.doc_id AS corpus_id, bs.doc_id AS bench_id,
                               CAST(count(*) AS BIGINT) AS n_shared
                        FROM cs JOIN bs ON cs.g = bs.g GROUP BY 1, 2)
            SELECT corpus_id, bench_id, n_shared,
                   round(n_shared / CAST(bn.n AS DOUBLE), 6) AS containment
            FROM sh JOIN bn ON bn.doc_id = bench_id
            WHERE round(n_shared / CAST(bn.n AS DOUBLE), 6) >= 0.6""",
        "near_dup_clusters": _CLUSTERS_SQL,
        "dedup_drop": _DEDUP_DROP_SQL,
        "embedding_near_dup": _embedding_near_dup_sql(),
        "cosine_pairs": _COSINE_PAIRS_SQL,
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
        "knn_lsh": """
            SELECT vec_id,
                   round(CAST(list_cosine_similarity(
                       embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 7)) AS DOUBLE),
                         4) AS cos
            FROM embeddings
            ORDER BY list_cosine_similarity(
                       embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 7)) DESC,
                     vec_id
            LIMIT 10""",
        "knn_ivf": """
            SELECT vec_id,
                   round(CAST(list_cosine_similarity(
                       embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 7)) AS DOUBLE),
                         4) AS cos
            FROM embeddings
            ORDER BY list_cosine_similarity(
                       embedding,
                       (SELECT embedding FROM embeddings WHERE vec_id = 7)) DESC,
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
    # the sharded ring path must produce the EXACT same rows as the
    # single-actor stream — one oracle gates both
    out["ring_stream_sharded"] = out["ring_stream"]
    return out
