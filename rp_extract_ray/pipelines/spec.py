"""Declarative pipeline spec — §2.10's extension surface made concrete.

The reference exposes every psychoacoustic stage as a boolean/int kwarg of
one giant function (`rp_extract(...)`, /root/reference/rp_extract.py:384-405)
and a feature-type registry (`available_feature_types`, :805-807). The
Ray-native re-expression SURVEY.md prescribes: a LIST OF STAGE CONFIGS
compiled to a chain of Dataset transforms, so pipelines are data (storable,
diffable, driver-agnostic) rather than call sites.

    spec = [
        {"stage": "turn_stats"},
        {"stage": "sessionize", "gap_threshold_s": 900},
        {"stage": "window", "k": 8, "series_cols": ["text_len"]},
        {"stage": "lag", "value_cols": ["text_len"], "lags": [1, 2]},
        {"stage": "asof", "right": events_ds, "right_value_cols": ["value"]},
    ]
    ds = build_pipeline(ds, spec)

Each entry names a registered stage; remaining keys pass through as that
stage's kwargs. Unknown stages raise with the available names. The registry
is open: ``register_stage`` is the user-extension hook.
"""

from __future__ import annotations

from typing import Any, Callable

from ray.data import Dataset


def _turn_stats(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.turns import add_turn_stats

    return add_turn_stats(ds, **kw)


def _sessionize(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.session import sessionize

    return sessionize(ds, **kw)


def _window(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.window import add_window_features

    series = kw.pop("series_cols", None)
    if series is not None:
        return add_window_features(ds, series, **kw)
    return add_window_features(ds, **kw)


def _lag(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.lag import add_lag_features

    return add_lag_features(ds, kw.pop("value_cols"), **kw)


def _asof(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.asof import asof_join

    return asof_join(ds, kw.pop("right"), **kw)


def _ewma(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.lag import add_ewma_features

    return add_ewma_features(ds, kw.pop("value_cols"), **kw)


def _cumulative(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.lag import add_cumulative_features

    return add_cumulative_features(ds, kw.pop("value_cols"), **kw)


def _rank(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.lag import add_rank_features

    return add_rank_features(ds, kw.pop("value_cols"), **kw)


def _range_join(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.rangejoin import range_join

    return range_join(ds, kw.pop("intervals"), **kw)


def _time_window(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.timegrid import time_window_aggregate

    return time_window_aggregate(ds, **kw)


def _time_grid(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.timegrid import time_grid_aggregate

    return time_grid_aggregate(ds, **kw)


def _rhythm(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.rhythm import rhythm_features

    return rhythm_features(ds, **kw)


def _standardize(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.standardize import standardize

    return standardize(ds, kw.pop("value_cols"), **kw)


def _validate(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.validate import validate_transcripts

    return validate_transcripts(ds, **kw)


def _token_counts(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.textstage import add_token_counts

    return add_token_counts(ds, **kw)


def _quality(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.textstage import add_quality_scores

    return add_quality_scores(ds, **kw)


def _langid(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.textstage import add_langid

    return add_langid(ds, **kw)


def _fingerprints(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.textstage import add_fingerprints

    return add_fingerprints(ds, **kw)


def _tfidf_top_terms(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.tfidf import tfidf_top_terms

    return tfidf_top_terms(ds, **kw)


def _merge_intervals(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.intervals import merge_intervals

    return merge_intervals(ds, **kw)


def _time_bucket(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.timegrid import time_bucket_agg

    return time_bucket_agg(ds, **kw)


def _time_grid_lerp(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.timegrid import time_grid_interpolate

    return time_grid_interpolate(ds, **kw)


def _rollup(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.rollup import rollup_aggregate

    return rollup_aggregate(ds, kw.pop("cols"), **kw)


def _cube(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.rollup import cube_aggregate

    return cube_aggregate(ds, kw.pop("cols"), **kw)


def _grouped_reduce(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.groupops import grouped_reduce

    return grouped_reduce(ds, kw.pop("keys"), kw.pop("how"), **kw)


def _cohort_retention(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.session import cohort_retention

    return cohort_retention(ds, **kw)


def _flatten(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.session import flatten_ordered

    return flatten_ordered(ds, **kw)


def _transitions(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.lag import transition_counts

    return transition_counts(ds, **kw)


def _token_ids(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.textstage import encode_token_ids

    return encode_token_ids(ds, **kw)


def _bigram_pmi(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.textstage import bigram_pmi

    return bigram_pmi(ds, **kw)


def _boilerplate(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.textstage import boilerplate_ngrams

    return boilerplate_ngrams(ds, **kw)


def _ntile(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.lag import add_ntile

    return add_ntile(ds, kw.pop("k"), **kw)


def _longest_streak(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.lag import longest_streak

    return longest_streak(ds, **kw)


def _repetition(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.textstage import add_repetition_ratio

    return add_repetition_ratio(ds, **kw)


def _boilerplate_share(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.textstage import add_boilerplate_share

    return add_boilerplate_share(ds, **kw)


def _dedup_normalized(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.dedup import normalized_exact_dedup

    return normalized_exact_dedup(ds, **kw)


def _redact(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.textstage import redact_pii

    return redact_pii(ds, **kw)


def _pack(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.pack import pack_sequences

    return pack_sequences(ds, **kw)


def _pack_stats(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.pack import pack_stats

    return pack_stats(ds, **kw)


def _group_mode(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.groupops import grouped_mode

    return grouped_mode(ds, **kw)


def _group_corr(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.groupops import grouped_corr

    return grouped_corr(ds, **kw)


def _unpivot(ds: Dataset, **kw) -> Dataset:
    from rp_extract_ray.stages.pivot import unpivot

    return unpivot(ds, **kw)


_REGISTRY: dict[str, Callable[..., Dataset]] = {
    "turn_stats": _turn_stats,
    "sessionize": _sessionize,
    "window": _window,
    "lag": _lag,
    "ewma": _ewma,
    "cumulative": _cumulative,
    "rank": _rank,
    "asof": _asof,
    "range_join": _range_join,
    "time_window": _time_window,
    "time_grid": _time_grid,
    "rhythm": _rhythm,
    "standardize": _standardize,
    "validate": _validate,
    # text-analysis stages (documents tables)
    "token_counts": _token_counts,
    "quality": _quality,
    "langid": _langid,
    "fingerprints": _fingerprints,
    "tfidf_top_terms": _tfidf_top_terms,
    # round-3 session-2 additions
    "merge_intervals": _merge_intervals,
    "time_bucket": _time_bucket,
    "time_grid_lerp": _time_grid_lerp,
    "rollup": _rollup,
    "cube": _cube,
    "grouped_reduce": _grouped_reduce,
    "cohort_retention": _cohort_retention,
    "flatten": _flatten,
    "transitions": _transitions,
    "token_ids": _token_ids,
    "bigram_pmi": _bigram_pmi,
    "boilerplate": _boilerplate,
    "ntile": _ntile,
    "longest_streak": _longest_streak,
    "repetition": _repetition,
    "boilerplate_share": _boilerplate_share,
    "dedup_normalized": _dedup_normalized,
    # round-4 additions
    "redact": _redact,
    "pack": _pack,
    "pack_stats": _pack_stats,
    # round-5 additions
    "group_mode": _group_mode,
    "group_corr": _group_corr,
    "unpivot": _unpivot,
}


def available_stages() -> list[str]:
    """The feature/stage registry (reference `available_feature_types`,
    /root/reference/rp_extract.py:805-807)."""
    return sorted(_REGISTRY)


def register_stage(name: str, fn: Callable[..., Dataset]) -> None:
    """User-extension hook: plug a custom stage into the spec language."""
    _REGISTRY[name] = fn


def build_pipeline(ds: Dataset, spec: list[dict[str, Any]]) -> Dataset:
    """Compile a stage-config list into a chained Dataset pipeline."""
    for i, entry in enumerate(spec):
        entry = dict(entry)
        name = entry.pop("stage", None)
        if name not in _REGISTRY:
            raise ValueError(
                f"spec[{i}]: unknown stage {name!r}; available: {available_stages()}"
            )
        ds = _REGISTRY[name](ds, **entry)
    return ds
