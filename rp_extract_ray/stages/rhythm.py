"""Rhythm-analogue feature stage: RP / RH / RH2 / MVD / SSD per segment,
median/mean + TSSD/TRH aggregates per conversation.

The transcript re-derivation of the reference's per-document extraction chain
(/root/reference/rp_extract.py:380-802): a conversation's per-turn numeric
series (text_len, token_est, gap_s — the "bark bands") are cut into
fixed-length turn segments by the reference's window plan (M4, :484-514 —
skip-lead-in/fade-out, short-input fallback), each segment gets a modulation
spectrum (2nd FFT, M16), fluctuation weighting (M17), RH band-sum (M18), MVD
(M19) and the 7-stat SSD; segments aggregate per conversation with median
(rp, rh) / mean (ssd, mvd) (M20, :765-787) and stats-of-stats TSSD/TRH
(M21, :789-795).

Two output modes (the reference's ``return_segment_features`` switch,
:797-800):

* ``per_segment`` — one row per (conv, segment) with ``ts_end`` = timestamp
  of the segment's last turn: a point-in-time feature row whose window reads
  only turns at or before ``ts_end`` (zero leakage).
* per-conversation — one row per conv with aggregated + temporal vectors;
  convs shorter than one segment emit ``n_segments=0`` with null vectors (the
  reference raises and its batch driver logs-and-continues,
  /root/reference/rp_extract_batch.py:421-425 — the lineage sidecar counts
  them).

Vector layout: series-major flatten, documented in schema metadata —
the explicit replacement for the reference's Fortran-order flatten
(/root/reference/rp_extract.py:451).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
from numpy.lib.stride_tricks import sliding_window_view

from ray.data import Dataset

from rp_extract_ray.functions.fluctuation import (
    rhythm_features_for_segments,
    segment_plan,
)
from rp_extract_ray.functions.stats import seven_stats
from rp_extract_ray.schema import (
    DEFAULT_SEGMENT_TURNS,
    DEFAULT_SKIP_LEADIN_FADEOUT,
    DEFAULT_STEP_WIDTH,
    N_MOD_FREQ,
    TRACKED_SERIES,
)
from rp_extract_ray.stages.lag import gap_seconds
from rp_extract_ray.stages.partition import entity_starts, partitioned_apply


def _fsl(mat: np.ndarray, dim: int) -> pa.FixedSizeListArray:
    return pa.FixedSizeListArray.from_arrays(
        pa.array(np.ascontiguousarray(mat, dtype=np.float64).reshape(-1)), dim
    )


def _entity_array(values, dtype) -> pa.Array:
    """Entity column with a stable Arrow type even when empty (object->string)."""
    if np.dtype(dtype) == object:
        return pa.array([str(v) for v in values], type=pa.string())
    return pa.array(np.asarray(values, dtype=dtype))


def _conv_slices(ent: np.ndarray) -> list[tuple[int, int]]:
    starts = entity_starts(ent)
    bounds = np.unique(starts)
    ends = np.append(bounds[1:], len(ent))
    return list(zip(bounds.tolist(), ends.tolist()))


def make_rhythm_fn(
    series_cols: Sequence[str],
    *,
    entity_col: str,
    ts_col: str,
    seg_len: int,
    step_width: int,
    skip_leadin_fadeout: int,
    n_mod: int,
    log_transform: bool,
    weighting: bool,
    per_segment: bool,
    filterbank_out: int | None = None,
    series_map=None,
):
    n_series = len(series_cols)
    fb = None
    if filterbank_out is not None:
        # M10 analogue (triangular filterbank over mod-freq bins); built once
        # here and serialized into the task closure (ST1 constant pattern)
        from rp_extract_ray.functions.transforms import triangular_filterbank

        fb = triangular_filterbank(n_mod, filterbank_out)
    eff_mod = filterbank_out if filterbank_out is not None else n_mod
    dim_rp, dim_rh, dim_mvd, dim_ssd = (
        n_series * eff_mod,
        eff_mod,
        eff_mod * 7,
        n_series * 7,
    )

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pa.Table:
        ent = pdf[entity_col].to_numpy()
        if "gap_s" in series_cols and "gap_s" not in pdf.columns:
            pdf = pdf.assign(gap_s=gap_seconds(pdf[ts_col].to_numpy(), starts))
        series = np.stack(
            [pdf[c].to_numpy(dtype=np.float64) for c in series_cols]
        )  # (n_series, n_rows)
        if log_transform:
            series = np.log1p(np.maximum(series, 0.0))  # dB-transform analogue (M12)
        if series_map is not None:
            series = series_map(series)  # M13/M14 piecewise-map seam
        ts = pdf[ts_col].to_numpy()

        out_ent, seg_idx, turn_start, ts_start, ts_end = [], [], [], [], []
        mats = {k: [] for k in ("rp", "rh", "rh2", "mvd", "ssd")}
        agg_rows = []
        for lo, hi in _conv_slices(ent):
            n = hi - lo
            plan = segment_plan(n, seg_len, step_width, skip_leadin_fadeout)
            m = len(plan)
            if m == 0:
                if not per_segment:
                    agg_rows.append((ent[lo], n, 0, None))
                continue
            S = series[:, lo:hi]
            sw = sliding_window_view(S, seg_len, axis=1)  # (n_series, n-seg+1, seg)
            segs = np.ascontiguousarray(sw[:, plan, :].transpose(1, 0, 2))
            feats = rhythm_features_for_segments(segs, n_mod, weighting, filterbank=fb)
            if per_segment:
                out_ent.extend([ent[lo]] * m)
                seg_idx.extend(range(m))
                turn_start.extend((plan).tolist())
                ts_start.extend(ts[lo + plan])
                ts_end.extend(ts[lo + plan + seg_len - 1])
                for k in mats:
                    mats[k].append(feats[k])
            else:
                agg_rows.append((ent[lo], n, m, feats))

        if per_segment:
            if out_ent:
                cols = {
                    entity_col: _entity_array(out_ent, pdf[entity_col].dtype),
                    "seg_idx": pa.array(np.array(seg_idx, dtype=np.int32)),
                    "turn_start": pa.array(np.array(turn_start, dtype=np.int64)),
                    "ts_start": pa.array(np.array(ts_start).astype("datetime64[us]")),
                    "ts_end": pa.array(np.array(ts_end).astype("datetime64[us]")),
                }
                stk = {k: np.concatenate(v) for k, v in mats.items()}
            else:
                cols = {
                    entity_col: _entity_array([], pdf[entity_col].dtype),
                    "seg_idx": pa.array([], pa.int32()),
                    "turn_start": pa.array([], pa.int64()),
                    "ts_start": pa.array([], pa.timestamp("us")),
                    "ts_end": pa.array([], pa.timestamp("us")),
                }
                stk = {
                    "rp": np.empty((0, dim_rp)),
                    "rh": np.empty((0, dim_rh)),
                    "rh2": np.empty((0, dim_rh)),
                    "mvd": np.empty((0, dim_mvd)),
                    "ssd": np.empty((0, dim_ssd)),
                }
            for k, dim in (
                ("rp", dim_rp), ("rh", dim_rh), ("rh2", dim_rh),
                ("mvd", dim_mvd), ("ssd", dim_ssd),
            ):
                cols[k] = _fsl(stk[k], dim)
            return pa.table(cols)

        # per-conversation aggregation (M20/M21)
        dims = {
            "rp": dim_rp, "rh": dim_rh, "ssd": dim_ssd, "mvd": dim_mvd,
            "tssd": dim_ssd * 7, "trh": dim_rh * 7,
        }
        acc = {k: [] for k in dims}
        ids, n_turns, n_segs = [], [], []
        for cid, n, m, feats in agg_rows:
            ids.append(cid)
            n_turns.append(n)
            n_segs.append(m)
            if m == 0:
                for k in dims:
                    acc[k].append(np.full(dims[k], np.nan))
                continue
            acc["rp"].append(np.median(feats["rp"], axis=0))
            acc["rh"].append(np.median(feats["rh"], axis=0))
            acc["ssd"].append(feats["ssd"].mean(axis=0))
            acc["mvd"].append(feats["mvd"].mean(axis=0))
            acc["tssd"].append(seven_stats(feats["ssd"].T).reshape(-1))
            acc["trh"].append(seven_stats(feats["rh"].T).reshape(-1))
        cols = {
            entity_col: _entity_array(ids, pdf[entity_col].dtype),
            "n_turns": pa.array(np.array(n_turns, dtype=np.int64)),
            "n_segments": pa.array(np.array(n_segs, dtype=np.int32)),
        }
        # dominant modulation frequency (1-based bin of the RH peak) — the
        # BPM-from-RH argmax of the reference tutorial (SURVEY.md §2.7)
        dom = np.array(
            [int(np.argmax(v)) + 1 if len(v) and not np.isnan(v[0]) else 0
             for v in acc["rh"]],
            dtype=np.int32,
        )
        cols["dominant_mod_freq"] = pa.array(dom)
        # n_segments==0 rows carry NaN-filled vectors (numeric, not null —
        # keeps the column a plain fixed_size_list<double>)
        for k, dim in dims.items():
            stacked = (
                np.stack(acc[k]) if acc[k] else np.empty((0, dim), dtype=np.float64)
            )
            cols[k] = _fsl(stacked, dim)
        return pa.table(cols)

    return fn


def rhythm_features(
    ds: Dataset,
    series_cols: Sequence[str] = TRACKED_SERIES,
    *,
    entity_col: str = "conv_id",
    ts_col: str = "ts",
    order_cols: Sequence[str] = ("ts", "turn_idx"),
    seg_len: int = DEFAULT_SEGMENT_TURNS,
    step_width: int = DEFAULT_STEP_WIDTH,
    skip_leadin_fadeout: int = DEFAULT_SKIP_LEADIN_FADEOUT,
    n_mod: int = N_MOD_FREQ,
    log_transform: bool = True,
    weighting: bool = True,
    per_segment: bool = False,
    filterbank_out: int | None = None,
    series_map=None,
    num_partitions: int = 64,
) -> Dataset:
    """Rhythm-analogue features. Requires whole conversations per partition
    (no salting): RP/RH aggregation is a median over ALL segments of a conv —
    a holistic aggregate computed where the group is local (SURVEY.md §7.5-4).
    """
    fn = make_rhythm_fn(
        list(series_cols),
        entity_col=entity_col,
        ts_col=ts_col,
        seg_len=seg_len,
        step_width=step_width,
        skip_leadin_fadeout=skip_leadin_fadeout,
        n_mod=n_mod,
        log_transform=log_transform,
        weighting=weighting,
        per_segment=per_segment,
        filterbank_out=filterbank_out,
        series_map=series_map,
    )
    return partitioned_apply(
        ds,
        fn,
        entity_col=entity_col,
        order_cols=order_cols,
        num_partitions=num_partitions,
    )
