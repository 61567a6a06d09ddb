"""Cross-stage composition: per-segment rhythm descriptors as-of joined back
onto turns — every turn carries the latest AVAILABLE segment vector (computed
from turns at or before it; zero leakage by ts_end construction)."""

import numpy as np
import pandas as pd
import ray.data as rd

from rp_extract_ray.stages.asof import asof_join
from rp_extract_ray.stages.rhythm import rhythm_features
from rp_extract_ray.stages.turns import add_turn_stats

SEG = 16


def test_segment_features_backfill(corpus):
    t, _ = corpus
    turns = add_turn_stats(rd.from_arrow(t))
    segs = rhythm_features(
        turns, seg_len=SEG, n_mod=8, order_cols=("ts", "turn_idx"),
        per_segment=True, num_partitions=8,
    )

    # as-of: right ts = segment availability time (ts_end)
    right = segs.map_batches(
        lambda b: b.select(["conv_id", "ts_end", "seg_idx"]).rename_columns(
            ["conv_id", "ts", "seg_idx"]
        ),
        batch_format="pyarrow",
    )
    joined = asof_join(
        rd.from_arrow(t), right, right_value_cols=["seg_idx"],
        direction="backward", num_partitions=8,
    ).to_pandas()

    segs_pdf = segs.to_pandas()
    src = t.to_pandas().sort_values(["conv_id", "ts", "turn_idx"])

    # spot-check a conversation that has segments
    cid = segs_pdf["conv_id"].iloc[0]
    conv = joined[joined.conv_id == cid].sort_values("turn_idx")
    cseg = segs_pdf[segs_pdf.conv_id == cid].sort_values("seg_idx")
    # before the first segment completes: no feature available
    first_end = cseg["ts_end"].iloc[0]
    before = conv[conv.ts < first_end]
    assert before["seg_idx"].isna().all()
    # after: seg_idx equals the latest segment whose ts_end <= turn ts
    after = conv[conv.ts >= first_end]
    assert after["seg_idx"].notna().all()
    for _, row in after.iterrows():
        avail = cseg[cseg.ts_end <= row["ts"]]
        assert int(row["seg_idx"]) == int(avail["seg_idx"].iloc[-1])
