"""Payload-light backfill must produce the same rows/features as the
payload-through pipeline, with byte-equal text."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from rp_extract_ray.pipelines.flagship import (
    feature_backfill,
    feature_backfill_payload_light,
)
from rp_extract_ray.synth import write_corpus


@pytest.fixture(scope="module")
def sharded_corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plcorpus"))
    paths = write_corpus(out, n_convs=50, seed=21, mean_turns=15, shards=4)
    shard_files = sorted(
        os.path.join(paths["transcripts"], f) for f in os.listdir(paths["transcripts"])
    )
    return paths, shard_files


def test_matches_payload_through(sharded_corpus):
    paths, shard_files = sharded_corpus
    events = rd.read_parquet(paths["conv_events"])
    through = feature_backfill(
        rd.read_parquet(shard_files), rd.read_parquet(paths["conv_events"]),
        k=8, num_partitions=8,
    ).to_pandas()
    light = feature_backfill_payload_light(
        shard_files, events, k=8, num_partitions=8
    ).to_pandas()

    key = ["conv_id", "turn_idx"]
    through = through.sort_values(key, ignore_index=True)
    light = light.sort_values(key, ignore_index=True)
    assert len(light) == len(through)
    assert (light["text"].fillna("") == through["text"].fillna("")).all()
    for c in through.columns:
        if through[c].dtype.kind not in "ifc" or c == "turn_idx":
            continue
        a = light[c].to_numpy(dtype=np.float64)
        b = through[c].to_numpy(dtype=np.float64)
        assert np.allclose(a, b, equal_nan=True), c


def test_sink_dir_writes_shard_aligned(sharded_corpus, tmp_path_factory):
    """sink_dir mode: one _pos-sorted file per input shard, content equal to
    the returned-Dataset path; skip_shards drops finished shards' writes
    while recomputing features (conversations span shards)."""
    import pandas as pd

    paths, shard_files = sharded_corpus
    out1 = str(tmp_path_factory.mktemp("sink1"))
    rep = feature_backfill_payload_light(
        shard_files, rd.read_parquet(paths["conv_events"]),
        k=8, num_partitions=8, sink_dir=out1,
    ).to_pandas()
    assert sorted(rep["shard"]) == list(range(len(shard_files)))
    files = sorted(f for f in os.listdir(out1) if f.endswith(".parquet"))
    assert len(files) == len(shard_files)
    assert all(os.path.exists(os.path.join(out1, f + ".done")) for f in files)

    ref = feature_backfill_payload_light(
        shard_files, rd.read_parquet(paths["conv_events"]),
        k=8, num_partitions=8,
    ).to_pandas()
    got = pd.concat(
        [pq.read_table(os.path.join(out1, f)).to_pandas() for f in files],
        ignore_index=True,
    )
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        ref.sort_values(key, ignore_index=True)[sorted(ref.columns)],
        got.sort_values(key, ignore_index=True)[sorted(got.columns)],
        check_exact=True,
    )

    # resume: skip shards 0 and 2 — only 1 and 3 get (re)written, and their
    # bytes are identical to the full run's
    out2 = str(tmp_path_factory.mktemp("sink2"))
    rep2 = feature_backfill_payload_light(
        shard_files, rd.read_parquet(paths["conv_events"]),
        k=8, num_partitions=8, sink_dir=out2, skip_shards={0, 2},
    ).to_pandas()
    assert sorted(rep2["shard"]) == [1, 3]
    import hashlib

    for f in sorted(os.listdir(out2)):
        if f.endswith(".parquet"):
            h1 = hashlib.sha256(open(os.path.join(out1, f), "rb").read()).hexdigest()
            h2 = hashlib.sha256(open(os.path.join(out2, f), "rb").read()).hexdigest()
            assert h1 == h2, f


def test_skip_shards_requires_single_rejoin_group(sharded_corpus):
    """skip_shards granularity is the whole shard: with G>1 sub-group files
    a partial shard would silently lose sub-groups, so the combination
    raises (ADVICE r4)."""
    import pytest

    from rp_extract_ray.pipelines.flagship import feature_backfill_payload_light

    paths, shard_files = sharded_corpus
    with pytest.raises(ValueError, match="rejoin_groups_per_shard=1"):
        feature_backfill_payload_light(
            shard_files, None, k=8, num_partitions=8,
            sink_dir="/tmp/never_written", skip_shards={0},
            rejoin_groups_per_shard=2,
        )
