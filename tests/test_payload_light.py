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
