"""Distributed temporal stages vs the single-process pandas oracle
(numpy.allclose gate; SURVEY.md §5a). Covers turn stats, sessionization,
lag/lead, sliding-window SSD features, the salted-chunk skew path, and both
as-of join execution strategies."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from rp_extract_ray.pipelines import oracle as O
from rp_extract_ray.stages.asof import asof_join
from rp_extract_ray.stages.lag import add_lag_features
from rp_extract_ray.stages.partition import SaltSpec
from rp_extract_ray.stages.session import sessionize
from rp_extract_ray.stages.turns import add_turn_stats
from rp_extract_ray.stages.window import add_window_features

K = 8
ORDER = ("ts", "turn_idx")


def _sorted(pdf):
    return pdf.sort_values(["conv_id", "turn_idx"], ignore_index=True)


@pytest.fixture(scope="module")
def engine_result(corpus):
    t, _ = corpus
    ds = add_turn_stats(rd.from_arrow(t))
    ds = sessionize(ds, order_cols=ORDER, num_partitions=8)
    ds = add_lag_features(
        ds, ["text_len"], lags=(1, 2), leads=(1,), gap=False,
        order_cols=ORDER, num_partitions=8,
    )
    ds = add_window_features(ds, k=K, order_cols=ORDER, num_partitions=8)
    return _sorted(ds.to_pandas())


@pytest.fixture(scope="module")
def oracle_result(corpus, enriched_oracle):
    exp = O.oracle_lags(enriched_oracle, ["text_len"], lags=(1, 2), leads=(1,))
    exp = O.oracle_window_features(exp, k=K)
    return _sorted(exp)


def test_row_count_and_text_roundtrip(engine_result, oracle_result):
    assert len(engine_result) == len(oracle_result)
    # byte-equal text round-trip under stable (conv_id, turn_idx) order
    assert (
        engine_result["text"].fillna("").to_numpy()
        == oracle_result["text"].fillna("").to_numpy()
    ).all()
    assert (engine_result["ts"].to_numpy() == oracle_result["ts"].to_numpy()).all()


def test_numeric_columns_allclose(engine_result, oracle_result):
    skip = {"conv_id", "role", "text", "tool", "ts"}
    checked = 0
    for c in oracle_result.columns:
        if c in skip:
            continue
        a = engine_result[c].to_numpy(dtype=np.float64)
        b = oracle_result[c].to_numpy(dtype=np.float64)
        assert np.allclose(a, b, equal_nan=True), c
        checked += 1
    assert checked > 30  # 3 series x (7 stats + 2 pctl) + lags + session etc.


def test_salted_windows_match_unsalted(corpus, oracle_result):
    t, _ = corpus
    ds = add_turn_stats(rd.from_arrow(t))
    ds = add_window_features(
        ds, k=K, num_partitions=8, salt=SaltSpec(chunk_turns=32, overlap=K)
    )
    got = _sorted(ds.to_pandas())
    assert len(got) == len(oracle_result)
    for c in oracle_result.columns:
        if "_w" not in c:
            continue
        a = got[c].to_numpy(dtype=np.float64)
        b = oracle_result[c].to_numpy(dtype=np.float64)
        assert np.allclose(a, b, equal_nan=True), c


def test_salted_leads_match_unsalted(corpus, oracle_result):
    """Leads under salted chunking need forward ghosts: every chunk-tail row
    must see the next chunk's head rows or lead columns are silently NaN."""
    t, _ = corpus
    ds = add_turn_stats(rd.from_arrow(t))
    ds = add_lag_features(
        ds, ["text_len"], lags=(1, 2), leads=(1,), gap=False, order_cols=ORDER,
        num_partitions=8,
        salt=SaltSpec(chunk_turns=32, overlap=2, lead_overlap=1),
    )
    got = _sorted(ds.to_pandas())
    assert len(got) == len(oracle_result)
    for c in ("text_len_lag1", "text_len_lag2", "text_len_lead1"):
        assert np.allclose(
            got[c].to_numpy(dtype=np.float64),
            oracle_result[c].to_numpy(dtype=np.float64),
            equal_nan=True,
        ), c


def test_salted_lead_guard(corpus):
    t, _ = corpus
    with pytest.raises(ValueError, match="lead_overlap"):
        add_lag_features(
            add_turn_stats(rd.from_arrow(t)), ["text_len"], leads=(1,),
            salt=SaltSpec(chunk_turns=32, overlap=4),
        )


def test_salt_overlap_guard(corpus):
    t, _ = corpus
    with pytest.raises(ValueError, match="overlap"):
        add_window_features(
            rd.from_arrow(t), k=8, salt=SaltSpec(chunk_turns=32, overlap=4)
        )


@pytest.mark.parametrize("direction", ["backward", "forward", "nearest"])
@pytest.mark.parametrize("broadcast", [False, True])
def test_asof_join(corpus, direction, broadcast):
    t, ev = corpus
    j = asof_join(
        rd.from_arrow(t),
        rd.from_arrow(ev),
        right_value_cols=["value"],
        direction=direction,
        num_partitions=8,
        broadcast=broadcast,
    )
    got = _sorted(j.to_pandas())
    exp = _sorted(
        O.oracle_asof(
            t.to_pandas(), ev.to_pandas(), value_cols=["value"], direction=direction
        )
    )
    assert len(got) == len(exp)
    assert np.allclose(
        got["value"].to_numpy(dtype=np.float64),
        exp["value"].to_numpy(dtype=np.float64),
        equal_nan=True,
    )


def test_asof_tolerance(corpus):
    t, ev = corpus
    j = asof_join(
        rd.from_arrow(t),
        rd.from_arrow(ev),
        right_value_cols=["value"],
        tolerance_s=3600.0,
        num_partitions=8,
    )
    got = _sorted(j.to_pandas())
    exp = _sorted(
        O.oracle_asof(t.to_pandas(), ev.to_pandas(), value_cols=["value"], tolerance_s=3600.0)
    )
    assert np.allclose(
        got["value"].to_numpy(dtype=np.float64),
        exp["value"].to_numpy(dtype=np.float64),
        equal_nan=True,
    )


def test_single_turn_and_empty_text_convs(engine_result):
    """F4 edge cases: single-turn convs yield valid (zero-ish) window stats."""
    sizes = engine_result.groupby("conv_id").size()
    singles = sizes[sizes == 1].index
    assert len(singles) > 0
    rows = engine_result[engine_result.conv_id.isin(singles)]
    assert np.allclose(rows["gap_s"], 0.0)
    assert np.allclose(rows["text_len_wvar"], 0.0)
    assert np.allclose(rows["text_len_wmean"], rows["text_len"])


def test_salted_sessionize_matches_unsalted(corpus, enriched_oracle):
    from rp_extract_ray.stages.session import sessionize_salted

    t, _ = corpus
    got = (
        sessionize_salted(
            rd.from_arrow(t), num_partitions=8, chunk_turns=32
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    exp = _sorted(enriched_oracle)
    assert len(got) == len(exp)
    assert (got["session_id"].to_numpy() == exp["session_id"].to_numpy()).all()
    assert np.allclose(got["gap_s"].to_numpy(), exp["gap_s"].to_numpy())


def test_salted_sessionize_copartitioned_offsets(corpus, enriched_oracle):
    """Co-partitioned offset delivery (zero driver materialization) ==
    broadcast delivery == unsalted sessionize."""
    from rp_extract_ray.stages.session import sessionize_salted

    t, _ = corpus
    got = (
        sessionize_salted(
            rd.from_arrow(t), num_partitions=8, chunk_turns=32,
            offsets="copartition",
        )
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"], ignore_index=True)
    )
    exp = _sorted(enriched_oracle)
    assert len(got) == len(exp)
    assert (got["session_id"].to_numpy() == exp["session_id"].to_numpy()).all()
    assert np.allclose(got["gap_s"].to_numpy(), exp["gap_s"].to_numpy())


def test_asof_value_collision_branches(corpus):
    """Co-partitioned as-of: colliding right value columns raise without
    left_schema (no-probe path can't rename safely) and rename to _r with
    an explicit left_schema."""
    import pyarrow as pa

    t, ev = corpus
    # left already carries a 'value' column (events' value col name)
    left = rd.from_arrow(t.append_column("value", pa.array([1.0] * len(t))))
    with pytest.raises(Exception, match="collide|left_schema"):
        asof_join(
            left, rd.from_arrow(ev), right_value_cols=["value"],
            num_partitions=4,
        ).to_pandas()
    schema = t.schema.append(pa.field("value", pa.float64()))
    out = asof_join(
        left, rd.from_arrow(ev), right_value_cols=["value"],
        num_partitions=4, left_schema=schema,
    ).to_pandas()
    assert "value_r" in out.columns and "value" in out.columns


def test_stages_on_empty_input():
    """Every core stage handles a 0-row dataset without error."""
    import pandas as pd
    import pyarrow as pa

    from rp_extract_ray.stages.lag import add_lag_features
    from rp_extract_ray.stages.timegrid import time_window_aggregate

    empty = pa.table(
        {
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "ts": pa.array([], pa.timestamp("us")),
        }
    )
    ds = add_turn_stats(rd.from_arrow(empty))
    assert sessionize(ds, order_cols=ORDER, num_partitions=4).count() == 0
    assert add_window_features(ds, k=4, order_cols=ORDER, num_partitions=4).count() == 0
    assert add_lag_features(
        ds, ["text_len"], order_cols=ORDER, num_partitions=4
    ).count() == 0
    assert time_window_aggregate(
        ds, entity_col="conv_id", ts_col="ts", value_col="text_len",
        order_cols=ORDER, num_partitions=4,
    ).count() == 0
    from rp_extract_ray.stages.dedup import minhash_lsh_pairs

    docs = rd.from_pandas(pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                        "text": pd.Series([], dtype="object")}))
    assert minhash_lsh_pairs(docs, jaccard_threshold=0.5).count() == 0


def test_asof_right_only_partition_typed_empty(corpus):
    """A partition holding only right rows must emit a typed empty block in
    the OUTPUT schema when left_schema is declared — schema-sensitive
    consumers (write_parquet, Dataset.schema) must not see a right-shaped
    block. Left side restricted to one conversation so most partitions are
    right-only."""
    import pyarrow as pa
    import pyarrow.compute as pc

    t, ev = corpus
    one_conv = t.column("conv_id")[0].as_py()
    left_tab = t.filter(pc.equal(t.column("conv_id"), one_conv))
    out = asof_join(
        rd.from_arrow(left_tab), rd.from_arrow(ev), right_value_cols=["value"],
        num_partitions=8, left_schema=left_tab.schema,
    )
    schema = out.schema()
    assert schema.names == list(left_tab.schema.names) + ["value"]
    pdf = out.to_pandas()
    assert len(pdf) == len(left_tab)
    assert set(pdf.columns) == set(left_tab.schema.names) | {"value"}
