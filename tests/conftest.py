import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def corpus():
    """Small deterministic transcript corpus + conv_events (FIXTURES.md F1/F2)."""
    from rp_extract_ray.synth import generate_conv_events, generate_transcripts

    t = generate_transcripts(n_convs=40, seed=3, mean_turns=12)
    ev = generate_conv_events(t, seed=9)
    return t, ev


@pytest.fixture(scope="session")
def enriched_oracle(corpus):
    from rp_extract_ray.pipelines import oracle as O

    t, _ = corpus
    return O.oracle_enrich(t.to_pandas())
