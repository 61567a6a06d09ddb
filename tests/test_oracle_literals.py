"""The literal-oracle generators (pipelines/oracle_literals.py) are
independent reimplementations of the engine's hash specs; these tests pin
them against the engine kernels so a spec change on either side fails fast
in pytest instead of at the driver's correctness gate."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def texts():
    rng = np.random.default_rng(42)
    words = ["the", "quick", "fox", "data", "ray", "engine", "ión", "的", "über"]
    out = []
    for _ in range(40):
        n = rng.integers(0, 60)
        out.append(" ".join(words[rng.integers(len(words))] for _ in range(n)))
    out += ["", "a", "ab" * 100]
    return out


def test_simhash_longhand_matches_engine(texts):
    import re

    from rp_extract_ray.functions.hashing import simhash64_batch, tokens_hash_batch
    from rp_extract_ray.pipelines.oracle_literals import _simhash64_longhand

    tok = re.compile(r"\w+", re.ASCII)
    toks = [np.array(tok.findall(t.lower()), dtype=object) for t in texts]
    flat, counts = tokens_hash_batch(toks)
    engine = simhash64_batch(flat, counts)
    for t, e in zip(texts, engine):
        assert _simhash64_longhand(t) == int(e), repr(t[:40])


def test_shingle_longhand_matches_engine(texts):
    from rp_extract_ray.functions.hashing import char_shingles
    from rp_extract_ray.pipelines.oracle_literals import _shingle_hashes_longhand

    for t in texts:
        for k in (5, 16):
            a = char_shingles(t, k)
            b = _shingle_hashes_longhand(t, k)
            assert len(a) == len(b), (repr(t[:40]), k)
            assert (a == b).all(), (repr(t[:40]), k)


def test_hll_longhand_matches_engine():
    from rp_extract_ray.functions.sketch import hll_accumulate, hll_estimate
    from rp_extract_ray.pipelines.oracle_literals import _hll_estimate_longhand

    rng = np.random.default_rng(7)
    keys = rng.integers(0, 100_000, size=20_000, dtype=np.int64)
    engine = int(round(hll_estimate(hll_accumulate(keys, p=12))))
    assert _hll_estimate_longhand(keys, p=12) == engine
    # and the estimate is actually close to the truth
    truth = len(np.unique(keys))
    assert abs(engine - truth) / truth < 0.05
