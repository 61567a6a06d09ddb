"""Document + embedding queries for the driver contract: text analysis,
dedup, and similarity search over the testdata ``documents`` / ``embeddings``
tables."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Count, Mean

from rp_extract_ray.stages.dedup import (
    embedding_near_dup,
    minhash_lsh_pairs,
    simhash_pairs,
)
from rp_extract_ray.stages.simsearch import knn_cosine
from rp_extract_ray.stages.textstage import (
    add_fingerprints,
    add_langid,
    add_quality_scores,
    add_token_counts,
)


def _docs(sf_dir: str, columns=None) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir: str) -> Dataset:
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def q_token_count(sf_dir: str) -> Dataset:
    ds = add_token_counts(_docs(sf_dir, ["doc_id", "text"]))
    return ds.select_columns(["doc_id", "n_tokens", "n_ws_tokens"])


def q_text_quality(sf_dir: str) -> Dataset:
    ds = add_quality_scores(_docs(sf_dir, ["doc_id", "text"]))
    return ds.select_columns(["doc_id", "alpha_ratio", "digit_ratio", "space_ratio"])


def q_langid(sf_dir: str) -> Dataset:
    """Rows-only (heuristic n-gram classifier has no SQL equivalent)."""
    ds = add_langid(_docs(sf_dir, ["doc_id", "text", "lang"]))
    return ds.select_columns(["doc_id", "lang", "lang_pred", "lang_conf"])


def q_fingerprint(sf_dir: str) -> Dataset:
    """Rows-only: winnowing fingerprint + simhash per document."""
    ds = add_fingerprints(_docs(sf_dir, ["doc_id", "text"]))
    return ds.select_columns(["doc_id", "simhash"])


def q_minhash_pairs(sf_dir: str) -> Dataset:
    """Rows-only: near-dup candidate pairs (verified Jaccard >= 0.5)."""
    return minhash_lsh_pairs(
        _docs(sf_dir, ["doc_id", "text"]), jaccard_threshold=0.5
    )


def q_simhash_pairs(sf_dir: str) -> Dataset:
    """Rows-only: SimHash near-dup pairs (Hamming <= 3)."""
    return simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3)


def q_embedding_near_dup(sf_dir: str) -> Dataset:
    """Rows-only: high-cosine pairs via hyperplane-LSH buckets (threshold
    0.25 fits the synthetic embeddings' similarity range so the result is
    non-empty; production near-dup would use ~0.95)."""
    return embedding_near_dup(_emb(sf_dir), cos_threshold=0.25, n_planes=4)


def q_knn(sf_dir: str, query_id: int = 0, k: int = 10):
    """Top-k cosine neighbors of embedding ``query_id`` (DuckDB oracle:
    list_cosine_similarity). Deterministic ties by vec_id."""
    ds = _emb(sf_dir)
    q = (
        ds.map_batches(
            lambda b: b.filter(pa.compute.equal(b.column("vec_id"), query_id)),
            batch_format="pyarrow",
        )
        .to_pandas()["embedding"]
    )
    qv = np.asarray(list(q)[0], dtype=np.float64)
    res = knn_cosine(ds, qv[None, :], k=k)
    out = res[["vec_id", "cos"]].copy()
    from rp_extract_ray.functions.rounding import round_half_away
    out["cos"] = round_half_away(out["cos"].to_numpy(), 4)
    return out


def q_embedding_label_stats(sf_dir: str) -> Dataset:
    """Per-label count + mean vector norm (SQL: list_transform/list_sum)."""

    def add_norm(b: pa.Table) -> pa.Table:
        vecs = np.stack(b.column("embedding").to_pylist()).astype(np.float64)
        nrm = np.sqrt((vecs * vecs).sum(axis=1))
        return pa.table({"label": b.column("label"), "norm": pa.array(nrm)})

    ds = _emb(sf_dir).map_batches(add_norm, batch_format="pyarrow")
    out = ds.groupby("label").aggregate(
        Count(alias_name="n"), Mean("norm", alias_name="mean_norm")
    )

    def rnd(b: pa.Table) -> pa.Table:
        i = b.column_names.index("mean_norm")
        from rp_extract_ray.functions.rounding import round_half_away
        v = round_half_away(b.column("mean_norm").to_numpy(zero_copy_only=False), 4)
        b = b.set_column(i, "mean_norm", pa.array(v))
        j = b.column_names.index("label")
        return b.set_column(j, "label", b.column("label").cast(pa.int64()))

    return out.map_batches(rnd, batch_format="pyarrow")
