"""Deduplication suite: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Training-data-pipeline extensions (round-1 brief). Scale shapes:

* exact     — content-hash column in a vectorized ``map_batches``, then
              ``groupby(hash)`` keep-first (one shuffle keyed by the hash).
* minhash   — per-doc signatures in an actor pool (permutation coefficients
              built once per actor), explode to (band, band_hash) rows,
              ``groupby`` the band buckets, emit candidate pairs, verify with
              exact shingle Jaccard. Sketches are mergeable; the shuffle
              carries only (band_hash, doc_id) pairs, never the text.
* simhash   — 64-bit signature + banded buckets on 16-bit sub-keys, verify by
              Hamming distance.
* embedding — cosine near-dup via normalized vectors bucketed by random
              hyperplane signs (LSH); exact verify within buckets.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min

from rp_extract_ray.functions.hashing import MinHasher, char_shingles, jaccard
from rp_extract_ray.stages.partition import run_bounds, stable_hash


def exact_dedup(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Keep the first (min id) row per identical content. Returns
    (id, content_hash, n_dups). SURVEY.md §2.8 / A6 generalized to drop."""

    def add_hash(b: pa.Table) -> pa.Table:
        h = stable_hash(b.column(text_col).to_numpy(zero_copy_only=False))
        return b.append_column("content_hash", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name=id_col), Count(alias_name="n_dups")
    )


def _bucket_pairs_partitioned(
    exploded: Dataset, bucket_col: str, id_col: str, star_threshold: int = 64
) -> Dataset:
    """(id_a, id_b) for every pair sharing a bucket value.

    One entity-partitioned sorted pass; within a partition, bucket runs with
    more than one member are rare, so the Python loop touches only those.
    Dense buckets (heavily duplicated corpora) would explode O(m^2): above
    ``star_threshold`` members the bucket emits STAR pairs (min-id, other)
    instead — a spanning structure, so connected components downstream are
    identical while the pair count stays O(m).
    """
    from rp_extract_ray.stages.partition import partitioned_apply

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        run_starts, run_ends = run_bounds(starts, len(pdf))
        sizes = run_ends - run_starts
        out_a, out_b = [], []
        for s, e in zip(run_starts[sizes > 1], run_ends[sizes > 1]):
            members = np.unique(ids[s:e])
            if len(members) < 2:
                continue
            if len(members) > star_threshold:
                out_a.append(np.full(len(members) - 1, members[0]))
                out_b.append(members[1:])
            else:
                ia, ib = np.triu_indices(len(members), k=1)
                out_a.append(members[ia])
                out_b.append(members[ib])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)})

    return partitioned_apply(
        exploded, fn, entity_col=bucket_col, order_cols=(id_col,), num_partitions=64
    )


def _dedup_pairs(pairs: Dataset) -> Dataset:
    """(id_a, id_b, n_bands): collapse duplicate pairs across bands.

    Ray's multi-key groupby costs ~30x a single-int exchange here, so the
    pair is packed into one int64 key (requires ids < 2^31, true for doc
    ids) and deduplicated with the engine's own partitioned pass."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["pair_key"] = (pdf["id_a"].to_numpy(np.int64) << np.int64(31)) | pdf[
            "id_b"
        ].to_numpy(np.int64)
        return pdf

    packed = pairs.map_batches(pack, batch_format="pandas")

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        run_starts, run_ends = run_bounds(starts, len(pdf))
        return pd.DataFrame(
            {
                "id_a": pdf["id_a"].to_numpy()[run_starts],
                "id_b": pdf["id_b"].to_numpy()[run_starts],
                "n_bands": (run_ends - run_starts).astype(np.int64),
            }
        )

    from rp_extract_ray.stages.partition import partitioned_apply

    return partitioned_apply(
        packed, fn, entity_col="pair_key", order_cols=("id_a",), num_partitions=64
    )


def minhash_lsh_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.6,
    verify: bool = True,
    concurrency=(1, 8),
) -> Dataset:
    """Near-duplicate candidate pairs via MinHash + banded LSH.

    rows (id_a, id_b, est_jaccard[, jaccard]) with id_a < id_b, deduplicated
    across bands. ``bands`` bands of ``num_perm/bands`` rows each: the usual
    S-curve threshold is (1/bands)^(bands/num_perm) ~ 0.5-0.7 for 16x4.
    """
    rows_per_band = num_perm // bands

    class Signatures:
        def __init__(self):
            self.mh = MinHasher(num_perm=num_perm, shingle_k=shingle_k)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sigs = self.mh.signatures_batch(batch[text_col].fillna(""))  # (n, num_perm)
            bh = np.empty((len(batch), bands), dtype=np.int64)
            for b in range(bands):
                seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
                h = pd.util.hash_pandas_object(
                    pd.DataFrame(seg.astype(np.int64)), index=False
                ).to_numpy()
                # mix the band index in so one flat bucket key is exact
                mix = np.uint64(b + 1) * np.uint64(0x9E3779B97F4A7C15)
                bh[:, b] = (h ^ mix).astype(np.int64)
            return pd.DataFrame(
                {
                    id_col: np.repeat(batch[id_col].to_numpy(), bands),
                    "band_hash": bh.reshape(-1),
                }
            )

    exploded = ds.map_batches(
        Signatures, batch_format="pandas", batch_size=512, concurrency=concurrency
    )

    # pair generation: one partitioned pass over bucket RUNS, not one
    # map_groups call per bucket (most buckets are singletons; a per-bucket
    # Python call costs more than the whole batch of vectorized work)
    pairs = _bucket_pairs_partitioned(exploded, "band_hash", id_col)
    uniq = _dedup_pairs(pairs)
    if not verify:
        return uniq

    # verify candidates with exact shingle Jaccard. Only the candidate docs'
    # texts are pulled: a broadcast key-set semi-join prunes the corpus
    # distributed-side before the (small) candidate set reaches the driver.
    from rp_extract_ray.stages.join import semi_anti_join

    cand_pdf = uniq.to_pandas()
    needed = set(int(x) for x in cand_pdf["id_a"]) | set(int(x) for x in cand_pdf["id_b"])
    texts = semi_anti_join(
        ds.map_batches(lambda b: b.select([id_col, text_col]), batch_format="pyarrow"),
        needed,
        on=id_col,
    ).to_pandas()
    sh = {
        int(i): char_shingles(t or "", shingle_k)
        for i, t in zip(texts[id_col], texts[text_col])
    }
    jac = np.array(
        [
            jaccard(sh.get(int(a), np.empty(0, np.uint64)), sh.get(int(b), np.empty(0, np.uint64)))
            for a, b in zip(cand_pdf["id_a"], cand_pdf["id_b"])
        ]
    )
    cand_pdf["jaccard"] = np.round(jac, 6)
    out = cand_pdf[cand_pdf["jaccard"] >= jaccard_threshold].reset_index(drop=True)
    import ray.data as rd

    return rd.from_pandas(out)


def dedup_clusters(
    pairs: Dataset | pd.DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 20,
) -> pd.DataFrame:
    """Connected components over near-dup candidate pairs -> (id, cluster_id)
    with cluster_id = min id of the component.

    Distributed min-label propagation (the Ray-guide pattern): each round,
    every edge proposes min(label_a, label_b) to both endpoints; a
    ``groupby(id).min`` adopts the smallest. Terminates when labels stop
    changing — O(diameter) rounds; near-dup components are tiny, so this
    converges in 2-4 rounds. The candidate-pair table is the small product of
    LSH bucketing, so each round's shuffle is negligible next to the corpus.
    """
    pdf = pairs.to_pandas() if isinstance(pairs, Dataset) else pairs.copy()
    if len(pdf) == 0:
        return pd.DataFrame({"id": pd.Series([], dtype=np.int64),
                             "cluster_id": pd.Series([], dtype=np.int64)})
    edges = pdf[[id_a, id_b]].to_numpy()
    ids = np.unique(edges)
    label = pd.Series(ids, index=ids)
    for _ in range(max_rounds):
        la = label.loc[edges[:, 0]].to_numpy()
        lb = label.loc[edges[:, 1]].to_numpy()
        prop = np.minimum(la, lb)
        proposals = pd.DataFrame(
            {"id": np.concatenate([edges[:, 0], edges[:, 1], ids]),
             "lab": np.concatenate([prop, prop, label.to_numpy()])}
        )
        new = proposals.groupby("id")["lab"].min()
        if (new.to_numpy() == label.loc[new.index].to_numpy()).all():
            break
        label = new
    return pd.DataFrame({"id": label.index.to_numpy(), "cluster_id": label.to_numpy()})


def drop_near_dups(
    ds: Dataset,
    clusters: pd.DataFrame,
    *,
    id_col: str = "doc_id",
) -> Dataset:
    """Keep one representative per near-dup cluster (the min id) plus all
    unclustered rows — broadcast anti-join of the non-representative set."""
    losers = set(
        int(i) for i, c in zip(clusters["id"], clusters["cluster_id"]) if i != c
    )
    from rp_extract_ray.stages.join import semi_anti_join

    if not losers:
        return ds
    return semi_anti_join(ds, losers, on=id_col, anti=True)


def simhash_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    concurrency=(1, 8),
) -> Dataset:
    """Near-dup pairs by SimHash banding (4 x 16-bit bands: any pair within
    Hamming distance 3 shares at least one exact band) + Hamming verify."""
    from rp_extract_ray.functions.hashing import hash64, simhash64
    import re

    class Sigs:
        def __init__(self):
            self.tok = re.compile(r"\w+", re.ASCII)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            sh = np.array(
                [
                    np.uint64(
                        simhash64(hash64(np.array(self.tok.findall((t or "").lower()), dtype=object)))
                    )
                    for t in batch[text_col].fillna("")
                ],
                dtype=np.uint64,
            )
            keys = np.stack(
                [
                    (((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                     ^ (np.uint64(b + 1) * np.uint64(0x9E3779B97F4A7C15))).astype(np.int64)
                    for b in range(4)  # band index mixed in: flat exact key
                ],
                axis=1,
            ).reshape(-1)
            rows = {
                id_col: np.repeat(batch[id_col].to_numpy(), 4),
                "band_key": keys,
                "simhash": np.repeat(sh.astype(np.int64), 4),
            }
            return pd.DataFrame(rows)

    exploded = ds.map_batches(
        Sigs, batch_format="pandas", batch_size=512, concurrency=concurrency
    )

    from rp_extract_ray.stages.partition import partitioned_apply

    def pairs_fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        sigs = pdf["simhash"].to_numpy().astype(np.uint64)
        run_starts, run_ends = run_bounds(starts, len(pdf))
        sizes = run_ends - run_starts
        rows_a, rows_b, rows_h = [], [], []
        for s, e in zip(run_starts[sizes > 1], run_ends[sizes > 1]):
            order = np.argsort(ids[s:e]) + s
            mid, msig = ids[order], sigs[order]
            ia, ib = np.triu_indices(len(mid), k=1)
            ham = np.array(
                [bin(int(msig[a] ^ msig[b])).count("1") for a, b in zip(ia, ib)],
                dtype=np.int32,
            )
            keep = (ham <= max_hamming) & (mid[ia] != mid[ib])
            rows_a.append(mid[ia][keep])
            rows_b.append(mid[ib][keep])
            rows_h.append(ham[keep])
        if not rows_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "hamming": pd.Series([], dtype=np.int32)})
        return pd.DataFrame(
            {"id_a": np.concatenate(rows_a), "id_b": np.concatenate(rows_b),
             "hamming": np.concatenate(rows_h)}
        )

    pairs = partitioned_apply(
        exploded, pairs_fn, entity_col="band_key", order_cols=(id_col,),
        num_partitions=64,
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["pair_key"] = (pdf["id_a"].to_numpy(np.int64) << np.int64(31)) | pdf[
            "id_b"
        ].to_numpy(np.int64)
        return pdf

    def first_fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        run_starts, run_ends = run_bounds(starts, len(pdf))
        ham = pdf["hamming"].to_numpy()
        best = np.array(
            [ham[s:e].min() for s, e in zip(run_starts, run_ends)], dtype=np.int32
        )
        return pd.DataFrame(
            {
                "id_a": pdf["id_a"].to_numpy()[run_starts],
                "id_b": pdf["id_b"].to_numpy()[run_starts],
                "hamming": best,
            }
        )

    return partitioned_apply(
        pairs.map_batches(pack, batch_format="pandas"),
        first_fn, entity_col="pair_key", order_cols=("id_a",), num_partitions=64,
    )


def embedding_near_dup(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    cos_threshold: float = 0.9,
    n_planes: int = 8,
    seed: int = 5,
    exhaustive: bool = False,
) -> Dataset:
    """Cosine near-dup pairs over an embedding column.

    Scale path: LSH-bucket by the sign pattern of ``n_planes`` random
    hyperplanes, exact-verify within buckets (recall < 1 by design — near-dups
    at cos >= threshold almost always share the full sign pattern for high
    thresholds). ``exhaustive=True`` verifies ALL pairs inside one partition
    per bucket-free group — only for small corpora / tests.
    """
    def add_bucket(b: pa.Table) -> pa.Table:
        vecs = np.stack(b.column(vec_col).to_pylist()).astype(np.float64)
        # same seed in every task -> identical hyperplanes everywhere
        planes = np.random.default_rng(seed).normal(size=(vecs.shape[1], n_planes))
        signs = (vecs @ planes) > 0
        bucket = np.zeros(len(vecs), dtype=np.int64)
        if not exhaustive:
            for j in range(n_planes):
                bucket |= signs[:, j].astype(np.int64) << j
        norm = np.linalg.norm(vecs, axis=1)
        norm[norm == 0] = 1.0
        unit = vecs / norm[:, None]
        return pa.table(
            {
                id_col: b.column(id_col),
                "bucket": pa.array(bucket),
                "unit": pa.array(list(unit.astype(np.float32))),
            }
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col)
        ids = g[id_col].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64),
                                 "cos": pd.Series([], dtype=np.float64)})
        U = np.stack(g["unit"].to_numpy()).astype(np.float64)
        sim = U @ U.T
        ia, ib = np.triu_indices(len(ids), k=1)
        cos = sim[ia, ib]
        keep = cos >= cos_threshold
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]], "cos": np.round(cos[keep], 6)}
        )

    return bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pandas")
