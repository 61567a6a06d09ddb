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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from rp_extract_ray.functions.hashing import MinHasher, char_shingles, jaccard
from rp_extract_ray.stages.partition import (
    arrow_clean,
    run_bounds,
    stable_hash,
    strip_meta,
)


def _pair_ids_table(b: pa.Table, col: str, unique: bool = False) -> pa.Table:
    """Flatten a candidate-pair block's (id_a ∪ id_b) to one int64 column —
    the shared kernel of the HLL gate, the broadcast wanted-set collapse,
    and the distributed semi-join feed below."""
    ids = pa.concat_arrays(
        [
            b.column("id_a").cast(pa.int64()).combine_chunks(),
            b.column("id_b").cast(pa.int64()).combine_chunks(),
        ]
    )
    if unique:
        ids = pc.unique(ids)
    return pa.table({col: ids})

_MH_CACHE: dict = {}


def _exchange_partitions() -> int:
    """Partition count for the dedup exchanges: scales with the cluster
    (2x CPUs, floor 64) so a 256-node deployment doesn't funnel its bucket
    shuffle through 64 reducers while a laptop run isn't over-partitioned."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 32))
    return max(64, 2 * cpus)


def _minhasher_cached(num_perm: int, shingle_k: int) -> MinHasher:
    """One MinHasher per (params, worker process) — ST1/ST2 state for a
    stateless task pool."""
    key = (num_perm, shingle_k)
    if key not in _MH_CACHE:
        _MH_CACHE[key] = MinHasher(num_perm=num_perm, shingle_k=shingle_k)
    return _MH_CACHE[key]


def exact_dedup(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Keep the first (min id) row per identical content. Returns
    (id, content_hash, n_dups). SURVEY.md §2.8 / A6 generalized to drop."""

    def add_hash(b: pa.Table) -> pa.Table:
        h = stable_hash(b.column(text_col).to_numpy(zero_copy_only=False))
        t = b.select([id_col])  # payload pruned BEFORE the exchange
        return t.append_column("content_hash", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    # grouped_reduce, not Ray's sort-based aggregate: the map-side combine +
    # one hash exchange path is measured ~10x faster at interactive scale
    # (see groupops.grouped_reduce docstring; VERDICT r3 item 3)
    from rp_extract_ray.stages.groupops import grouped_reduce

    return grouped_reduce(
        hashed,
        "content_hash",
        {id_col: (id_col, "min"), "n_dups": (id_col, "count")},
    )


def _bucket_pairs_partitioned(
    exploded: Dataset, bucket_col: str, id_col: str,
    star_threshold: int | None = 64,
    drop_above: int | None = None,
) -> Dataset:
    """(id_a, id_b) for every pair sharing a bucket value.

    One entity-partitioned sorted pass; within a partition, bucket runs with
    more than one member are rare, so the Python loop touches only those.
    Dense buckets (heavily duplicated corpora) would explode O(m^2): above
    ``star_threshold`` members the bucket emits STAR pairs (min-id, other)
    instead — a spanning structure, so connected components downstream are
    identical while the pair count stays O(m). ``star_threshold=None``
    disables the cap (needed when every co-occurrence pair must be counted,
    e.g. exact Jaccard intersection counting).
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
            if drop_above is not None and len(members) > drop_above:
                continue  # stopword-gram guard: skip ultra-common buckets
            if star_threshold is not None and len(members) > star_threshold:
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
        exploded, fn, entity_col=bucket_col, order_cols=(id_col,), num_partitions=_exchange_partitions()
    )


def _dedup_pairs(pairs: Dataset) -> Dataset:
    """(id_a, id_b, n_bands): collapse duplicate pairs across bands.

    Ray's multi-key groupby costs ~30x a single-int exchange here, so the
    pair is packed into one int64 key (requires ids < 2^31, true for doc
    ids) and deduplicated with the engine's own partitioned pass."""

    def pack(b: pa.Table) -> pa.Table:
        key = (
            b.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
            << np.int64(31)
        ) | b.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("pair_key", pa.array(key))

    packed = pairs.map_batches(pack, batch_format="pyarrow")

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
        packed, fn, entity_col="pair_key", order_cols=("id_a",), num_partitions=_exchange_partitions()
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
    est_margin: float | None = 0.3,
) -> Dataset:
    """Near-duplicate candidate pairs via MinHash + banded LSH.

    rows (id_a, id_b, est_jaccard[, jaccard]) with id_a < id_b, deduplicated
    across bands. ``bands`` bands of ``num_perm/bands`` rows each: the usual
    S-curve threshold is (1/bands)^(bands/num_perm) ~ 0.5-0.7 for 16x4.

    ``est_margin``: when verifying, candidate pairs are prefiltered by the
    signature estimate ``est = mean(sig_a == sig_b)`` at
    ``jaccard_threshold - est_margin`` INSIDE the bucket pass — the 512-byte
    signature rides the band exchange, so the estimate costs zero extra
    joins while the exact verify's shingle-set joins shrink from every
    candidate (90k at sf0.1) to the near-threshold survivors (~300).
    False-negative bound: ``num_perm * est`` is Binomial(num_perm, j) for a
    true pair with jaccard j, so with num_perm=64 and margin 0.3 a pair AT
    j=0.5 is dropped with probability P(Binom(64,.5) <= 12.8) ~ 8e-7
    (normal tail at -4.8 sigma); pairs above the threshold are safer still.
    ``est_margin=None`` restores the strict exhaustive verify.
    """
    rows_per_band = num_perm // bands
    carry_sig = verify and est_margin is not None
    est_min = max(0.0, jaccard_threshold - (est_margin or 0.0))

    def signatures(batch: pa.Table) -> pa.Table:
        # stateless TASKS, not an actor pool: the permutation coefficients
        # are built once per WORKER PROCESS (module-level cache) so the
        # stage scales to every free CPU instead of a fixed actor count.
        # DECLARED pyarrow (pandas conversion happens inside, only for the
        # text column the hasher needs): a pandas-declared stage makes the
        # downstream bucket exchange sort pandas blocks (see
        # partition.run_group for the measured rule).
        mh = _minhasher_cached(num_perm, shingle_k)
        texts = batch.column(text_col).to_pandas().fillna("")
        sigs = mh.signatures_batch(texts)  # (n, num_perm)
        bh = np.empty((len(batch), bands), dtype=np.int64)
        for b in range(bands):
            seg = sigs[:, b * rows_per_band : (b + 1) * rows_per_band]
            h = pd.util.hash_pandas_object(
                pd.DataFrame(seg.astype(np.int64)), index=False
            ).to_numpy()
            # mix the band index in so one flat bucket key is exact
            # wraparound intended; scalar uint64 mult warns, so mask in int
            mix = np.uint64(((b + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
            bh[:, b] = (h ^ mix).astype(np.int64)
        cols = {
            id_col: pa.array(
                np.repeat(
                    batch.column(id_col).to_numpy(zero_copy_only=False), bands
                )
            ),
            "band_hash": pa.array(bh.reshape(-1)),
        }
        if carry_sig:
            cols["_sig"] = pa.array(
                [s.tobytes() for s in sigs], pa.binary()
            ).take(pa.array(np.repeat(np.arange(len(sigs)), bands)))
        return pa.table(cols)

    exploded = ds.map_batches(signatures, batch_format="pyarrow", batch_size=512)

    # pair generation: one partitioned pass over bucket RUNS, not one
    # map_groups call per bucket (most buckets are singletons; a per-bucket
    # Python call costs more than the whole batch of vectorized work)
    if carry_sig:
        pairs = _bucket_pairs_with_est(
            exploded, "band_hash", id_col, num_perm=num_perm, est_min=est_min
        )
    else:
        pairs = _bucket_pairs_partitioned(exploded, "band_hash", id_col)
    uniq = _dedup_pairs(pairs)
    if not verify:
        return uniq
    return verify_pairs_jaccard(
        uniq, ds, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
        jaccard_threshold=jaccard_threshold,
    )


def _bucket_pairs_with_est(
    exploded: Dataset,
    bucket_col: str,
    id_col: str,
    *,
    num_perm: int,
    est_min: float,
    star_threshold: int = 64,
) -> Dataset:
    """Bucket co-occurrence pairs WITH the in-bucket signature estimate.

    Like :func:`_bucket_pairs_partitioned`, but each run's member signatures
    are locally available (they rode the band exchange), so the MinHash
    Jaccard estimate is computed inside the pass and sub-``est_min`` pairs
    never enter the pair shuffle at all. Star expansion for dense buckets
    estimates against the hub member only (the spanning property for the
    downstream clustering is preserved; non-hub pair estimates are not
    needed because every emitted pair is exact-verified afterwards)."""
    from rp_extract_ray.stages.partition import partitioned_apply

    def fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        run_starts, run_ends = run_bounds(starts, len(pdf))
        sizes = run_ends - run_starts
        out_a, out_b = [], []
        sig_bytes = pdf["_sig"].to_numpy()
        for s, e in zip(run_starts[sizes > 1], run_ends[sizes > 1]):
            members, first_idx = np.unique(ids[s:e], return_index=True)
            if len(members) < 2:
                continue
            S = np.frombuffer(
                b"".join(sig_bytes[s + i] for i in first_idx), dtype=np.uint64
            ).reshape(len(members), num_perm)
            if len(members) > star_threshold:
                est = (S[:1] == S[1:]).mean(axis=1)
                keep = est >= est_min
                out_a.append(np.full(int(keep.sum()), members[0]))
                out_b.append(members[1:][keep])
            else:
                ia, ib = np.triu_indices(len(members), k=1)
                est = (S[ia] == S[ib]).mean(axis=1)
                keep = est >= est_min
                out_a.append(members[ia[keep]])
                out_b.append(members[ib[keep]])
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return partitioned_apply(
        exploded, fn, entity_col=bucket_col, order_cols=(id_col,), num_partitions=_exchange_partitions()
    )


def _packed_u64_slices(col: pa.ChunkedArray):
    """(flat uint64 ndarray, element offsets) of a binary column whose cells
    are ``np.uint64.tobytes()`` payloads — zero-copy via the Arrow value
    buffer. (Arrow's hash join rejects list<> payload columns, so shingle
    sets travel as packed binary.)"""
    arr = col.combine_chunks()
    byte_off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    flat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[byte_off[0]: byte_off[-1]]
    flat = (
        flat.view(np.uint64)
        if byte_off[0] % 8 == 0
        else np.frombuffer(flat.tobytes(), dtype=np.uint64)
    )
    return flat, (byte_off - byte_off[0]) // 8


def verify_pairs_jaccard(
    uniq: Dataset,
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    jaccard_threshold: float = 0.6,
    num_partitions: int | None = None,
    broadcast_pairs_limit: int = 50_000,
    broadcast_docs_limit: int = 100_000,
) -> Dataset:
    """Exact-shingle-Jaccard verification of candidate pairs — DISTRIBUTED.

    Nothing touches the driver: the raw (id_a ∪ id_b) candidate-id stream
    semi-joins the corpus directly (left_semi keeps a doc once regardless of
    duplicate candidate keys, so no dedup pass is needed), per-doc shingle sets
    are computed once (vectorized byte k-grams, functions/hashing.py), then
    TWO hash joins attach each pair's shingle sets and a ``map_batches``
    computes exact Jaccard per pair (``np.intersect1d`` on sorted-unique
    sets — per-pair work is intrinsic; the loop body is a C kernel). The
    shuffle payload is the candidate pairs' shingle sets, bounded by the LSH
    candidate count (star expansion keeps that O(corpus)), never the corpus.

    The broadcast collapse fires on either gate: pair count ≤
    ``broadcast_pairs_limit``, OR (pairs over the limit but) DISTINCT
    candidate docs ≤ ``broadcast_docs_limit`` by a one-pass HLL estimate —
    dup-heavy corpora produce many pairs over few docs, and the broadcast
    cost is the shingle LUT (per-doc, ~2 KB each; the 100k default is
    ~200 MB, one plasma copy per node), not the pair count. Candidate ids
    for the LUT are collected per-block-distinct, never the raw pair list.
    """
    import ray
    import ray.data as rd

    if num_partitions is None:
        # each Join spawns num_partitions aggregator actors at 0.125 CPU;
        # the final plan holds TWO joins concurrently — size so both fit
        # beside the map tasks even on small sessions, and grow with the
        # cluster (partition count scales with CPUs at real scale)
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 4)

    # the pair table feeds two consumers (candidate-id extraction AND the
    # final joins); without a materialize Ray replays the whole LSH lineage
    # once per consumer. Blocks stay in the object store — NOT the driver —
    # and the table is bounded by the LSH candidate count (star expansion
    # keeps that O(corpus)), so this is scale-safe.
    uniq = uniq.materialize()
    out_schema = pa.schema(
        [
            pa.field("id_a", pa.int64()),
            pa.field("id_b", pa.int64()),
            pa.field("n_bands", pa.int64()),
            pa.field("jaccard", pa.float64()),
        ]
    )
    n_pairs = uniq.count()
    if n_pairs == 0:
        # empty candidate set: skip the joins entirely (acero cannot join
        # a schema-less empty table), return a typed empty result
        return rd.from_arrow(out_schema.empty_table())
    # Ray's hash-shuffle join loses the schema of EMPTY partitions, which
    # breaks the chained PAIR joins when few pairs spread over many
    # partitions — cap THOSE by pair volume (~50k pairs per partition keeps
    # every partition non-empty with huge probability and is plenty of
    # parallelism for the per-pair kernel). The corpus-side semi-join below
    # keeps the full cluster-scaled count: its left side is the WHOLE corpus
    # and must not funnel through a pair-sized partition count.
    pair_partitions = max(1, min(num_partitions, n_pairs // 50_000 + 1))

    use_broadcast = n_pairs <= broadcast_pairs_limit
    if not use_broadcast:
        # many pairs can still mean few DOCS (dup-heavy corpora): one
        # constant-shuffle HLL pass over the flat id stream decides whether
        # the shingle LUT fits a broadcast; 1.25 covers the HLL error band
        from rp_extract_ray.functions.sketch import approx_distinct

        flat = uniq.map_batches(
            lambda b: _pair_ids_table(b, id_col), batch_format="pyarrow"
        )
        use_broadcast = (
            approx_distinct(flat, id_col) * 1.25 <= broadcast_docs_limit
        )

    if use_broadcast:
        # BROADCAST VERIFY: the candidate docs' shingle sets (~kB each) are
        # object-store small. Three Dataset.join ops cost ~2 s fixed EACH
        # at 32 CPUs (same aggregator-actor overhead as the sort-based
        # groupby, measured); this path replaces them with one corpus scan
        # + one pair map. Above both gates the distributed join path below
        # is the scale road (its shuffle is bounded by the candidate count).
        # Wanted ids collapse per-block-distinct first so the driver never
        # holds the raw pair list.
        id_parts = uniq.map_batches(
            lambda b: _pair_ids_table(b, id_col, unique=True),
            batch_format="pyarrow",
        ).to_pandas()
        wanted = np.unique(id_parts[id_col].to_numpy().astype(np.int64))
        want_ref = ray.put(wanted)

        def wanted_shingles(b: pa.Table) -> pa.Table:
            w = ray.get(want_ref)
            ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            m = np.isin(ids, w)
            if not m.any():
                return pa.schema(
                    [pa.field(id_col, pa.int64()), pa.field("_sh", pa.binary())]
                ).empty_table()
            sub = b.filter(pa.array(m))
            texts = sub.column(text_col).to_pylist()
            sets = [char_shingles(t or "", shingle_k).tobytes() for t in texts]
            return pa.table(
                {
                    id_col: sub.column(id_col).cast(pa.int64()),
                    "_sh": pa.array(sets, type=pa.binary()),
                }
            )

        sh_pdf = (
            ds.map_batches(
                lambda b: b.select([id_col, text_col]), batch_format="pyarrow"
            )
            .map_batches(wanted_shingles, batch_format="pyarrow")
            .to_pandas()
        )
        lut_ref = ray.put(
            dict(zip(sh_pdf[id_col].to_numpy(), sh_pdf["_sh"].to_numpy()))
        )

        def verify_broadcast(b: pa.Table) -> pa.Table:
            if len(b) == 0:
                return out_schema.empty_table()
            lut = ray.get(lut_ref)
            ia = b.column("id_a").to_numpy(zero_copy_only=False)
            ib = b.column("id_b").to_numpy(zero_copy_only=False)
            jac = np.empty(len(b), dtype=np.float64)
            for i in range(len(b)):
                sa, sb = lut.get(ia[i]), lut.get(ib[i])
                if sa is None or sb is None:
                    # candidate id absent from the corpus (stale candidate
                    # set / filtered docs): drop, matching the inner-join
                    # semantics of the distributed path
                    jac[i] = -1.0
                    continue
                jac[i] = jaccard(
                    np.frombuffer(sa, dtype=np.uint64),
                    np.frombuffer(sb, dtype=np.uint64),
                )
            jac = np.round(jac, 6)
            keep = jac >= jaccard_threshold
            t = pa.table(
                {
                    "id_a": b.column("id_a").cast(pa.int64()),
                    "id_b": b.column("id_b").cast(pa.int64()),
                    "n_bands": b.column("n_bands").cast(pa.int64()),
                    "jaccard": pa.array(jac),
                }
            )
            return t.filter(pa.array(keep))

        return uniq.map_batches(verify_broadcast, batch_format="pyarrow")

    # no dedup groupby needed: left_semi keeps a left row once regardless of
    # duplicate right keys, so the raw (id_a ∪ id_b) stream joins directly
    cand_ids = uniq.map_batches(
        lambda b: _pair_ids_table(b, id_col), batch_format="pyarrow"
    )

    docs = ds.map_batches(
        lambda b: b.select([id_col, text_col]), batch_format="pyarrow"
    ).join(arrow_clean(cand_ids), "left_semi", num_partitions, on=(id_col,))

    sh_schema = pa.schema(
        [pa.field(id_col, pa.int64()), pa.field("_sh", pa.binary())]
    )

    def shingle_sets(b: pa.Table) -> pa.Table:
        # Ray's hash join emits SCHEMA-LESS blocks for empty partitions
        # (more partitions than matched docs) — give them the typed shape
        if len(b) == 0:
            return sh_schema.empty_table()
        texts = b.column(text_col).to_pylist()
        sets = [char_shingles(t or "", shingle_k).tobytes() for t in texts]
        return pa.table(
            {
                id_col: b.column(id_col).cast(pa.int64()),
                "_sh": pa.array(sets, type=pa.binary()),
            }
        )

    # consumed twice (side a / side b joins) — same materialize rationale
    docs_sh = docs.map_batches(shingle_sets, batch_format="pyarrow").materialize()

    def as_side(side: str):
        def f(b: pa.Table) -> pa.Table:
            if len(b) == 0:
                return pa.schema(
                    [pa.field(f"id_{side}", pa.int64()),
                     pa.field(f"_sh_{side}", pa.binary())]
                ).empty_table()
            return b.rename_columns([f"id_{side}", f"_sh_{side}"])
        return f

    sh_a = docs_sh.map_batches(as_side("a"), batch_format="pyarrow")
    sh_b = docs_sh.map_batches(as_side("b"), batch_format="pyarrow")
    joined = arrow_clean(uniq).join(
        arrow_clean(sh_a), "inner", pair_partitions, on=("id_a",)
    ).join(arrow_clean(sh_b), "inner", pair_partitions, on=("id_b",))

    def batch_jaccard(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        fa, oa = _packed_u64_slices(b.column("_sh_a"))
        fb, ob = _packed_u64_slices(b.column("_sh_b"))
        jac = np.empty(len(b), dtype=np.float64)
        for i in range(len(b)):
            jac[i] = jaccard(fa[oa[i]:oa[i + 1]], fb[ob[i]:ob[i + 1]])
        jac = np.round(jac, 6)
        keep = jac >= jaccard_threshold
        t = pa.table(
            {
                "id_a": b.column("id_a").cast(pa.int64()),
                "id_b": b.column("id_b").cast(pa.int64()),
                "n_bands": b.column("n_bands").cast(pa.int64()),
                "jaccard": pa.array(jac),
            }
        )
        return t.filter(pa.array(keep)).cast(out_schema)

    return joined.map_batches(batch_jaccard, batch_format="pyarrow")


def dedup_clusters(
    pairs: Dataset | pd.DataFrame,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 20,
    mode: str = "auto",
) -> pd.DataFrame | Dataset:
    """Connected components over near-dup candidate pairs -> (id, cluster_id)
    with cluster_id = min id of the component.

    Min-label propagation: each round every edge proposes min(label_a,
    label_b) to both endpoints; a ``groupby(id).min`` adopts the smallest.
    Terminates when labels stop changing — O(diameter) rounds; near-dup
    components are tiny, so this converges in 2-4 rounds.

    ``mode``: ``"driver"`` runs the rounds on one node (a pandas frame; fine
    while pairs fit in memory), ``"distributed"`` runs them as Ray joins +
    groupbys with nothing on the driver (the 100-TB path for dup-heavy
    corpora), ``"auto"`` picks by input type (DataFrame -> driver,
    Dataset -> distributed). Driver mode returns a DataFrame, distributed a
    Dataset (id, cluster_id).
    """
    if mode == "auto":
        mode = "driver" if isinstance(pairs, pd.DataFrame) else "distributed"
    if mode == "distributed":
        ds_pairs = pairs
        if isinstance(ds_pairs, pd.DataFrame):
            import ray.data as rd

            ds_pairs = rd.from_pandas(ds_pairs)
        return dedup_clusters_distributed(
            ds_pairs, id_a=id_a, id_b=id_b, max_rounds=max_rounds
        )
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


def dedup_clusters_distributed(
    pairs: Dataset,
    *,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_rounds: int = 20,
    num_partitions: int | None = None,
    stats: dict | None = None,
    driver_edges_limit: int = 2_000_000,
) -> Dataset:
    """Distributed connected components: min-label propagation as Ray hash
    joins + groupby-min rounds. The pair table and the label table live in
    the object store end-to-end; the driver sees ONE scalar per round (the
    count of changed labels, which is also the convergence test). Rounds are
    O(component diameter): 2-4 for near-dup graphs.

    Small graphs collapse to the DRIVER rounds (``dedup_clusters`` driver
    mode): each distributed round costs seconds of join/groupby fixed
    overhead, so below ``driver_edges_limit`` edges (2M default — a ~32 MB
    bounded pull, milliseconds of numpy) the whole propagation runs in one
    driver step. Verified near-dup pair sets are SMALL relative to the
    corpus (the LSH + exact-verify funnel), so this is the common case;
    dup-heavy corpora whose edge sets outgrow the limit take the
    distributed rounds below unchanged.

    Frontier contraction per round: a node's label can only decrease when a
    NEIGHBOR's label decreased in the previous round, so from round 2 on
    only the previous round's changed nodes (the frontier) need to
    propagate. While the frontier is small — which is exactly when pruning
    pays — its (id, label) pairs are broadcast (``ray.put``) and the round
    becomes ONE map_batches pass over the edge table: each edge incident to
    a frontier node emits the frontier label to its other endpoint; no join
    shuffle at all (Pregel-style frontier propagation; delivering each
    endpoint's label to the other is equivalent to the min-proposal under
    the groupby-min). A frontier above ``prune_threshold`` ids falls back to
    the full two-join round (early rounds, where most edges are active
    anyway). Edges of converged components stop shuffling; they re-activate
    automatically if an endpoint changes again later. ``stats``, when given,
    records ``edges_per_round`` / ``changed_per_round`` (test/diagnostic
    hook; the per-round active-edge count costs one extra pass)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Min

    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 4)

    edges = pairs.map_batches(
        lambda b: pa.table(
            {
                "eid_a": b.column(id_a).cast(pa.int64()),
                "eid_b": b.column(id_b).cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()  # reused every round

    if edges.count() <= driver_edges_limit:
        pdf = edges.to_pandas().rename(columns={"eid_a": "id_a", "eid_b": "id_b"})
        out = dedup_clusters(pdf, max_rounds=max_rounds, mode="driver")
        if stats is not None:
            stats["mode"] = "driver-collapse"
        # metadata-free Arrow, not from_pandas: a pandas block here would
        # flip every downstream sort/groupby exchange back to pandas blocks
        # (the arrow-lineage rule, see partition.strip_meta)
        return rd.from_arrow(
            strip_meta(pa.Table.from_pandas(out, preserve_index=False))
        )

    def flat(b: pa.Table) -> pa.Table:
        ids = np.concatenate(
            [b.column("eid_a").to_numpy(zero_copy_only=False),
             b.column("eid_b").to_numpy(zero_copy_only=False)]
        ).astype(np.int64)
        return pa.table({"id": pa.array(ids), "lab": pa.array(ids)})

    from rp_extract_ray.stages.groupops import grouped_reduce

    labels = grouped_reduce(
        edges.map_batches(flat, batch_format="pyarrow"),
        "id", {"lab": ("lab", "min")},
    ).materialize()
    n_nodes = labels.count()
    if n_nodes == 0:
        return rd.from_arrow(
            pa.schema(
                [pa.field("id", pa.int64()), pa.field("cluster_id", pa.int64())]
            ).empty_table()
        )
    # join-partition cap: each Ray join spawns num_partitions aggregator
    # actors whose fixed cost dwarfs the work on small graphs, and EMPTY
    # hash partitions lose their schema (breaks chained joins) — scale
    # partitions with actual row volume (~50k rows per partition)
    num_partitions = max(
        1, min(num_partitions, max(int(edges.count()), n_nodes) // 50_000 + 1)
    )
    if stats is not None:
        stats.setdefault("edges_per_round", [])
        stats.setdefault("changed_per_round", [])
    prune_threshold = 1 << 22  # ~64 MB of frontier (id, lab) per broadcast
    frontier_ref = None  # None = first round / oversized frontier
    if n_nodes <= prune_threshold:
        # small graph: round 1's frontier is every node with its own id as
        # label — broadcast it and the FIRST round is joinless too
        fr0 = labels.to_pandas()
        order0 = np.argsort(fr0["id"].to_numpy())
        frontier_ref = ray.put(
            (
                fr0["id"].to_numpy().astype(np.int64)[order0],
                fr0["lab"].to_numpy().astype(np.int64)[order0],
            )
        )
    for _ in range(max_rounds):
        if frontier_ref is None:
            # full round: attach both endpoint labels with two hash joins
            if stats is not None:
                stats["edges_per_round"].append(int(edges.count()))
            la = labels.map_batches(
                lambda b: b.rename_columns(["eid_a", "lab_a"]),
                batch_format="pyarrow",
            )
            lb = labels.map_batches(
                lambda b: b.rename_columns(["eid_b", "lab_b"]),
                batch_format="pyarrow",
            )
            tagged = arrow_clean(edges).join(
                arrow_clean(la), "inner", num_partitions, on=("eid_a",)
            ).join(arrow_clean(lb), "inner", num_partitions, on=("eid_b",))

            def props(b: pa.Table) -> pa.Table:
                pa_ = b.column("lab_a").to_numpy(zero_copy_only=False)
                pb_ = b.column("lab_b").to_numpy(zero_copy_only=False)
                prop = np.minimum(pa_, pb_)
                ids = np.concatenate(
                    [b.column("eid_a").to_numpy(zero_copy_only=False),
                     b.column("eid_b").to_numpy(zero_copy_only=False)]
                ).astype(np.int64)
                return pa.table(
                    {"id": pa.array(ids), "lab": pa.array(np.tile(prop, 2))}
                )

            proposals = tagged.map_batches(props, batch_format="pyarrow")
        else:
            # pruned round: one joinless pass; frontier labels broadcast
            ref = frontier_ref

            def frontier_props(b: pa.Table) -> pa.Table:
                f_ids, f_labs = ray.get(ref)
                ea = b.column("eid_a").to_numpy(zero_copy_only=False)
                eb = b.column("eid_b").to_numpy(zero_copy_only=False)
                out_ids, out_labs = [], []
                for src, dst in ((ea, eb), (eb, ea)):
                    i = np.searchsorted(f_ids, src)
                    i[i == len(f_ids)] = 0
                    hit = f_ids[i] == src
                    out_ids.append(dst[hit].astype(np.int64))
                    out_labs.append(f_labs[i[hit]])
                return pa.table(
                    {
                        "id": pa.array(np.concatenate(out_ids)),
                        "lab": pa.array(np.concatenate(out_labs)),
                    }
                )

            proposals = edges.map_batches(frontier_props, batch_format="pyarrow")
            if stats is not None:
                f_ids, _ = ray.get(frontier_ref)

                def count_active(b: pa.Table) -> pa.Table:
                    ea = b.column("eid_a").to_numpy(zero_copy_only=False)
                    eb = b.column("eid_b").to_numpy(zero_copy_only=False)
                    n_act = int(
                        (np.isin(ea, f_ids) | np.isin(eb, f_ids)).sum()
                    )
                    return pa.table({"n": pa.array([n_act], pa.int64())})

                stats["edges_per_round"].append(
                    int(
                        edges.map_batches(count_active, batch_format="pyarrow")
                        .to_pandas()["n"].sum()
                    )
                )
        new_labels = grouped_reduce(
            proposals.union(labels), "id", {"lab": ("lab", "min")}
        ).materialize()
        # changed set = nodes whose label decreased this round (one label
        # join over node-sized tables; the COUNT always reaches the driver,
        # the ids only while the frontier is below the broadcast threshold)
        old = labels.map_batches(
            lambda b: b.rename_columns(["id", "lab_old"]), batch_format="pyarrow"
        )
        _changed_schema = pa.schema(
            [pa.field("id", pa.int64()), pa.field("lab", pa.int64())]
        )

        def changed_rows(b: pa.Table) -> pa.Table:
            if len(b) == 0:  # schema-less empty join partition
                return _changed_schema.empty_table()
            return b.filter(
                pa.compute.less(b.column("lab"), b.column("lab_old"))
            ).select(["id", "lab"]).cast(_changed_schema)

        changed = (
            arrow_clean(new_labels).join(arrow_clean(old), "inner", num_partitions, on=("id",))
            .map_batches(changed_rows, batch_format="pyarrow")
            .materialize()
        )
        n_changed = int(changed.count())
        if stats is not None:
            stats["changed_per_round"].append(n_changed)
        labels = new_labels
        if n_changed == 0:
            break
        if n_changed <= prune_threshold:
            fr = changed.to_pandas()
            order = np.argsort(fr["id"].to_numpy())
            frontier_ref = ray.put(
                (
                    fr["id"].to_numpy().astype(np.int64)[order],
                    fr["lab"].to_numpy().astype(np.int64)[order],
                )
            )
        else:
            frontier_ref = None
    return labels.map_batches(
        lambda b: b.rename_columns(["id", "cluster_id"]), batch_format="pyarrow"
    )


def drop_near_dups(
    ds: Dataset,
    clusters: pd.DataFrame | Dataset,
    *,
    id_col: str = "doc_id",
) -> Dataset:
    """Keep one representative per near-dup cluster (the min id) plus all
    unclustered rows. A DataFrame cluster table anti-joins by broadcast key
    set; a Dataset cluster table (the distributed CC output) flows through
    the distributed hash anti-join — nothing on the driver."""
    from rp_extract_ray.stages.join import semi_anti_join

    if isinstance(clusters, Dataset):
        losers = clusters.map_batches(
            lambda b: b.filter(
                pa.compute.not_equal(b.column("id"), b.column("cluster_id"))
            ).select(["id"]),
            batch_format="pyarrow",
        )
        return semi_anti_join(ds, losers, on=id_col, keys_on="id", anti=True)
    losers = set(
        int(i) for i, c in zip(clusters["id"], clusters["cluster_id"]) if i != c
    )
    if not losers:
        return ds
    return semi_anti_join(ds, losers, on=id_col, anti=True)


def simhash_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    star_threshold: int | None = 256,
) -> Dataset:
    """Near-dup pairs by SimHash banding (4 x 16-bit bands: any pair within
    Hamming distance 3 shares at least one exact band) + Hamming verify.

    Dense-bucket guard: a bucket above ``star_threshold`` members (e.g. a
    dup-heavy corpus where thousands of docs share a 16-bit band) emits STAR
    pairs against the bucket's min id instead of the O(m^2) triangle — the
    same trade as :func:`_bucket_pairs_partitioned`. Be precise about what
    the cap gives up IN THAT BUCKET: enumeration is no longer exhaustive,
    and a pair both of whose members are >``max_hamming`` from the hub is
    not emitted from that bucket (it is still found via any OTHER,
    non-dense band the two agree on). The practical dense bucket is a
    duplicate cluster whose hub is within the threshold of every member, so
    the star is a faithful spanning structure there; set
    ``star_threshold=None`` for strict exhaustive semantics (O(m^2) output
    by definition — the exhaustive pair list of m duplicates IS quadratic).
    The DuckDB oracle is the exhaustive sweep, exact whenever no band
    bucket exceeds the cap (true for the driver corpora)."""
    import re

    from rp_extract_ray.functions.hashing import simhash64_batch, tokens_hash_batch

    tok = re.compile(r"\w+", re.ASCII)  # shipped in the closure, compiled once

    def sigs_batch(batch: pa.Table) -> pa.Table:
        # stateless tasks (scale to all CPUs); per-doc work = one regex
        # findall; hashing + bit aggregation run ONCE over the batch's
        # concatenated token stream. Declared pyarrow so the downstream
        # band-key exchange sorts arrow blocks (partition.run_group rule).
        toks = [
            np.array(tok.findall((t or "").lower()), dtype=object)
            for t in batch.column(text_col).to_pandas().fillna("")
        ]
        flat, counts = tokens_hash_batch(toks)
        sh = simhash64_batch(flat, counts)
        keys = np.stack(
            [
                (((sh >> np.uint64(16 * b)) & np.uint64(0xFFFF))
                 ^ np.uint64(((b + 1) * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)).astype(np.int64)
                for b in range(4)  # band index mixed in: flat exact key
            ],
            axis=1,
        ).reshape(-1)
        return pa.table(
            {
                id_col: pa.array(
                    np.repeat(
                        batch.column(id_col).to_numpy(zero_copy_only=False), 4
                    )
                ),
                "band_key": pa.array(keys),
                "simhash": pa.array(np.repeat(sh.astype(np.int64), 4)),
            }
        )

    exploded = ds.map_batches(sigs_batch, batch_format="pyarrow", batch_size=512)

    from rp_extract_ray.stages.partition import partitioned_apply

    def pairs_fn(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        sigs = pdf["simhash"].to_numpy().astype(np.uint64)
        run_starts, run_ends = run_bounds(starts, len(pdf))
        sizes = run_ends - run_starts
        rows_a, rows_b, rows_h = [], [], []
        from rp_extract_ray.functions.hashing import popcount64

        for s, e in zip(run_starts[sizes > 1], run_ends[sizes > 1]):
            order = np.argsort(ids[s:e]) + s
            mid, msig = ids[order], sigs[order]
            if star_threshold is not None and len(mid) > star_threshold:
                # star pairs vs the min-id hub: O(m), not O(m^2)
                ham = popcount64(msig[0] ^ msig[1:])
                keep = (ham <= max_hamming) & (mid[1:] != mid[0])
                rows_a.append(np.full(int(keep.sum()), mid[0]))
                rows_b.append(mid[1:][keep])
                rows_h.append(ham[keep])
                continue
            ia, ib = np.triu_indices(len(mid), k=1)
            ham = popcount64(msig[ia] ^ msig[ib])
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
        num_partitions=_exchange_partitions(),
    )

    def pack(b: pa.Table) -> pa.Table:
        key = (
            b.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
            << np.int64(31)
        ) | b.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column("pair_key", pa.array(key))

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
        pairs.map_batches(pack, batch_format="pyarrow"),
        first_fn, entity_col="pair_key", order_cols=("id_a",), num_partitions=_exchange_partitions(),
    )


def _vec_matrix(col: pa.ChunkedArray) -> np.ndarray:
    """(n, d) float64 matrix from a list<float>/fixed_size_list<float>
    column — zero-copy flatten + reshape (classify.py:141 pattern), never
    ``to_pylist``/``np.stack`` per element."""
    arr = col.combine_chunks()
    if isinstance(arr, pa.FixedSizeListArray):
        d = arr.type.list_size
        flat = arr.values.to_numpy(zero_copy_only=False)
        return flat.reshape(len(arr), d).astype(np.float64)
    if not isinstance(arr, pa.ListArray):
        # Ray tensor extension (ndarray cells) or other ext types
        m = arr.to_numpy(zero_copy_only=False)
        if isinstance(m, np.ndarray) and m.ndim == 2:
            return m.astype(np.float64)
        return np.stack(list(m)).astype(np.float64)
    offsets = arr.offsets.to_numpy(zero_copy_only=False)
    widths = np.diff(offsets)
    if len(widths) == 0:  # empty block (post-filter) -> typed empty matrix
        return np.zeros((0, 0), dtype=np.float64)
    d = int(widths[0])
    if not (widths == d).all():
        raise ValueError("ragged embedding column")
    flat = arr.values.to_numpy(zero_copy_only=False)
    return flat[offsets[0]: offsets[-1]].reshape(-1, d).astype(np.float64)


def _unpack_f64(col: pa.ChunkedArray, d: int) -> np.ndarray:
    """(n, d) float64 from a binary column of packed float64 rows."""
    arr = col.combine_chunks()
    byte_off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    flat = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[byte_off[0]: byte_off[-1]]
    out = (
        flat.view(np.float64)
        if byte_off[0] % 8 == 0
        else np.frombuffer(flat.tobytes(), dtype=np.float64)
    )
    return out.reshape(-1, d)


def _pair_block(
    ids_a: np.ndarray, U_a: np.ndarray, ids_b: np.ndarray, U_b: np.ndarray,
    threshold: float, *, upper_only: bool, tile: int = 2048,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Thresholded cosine pairs between two unit-vector blocks, TILED so the
    similarity matrix never exceeds tile^2 floats regardless of block size
    (the dense-bucket guard the round-1 version lacked)."""
    out_a, out_b, out_c = [], [], []
    for i0 in range(0, len(ids_a), tile):
        A = U_a[i0 : i0 + tile]
        for j0 in range(0, len(ids_b), tile):
            if upper_only and j0 + tile <= i0:
                continue  # tile entirely below the diagonal
            B = U_b[j0 : j0 + tile]
            sim = A @ B.T
            ia, ib = np.nonzero(sim >= threshold)
            if upper_only:
                keep = (i0 + ia) < (j0 + ib)
                ia, ib = ia[keep], ib[keep]
            if len(ia):
                out_a.append(ids_a[i0 + ia])
                out_b.append(ids_b[j0 + ib])
                out_c.append(sim[ia, ib])
    if not out_a:
        z = np.empty(0, np.int64)
        return z, z.copy(), np.empty(0, np.float64)
    return (
        np.concatenate(out_a), np.concatenate(out_b), np.concatenate(out_c)
    )


_COS_SCHEMA = pa.schema(
    [pa.field("id_a", pa.int64()), pa.field("id_b", pa.int64()),
     pa.field("cos", pa.float64())]
)


def _cos_table(a: np.ndarray, b: np.ndarray, c: np.ndarray, id_col: str) -> pa.Table:
    from rp_extract_ray.functions.rounding import round_half_away

    swap = a > b  # canonical id_a < id_b regardless of block order
    a2 = np.where(swap, b, a)
    b2 = np.where(swap, a, b)
    return pa.table(
        {"id_a": pa.array(a2.astype(np.int64)), "id_b": pa.array(b2.astype(np.int64)),
         "cos": pa.array(round_half_away(c, 4))}
    ).cast(_COS_SCHEMA)


def _blocked_cosine_pairs(
    packed: Dataset,
    id_col: str,
    *,
    cos_threshold: float,
    num_blocks: int,
    tile: int = 2048,
) -> Dataset:
    """All-pairs thresholded cosine over a packed (id, unit:binary) Dataset,
    decomposed into B*(B+1)/2 independent block-pair tasks over OBJECT-STORE
    Arrow blocks. Results stay in the object store end-to-end: the task refs
    feed ``from_arrow_refs`` directly — no driver collect anywhere (the
    round-2 ``ray.get`` + concat is gone). Shared by :func:`exact_cosine_pairs`
    (whole corpus) and :func:`embedding_near_dup` (dense-bucket split)."""
    import ray
    import ray.data as rd

    refs = packed.repartition(num_blocks).to_arrow_refs()

    @ray.remote
    def block_pairs(ta: pa.Table, tb: pa.Table, same: bool) -> pa.Table:
        if len(ta) == 0 or len(tb) == 0:
            return _COS_SCHEMA.empty_table()
        ids_a = ta.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ids_b = tb.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = len(ta.column("unit")[0].as_py()) // 8
        U_a = _unpack_f64(ta.column("unit"), d)
        U_b = _unpack_f64(tb.column("unit"), d)
        if same:
            order = np.argsort(ids_a)
            ids_a = ids_b = ids_a[order]
            U_a = U_b = U_a[order]
        a, b2, c = _pair_block(
            ids_a, U_a, ids_b, U_b, cos_threshold, upper_only=same, tile=tile
        )
        if not same:  # distinct blocks may still pair ids both ways; canon + drop self
            keep = a != b2
            a, b2, c = a[keep], b2[keep], c[keep]
        return _cos_table(a, b2, c, id_col)

    tasks = [
        block_pairs.remote(refs[i], refs[j], i == j)
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    if not tasks:
        return rd.from_arrow(_COS_SCHEMA.empty_table())
    return rd.from_arrow_refs(tasks)


def embedding_near_dup(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    cos_threshold: float = 0.9,
    n_planes: int | None = 8,
    seed: int = 5,
    exhaustive: bool = False,
    tile: int = 2048,
    bucket_split_threshold: int | None = 8192,
) -> Dataset:
    """Cosine near-dup pairs over an embedding column (id_a, id_b, cos).

    Scale path: LSH-bucket by the sign pattern of ``n_planes`` random
    hyperplanes, exact-verify within buckets (recall < 1 by design — pairs
    at cos >= threshold usually share the sign pattern for high thresholds;
    tests/test_text_dedup.py measures recall vs the exact sweep).
    ``n_planes=None`` scales the plane count with corpus size (mean bucket
    ~256 rows). Within-bucket verification is TILED (``tile``): compute
    memory is bounded by tile^2 floats; buckets larger than
    ``bucket_split_threshold`` members additionally leave the ``map_groups``
    path entirely and run as block-pair tasks (the :func:`exact_cosine_pairs`
    decomposition restricted to the bucket), so a degenerate hot bucket never
    has to MATERIALIZE in one task either — per-task memory is bounded by
    two sub-blocks + one tile everywhere. ``exhaustive=True`` puts everything
    in one bucket (exact; small inputs / oracles only — for a distributed
    exact sweep use :func:`exact_cosine_pairs`).
    """
    import ray
    import ray.data as rd
    
    if n_planes is None:
        n = ds.count()
        n_planes = int(np.clip(np.ceil(np.log2(max(n, 2) / 256.0)), 4, 24))

    def add_bucket(b: pa.Table) -> pa.Table:
        vecs = _vec_matrix(b.column(vec_col))
        # same seed in every task -> identical hyperplanes everywhere
        planes = np.random.default_rng(seed).normal(size=(vecs.shape[1], n_planes))
        bucket = np.zeros(len(vecs), dtype=np.int64)
        if not exhaustive:
            signs = (vecs @ planes) > 0
            for j in range(n_planes):
                bucket |= signs[:, j].astype(np.int64) << j
        norm = np.linalg.norm(vecs, axis=1)
        norm[norm == 0] = 1.0
        unit = vecs / norm[:, None]
        return pa.table(
            {
                id_col: b.column(id_col).cast(pa.int64()),
                "bucket": pa.array(bucket),
                "unit": pa.array([u.tobytes() for u in unit], type=pa.binary()),
            }
        )

    bucketed = ds.map_batches(add_bucket, batch_format="pyarrow")

    def bucket_pairs(g: pa.Table) -> pa.Table:
        if len(g) < 2:
            return _COS_SCHEMA.empty_table()
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        first = g.column("unit")[0].as_py()
        d = len(first) // 8
        U = _unpack_f64(g.column("unit"), d)
        order = np.argsort(ids)
        ids, U = ids[order], U[order]
        a, b2, c = _pair_block(
            ids, U, ids, U, cos_threshold, upper_only=True, tile=tile
        )
        return _cos_table(a, b2, c, id_col)

    if bucket_split_threshold is None:
        return bucketed.groupby("bucket").map_groups(
            bucket_pairs, batch_format="pyarrow"
        )

    # dense-bucket split: find buckets whose membership exceeds the
    # threshold (only the filtered hot rows reach the driver — a handful of
    # (bucket, n) pairs by construction), route them through block-pair
    # tasks, everything else through the grouped path
    bucketed = bucketed.materialize()  # consumed by sizes + both pair paths
    from rp_extract_ray.stages.groupops import grouped_reduce

    hot = (
        grouped_reduce(  # map-combined hash exchange, not the sort aggregate
            bucketed.select_columns(["bucket"]),
            "bucket",
            {"n": ("bucket", "count")},
        )
        .map_batches(
            lambda b: b.filter(
                pa.compute.greater(b.column("n"), bucket_split_threshold)
            ),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if len(hot) == 0:
        return bucketed.groupby("bucket").map_groups(
            bucket_pairs, batch_format="pyarrow"
        )
    hot_ids = set(int(x) for x in hot["bucket"])
    hot_set_ref = ray.put(np.array(sorted(hot_ids), dtype=np.int64))

    def is_hot(b: pa.Table, invert: bool) -> pa.Table:
        hs = ray.get(hot_set_ref)
        bk = b.column("bucket").to_numpy(zero_copy_only=False)
        m = np.isin(bk, hs)
        return b.filter(pa.array(~m if invert else m))

    normal = bucketed.map_batches(
        is_hot, batch_format="pyarrow", fn_kwargs={"invert": True}
    )
    out = normal.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
    cpus = int(ray.cluster_resources().get("CPU", 8))
    for bk, n_members in zip(hot["bucket"], hot["n"]):
        sub = bucketed.map_batches(
            lambda b, _bk=int(bk): b.filter(
                pa.compute.equal(b.column("bucket"), _bk)
            ).select([id_col, "unit"]),
            batch_format="pyarrow",
        )
        # block size ~ bucket_split_threshold/2 rows: per-task memory stays
        # two sub-blocks + one tile regardless of how degenerate the bucket is
        nb = max(2, cpus // 2, int(np.ceil(2 * n_members / bucket_split_threshold)))
        out = out.union(
            _blocked_cosine_pairs(
                sub, id_col, cos_threshold=cos_threshold, num_blocks=nb, tile=tile
            )
        )
    return out


def exact_cosine_pairs(
    ds: Dataset,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    cos_threshold: float = 0.9,
    num_blocks: int | None = None,
    tile: int = 2048,
) -> Dataset:
    """EXACT all-pairs cosine near-dup sweep, distributed by block pairs.

    The O(n^2) work is decomposed into B*(B+1)/2 independent block-pair
    tasks: the normalized matrix is partitioned into B Arrow blocks held in
    the OBJECT STORE (``to_arrow_refs`` — never the driver), each stateless
    task reads two blocks zero-copy and emits its thresholded pairs via the
    tiled kernel, and the task refs feed ``from_arrow_refs`` so every result
    table ALSO stays in the object store (no driver collect — a
    low-threshold sweep emits O(n^2) pairs and the round-2 ``ray.get`` +
    concat would OOM the driver; tests assert bounded driver RSS). Raw Ray
    tasks are used because a block-pair cross product is not expressible as
    a Dataset transform (same pattern as the stateless partial-top-k tasks
    in stages/simsearch.py). Compute is inherently quadratic — this is the
    oracle/exact path; the scale path is :func:`embedding_near_dup`.
    """
    import ray

    if num_blocks is None:
        num_blocks = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)

    def pack(b: pa.Table) -> pa.Table:
        vecs = _vec_matrix(b.column(vec_col))
        norm = np.linalg.norm(vecs, axis=1)
        norm[norm == 0] = 1.0
        unit = vecs / norm[:, None]
        return pa.table(
            {
                id_col: b.column(id_col).cast(pa.int64()),
                "unit": pa.array([u.tobytes() for u in unit], type=pa.binary()),
            }
        )

    packed = ds.map_batches(pack, batch_format="pyarrow")
    return _blocked_cosine_pairs(
        packed, id_col, cos_threshold=cos_threshold, num_blocks=num_blocks, tile=tile
    )


def ngram_jaccard_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_k: int = 5,
    jaccard_threshold: float = 0.5,
    drop_above: int | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """EXACT n-gram (character k-shingle) Jaccard near-dup pairs, distributed.

    The exact counterpart of :func:`minhash_lsh_pairs` (the brief's "n-gram
    Jaccard" dedup modality): explode each doc to its distinct shingle
    hashes, one entity-partitioned pass over shingle runs emits every
    co-occurring (id_a, id_b), a pair-keyed count gives |A∩B| (each shared
    shingle contributes the pair exactly once since per-doc shingles are
    distinct), and per-doc set sizes are hash-joined back so
    ``jaccard = ni / (n_a + n_b - ni)`` is exact. Nothing driver-side.

    Scale notes: the exploded table is O(total text bytes) through ONE
    int64-keyed shuffle; co-occurrence pairs are O(sum_sh df(sh)^2), which a
    near-dup-heavy corpus inflates — ``drop_above`` skips shingles appearing
    in more than that many docs (a stopword-gram guard; result becomes a
    lower bound on jaccard for pairs sharing only ultra-common grams). For
    web-scale inputs prefer minhash_lsh_pairs (candidates) + distributed
    exact verify; this operator is the exact sweep / oracle path.
    ids must be < 2^31 (pair packing, see _dedup_pairs).
    """
    import ray
    
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 4)

    def explode(b: pa.Table) -> pa.Table:
        texts = b.column(text_col).to_pylist()
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sets = [char_shingles(t or "", shingle_k) for t in texts]
        counts = np.array([len(s) for s in sets], dtype=np.int64)
        flat = (
            np.concatenate(sets).astype(np.int64, copy=False)
            if len(sets)
            else np.empty(0, np.int64)
        )
        return pa.table(
            {
                id_col: pa.array(np.repeat(ids, counts)),
                "sh": pa.array(flat.view(np.int64)),
            }
        )

    exploded = ds.map_batches(explode, batch_format="pyarrow")

    # per-doc set sizes (distributed; reused by the final jaccard join) —
    # grouped_reduce: map-combined hash exchange, not the sort aggregate
    from rp_extract_ray.stages.groupops import grouped_reduce

    sizes = grouped_reduce(
        exploded.select_columns([id_col]), id_col, {"n_sh": (id_col, "count")}
    )

    pairs = _bucket_pairs_partitioned(
        exploded, "sh", id_col, star_threshold=None, drop_above=drop_above
    )
    counted = _dedup_pairs(pairs)  # n_bands == |A ∩ B| here

    sz_a = sizes.map_batches(
        lambda b: b.rename_columns(["id_a", "n_a"]), batch_format="pyarrow"
    )
    sz_b = sizes.map_batches(
        lambda b: b.rename_columns(["id_b", "n_b"]), batch_format="pyarrow"
    )
    joined = arrow_clean(counted).join(
        arrow_clean(sz_a), "inner", num_partitions, on=("id_a",)
    ).join(arrow_clean(sz_b), "inner", num_partitions, on=("id_b",))

    out_schema = pa.schema(
        [pa.field("id_a", pa.int64()), pa.field("id_b", pa.int64()),
         pa.field("jaccard", pa.float64())]
    )

    def finish(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        ni = b.column("n_bands").to_numpy(zero_copy_only=False).astype(np.float64)
        na = b.column("n_a").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = b.column("n_b").to_numpy(zero_copy_only=False).astype(np.float64)
        jac = np.round(ni / (na + nb - ni), 6)
        keep = jac >= jaccard_threshold
        t = pa.table(
            {
                "id_a": b.column("id_a").cast(pa.int64()),
                "id_b": b.column("id_b").cast(pa.int64()),
                "jaccard": pa.array(jac),
            }
        )
        return t.filter(pa.array(keep)).cast(out_schema)

    return joined.map_batches(finish, batch_format="pyarrow")


def contamination_pairs(
    corpus: Dataset,
    benchmark: Dataset,
    *,
    text_col: str = "text",
    corpus_id_col: str = "doc_id",
    bench_id_col: str = "doc_id",
    shingle_k: int = 5,
    min_containment: float = 0.5,
    drop_above: int | None = None,
    num_partitions: int | None = None,
) -> Dataset:
    """Cross-corpus decontamination: which benchmark documents leak into the
    training corpus? For every (corpus doc, benchmark doc) pair sharing
    shingles, emit the shared-shingle count and the CONTAINMENT ratio
    ``|C ∩ B| / |B|`` (fraction of the benchmark doc's distinct k-shingles
    present in the corpus doc — the decontamination metric: a benchmark doc
    can be fully contained in a longer training doc that plain Jaccard would
    score low). Pairs below ``min_containment`` are dropped.

    JOINLESS by design (Dataset.join loses the key schema on empty hash
    partitions — the known pitfall — and a heavily-filtered corpus side can
    be legitimately empty): both sides explode to ``(shingle_hash, id)``
    (O(text bytes)), ids ride side-tagged (corpus even / bench odd) through
    ONE shingle-partitioned pass that emits only CROSS (corpus × bench)
    pairs per shingle run, the engine's packed-pair partitioned count gives
    |C ∩ B|, and benchmark set sizes broadcast (8 B/doc — the benchmark is
    the small side by definition; its TEXT never broadcasts). ``drop_above``
    skips shingles occurring in more than that many CORPUS docs via a
    broadcast heavy-hitter set (containment becomes a lower bound, the same
    contract as ``ngram_jaccard_pairs``). ids must be < 2^30 (side tag +
    pair packing).
    """
    import ray
    
    from rp_extract_ray.stages.partition import partitioned_apply

    def make_explode(id_col: str, odd: int):
        def explode(b: pa.Table) -> pa.Table:
            texts = b.column(text_col).to_pylist()
            ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
            if (ids >= (1 << 30)).any() or (ids < 0).any():
                raise ValueError("contamination_pairs requires 0 <= id < 2^30")
            sets = [char_shingles(t or "", shingle_k) for t in texts]
            counts = np.array([len(s) for s in sets], dtype=np.int64)
            flat = (
                np.concatenate(sets).astype(np.int64, copy=False)
                if len(sets)
                else np.empty(0, np.int64)
            )
            tid = np.repeat(ids * 2 + odd, counts)
            return pa.table({"tid": pa.array(tid), "sh": pa.array(flat)})

        return explode

    c_sh = corpus.map_batches(make_explode(corpus_id_col, 0), batch_format="pyarrow")
    b_sh = benchmark.map_batches(make_explode(bench_id_col, 1), batch_format="pyarrow")

    if drop_above is not None:
        # stopword-gram guard on corpus document frequency: the HOT set
        # (df > cap) is the heavy-hitter tail — small by construction
        # (|hot| <= total occurrences / drop_above) — so it broadcasts and
        # the guard is a joinless per-batch anti filter.
        def keep_hot(b: pa.Table) -> pa.Table:
            if len(b) == 0:
                return pa.schema([pa.field("sh", pa.int64())]).empty_table()
            import pyarrow.compute as pc

            m = pc.greater(b.column("df"), pa.scalar(drop_above))
            return pa.table({"sh": b.column("sh").cast(pa.int64())}).filter(m)

        from rp_extract_ray.stages.groupops import grouped_reduce as _gr

        hot = (
            _gr(c_sh.select_columns(["sh"]), "sh", {"df": ("sh", "count")})
            .map_batches(keep_hot, batch_format="pyarrow")
            .to_pandas()["sh"]
        )
        hot_ref = ray.put(pa.array(hot, pa.int64()))

        def drop_hot(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.is_in(b.column("sh"), value_set=ray.get(hot_ref))
            return b.filter(pc.invert(mask))

        c_sh = c_sh.map_batches(drop_hot, batch_format="pyarrow")

    # benchmark set sizes, broadcast as a dense lookup (ids < 2^30; use a
    # dict-free two-array form: sorted ids + counts, searchsorted probe)
    from rp_extract_ray.stages.groupops import grouped_reduce as _gr

    b_sizes = _gr(b_sh, "tid", {"n_b": ("tid", "count")}).to_pandas()
    sz_ids = np.sort(b_sizes["tid"].to_numpy(np.int64))
    order = np.argsort(b_sizes["tid"].to_numpy(np.int64), kind="stable")
    sz_n = b_sizes["n_b"].to_numpy(np.int64)[order]
    sizes_ref = ray.put((sz_ids, sz_n))

    tagged = c_sh.union(b_sh)

    def cross_pairs(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        tid = pdf["tid"].to_numpy()
        run_starts, run_ends = run_bounds(starts, len(pdf))
        sizes = run_ends - run_starts
        out_a, out_b = [], []
        for s, e in zip(run_starts[sizes > 1], run_ends[sizes > 1]):
            members = np.unique(tid[s:e])
            cs = members[members % 2 == 0] >> 1
            bs = members[members % 2 == 1] >> 1
            if len(cs) == 0 or len(bs) == 0:
                continue
            out_a.append(np.repeat(cs, len(bs)))
            out_b.append(np.tile(bs, len(cs)))
        if not out_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                                 "id_b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    pairs = partitioned_apply(
        tagged, cross_pairs, entity_col="sh", order_cols=("tid",),
        num_partitions=num_partitions or _exchange_partitions(),
    )
    counted = _dedup_pairs(pairs)  # n_bands == |C ∩ B| per (corpus, bench)

    out_schema = pa.schema(
        [pa.field("corpus_id", pa.int64()), pa.field("bench_id", pa.int64()),
         pa.field("n_shared", pa.int64()), pa.field("containment", pa.float64())]
    )

    def finish(b: pa.Table) -> pa.Table:
        if len(b) == 0:
            return out_schema.empty_table()
        ids_sorted, n_sorted = ray.get(sizes_ref)
        cid = b.column("id_a").to_numpy(zero_copy_only=False).astype(np.int64)
        bid = b.column("id_b").to_numpy(zero_copy_only=False).astype(np.int64)
        ni = b.column("n_bands").to_numpy(zero_copy_only=False).astype(np.float64)
        pos = np.searchsorted(ids_sorted, bid * 2 + 1)
        nb = n_sorted[pos].astype(np.float64)
        cont = np.round(ni / nb, 6)
        t = pa.table(
            {
                "corpus_id": pa.array(cid),
                "bench_id": pa.array(bid),
                "n_shared": pa.array(ni.astype(np.int64)),
                "containment": pa.array(cont),
            }
        )
        return t.filter(pa.array(cont >= min_containment)).cast(out_schema)

    return counted.map_batches(finish, batch_format="pyarrow")


def normalized_exact_dedup(
    ds: Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> Dataset:
    """Exact dedup after text canonicalization (casefold + whitespace
    collapse + strip) — the near-exact tier between byte-identity dedup
    (:func:`exact_dedup`) and MinHash: catches re-encodes and formatting
    variants at hash-groupby cost. Same shuffle design: one int64 content
    hash per row, never the payload."""
    import pyarrow.compute as pc

    def add_hash(b: pa.Table) -> pa.Table:
        t = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(pc.fill_null(b.column(text_col), "")),
                r"\s+", " ",
            )
        )
        h = stable_hash(t.to_numpy(zero_copy_only=False))
        out = b.select([id_col])
        return out.append_column("content_hash", pa.array(h.astype(np.int64)))

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    from rp_extract_ray.stages.groupops import grouped_reduce

    return grouped_reduce(
        hashed,
        "content_hash",
        {id_col: (id_col, "min"), "n_dups": (id_col, "count")},
    )


def edit_distance_pairs(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    prefix: int = 16,
    truncate: int = 200,
    max_dist: int = 20,
    max_block: int = 4096,
    num_partitions: int | None = None,
) -> Dataset:
    """Prefix-blocked exact Levenshtein near-dup pairs — the
    edit-distance tier of the dedup family, between
    :func:`normalized_exact_dedup` (formatting variants) and
    :func:`minhash_lsh_pairs` (set overlap): catches small in-place edits
    (typo fixes, a changed number, template fill-ins) that shift many
    shingles but few characters.

    Blocking key = the first ``prefix`` characters of the text (exact
    match). ONE string-keyed exchange co-locates each block; within a
    block every (id_a < id_b) pair verifies with unit-cost edit distance
    (functions/editdist.py) over the first ``truncate`` characters, and
    pairs with ``dist <= max_dist`` are emitted as
    (id_a, id_b, dist: int64).

    Scale shape: prefix blocking bounds candidate pairs by the block-size
    distribution, not n² — on natural text, blocks are tiny (near-dups +
    hash accidents). The verify loop is per-CANDIDATE-PAIR, the same cost
    model as the MinHash verify stage. A corpus with a shared boilerplate
    head (every doc opens identically) breaks the assumption — the kernel
    raises above ``max_block`` docs per block to make that explicit;
    route such corpora through :func:`minhash_lsh_pairs` or strip the
    boilerplate first (stages/textstage.boilerplate_ngrams).
    """
    import pyarrow.compute as pc

    from rp_extract_ray.functions.editdist import levenshtein
    from rp_extract_ray.stages.partition import partitioned_apply

    def add_key(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column(text_col), "")
        return pa.table(
            {
                id_col: b.column(id_col),
                "_blk": pc.utf8_slice_codeunits(txt, 0, prefix),
                "_t": pc.utf8_slice_codeunits(txt, 0, truncate),
            }
        )

    keyed = ds.map_batches(add_key, batch_format="pyarrow")

    out_cols = {"id_a": np.int64, "id_b": np.int64, "dist": np.int64}

    def verify(pdf, starts) -> "pd.DataFrame":
        import pandas as pd

        ids_all = pdf[id_col].to_numpy()
        txt_all = pdf["_t"].to_numpy()
        run_starts = np.unique(starts)
        run_ends = np.append(run_starts[1:], len(pdf))
        ia, ib, dd = [], [], []
        for s, e in zip(run_starts, run_ends):
            m = e - s
            if m < 2:
                continue
            if m > max_block:
                raise ValueError(
                    f"edit_distance_pairs: block of {m} docs share a "
                    f"{prefix}-char prefix (> max_block={max_block}); "
                    "strip boilerplate or use minhash_lsh_pairs"
                )
            ids, txts = ids_all[s:e], txt_all[s:e]
            ai, bi = np.triu_indices(m, k=1)
            for x, y in zip(ai, bi):
                d = levenshtein(txts[x], txts[y])
                if d <= max_dist:
                    ia.append(ids[x])
                    ib.append(ids[y])
                    dd.append(d)
        return pd.DataFrame(
            {c: np.array(v, dtype=t) for (c, t), v in zip(out_cols.items(), (ia, ib, dd))}
        )

    kw = {} if num_partitions is None else {"num_partitions": num_partitions}
    # order by id within block -> id_a < id_b falls out of the triu indices
    return partitioned_apply(
        keyed, verify, entity_col="_blk", order_cols=(id_col,), **kw
    )


def corpus_diff(
    a: Dataset,
    b: Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int | None = None,
) -> Dataset:
    """Snapshot diff between two corpus versions: one row per id in either
    side with status ``added`` (only in B) / ``removed`` (only in A) /
    ``same`` / ``changed`` — the incremental-ingest audit op (which docs
    does a re-crawl add, drop, or rewrite?).

    Scale shape: each side reduces to ``(id, content_hash)`` BEFORE the
    exchange (``stable_hash`` of the text — 8 bytes through the full-outer
    ``repartition_join`` instead of the payload; a collision misreads one
    rewritten doc as ``same``, at ~1e-19 per changed doc). One id-keyed
    exchange total; the status classify compares the hashes IN ARROW (a
    pandas round-trip would lose int64-with-null columns to float64 and
    weaken the collision bound to 2^-53). A doc whose text is null in BOTH
    versions classifies as ``changed`` — per-side null sentinels replicate
    the SQL oracle's ``a.text = b.text`` (NULL = NULL is not true).
    """
    from rp_extract_ray.stages.join import repartition_join
    from rp_extract_ray.stages.partition import stable_hash

    def hashed(name, null_sentinel):
        def f(t: pa.Table) -> pa.Table:
            arr = t.column(text_col).to_numpy(zero_copy_only=False)
            h = stable_hash(arr).astype(np.int64)
            h[pd.isna(arr)] = null_sentinel
            return pa.table({id_col: t.column(id_col), name: pa.array(h)})

        return f

    ha = a.map_batches(hashed("hash_a", -1), batch_format="pyarrow")
    hb = b.map_batches(hashed("hash_b", -2), batch_format="pyarrow")
    kw = {} if num_partitions is None else {"num_partitions": num_partitions}
    j = repartition_join(
        ha, hb, on=id_col, how="full_outer",
        right_cols=[id_col, "hash_b"], **kw,
    )

    def classify(t: pa.Table) -> pa.Table:
        va = t.column("hash_a").combine_chunks()
        vb = t.column("hash_b").combine_chunks()
        same = pc.fill_null(pc.equal(va, vb), False)
        status = pc.if_else(
            pc.is_null(va),
            pa.scalar("added"),
            pc.if_else(
                pc.is_null(vb),
                pa.scalar("removed"),
                pc.if_else(same, pa.scalar("same"), pa.scalar("changed")),
            ),
        )
        return pa.table(
            {
                id_col: t.column(id_col).cast(pa.int64()),
                "status": status,
            }
        )

    return j.map_batches(classify, batch_format="pyarrow")


def latest_per_key(
    ds: Dataset,
    key_col: str,
    order_cols: "Sequence[str]",
    *,
    num_partitions: int | None = None,
) -> Dataset:
    """Keep the LATEST row per key — snapshot deduplication
    (``row_number() OVER (PARTITION BY key ORDER BY ... DESC) = 1``), the
    "newest version of each document/record wins" primitive of a
    CDC-style or re-crawled training corpus. Deterministic: ``order_cols``
    must be a total order within a key (include a unique tiebreaker).

    Scale shape: stage 1 reduces each BLOCK to its per-key winner with a
    vectorized sort + tail(1) — the keyed exchange then carries at most
    distinct-keys-per-block rows, never the raw table (the same map-side
    combine argument as ``grouped_reduce``, but keeping WHOLE rows, which
    an associative min/max reduction cannot). Stage 2 is one
    ``partitioned_apply`` exchange whose kernel picks each run's last row
    in sorted order. Two-stage argmax like this is exact because
    "latest" is associative over row sets.
    """
    import numpy as np

    from rp_extract_ray.stages.partition import arrow_out, partitioned_apply

    ocols = list(order_cols)

    def block_winners(b: pa.Table) -> pa.Table:
        if b.column(key_col).null_count:
            raise ValueError(
                "latest_per_key: null keys are not supported (SQL's "
                "PARTITION BY groups all nulls together, but the "
                "vectorized run detection cannot — filter or fill them "
                "upstream)"
            )
        pdf = b.to_pandas().sort_values([key_col, *ocols], kind="mergesort")
        return arrow_out(pdf.groupby(key_col, sort=False).tail(1))

    part = ds.map_batches(block_winners, batch_format="pyarrow")

    def fin(pdf, starts):
        n = len(pdf)
        if n == 0:
            return pdf
        last = np.append(starts[1:] != starts[:-1], True)
        return pdf[last]

    kw = {} if num_partitions is None else {"num_partitions": num_partitions}
    return partitioned_apply(
        part, fin, entity_col=key_col, order_cols=ocols, **kw
    )


def dup_span_counts(
    ds: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    width: int = 40,
    num_partitions: int | None = None,
    driver_budget: int = 5_000_000,
) -> Dataset:
    """Cross-document repeated-span detection (the span-level training-data
    dedup primitive: find fixed-width substrings shared across documents, the
    hash-bucketed approximation of suffix-array substring dedup).

    Text is tiled into non-overlapping ``width``-CHARACTER windows (docs
    shorter than one window drop out, matching the SQL oracle); a window is
    a duplicate span iff the identical substring occurs in >= 2 DISTINCT
    documents. Returns one row per windowed doc:
    ``(id_col, n_windows, n_dup_windows)``.

    Plan (shuffle-minimal):

    1. explode: one vectorized pass per batch builds a flat UTF-32 codepoint
       array, gathers all windows as a single (n_windows, width) uint32
       matrix, and folds each row to a 64-bit FNV-1a hash (``width``
       vectorized ops per block, no per-row Python) — the exchange key is
       8 bytes instead of the ``width*4``-byte blob (20x shuffle-volume cut
       at width=40; the exact_dedup content-hash argument: a collision
       falsely marks one window duplicated, at ~1e-11 for these
       cardinalities — the SQL oracle compares true substrings, so a
       collision would surface as a gate mismatch).
    2. dup-span set: per-block DISTINCT (win, doc) pairs (arrow hash
       aggregate), then ONE win-keyed ``grouped_reduce`` of min/max doc id —
       ``min != max`` ⟺ >= 2 distinct docs without a distinct-count
       accumulator.
    3. the dup-win set materializes once (post-aggregation, bounded by the
       distinct duplicate-span count, never the corpus). At or under
       ``driver_budget`` wins it broadcasts (``ray.put`` once, ``is_in``
       probe inside a second explode pass — zero extra shuffle); above the
       budget it stays distributed: a win-keyed ``repartition_join`` semi
       marks hits and a doc-keyed count reduces them (the 10^12-doc path,
       forced in tests via ``driver_budget=0``). Per-doc totals come
       straight from ``utf8_length // width`` with NO exchange (ids are
       unique); the final per-doc assembly broadcasts the dup counts —
       swap it for a doc-keyed ``repartition_join`` left_outer when the
       hit-doc set itself outgrows a node.

    Shuffle volume: one exchange of distinct (win, doc) pairs — bounded by
    corpus chars / width rows — plus one tiny doc-keyed count exchange.
    """
    import ray
    import pyarrow.compute as pc

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import broadcast_join

    def explode(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b.column(text_col)).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens, nan=0).astype(np.int64)
        n_wins = lens // width
        tot = int(n_wins.sum())
        if tot == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "win": pa.array([], pa.int64())}
            )
        texts = b.column(text_col).to_pylist()
        joined = "".join(t if t is not None else "" for t in texts)
        flat = np.frombuffer(joined.encode("utf-32-le"), dtype="<u4")
        doc_starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
        doc_idx = np.repeat(np.arange(len(lens)), n_wins)
        run_base = np.repeat(
            np.concatenate([[0], np.cumsum(n_wins)[:-1]]), n_wins
        )
        within = np.arange(tot) - run_base
        starts = doc_starts[doc_idx] + within * width
        mat = flat[starts[:, None] + np.arange(width)[None, :]]
        # FNV-1a fold across the width: 8-byte exchange key per window
        h = np.full(tot, 14695981039346656037, dtype=np.uint64)
        prime = np.uint64(1099511628211)
        for j in range(width):
            h = (h ^ mat[:, j].astype(np.uint64)) * prime
        ids = b.column(id_col).to_numpy(zero_copy_only=False)[doc_idx]
        return pa.table(
            {id_col: pa.array(ids), "win": pa.array(h.view(np.int64))}
        )

    def distinct_pairs(b: pa.Table) -> pa.Table:
        return explode(b).group_by(["win", id_col], use_threads=False).aggregate([])

    kw = {} if num_partitions is None else {"num_partitions": num_partitions}
    reduced = grouped_reduce(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        "win",
        {"dmin": (id_col, "min"), "dmax": (id_col, "max")},
        **kw,
    )
    dup = reduced.map_batches(
        lambda b: b.filter(
            pc.not_equal(b.column("dmin"), b.column("dmax"))
        ).select(["win"]),
        batch_format="pyarrow",
    ).materialize()

    n_dup_wins = dup.count()
    if n_dup_wins <= driver_budget:
        dup_pdf = dup.to_pandas()
        dup_set = pa.array(dup_pdf["win"].to_numpy(), type=pa.int64())
        set_ref = ray.put(dup_set)

        def count_dups(b: pa.Table) -> pa.Table:
            e = explode(b)
            hit = e.filter(
                pc.is_in(e.column("win"), value_set=ray.get(set_ref))
            )
            if hit.num_rows == 0:
                return pa.table(
                    {id_col: pa.array([], pa.int64()),
                     "n_dup_windows": pa.array([], pa.int64())}
                )
            r = hit.group_by([id_col], use_threads=False).aggregate(
                [([], "count_all")]
            )
            return pa.table(
                {id_col: r.column(id_col), "n_dup_windows": r.column("count_all")}
            )

        counted = ds.map_batches(count_dups, batch_format="pyarrow")
    else:
        from rp_extract_ray.stages.join import repartition_join

        win_rows = ds.map_batches(explode, batch_format="pyarrow")
        hit = repartition_join(win_rows, dup, on="win", how="semi", **kw)
        counted = hit.map_batches(
            lambda b: b.select([id_col]),
            batch_format="pyarrow",
        )
        # grouped_reduce's count reduction does the per-block combine

    how_red = (
        {"n_dup_windows": ("n_dup_windows", "sum")}
        if n_dup_wins <= driver_budget
        else {"n_dup_windows": (id_col, "count")}
    )
    ndup = grouped_reduce(counted, id_col, how_red, **kw).to_pandas()

    def totals(b: pa.Table) -> pa.Table:
        lens = pc.utf8_length(b.column(text_col)).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens, nan=0).astype(np.int64)
        n = lens // width
        keep = n > 0
        return pa.table(
            {
                id_col: b.column(id_col).filter(pa.array(keep)),
                "n_windows": pa.array(n[keep]),
            }
        )

    out = ds.map_batches(totals, batch_format="pyarrow")
    out = broadcast_join(
        out, ndup, on=id_col, value_cols=["n_dup_windows"], how="left"
    )

    def fill(b: pa.Table) -> pa.Table:
        col = b.column("n_dup_windows")
        if pa.types.is_null(col.type):
            # a block where NO doc had a dup window arrives as an all-null
            # untyped column (pandas merge-miss -> arrow null type)
            nd = pa.array(np.zeros(b.num_rows, np.int64))
        else:
            vals = col.to_numpy(zero_copy_only=False).astype(np.float64)
            nd = pa.array(np.nan_to_num(vals, nan=0.0).astype(np.int64))
        return pa.table(
            {
                id_col: b.column(id_col),
                "n_windows": b.column("n_windows"),
                "n_dup_windows": nd,
            }
        )

    return out.map_batches(fill, batch_format="pyarrow")


def sorted_neighborhood_pairs(
    ds: Dataset,
    key_col: str,
    id_col: str,
    *,
    window: int = 3,
    num_partitions: int = 32,
    sample_rate: float = 0.2,
    seed: int = 1,
) -> Dataset:
    """Sorted-neighborhood dedup blocking: global rank under ``key_col``
    order (unique int64 — pack a composite sort key upstream), candidate
    pairs = rows within rank distance <= ``window`` — the classic
    record-linkage blocking method (complement of the prefix/LSH blocks
    above: neighborhood blocking catches near-keys that share NO prefix
    or bucket).

    Scale shape: the global rank is the pack_sequences two-pass ordered
    prefix (range partition by sampled bounds -> order-free per-partition
    COUNT totals -> P offsets broadcast -> one exchange, in-partition sort
    + arange) — nothing driver-side but P ints; pair generation is a
    fixed ``window``-fan explode on the rank + ONE task-shuffle join back
    onto the ranked table (no ghost rows, no boundary cases). Output:
    ``(id_a, id_b, dist)`` with ``id_a`` the LOWER-rank row, dist in
    [1, window].
    """
    import ray

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.join import repartition_join
    from rp_extract_ray.stages.partition import (
        RANGE_PART_COL,
        add_range_part,
        range_partition_bounds,
    )

    slim = ds.select_columns([key_col, id_col]).materialize()
    bounds = range_partition_bounds(
        slim, key_col, num_partitions, sample_rate=sample_rate, seed=seed
    )
    parted = add_range_part(slim, key_col, bounds)
    totals = grouped_reduce(
        parted.select_columns([RANGE_PART_COL, key_col]),
        RANGE_PART_COL,
        {"tot": (key_col, "count")},
    ).to_pandas()
    offsets = np.zeros(num_partitions + 1, dtype=np.int64)
    for p, t in zip(totals[RANGE_PART_COL], totals["tot"]):
        offsets[int(p) + 1] = int(t)
    offsets = np.cumsum(offsets)
    off_ref = ray.put(offsets)

    def assign(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.schema(
                [pa.field("_rk", pa.int64()),
                 group.schema.field(id_col)]
            ).empty_table()
        part = int(group.column(RANGE_PART_COL)[0].as_py())
        group = group.drop_columns([RANGE_PART_COL]).sort_by(
            [(key_col, "ascending")]
        )
        rk = (
            np.arange(len(group), dtype=np.int64)
            + ray.get(off_ref)[part]
            + 1
        )
        return pa.table({"_rk": rk, id_col: group.column(id_col)})

    ranked = (
        parted.groupby(RANGE_PART_COL)
        .map_groups(assign, batch_format="pyarrow")
        .materialize()  # two consumers: probe side + fan-out side
    )

    def fan(b: pa.Table) -> pa.Table:
        rk = b.column("_rk").to_numpy(zero_copy_only=False)
        ids = b.column(id_col).to_numpy(zero_copy_only=False)
        n = len(b)
        ks = np.arange(1, window + 1, dtype=np.int64)
        return pa.table(
            {
                "_tgt": np.repeat(rk, window) + np.tile(ks, n),
                "id_a": np.repeat(ids, window),
                "dist": np.tile(ks, n),
            }
        )

    pairs = repartition_join(
        ranked.map_batches(fan, batch_format="pyarrow"),
        ranked, on="_tgt", right_on="_rk",
        right_cols=["_rk", id_col],
        num_partitions=num_partitions,
    )

    def fin(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "id_a": b.column("id_a"),
                "id_b": b.column(id_col),
                "dist": b.column("dist").cast(pa.int64()),
            }
        )

    return pairs.map_batches(fin, batch_format="pyarrow")
