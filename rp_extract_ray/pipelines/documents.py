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
    from rp_extract_ray.sources.pqio import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/documents.parquet", columns=columns)


def _emb(sf_dir: str) -> Dataset:
    from rp_extract_ray.sources.pqio import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/embeddings.parquet")


def q_regex_extract(sf_dir: str) -> Dataset:
    """First-match regex capture groups as columns
    (stages/explode.extract_regex_groups): the op and its argument word
    from each doc's first join/merge/sort phrase; null where absent.
    Oracle: NULLIF-wrapped regexp_extract per group (both engines are
    RE2, so first-match semantics agree exactly)."""
    from rp_extract_ray.stages.explode import extract_regex_groups

    ds = _docs(sf_dir, ["doc_id", "text"])
    out = extract_regex_groups(
        ds, "text", r"\b(?P<op>join|merge|sort) (?P<arg>\w+)", ["op", "arg"]
    )
    return out.select_columns(["doc_id", "op", "arg"])


def q_corpus_diff(sf_dir: str) -> Dataset:
    """Snapshot diff between two corpus versions (stages/dedup.corpus_diff):
    version B is derived deterministically from documents — every 7th doc
    dropped, every 5th rewritten (text || '!'), every 11th re-added as a
    new id — and the diff classifies each id as added/removed/changed/same
    through ONE id-keyed full-outer exchange of (id, content_hash) pairs
    (8 bytes per row, never the payload). Oracle: the same derivation as a
    SQL CTE + FULL OUTER JOIN CASE."""
    import pandas as pd

    from rp_extract_ray.stages.dedup import corpus_diff
    from rp_extract_ray.stages.partition import arrow_out

    a = _docs(sf_dir, ["doc_id", "text"])

    def derive_b(pdf: pd.DataFrame) -> pa.Table:
        keep = pdf[pdf["doc_id"] % 7 != 0].copy()
        m5 = keep["doc_id"] % 5 == 0
        keep.loc[m5, "text"] = keep.loc[m5, "text"] + "!"
        new = pdf[pdf["doc_id"] % 11 == 0]
        newdf = pd.DataFrame(
            {
                "doc_id": new["doc_id"] + 10_000_000,
                "text": "new doc " + new["doc_id"].astype(str),
            }
        )
        return arrow_out(
            pd.concat([keep[["doc_id", "text"]], newdf], ignore_index=True)
        )

    b = a.map_batches(
        lambda t: derive_b(t.to_pandas()), batch_format="pyarrow"
    )
    return corpus_diff(a, b, num_partitions=16)


def q_token_count(sf_dir: str) -> Dataset:
    ds = add_token_counts(_docs(sf_dir, ["doc_id", "text"]))
    return ds.select_columns(["doc_id", "n_tokens", "n_ws_tokens"])


def q_redact(sf_dir: str) -> Dataset:
    """PII redaction scrub (stages/textstage.redact_pii): emails/URLs/phone
    spans replaced with typed placeholders + per-doc match counts. Oracle:
    the same RE2 patterns via regexp_extract_all counts + nested
    regexp_replace(..., 'g') in the same order."""
    from rp_extract_ray.stages.textstage import redact_pii

    return redact_pii(_docs(sf_dir, ["doc_id", "text"]))


def q_pack_sequences(sf_dir: str) -> Dataset:
    """Sequence packing (stages/pack.py): documents laid end-to-end under
    stable doc_id order and cut into 512-token packs —
    pack_id = floor(exclusive_prefix_ws_tokens / 512). Oracle: the same
    regexp token count + a window cumsum."""
    from rp_extract_ray.stages.pack import pack_sequences

    ds = add_token_counts(_docs(sf_dir, ["doc_id", "text"]))
    return pack_sequences(
        ds.select_columns(["doc_id", "n_ws_tokens"]),
        token_col="n_ws_tokens", budget=512, num_partitions=16,
    )


def q_pack_stats(sf_dir: str) -> Dataset:
    """Per-pack utilization (n_docs, tok_sum) over the 512-token packing —
    the packing QA report. Oracle: GROUP BY over the window-cumsum CTE."""
    from rp_extract_ray.stages.pack import pack_stats

    ds = add_token_counts(_docs(sf_dir, ["doc_id", "text"]))
    return pack_stats(
        ds.select_columns(["doc_id", "n_ws_tokens"]),
        token_col="n_ws_tokens", budget=512, num_partitions=16,
    )


def q_text_quality(sf_dir: str) -> Dataset:
    """Full quality-scoring surface: character-class ratios, whole-word
    stopword ratio, mean word length, and the composite quality score —
    every column gated against the SQL replica (same RE2 regexes on both
    sides, same clip/linear formula)."""
    ds = add_quality_scores(_docs(sf_dir, ["doc_id", "text"]))
    return ds.select_columns(
        [
            "doc_id",
            "alpha_ratio",
            "digit_ratio",
            "space_ratio",
            "punct_ratio",
            "stopword_ratio",
            "mean_word_len",
            "quality",
        ]
    )


def q_langid(sf_dir: str) -> Dataset:
    """Rows-only (heuristic n-gram classifier has no SQL equivalent)."""
    ds = add_langid(_docs(sf_dir, ["doc_id", "text", "lang"]))
    return ds.select_columns(["doc_id", "lang", "lang_pred", "lang_conf"])


def q_fingerprint(sf_dir: str) -> Dataset:
    """Winnowing fingerprint + simhash per document. Oracle: literal table
    of expected values recomputed by an independent single-process
    implementation (pipelines/oracle_literals.py — the reference's
    golden-vector doctest strategy, /root/reference/rp_extract.py:424-445).
    The 8 fingerprint hashes are emitted as flat fp0..fp7 columns so the
    driver's scalar value-hash gates the full winnowing math."""
    ds = add_fingerprints(_docs(sf_dir, ["doc_id", "text"]))

    def flatten(b: pa.Table) -> pa.Table:
        # integer flatten (NOT _vec_matrix: its float64 round-trip would
        # corrupt hash values above 2^53)
        arr = b.column("fingerprint").combine_chunks()
        if len(arr) == 0:
            fp = np.empty((0, 8), np.int64)
        elif isinstance(arr, pa.ListArray):
            offsets = arr.offsets.to_numpy(zero_copy_only=False)
            flat = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
            fp = flat[offsets[0] : offsets[-1]].reshape(len(arr), -1)
        else:  # Ray tensor extension (ndarray cells)
            m = arr.to_numpy(zero_copy_only=False)
            fp = (
                m.astype(np.int64)
                if isinstance(m, np.ndarray) and m.ndim == 2
                else np.stack(list(m)).astype(np.int64)
            )
        cols = {
            "doc_id": b.column("doc_id").cast(pa.int64()),
            "simhash": b.column("simhash").cast(pa.int64()),
        }
        for i in range(fp.shape[1]):
            cols[f"fp{i}"] = pa.array(fp[:, i], type=pa.int64())
        return pa.table(cols)

    return ds.map_batches(flatten, batch_format="pyarrow")


def q_tfidf(sf_dir: str, k: int = 3) -> Dataset:
    """Top-k TF-IDF terms per document (stages/tfidf.py): distributed df
    combine + token hash-join + map-side-pruned per-doc top-k. Oracle: the
    same unnest/groupby/ln formula in SQL, ranked on the ROUNDED score with
    token-text tiebreak on both sides."""
    from rp_extract_ray.stages.tfidf import tfidf_top_terms

    out = tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]), k=k)
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id").cast(pa.int64()),
                "token": b.column("token"),
                "tfidf": b.column("tfidf"),
            }
        ),
        batch_format="pyarrow",
    )


def q_minhash_pairs(sf_dir: str) -> Dataset:
    """Near-dup pairs, LSH candidates + DISTRIBUTED exact-Jaccard verify.

    Oracle: exact all-pairs k-gram Jaccard in DuckDB. The comparison is
    exact because verified pairs carry true Jaccard and, at the driver sf,
    every true pair sits far above the LSH S-curve (measured: all 25 pairs
    at sf0.01 have jaccard >= 0.928; 16x4 bands miss such a pair with
    p < 1e-8). A recall-deficient configuration would fail the oracle —
    that is the point of the gate."""
    out = minhash_lsh_pairs(
        _docs(sf_dir, ["doc_id", "text"]), jaccard_threshold=0.5
    )
    return out.select_columns(["id_a", "id_b", "jaccard"])


def q_ngram_jaccard(sf_dir: str) -> Dataset:
    """EXACT distributed n-gram Jaccard sweep (shingle explode + pair-count
    + size join) — same oracle SQL, exact by construction."""
    from rp_extract_ray.stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs(sf_dir, ["doc_id", "text"]), jaccard_threshold=0.5
    )


def q_contamination(sf_dir: str, min_containment: float = 0.6) -> Dataset:
    """Cross-corpus decontamination (stages/dedup.contamination_pairs):
    sources src0/src1 play the benchmark set, the rest the training corpus;
    emit pairs where >= 60% of the benchmark doc's distinct 5-shingles
    appear in a corpus doc."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.dedup import contamination_pairs

    ds = _docs(sf_dir, ["doc_id", "text", "source"])
    bench_mask = lambda b: pc.is_in(
        b.column("source"), value_set=pa.array(["src0", "src1"])
    )
    corpus = ds.map_batches(
        lambda b: b.filter(pc.invert(bench_mask(b))).drop_columns(["source"]),
        batch_format="pyarrow",
    )
    bench = ds.map_batches(
        lambda b: b.filter(bench_mask(b)).drop_columns(["source"]),
        batch_format="pyarrow",
    )
    return contamination_pairs(corpus, bench, min_containment=min_containment)


def q_simhash_pairs(sf_dir: str) -> Dataset:
    """Rows-only: SimHash near-dup pairs (Hamming <= 3)."""
    return simhash_pairs(_docs(sf_dir, ["doc_id", "text"]), max_hamming=3)


def q_near_dup_clusters(sf_dir: str) -> Dataset:
    """Connected components over the verified MinHash near-dup pairs via
    the DISTRIBUTED min-label propagation (frontier-contracted). Oracle:
    recursive-CTE transitive closure over the exact-Jaccard pair set."""
    from rp_extract_ray.stages.dedup import dedup_clusters_distributed

    pairs = minhash_lsh_pairs(
        _docs(sf_dir, ["doc_id", "text"]), jaccard_threshold=0.5
    )
    out = dedup_clusters_distributed(pairs)
    return out.map_batches(
        lambda b: pa.table(
            {
                "id": b.column("id").cast(pa.int64()),
                "cluster_id": b.column("cluster_id").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_dedup_drop(sf_dir: str) -> Dataset:
    """Near-dup drop: keep one representative (min id) per cluster plus all
    unclustered docs — the full mine -> cluster -> anti-join chain, all
    distributed. Oracle: NOT IN over the closure's non-representatives."""
    from rp_extract_ray.stages.dedup import (
        dedup_clusters_distributed,
        drop_near_dups,
    )

    docs = _docs(sf_dir, ["doc_id", "text"])
    pairs = minhash_lsh_pairs(docs, jaccard_threshold=0.5)
    clusters = dedup_clusters_distributed(pairs)
    kept = drop_near_dups(docs, clusters)
    return kept.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id").cast(pa.int64())}),
        batch_format="pyarrow",
    )


def q_embedding_near_dup(sf_dir: str) -> Dataset:
    """High-cosine pairs via hyperplane-LSH buckets + tiled exact verify.

    Oracle: the SAME bucketing replicated in SQL (the seed-5 hyperplanes are
    embedded as literal constants in the oracle, list_dot sign pattern ==
    the engine's) — so bucketing AND verification are both gated, recall
    included. Threshold 0.25 fits the synthetic embeddings' similarity
    range; production near-dup would use ~0.95."""
    return embedding_near_dup(_emb(sf_dir), cos_threshold=0.25, n_planes=4)


def q_cosine_pairs(sf_dir: str) -> Dataset:
    """EXACT distributed all-pairs cosine sweep (block-pair tasks over
    object-store Arrow blocks; oracle: cross-join list_cosine_similarity)."""
    from rp_extract_ray.stages.dedup import exact_cosine_pairs

    return exact_cosine_pairs(_emb(sf_dir), cos_threshold=0.25)


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
        from rp_extract_ray.stages.dedup import _vec_matrix

        vecs = _vec_matrix(b.column("embedding"))
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


def q_quantile_filter(sf_dir: str) -> Dataset:
    """Per-language length-window curation filter: keep documents whose
    length lies within [p10, p90] of their language — the compose pattern
    aggregate -> broadcast small cutoffs -> stream filter (zero shuffle on
    the big side). Oracle: quantile_cont cutoffs joined back in SQL
    (inclusive bounds; integer lengths make boundary hits exact on both
    sides)."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.groupops import grouped_quantiles
    from rp_extract_ray.stages.join import broadcast_join

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def add_len(b: pa.Table) -> pa.Table:
        n = pc.utf8_length(b.column("text")).cast(pa.float64())
        return pa.table(
            {"doc_id": b.column("doc_id"), "lang": b.column("lang"), "len": n}
        )

    slim = ds.map_batches(add_len, batch_format="pyarrow")
    cuts = grouped_quantiles(
        slim, "lang", "len", [0.10, 0.90], out_names=["lo", "hi"]
    ).select_columns(["lang", "lo", "hi"])
    joined = broadcast_join(slim, cuts, on="lang", value_cols=["lo", "hi"])

    def keep(b: pa.Table) -> pa.Table:
        ln = b.column("len")
        mask = pc.and_(
            pc.greater_equal(ln, b.column("lo")),
            pc.less_equal(ln, b.column("hi")),
        )
        b = b.filter(mask)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "len": b.column("len").cast(pa.int64()),
            }
        )

    return joined.map_batches(keep, batch_format="pyarrow")


def q_token_explode(sf_dir: str) -> Dataset:
    """Position-indexed token explode (stages/explode.py): offsets-driven
    flat_map, no per-row Python. Oracle: string_split + range unnest."""
    from rp_extract_ray.stages.explode import explode_tokens

    return explode_tokens(_docs(sf_dir, ["doc_id", "text"]))


def q_kmeans(sf_dir: str) -> Dataset:
    """Distributed Lloyd k-means over the embedding corpus (stages/kmeans.py):
    deterministic smallest-id seeds, 5 fixed rounds of broadcast-centroids +
    map-side partial sums, final nearest-centroid assignment. Oracle: literal
    VALUES table from an independent pure-Python longhand implementation
    (pipelines/oracle_literals.kmeans_sql — the golden-vector strategy)."""
    from rp_extract_ray.stages.kmeans import kmeans_assign, kmeans_lloyd

    from rp_extract_ray.sources.pqio import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    C = kmeans_lloyd(ds, n_clusters=8, n_iter=5)
    return kmeans_assign(ds, C).select_columns(["vec_id", "cluster"])


def q_knn_ivf(sf_dir: str, query_id: int = 7, k: int = 10):
    """IVF-bucketed similarity search (stages/simsearch.ivf_index/ivf_search):
    k-means list assignment + probed-list scan. Probing ALL lists makes the
    result exact, so the whole IVF mechanism — assignment, probe selection,
    list filter, per-batch partial top-k — is gated against the same
    list_cosine_similarity oracle as brute force. The scale path drops
    n_probe (recall measured in tests/test_text_dedup.py's IVF recall test)
    and reads a list_id-partitioned index via ivf_write/ivf_query."""
    from rp_extract_ray.stages.simsearch import ivf_index, ivf_search

    ds = _emb(sf_dir)
    q = (
        ds.map_batches(
            lambda b: b.filter(pa.compute.equal(b.column("vec_id"), query_id)),
            batch_format="pyarrow",
        )
        .to_pandas()["embedding"]
    )
    qv = np.asarray(list(q)[0], dtype=np.float64)
    assigned, C = ivf_index(ds, n_clusters=16)
    res = ivf_search(assigned, C, qv[None, :], k=k, n_probe=16)
    out = res[["vec_id", "cos"]].copy()
    from rp_extract_ray.functions.rounding import round_half_away

    out["cos"] = round_half_away(out["cos"].to_numpy(), 4)
    return out


def q_token_ids(sf_dir: str) -> Dataset:
    """Corpus-vocabulary token-id encoding (stages/textstage.encode_token_ids).
    Oracle: ordinality-exploded tokens LEFT JOIN a row_number()-ranked
    frequency vocabulary."""
    from rp_extract_ray.stages.textstage import encode_token_ids

    return encode_token_ids(
        _docs(sf_dir, ["doc_id", "text"]), vocab_size=1000
    )


def q_bigram_pmi(sf_dir: str) -> Dataset:
    """Corpus collocations: adjacent-token bigram PMI
    (stages/textstage.bigram_pmi). Oracle: pos+1 self-join over the
    ordinality-exploded tokens."""
    from rp_extract_ray.stages.textstage import bigram_pmi

    return bigram_pmi(_docs(sf_dir, ["doc_id", "text"]), min_count=5)


def q_boilerplate(sf_dir: str) -> Dataset:
    """Cross-document repeated word-5-grams with document frequencies
    (stages/textstage.boilerplate_ngrams). Oracle: list-slice grams +
    DISTINCT doc + HAVING."""
    from rp_extract_ray.stages.textstage import boilerplate_ngrams

    return boilerplate_ngrams(
        _docs(sf_dir, ["doc_id", "text"]), n=5, min_docs=2
    )


def q_curation(sf_dir: str) -> Dataset:
    """Composed curation filter — the end-to-end selection shape: quality
    score >= 0.5 AND length within the per-language [p10, p90] window, in
    one streaming pass over the corpus (score map -> tiny per-lang quantile
    aggregate -> broadcast cutoffs -> filter; zero shuffle on the big side).
    Oracle: the quality SQL replica composed with quantile_cont cutoffs."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.groupops import grouped_quantiles
    from rp_extract_ray.stages.join import broadcast_join
    from rp_extract_ray.stages.textstage import quality_score_batch

    ds = _docs(sf_dir, ["doc_id", "lang", "text"])

    def slim(b: pa.Table) -> pa.Table:
        scored = quality_score_batch(b)
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "lang": b.column("lang"),
                "quality": scored.column("quality"),
                "len": pc.utf8_length(b.column("text")).cast(pa.float64()),
            }
        )

    # two consumers (cutoff aggregate + the filter join): materialize so the
    # corpus scan + quality scoring run once, not once per consumer
    slimmed = ds.map_batches(slim, batch_format="pyarrow").materialize()
    cuts = grouped_quantiles(
        slimmed, "lang", "len", [0.10, 0.90], out_names=["lo", "hi"]
    ).select_columns(["lang", "lo", "hi"])
    joined = broadcast_join(slimmed, cuts, on="lang", value_cols=["lo", "hi"])

    def keep(b: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.greater_equal(b.column("quality"), 0.5),
            pc.and_(
                pc.greater_equal(b.column("len"), b.column("lo")),
                pc.less_equal(b.column("len"), b.column("hi")),
            ),
        )
        return b.filter(mask).select(["doc_id", "lang", "quality"])

    return joined.map_batches(keep, batch_format="pyarrow")


def q_nb_classify(sf_dir: str) -> Dataset:
    """Multinomial naive Bayes language classifier trained and scored on the
    corpus (classify.nb_train/nb_predict): two keyed count reductions, a
    broadcast model, one vectorized scoring pass. Oracle: the identical
    add-1-smoothed log-likelihood argmax in SQL."""
    from rp_extract_ray.classify import nb_predict, nb_train

    # three consumers (two training reductions + the scoring pass):
    # materialize so the corpus is read once (same rationale as q_curation)
    ds = _docs(sf_dir, ["doc_id", "lang", "text"]).materialize()
    model = nb_train(ds, text_col="text", label_col="lang")
    return nb_predict(ds, model, text_col="text", id_col="doc_id")


def q_repetition(sf_dir: str) -> Dataset:
    """Intra-doc 3-gram repetition ratio (Gopher-style quality signal).
    Oracle: list-slice grams, count vs count-distinct per doc."""
    from rp_extract_ray.stages.textstage import add_repetition_ratio

    ds = add_repetition_ratio(_docs(sf_dir, ["doc_id", "text"]), n=3)
    return ds.select_columns(["doc_id", "rep_ratio"])


def q_boilerplate_share(sf_dir: str) -> Dataset:
    """Per-doc fraction of 5-gram windows in the corpus boilerplate set
    (mine once -> broadcast -> one scoring pass). Oracle: the boilerplate
    CTE composed with a per-doc member-window count."""
    from rp_extract_ray.stages.textstage import add_boilerplate_share

    ds = add_boilerplate_share(
        _docs(sf_dir, ["doc_id", "text"]), n=5, min_docs=2
    )
    return ds.select_columns(["doc_id", "bp_share"])


def q_dedup_normalized(sf_dir: str) -> Dataset:
    """Near-exact dedup on canonicalized text (lower + whitespace collapse +
    trim); keeps min doc_id per class. Oracle: groupby the same regexp
    canonicalization."""
    from rp_extract_ray.stages.dedup import normalized_exact_dedup

    out = normalized_exact_dedup(_docs(sf_dir, ["doc_id", "text"]))
    return out.map_batches(
        lambda b: b.select(["doc_id", "n_dups"]).rename_columns(["doc_id", "n"]),
        batch_format="pyarrow",
    )


def q_char_entropy(sf_dir: str) -> Dataset:
    """Per-document character-distribution Shannon entropy
    (stages/textstage.char_entropy_batch — one np.unique over the
    batch-concatenated codepoints, reduceat fold per doc). Oracle: the
    same -SUM(p*log2 p) over an unnested char-count CTE."""
    from rp_extract_ray.stages.textstage import add_char_entropy

    ds = add_char_entropy(_docs(sf_dir, ["doc_id", "text"]))
    return ds.select_columns(["doc_id", "char_entropy"])


def q_edit_distance_pairs(sf_dir: str) -> Dataset:
    """Prefix-blocked exact Levenshtein near-dup pairs
    (stages/dedup.edit_distance_pairs + functions/editdist.py): one
    string-keyed exchange on the 16-char prefix, in-block pairwise verify
    over the first 200 chars, dist <= 20 emitted. Oracle: DuckDB
    ``levenshtein`` self-join on the same blocking key (byte == codepoint
    cost on this ASCII corpus)."""
    from rp_extract_ray.stages.dedup import edit_distance_pairs

    ds = _docs(sf_dir, ["doc_id", "text"])
    return edit_distance_pairs(
        ds, prefix=16, truncate=200, max_dist=20, num_partitions=16
    )


def q_embedding_covariance(sf_dir: str):
    """The d×d population covariance of the embedding corpus — the
    distributed surface of the PCA pipeline (stages/pca.py: one map pass
    of bounded (n, Σx, ΣxxT) partials, d² driver state). Oracle: DuckDB
    ``covar_pop`` over index-exploded embeddings."""
    from rp_extract_ray.sources.pqio import read_parquet_clean
    from rp_extract_ray.stages.pca import embedding_covariance

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    return embedding_covariance(ds)


def q_pca_variance(sf_dir: str, k: int = 8):
    """Top-k PCA eigenvalues (explained variance) of the embedding
    corpus. Eigenvalues are the STABLE gateable surface of this
    near-degenerate random spectrum (eigenvectors are not — see
    stages/pca.py); oracle: literal table from an independent pure-Python
    covariance + cyclic-Jacobi solver
    (pipelines/oracle_literals.pca_variance_sql)."""
    import pandas as pd

    from rp_extract_ray.functions.rounding import round_half_away
    from rp_extract_ray.sources.pqio import read_parquet_clean
    from rp_extract_ray.stages.pca import pca_fit

    ds = read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    _, w, _ = pca_fit(ds, k)
    return pd.DataFrame(
        {
            "rank": np.arange(k, dtype=np.int64),
            "eigval": round_half_away(w, 6),
        }
    )


def q_lm_score(sf_dir: str) -> Dataset:
    """Char-trigram LM cross-entropy per doc (stages/textstage.
    lm_trigram_score): corpus-fit add-one model, vocab-bounded broadcast,
    vectorized scoring. Oracle: the same count/smooth/avg expressed over a
    substr-exploded trigram CTE."""
    from rp_extract_ray.stages.textstage import lm_trigram_score

    return lm_trigram_score(_docs(sf_dir, ["doc_id", "text"]))


def q_knn_lsh(sf_dir: str, query_id: int = 7, k: int = 10):
    """Random-hyperplane LSH similarity search (stages/simsearch.
    lsh_index/lsh_search). Probing at max_hamming = n_planes covers every
    bucket, so the whole mechanism — plane assignment, multi-probe
    enumeration, bucket filter, partial top-k — is gated against the same
    exact list_cosine_similarity oracle as knn_cosine/knn_ivf; the scale
    path drops max_hamming (recall gated in tests)."""
    from rp_extract_ray.stages.simsearch import lsh_index, lsh_search

    ds = _emb(sf_dir)
    q = (
        ds.map_batches(
            lambda b: b.filter(pa.compute.equal(b.column("vec_id"), query_id)),
            batch_format="pyarrow",
        )
        .to_pandas()["embedding"]
    )
    qv = np.asarray(list(q)[0], dtype=np.float64)
    assigned, planes = lsh_index(ds, n_planes=8)
    res = lsh_search(assigned, planes, qv[None, :], k=k, max_hamming=8)
    out = res[["vec_id", "cos"]].copy()
    from rp_extract_ray.functions.rounding import round_half_away

    out["cos"] = round_half_away(out["cos"].to_numpy(), 4)
    return out


def q_hash_split(sf_dir: str) -> Dataset:
    """Deterministic 80/10/10 train/val/test assignment by doc_id hash
    (stages/splits.hash_split): zero shuffle, layout-independent — the
    oracle gates every row's assignment, not just split sizes."""
    from rp_extract_ray.stages.splits import hash_split

    ds = _docs(sf_dir, ["doc_id", "source"])
    return hash_split(
        ds, "doc_id", [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    )


def q_mix_weighted(sf_dir: str) -> Dataset:
    """Deterministic corpus mixing (stages/splits.weighted_mix): per-source
    Bernoulli downsampling to target weights — src0 kept at 90%, src1 at
    50%, src2 at 25%, everything else at 10%. Row-level hash gate, exactly
    replicated by the oracle's CASE + hash expression."""
    from rp_extract_ray.stages.splits import weighted_mix

    ds = _docs(sf_dir, ["doc_id", "source"])
    return weighted_mix(
        ds, "doc_id", "source",
        {"src0": 0.9, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
    )


def q_replicate_weighted(sf_dir: str) -> Dataset:
    """Deterministic upsampling (stages/splits.replicate_weighted): src0 at
    2.5x (every doc twice, a hash-chosen half a third time), src1 at 2x,
    everything else 1x. Expected multiplicity == weight; oracle replicates
    the repeat counts with UNNEST(range(reps))."""
    from rp_extract_ray.stages.splits import replicate_weighted

    ds = _docs(sf_dir, ["doc_id", "source"])
    return replicate_weighted(ds, "doc_id", "source", {"src0": 2.5, "src1": 2.0})


def q_domain_cap(sf_dir: str, cap: int = 10) -> Dataset:
    """Per-source document cap — the per-domain curation cap every crawl
    pipeline applies (keep at most N docs per domain, chosen by a
    deterministic hash order so the kept set is layout- and
    run-independent). Compose: hash column + grouped_topk (map-side
    per-group prune, one pruned exchange)."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.groupops import grouped_topk
    from rp_extract_ray.stages.splits import _hash32

    ds = _docs(sf_dir, ["doc_id", "source"])

    def add_h(b: pa.Table) -> pa.Table:
        k = b.column("doc_id").cast(pa.int64()).to_numpy(zero_copy_only=False)
        return b.append_column(
            "_h", pa.array(_hash32(k, 1).astype(np.int64))
        )

    capped = grouped_topk(
        ds.map_batches(add_h, batch_format="pyarrow"),
        "source",
        ["_h", "doc_id"],
        descending=False,
        k=cap,
    )
    return capped.drop_columns(["_h"])


def q_embedding_norms(sf_dir: str) -> Dataset:
    """Per-vector L2 norm over the embedding column — the standalone gate
    for the zero-copy list<float> -> (n, d) matrix kernel every similarity
    stage shares (stages/simsearch._as_matrix). Stateless vectorized map;
    oracle computes the same norm with DuckDB list kernels."""
    from rp_extract_ray.functions.rounding import round_half_away
    from rp_extract_ray.sources.pqio import read_parquet_clean
    from rp_extract_ray.stages.simsearch import _as_matrix

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )

    def norms(b: pa.Table) -> pa.Table:
        m = _as_matrix(b.column("embedding"))
        v = np.linalg.norm(m, axis=1)
        return pa.table(
            {
                "vec_id": b.column("vec_id"),
                "l2": pa.array(round_half_away(v, 6)),
            }
        )

    return ds.map_batches(norms, batch_format="pyarrow")


def q_dup_spans(sf_dir: str) -> Dataset:
    """Cross-document repeated-span counts (stages/dedup.dup_span_counts):
    per windowed doc, total 40-char windows and how many are substrings
    shared verbatim with at least one OTHER document — the span-level
    training-data dedup signal. Oracle: UNNEST(range()) window explode +
    min/max-doc HAVING + LEFT-JOIN count in SQL."""
    from rp_extract_ray.stages.dedup import dup_span_counts

    return dup_span_counts(_docs(sf_dir, ["doc_id", "text"]), width=40)


def q_bm25(sf_dir: str) -> Dataset:
    """BM25 relevance of every document against a fixed 4-term query
    (stages/tfidf.bm25_scores; Okapi BM25, Lucene idf, k1=1.2 b=0.75).
    Corpus stats (N, avgdl, per-term df) are the only coordination points,
    all bounded; scoring is per-block + one doc-keyed exchange. Oracle:
    the same formula spelled in SQL over the unnest tokenization."""
    from rp_extract_ray.stages.tfidf import bm25_scores

    ds = _docs(sf_dir, ["doc_id", "text"])
    return bm25_scores(ds, ["data", "join", "sort", "vector"])


def q_cdc_merge(sf_dir: str) -> "Dataset":
    """CDC merge / MERGE INTO: apply an ordered changelog (upserts +
    deletes) to a base snapshot and emit the final table — the
    incremental-ingest primitive (Delta/Iceberg MERGE shape), composed
    from the engine's own parts with ONE id-keyed exchange: base rows ride
    as version 0, changelog rows as their op version,
    stages/dedup.latest_per_key picks each id's newest row, and a final
    block filter drops delete tombstones. Changelog derived
    deterministically from the corpus (the corpus_diff convention):
    every 5th doc updated (text || '!') at v1, every 7th deleted at v2
    (deletes win over updates on ids divisible by both), every 11th
    re-added under a new id. Oracle: window row_number DESC over the
    unioned changelog + tombstone filter."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.dedup import latest_per_key

    ds = _docs(sf_dir, ["doc_id", "text"])

    def base(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "text": t.column("text"),
                "_v": pa.array(np.zeros(n, dtype=np.int64)),
                "_del": pa.array(np.zeros(n, dtype=bool)),
            }
        )

    def changes(t: pa.Table) -> pa.Table:
        did = t.column("doc_id").to_numpy(zero_copy_only=False)
        parts = []
        upd = t.filter(pa.array(did % 5 == 0))
        if len(upd):
            parts.append(
                pa.table(
                    {
                        "doc_id": upd.column("doc_id"),
                        "text": pc.binary_join_element_wise(
                            upd.column("text"), pa.scalar("!"), ""
                        ),
                        "_v": pa.array(np.ones(len(upd), dtype=np.int64)),
                        "_del": pa.array(np.zeros(len(upd), dtype=bool)),
                    }
                )
            )
        dels = t.filter(pa.array(did % 7 == 0))
        if len(dels):
            parts.append(
                pa.table(
                    {
                        "doc_id": dels.column("doc_id"),
                        "text": pa.array([None] * len(dels), pa.string()),
                        "_v": pa.array(np.full(len(dels), 2, dtype=np.int64)),
                        "_del": pa.array(np.ones(len(dels), dtype=bool)),
                    }
                )
            )
        ins = t.filter(pa.array(did % 11 == 0))
        if len(ins):
            new_id = ins.column("doc_id").to_numpy(
                zero_copy_only=False
            ) + 10_000_000
            parts.append(
                pa.table(
                    {
                        "doc_id": pa.array(new_id),
                        "text": pa.array(
                            ["new doc " + str(int(i)) for i in new_id - 10_000_000]
                        ),
                        "_v": pa.array(np.ones(len(ins), dtype=np.int64)),
                        "_del": pa.array(np.zeros(len(ins), dtype=bool)),
                    }
                )
            )
        if not parts:
            return pa.schema(
                [
                    pa.field("doc_id", pa.int64()),
                    pa.field("text", pa.string()),
                    pa.field("_v", pa.int64()),
                    pa.field("_del", pa.bool_()),
                ]
            ).empty_table()
        return pa.concat_tables(parts)

    def changelog(t: pa.Table) -> pa.Table:
        # ONE read: emit base rows + this block's changelog together —
        # branching the lazy read into two map pipelines and unioning
        # would execute the parquet scan twice
        return pa.concat_tables([base(t), changes(t)])

    merged = latest_per_key(
        ds.map_batches(changelog, batch_format="pyarrow"), "doc_id", ["_v"]
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t.column("_del")))
        return t.select(["doc_id", "text"])

    return merged.map_batches(finish, batch_format="pyarrow")


def q_keyword_totals(sf_dir: str):
    """Fixed-vocabulary keyword probe over the corpus
    (stages/textstage.keyword_totals): occurrences (substring semantics)
    + containing-doc count per keyword, zero shuffle (K-row partials per
    block, bounded driver sum). Oracle: length-difference substring
    count per (doc, keyword)."""
    from rp_extract_ray.stages.textstage import keyword_totals

    return keyword_totals(
        _docs(sf_dir, ["text"]), "text",
        ["spark", "join", "window", "hash", "scan"],
    )


def q_hashed_features(sf_dir: str) -> Dataset:
    """Hashing-trick feature vectors: in-vocabulary token ids folded into
    64 buckets (tid % 64), counted per (doc, bucket) — the fixed-width
    bag-of-words encoder (OOV dropped; the id space is the deterministic
    frequency vocabulary token_ids already gates, so the fold is
    SQL-expressible). Composes encode_token_ids with one bounded
    (doc, bucket) count exchange. Oracle: the token_ids CTE + modulo."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.groupops import grouped_reduce
    from rp_extract_ray.stages.textstage import encode_token_ids

    ids = encode_token_ids(_docs(sf_dir, ["doc_id", "text"]), vocab_size=1000)

    def fold(b: pa.Table) -> pa.Table:
        tid = b.column("token_id")
        keep = pc.greater(tid, 0)
        b = b.filter(keep)
        bucket = pc.cast(
            pc.subtract(
                b.column("token_id"),
                pc.multiply(
                    pc.divide(b.column("token_id"), 64), 64
                ),
            ),
            pa.int64(),
        )
        return pa.table({"doc_id": b.column("doc_id"), "bucket": bucket})

    folded = ids.map_batches(fold, batch_format="pyarrow")
    out = grouped_reduce(
        folded, ["doc_id", "bucket"], {"n": ("bucket", "count")},
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id"),
                "bucket": b.column("bucket"),
                "n": b.column("n").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_compression_ratio(sf_dir: str) -> Dataset:
    """Per-document zlib compression ratio
    (stages/textstage.compression_ratios) — the repetitiveness /
    information-density curation signal. Oracle: literal-table
    recompute (pipelines/oracle_literals.compression_sql — zlib has no
    SQL equivalent; the golden-vector doctest strategy)."""
    from rp_extract_ray.stages.textstage import compression_ratios

    return compression_ratios(
        _docs(sf_dir, ["doc_id", "text"]), "doc_id", "text"
    )


def q_top_terms_per_lang(sf_dir: str) -> Dataset:
    """Grouped text mining: top-5 tokens per language by count
    (deterministic (n DESC, token) tie order) — the per-group
    generalization of the global top_terms gate; token explode ->
    distinct (lang, token) count exchange -> map-side-pruned grouped
    top-k. Oracle: string_split UNNEST + row_number per lang."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.explode import explode_tokens
    from rp_extract_ray.stages.groupops import grouped_reduce, grouped_topk

    ds = _docs(sf_dir, ["lang", "text"])
    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("text"))),
        batch_format="pyarrow",
    )
    toks = explode_tokens(ds, text_col="text", id_col="lang")
    counts = grouped_reduce(
        toks.select_columns(["lang", "token"]),
        ["lang", "token"], {"n": ("token", "count")},
    )
    out = grouped_topk(
        counts, "lang", ["n", "token"], descending=[True, False], k=5
    )
    return out.map_batches(
        lambda b: pa.table(
            {
                "lang": b.column("lang"),
                "token": b.column("token"),
                "n": b.column("n").cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def q_embedding_drift(sf_dir: str) -> Dataset:
    """Consecutive-vector cosine drift: cos(e_i, e_{i+1}) under vec_id
    order — the corpus-evolution / embedding-stability probe (a vector
    LAG). Distributed as ONE keyed self-join (right side keyed on
    vec_id - 1 rides the task-shuffle exchange), then a per-partition
    matrix kernel (rowwise dot / norms, float64). Rounded to 4 dp like
    the other cosine gates (list_cosine_similarity precision). Oracle:
    self-join on vec_id + 1."""
    from rp_extract_ray.stages.join import repartition_join

    emb = _emb(sf_dir)

    def left_side(b: pa.Table) -> pa.Table:
        return pa.table(
            {"vec_id": b.column("vec_id"), "emb_a": b.column("embedding")}
        )

    def right_side(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "_k": pc.subtract(b.column("vec_id"), 1),
                "emb_b": b.column("embedding"),
            }
        )

    joined = repartition_join(
        emb.map_batches(left_side, batch_format="pyarrow"),
        emb.map_batches(right_side, batch_format="pyarrow"),
        on="vec_id", right_on="_k", how="inner",
        right_cols=["_k", "emb_b"],
    )

    def cos(pdf) -> pa.Table:
        import pandas as pd

        from rp_extract_ray.functions.rounding import round_half_away

        if len(pdf) == 0:
            return pa.table(
                {"vec_id": pa.array([], pa.int64()),
                 "drift": pa.array([], pa.float64())}
            )
        A = np.stack(pdf["emb_a"].to_numpy()).astype(np.float64)
        B = np.stack(pdf["emb_b"].to_numpy()).astype(np.float64)
        d = (A * B).sum(axis=1)
        na = np.sqrt((A * A).sum(axis=1))
        nb = np.sqrt((B * B).sum(axis=1))
        with np.errstate(invalid="ignore", divide="ignore"):
            c = d / (na * nb)
        return pa.table(
            {
                "vec_id": pa.array(
                    pdf["vec_id"].to_numpy(dtype=np.int64)
                ),
                "drift": pa.array(round_half_away(c, 4)),
            }
        )

    return joined.map_batches(cos, batch_format="pandas")


def q_sorted_neighborhood(sf_dir: str) -> Dataset:
    """Sorted-neighborhood blocking candidates over documents ordered by
    (n_chars, doc_id) — rank-window <= 3 pairs
    (stages/dedup.sorted_neighborhood_pairs; the composite sort key packs
    as n_chars << 32 | doc_id, exact for ids < 2^31). Oracle: row_number
    rank + rank-distance self-join."""
    import pyarrow.compute as pc

    from rp_extract_ray.stages.dedup import sorted_neighborhood_pairs

    ds = _docs(sf_dir, ["doc_id", "n_chars"])

    def pack_key(b: pa.Table) -> pa.Table:
        nc = b.column("n_chars").cast(pa.int64())
        did = b.column("doc_id").cast(pa.int64())
        key = pc.bit_wise_or(pc.shift_left(nc, 32), did)
        return pa.table({"_key": key, "doc_id": b.column("doc_id")})

    return sorted_neighborhood_pairs(
        ds.map_batches(pack_key, batch_format="pyarrow"),
        "_key", "doc_id", window=3,
    )
