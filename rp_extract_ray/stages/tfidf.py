"""Distributed TF-IDF: corpus-wide inverse document frequency joined back
onto per-document term frequencies, with a per-document top-k term select.

The canonical "characteristic terms per document" op for corpus curation /
near-dup triage (reference analogue: the reference's global vocabulary-head
path, SURVEY.md §2.7 argmax family — this is its keyed, corpus-statistics
generalization).

Scale design (the 100-TB shape):

* the (doc, token) term-frequency table is built by ONE ``map_batches`` pass
  (vectorized findall + per-batch groupby-size); one row per DISTINCT
  (doc, token) — the raw token stream never leaves the task.
* document frequency is a map-side combine (per-batch ``value_counts`` over
  the already-distinct doc-token rows) followed by a small ``groupby(token)``
  sum — the exchange carries one row per distinct token per block, not one
  per occurrence.
* the df table joins back via the hash-partitioned big-big ``hash_join``
  (both sides keyed by token); no broadcast assumption on vocabulary size.
* the final per-document top-k uses ``grouped_topk``'s map-side pruned
  exchange — at most k rows per (doc, block) shuffle to the doc's reducer.
* the doc-token table feeds two consumers (df aggregation + join probe), so
  it is materialized ONCE to the object store (pruned 4-column rows), the
  same multi-consumer-lineage rule as minhash (stages/dedup.py).

Ties: ``tfidf`` is rounded (round-half-away, == SQL ``round``) BEFORE
ranking and broken by token text, so engine and SQL-oracle orderings agree
exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Sum

from rp_extract_ray.functions.rounding import round_half_away
from rp_extract_ray.stages.groupops import grouped_topk
from rp_extract_ray.stages.join import hash_join

TOKEN_RE = r"[0-9a-z_]+"


def doc_token_counts(
    docs: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    pattern: str = TOKEN_RE,
) -> Dataset:
    """One row per distinct (doc, token): ``cnt`` occurrences in the doc,
    ``n_doc`` total tokens in the doc. Documents with zero tokens emit no
    rows (matching SQL's unnest semantics)."""

    def explode(tbl: pa.Table):
        from rp_extract_ray.stages.partition import arrow_out

        # declared pyarrow (downstream token exchange stays on arrow
        # blocks); only the two needed columns cross into pandas
        batch = tbl.select([id_col, text_col]).to_pandas()
        toks = batch[text_col].fillna("").str.lower().str.findall(pattern)
        lens = toks.str.len().to_numpy()
        ids = batch[id_col].to_numpy()
        if lens.sum() == 0:
            return arrow_out(pd.DataFrame(
                {id_col: ids[:0], "token": np.array([], dtype=object),
                 "cnt": np.array([], dtype=np.int64),
                 "n_doc": np.array([], dtype=np.int64)}
            ))
        flat = pd.DataFrame(
            {
                id_col: np.repeat(ids, lens),
                "token": np.concatenate(
                    [np.asarray(t, dtype=object) for t in toks]
                ),
            }
        )
        out = (
            flat.groupby([id_col, "token"], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        out["cnt"] = out["cnt"].astype(np.int64)
        out["n_doc"] = (
            out[id_col].map(pd.Series(lens, index=ids)).astype(np.int64)
        )
        return arrow_out(out)

    return docs.map_batches(explode, batch_format="pyarrow")


def document_frequency(doc_tokens: Dataset) -> Dataset:
    """(token, df_n): number of documents containing each token. Input rows
    are already distinct per (doc, token), so df is a row count per token —
    map-side combined before the exchange."""

    def partial(b: pa.Table) -> pa.Table:
        vc = pc.value_counts(b.column("token").combine_chunks())
        return pa.table(
            {
                "token": vc.field("values"),
                "df_n": vc.field("counts").cast(pa.int64()),
            }
        )

    return (
        doc_tokens.map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("df_n", alias_name="df_n"))
    )


def tfidf_top_terms(
    docs: Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    round_to: int = 6,
    num_partitions: int | None = None,
) -> Dataset:
    """Top-``k`` TF-IDF terms per document.

    tfidf = (cnt / n_doc) * ln(N / df) with N = total documents (including
    empty ones) — plain unsmoothed idf, non-negative since df <= N.
    """
    n_docs = float(docs.count())  # parquet-metadata count on a plain read
    tc = doc_token_counts(
        docs, text_col=text_col, id_col=id_col
    ).materialize()  # two consumers below; pruned 4-column rows only
    # vocab table is one row per distinct token — materialize (bounded by
    # vocabulary size) so its count is free, and CAP the join partitions by
    # that count: an EMPTY hash partition loses its schema and breaks the
    # join (same ~50k-rows-per-partition rule as stages/dedup.py)
    df_tab = document_frequency(tc).materialize()
    n_vocab = int(df_tab.count())
    if n_vocab <= 200_000:
        # small vocabulary: broadcast the df table into every task — zero
        # shuffle (the J3 dict-lookup path)
        from rp_extract_ray.stages.join import broadcast_join

        joined = broadcast_join(tc, df_tab, on="token")
    else:
        if num_partitions is None:
            import ray

            cpus = int(ray.cluster_resources().get("CPU", 8))
            num_partitions = max(2, cpus // 2)
        joined = hash_join(
            tc,
            df_tab,
            on="token",
            num_partitions=max(2, min(num_partitions, n_vocab // 50_000 + 2)),
        )

    def score(b: pa.Table) -> pa.Table:
        cnt = b.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        n_doc = b.column("n_doc").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        df_n = b.column("df_n").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        tfidf = (cnt / n_doc) * np.log(n_docs / df_n)
        return pa.table(
            {
                id_col: b.column(id_col),
                "token": b.column("token"),
                "tfidf": pa.array(round_half_away(tfidf, round_to)),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    return grouped_topk(
        scored, id_col, ["tfidf", "token"], descending=[True, False], k=k
    )


def bm25_scores(
    docs: Dataset,
    query_terms: "list[str] | tuple[str, ...]",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_to: int = 6,
    score_col: str = "bm25",
) -> Dataset:
    """BM25 relevance of every document against a fixed query-term set —
    the retrieval-ranking twin of :func:`tfidf_top_terms` (Okapi BM25 with
    the Lucene non-negative idf, ``ln(1 + (N - df + .5)/(df + .5))``).

    Scale design: corpus statistics are the only coordination points and
    all are bounded — N is a parquet-metadata count, avgdl is ONE map-side
    summed float (total tokens / N, token-less docs counted in the
    denominator), per-term df is a tiny |query| -row reduce collected once
    and closed over (broadcast with the task closure; the query set is the
    bounded side by construction). Scoring is then a pure per-block kernel
    over the (doc, term) rows filtered to query terms, map-side combined
    into ONE doc-keyed exchange. Documents containing no query term emit
    nothing (SQL join semantics) — LEFT-fill zeros downstream if a dense
    score column is needed.
    """
    qset = sorted(set(query_terms))
    n_docs = float(docs.count())  # metadata count on a plain parquet read
    # two consumers (total-token sum + query-term prune): materialize the
    # pruned 4-column (doc, token) rows once, the tfidf_top_terms rule
    tc = doc_token_counts(docs, text_col=text_col, id_col=id_col).materialize()

    def prune(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t.column("token"), value_set=pa.array(qset))
        return t.filter(mask)

    # (doc, query-term) rows only — two consumers (df reduce + scoring),
    # and the prune typically drops >99% of the term table
    qtc = tc.map_batches(prune, batch_format="pyarrow").materialize()

    total_tokens = tc.map_batches(
        lambda t: pa.table(
            {"s": pa.array([pc.sum(t.column("cnt")).as_py() or 0], pa.int64())}
        ),
        batch_format="pyarrow",
    ).sum("s")
    avgdl = float(total_tokens) / n_docs

    df_tab = document_frequency(qtc).to_pandas()  # <= |query| rows
    idf = {
        t: float(np.log1p((n_docs - d + 0.5) / (d + 0.5)))
        for t, d in zip(df_tab["token"], df_tab["df_n"])
    }

    def score(t: pa.Table) -> pa.Table:
        cnt = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
        dl = t.column("n_doc").to_numpy(zero_copy_only=False).astype(np.float64)
        # idf looked up per UNIQUE token (<= |query|), broadcast by inverse
        # index — no per-row Python work in the scoring pass
        toks = t.column("token").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(toks, return_inverse=True)
        w = np.array([idf.get(x, 0.0) for x in uniq], dtype=np.float64)[inv]
        s = w * cnt * (k1 + 1.0) / (cnt + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table({id_col: t.column(id_col), "_s": pa.array(s)})

    from rp_extract_ray.stages.groupops import grouped_reduce

    out = grouped_reduce(
        qtc.map_batches(score, batch_format="pyarrow"),
        id_col,
        {score_col: ("_s", "sum")},
    )

    def finish(t: pa.Table) -> pa.Table:
        v = round_half_away(
            t.column(score_col).to_numpy(zero_copy_only=False), round_to
        )
        return t.set_column(
            t.column_names.index(score_col), score_col, pa.array(v)
        )

    return out.map_batches(finish, batch_format="pyarrow")
