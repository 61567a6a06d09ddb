"""Text analysis stages over document tables: token counting, quality
scoring, n-gram language ID, document fingerprinting.

Large-scale training-data-pipeline extensions (round-1 brief): each stage is
a vectorized ``map_batches``; language-ID holds compiled n-gram profiles in
actor state (loaded once per actor, ST2 pattern,
/root/reference/rp_classify.py:126-158)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset

from rp_extract_ray.functions.rounding import round_half_away
from rp_extract_ray.stages.turns import TOKEN_PATTERN


def _r6(v):
    return round_half_away(v, 6)

# Tiny per-language character/trigram profiles — a deterministic heuristic
# (public-knowledge approach: rank-order n-gram profiles a la Cavnar-Trenkle).
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" th", "the", "he ", " an", "and", "ing", " of", "ion", "tio", " to"),
    "de": ("en ", "er ", " de", "der", "ie ", "ein", "sch", "ich", "nde", "die"),
    "fr": (" de", "es ", "de ", " le", "ent", "le ", "la ", " la", "tio", "ne "),
    "es": (" de", "de ", "os ", " la", "la ", "el ", " el", "ión", "ent", "as "),
    "zh": tuple("的一是不了人在有我他这中大来上国个到说们为子和你地"),
}


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    text = pc.fill_null(batch.column(text_col), "")
    n_tokens = pc.cast(pc.count_substring_regex(text, TOKEN_PATTERN), pa.int64())
    n_ws_tokens = pc.cast(
        pc.count_substring_regex(text, r"\S+"), pa.int64()
    )  # whitespace tokenization
    return batch.append_column("n_tokens", n_tokens).append_column(
        "n_ws_tokens", n_ws_tokens
    )


# whole-word stopword matches; RE2 on BOTH sides (Arrow count_substring_regex
# here, DuckDB regexp_extract_all in the oracle) so counts agree exactly
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "be", "this",
)
STOPWORD_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"


def quality_score_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Length / character-class / stopword ratios (the M25-filter analogue
    for text corpora): alpha_ratio, digit_ratio, space_ratio, punct_ratio,
    stopword_ratio, mean_word_len, plus a composite quality in [0,1]."""
    text = pc.fill_null(batch.column(text_col), "")
    n = pc.cast(pc.utf8_length(text), pa.int64())
    n_np = np.maximum(n.to_numpy(zero_copy_only=False), 1).astype(np.float64)
    n_alpha = pc.count_substring_regex(text, r"[a-zA-Z]").to_numpy(zero_copy_only=False)
    n_digit = pc.count_substring_regex(text, r"[0-9]").to_numpy(zero_copy_only=False)
    n_space = pc.count_substring_regex(text, r"\s").to_numpy(zero_copy_only=False)
    n_punct = pc.count_substring_regex(text, r"[^a-zA-Z0-9\s]").to_numpy(
        zero_copy_only=False
    )
    n_words = np.maximum(
        pc.count_substring_regex(text, r"\S+").to_numpy(zero_copy_only=False), 1
    )
    lower = pc.utf8_lower(text)
    n_tok = np.maximum(
        pc.count_substring_regex(lower, r"[a-z0-9_]+").to_numpy(zero_copy_only=False),
        1,
    )
    n_stop = pc.count_substring_regex(lower, STOPWORD_RE).to_numpy(
        zero_copy_only=False
    )
    alpha_ratio = n_alpha / n_np
    digit_ratio = n_digit / n_np
    space_ratio = n_space / n_np
    punct_ratio = n_punct / n_np
    stopword_ratio = n_stop / n_tok
    mean_word_len = (n_np - n_space) / n_words
    quality = np.clip(
        0.5 * alpha_ratio
        + 0.3 * np.clip(space_ratio / 0.2, 0, 1)
        + 0.2 * (1.0 - np.clip(digit_ratio / 0.3, 0, 1)),
        0.0,
        1.0,
    )
    for name, v in (
        ("alpha_ratio", alpha_ratio),
        ("digit_ratio", digit_ratio),
        ("space_ratio", space_ratio),
        ("punct_ratio", punct_ratio),
        ("stopword_ratio", stopword_ratio),
        ("mean_word_len", mean_word_len),
        ("quality", quality),
    ):
        batch = batch.append_column(name, pa.array(_r6(v)))
    return batch


def char_entropy_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Per-document Shannon entropy (bits) of the character distribution —
    the randomness/quality scalar that separates natural prose (≈4 bits),
    repeated boilerplate (low), and encoded blobs / base64 dumps (high,
    flat distribution). A curation-filter feature alongside
    :func:`quality_score_batch`.

    Vectorized across the whole batch, no per-row loop: every document's
    codepoints land in ONE uint64 array (utf-32 decode of the concatenated
    batch text), tagged with the doc index in the high bits; a single
    ``np.unique`` over the composite key yields all (doc, char) counts at
    once, and the per-doc ``-Σ p·log2 p`` folds with ``np.add.reduceat``
    on the doc boundaries. Empty/null documents get 0.0."""
    text = pc.fill_null(batch.column(text_col), "")
    n_docs = len(text)
    lens = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    joined = "".join(text.to_pylist())
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    ent = np.zeros(n_docs, dtype=np.float64)
    if len(cps):
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.uint64), lens)
        # codepoints < 2^21; doc index in the bits above keeps the composite
        # key unique and sorted-by-doc after np.unique
        key = (doc_idx << np.uint64(21)) | cps
        uniq, counts = np.unique(key, return_counts=True)
        u_doc = (uniq >> np.uint64(21)).astype(np.int64)
        p = counts.astype(np.float64) / lens[u_doc]
        contrib = -p * np.log2(p)
        bounds = np.flatnonzero(np.diff(u_doc)) + 1
        sums = np.add.reduceat(contrib, np.concatenate([[0], bounds]))
        ent[u_doc[np.concatenate([[0], bounds])]] = sums
    return batch.append_column("char_entropy", pa.array(_r6(ent)))


def add_char_entropy(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        lambda b: char_entropy_batch(b, text_col), batch_format="pyarrow"
    )


class LangId:
    """n-gram-profile language classifier; profiles compiled once per actor.

    Scoring is ONE pass over the batch's UTF-8 byte stream per distinct
    gram byte-length (two here: ASCII trigrams / CJK chars are 3 bytes,
    'ión' is 4) instead of one ``str.count`` regex pass per gram (~50 in
    round 2). Sound because no profile gram self-overlaps (no proper prefix
    equals a suffix, so overlapping == non-overlapping counts) and UTF-8 is
    self-synchronizing (an encoded gram never matches at a misaligned byte
    offset inside other characters). Texts are joined with an
    ``0xFF 0xFF 0xFF`` separator — 0xFF never occurs in valid UTF-8, and any
    window spanning two texts covers a separator byte, so there are no
    cross-text false matches."""

    _SEP = 3  # separator bytes between texts; must be >= max gram bytes - 1

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.langs = list(_LANG_PROFILES)
        # per gram byte-length: (sorted unique codes, per-code lang rows)
        by_len: dict[int, dict[int, np.ndarray]] = {}
        for j, grams in enumerate(_LANG_PROFILES.values()):
            for g in grams:
                gb = g.encode("utf-8")
                assert len(gb) - 1 <= self._SEP, f"gram {g!r} too long"
                code = int.from_bytes(gb, "big")
                row = by_len.setdefault(len(gb), {}).setdefault(
                    code, np.zeros(len(_LANG_PROFILES), dtype=np.float64)
                )
                row[j] += 1.0
        self.tables = []
        for L, cm in sorted(by_len.items()):
            codes = np.array(sorted(cm), dtype=np.int64)
            inc = np.stack([cm[c] for c in sorted(cm)])
            prefixes = sorted({(c >> (8 * (L - 2))) & 0xFFFF for c in cm})
            self.tables.append((L, codes, inc, prefixes))

    # direct-mapped trigram table: code -> code_idx+1 (uint8; 16 MiB, built
    # lazily ONCE PER WORKER PROCESS — not serialized into the task closure)
    _LUT3_CACHE: dict = {}

    @classmethod
    def _lut3(cls, code_tab: np.ndarray) -> np.ndarray:
        key = code_tab.tobytes()
        lut = cls._LUT3_CACHE.get(key)
        if lut is None:
            assert len(code_tab) < 255
            lut = np.zeros(1 << 24, dtype=np.uint8)
            lut[code_tab] = np.arange(1, len(code_tab) + 1, dtype=np.uint8)
            cls._LUT3_CACHE[key] = lut
        return lut

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[self.text_col].fillna("").str.lower()
        n = len(texts)
        scores = np.zeros((n, len(self.langs)), dtype=np.float64)
        if n:
            encoded = [t.encode("utf-8") for t in texts]
            buf = np.frombuffer((b"\xff" * self._SEP).join(encoded), dtype=np.uint8)
            lens = np.fromiter((len(e) for e in encoded), np.int64, count=n)
            starts = np.concatenate([[0], np.cumsum(lens[:-1] + self._SEP)])
            for L, code_tab, inc, prefixes in self.tables:
                if len(buf) < L:
                    continue
                m = len(buf) - L + 1
                if L == 3:
                    # int32 shift-OR + one direct-mapped gather per position
                    codes = (
                        (buf[:-2].astype(np.int32) << 16)
                        | (buf[1:-1].astype(np.int32) << 8)
                        | buf[2:]
                    )
                    vals = self._lut3(code_tab)[codes]
                    pos = np.flatnonzero(vals)
                    code_idx = vals[pos].astype(np.int64) - 1
                else:
                    # longer grams are rare: cheap uint8 2-byte-prefix scan,
                    # then exact codes only at candidate positions
                    cand = np.zeros(m, dtype=bool)
                    for p in prefixes:
                        cand |= (buf[:m] == (p >> 8)) & (buf[1 : m + 1] == (p & 0xFF))
                    pos = np.flatnonzero(cand)
                    if len(pos) == 0:
                        continue
                    codes = np.zeros(len(pos), dtype=np.int64)
                    for o in range(L):
                        codes |= buf[pos + o].astype(np.int64) << (8 * (L - 1 - o))
                    idx = np.searchsorted(code_tab, codes)
                    idx[idx == len(code_tab)] = 0
                    keep = code_tab[idx] == codes
                    pos, code_idx = pos[keep], idx[keep]
                if len(pos):
                    text_idx = np.searchsorted(starts, pos, side="right") - 1
                    # one bincount per language beats np.add.at's scatter
                    for j in range(len(self.langs)):
                        scores[:, j] += np.bincount(
                            text_idx, weights=inc[code_idx, j], minlength=n
                        )
        total = np.maximum(scores.sum(axis=1), 1e-9)
        best = scores.argmax(axis=1)
        batch["lang_pred"] = np.array(self.langs)[best]
        # round_half_away, not np.round: the DuckDB oracle rounds half away
        batch["lang_conf"] = round_half_away(
            scores[np.arange(n), best] / total, 6
        )
        batch.loc[scores.max(axis=1) == 0, "lang_pred"] = "unk"
        return batch


def add_token_counts(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        token_count_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )


def add_quality_scores(ds: Dataset, text_col: str = "text") -> Dataset:
    return ds.map_batches(
        quality_score_batch, batch_format="pyarrow", fn_kwargs={"text_col": text_col}
    )


def add_langid(ds: Dataset, text_col: str = "text", concurrency=None) -> Dataset:
    """Stateless tasks: the profile tables are tiny and ship in the
    closure, so the stage scales to every free CPU (an explicit
    ``concurrency`` switches back to an actor pool)."""
    if concurrency is not None:
        return ds.map_batches(
            LangId, batch_format="pandas",
            fn_constructor_kwargs={"text_col": text_col}, concurrency=concurrency,
        )
    clf = LangId(text_col=text_col)
    return ds.map_batches(clf.__call__, batch_format="pandas")


def add_fingerprints(ds: Dataset, text_col: str = "text") -> Dataset:
    """Winnowing-style rolling-hash fingerprints + simhash per document.

    SimHash is computed by the batch kernel (one hash pass + one reduceat
    over the batch's concatenated token stream); the per-doc loop holds only
    the C-vectorized shingle hash of the winnowing fingerprint."""
    from rp_extract_ray.functions.hashing import (
        rolling_fingerprint,
        simhash64_batch,
        tokens_hash_batch,
    )
    import re

    tok = re.compile(r"\w+", re.ASCII)

    def fingerprint_batch(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch[text_col].fillna("")
        batch["fingerprint"] = [
            rolling_fingerprint(t).astype(np.int64) for t in texts
        ]
        toks = [np.array(tok.findall(t.lower()), dtype=object) for t in texts]
        flat, counts = tokens_hash_batch(toks)
        batch["simhash"] = simhash64_batch(flat, counts).astype(np.int64)
        return batch

    # stateless tasks: compiled pattern ships in the closure; scales to all CPUs
    return ds.map_batches(fingerprint_batch, batch_format="pandas")


def encode_token_ids(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 1000,
    oov_id: int = 0,
):
    """Text -> integer token-id sequences (the LM-training encode step).

    Corpus-frequency vocabulary: tokens are lowercased ``[0-9a-z_]+`` runs
    (same lexer as ``pipelines.relational.q_top_terms``); the top
    ``vocab_size`` by (count desc, token asc) get ids 1..V in rank order,
    everything else maps to ``oov_id``. Output: one row per token —
    ``(id_col, pos, token_id)`` with 1-based positions — the exploded
    (hashable, shardable) layout rather than list columns.

    Scale design: vocab building is map-side-combined counts + a pruned
    top-k exchange (``distributed_topk`` — O(k) rows per block); the vocab
    dict is ``ray.put`` once and read per worker; the encode itself is one
    vectorized ``map_batches`` pass (findall -> offsets -> pandas categorical
    map), no shuffle. The vocab is the broadcastable small state — same
    pattern as stages/kmeans.py centroids.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray

    from rp_extract_ray.pipelines.relational import distributed_topk

    def count_partial(tbl: pa.Table) -> pa.Table:
        batch = tbl.to_pandas()
        toks = batch[text_col].fillna("").str.lower().str.findall(r"[0-9a-z_]+")
        flat = pd.Series(np.concatenate(toks.to_numpy()) if len(toks) else [])
        vc = flat.value_counts()
        # arrow out: the token reduce downstream sorts these blocks
        return pa.table(
            {"token": pa.array(vc.index.to_numpy(), pa.string()),
             "n": pa.array(vc.to_numpy().astype(np.int64))}
        )

    from rp_extract_ray.stages.groupops import grouped_reduce

    counted = grouped_reduce(
        ds.select_columns([text_col]).map_batches(
            count_partial, batch_format="pyarrow"
        ),
        "token", {"n": ("n", "sum")}, combine_first=False,
    )
    vocab = distributed_topk(counted, ["n", "token"], [True, False], vocab_size)
    mapping = {t: i + 1 for i, t in enumerate(vocab["token"])}
    map_ref = ray.put(mapping)

    def encode(batch: pd.DataFrame) -> pa.Table:
        m = ray.get(map_ref)
        toks = batch[text_col].fillna("").str.lower().str.findall(r"[0-9a-z_]+")
        lens = toks.str.len().to_numpy(dtype=np.int64)
        ids = np.repeat(batch[id_col].to_numpy(), lens)
        ends = np.cumsum(lens)
        pos = np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64) - np.repeat(
            ends - lens, lens
        ) + 1
        flat = pd.Series(
            np.concatenate(toks.to_numpy()) if lens.sum() else [], dtype=object
        )
        tid = flat.map(m).fillna(oov_id).astype(np.int64).to_numpy()
        return pa.table(
            {id_col: pa.array(ids), "pos": pa.array(pos), "token_id": pa.array(tid)}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        encode, batch_format="pandas"
    )


def bigram_pmi(
    ds,
    *,
    text_col: str = "text",
    min_count: int = 5,
    round_to: int = 4,
):
    """Collocation mining: adjacent-token bigrams scored by pointwise mutual
    information ``ln(n_ab * N_uni / (n_a * n_b))`` over the corpus — the
    phrase-detection step (word2vec-style phrase joining / tokenizer merge
    candidates). Tokens are the shared ``[0-9a-z_]+`` lexer.

    Scale design: unigram and bigram counts are map-side combined per batch
    (two tiny frames per block), merged by two small ``groupby(token)``
    exchanges; the PMI join attaches unigram counts to bigrams via the same
    keyed exchange. Nothing row-level ever shuffles. Returns a Dataset
    ``(w1, w2, n_ab, pmi)`` for bigrams with ``n_ab >= min_count``.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rp_extract_ray.stages.join import broadcast_join
    from rp_extract_ray.stages.partition import partitioned_apply

    def partial(batch: pd.DataFrame, what: str) -> pd.DataFrame:
        toks = batch[text_col].fillna("").str.lower().str.findall(r"[0-9a-z_]+")
        arrs = toks.to_numpy()
        if what == "uni":
            flat = pd.Series(np.concatenate(arrs) if len(arrs) else [])
            vc = flat.value_counts()
            return pd.DataFrame({"w": vc.index.to_numpy(), "n": vc.to_numpy()})
        # vectorized adjacent pairs: concat all docs, drop pairs that
        # straddle a doc boundary (the last token of each doc)
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        total = int(lens.sum())
        if total < 2:
            return pd.DataFrame(
                {"w1": [], "w2": [], "n_ab": pd.Series([], dtype=np.int64),
                 "_bk": pd.Series([], dtype=object)}
            )
        flat = np.concatenate([a for a in arrs if len(a)])
        keep = np.ones(total - 1, dtype=bool)
        ends = np.cumsum(lens[lens > 0])[:-1]  # doc boundaries inside flat
        keep[ends - 1] = False
        df = pd.DataFrame({"w1": flat[:-1][keep], "w2": flat[1:][keep]})
        g = df.groupby(["w1", "w2"], sort=False).size().reset_index(name="n_ab")
        g["n_ab"] = g["n_ab"].astype(np.int64)
        # surrogate exchange key (0x1f never appears in [0-9a-z_] tokens)
        g["_bk"] = g["w1"] + "\x1f" + g["w2"]
        return g

    # partial counts merge through the engine's keyed exchange + reduceat —
    # Ray's sort-based groupby.aggregate measured 8.3 s on 57k two-string-key
    # partial rows at sf0.1 (and ~4 s fixed cost even on 31 keys) where this
    # path is sub-second per exchange
    def merge_bi(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        if not len(pdf):
            return pdf.drop(columns=["_bk"], errors="ignore")
        run_starts = np.unique(starts)  # starts is PER-ROW (entity_starts)
        out = pd.DataFrame(
            {
                "w1": pdf["w1"].to_numpy()[run_starts],
                "w2": pdf["w2"].to_numpy()[run_starts],
                "n_ab": np.add.reduceat(pdf["n_ab"].to_numpy(), run_starts),
            }
        )
        return out[out["n_ab"] >= min_count]

    from rp_extract_ray.stages.groupops import grouped_reduce

    from rp_extract_ray.stages.partition import arrow_out

    # partials declared pyarrow so the two keyed exchanges sort arrow blocks
    uni = grouped_reduce(
        ds.select_columns([text_col]).map_batches(
            lambda b: arrow_out(partial(b.to_pandas(), "uni")),
            batch_format="pyarrow",
        ),
        "w", {"n": ("n", "sum")}, combine_first=False,
    )
    bi = partitioned_apply(
        ds.select_columns([text_col]).map_batches(
            lambda b: arrow_out(partial(b.to_pandas(), "bi")),
            batch_format="pyarrow",
        ),
        merge_bi, entity_col="_bk", order_cols=(),
    )
    # unigram counts are vocabulary-sized: broadcast them onto the bigram
    # stream twice instead of two hash-shuffle joins (zero extra exchanges,
    # and immune to Ray's empty-hash-partition schema loss on small inputs)
    uni_pdf = uni.to_pandas()
    n_uni_total = int(uni_pdf["n"].sum())
    j = broadcast_join(bi, uni_pdf.rename(columns={"n": "n_a"}), on="w1", small_on="w")
    j = broadcast_join(j, uni_pdf, on="w2", small_on="w")

    def score(b: pa.Table) -> pa.Table:
        from rp_extract_ray.functions.rounding import round_half_away

        n_ab = b.column("n_ab").to_numpy(zero_copy_only=False).astype(np.float64)
        n_a = b.column("n_a").to_numpy(zero_copy_only=False).astype(np.float64)
        n_b = b.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = np.log(n_ab * float(n_uni_total) / (n_a * n_b))
        return pa.table(
            {
                "w1": b.column("w1"),
                "w2": b.column("w2"),
                "n_ab": b.column("n_ab").cast(pa.int64()),
                "pmi": pa.array(round_half_away(pmi, round_to)),
            }
        )

    return j.map_batches(score, batch_format="pyarrow")


def _doc_ngram_windows(texts, n: int):
    """Shared per-batch word n-gram window builder for the miners below:
    returns ``(doc_pos, grams, wins, nonzero_positions)`` where ``grams``
    are the space-joined n-gram strings of every window that starts AND
    ends inside one document, ``doc_pos`` the batch-row position of each
    window's document, and ``wins`` the window count per nonzero-token doc
    (aligned with ``nonzero_positions``). Returns None when the batch has
    fewer than ``n`` tokens total. One place for the boundary-mask index
    arithmetic (used by boilerplate_ngrams / add_repetition_ratio /
    add_boilerplate_share)."""
    toks = texts.fillna("").str.lower().str.findall(r"[0-9a-z_]+")
    arrs = toks.to_numpy()
    lens = np.array([len(a) for a in arrs], dtype=np.int64)
    total = int(lens.sum())
    if total < n:
        return None
    flat = np.concatenate([np.asarray(a, dtype=object) for a in arrs if len(a)])
    m = total - n + 1
    gram = flat[:m].copy()
    for k in range(1, n):
        gram = gram + " "
        gram = gram + flat[k : m + k]
    # window must start and end inside one document
    starts_of = np.concatenate([[0], np.cumsum(lens[lens > 0])[:-1]])
    ends_of = np.cumsum(lens[lens > 0])
    keep = np.zeros(m, dtype=bool)
    for s_, e_ in zip(starts_of, ends_of):
        if e_ - s_ >= n:
            keep[s_ : e_ - n + 1] = True
    nonzero = np.flatnonzero(lens > 0)
    wins = np.maximum(lens[lens > 0] - n + 1, 0)
    doc_pos = np.repeat(nonzero, wins)
    return doc_pos, gram[keep], wins, nonzero


def boilerplate_ngrams(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
):
    """Cross-document repeated n-gram detection (C4-style boilerplate miner):
    word ``n``-grams occurring in >= ``min_docs`` DISTINCT documents, with
    their document frequencies — the shared-span candidates a curation
    pipeline strips or down-weights.

    Scale design: grams are built vectorized (object-array string adds over
    ``n`` shifted views of the concatenated token stream, boundary windows
    masked out), deduplicated per document INSIDE the batch (a document is
    one row, so batch-local dedup is exact document-level dedup), partial
    doc-frequency counts combine map-side, and one ``groupby(gram)``
    exchange carries only per-block gram counts.
    """
    import numpy as np
    import pandas as pd

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        w = _doc_ngram_windows(batch[text_col], n)
        if w is None:
            return pd.DataFrame(
                {"gram": [], "n_docs": pd.Series([], dtype=np.int64)}
            )
        doc_pos, grams, _, _ = w
        d = pd.DataFrame(
            {"_doc": batch[id_col].to_numpy()[doc_pos], "gram": grams}
        )
        d = d.drop_duplicates()
        vc = d["gram"].value_counts()
        return pd.DataFrame(
            {"gram": vc.index.to_numpy(), "n_docs": vc.to_numpy().astype(np.int64)}
        )

    # merge partials with the engine's own keyed exchange + a reduceat
    # kernel: Ray's sort-based groupby.aggregate measured 37 s on 250k
    # distinct string keys at sf0.1 where this path takes ~2 s
    from rp_extract_ray.stages.partition import partitioned_apply

    def merge(pdf: pd.DataFrame, starts: np.ndarray) -> pd.DataFrame:
        if not len(pdf):
            return pdf
        run_starts = np.unique(starts)  # starts is PER-ROW (entity_starts)
        sums = np.add.reduceat(pdf["n_docs"].to_numpy(), run_starts)
        out = pd.DataFrame(
            {"gram": pdf["gram"].to_numpy()[run_starts], "n_docs": sums}
        )
        return out[out["n_docs"] >= min_docs]

    from rp_extract_ray.stages.partition import arrow_out

    parts = ds.select_columns([id_col, text_col]).map_batches(
        lambda b: arrow_out(partial(b.to_pandas())), batch_format="pyarrow"
    )
    return partitioned_apply(parts, merge, entity_col="gram", order_cols=())


def add_repetition_ratio(
    ds,
    *,
    text_col: str = "text",
    n: int = 3,
    out_col: str = "rep_ratio",
    round_to: int = 6,
):
    """Intra-document repetition: ``1 - distinct_ngrams / total_ngrams``
    over word ``n``-grams — the Gopher/C4-family quality signal for
    loop/copy-paste degeneration (0 = no repeated n-gram, -> 1 = one n-gram
    repeated throughout). Documents shorter than ``n`` tokens score 0.

    Pure map (zero shuffle): per batch, grams are built from ``n`` shifted
    object-array views and counted per doc with one unique() pass over
    (doc, gram) pairs.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from rp_extract_ray.functions.rounding import round_half_away

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        ratio = np.zeros(len(batch), dtype=np.float64)
        w = _doc_ngram_windows(batch[text_col], n)
        if w is not None:
            doc_pos, grams, wins, nonzero = w
            d = pd.DataFrame({"_p": doc_pos, "_g": grams})
            nd = d.drop_duplicates().groupby("_p", sort=False).size()
            tot_by = pd.Series(wins, index=nonzero)
            r = 1.0 - nd / tot_by.loc[nd.index]
            ratio[nd.index.to_numpy()] = r.to_numpy()
        batch[out_col] = round_half_away(ratio, round_to)
        return batch

    return ds.map_batches(f, batch_format="pandas")


def add_boilerplate_share(
    ds,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    min_docs: int = 2,
    out_col: str = "bp_share",
    round_to: int = 6,
):
    """Per-document boilerplate load: the fraction of the doc's word
    ``n``-gram windows that belong to the corpus cross-document repeated
    set (:func:`boilerplate_ngrams` at ``min_docs``) — the filter-stage
    composition: mine the shared set once, broadcast it, score every doc in
    one streaming pass. Docs with fewer than ``n`` tokens score 0."""
    import numpy as np
    import pandas as pd

    import ray

    # two consumers (the miner and the scoring pass): read/score once
    ds = ds.materialize()
    bp = boilerplate_ngrams(
        ds.select_columns([id_col, text_col]),
        text_col=text_col, id_col=id_col, n=n, min_docs=min_docs,
    ).to_pandas()  # bounded by the min_docs cut
    bp_ref = ray.put(set(bp["gram"].tolist()))

    from rp_extract_ray.functions.rounding import round_half_away

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        wanted = ray.get(bp_ref)
        share = np.zeros(len(batch), dtype=np.float64)
        w = _doc_ngram_windows(batch[text_col], n)
        if w is not None:
            doc_pos, grams, _, _ = w
            hit = pd.Series(grams).isin(wanted).to_numpy()
            hits_by = np.bincount(doc_pos, weights=hit, minlength=len(batch))
            tot_by = np.bincount(doc_pos, minlength=len(batch))
            nz = tot_by > 0
            share[nz] = hits_by[nz] / tot_by[nz]
        batch[out_col] = round_half_away(share, round_to)
        return batch

    return ds.map_batches(f, batch_format="pandas")


# ---------------------------------------------------------------------------
# PII redaction — the pre-training scrub pass. RE2 on both sides (Arrow
# replace/count_substring_regex and DuckDB regexp_* are both RE2 with
# non-overlapping leftmost matches), so the SQL oracle replicates exactly.
# ---------------------------------------------------------------------------

REDACT_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("url", r"https?://\S+", "<URL>"),
    ("phone", r"\+?\d[\d\-\s()]{7,}\d", "<PHONE>"),
)


def redact_pii(ds: Dataset, text_col: str = "text") -> Dataset:
    """Replace emails/URLs/phone-shaped spans with typed placeholder tokens
    and count the matches per document.

    Counts are taken on the ORIGINAL text; replacements apply sequentially
    in ``REDACT_PATTERNS`` order (both facts the oracle mirrors). Pure
    narrow vectorized map — zero shuffle; the natural stage to fuse in
    front of dedup/quality in a curation pipeline."""

    def f(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column(text_col), "")
        red = txt
        for name, pat, repl in REDACT_PATTERNS:
            b = b.append_column(
                f"n_{name}s",
                pc.cast(pc.count_substring_regex(txt, pat), pa.int64()),
            )
            red = pc.replace_substring_regex(red, pat, repl)
        return b.set_column(
            b.schema.get_field_index(text_col), text_col, red
        )

    return ds.map_batches(f, batch_format="pyarrow")


def _pack_char_trigrams(texts: pa.ChunkedArray | pa.Array):
    """(doc_idx, packed_keys) for every char trigram fully inside one doc
    of the batch — the char-level sibling of :func:`_doc_ngram_windows`.
    Three consecutive codepoints pack into ONE int64 (21 bits each,
    codepoints < 2^21), so counting is np.unique over ints and the model
    broadcast is two flat arrays. Vectorized: one utf-32 decode of the
    concatenated batch text + three shifted views."""
    text = pc.fill_null(texts, "")
    lens = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
    joined = "".join(text.to_pylist())
    cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
    total = len(cps)
    if total < 3:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    m = total - 2
    keys = (cps[:m] << np.uint64(42)) | (cps[1 : m + 1] << np.uint64(21)) | cps[2 : m + 2]
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)[:m]
    # window must end inside the same doc: start positions whose doc has
    # >= 3 remaining chars
    ends = np.cumsum(lens)
    starts = ends - lens
    keep = np.zeros(m, dtype=bool)
    for s_, e_ in zip(starts, ends):
        if e_ - s_ >= 3:
            keep[s_ : e_ - 2] = True
    return doc_idx[keep], keys[keep].astype(np.int64)


def lm_trigram_score(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    num_partitions: int = 32,
) -> Dataset:
    """Character-trigram language-model quality score per document —
    the classic LM-based curation filter (CCNet/Gopher family use a
    KenLM; this is the self-contained n-gram equivalent): fit P(g) =
    (count(g)+1) / (total+V) over the corpus (add-one smoothing), score
    each doc as the mean -log2 P(g) over its trigram instances (cross
    entropy, bits/gram; lower = more typical text). Docs with < 3 chars
    score 0.

    Scale shape: pass 1 is per-block packed-int partial counts through
    ONE keyed exchange (grouped_reduce), and only the TRUE-vocab-sized
    (gram, count) table — bounded by distinct trigrams, not corpus size —
    reaches the driver and broadcasts as two flat arrays; pass 2 is a
    vectorized searchsorted lookup + reduceat mean per batch. Unseen
    grams (scoring a corpus the model was not fit on) take the smoothed
    floor log2(1/(total+V))."""
    import ray

    from rp_extract_ray.functions.rounding import round_half_away
    from rp_extract_ray.stages.groupops import grouped_reduce

    def partial(b: pa.Table) -> pa.Table:
        _, keys = _pack_char_trigrams(b.column(text_col))
        if len(keys) == 0:
            return pa.table(
                {"g": pa.array([], pa.int64()), "c": pa.array([], pa.int64())}
            )
        uniq, cnt = np.unique(keys, return_counts=True)
        return pa.table({"g": pa.array(uniq), "c": pa.array(cnt.astype(np.int64))})

    vocab = grouped_reduce(
        ds.map_batches(partial, batch_format="pyarrow"),
        "g", {"c": ("c", "sum")},
        combine_first=False, num_partitions=num_partitions,
    ).to_pandas()  # bounded by the distinct-trigram vocabulary
    keys = vocab["g"].to_numpy(dtype=np.int64)
    order = np.argsort(keys)
    keys = keys[order]
    counts = vocab["c"].to_numpy(dtype=np.float64)[order]
    total, V = counts.sum(), float(len(counts))
    logp = np.log2((counts + 1.0) / (total + V))
    floor = np.log2(1.0 / (total + V))
    ref = ray.put((keys, logp, floor))

    def score(b: pa.Table) -> pa.Table:
        ks, lp, fl = ray.get(ref)
        doc_idx, gk = _pack_char_trigrams(b.column(text_col))
        out = np.zeros(len(b), dtype=np.float64)
        if len(gk) and len(ks) == 0:
            # scoring against an empty model (fit corpus had no trigrams):
            # every gram takes the smoothed floor
            bounds = np.flatnonzero(np.diff(doc_idx)) + 1
            starts_ = np.concatenate([[0], bounds])
            out[doc_idx[starts_]] = -fl
        elif len(gk):
            pos = np.searchsorted(ks, gk)
            pos_c = np.minimum(pos, len(ks) - 1)
            vals = np.where(ks[pos_c] == gk, lp[pos_c], fl)
            bounds = np.flatnonzero(np.diff(doc_idx)) + 1
            starts_ = np.concatenate([[0], bounds])
            sums = np.add.reduceat(vals, starts_)
            cnts = np.diff(np.concatenate([starts_, [len(vals)]]))
            out[doc_idx[starts_]] = -sums / cnts
        return pa.table(
            {
                id_col: b.column(id_col),
                "lm_score": pa.array(round_half_away(out, 6) + 0.0),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def keyword_totals(
    ds: Dataset,
    text_col: str,
    keywords: "Sequence[str]",
) -> pd.DataFrame:
    """Corpus totals for a fixed keyword list: occurrence count (substring
    semantics) and number of containing documents per keyword — the
    vocabulary-probe / contamination-screen shape (the bounded complement
    of top_terms' open-vocabulary miner). One zero-shuffle map pass:
    ``pyarrow.compute.count_substring`` per keyword per block (K vectorized
    kernels, no tokenization), K-row partials, bounded driver sum.
    NULL texts are skipped (SQL WHERE text IS NOT NULL parity)."""
    import pyarrow.compute as pc

    kws = list(keywords)

    def partial(b: pa.Table) -> pa.Table:
        txt = b.column(text_col)
        if pa.types.is_null(txt.type):  # all-null block arrives untyped
            txt = txt.cast(pa.string())
        ok = pc.is_valid(txt)
        tot, nd = [], []
        for k in kws:
            c = pc.count_substring(txt, pattern=k)
            c = pc.if_else(ok, c, pa.scalar(None, c.type))
            tot.append(pc.sum(c).as_py() or 0)
            nd.append(
                pc.sum(
                    pc.cast(pc.greater(c, 0), pa.int64())
                ).as_py()
                or 0
            )
        return pa.table(
            {
                "keyword": pa.array(kws),
                "total": pa.array(tot, pa.int64()),
                "n_docs": pa.array(nd, pa.int64()),
            }
        )

    parts = (
        ds.select_columns([text_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    out = parts.groupby("keyword", sort=False).sum().reset_index()
    # preserve caller order
    out["_o"] = out["keyword"].map({k: i for i, k in enumerate(kws)})
    out = out.sort_values("_o", ignore_index=True).drop(columns="_o")
    out["total"] = out["total"].astype(np.int64)
    out["n_docs"] = out["n_docs"].astype(np.int64)
    return out


def compression_ratios(
    ds: Dataset,
    id_col: str,
    text_col: str,
    *,
    level: int = 6,
    round_to: int | None = 6,
) -> Dataset:
    """Per-document zlib compression ratio — the repetitiveness /
    information-density quality signal (highly compressible text is
    boilerplate or degenerate repetition; a standard training-data
    filter). Zero shuffle: one stateless map pass; the per-doc C zlib
    call is the work, the loop is just dispatch (same shape as the
    per-doc regex miners). NULL text -> NULL outputs.

    Output: ``(id, raw_len, comp_len, ratio)`` with ``ratio =
    comp_len / raw_len`` over UTF-8 bytes (NULL for empty/NULL text).
    """
    import zlib

    def fn(b: pa.Table) -> pa.Table:
        txt = b.column(text_col)
        if pa.types.is_null(txt.type):
            txt = txt.cast(pa.string())
        py = txt.to_pylist()
        n = len(py)
        raw = np.zeros(n, dtype=np.int64)
        comp = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i, t in enumerate(py):
            if t:
                bs = t.encode("utf-8")
                raw[i] = len(bs)
                comp[i] = len(zlib.compress(bs, level))
                ok[i] = True
        with np.errstate(invalid="ignore", divide="ignore"):
            ratio = np.where(ok, comp / np.maximum(raw, 1), np.nan)
        if round_to is not None:
            ratio = round_half_away(ratio, round_to)
        valid = pa.array(ok)
        return pa.table(
            {
                id_col: b.column(id_col),
                "raw_len": pc.if_else(
                    valid, pa.array(raw), pa.scalar(None, pa.int64())
                ),
                "comp_len": pc.if_else(
                    valid, pa.array(comp), pa.scalar(None, pa.int64())
                ),
                "ratio": pa.array(ratio),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow"
    )
