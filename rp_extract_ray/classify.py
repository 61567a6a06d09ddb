"""Train / score seam — the analogue of the reference's rp_classify.

The reference trains an sklearn linear SVC on the (small, driver-side)
feature matrix and scores new data row-by-row with a loaded model
(/root/reference/rp_classify.py:46-71, 126-158, 297-325). sklearn is not in
this environment, so the estimator is a from-scratch numpy multinomial
logistic regression — the SWAP POINT is preserved: anything exposing
``fit(X, y)`` / ``predict_scores(X)`` plugs into the same train/score seam
(reference §2.10 "classifier swap points").

Scale design unchanged from the reference's (correct) choice: training runs
on the driver over a materialized (small) feature table (ST3); SCORING is the
distributed part — an actor pool that deserializes the model once per actor
(``__init__``) and scores whole Arrow batches (ST2,
/root/reference/rp_classify.py:126-158 -> map_batches ActorPool).
Artifacts (model + scaler + label codes) are one pickle, like the
reference's model/scaler/labelencoder triple (:110-122).
"""

from __future__ import annotations

import pickle

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from rp_extract_ray.functions.stats import standardize_params


class LogisticModel:
    """Multinomial logistic regression, plain numpy full-batch gradient
    descent. Deterministic (fixed init, fixed iteration count)."""

    def __init__(self, n_iter: int = 300, lr: float = 0.5, l2: float = 1e-4):
        self.n_iter, self.lr, self.l2 = n_iter, lr, l2
        self.W: np.ndarray | None = None  # (D+1, C)

    def fit(self, X: np.ndarray, y: np.ndarray) -> "LogisticModel":
        n, d = X.shape
        classes = int(y.max()) + 1
        Xb = np.hstack([X, np.ones((n, 1))])
        W = np.zeros((d + 1, classes))
        Y = np.eye(classes)[y]
        for _ in range(self.n_iter):
            logits = Xb @ W
            logits -= logits.max(axis=1, keepdims=True)
            P = np.exp(logits)
            P /= P.sum(axis=1, keepdims=True)
            grad = Xb.T @ (P - Y) / n + self.l2 * W
            W -= self.lr * grad
        self.W = W
        return self

    def predict_scores(self, X: np.ndarray) -> np.ndarray:
        Xb = np.hstack([X, np.ones((X.shape[0], 1))])
        return Xb @ self.W


class FeatureClassifier:
    """scaler + estimator + label codes bundle (the reference's pickle
    triple, /root/reference/rp_classify.py:110-158)."""

    def __init__(self, model=None):
        self.model = model or LogisticModel()
        self.mean: np.ndarray | None = None
        self.std: np.ndarray | None = None
        self.labels: list[str] | None = None

    # -- train (driver-side on a small materialized table; ST3) -----------
    def fit(self, X: np.ndarray, labels: np.ndarray) -> "FeatureClassifier":
        X = np.asarray(X, dtype=np.float64)
        self.labels = sorted(set(map(str, labels)))  # deterministic encoding (M27)
        code = {l: i for i, l in enumerate(self.labels)}
        y = np.array([code[str(l)] for l in labels])
        self.mean, self.std = standardize_params(X.mean(axis=0), X.var(axis=0))
        self.model.fit((X - self.mean) / self.std, y)
        return self

    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        if X.shape[1] != len(self.mean):
            # dimension check at predict time (/root/reference/rp_classify.py:313-315)
            raise ValueError(f"feature dim {X.shape[1]} != scaler dim {len(self.mean)}")
        scores = self.model.predict_scores((X - self.mean) / self.std)
        return np.array(self.labels)[scores.argmax(axis=1)]

    def accuracy(self, X: np.ndarray, labels: np.ndarray) -> float:
        return float((self.predict(X) == np.array(list(map(str, labels)))).mean())

    # -- persistence -------------------------------------------------------
    def save(self, path: str) -> None:
        with open(path, "wb") as f:
            pickle.dump(
                {"model": self.model, "mean": self.mean, "std": self.std,
                 "labels": self.labels}, f)

    @classmethod
    def load(cls, path: str) -> "FeatureClassifier":
        with open(path, "rb") as f:
            d = pickle.load(f)
        obj = cls(model=d["model"])
        obj.mean, obj.std, obj.labels = d["mean"], d["std"], d["labels"]
        return obj


def cross_validate(
    clf_factory, X: np.ndarray, labels: np.ndarray, folds: int = 10, seed: int = 0
) -> tuple[float, float]:
    """k-fold CV accuracy mean/std (/root/reference/rp_classify.py:74-106)."""
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(X))
    accs = []
    for f in range(folds):
        test = idx[f::folds]
        train = np.setdiff1d(idx, test)
        clf = clf_factory().fit(X[train], labels[train])
        accs.append(clf.accuracy(X[test], labels[test]))
    return float(np.mean(accs)), float(np.std(accs))


def train_on_dataset(
    ds: Dataset, vec_col: str, label_col: str, model=None
) -> FeatureClassifier:
    """Materialize the (small) training table and fit — the reference's
    explicit design point: training is driver-side, scoring distributes."""
    pdf = ds.select_columns([vec_col, label_col]).to_pandas()
    X = np.stack(pdf[vec_col].to_numpy())
    return FeatureClassifier(model=model).fit(X, pdf[label_col].to_numpy())


def score_dataset(
    ds: Dataset,
    clf: FeatureClassifier,
    vec_col: str,
    out_col: str = "pred",
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> Dataset:
    """Distributed scoring: model broadcast once, deserialized per actor
    (ST2). Vectorized per Arrow batch."""
    ref = ray.put(clf)

    class Scorer:
        def __init__(self):
            self.clf = ray.get(ref)  # once per actor

        def __call__(self, b: pa.Table) -> pa.Table:
            col = b.column(vec_col)
            X = np.asarray(col.combine_chunks().flatten()).reshape(
                len(b), col.type.list_size
            )
            return b.append_column(out_col, pa.array(self.clf.predict(X)))

    return ds.map_batches(
        Scorer, batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency
    )


def align_predictions(
    pred: Dataset,
    truth: Dataset,
    *,
    on: str = "id",
    strip: bool = True,
    lower: bool = False,
    num_partitions: int | None = None,
) -> Dataset:
    """Align a prediction table with a ground-truth table on normalized id
    (J6 — /root/reference/classes_io.py:389-416 align_predictions_and_
    groundtruth).

    Reference semantics preserved: (a) the two tables must carry IDENTICAL
    column names (else ValueError); (b) ids are matched after optional
    path/ext stripping and lowercasing; (c) only matched ids survive, both
    sides aligned row-for-row. Ray-native shape: instead of two reindexed
    frames, ONE distributed hash join keyed by the normalized id — truth
    columns carry the ``_truth`` suffix; nothing materializes driver-side.
    """
    import pyarrow.compute as pc

    from rp_extract_ray.functions.ids import strip_ids

    pred_cols = list(pred.schema().names)
    truth_cols = list(truth.schema().names)
    if pred_cols != truth_cols:
        raise ValueError(
            f"column names in groundtruth and predictions do not match: "
            f"{pred_cols} != {truth_cols}"
        )
    if on not in pred_cols:
        raise ValueError(f"id column {on!r} missing")
    if num_partitions is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        num_partitions = max(2, cpus // 2)

    def norm(b: pa.Table) -> pa.Table:
        key = b.column(on)
        if strip:
            key = strip_ids(key)
        if lower:
            key = pc.utf8_lower(key)
        i = b.column_names.index(on)
        return b.set_column(i, on, key)

    from rp_extract_ray.stages.partition import arrow_clean

    left = arrow_clean(pred.map_batches(norm, batch_format="pyarrow"))
    right = arrow_clean(truth.map_batches(norm, batch_format="pyarrow"))
    return left.join(
        right, "inner", num_partitions, on=(on,), right_suffix="_truth"
    )


# ---------------------------------------------------------------------------
# Multinomial naive Bayes over token counts — the from-scratch generative
# counterpart of the KNN classifier above (ST2/ST3): training is two keyed
# count reductions (map-side combined), the model is broadcastable small
# state, scoring is one vectorized map pass. Add-1 (Laplace) smoothing over
# the training vocabulary.
# ---------------------------------------------------------------------------


def nb_train(
    ds,
    *,
    text_col: str = "text",
    label_col: str = "lang",
    token_re: str = r"[0-9a-z_]+",
):
    """Train: returns (labels, priors_ln, token_index, logprob_matrix,
    default_row) where logprob_matrix is (V, L) ln((n_lt + 1)/(tot_l + V))
    and default_row is the unseen-token column ln(1/(tot_l + V))."""
    import numpy as np
    import pandas as pd

    from rp_extract_ray.stages.groupops import grouped_reduce

    def tok_partial(pdf: pd.DataFrame) -> pd.DataFrame:
        toks = pdf[text_col].fillna("").str.lower().str.findall(token_re)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        lab = np.repeat(pdf[label_col].to_numpy(), lens)
        flat = np.concatenate(toks.to_numpy()) if lens.sum() else np.array([], object)
        d = pd.DataFrame({"label": lab, "token": flat})
        g = d.groupby(["label", "token"], sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    from rp_extract_ray.stages.partition import arrow_out

    ct = grouped_reduce(
        ds.select_columns([label_col, text_col]).map_batches(
            lambda b: arrow_out(tok_partial(b.to_pandas())),
            batch_format="pyarrow",
        ),
        ["label", "token"],
        {"n": ("n", "sum")},
        combine_first=False,
    ).to_pandas()  # bounded: |vocab| x |labels|

    pri = grouped_reduce(
        ds.select_columns([label_col]), label_col,
        {"n_docs": (label_col, "count")},
    ).to_pandas().sort_values(label_col, ignore_index=True)

    labels = pri[label_col].tolist()
    n_total = float(pri["n_docs"].sum())
    priors_ln = np.log(pri["n_docs"].to_numpy(np.float64) / n_total)

    vocab = sorted(ct["token"].unique())
    V = len(vocab)
    tix = {t: i for i, t in enumerate(vocab)}
    lix = {l: j for j, l in enumerate(labels)}
    counts = np.zeros((V, len(labels)), dtype=np.float64)
    counts[
        ct["token"].map(tix).to_numpy(np.int64),
        ct["label"].map(lix).to_numpy(np.int64),
    ] = ct["n"].to_numpy(np.float64)
    totals = counts.sum(axis=0)
    logprob = np.log((counts + 1.0) / (totals + V)[None, :])
    default_row = np.log(1.0 / (totals + V))
    return labels, priors_ln, tix, logprob, default_row


def nb_predict(
    ds,
    model,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "pred",
    token_re: str = r"[0-9a-z_]+",
):
    """Score with the broadcast model; ties resolve to the first (lowest)
    label in sorted order — pinned so the SQL oracle can reproduce them."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray

    labels, priors_ln, tix, logprob, default_row = model
    ref = ray.put((labels, priors_ln, tix, logprob, default_row))

    def score(pdf: pd.DataFrame) -> pa.Table:
        labs, pri, t_ix, lp, dflt = ray.get(ref)
        toks = pdf[text_col].fillna("").str.lower().str.findall(token_re)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        n = len(pdf)
        flat = (
            np.concatenate(toks.to_numpy()) if lens.sum() else np.array([], object)
        )
        idx = pd.Series(flat, dtype=object).map(t_ix)
        known = idx.notna().to_numpy()
        rows = np.where(known, idx.fillna(0).to_numpy(np.int64), 0)
        tokmat = np.where(known[:, None], lp[rows], dflt[None, :])
        scores = np.tile(pri, (n, 1))
        if len(flat):
            # per-doc segment sums via reduceat — NOT batch-wide prefix-sum
            # differences, whose ~1e-6-scale cancellation error varies with
            # batch composition and can flip a near-tie argmax across
            # partitionings. reduceat on an empty segment (zero-token doc)
            # returns the NEXT doc's leading value, so those rows are
            # zeroed explicitly.
            nz = lens > 0
            starts_ = (np.cumsum(lens) - lens)[nz]
            seg = np.add.reduceat(tokmat, starts_, axis=0)
            scores[nz] += seg
        pred = np.asarray(labs, dtype=object)[scores.argmax(axis=1)]
        return pa.table(
            {id_col: pa.array(pdf[id_col].to_numpy()), out_col: pa.array(pred)}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pandas"
    )
