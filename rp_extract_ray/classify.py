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

    left = pred.map_batches(norm, batch_format="pyarrow")
    right = truth.map_batches(norm, batch_format="pyarrow")
    return left.join(
        right, "inner", num_partitions, on=(on,), right_suffix="_truth"
    )
