"""Train / predict CLI — the rp_classify entry-point analogue.

Reference lifecycle (/root/reference/rp_classify.py §3.2/§3.3 in SURVEY.md):
``rp_classify.py -t <features> <model>`` trains (features + class file ->
scaler + estimator + label codes pickle); ``rp_classify.py <features>
[model] [out]`` predicts and writes an id->label table. Here the feature
table is the engine's native Parquet (id + fixed-size-list vector; CSV
interchange also accepted via sources/csvio), training is driver-side on
the materialized small table (ST3 — the reference's own design point) and
SCORING is the distributed actor-pool stage (ST2).

    python tools/run_classify.py train   --features f.parquet \
        --classfile labels.tsv --model m.pkl [--cv 10]
    python tools/run_classify.py predict --features f.parquet \
        --model m.pkl --out predictions.tsv

This script OWNS its Ray session (guarded init); the library never does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _read_features(path: str):
    import ray.data as rd

    from rp_extract_ray.sources.csvio import read_feature_csv

    if path.endswith(".csv"):
        return read_feature_csv(path)
    return rd.read_parquet(path)


def cmd_train(args) -> dict:
    from rp_extract_ray.classify import FeatureClassifier, cross_validate
    from rp_extract_ray.sources.csvio import read_class_file
    from rp_extract_ray.stages.join import broadcast_join

    feats = _read_features(args.features)
    labels = read_class_file(args.classfile)
    joined = broadcast_join(
        feats, labels, on=args.id_col, small_on="id", value_cols=["label"],
        normalize_ids={"cut_path": True, "cut_ext": True} if args.strip_ids else None,
    ).to_pandas()
    import numpy as np

    X = np.stack(joined[args.vec_col].to_numpy())
    y = joined["label"].to_numpy()
    clf = FeatureClassifier().fit(X, y)
    clf.save(args.model)
    out = {"rows": len(joined), "classes": clf.labels, "model": args.model,
           "train_accuracy": round(clf.accuracy(X, y), 4)}
    if args.cv:
        mean, std = cross_validate(FeatureClassifier, X, y, folds=args.cv)
        out["cv_accuracy_mean"], out["cv_accuracy_std"] = round(mean, 4), round(std, 4)
    return out


def cmd_predict(args) -> dict:
    import pandas as pd

    from rp_extract_ray.classify import FeatureClassifier, score_dataset
    from rp_extract_ray.sources.csvio import write_class_file

    clf = FeatureClassifier.load(args.model)
    feats = _read_features(args.features)
    scored = score_dataset(feats, clf, args.vec_col, out_col="label")
    pdf = scored.to_pandas()[[args.id_col, "label"]].rename(
        columns={args.id_col: "id"}
    )
    write_class_file(pdf, args.out)
    return {"rows": len(pdf), "out": args.out,
            "label_counts": pdf["label"].value_counts().to_dict()}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    tr = sub.add_parser("train")
    tr.add_argument("--features", required=True)
    tr.add_argument("--classfile", required=True)
    tr.add_argument("--model", required=True)
    tr.add_argument("--cv", type=int, default=0)
    tr.add_argument("--id-col", default="id")
    tr.add_argument("--vec-col", default="vec")
    tr.add_argument("--strip-ids", action="store_true")
    pr = sub.add_parser("predict")
    pr.add_argument("--features", required=True)
    pr.add_argument("--model", required=True)
    pr.add_argument("--out", required=True)
    pr.add_argument("--id-col", default="id")
    pr.add_argument("--vec-col", default="vec")
    args = ap.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    result = cmd_train(args) if args.cmd == "train" else cmd_predict(args)
    print(json.dumps(result))
    if owns:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
