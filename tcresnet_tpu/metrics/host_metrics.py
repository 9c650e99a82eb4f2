"""Host-side metric battery (sklearn/numpy) over full eval arrays.

Reference parity: metrics/ops/non_tensor_ops.py:15-388 and
metrics/funcs.py:4-20 — mAP (macro/micro/weighted/samples), accuracy,
top-5 accuracy, per-class precision/recall/F1/AP, classification report.
Computed from gathered (scores[N,C], labels[N]) after a full eval pass,
exactly as the reference aggregated session.run outputs on CPU.
"""

from __future__ import annotations

import warnings
from typing import Dict, Optional, Sequence

import numpy as np


def top_k_accuracy(scores: np.ndarray, labels: np.ndarray, k: int = 5) -> float:
    """Own top-k impl, matching metrics/funcs.py:4-20 incl. ties.

    The reference takes argsort(-scores)[:, :k] (stable ascending over
    negated scores), which breaks ties toward the LOWEST class index; a
    plain argsort(scores)[:, -k:] would keep the highest-index tie
    members instead. Deviation: k is clamped to the class count (the
    reference asserts scores.shape[1] >= k)."""
    k = min(k, scores.shape[1])
    topk = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return float(np.mean(np.any(topk == labels[:, None], axis=1)))


def compute_classification_metrics(
    scores: np.ndarray,
    labels: np.ndarray,
    label_names: Optional[Sequence[str]] = None,
    use_class_metrics: bool = False,
    include_report: bool = False,
) -> Dict[str, float]:
    """Full metric battery from softmax scores + integer labels.

    `use_class_metrics` adds per-class P/R/F1/AP (the reference enables
    these when num labels < 10, metrics/manager.py:9-46).
    """
    from sklearn import metrics as skm

    num_classes = scores.shape[1]
    preds = scores.argmax(axis=1)
    onehot = np.eye(num_classes, dtype=np.float32)[labels]

    out: Dict[str, float] = {}
    out["accuracy"] = float(np.mean(preds == labels))
    out["top5_accuracy"] = top_k_accuracy(scores, labels, 5)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        for average in ("macro", "micro", "weighted", "samples"):
            try:
                out[f"mAP_{average}"] = float(
                    skm.average_precision_score(onehot, scores, average=average)
                )
            except ValueError:
                out[f"mAP_{average}"] = float("nan")

        if use_class_metrics:
            names = list(label_names) if label_names else [
                str(i) for i in range(num_classes)
            ]
            p, r, f1, _ = skm.precision_recall_fscore_support(
                labels, preds, labels=range(num_classes), zero_division=0
            )
            for i, name in enumerate(names):
                out[f"precision/{name}"] = float(p[i])
                out[f"recall/{name}"] = float(r[i])
                out[f"f1/{name}"] = float(f1[i])
                try:
                    out[f"AP/{name}"] = float(
                        skm.average_precision_score(onehot[:, i], scores[:, i])
                    )
                except ValueError:
                    out[f"AP/{name}"] = float("nan")

    if include_report:
        names = list(label_names) if label_names else None
        present = sorted(set(labels.tolist()) | set(preds.tolist()))
        out["classification_report"] = skm.classification_report(  # type: ignore
            labels,
            preds,
            labels=present,
            target_names=[names[i] for i in present] if names else None,
            zero_division=0,
        )
    return out


def confusion_matrix(
    preds: np.ndarray, labels: np.ndarray, num_classes: int
) -> np.ndarray:
    cm = np.zeros((num_classes, num_classes), np.int64)
    np.add.at(cm, (labels, preds), 1)
    return cm
