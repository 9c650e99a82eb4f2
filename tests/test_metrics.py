"""Host metric battery tests (reference: metrics/ops/non_tensor_ops.py)."""

import numpy as np

from tcresnet_tpu.metrics.host_metrics import (
    compute_classification_metrics,
    confusion_matrix,
    top_k_accuracy,
)
from tcresnet_tpu.metrics.writers import crossed_boundary, should_write_summary


def test_top_k():
    scores = np.asarray([
        [0.1, 0.2, 0.7],   # label 2 -> top1 hit
        [0.5, 0.4, 0.1],   # label 1 -> top2 hit
        [0.8, 0.15, 0.05], # label 2 -> miss until k=3
    ])
    labels = np.asarray([2, 1, 2])
    assert top_k_accuracy(scores, labels, 1) == 1 / 3
    assert top_k_accuracy(scores, labels, 2) == 2 / 3
    assert top_k_accuracy(scores, labels, 3) == 1.0
    # k larger than classes is clamped
    assert top_k_accuracy(scores, labels, 10) == 1.0
    # ties break toward the LOWEST class index (reference
    # argsort(-scores)[:, :k] semantics, metrics/funcs.py:4-20)
    tied = np.asarray([[0.25, 0.25, 0.25, 0.25]])
    assert top_k_accuracy(tied, np.asarray([0]), 1) == 1.0
    assert top_k_accuracy(tied, np.asarray([3]), 1) == 0.0


def test_metric_battery():
    rng = np.random.default_rng(0)
    labels = rng.integers(0, 4, 200)
    scores = np.eye(4)[labels] * 0.8 + rng.uniform(0, 0.2, (200, 4))
    scores /= scores.sum(1, keepdims=True)
    m = compute_classification_metrics(
        scores, labels, ["a", "b", "c", "d"], use_class_metrics=True, include_report=True
    )
    assert m["accuracy"] == 1.0
    assert m["top5_accuracy"] == 1.0
    assert m["mAP_macro"] > 0.99
    for cls in ["a", "b", "c", "d"]:
        assert m[f"precision/{cls}"] == 1.0
        assert m[f"recall/{cls}"] == 1.0
    assert "precision" in m["classification_report"]


def test_metric_battery_imperfect():
    labels = np.asarray([0, 0, 1, 1])
    scores = np.asarray([[0.9, 0.1], [0.4, 0.6], [0.2, 0.8], [0.7, 0.3]])
    m = compute_classification_metrics(scores, labels, ["x", "y"], use_class_metrics=True)
    assert m["accuracy"] == 0.5
    assert m["precision/x"] == 0.5 and m["recall/x"] == 0.5


def test_confusion_matrix():
    cm = confusion_matrix(np.asarray([0, 1, 1, 2]), np.asarray([0, 1, 2, 2]), 3)
    assert cm[0, 0] == 1 and cm[1, 1] == 1 and cm[2, 1] == 1 and cm[2, 2] == 1
    assert cm.sum() == 4


def test_summary_cadence():
    # first 30 steps always; every 10 after; 2000-verbose tier
    assert should_write_summary(1, 10, 2000, 30)
    assert should_write_summary(29, 10, 2000, 30)
    assert not should_write_summary(31, 10, 2000, 30)
    assert should_write_summary(40, 10, 2000, 30)
    assert should_write_summary(2000, 10, 2000, 30)
    # --step_min_summaries parity: min_step gates the DEFAULT tier only
    assert not should_write_summary(40, 10, 2000, 30, min_step=100)
    assert should_write_summary(100, 10, 2000, 30, min_step=100)
    assert should_write_summary(20, 10, 2000, 30, min_step=100)  # first-N
    assert should_write_summary(2000, 10, 2000, 3, min_step=9999)  # verbose


def test_jsonl_writer_sanitizes_nonfinite(tmp_path):
    import json

    from tcresnet_tpu.metrics.writers import MetricWriter

    w = MetricWriter(tmp_path, "valid")
    w.write(10, {"ok": 1.0, "bad": float("nan"), "inf": float("inf")})
    w.close()
    (line,) = [
        json.loads(ln)
        for f in tmp_path.rglob("*.jsonl")
        for ln in f.read_text().splitlines()
    ]  # strict parser must accept every line
    assert line["ok"] == 1.0 and line["bad"] is None and line["inf"] is None


def test_crossed_boundary():
    # fused windows fire whenever a multiple of `every` lies in (prev, step]
    assert crossed_boundary(48, 64, 50)
    assert crossed_boundary(49, 50, 50)
    assert not crossed_boundary(50, 64, 50)
    assert not crossed_boundary(0, 49, 50)
    assert crossed_boundary(0, 150, 50)  # crosses several at once
    assert not crossed_boundary(10, 20, 0)  # disabled interval
    # windowed summary check: boundary 40 crossed inside (35, 42]
    assert should_write_summary(42, 10, 2000, 30, prev_step=35)
    assert not should_write_summary(49, 10, 2000, 30, prev_step=41)
