"""Critic-evaluation metrics: accuracy / P / R / F1, PR curve, threshold
selection at a precision target.

Re-implements the evaluation math of the reference classifier stack
(src/classifier/run_classification.py:534-550 metrics;
src/classifier/precision_recall_selection.py:21-54 threshold sweep /
precision@recall scan) as plain numpy driver-side functions — these operate
on a collected eval split (small by construction), exactly like the
reference.  Labels use the reference vocabulary: positive = "v"(alid),
negative = "i"(nvalid) (run_classification.py:326-341).
"""

from __future__ import annotations

import numpy as np

POSITIVE = "v"
NEGATIVE = "i"


def score_to_label(scores, threshold: float):
    """score >= t -> "v" else "i" (precision_recall_selection.py:21-28)."""
    s = np.asarray(scores, dtype=np.float64)
    return np.where(s >= threshold, POSITIVE, NEGATIVE)


def classification_metrics(labels, predictions) -> dict:
    y = np.asarray(labels) == POSITIVE
    p = np.asarray(predictions) == POSITIVE
    tp = int((y & p).sum())
    fp = int((~y & p).sum())
    fn = int((y & ~p).sum())
    tn = int((~y & ~p).sum())
    precision = tp / (tp + fp) if tp + fp else 0.0
    recall = tp / (tp + fn) if tp + fn else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0
    acc = (tp + tn) / max(1, len(y))
    return {"accuracy": acc, "precision": precision, "recall": recall, "f1": f1,
            "tp": tp, "fp": fp, "fn": fn, "tn": tn}


def pr_curve(labels, scores, n_thresholds: int = 101):
    """(thresholds, precisions, recalls) over an even threshold sweep."""
    ts = np.linspace(0.0, 1.0, n_thresholds)
    ps, rs = [], []
    for t in ts:
        m = classification_metrics(labels, score_to_label(scores, t))
        ps.append(m["precision"])
        rs.append(m["recall"])
    return ts, np.asarray(ps), np.asarray(rs)


def threshold_for_precision(labels, scores, target_precision: float) -> float | None:
    """Smallest threshold whose precision >= target (max recall at that
    precision) — the reference's precision@recall scan
    (precision_recall_selection.py:50-54).  None if unreachable."""
    ts, ps, _ = pr_curve(labels, scores)
    for t, p in zip(ts, ps):
        if p >= target_precision:
            return float(t)
    return None
