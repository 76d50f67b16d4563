"""Classifier fine-tuning loop (stages/finetune.py) — the runnable analogue
of the reference's HF-Trainer critic training
(src/classifier/run_classification.py:562-656).

Pinned contracts: bit-identical weights at any block partitioning,
checkpoint resume bit-equal to an unbroken run, incompatible checkpoints
ignored, eval metrics equal to the single-process formulas in
functions/metrics.py, and the predictions-TSV output shape."""

from __future__ import annotations

import glob
import json
import os
import shutil

import numpy as np
import pytest
import ray.data as rd

from folkscope_ray.stages.finetune import (
    evaluate_classifier,
    last_checkpoint,
    predict_classifier,
    train_classifier,
)


def _toy_ds(n: int = 240):
    rows = []
    for i in range(n):
        if i % 2:
            rows.append({"text": f"well formed readable prose row {i}",
                         "label": "v"})
        else:
            rows.append({"text": f"zq9 xj8 garbled noise tokens {i}",
                         "label": "i"})
    return rd.from_items(rows)


def test_loss_decreases_and_separates():
    ds = _toy_ds()
    w, hist = train_classifier(ds, dim=512, epochs=5, lr=4.0)
    losses = [h["train_loss_bits"] for h in hist]
    assert losses[0] == pytest.approx(1.0)  # w=0 -> p=0.5 -> 1 bit/row
    assert losses[-1] < 0.1 < losses[0]
    m = evaluate_classifier(ds, w)
    assert m["accuracy"] == 1.0 and m["f1"] == 1.0


def test_bit_identical_across_partitioning():
    ds = _toy_ds()
    w1, h1 = train_classifier(ds.repartition(1), dim=512, epochs=4, lr=4.0)
    w8, h8 = train_classifier(ds.repartition(8), dim=512, epochs=4, lr=4.0)
    assert np.array_equal(w1, w8)
    assert h1 == h8  # fixed-point loss partials sum exactly too


def test_checkpoint_resume_bit_equal(tmp_path):
    ds = _toy_ds()
    run = str(tmp_path / "ck")
    w_full, h_full = train_classifier(ds, dim=256, epochs=6, lr=2.0,
                                      run_dir=run)
    # simulate a kill after epoch 2: drop the later checkpoints and rerun
    for d in glob.glob(os.path.join(run, "checkpoint-*")):
        if int(d.rsplit("-", 1)[1]) >= 3:
            shutil.rmtree(d)
    assert last_checkpoint(run).endswith("checkpoint-2")
    w_res, h_res = train_classifier(ds, dim=256, epochs=6, lr=2.0,
                                    run_dir=run)
    assert np.array_equal(w_full, w_res)
    assert h_full == h_res
    # a completed run resumes past the loop entirely (no retraining)
    w_again, _ = train_classifier(ds, dim=256, epochs=6, lr=2.0, run_dir=run)
    assert np.array_equal(w_full, w_again)


def test_incompatible_checkpoint_ignored(tmp_path):
    """A checkpoint from a different config (fingerprint mismatch) must not
    be trusted — training starts fresh instead of silently mixing runs."""
    ds = _toy_ds()
    run = str(tmp_path / "ck")
    train_classifier(ds, dim=256, epochs=2, lr=2.0, run_dir=run)
    ck = last_checkpoint(run)
    state = json.load(open(os.path.join(ck, "state.json")))
    assert state["config_fp"]
    w_other, _ = train_classifier(ds, dim=256, epochs=2, lr=1.0, run_dir=run)
    w_fresh, _ = train_classifier(ds, dim=256, epochs=2, lr=1.0)
    assert np.array_equal(w_other, w_fresh)


def test_eval_matches_single_process_formulas():
    from folkscope_ray.functions.metrics import (
        classification_metrics,
        score_to_label,
    )

    ds = _toy_ds(100)
    w, _ = train_classifier(ds, dim=128, epochs=2, lr=1.0)
    m = evaluate_classifier(ds, w)
    pred = predict_classifier(ds, w, label_col="label").to_pandas()
    ref = classification_metrics(
        pred["label"].to_numpy(),
        score_to_label(pred["score"].to_numpy(), 0.5))
    for k in ("tp", "fp", "fn", "tn"):
        assert m[k] == ref[k]
    assert m["f1"] == pytest.approx(ref["f1"])


def test_predict_output_shape():
    """predictions carry the reference TSV columns (label, prediction,
    score = class-1 probability), scores quantized to 6 digits
    (run_classification.py:645-656)."""
    ds = _toy_ds(40)
    w, _ = train_classifier(ds, dim=128, epochs=2, lr=1.0)
    df = predict_classifier(ds, w, label_col="label").to_pandas()
    assert {"label", "prediction", "score"} <= set(df.columns)
    assert set(df["prediction"].unique()) <= {"i", "v"}
    assert (df["score"] == df["score"].round(6)).all()
    assert ((df["score"] >= 0.5) == (df["prediction"] == "v")).all()


def test_empty_training_set_raises():
    empty = rd.from_items([{"text": "x", "label": "v"}]).filter(
        lambda r: False)
    with pytest.raises(ValueError, match="empty training set"):
        train_classifier(empty, dim=64, epochs=1)
