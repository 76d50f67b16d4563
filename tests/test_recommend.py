"""NCF / WnD recommender trainers (G9, reference run_NCF.py:25-63 /
run_WnD.py:25-67 re-expressed Ray-Data-first): synchronous data-parallel
epochs with fixed-point int64 forward/backward — bit-deterministic across
any block partitioning by construction (integer arithmetic is associative).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from folkscope_ray.stages.recommend import (
    ONE,
    build_interactions,
    build_rec_vocab,
    predict_test,
    train_recommender,
)


def _toy_events(n_blocks: int) -> rd.Dataset:
    rows = []
    for i in range(240):
        rows.append(
            {
                "repo": f"org{i % 5}/r",
                "canon_a": f"ent{i % 13}",
                "canon_b": f"ent{(i * 7 + 1) % 13}",
            }
        )
    return rd.from_pandas(pd.DataFrame(rows)).repartition(n_blocks)


def _toy_interactions(n_blocks: int) -> rd.Dataset:
    """Learnable signal: rating determined by (user id + item id) parity."""
    rows = []
    for u in range(6):
        for i in range(20):
            rows.append(
                {
                    "user": f"u{u}",
                    "item": f"i{i}",
                    "rating": 1 + ((u + i) % 2) * 3,
                    "split": (u * 20 + i) % 10,
                }
            )
    return rd.from_pandas(pd.DataFrame(rows)).repartition(n_blocks)


def test_build_interactions_semantics():
    inter = build_interactions(_toy_events(3)).to_pandas()
    # one row per distinct (repo, entity); both pair halves credited
    assert set(inter.columns) == {"user", "item", "rating", "split"}
    assert inter.duplicated(["user", "item"]).sum() == 0
    assert inter["rating"].between(1, 5).all()
    assert inter["split"].between(0, 9).all()
    # partition-invariant: counts/ratings identical at another block count
    other = build_interactions(_toy_events(7)).to_pandas()
    a = inter.sort_values(["user", "item"]).reset_index(drop=True)
    b = other.sort_values(["user", "item"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_vocab_unk_contract():
    uv, iv = build_rec_vocab(_toy_interactions(2))
    # train-split vocab only, ids 1..n (0 reserved for unk, run_NCF.py:108-117)
    assert 0 not in uv.values() and 0 not in iv.values()
    assert min(uv.values()) == 1 and max(uv.values()) == len(uv)


def test_training_learns_and_is_partition_invariant():
    p1, uv1, iv1, f1, hist1 = train_recommender(
        _toy_interactions(1), epochs=12, lr=0.05, eval_every=4)
    p7, uv7, iv7, f7, hist7 = train_recommender(
        _toy_interactions(7), epochs=12, lr=0.05, eval_every=4)
    # bit-identical parameters and eval history at different partitionings
    assert uv1 == uv7 and iv1 == iv7
    for k in p1:
        assert np.array_equal(p1[k], p7[k]), k
    assert hist1 == hist7
    # learnable parity signal: best RMSE beats predicting the mean (~1.5)
    assert min(h["valid_rmse"] for h in hist1) < 1.45


def test_predictions_shape_and_determinism():
    inter = _toy_interactions(3)
    params, uv, iv, feat, _ = train_recommender(
        inter, epochs=6, lr=0.05, eval_every=3)
    out = predict_test(inter, params, uv, iv, feat).to_pandas()
    n_test = inter.to_pandas().query("split == 9").shape[0]
    assert len(out) == n_test
    assert set(out.columns) == {"user", "item", "rating", "pred"}
    out2 = predict_test(inter.repartition(5), params, uv, iv, feat).to_pandas()
    a = out.sort_values(["user", "item"]).reset_index(drop=True)
    b = out2.sort_values(["user", "item"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_wnd_uses_item_features():
    """WnD with features must differ from NCF (the frozen feature embedding
    feeds both heads) while keeping the same deterministic contract."""
    inter = _toy_interactions(2)
    feats = {f"i{i}": np.full(8, 0.1 * (i % 3)) for i in range(20)}
    p_wnd, uv, iv, feat_fp, hist_wnd = train_recommender(
        inter, item_features=feats, epochs=6, lr=0.05, eval_every=3)
    assert "wide_w" in p_wnd and feat_fp is not None
    assert feat_fp.shape == (len(iv) + 1, 8)
    # feature rows quantized at FP scale
    assert feat_fp.dtype == np.int64
    p_ncf, _, _, _, _ = train_recommender(
        inter, epochs=6, lr=0.05, eval_every=3)
    assert not np.array_equal(p_wnd["P"], p_ncf["P"])
    # partition invariance holds with features too
    p_wnd7, _, _, _, hist7 = train_recommender(
        inter.repartition(7), item_features=feats, epochs=6, lr=0.05,
        eval_every=3)
    for k in p_wnd:
        assert np.array_equal(p_wnd[k], p_wnd7[k]), k
    assert hist_wnd == hist7
