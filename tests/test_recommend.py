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


def _planted_ablation_world():
    """200 items in 4 groups; rating = 1 + group(item).  Triples give every
    item edges whose TEXT encodes its group, so the kg feature variant is
    fully informative, the text variant (single-token canonical names) only
    carries item identity, and the baseline variant is seeded noise."""
    items = [f"i{k:03d}" for k in range(200)]
    grp = {it: k % 4 for k, it in enumerate(items)}
    rows = []
    for u in range(4):
        for k, it in enumerate(items):
            rows.append({"user": f"u{u}", "item": it, "rating": 1 + grp[it],
                         "split": (u * 200 + k * 7) % 10})
    trows = []
    for k, a in enumerate(items):
        g = grp[a]
        trows.append({"subj": f"{a}-{items[(k + 4) % 200]}",
                      "pred": "usedFor",
                      "obj": f"group{g} shared purpose phrase g{g}"})
    return pd.DataFrame(rows), rd.from_pandas(pd.DataFrame(trows)), grp


def test_wnd_ablation_feature_ranking():
    """The reference's three WnD configs (run_WnD.py / run_WnD_text_feature
    .py / run_WnD_baseline.py) exposed as wnd_item_features variants must
    rank exactly as the paper claims — KG features < text-only < baseline
    RMSE — measured with a deterministic closed-form ridge probe on the
    train split (the full-batch fixed-point trainer is too slow an
    optimizer to separate the variants in test-sized epoch budgets; the
    probe measures the same quantity, feature informativeness, exactly)."""
    from folkscope_ray.stages.recommend import wnd_item_features

    df, tri, grp = _planted_ablation_world()
    tr, va = df[df.split <= 7], df[df.split == 8]
    rmse = {}
    feats_by_variant = {}
    for variant in ("kg", "text", "baseline"):
        feats = wnd_item_features(tri, variant=variant, dim=16)
        assert set(feats) == set(grp), variant
        feats_by_variant[variant] = feats
        X = np.hstack([np.stack([feats[i] for i in tr["item"]]),
                       np.ones((len(tr), 1))])
        y = tr["rating"].to_numpy(float)
        w = np.linalg.solve(X.T @ X + 1e-6 * np.eye(X.shape[1]), X.T @ y)
        Xv = np.hstack([np.stack([feats[i] for i in va["item"]]),
                        np.ones((len(va), 1))])
        rmse[variant] = float(np.sqrt(np.mean(
            (Xv @ w - va["rating"].to_numpy(float)) ** 2)))
    assert rmse["kg"] < rmse["text"] < rmse["baseline"], rmse
    assert rmse["kg"] < 0.05  # group-informative features solve it exactly
    # kg features: identical within a group, separated across groups
    kf = feats_by_variant["kg"]
    same = np.dot(kf["i000"], kf["i004"])  # both group 0
    cross = np.dot(kf["i000"], kf["i001"])
    assert same > cross
    # variants are reproducible (frozen/seeded, no RNG state)
    again = wnd_item_features(tri, variant="baseline", dim=16)
    for k, v in feats_by_variant["baseline"].items():
        assert np.array_equal(v, again[k])


def test_wnd_ablation_variants_train_end_to_end():
    """Each ablation variant must flow through train_recommender with the
    same deterministic contract (bit-identical across partitionings)."""
    from folkscope_ray.stages.recommend import (
        train_recommender,
        wnd_item_features,
    )

    df, tri, _ = _planted_ablation_world()
    feats = wnd_item_features(tri, variant="text", dim=8)
    p1, *_ , h1 = train_recommender(
        rd.from_pandas(df).repartition(2), item_features=feats,
        epochs=4, lr=0.05, eval_every=2)
    p9, *_ , h9 = train_recommender(
        rd.from_pandas(df).repartition(9), item_features=feats,
        epochs=4, lr=0.05, eval_every=2)
    assert h1 == h9
    for k in p1:
        assert np.array_equal(p1[k], p9[k]), k
    import pytest

    with pytest.raises(ValueError, match="variant"):
        wnd_item_features(tri, variant="nope")
