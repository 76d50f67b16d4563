"""Unit tests for medoid_by_key, negative_sample_pairs and cohens_kappa."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _emb_df(seed=11):
    rng = np.random.default_rng(seed)
    rows = []
    for label, center in [(0, np.array([1.0, 0.0, 0.0])),
                          (1, np.array([0.0, 1.0, 0.0]))]:
        for i in range(20):
            v = center + rng.normal(0, 0.05, 3)
            rows.append({"vec_id": label * 100 + i, "label": label,
                         "embedding": v.tolist()})
    return pd.DataFrame(rows)


def test_medoid_matches_numpy_argmax():
    from folkscope_ray.ops.vector import medoid_by_key

    df = _emb_df()
    out = medoid_by_key(rd.from_pandas(df).repartition(4), "label",
                        "embedding", "vec_id")
    for label, g in df.groupby("label"):
        q = np.round(np.stack(g["embedding"].map(np.array)) * 1e6).astype(
            np.int64)
        sv = q.sum(axis=0)
        dots = q @ sv
        order = np.lexsort((g["vec_id"].to_numpy(), -dots))
        exp_id = g["vec_id"].to_numpy()[order[0]]
        got = out[out["label"] == label]
        assert got["vec_id"].iloc[0] == exp_id
        assert got["dot"].iloc[0] == dots[order[0]]


def test_medoid_tie_breaks_by_min_id():
    from folkscope_ray.ops.vector import medoid_by_key

    # identical vectors -> identical dots -> min vec_id wins
    df = pd.DataFrame({
        "vec_id": [5, 3, 9], "label": [0, 0, 0],
        "embedding": [[1.0, 1.0]] * 3,
    })
    out = medoid_by_key(rd.from_pandas(df).repartition(3), "label",
                        "embedding", "vec_id")
    assert out["vec_id"].iloc[0] == 3


def test_medoid_partition_invariant():
    from folkscope_ray.ops.vector import medoid_by_key

    df = _emb_df(seed=12)
    a = medoid_by_key(rd.from_pandas(df), "label", "embedding", "vec_id")
    b = medoid_by_key(rd.from_pandas(df).repartition(13), "label",
                      "embedding", "vec_id")
    pd.testing.assert_frame_equal(
        a.sort_values("label").reset_index(drop=True),
        b.sort_values("label").reset_index(drop=True))


def test_negative_sample_excludes_positives_and_is_deterministic():
    from folkscope_ray.ops.encode import negative_sample_pairs

    pos = pd.DataFrame({
        "u": [1, 1, 2, 2, 2],
        "i": [0, 1, 2, 3, 3],          # (2,3) duplicated on purpose
    })
    a = (negative_sample_pairs(rd.from_pandas(pos).repartition(3),
                               "u", "i", n_items=10, k=3, item_base=0)
         .to_pandas().sort_values(["u", "neg_item"]).reset_index(drop=True))
    b = (negative_sample_pairs(rd.from_pandas(pos), "u", "i",
                               n_items=10, k=3, item_base=0)
         .to_pandas().sort_values(["u", "neg_item"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # no emitted negative is a positive of the same user
    pos_set = set(zip(pos["u"], pos["i"]))
    assert all((u, v) not in pos_set
               for u, v in zip(a["u"], a["neg_item"]))
    assert a["neg_item"].between(0, 9).all()
    # reference draws: md5("u|i|t") mod 10 for each DISTINCT positive
    import collections

    draws = collections.Counter()
    for u, i in set(zip(pos["u"], pos["i"])):
        for t in (1, 2, 3):
            c = int(hashlib.md5(f"{u}|{i}|{t}".encode())
                    .hexdigest()[:12], 16) % 10
            if (u, c) not in pos_set:
                draws[(u, c)] += 1
    got = {(u, v): n for u, v, n in zip(a["u"], a["neg_item"],
                                        a["n_draws"])}
    assert got == dict(draws)


def test_cohens_kappa_known_table():
    from folkscope_ray.ops.stats import cohens_kappa

    # classic example: n00=20, n01=5, n10=10, n11=15 -> kappa = 0.4
    rows = ([(0, 0)] * 20 + [(0, 1)] * 5 + [(1, 0)] * 10 + [(1, 1)] * 15)
    df = pd.DataFrame(rows, columns=["a", "b"])
    out = cohens_kappa(rd.from_pandas(df).repartition(4), "a", "b")
    n = 50
    po = 35 / n
    pe = (25 * 30 + 25 * 20) / (n * n)
    assert out["kappa"].iloc[0] == pytest.approx((po - pe) / (1 - pe))
    assert out["n00"].iloc[0] == 20 and out["n11"].iloc[0] == 15


def test_cohens_kappa_perfect_agreement():
    from folkscope_ray.ops.stats import cohens_kappa

    df = pd.DataFrame({"a": [0, 1, 0, 1], "b": [0, 1, 0, 1]})
    out = cohens_kappa(rd.from_pandas(df), "a", "b")
    assert out["kappa"].iloc[0] == pytest.approx(1.0)
