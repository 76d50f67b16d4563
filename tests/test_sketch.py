"""Sketch / order-statistic operators: exact counting quantiles + HLL."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_exact_quantiles_match_duckdb_quantile_disc():
    import duckdb
    import ray.data as rd

    from folkscope_ray.ops.sketch import exact_quantiles_by_counting

    rng = np.random.RandomState(2)
    vals_df = pd.DataFrame({"v": rng.randint(0, 500, size=3000)})
    ds = rd.from_pandas(vals_df).repartition(7)
    qs = [0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0]
    got = exact_quantiles_by_counting(ds, "v", qs)
    want = duckdb.sql(
        "WITH qd AS (SELECT quantile_disc(v, [0.0,0.1,0.25,0.5,0.75,0.9,1.0])"
        " AS vs FROM vals_df) "
        "SELECT unnest([0.0,0.1,0.25,0.5,0.75,0.9,1.0]) AS q,"
        " unnest(vs) AS value FROM qd"
    ).df().sort_values("q").reset_index(drop=True)
    got = got.sort_values("q").reset_index(drop=True)
    assert got["q"].tolist() == want["q"].tolist()
    assert got["value"].astype(int).tolist() == want["value"].astype(int).tolist()


def test_hll_estimate_within_tolerance_and_partition_invariant():
    import ray.data as rd

    from folkscope_ray.ops.sketch import hll_distinct_by_key

    rng = np.random.RandomState(9)
    n = 20_000
    keys = rng.choice(["a", "b", "c"], size=n)
    # distinct cardinalities differ by key: a ~ 5000, b ~ 500, c ~ 50
    vals = np.where(
        keys == "a", rng.randint(0, 5000, n),
        np.where(keys == "b", rng.randint(100_000, 100_500, n),
                 rng.randint(900_000, 900_050, n)),
    )
    df = pd.DataFrame({"k": keys, "v": vals})
    outs = []
    for blocks in (1, 9):
        ds = rd.from_pandas(df).repartition(blocks)
        outs.append(hll_distinct_by_key(ds, "k", "v"))
    # merge-by-max is order-independent -> bit-identical across partitioning
    pd.testing.assert_frame_equal(outs[0], outs[1])
    exact = df.groupby("k")["v"].nunique()
    for _, row in outs[0].iterrows():
        want = exact[row["k"]]
        assert abs(row["approx_distinct"] - want) / want < 0.05, (
            row["k"], row["approx_distinct"], want)


def test_hll_partial_merge_equals_single_pass():
    from folkscope_ray.ops.sketch import hll_estimate, hll_partial

    rng = np.random.RandomState(4)
    vals = rng.randint(0, 10_000, size=8_000)
    whole = hll_partial(vals)
    merged = np.maximum(hll_partial(vals[:3000]), hll_partial(vals[3000:]))
    assert (whole == merged).all()
    est = hll_estimate(whole)
    exact = len(np.unique(vals))
    assert abs(est - exact) / exact < 0.05


def test_heavy_hitters_exact_on_skewed_stream():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.sketch import heavy_hitters

    rng = np.random.RandomState(11)
    # heavy-tailed regime: 10 hot keys each far above n/capacity, plus a
    # uniform tail (guarantee: f_k > n/cap -> exact)
    hot_counts = [4000, 2500, 1500, 900, 600, 500, 480, 460, 440, 420]
    hot = np.repeat(np.arange(10, dtype=np.int64), hot_counts)
    tail = rng.randint(100, 5000, 3700).astype(np.int64)
    keys = rng.permutation(np.concatenate([hot, tail]))
    df = pd.DataFrame({"user_id": keys})
    n = len(df)
    assert min(hot_counts) > n / 64  # the regime the guarantee needs
    exp = (df.groupby("user_id").size().rename("n").reset_index()
           .sort_values(["n", "user_id"], ascending=[False, True])
           .head(10).reset_index(drop=True))
    for blocks in (3, 17):
        out = heavy_hitters(
            rd.from_pandas(df, override_num_blocks=blocks),
            key_col="user_id", top_k=10, capacity=64,
        ).to_pandas()
        assert out["user_id"].tolist() == exp["user_id"].tolist(), blocks
        assert out["n"].tolist() == exp["n"].tolist(), blocks


def test_heavy_hitters_exact_on_bounded_domain():
    """No block ever truncates when distinct-per-block <= capacity ->
    unconditionally exact, even on a uniform stream."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.sketch import heavy_hitters

    rng = np.random.RandomState(12)
    df = pd.DataFrame({"user_id": rng.randint(0, 150, 10_000).astype(np.int64)})
    exp = (df.groupby("user_id").size().rename("n").reset_index()
           .sort_values(["n", "user_id"], ascending=[False, True])
           .head(10).reset_index(drop=True))
    out = heavy_hitters(
        rd.from_pandas(df, override_num_blocks=9),
        key_col="user_id", top_k=10, capacity=2048,
    ).to_pandas()
    assert out["user_id"].tolist() == exp["user_id"].tolist()
    assert out["n"].tolist() == exp["n"].tolist()


def test_dd_quantiles_relative_error_and_partition_invariance():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.sketch import dd_quantiles

    rng = np.random.RandomState(31)
    # 5 orders of magnitude + negatives + zeros: the domain the exact
    # counting histogram cannot handle
    v = np.concatenate([
        np.exp(rng.uniform(np.log(1e-2), np.log(1e3), 20_000)),
        -np.exp(rng.uniform(np.log(1e-1), np.log(1e2), 3_000)),
        np.zeros(500),
    ])
    rng.shuffle(v)
    df = pd.DataFrame({"x": v})
    qs = [0.01, 0.25, 0.5, 0.75, 0.99]
    outs = []
    for blocks in (1, 11):
        outs.append(dd_quantiles(rd.from_pandas(df).repartition(blocks),
                                 "x", qs, rel_err=0.01))
    pd.testing.assert_frame_equal(outs[0], outs[1])  # bit-stable merge
    s = np.sort(v)
    for q, est in outs[0].itertuples(index=False):
        truth = s[int(np.floor(q * (len(s) - 1)))]
        assert abs(est - truth) <= 0.01 * abs(truth) + 1e-12, (q, est, truth)


def test_exact_quantiles_by_group_match_duckdb_and_partitioning():
    import duckdb
    import ray.data as rd

    from folkscope_ray.ops.sketch import exact_quantiles_by_group

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "grp": rng.choice(["a", "b", "c", "d"], size=4000),
        "v": rng.randint(0, 300, size=4000),
    })
    qs = [0.25, 0.5, 0.75]
    want = duckdb.sql(
        "SELECT grp, 0.25 AS q, quantile_disc(v, 0.25)::BIGINT AS value FROM df GROUP BY grp "
        "UNION ALL SELECT grp, 0.5, quantile_disc(v, 0.5)::BIGINT FROM df GROUP BY grp "
        "UNION ALL SELECT grp, 0.75, quantile_disc(v, 0.75)::BIGINT FROM df GROUP BY grp"
    ).df().sort_values(["grp", "q"]).reset_index(drop=True)
    for nblocks in (1, 9):
        got = (exact_quantiles_by_group(
                   rd.from_pandas(df).repartition(nblocks), "grp", "v", qs)
               .to_pandas().sort_values(["grp", "q"]).reset_index(drop=True))
        assert got["grp"].tolist() == want["grp"].tolist()
        assert got["q"].astype(float).tolist() == want["q"].astype(float).tolist()
        assert got["value"].astype(int).tolist() == want["value"].astype(int).tolist()


def test_countmin_overestimates_and_is_partition_invariant():
    import ray.data as rd

    from folkscope_ray.ops.sketch import countmin_freq_by_key

    rng = np.random.RandomState(11)
    keys = rng.zipf(1.5, size=20000).astype(np.int64) % 1000
    df = pd.DataFrame({"k": keys})
    exact = pd.Series(keys).value_counts()
    probe = np.arange(50, dtype=np.int64)
    outs = []
    for nblocks in (1, 13):
        got = countmin_freq_by_key(rd.from_pandas(df).repartition(nblocks),
                                   "k", probe, width=2048, depth=4)
        outs.append(got)
        est = got.set_index("k")["est"]
        for k in probe:
            true = int(exact.get(k, 0))
            assert est[k] >= true            # CM never underestimates
            assert est[k] <= true + int(np.e / 2048 * len(keys)) + 60
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_countmin_exact_when_wide():
    """With width >> distinct keys and no collisions across all 4 rows the
    min equals the exact count -- pins the hashing + merge arithmetic."""
    import ray.data as rd

    from folkscope_ray.ops.sketch import countmin_freq_by_key

    keys = np.repeat(np.arange(10, dtype=np.int64), np.arange(1, 11))
    got = countmin_freq_by_key(
        rd.from_pandas(pd.DataFrame({"k": keys})).repartition(3),
        "k", np.arange(10, dtype=np.int64), width=1 << 16, depth=4)
    assert got["est"].tolist() == list(range(1, 11))


def test_quantile_cont_by_group_matches_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.sketch import quantile_cont_by_group

    rng = np.random.RandomState(9)
    df = pd.DataFrame({
        "k": rng.randint(0, 5, 400),
        # coarse domain forces heavy ties across the interpolation points
        "v": rng.randint(0, 60, 400).astype(np.int64),
    })
    out = (quantile_cont_by_group(rd.from_pandas(df, override_num_blocks=6),
                                  "k", "v", [0.25, 0.5, 0.75])
           .to_pandas().sort_values(["k", "q"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT k, q, value FROM (
          SELECT k, 0.25 AS q, quantile_cont(v, 0.25) AS value FROM t GROUP BY k
          UNION ALL SELECT k, 0.5, quantile_cont(v, 0.5) FROM t GROUP BY k
          UNION ALL SELECT k, 0.75, quantile_cont(v, 0.75) FROM t GROUP BY k)
        ORDER BY k, q
    """).df()
    con.close()
    # exact dyadic interpolation over small ints: bit-equal doubles
    assert (out["value"].to_numpy() == exp["value"].to_numpy()).all()
    # single-row group degenerates to the value itself at every q
    one = pd.DataFrame({"k": [9], "v": [42]})
    o1 = (quantile_cont_by_group(rd.from_pandas(one), "k", "v", [0.25, 0.75])
          .to_pandas())
    assert (o1["value"] == 42.0).all()
