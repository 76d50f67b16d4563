"""interval_join / corr_matrix / pca_project: brute-force parity and
partition invariance."""

import math

import numpy as np
import pandas as pd
import pytest
import ray

from folkscope_ray.ops.interval import interval_join
from folkscope_ray.ops.stats import corr_matrix
from folkscope_ray.ops.vector import pca_project


def _intervals(seed, n, keys=5, span=1000, maxlen=120):
    rng = np.random.RandomState(seed)
    return pd.DataFrame({
        "rid": np.arange(n, dtype=np.int64),
        "k": rng.randint(0, keys, n).astype(np.int64),
        "s": rng.randint(0, span, n).astype(np.int64),
    }).assign(e=lambda d: d["s"] + rng.randint(0, maxlen, n))


def _brute(l, r):
    m = l.merge(r, on="k", suffixes=("_l", "_r"))
    m = m[(m["s_l"] <= m["e_r"]) & (m["s_r"] <= m["e_l"])]
    return set(zip(m["rid_l"], m["rid_r"]))


@pytest.mark.parametrize("cell", [1, 37, 250, None])
def test_interval_join_matches_bruteforce(cell):
    l = _intervals(1, 200)
    r = _intervals(2, 300)
    got = interval_join(
        ray.data.from_pandas(l).repartition(7),
        ray.data.from_pandas(r).repartition(5),
        on="k", left_start="s", left_end="e",
        right_start="s", right_end="e", cell=cell).to_pandas()
    assert set(zip(got["rid"], got["rid_r"])) == _brute(l, r)
    # ownership rule: each pair exactly once
    assert not got.duplicated(["rid", "rid_r"]).any()
    # int columns survive the union/merge round-trip as int64
    assert got["rid"].dtype == "int64" and got["rid_r"].dtype == "int64"


def test_interval_join_point_right_side():
    l = _intervals(3, 150)
    r = _intervals(4, 250, maxlen=1).assign(e=lambda d: d["s"])  # points
    got = interval_join(
        ray.data.from_pandas(l), ray.data.from_pandas(r),
        on="k", left_start="s", left_end="e",
        right_start="s", right_end="s", cell=50).to_pandas()
    m = l.merge(r, on="k", suffixes=("_l", "_r"))
    want = m[(m["s_l"] <= m["s_r"]) & (m["s_r"] <= m["e_l"])]
    assert set(zip(got["rid"], got["rid_r"])) == set(
        zip(want["rid_l"], want["rid_r"]))


def test_interval_join_partition_invariant():
    l = _intervals(5, 120)
    r = _intervals(6, 180)

    def run(lp, rp, nb):
        got = interval_join(
            ray.data.from_pandas(l).repartition(lp),
            ray.data.from_pandas(r).repartition(rp),
            on="k", left_start="s", left_end="e",
            right_start="s", right_end="e", cell=64,
            n_buckets=nb).to_pandas()
        return (got.sort_values(["rid", "rid_r"]).reset_index(drop=True)
                [sorted(got.columns)])

    pd.testing.assert_frame_equal(run(2, 3, 4), run(11, 7, 19))


def test_corr_matrix_matches_numpy_and_is_partition_invariant():
    rng = np.random.RandomState(7)
    n = 5000
    x = rng.randint(0, 10000, n) / 100.0
    df = pd.DataFrame({
        "a": x,
        "b": np.round(x * 0.5 + rng.randint(0, 1000, n) / 100.0, 2),
        "c": rng.randint(0, 500, n) / 100.0,
    })
    got1 = corr_matrix(ray.data.from_pandas(df).repartition(3),
                       ["a", "b", "c"], scale=100)
    got2 = corr_matrix(ray.data.from_pandas(df).repartition(17),
                       ["a", "b", "c"], scale=100)
    # bit-identical across partitionings (exact integer moments)
    pd.testing.assert_frame_equal(got1, got2)
    want = np.corrcoef(np.stack([df.a, df.b, df.c]))
    for _, row in got1.iterrows():
        i, j = "abc".index(row.col_a), "abc".index(row.col_b)
        assert math.isclose(row["corr"], want[i, j], rel_tol=1e-12)
    # the planted a~b correlation is strong, a~c is noise
    g = got1.set_index(["col_a", "col_b"])["corr"]
    assert g[("a", "b")] > 0.8 and abs(g[("a", "c")]) < 0.1


def test_corr_matrix_zero_variance_is_null():
    df = pd.DataFrame({"a": [1.0, 2.0, 3.0], "b": [5.0, 5.0, 5.0]})
    got = corr_matrix(ray.data.from_pandas(df), ["a", "b"])
    assert len(got) == 1 and pd.isna(got["corr"].iloc[0])


def _vecs(seed, n=400, d=16):
    rng = np.random.RandomState(seed)
    # anisotropic cloud: a dominant direction plus noise
    base = rng.randn(n, 1) * np.linspace(3.0, 0.1, d)[None, :]
    return base + rng.randn(n, d) * 0.05


def test_pca_partition_invariant_and_variance_ordered():
    v = _vecs(11)
    df = pd.DataFrame({"vec_id": np.arange(len(v), dtype=np.int64),
                       "embedding": [row.tolist() for row in v]})

    def run(parts):
        out = pca_project(ray.data.from_pandas(df).repartition(parts),
                          vec_col="embedding", id_col="vec_id",
                          k=3).to_pandas()
        return out.sort_values("vec_id").reset_index(drop=True)

    p1, p2 = run(2), run(13)
    pd.testing.assert_frame_equal(p1, p2)  # bit-identical
    assert p1["pc0"].var() >= p1["pc1"].var() >= p1["pc2"].var()
    # projections are centered: exact moments make the mean ~0 (ppm units)
    assert abs(p1["pc0"].mean()) < 1000


def test_pca_recovers_planted_direction():
    rng = np.random.RandomState(13)
    d = 8
    direction = np.zeros(d)
    direction[2] = 1.0
    coords = rng.randn(500) * 5.0
    v = coords[:, None] * direction[None, :] + rng.randn(500, d) * 0.01
    df = pd.DataFrame({"vec_id": np.arange(500, dtype=np.int64),
                       "embedding": [row.tolist() for row in v]})
    out = (pca_project(ray.data.from_pandas(df), k=1).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    # pc0 (ppm) tracks the planted coordinate up to centering
    got = out["pc0"].to_numpy() / 1e6
    want = coords - coords.mean()
    corr = np.corrcoef(got, want)[0, 1]
    assert abs(corr) > 0.999


def test_weighted_sample_deterministic_and_weight_biased():
    from folkscope_ray.ops.split import weighted_sample

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "id": np.arange(2000, dtype=np.int64),
        # two strata: heavy (w=100) and light (w=1)
        "w": np.where(np.arange(2000) < 200, 100.0, 1.0),
    })

    def run(parts, seed=7):
        out = weighted_sample(ray.data.from_pandas(df).repartition(parts),
                              key_col="id", weight_col="w", k=50,
                              seed=seed).to_pandas()
        return out.sort_values("id").reset_index(drop=True)

    a, b = run(3), run(19)
    pd.testing.assert_frame_equal(a, b)  # partition-invariant
    # heavy stratum is 10% of rows but should dominate the sample
    assert (a["w"] == 100.0).sum() > 30
    # different seed -> different sample
    assert not a.equals(run(3, seed=8))


def test_weighted_sample_nonpositive_weights_never_selected():
    from folkscope_ray.ops.split import weighted_sample

    df = pd.DataFrame({"id": np.arange(20, dtype=np.int64),
                       "w": [0.0] * 10 + [1.0] * 10})
    out = weighted_sample(ray.data.from_pandas(df), key_col="id",
                          weight_col="w", k=10).to_pandas()
    assert (out["w"] > 0).all() and len(out) == 10


def test_weighted_sample_fewer_positive_rows_than_k():
    # w <= 0 rows are dropped BEFORE the top-k, so when fewer than k
    # positive-weight rows exist the output is short — never padded with
    # sentinel-scored non-positive rows (the oracle's WHERE w > 0 contract)
    from folkscope_ray.ops.split import weighted_sample

    df = pd.DataFrame({"id": np.arange(20, dtype=np.int64),
                       "w": [0.0] * 12 + [-2.0] * 3 + [1.0] * 5})
    out = weighted_sample(ray.data.from_pandas(df).repartition(4),
                          key_col="id", weight_col="w", k=15).to_pandas()
    assert len(out) == 5 and (out["w"] > 0).all()


def test_interval_join_date_columns_normalize_to_microseconds():
    import pyarrow as pa

    # left side uses DATE columns, right side timestamps: both must land in
    # the same (microsecond) unit or the join silently returns garbage
    days = np.array([0, 5, 20, 40], dtype=np.int64)
    left = pa.table({
        "k": pa.array([1, 1, 1, 1], pa.int64()),
        "lid": pa.array([0, 1, 2, 3], pa.int64()),
        "s": pa.array((days).astype(np.int32), pa.int32()).cast(pa.date32()),
        "e": pa.array((days + 10).astype(np.int32),
                      pa.int32()).cast(pa.date32()),
    })
    us = np.array([3, 12, 100], dtype=np.int64) * 86_400_000_000
    right = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "rid": pa.array([0, 1, 2], pa.int64()),
        "t": pa.array(us, pa.int64()).cast(pa.timestamp("us")),
    })
    got = interval_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right),
        on="k", left_start="s", left_end="e",
        right_start="t", right_end="t", cell=86_400_000_000).to_pandas()
    # day-3 point hits [0,10]; day-12 hits [5,15]; day-100 hits nothing
    assert set(zip(got["lid"], got["rid"])) == {(0, 0), (1, 1)}


def test_interval_join_rejects_unsupported_column_types():
    import pyarrow as pa

    left = pa.table({"k": pa.array([1], pa.int64()),
                     "s": pa.array([1.5], pa.float64()),
                     "e": pa.array([2.5], pa.float64())})
    right = pa.table({"k": pa.array([1], pa.int64()),
                      "s": pa.array([1], pa.int64()),
                      "e": pa.array([2], pa.int64())})
    with pytest.raises(Exception, match="timestamp/date/integer"):
        interval_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                      on="k", left_start="s", left_end="e",
                      right_start="s", right_end="e", cell=10).to_pandas()


@pytest.mark.parametrize("cell", [1, 7, 1000])
def test_interval_join_inverted_intervals_always_empty(cell):
    # end < start rows must never join, whether start/end share a grid cell
    # (same-cell inverted) or not (cross-cell) — output is cell-independent
    l = pd.DataFrame({"k": [1, 1, 1], "lid": [0, 1, 2],
                      "s": np.array([100, 500, 900], dtype=np.int64),
                      "e": np.array([99, 450, 850], dtype=np.int64)})
    r = pd.DataFrame({"k": [1, 1], "rid": [0, 1],
                      "s": np.array([0, 400], dtype=np.int64),
                      "e": np.array([1000, 950], dtype=np.int64)})
    got = interval_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                        on="k", left_start="s", left_end="e",
                        right_start="s", right_end="e", cell=cell).to_pandas()
    assert len(got) == 0


def test_interval_join_planted_hot_key_salt_invariant():
    """Skew hardening (the skew_join_events discipline applied to the grid
    join): ONE key holds ~50% of both sides, all inside a handful of grid
    cells.  salt=1 and salt=4 must produce the identical pair set, and the
    salted run must spread the hot (key, cell) work across more buckets."""
    rng = np.random.RandomState(9)
    n_l, n_r = 400, 600

    def skewed(n, seed):
        r = np.random.RandomState(seed)
        k = np.where(r.rand(n) < 0.5, 7, r.randint(0, 40, n))
        s = r.randint(0, 200, n).astype(np.int64)  # hot rows cluster tight
        return pd.DataFrame({"k": k.astype(np.int64),
                             "rid": np.arange(n, dtype=np.int64),
                             "s": s}).assign(
            e=lambda d: d["s"] + r.randint(0, 50, n))

    l, r = skewed(n_l, 1), skewed(n_r, 2)
    want = _brute(l, r)
    assert sum(1 for a, b in want
               if l["k"].iloc[a] == 7) > len(want) // 3, "skew not planted"

    from folkscope_ray.ops.interval import interval_join

    def run(salt):
        got = interval_join(
            ray.data.from_pandas(l).repartition(5),
            ray.data.from_pandas(r).repartition(7),
            on="k", left_start="s", left_end="e",
            right_start="s", right_end="e", cell=64,
            n_buckets=16, salt=salt).to_pandas()
        return got

    g1, g4 = run(1), run(4)
    assert set(zip(g1["rid"], g1["rid_r"])) == want
    # salt-invariant output, no duplicates from the replicated right side
    p1 = sorted(zip(g1["rid"], g1["rid_r"]))
    p4 = sorted(zip(g4["rid"], g4["rid_r"]))
    assert p1 == p4
    assert not g4.duplicated(["rid", "rid_r"]).any()


def test_interval_join_salt_spreads_hot_bucket():
    """A/B of the documented straggler risk: with everything in ONE
    (key, cell), salt=1 puts every replica in one bucket; salt=4 spreads
    the left side across 4 shards — measured on the replicate stage
    directly (``_make_replicate``), so a regression that silently turns
    the shard term into a no-op fails here even though output stays
    correct."""
    import pyarrow as pa

    from folkscope_ray.ops import interval as iv

    n = 1000
    t = pa.table({"k": pa.array(np.full(n, 7, dtype=np.int64)),
                  "rid": pa.array(np.arange(n, dtype=np.int64)),
                  "s": pa.array(np.arange(n, dtype=np.int64) % 50),
                  "e": pa.array(np.arange(n, dtype=np.int64) % 50 + 3)})

    def bucket_spread(side, salt):
        rep = iv._make_replicate(side, "s", "e", on="k", cell=1 << 40,
                                 salt=salt, n_buckets=64)(t)
        return (set(rep.column("__b").to_pylist()),
                set(rep.column("__t").to_pylist()), rep.num_rows)

    b1, t1, n1 = bucket_spread("L", 1)
    assert len(b1) == 1 and t1 == {0} and n1 == n  # one cell -> one bucket
    b4, t4, n4 = bucket_spread("L", 4)
    assert n4 == n  # left side never duplicates
    assert len(t4) == 4 and len(b4) >= 4  # hot work spread across shards
    # the right side copies every replica to ALL salt shards so each pair
    # still meets exactly once
    br, tr, nr = bucket_spread("R", 4)
    assert nr == 4 * n and len(tr) == 4
    assert br >= b4  # right replicas cover every left shard bucket

    def pairs(salt):
        return iv.interval_join(
            ray.data.from_arrow(t), ray.data.from_arrow(t),
            on="k", left_start="s", left_end="e",
            right_start="s", right_end="e", cell=1 << 40,
            n_buckets=16, salt=salt).count()

    # pair count identical under salting (overlap is mod-50 banded here,
    # so the exact count just needs to match, not equal n^2)
    n1 = pairs(1)
    n4 = pairs(4)
    assert n1 == n4 and n1 > 0


def test_corr_matrix_exact_at_overflowing_magnitudes():
    # per-element q_i*q_j > 2^63 would overflow int64 even at chunk=1; the
    # bignum fallback must keep the result exact
    rng = np.random.RandomState(17)
    base = rng.randint(3_200_000_000, 3_300_000_000, 50).astype(np.float64)
    df = pd.DataFrame({"a": base, "b": base * 0.5 + rng.randint(0, 100, 50)})
    got = corr_matrix(ray.data.from_pandas(df).repartition(3),
                      ["a", "b"], scale=1)
    want = np.corrcoef(df["a"], df["b"])[0, 1]
    assert math.isclose(got["corr"].iloc[0], want, rel_tol=1e-9)
    # partition-invariant in the bignum regime too
    got2 = corr_matrix(ray.data.from_pandas(df).repartition(11),
                       ["a", "b"], scale=1)
    pd.testing.assert_frame_equal(got, got2)


def test_winsorize_by_key_clips_to_group_band():
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.stats import winsorize_by_key

    rng = np.random.RandomState(2)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], size=400),
        "v": rng.randint(0, 1000, size=400).astype("int64"),
        "rid": np.arange(400, dtype="int64"),
    })
    got = (winsorize_by_key(rd.from_pandas(df).repartition(5), "k", "v",
                            ["rid"], q_lo=0.1, q_hi=0.9)
           .to_pandas().sort_values("rid").reset_index(drop=True))
    for key, grp in df.groupby("k"):
        lo = int(np.sort(grp["v"])[max(0, int(np.ceil(0.1 * len(grp))) - 1)])
        hi = int(np.sort(grp["v"])[max(0, int(np.ceil(0.9 * len(grp))) - 1)])
        sub = got[got["k"] == key].set_index("rid")["clipped"]
        src = grp.set_index("rid")["v"]
        assert (sub == src.clip(lo, hi)).all()


def test_grouped_mode_tiebreak_smallest():
    import ray.data as rd

    from folkscope_ray.ops.stats import grouped_mode

    # key 0: value 7 x3 beats 9 x2; key 1: tie 4 x2 vs 8 x2 -> smallest (4)
    df = pd.DataFrame({
        "k": [0, 0, 0, 0, 0, 1, 1, 1, 1],
        "v": [7, 7, 7, 9, 9, 8, 4, 8, 4],
    })
    out = (grouped_mode(rd.from_pandas(df, override_num_blocks=3),
                        key_col="k", value_col="v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["mode_value"].tolist() == [7, 4]
    assert out["n"].tolist() == [3, 2]


def test_mad_by_key_matches_duckdb():
    import duckdb
    import ray.data as rd

    from folkscope_ray.ops.stats import mad_by_key

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "k": rng.randint(0, 4, 300),
        "v": rng.randint(-50, 500, 300).astype(np.int64),
    })
    out = (mad_by_key(rd.from_pandas(df, override_num_blocks=5),
                      key_col="k", value_col="v")
           .to_pandas().sort_values("k").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        WITH m AS (SELECT k, quantile_disc(v, 0.5)::BIGINT AS med
                   FROM t GROUP BY k),
        d AS (SELECT t.k, m.med, abs(t.v - m.med) AS adev
              FROM t JOIN m USING (k))
        SELECT k, min(med)::BIGINT AS med,
               quantile_disc(adev, 0.5)::BIGINT AS mad
        FROM d GROUP BY k ORDER BY k
    """).df()
    con.close()
    assert out["med"].tolist() == exp["med"].tolist()
    assert out["mad"].tolist() == exp["mad"].tolist()


def test_weighted_avg_by_key_matches_duckdb():
    import duckdb
    import ray.data as rd

    from folkscope_ray.ops.stats import weighted_avg_by_key

    rng = np.random.RandomState(21)
    df = pd.DataFrame({
        "k": rng.randint(0, 4, 300),
        "v": rng.randint(-100, 5000, 300).astype(np.int64),
        "w": rng.randint(1, 60, 300).astype(np.int64),
    })
    out = (weighted_avg_by_key(rd.from_pandas(df, override_num_blocks=5),
                               key_col="k", value_col="v", weight_col="w")
           .to_pandas().sort_values("k").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT k, sum(w * v) / sum(w) AS wavg, sum(w)::BIGINT AS total_w
        FROM t GROUP BY k ORDER BY k
    """).df()
    con.close()
    assert (out["wavg"].to_numpy() == exp["wavg"].to_numpy()).all()
    assert out["total_w"].tolist() == exp["total_w"].tolist()


def test_weighted_avg_overflow_guard():
    import pytest as _pytest
    import ray.data as rd

    from folkscope_ray.ops.stats import weighted_avg_by_key

    df = pd.DataFrame({"k": [0], "v": [1 << 40], "w": [1 << 40]})
    with _pytest.raises(Exception):
        weighted_avg_by_key(rd.from_pandas(df), key_col="k",
                            value_col="v", weight_col="w").to_pandas()


def test_upsert_updates_win():
    import ray.data as rd

    from folkscope_ray.ops.stats import upsert

    base = pd.DataFrame({"k": [1, 2, 3], "cents": [10, 20, 30]})
    upd = pd.DataFrame({"k": [2, 4], "cents": [99, 40]})
    out = (upsert(rd.from_pandas(base, override_num_blocks=2),
                  rd.from_pandas(upd, override_num_blocks=2), key_col="k")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["cents"].tolist() == [10, 99, 30, 40]


def test_upsert_duplicate_update_keys_deterministic():
    """Duplicate keys WITHIN the update side must resolve identically at
    any block layout (total payload sort, not arrival order)."""
    import ray.data as rd

    from folkscope_ray.ops.stats import upsert

    base = pd.DataFrame({"k": [1, 2], "cents": [10, 20]})
    upd = pd.DataFrame({"k": [2, 2, 3], "cents": [77, 55, 30]})
    outs = []
    for nb in (1, 2, 3):
        o = (upsert(rd.from_pandas(base, override_num_blocks=2),
                    rd.from_pandas(upd, override_num_blocks=nb),
                    key_col="k")
             .to_pandas().sort_values("k").reset_index(drop=True))
        outs.append(o["cents"].tolist())
    assert outs[0] == outs[1] == outs[2] == [10, 55, 30]


def test_corr_by_key_matches_duckdb_corr():
    """corr_by_key must agree with DuckDB's corr() to float tolerance
    (the driver oracle uses the spelled-out identical formula; this test
    cross-checks against the INDEPENDENT built-in implementation)."""
    import duckdb
    import ray.data as rd

    from folkscope_ray.ops.stats import corr_by_key

    rng = np.random.RandomState(13)
    df = pd.DataFrame({
        "k": rng.randint(0, 4, 400),
        "x": rng.randint(0, 1000, 400).astype(np.float64),
    })
    # y stays integer-valued: quantization at scale 1 must be lossless
    df["y"] = df["x"] * 2.0 + rng.randint(0, 300, 400)
    out = (corr_by_key(rd.from_pandas(df, override_num_blocks=5),
                       key_col="k", col_a="x", col_b="y",
                       scale_a=1, scale_b=1)
           .to_pandas().sort_values("k").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute(
        "SELECT k, corr(x, y) AS c FROM t GROUP BY k ORDER BY k").df()
    con.close()
    assert np.allclose(out["corr"].to_numpy(), exp["c"].to_numpy(),
                       rtol=1e-12)


def test_corr_by_key_zero_variance_null():
    import ray.data as rd

    from folkscope_ray.ops.stats import corr_by_key

    df = pd.DataFrame({"k": [0, 0, 0], "x": [5.0, 5.0, 5.0],
                       "y": [1.0, 2.0, 3.0]})
    out = corr_by_key(rd.from_pandas(df), key_col="k", col_a="x",
                      col_b="y", scale_a=1, scale_b=1).to_pandas()
    assert out["corr"].isna().all()


def test_profile_table_with_nulls():
    import ray.data as rd

    from folkscope_ray.ops.stats import profile_table

    df = pd.DataFrame({
        "a": pd.array([1, 2, 2, None, 5], dtype="Int64"),
        "b": [1.5, 1.5, 1.5, 1.5, 1.5],
    })
    out = (profile_table(rd.from_pandas(df, override_num_blocks=2),
                         ["a", "b"])
           .to_pandas().sort_values("col").reset_index(drop=True))
    a = out[out["col"] == "a"].iloc[0]
    assert (a["n"], a["n_null"], a["n_distinct"]) == (5, 1, 3)
    assert (a["min_v"], a["max_v"]) == (1.0, 5.0)
    b = out[out["col"] == "b"].iloc[0]
    assert (b["n"], b["n_null"], b["n_distinct"]) == (5, 0, 1)


def test_table_checksum_order_insensitive():
    import ray.data as rd

    from folkscope_ray.ops.stats import table_checksum

    df = pd.DataFrame({"a": np.arange(500, dtype=np.int64),
                       "b": (np.arange(500) * 7 % 13).astype(np.int64)})
    shuffled = df.sample(frac=1.0, random_state=4).reset_index(drop=True)
    c1 = table_checksum(rd.from_pandas(df, override_num_blocks=2),
                        ["a", "b"]).to_pandas()
    c2 = table_checksum(rd.from_pandas(shuffled, override_num_blocks=7),
                        ["a", "b"]).to_pandas()
    assert c1.equals(c2)
    # a single changed value changes the checksum
    df2 = df.copy(); df2.loc[250, "b"] = 999
    c3 = table_checksum(rd.from_pandas(df2), ["a", "b"]).to_pandas()
    assert c3["checksum"][0] != c1["checksum"][0]


def test_impute_group_mean_exact_and_all_null_key():
    import numpy as np
    import ray.data as rd

    from folkscope_ray.ops.stats import impute_group_mean

    df = pd.DataFrame({
        "k": ["a"] * 4 + ["b"] * 3 + ["c"] * 2,
        "v": [1.25, None, 2.75, 4.00, None, None, None, 7.50, None],
    })
    out = (impute_group_mean(rd.from_pandas(df, override_num_blocks=4),
                             "k", "v", scale=100)
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    a = out[out.k == "a"]["v_filled"].to_numpy()
    # filled value is EXACTLY float(sum_cents)/float(n*100)
    assert float(800) / float(300) in a
    assert np.isnan(out[out.k == "b"]["v_filled"]).all()  # no non-null → stays null
    assert list(out[out.k == "c"].sort_values("v_filled")["v_filled"]) == [7.5, 7.5]


def test_impute_group_mean_partition_invariant():
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 13, n).astype(str),
        "v": np.round(rng.uniform(1, 100, n), 2),
    })
    df.loc[df.index % 5 == 0, "v"] = None
    from folkscope_ray.ops.stats import impute_group_mean

    outs = []
    for nb in (1, 16):
        o = (impute_group_mean(
                rd.from_pandas(df.assign(i=np.arange(n)),
                               override_num_blocks=nb), "k", "v")
             .to_pandas().sort_values("i").reset_index(drop=True))
        outs.append(o["v_filled"].to_numpy())
    assert (outs[0] == outs[1]).all()  # bit-equal at any parallelism


def test_regr_slope_by_key_matches_numpy_and_degenerate():
    import ray.data as rd

    from folkscope_ray.ops.stats import regr_slope_by_key

    rng = np.random.default_rng(5)
    n = 2000
    df = pd.DataFrame({
        "k": rng.integers(0, 6, n).astype(str),
        "x": rng.integers(1, 50, n).astype(np.int64),
    })
    df["y"] = np.round(3.5 * df.x + rng.normal(0, 4, n), 2)
    # one zero-x-variance key
    df = pd.concat([df, pd.DataFrame(
        {"k": ["z"] * 5, "x": [7] * 5, "y": [1.0, 2.0, 3.0, 4.0, 5.0]})])
    out = (regr_slope_by_key(rd.from_pandas(df, override_num_blocks=6),
                             "k", "x", "y", scale_x=1, scale_y=100)
           .to_pandas().set_index("k"))
    for k, g in df[df.k != "z"].groupby("k"):
        b, a = np.polyfit(g.x, g.y, 1)
        assert abs(out.loc[k, "slope"] - b) < 1e-6
        assert abs(out.loc[k, "icept"] - a) < 1e-4
    assert pd.isna(out.loc["z", "slope"]) and pd.isna(out.loc["z", "icept"])


def test_minmax_normalize_range_and_zero_range_key():
    import ray.data as rd

    from folkscope_ray.ops.stats import minmax_normalize

    df = pd.DataFrame({"k": ["a", "a", "a", "b", "b"],
                       "v": [10.0, 20.0, 30.0, 5.0, 5.0]})
    out = (minmax_normalize(rd.from_pandas(df, override_num_blocks=2),
                            "k", "v")
           .to_pandas().sort_values(["k", "v"]).reset_index(drop=True))
    assert list(out[out.k == "a"]["v_norm"]) == [0.0, 0.5, 1.0]
    assert out[out.k == "b"]["v_norm"].isna().all()  # zero range → NULL
