"""Ordered window functions (ops/window.py): lag/gap, running totals
(single-phase vs chunked two-phase), moving aggregates, pivot, rollup."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from folkscope_ray.ops.window import (
    cumulative_sum,
    lag_gap,
    moving_sum_avg,
    pivot_counts,
    rollup_counts,
)


@pytest.fixture()
def orders_df():
    rng = np.random.RandomState(7)
    n = 400
    return pd.DataFrame({
        "k": rng.randint(0, 5, n),
        "oid": np.arange(n, dtype=np.int64),
        "t": rng.randint(0, 1000, n).astype(np.int64),
        "v": rng.randint(1, 500, n).astype(np.int64),
    })


def test_cumsum_single_phase_matches_pandas(orders_df):
    out = cumulative_sum(
        rd.from_pandas(orders_df, override_num_blocks=7),
        key_col="k", order_cols=["t", "oid"], int_value_col="v",
        alias="running",
    ).to_pandas().sort_values("oid").reset_index(drop=True)
    exp = orders_df.sort_values(["k", "t", "oid"]).copy()
    exp["running"] = exp.groupby("k")["v"].cumsum()
    exp = exp.sort_values("oid").reset_index(drop=True)
    assert (out["running"].to_numpy() == exp["running"].to_numpy()).all()


def test_cumsum_chunked_matches_single_phase(orders_df):
    base = cumulative_sum(
        rd.from_pandas(orders_df, override_num_blocks=5),
        key_col="k", order_cols=["t", "oid"], int_value_col="v",
        alias="running",
    ).to_pandas().sort_values("oid").reset_index(drop=True)
    for chunk in (50, 100, 5000):  # 5000 > max(t): degenerate single chunk
        two = cumulative_sum(
            rd.from_pandas(orders_df, override_num_blocks=5),
            key_col="k", order_cols=["t", "oid"], int_value_col="v",
            alias="running", chunk=chunk, order_int_col="t",
        ).to_pandas().sort_values("oid").reset_index(drop=True)
        assert (two["running"].to_numpy() == base["running"].to_numpy()).all(), chunk


def test_lag_gap_matches_pandas(orders_df):
    df = orders_df.rename(columns={"t": "ts_us"}).assign(
        val=lambda d: d["v"].astype(float))
    out = lag_gap(
        rd.from_pandas(df, override_num_blocks=4),
        key_col="k", order_cols=["ts_us", "oid"], value_col="val",
        ts_us_col="ts_us",
    ).to_pandas().sort_values("oid").reset_index(drop=True)
    exp = df.sort_values(["k", "ts_us", "oid"]).copy()
    exp["prev_value"] = exp.groupby("k")["val"].shift(1).fillna(-1.0)
    exp["gap_us"] = (
        exp["ts_us"] - exp.groupby("k")["ts_us"].shift(1)).fillna(-1).astype("int64")
    exp = exp.sort_values("oid").reset_index(drop=True)
    assert (out["prev_value"].to_numpy() == exp["prev_value"].to_numpy()).all()
    assert (out["gap_us"].to_numpy() == exp["gap_us"].to_numpy()).all()


def test_moving_sum_avg_matches_pandas(orders_df):
    out = moving_sum_avg(
        rd.from_pandas(orders_df, override_num_blocks=4),
        key_col="k", order_cols=["t", "oid"], int_value_col="v", k=3,
        sum_alias="s3", avg_alias="a3", avg_scale=100.0,
    ).to_pandas().sort_values("oid").reset_index(drop=True)
    exp = orders_df.sort_values(["k", "t", "oid"]).copy()
    exp["s3"] = (exp.groupby("k")["v"]
                 .rolling(3, min_periods=1).sum().reset_index(0, drop=True)
                 .astype("int64"))
    cnt = exp.groupby("k").cumcount().clip(upper=2) + 1
    exp["a3"] = exp["s3"] / (100.0 * cnt)
    exp = exp.sort_values("oid").reset_index(drop=True)
    assert (out["s3"].to_numpy() == exp["s3"].to_numpy()).all()
    assert (out["a3"].to_numpy() == exp["a3"].to_numpy()).all()  # bit-exact


def test_pivot_counts(orders_df):
    df = orders_df.assign(cat=np.where(orders_df["v"] % 2 == 0, "even", "odd"))
    out = pivot_counts(
        rd.from_pandas(df, override_num_blocks=4),
        key_col="k", cat_col="cat", categories=["even", "odd"],
    ).to_pandas().sort_values("k").reset_index(drop=True)
    exp = (df.assign(n_even=(df["v"] % 2 == 0).astype(int),
                     n_odd=(df["v"] % 2 == 1).astype(int))
           .groupby("k", as_index=False)
           .agg(n_even=("n_even", "sum"), n_odd=("n_odd", "sum"),
                n_events=("v", "size")))
    assert (out["n_even"].to_numpy() == exp["n_even"].to_numpy()).all()
    assert (out["n_odd"].to_numpy() == exp["n_odd"].to_numpy()).all()
    assert (out["n_events"].to_numpy() == exp["n_events"].to_numpy()).all()


def test_rollup_counts(orders_df):
    df = orders_df.assign(a=np.where(orders_df["k"] < 2, "x", "y"),
                          b=orders_df["k"].astype(str))
    out = rollup_counts(
        rd.from_pandas(df, override_num_blocks=4),
        keys=["a", "b"], int_value_col="v", sum_alias="tv",
    ).to_pandas()
    # grand total row
    g = out[(out["a"] == "ALL") & (out["b"] == "ALL")]
    assert len(g) == 1 and g["tv"].iloc[0] == df["v"].sum() and g["n"].iloc[0] == len(df)
    # one-level rollup matches a direct groupby
    lvl1 = (out[(out["a"] != "ALL") & (out["b"] == "ALL")]
            .sort_values("a").reset_index(drop=True))
    exp1 = (df.groupby("a", as_index=False).agg(tv=("v", "sum"), n=("v", "size")))
    assert (lvl1["tv"].to_numpy() == exp1["tv"].to_numpy()).all()
    # finest level count = distinct (a,b) combos
    finest = out[(out["a"] != "ALL") & (out["b"] != "ALL")]
    assert len(finest) == df.groupby(["a", "b"]).ngroups


def test_dense_rank_and_ntile_match_duckdb():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.window import dense_rank, ntile

    rng = np.random.RandomState(17)
    df = pd.DataFrame({
        "i": np.arange(2000, dtype=np.int64),
        "k": rng.randint(0, 7, 2000),
        # coarse values force plenty of ties for the dense-rank semantics
        "v": rng.randint(0, 25, 2000).astype(np.int64),
    })
    duckdb.register("t", df)
    got_dr = (dense_rank(rd.from_pandas(df).repartition(5), key_col="k",
                         value_col="v", ascending=False)
              .to_pandas().sort_values("i").reset_index(drop=True))
    want_dr = duckdb.sql("""
        SELECT i, k, v,
               DENSE_RANK() OVER (PARTITION BY k ORDER BY v DESC) AS rnk
        FROM t ORDER BY i
    """).df().reset_index(drop=True)
    assert got_dr["rnk"].astype(int).tolist() == want_dr["rnk"].astype(int).tolist()

    got_nt = (ntile(rd.from_pandas(df).repartition(5), key_col="k",
                    order_cols=["v", "i"], n=4)
              .to_pandas().sort_values("i").reset_index(drop=True))
    want_nt = duckdb.sql("""
        SELECT i, k, v,
               NTILE(4) OVER (PARTITION BY k ORDER BY v, i) AS tile
        FROM t ORDER BY i
    """).df().reset_index(drop=True)
    assert got_nt["tile"].astype(int).tolist() == want_nt["tile"].astype(int).tolist()
    # degenerate keys smaller than n: each row its own tile
    tiny = pd.DataFrame({"i": [0, 1], "k": [99, 99], "v": [5, 3]})
    got_tiny = (ntile(rd.from_pandas(tiny), key_col="k",
                      order_cols=["v", "i"], n=4)
                .to_pandas().sort_values("v").reset_index(drop=True))
    assert got_tiny["tile"].tolist() == [1, 2]


def test_resample_ffill_planted_gaps():
    """Hourly grid per key with forward-filled gaps; last-in-bucket wins
    with event-id tiebreak; grids are per-key (no global range)."""
    import ray.data as rd

    from folkscope_ray.ops.window import resample_ffill

    H = 3_600_000_000
    rows = [
        # user 1: events in hours 0 and 3 -> grid 0..3, hours 1-2 ffilled
        (0, "2024-01-01 00:10:00", 1, 1.0),
        (1, "2024-01-01 03:20:00", 1, 4.0),
        # user 1, hour 0: a second event later in the hour wins
        (2, "2024-01-01 00:50:00", 1, 2.0),
        # user 2: single event -> one-row grid
        (3, "2024-01-01 05:00:01", 2, 9.0),
        # user 3: two events at the IDENTICAL timestamp -> higher id wins
        (4, "2024-01-01 07:30:00", 3, 5.0),
        (5, "2024-01-01 07:30:00", 3, 6.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    outs = []
    for nb in (1, 5):
        out = (resample_ffill(rd.from_pandas(df, override_num_blocks=2),
                              "user_id", "ts", "value", H, "event_id",
                              n_buckets=nb)
               .to_pandas().sort_values(["user_id", "bucket"])
               .reset_index(drop=True))
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    got = {(int(r.user_id), int(r.bucket) % 24): r.value_f
           for r in outs[0].itertuples()}
    base = int(pd.Timestamp("2024-01-01").value // 1000 // H)
    u1 = [v for (u, b), v in sorted(got.items()) if u == 1]
    assert u1 == [2.0, 2.0, 2.0, 4.0]   # hour0 last event wins, ffill 1-2
    assert [v for (u, _b), v in got.items() if u == 2] == [9.0]
    assert [v for (u, _b), v in got.items() if u == 3] == [6.0]  # id tiebreak
    assert len(outs[0]) == 4 + 1 + 1


def test_cube_counts_matches_duckdb_cube():
    import duckdb
    import ray.data as rd

    from folkscope_ray.ops.window import cube_counts

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], size=2000),
        "b": rng.choice(["p", "q"], size=2000),
        "v": rng.randint(0, 1000, size=2000).astype("int64"),
    })
    got = (cube_counts(rd.from_pandas(df).repartition(5), ["a", "b"],
                       "v", "total")
           .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
    want = duckdb.sql(
        "SELECT COALESCE(a, 'ALL') AS a, COALESCE(b, 'ALL') AS b,"
        " SUM(v)::BIGINT AS total, count(*) AS n"
        " FROM df GROUP BY CUBE(a, b)"
    ).df().sort_values(["a", "b"]).reset_index(drop=True)
    assert got["a"].tolist() == want["a"].tolist()
    assert got["b"].tolist() == want["b"].tolist()
    assert got["total"].astype(int).tolist() == want["total"].astype(int).tolist()
    assert got["n"].astype(int).tolist() == want["n"].astype(int).tolist()


def test_rank_stats_ties_match_duckdb():
    import duckdb
    import ray.data as rd

    from folkscope_ray.ops.window import rank_stats

    rng = np.random.RandomState(12)
    df = pd.DataFrame({
        "k": rng.choice(["a", "b"], size=400),
        "v": rng.randint(0, 12, size=400).astype("int64"),  # heavy ties
        "rid": np.arange(400, dtype="int64"),
    })
    # lone-row key: percent_rank must be 0.0, cume_dist 1.0
    df = pd.concat([df, pd.DataFrame({"k": ["solo"], "v": [5],
                                      "rid": [999]})], ignore_index=True)
    got = (rank_stats(rd.from_pandas(df).repartition(6), "k", "v")
           .to_pandas().sort_values(["k", "v", "rid"])
           .reset_index(drop=True))
    want = duckdb.sql(
        "SELECT k, v, rid, rank() OVER w AS rnk,"
        " percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume"
        " FROM df WINDOW w AS (PARTITION BY k ORDER BY v)"
        " ORDER BY k, v, rid"
    ).df().reset_index(drop=True)
    assert got["rnk"].astype(int).tolist() == want["rnk"].astype(int).tolist()
    # bit-exact doubles (single IEEE division of identical exact operands)
    assert got["pct_rank"].tolist() == want["pct_rank"].tolist()
    assert got["cume"].tolist() == want["cume"].tolist()
    solo = got[got["k"] == "solo"].iloc[0]
    assert solo["pct_rank"] == 0.0 and solo["cume"] == 1.0


def test_unpivot_matches_duckdb():
    import duckdb

    from folkscope_ray.ops.window import unpivot

    df = pd.DataFrame({"id": np.arange(5, dtype="int64"),
                       "x": np.arange(5, dtype="int64") * 2,
                       "y": np.arange(5, dtype="int64") * 3.5})
    got = (unpivot(rd.from_pandas(df).repartition(2), ["id"], ["x", "y"])
           .to_pandas().sort_values(["id", "name"]).reset_index(drop=True))
    want = duckdb.sql(
        "UNPIVOT (SELECT id, x::DOUBLE AS x, y::DOUBLE AS y FROM df)"
        " ON x, y INTO NAME name VALUE value"
    ).df().sort_values(["id", "name"]).reset_index(drop=True)
    assert got["name"].tolist() == want["name"].tolist()
    assert got["value"].tolist() == want["value"].tolist()


def test_rolling_median_full_frames_matches_pandas(orders_df):
    from folkscope_ray.ops.window import rolling_median

    df = orders_df.copy()
    df["val"] = df["v"].astype("float64") + 0.25
    out = rolling_median(
        rd.from_pandas(df, override_num_blocks=6),
        key_col="k", order_cols=["t", "oid"], value_col="val", k=5,
        alias="med5",
    ).to_pandas().sort_values("oid").reset_index(drop=True)
    exp = df.sort_values(["k", "t", "oid"]).copy()
    exp["med5"] = (exp.groupby("k")["val"]
                   .rolling(5, min_periods=5).median()
                   .reset_index(level=0, drop=True))
    exp = exp[exp["med5"].notna()].sort_values("oid").reset_index(drop=True)
    assert len(out) == len(exp)
    # full odd frames: exact element selection, so bit-equal doubles
    assert (out["med5"].to_numpy() == exp["med5"].to_numpy()).all()


def test_rolling_median_partial_frames(orders_df):
    from folkscope_ray.ops.window import rolling_median

    df = orders_df.copy()
    df["val"] = df["v"].astype("float64")
    out = rolling_median(
        rd.from_pandas(df, override_num_blocks=4),
        key_col="k", order_cols=["t", "oid"], value_col="val", k=3,
        alias="m", full_frames_only=False,
    ).to_pandas()
    assert len(out) == len(df)  # every row emitted
    assert out["m"].notna().all()


def test_transition_counts_matches_pandas(orders_df):
    from folkscope_ray.ops.window import transition_counts

    df = orders_df.copy()
    df["cat"] = np.array(["a", "b", "c", "d"])[df["v"].to_numpy() % 4]
    out = transition_counts(
        rd.from_pandas(df, override_num_blocks=6),
        key_col="k", order_cols=["t", "oid"], cat_col="cat",
    ).to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exp_df = df.sort_values(["k", "t", "oid"])
    prev = exp_df.groupby("k")["cat"].shift(1)
    m = prev.notna()
    exp = (pd.DataFrame({"src": prev[m], "dst": exp_df["cat"][m]})
           .groupby(["src", "dst"]).size().reset_index(name="n")
           .sort_values(["src", "dst"]).reset_index(drop=True))
    assert out["n"].to_numpy().tolist() == exp["n"].to_numpy().tolist()
    assert out["src"].tolist() == exp["src"].tolist()
    assert out["dst"].tolist() == exp["dst"].tolist()


def test_funnel_counts_planted_sequences():
    from folkscope_ray.ops.window import funnel_counts

    # user 1: full a->b->c in order; user 2: b before a (stops at stage 1);
    # user 3: a only; user 4: a and b simultaneous (strict > rejects b)
    df = pd.DataFrame({
        "u":  [1, 1, 1, 2, 2, 2, 3, 4, 4],
        "ts": [10, 20, 30, 5, 1, 50, 7, 10, 10],
        "c":  ["a", "b", "c", "a", "b", "c", "a", "a", "b"],
    })
    out = funnel_counts(
        rd.from_pandas(df, override_num_blocks=3),
        key_col="u", ts_col="ts", cat_col="c", stages=["a", "b", "c"],
    ).to_pandas().sort_values("stage").reset_index(drop=True)
    # stage 1: users 1-4 all have an 'a'; stage 2: user 1 only (u2's b
    # precedes its a, u4's b ties its a and strict > rejects it); stage 3:
    # user 1 (u2 never reaches stage 2, so its c@50 cannot count)
    assert out["users"].tolist() == [4, 1, 1]


def test_collect_topk_matches_duckdb():
    import duckdb

    from folkscope_ray.ops.window import collect_topk

    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "g": rng.randint(0, 4, 200),
        "id": np.arange(200, dtype=np.int64),
        "score": rng.randint(0, 40, 200).astype(np.int64),
    })
    out = collect_topk(
        rd.from_pandas(df, override_num_blocks=5),
        key_col="g", id_col="id", order_cols=["score", "id"],
        ascending=[False, True], k=7,
    ).to_pandas().sort_values("g").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        WITH r AS (SELECT g, id, row_number() OVER (
            PARTITION BY g ORDER BY score DESC, id) AS rn FROM t)
        SELECT g, string_agg(id::VARCHAR, ',' ORDER BY rn) AS ids,
               count(*)::BIGINT AS n
        FROM r WHERE rn <= 7 GROUP BY g ORDER BY g
    """).df()
    con.close()
    assert out["ids"].tolist() == exp["ids"].tolist()
    assert out["n"].tolist() == exp["n"].tolist()


def test_retention_cohorts_planted():
    from folkscope_ray.ops.window import retention_cohorts

    # u1 active day0, day1, day3 (day1 twice: distinct-day dedup);
    # u2 active day5 only -> its dn=0; u3 day2 and day4 -> dn 0 and 2
    base = np.datetime64("2025-01-01T12:00:00")
    day = np.timedelta64(1, "D")
    df = pd.DataFrame({
        "u":  [1, 1, 1, 1, 2, 3, 3],
        "ts": [base, base + day, base + day, base + 3 * day,
               base + 5 * day, base + 2 * day, base + 4 * day],
    })
    out = retention_cohorts(
        rd.from_pandas(df, override_num_blocks=3),
        key_col="u", ts_col="ts",
    ).to_pandas().sort_values("dn").reset_index(drop=True)
    assert out["dn"].tolist() == [0, 1, 2, 3]
    assert out["users"].tolist() == [3, 1, 1, 1]


def test_regex_extract_matches_duckdb():
    import duckdb
    import pyarrow as paw

    from folkscope_ray.ops.text import regex_extract_batch

    texts = ["alpha beta sun set", "no hits here?", "", "stone soup stew",
             "s sss s1 ss"]
    t = paw.table({"doc_id": list(range(5)), "text": texts})
    out = regex_extract_batch(t, r"s[a-z]+").to_pandas()
    con = duckdb.connect()
    exp = con.execute("""
        SELECT doc_id, regexp_extract(text, 's[a-z]+') AS first_match,
               length(regexp_extract_all(text, 's[a-z]+'))::BIGINT AS n
        FROM t ORDER BY doc_id
    """, ).df()
    con.close()
    assert out["first_match"].tolist() == exp["first_match"].tolist()
    assert out["n_matches"].tolist() == exp["n"].tolist()


def test_islands_planted_runs():
    from folkscope_ray.ops.window import islands

    # key 1: 1,2,3 | 7 | 9,10 (with dup 2); key 2: single value
    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 1, 1, 1, 2],
        "v": [1, 2, 2, 3, 7, 9, 10, 4],
    })
    out = (islands(rd.from_pandas(df, override_num_blocks=3),
                   key_col="k", int_col="v")
           .to_pandas().sort_values(["k", "start_v"]).reset_index(drop=True))
    assert out[["k", "start_v", "end_v", "len"]].values.tolist() == [
        [1, 1, 3, 3], [1, 7, 7, 1], [1, 9, 10, 2], [2, 4, 4, 1]]


def test_ratio_to_report_bit_exact():
    import duckdb

    from folkscope_ray.ops.window import ratio_to_report

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "i": np.arange(200, dtype=np.int64),
        "k": rng.randint(0, 6, 200),
        "v": rng.randint(1, 10_000, 200).astype(np.int64),
    })
    out = (ratio_to_report(rd.from_pandas(df, override_num_blocks=4),
                           key_col="k", int_value_col="v", id_cols=["i"])
           .to_pandas().sort_values("i").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT i, v / sum(v) OVER (PARTITION BY k) AS share
        FROM t ORDER BY i
    """).df()
    con.close()
    # identical int64 operands -> ONE IEEE division -> bit-equal doubles
    assert (out["share"].to_numpy() == exp["share"].to_numpy()).all()


def test_normalize_text_matches_duckdb():
    import duckdb
    import pyarrow as paw

    from folkscope_ray.ops.text import normalize_text_batch

    texts = ["  Hello\t\tWORLD  x ", "a", "", "No  Change", "MiXeD\ncase\r\n"]
    t = paw.table({"doc_id": list(range(5)), "text": texts})
    out = normalize_text_batch(t).column("norm").to_pylist()
    con = duckdb.connect()
    exp = [con.execute(
        "SELECT trim(regexp_replace(lower(?), '\\s+', ' ', 'g'))",
        [s]).fetchone()[0] for s in texts]
    con.close()
    assert out == exp


def test_compress_runs_planted():
    from folkscope_ray.ops.window import compress_runs

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 1, 2, 2],
        "t": [1, 2, 3, 4, 5, 1, 2],
        "v": ["a", "a", "b", "b", "a", "x", "x"],
    })
    out = (compress_runs(rd.from_pandas(df, override_num_blocks=3),
                         key_col="k", order_cols=["t"], value_col="v")
           .to_pandas().sort_values(["k", "t"]).reset_index(drop=True))
    # key 1: a@1, b@3, a@5 survive; key 2: x@1
    assert out["t"].tolist() == [1, 3, 5, 1]
    assert out["v"].tolist() == ["a", "b", "a", "x"]


def test_time_rollup_one_pass_matches_per_grain():
    from folkscope_ray.ops.window import time_rollup

    rng = np.random.RandomState(31)
    ts = pd.to_datetime(rng.randint(0, 10 * 86400, 500), unit="s")
    df = pd.DataFrame({"ts": ts})
    out = (time_rollup(rd.from_pandas(df, override_num_blocks=4),
                       ts_col="ts", grains={"day": 86400, "hour": 3600})
           .to_pandas())
    secs = ts.astype("int64") // 1_000_000_000
    for grain, w in (("day", 86400), ("hour", 3600)):
        exp = (secs // w).value_counts().sort_index()
        got = (out[out["grain"] == grain]
               .sort_values("bucket").set_index("bucket")["n"])
        assert got.index.tolist() == exp.index.tolist()
        assert got.tolist() == exp.tolist()


def test_windowed_distinct_exact_and_partition_invariant():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.relational import windowed_distinct

    rng = np.random.default_rng(3)
    n = 5000
    df = pd.DataFrame({
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 48 * 3600, n), unit="s"),
        "user_id": rng.integers(0, 200, n),
    })
    expect = (df.assign(w=(df.ts.astype("int64") // 10**9 // 3600) * 3600)
              .groupby("w")["user_id"].nunique())
    outs = []
    for nb in (1, 8):
        o = (windowed_distinct(rd.from_pandas(df, override_num_blocks=nb),
                               "ts", "user_id", 3600)
             .to_pandas().sort_values("window_start").reset_index(drop=True))
        outs.append(o)
    for o in outs:
        assert len(o) == len(expect)
        assert (o.set_index("window_start")["n_distinct"] == expect).all()
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_collect_ordered_matches_string_agg_and_partition_invariant():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.window import collect_ordered

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame({
        "k": rng.integers(0, 40, n),
        "id": np.arange(n),
        "v": rng.choice(list("abcde"), n),
    })
    con = duckdb.connect(); con.register("t", df)
    exp = con.execute(
        "SELECT k, string_agg(v, ',' ORDER BY id) AS vals,"
        " COUNT(*)::BIGINT AS n FROM t GROUP BY k ORDER BY k").df()
    con.close()
    outs = []
    for nb in (1, 8):
        o = (collect_ordered(rd.from_pandas(df, override_num_blocks=nb),
                             "k", "v", ["id"])
             .to_pandas().sort_values("k").reset_index(drop=True))
        outs.append(o)
    pd.testing.assert_frame_equal(outs[0], exp.astype({"k": outs[0].k.dtype}))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_trailing_range_sum_matches_duckdb_and_ties():
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.window import trailing_range_sum

    rng = np.random.default_rng(13)
    n = 2000
    df = pd.DataFrame({
        "id": np.arange(n),
        "k": rng.integers(0, 12, n),
        # coarse second grid plants plenty of exact-timestamp TIES
        "ts": pd.to_datetime("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 600, n) * 60, unit="s"),
        "v": rng.integers(1, 1000, n).astype(np.int64),
    })
    con = duckdb.connect(); con.register("t", df)
    exp = con.execute("""
        SELECT id, SUM(v) OVER w::BIGINT AS win_sum,
               COUNT(*) OVER w::BIGINT AS win_n
        FROM t WINDOW w AS (PARTITION BY k ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY id""").df()
    con.close()
    for nb in (1, 8):
        got = (trailing_range_sum(rd.from_pandas(df, override_num_blocks=nb),
                                  "k", "ts", "v", range_s=3600)
               .to_pandas().sort_values("id").reset_index(drop=True))
        assert got["win_sum"].tolist() == exp["win_sum"].tolist()
        assert got["win_n"].tolist() == exp["win_n"].tolist()
    # ties at identical ts see the whole tied group (RANGE, not ROWS)
    tied = df[df.duplicated(subset=["k", "ts"], keep=False)]
    assert len(tied) > 0
