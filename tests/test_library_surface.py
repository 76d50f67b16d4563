"""Tests for the user-extension surface: extractor API, metrics, pattern
text interop, cleaning, new relational ops."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from folkscope_ray.extractor import EventualityExtractor
from folkscope_ray.functions.metrics import (
    classification_metrics,
    pr_curve,
    score_to_label,
    threshold_for_precision,
)
from folkscope_ray.lexicon import assertion_text
from folkscope_ray.patterns import (
    decode_pattern,
    pattern_of_parsed,
    patterns_from_lg,
    patterns_to_lg,
)
from folkscope_ray.stages.parse import parse_assertion
from folkscope_ray.synth import annotations_rows


def _pattern_for(rel: str, gen_idx: int = 0):
    text = assertion_text(rel, "json_parser", "lru_cache", gen_idx)
    toks, lems, pos, deps = parse_assertion(rel, text)
    return decode_pattern(pattern_of_parsed(rel, pos, deps), 5)


def test_extractor_from_text_and_any():
    p = _pattern_for("usedFor")
    ex = EventualityExtractor([p])
    text = assertion_text("usedFor", "json_parser", "lru_cache", 0)
    evs = ex.extract_from_text("usedFor", text)
    assert len(evs) == 1 and evs[0]["words"][0] == "they"
    assert ex.extract_from_text("usedFor", "unrelated text") == []
    assert ex.extract_from_text("isA", text) == []
    assert len(ex.extract_any(text)) == 1


def test_pattern_lg_roundtrip():
    pats = [_pattern_for("usedFor"), _pattern_for("isA")]
    text = patterns_to_lg(pats)
    assert text.startswith("t # 5\n")
    back_used = patterns_from_lg(text, "usedFor")
    assert len(back_used) == 2
    assert back_used[0].verts == pats[0].verts
    assert set(back_used[0].edges) == set(pats[0].edges)


def test_metrics_math():
    labels = ["v", "v", "i", "i"]
    preds = ["v", "i", "v", "i"]
    m = classification_metrics(labels, preds)
    assert m["tp"] == 1 and m["fp"] == 1 and m["fn"] == 1 and m["tn"] == 1
    assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["accuracy"] == 0.5
    assert (score_to_label([0.4, 0.6], 0.5) == np.array(["i", "v"])).all()


def test_pr_threshold_selection_on_annotations():
    rows = annotations_rows(500)
    labels = [r["majority_answer"] for r in rows]
    scores = [r["quality"] for r in rows]
    ts, ps, rs = pr_curve(labels, scores)
    # precision grows toward high thresholds (last point is degenerate: no
    # predictions above t=1.0 -> precision 0)
    assert ps[-2] >= ps[0]
    assert rs[0] == 1.0  # threshold 0 predicts everything positive
    t = threshold_for_precision(labels, scores, 0.9)
    assert t is not None
    m = classification_metrics(labels, score_to_label(scores, t))
    assert m["precision"] >= 0.9


def test_clean_text_semantics():
    from folkscope_ray.ops.text import clean_text

    assert clean_text("héllo  <ref name=x>cite</ref> see https://a.b/c ok") == \
        "hllo <ref>cite</ref> see <url> ok"


def test_session_windows_gap_logic():
    import ray.data as rd

    from folkscope_ray.ops.relational import session_windows

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    for i, off in enumerate([0, 100, 200, 5000, 5100]):  # gap 1800s splits at idx 3
        rows.append({"event_id": i, "user_id": 1, "ts": base + pd.Timedelta(seconds=off)})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = session_windows(ds, "ts", "user_id", "event_id", gap_s=1800).to_pandas()
    out = out.sort_values("session_id").reset_index(drop=True)
    assert len(out) == 2
    assert out.loc[0, "n_events"] == 3 and out.loc[1, "n_events"] == 2


def test_session_windows_chunked_scale_path_identical():
    """Two-phase (chunked) sessionization must equal the single-group path
    exactly — including for a hot key spanning many chunks and sessions that
    straddle chunk boundaries."""
    import ray.data as rd

    from folkscope_ray.ops.relational import session_windows
    from folkscope_ray.util import stable_u64

    base = pd.Timestamp("2024-01-01 00:00:00")
    rows = []
    eid = 0
    # hot key 0: deterministic pseudo-random offsets over ~3 days, dense
    t = 0
    for i in range(600):
        t += stable_u64("gap", i) % 2400  # gaps 0..2399s around the 1800 split
        rows.append({"event_id": eid, "user_id": 0,
                     "ts": base + pd.Timedelta(seconds=t)})
        eid += 1
    # sparse keys, including a session crossing a chunk boundary exactly
    for u in (1, 2):
        for off in (3595, 3600, 3605, 99999, 3600 * 12 - 1, 3600 * 12 + 1):
            rows.append({"event_id": eid, "user_id": u,
                         "ts": base + pd.Timedelta(seconds=off)})
            eid += 1
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(7)
    kw = dict(ts_col="ts", key_col="user_id", id_col="event_id", gap_s=1800)
    single = session_windows(ds, **kw).to_pandas()
    chunked = session_windows(ds, **kw, chunk_s=3600).to_pandas()
    cols = ["user_id", "session_id", "n_events", "start_epoch", "end_epoch"]
    a = single[cols].sort_values(cols).reset_index(drop=True)
    b = chunked[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b.astype(a.dtypes.to_dict()))


def test_asof_join_semantics():
    """Backward as-of with exact matches: latest right ts <= left ts per
    key; unmatched left rows survive with nulls; output invariant to input
    partitioning (hash co-partition, per-bucket merge_asof)."""
    import ray.data as rd

    from folkscope_ray.ops.relational import asof_join

    base = pd.Timestamp("2024-01-01")
    left = pd.DataFrame(
        {"event_id": [1, 2, 3, 4],
         "user_id": [1, 1, 2, 3],
         "ts": [base + pd.Timedelta(seconds=s) for s in (100, 50, 10, 9)]})
    right = pd.DataFrame(
        {"event_id": [10, 11, 12, 13],
         "user_id": [1, 1, 1, 2],
         "ts": [base + pd.Timedelta(seconds=s) for s in (40, 100, 200, 10)]})

    def run(lb, rb):
        out = asof_join(rd.from_pandas(left).repartition(lb),
                        rd.from_pandas(right).repartition(rb),
                        key_col="user_id", on_col="ts").to_pandas()
        return out.sort_values("event_id").reset_index(drop=True)

    out = run(1, 1)
    got = {int(r.event_id): (None if pd.isna(r.ts_asof)
                             else int((r.ts_asof - base).total_seconds()))
           for r in out.itertuples()}
    # exact match allowed (100 -> 100); backward pick (50 -> 40);
    # exact (10 -> 10); no match for user 3
    assert got == {1: 100, 2: 40, 3: 10, 4: None}
    out2 = run(3, 2)
    pd.testing.assert_frame_equal(out, out2.astype(out.dtypes.to_dict()))


def test_range_join_semantics():
    """Broadcast interval join: half-open [lo, hi) banding, rows outside all
    intervals dropped, partition-invariant; overlap rejected."""
    import pytest
    import ray.data as rd

    from folkscope_ray.ops.relational import range_join

    bands = pd.DataFrame(
        {"band": ["a", "b"], "lo": [0.0, 10.0], "hi": [10.0, 20.0]})
    df = pd.DataFrame({"id": [1, 2, 3, 4, 5],
                       "v": [0.0, 9.999, 10.0, 19.999, 20.0]})

    def run(nb):
        out = range_join(rd.from_pandas(df).repartition(nb), bands,
                         value_col="v").to_pandas()
        return out.sort_values("id").reset_index(drop=True)

    out = run(1)
    assert dict(zip(out["id"], out["band"])) == {1: "a", 2: "a", 3: "b", 4: "b"}
    pd.testing.assert_frame_equal(out, run(4).astype(out.dtypes.to_dict()))

    with pytest.raises(ValueError):
        range_join(rd.from_pandas(df),
                   pd.DataFrame({"band": ["a", "b"],
                                 "lo": [0.0, 5.0], "hi": [10.0, 20.0]}),
                   value_col="v")


def test_mean_vector_by_key():
    import ray.data as rd

    from folkscope_ray.ops.vector import mean_vector_by_key

    df = pd.DataFrame(
        {"label": [0, 0, 1], "embedding": [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]}
    )
    out = mean_vector_by_key(rd.from_pandas(df), "label", "embedding")
    got = {(r.label, r.dim): r.mean_val for r in out.itertuples()}
    assert got[(0, 0)] == 2.0 and got[(0, 1)] == 3.0
    assert got[(1, 0)] == 5.0 and got[(1, 1)] == 6.0


def test_mean_vector_by_key_null_key_gets_own_group():
    """A null key must form its OWN group (the dict loop this partial
    replaced emitted a None-keyed row): pd.factorize's default -1 sentinel
    would silently np.add.at the null-key vectors into the LAST key's sum
    and then crash bincount on the negative code."""
    import pyarrow as pa
    import ray.data as rd

    from folkscope_ray.ops.vector import mean_vector_by_key

    t = pa.table({
        "label": pa.array(["a", None, "a", None], pa.string()),
        "embedding": pa.array([[1.0, 2.0], [10.0, 20.0],
                               [3.0, 4.0], [30.0, 40.0]],
                              pa.list_(pa.float64())),
    })
    out = mean_vector_by_key(rd.from_arrow(t), "label", "embedding")
    got = {(r.label, r.dim): r.mean_val for r in out.itertuples()}
    # the 'a' rows are untouched by the null-key vectors
    assert got[("a", 0)] == 2.0 and got[("a", 1)] == 3.0
    null_rows = out[out["label"].isna()]
    assert sorted(null_rows["mean_val"]) == [20.0, 30.0]


def test_pattern_hierarchy():
    from folkscope_ray.patterns import build_hierarchy

    big = _pattern_for("isA", 0)   # template + obj NN(s)
    # a contained pattern: strip the last vertex and its edges
    from folkscope_ray.patterns import Pattern

    small = Pattern(
        big.rel, big.verts[:-1],
        tuple(e for e in big.edges if len(big.verts) - 1 not in (e[0], e[2])),
        1,
    )
    h = build_hierarchy([big, small])
    assert small.key in h[big.key]
    assert h[small.key] == []


def test_critic_text_prep():
    from folkscope_ray.stages.critic import prep_critic_batch, prep_critic_text

    assert prep_critic_text("Item A works with Item B", "json_parser", "lru_cache") == \
        "json_parser works with lru_cache"
    b = pa.table({"assertion": ["Item A and Item B"], "surf_a": ["x"], "surf_b": ["y"]})
    out = prep_critic_batch(b)
    assert out.column("critic_input").to_pylist() == ["x and y"]


def test_read_source_files_pushdown(tmp_path):
    import ray

    from folkscope_ray.sources.io import read_source_files
    from folkscope_ray.synth import corpus_path

    src = corpus_path(200)
    ds = read_source_files(src, langs=["python"], columns=["repo", "lang"])
    df = ds.to_pandas()
    assert set(df.columns) == {"repo", "lang"}
    assert (df["lang"] == "python").all() and len(df) > 0


def test_split_sentences():
    from folkscope_ray.ops.text import split_sentences

    assert split_sentences("short text") == ["short text"]
    long = ("para one sentence. " * 40 + "\n\n" + "para two sentence. " * 40)
    parts = split_sentences(long, max_len=200)
    assert all(len(p) <= 200 for p in parts) and len(parts) > 2
    assert split_sentences("") == []


def test_slice_at_template():
    from folkscope_ray.stages.parse import slice_at_template

    gen = 'He bought "A" and "B" because they are both used for data caching'
    assert slice_at_template("usedFor", gen) == "they are both used for data caching"
    assert slice_at_template("usedFor", "no template here") is None
    assert slice_at_template("open", gen) is None


def test_seed_rule_conceptualize():
    from folkscope_ray.stages.conceptualize import seed_rule_conceptualize

    # reference parity (conceptualizer.py:266-277 ners_dict[ner][word]):
    # each TYPE counts its own distinct words from 0
    words = ["he", "visited", "paris", "with", "acme"]
    ners = ["O", "O", "CITY", "O", "ORGANIZATION"]
    out = seed_rule_conceptualize(words, ners)
    assert out == ["__PERSON__0", "visited", "__CITY__0", "with",
                   "__ORGANIZATION__0"]
    # two distinct same-type mentions get DISTINCT indices; a repeated
    # mention reuses its index
    out2 = seed_rule_conceptualize(
        ["alice", "met", "bob", "and", "alice"],
        ["PERSON", "O", "PERSON", "O", "PERSON"])
    assert out2 == ["__PERSON__0", "met", "__PERSON__1", "and",
                    "__PERSON__0"]
    assert seed_rule_conceptualize(["plain", "words"]) == ["plain", "words"]


def test_compound_segments():
    from folkscope_ray.stages.conceptualize import compound_segments

    words = ["data", "cache", "is", "fast"]
    deps = [(1, "compound", 0), (3, "nsubj", 1), (3, "cop", 2)]
    assert compound_segments(words, deps) == [(0, 2), (2, 3), (3, 4)]
    # no compounds -> all singleton spans
    assert compound_segments(["a", "b"], [(1, "nsubj", 0)]) == [(0, 1), (1, 2)]


def test_read_csv_source(tmp_path):
    import ray.data as rd
    import duckdb

    csv = tmp_path / "region.csv"
    duckdb.sql(
        "COPY (SELECT * FROM read_parquet('/root/testdata/sf0.001/region.parquet')) "
        f"TO '{csv}' (HEADER)"
    )
    ds = rd.read_csv(str(csv))
    assert ds.count() == 5 and "r_name" in ds.schema().names


def test_sliding_window_fanout_and_tumbling_degeneracy():
    import numpy as np
    import ray.data as rd

    from folkscope_ray.ops.relational import sliding_window, tumbling_window

    base = pd.Timestamp("2024-01-01 00:00:00")
    rng = np.random.RandomState(6)
    rows = [
        {"user_id": int(i % 3), "value": float(i),
         "ts": base + pd.Timedelta(seconds=int(rng.randint(0, 7200)))}
        for i in range(200)
    ]
    ds = rd.from_pandas(pd.DataFrame(rows)).repartition(5)
    # w == s degenerates to tumbling: same (key, window, count, sum)
    slid = (sliding_window(ds, "ts", "user_id", "value", 900, 900)
            .to_pandas()[["user_id", "window_start", "n_events", "sum_value"]]
            .sort_values(["user_id", "window_start"]).reset_index(drop=True))
    tumb = (tumbling_window(ds, "ts", "user_id", "value", 900)
            .to_pandas()[["user_id", "window_start", "n_events", "sum_value"]]
            .sort_values(["user_id", "window_start"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(slid, tumb)
    # w = 4s: total (event, window) memberships = 4x the event count
    slid4 = sliding_window(ds, "ts", "user_id", "value", 3600, 900).to_pandas()
    assert int(slid4["n_events"].sum()) == 4 * 200


def test_jsonl_roundtrip(tmp_path):
    import ray.data as rd

    from folkscope_ray.sources.io import read_jsonl, write_jsonl

    df = pd.DataFrame({
        "pair_id": [f"p{i}" for i in range(50)],
        "relation": ["open", "use"] * 25,
        "assertion": [f"assertion text {i}" for i in range(50)],
        "score": np.linspace(0.0, 1.0, 50),
    })
    out = tmp_path / "gen"
    write_jsonl(rd.from_pandas(df).repartition(4), str(out))
    assert len(list(out.glob("*.json"))) >= 1  # partitioned, one per block
    back = read_jsonl(str(out), columns=["pair_id", "relation", "score"])
    got = back.to_pandas().sort_values("pair_id").reset_index(drop=True)
    want = (df[["pair_id", "relation", "score"]]
            .sort_values("pair_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_write_triples_invalidated_by_content_rewrite(tmp_path):
    """Rewriting the source parquet IN PLACE (same path, new bytes) must
    invalidate the triples sink checkpoint (ADVICE round 1)."""
    import os
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from folkscope_ray.sources.io import write_triples

    src = tmp_path / "src.parquet"
    run = tmp_path / "run"
    os.makedirs(run)
    t = pa.table({"pred": ["a", "b"], "subj": ["s1", "s2"], "obj": ["o1", "o2"]})
    pq.write_table(t, src)
    m1 = write_triples(rd.from_arrow(t), str(run), source_path=str(src))
    m_again = write_triples(rd.from_arrow(t), str(run), source_path=str(src))
    assert m_again["fingerprint"] == m1["fingerprint"]  # resume hit
    time.sleep(0.05)
    pq.write_table(pa.table({"pred": ["a"], "subj": ["s9"], "obj": ["o9"]}), src)
    m2 = write_triples(rd.from_arrow(t), str(run), source_path=str(src))
    assert m2["fingerprint"] != m1["fingerprint"]  # content change invalidates
