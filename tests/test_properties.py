"""Property tests (hypothesis) for the invariants SURVEY.md §5 calls out."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from folkscope_ray.lexicon import assertion_text
from folkscope_ray.patterns import decode_pattern, dedup_patterns, match_row, pattern_of_parsed
from folkscope_ray.relations import EXTRACTABLE_RELS
from folkscope_ray.stages.canonicalize import (
    is_near_duplicate,
    jaccard,
    normalize_surface,
)
from folkscope_ray.stages.parse import parse_assertion
from folkscope_ray.util import generate_eid

IDENT = st.text(alphabet="abcdefghijklmnopqrstuvwxyz_0123456789", min_size=1, max_size=24)


@given(st.permutations(list(range(5))))
@settings(max_examples=30, deadline=None)
def test_eid_depends_on_dep_order_canonically(perm):
    """Same dependency SET in any order -> same eid once canonically sorted
    (the pipeline sorts deps before hashing; object.py:614-655 analog)."""
    deps = [(1, "nsubj", 0), (1, "obj", 2), (2, "amod", 3), (2, "compound", 4), (1, "aux", 4)]
    words = ["a", "b", "c", "d", "e"]
    pos = ["PRP", "VBP", "NN", "JJ", "NN"]
    shuffled = [deps[i] for i in perm]
    assert generate_eid(sorted(shuffled), words, pos) == generate_eid(sorted(deps), words, pos)


@given(st.sampled_from(EXTRACTABLE_RELS), IDENT, IDENT, st.integers(0, 2))
@settings(max_examples=60, deadline=None)
def test_generation_parse_extract_deterministic(rel, a, b, g):
    """generate -> parse -> self-pattern match is total and idempotent for
    every relation and any surface pair."""
    text = assertion_text(rel, a, b, g)
    parsed = parse_assertion(rel, text)
    assert parsed is not None
    toks, lems, pos, deps = parsed
    p = decode_pattern(pattern_of_parsed(rel, pos, deps), 1)
    evs1 = match_row([p], rel, toks, lems, pos, deps)
    evs2 = match_row([p], rel, toks, lems, pos, deps)
    assert [e["eid"] for e in evs1] == [e["eid"] for e in evs2]
    assert len(evs1) == 1


@given(IDENT)
@settings(max_examples=60, deadline=None)
def test_normalize_idempotent(s):
    n = normalize_surface(s)
    assert normalize_surface(n) == n


@given(IDENT, IDENT)
@settings(max_examples=60, deadline=None)
def test_near_duplicate_symmetric(a, b):
    na, nb = normalize_surface(a), normalize_surface(b)
    assert is_near_duplicate(na, nb) == is_near_duplicate(nb, na)
    if na and nb:
        assert 0.0 <= jaccard(na, nb) <= 1.0


@given(st.lists(st.sampled_from(EXTRACTABLE_RELS), min_size=1, max_size=6))
@settings(max_examples=30, deadline=None)
def test_pattern_dedup_idempotent(rels):
    pats = []
    for i, rel in enumerate(rels):
        text = assertion_text(rel, f"x{i}", f"y{i}", i % 3)
        _, _, pos, deps = parse_assertion(rel, text)
        pats.append(decode_pattern(pattern_of_parsed(rel, pos, deps), 1))
    once = dedup_patterns(pats)
    twice = dedup_patterns(once)
    assert {p.key for p in once} == {p.key for p in twice}
    # supports preserved in total
    assert sum(p.support for p in once) == len(pats)


# ----------------------------------------------------- editjoin kernels (r5)

@settings(max_examples=60, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abßc", max_size=8),
                          st.text(alphabet="abßc", max_size=8)),
                min_size=1, max_size=20))
def test_pair_dists_matches_scalar_dp_clamped(pairs):
    import numpy as np

    from folkscope_ray.ops.editjoin import _char_matrix, _pair_dists

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                dp[j], prev = min(dp[j] + 1, dp[j - 1] + 1,
                                  prev + (ca != cb)), dp[j]
        return dp[len(b)]

    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    W = max(1, max(len(s) for s in a + b))
    A, la = _char_matrix(a, W)
    B, lb = _char_matrix(b, W)
    for k in (1, 2):
        got = _pair_dists(A, la, B, lb, k)
        want = np.minimum([lev(x, y) for x, y in pairs], k + 1)
        assert (got == want).all(), (pairs, k, got.tolist(), want.tolist())


@settings(max_examples=5, deadline=None)
@given(st.lists(st.text(alphabet="pq", min_size=1, max_size=5),
                min_size=2, max_size=25),
       st.integers(min_value=1, max_value=2))
def test_edit_distance_selfjoin_property(texts, k):
    """Full-pipeline property: arbitrary corpora WITH duplicates match the
    brute-force all-pairs answer (dedup collapse + expansion included)."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from folkscope_ray.ops.editjoin import edit_distance_selfjoin

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                dp[j], prev = min(dp[j] + 1, dp[j - 1] + 1,
                                  prev + (ca != cb)), dp[j]
        return dp[len(b)]

    df = pd.DataFrame({"rid": np.arange(len(texts), dtype="int64"),
                       "t": texts})
    got = (edit_distance_selfjoin(rd.from_pandas(df).repartition(2),
                                  text_col="t", id_col="rid", k=k)
           .to_pandas())
    if got.empty and not list(got.columns):
        # Ray's to_pandas drops columns on a zero-row Dataset (the schema
        # itself is intact) — normalize for the compare
        got = pd.DataFrame({"a": [], "b": [], "dist": []})
    got = got.sort_values(["a", "b"]).reset_index(drop=True)
    want = sorted((i, j, lev(texts[i], texts[j]))
                  for i in range(len(texts)) for j in range(i + 1, len(texts))
                  if lev(texts[i], texts[j]) <= k)
    assert [tuple(r) for r in got.to_numpy()] == want
