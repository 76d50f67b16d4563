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
