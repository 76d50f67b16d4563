"""Straight-line single-process oracle: reference-semantics golden triples.

Recomputes the whole KG construction with plain Python dict/loops — no Ray, no
shuffles, no LSH — so the distributed composition (actor pools, groupby
aggregations, broadcast joins, banding) can be validated against it
(BASELINE.md: triple P/R ≥ 0.95).  Leaf semantics (templates, scoring
functions, parser, matcher) are shared pure functions; everything the Ray
pipeline does with *distributed* machinery is re-derived here independently:

- pattern mining      : one global Counter over skeleton keys   (vs map-side
                        combine + groupby Sum);
- canonicalization    : exact O(n²) pairwise near-dup union-find (vs minhash-
                        LSH banding + star edges — LSH candidate generation
                        must reproduce the exact clustering);
- eventuality merge   : dict keyed on eid                        (vs groupby);
- triple aggregation  : dict keyed on (subj, pred, obj)          (vs groupby
                        aggregate with packed-lineage Min).
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd

from ..lexicon import assertion_text
from ..patterns import (
    Pattern,
    attribute_exclusive_support,
    decode_pattern,
    match_row,
    pattern_of_parsed,
)
from ..relations import REL_NAMES
from ..stages.canonicalize import is_near_duplicate, normalize_surface
from ..stages.critic import PLAUSIBILITY_THRESHOLD, plausibility_score, typicality_score
from ..stages.generate import N_GENS
from ..stages.ingest import extract_entities
from ..stages.mine import MIN_SUPPORT, SUPPORT_FLOOR_FRAC
from ..stages.parse import parse_assertion
from ..synth import file_row
from ..util import pair_key


def oracle_triples(n_files: int) -> pd.DataFrame:
    """Golden (subj, pred, obj, support, plausibility, typicality, frequency)."""
    # 1. ingest + pairs + generation + critic + parse — straight loops
    parsed_rows = []  # (rel, surf_a, surf_b, plaus, typ, tokens, lemmas, pos, deps)
    surfaces = set()
    for i in range(n_files):
        row = file_row(i)
        ents = extract_entities(row["lang"], row["content"])
        for a, b in zip(ents, ents[1:]):
            for rel in REL_NAMES:
                key = pair_key(a, b, rel)
                for g in range(N_GENS):
                    text = assertion_text(rel, a, b, g)
                    plaus = plausibility_score(key, g, text)
                    if plaus < PLAUSIBILITY_THRESHOLD:
                        continue
                    typ = typicality_score(key, g, text)
                    parsed = parse_assertion(rel, text)
                    if parsed is None:
                        continue
                    toks, lems, pos, deps = parsed
                    # surfaces for canonicalization come from SURVIVING
                    # assertions only — the pipeline builds its norm set
                    # from the scored (post-critic) checkpoint, so an
                    # entity whose every generation fails the critic must
                    # not enter the oracle's union-find either (it could
                    # shift a cluster's lexicographic-min canonical id and
                    # charge the diff to the distributed plan)
                    surfaces.update((a, b))
                    parsed_rows.append((rel, a, b, plaus, typ, toks, lems, pos, deps))

    # 2. pattern mining: global Counter over canonical skeleton keys, plus
    # the shared sub-skeleton growth (same leaf semantics as the Ray side)
    from ..stages.mine import grow_subskeleton_patterns

    counts: Counter = Counter()
    length_counts: dict[str, Counter] = {}
    for rel, a, b, plaus, typ, toks, lems, pos, deps in parsed_rows:
        counts[pattern_of_parsed(rel, pos, deps)] += 1
        length_counts.setdefault(rel, Counter())[len(toks)] += 1
    floor = max(MIN_SUPPORT, math.ceil(len(parsed_rows) * SUPPORT_FLOOR_FRAC))
    grown = grow_subskeleton_patterns(dict(counts), length_counts)
    # shared A5 semantics: exclusive first-match support attribution
    patterns = attribute_exclusive_support(
        dict(counts), [decode_pattern(k) for k in counts] + grown, floor
    )
    by_rel: dict[str, list[Pattern]] = {}
    for p in sorted(patterns, key=Pattern.priority):
        by_rel.setdefault(p.rel, []).append(p)

    # 3. canonicalization: exact pairwise union-find over normalized surfaces
    norms = sorted({normalize_surface(s) for s in surfaces})
    parent = {n: n for n in norms}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, a in enumerate(norms):
        for b in norms[i + 1 :]:
            if is_near_duplicate(a, b):
                ra, rb = find(a), find(b)
                if ra != rb:
                    lo, hi = sorted((ra, rb))
                    parent[hi] = lo
    canon = {n: find(n) for n in norms}

    # 4. match + triple aggregation
    agg: dict[tuple[str, str, str], dict] = {}
    for rel, a, b, plaus, typ, toks, lems, pos, deps in parsed_rows:
        pats = by_rel.get(rel)
        if not pats:
            continue
        subj = f"{canon[normalize_surface(a)]}-{canon[normalize_surface(b)]}"
        for ev in match_row(pats, rel, toks, lems, pos, deps):
            obj = " ".join(ev["words"])
            key = (subj, rel, obj)
            slot = agg.setdefault(
                key,
                {"support": 0, "frequency": 0.0, "plausibility": 0.0, "typicality": 0.0},
            )
            slot["support"] += 1
            slot["frequency"] += ev["frequency"]
            slot["plausibility"] = max(slot["plausibility"], plaus)
            slot["typicality"] = max(slot["typicality"], typ)

    return pd.DataFrame(
        [
            {
                "subj": k[0], "pred": k[1], "obj": k[2],
                "support": v["support"], "frequency": v["frequency"],
                "plausibility": v["plausibility"], "typicality": v["typicality"],
            }
            for k, v in sorted(agg.items())
        ]
    )


def precision_recall(got: pd.DataFrame, golden: pd.DataFrame) -> tuple[float, float]:
    """Set P/R over (subj, pred, obj) triples."""
    g = set(zip(got["subj"], got["pred"], got["obj"]))
    o = set(zip(golden["subj"], golden["pred"], golden["obj"]))
    if not g or not o:
        return 0.0, 0.0
    inter = len(g & o)
    return inter / len(g), inter / len(o)
