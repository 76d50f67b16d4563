"""Deterministic parse: tokens / lemmas / POS / dependencies per assertion.

Replaces the reference's CoreNLP server stage (src/pattern/utils.py:217-299,
one server per worker, generation_parser.py:152-161) with an in-process
closed-world rule parser: the template prefix of each assertion is tagged from
the relation registry (template-anchored, like the reference's
``index_from`` anchor match, src/pattern/pattern_filter.py:74-92) and the
object phrase is tagged from the lexicon.  Dependency triples use the same
(governor, label, dependent) orientation as the reference parsed dicts.

Output contract (FIXTURES.md §5 ``parsed``):
    sid, tokens:list<str>, lemmas:list<str>, pos_tags:list<str>,
    deps:list<struct<gov:int32, rel:string, dep:int32>> + lineage columns.

``sid`` format "{a}-{rel}-{b}|{row}" follows generation_parser.py:137.
"""

from __future__ import annotations

import pyarrow as pa

from ..lexicon import lemma_of, tag_obj_word
from ..relations import REL_INDEX, Relation

DEP_STRUCT = pa.struct([("gov", pa.int32()), ("rel", pa.string()), ("dep", pa.int32())])


def parse_assertion(rel_name: str, sentence: str):
    """Parse one assertion; returns (tokens, lemmas, pos, deps) or None.

    Returns None when the sentence does not start with the relation's template
    anchor (the reference drops generations whose prefix slice fails,
    generation_parser.py:128-138) or has no object phrase, or for the
    template-less "open" relation (skipped from mining per
    pattern_filter.py:56-60).
    """
    r: Relation = REL_INDEX.get(rel_name)
    if r is None or not r.tokens:
        return None
    tokens = sentence.split()
    nt = len(r.tokens)
    if tuple(tokens[:nt]) != r.tokens or len(tokens) == nt:
        return None
    obj = tokens[nt:]
    pos = list(r.pos) + [tag_obj_word(w, i, r.obj_kind) for i, w in enumerate(obj)]
    lemmas = [lemma_of(w, p) for w, p in zip(tokens, pos)]
    deps = [list(d) for d in r.deps]

    if r.obj_kind == "verbal":
        v = nt  # object phrase is verb-led; its VB is the clause root
        if r.rel == "can":
            deps += [[v, "nsubj", 0], [v, "aux", 1], [v, "cc", 2]]
        elif r.rel == "effect":
            deps += [[v, "nsubj", 1], [1, "det", 0], [v, "aux", 2]]
        elif r.rel == "cause":
            deps += [[r.anchor, "xcomp", v], [v, "mark", 3]]
        else:  # pragma: no cover - no other verbal relations registered
            return None
        if len(obj) > 1:
            head = nt + len(obj) - 1
            for j in range(v + 1, head):
                deps.append([head, "amod" if pos[j] == "JJ" else "compound", j])
            deps.append([v, "obj", head])
    else:
        head = nt + len(obj) - 1
        for j in range(nt, head):
            deps.append([head, "amod" if pos[j] == "JJ" else "compound", j])
        if r.prep is not None:
            deps.append([head, "case", r.prep])
            deps.append([r.anchor, r.attach, head])
        else:
            deps.append([r.anchor, r.attach, head])
            if r.rel == "causeEffect":  # "... wants his <obj>": possessive joins the NP
                deps.append([head, "nmod:poss", 3])

    deps.sort(key=lambda t: (t[0], t[2], t[1]))
    return tokens, lemmas, pos, deps


def parse_batch(batch: pa.Table) -> pa.Table:
    """Vectorized-exterior parse: one tight loop per batch, Arrow in/out."""
    rels = batch.column("rel").to_pylist()
    texts = batch.column("assertion").to_pylist()
    surfs_a = batch.column("surf_a").to_pylist()
    surfs_b = batch.column("surf_b").to_pylist()
    keep, toks, lems, poss, depss, sids = [], [], [], [], [], []
    for i, (rel, text) in enumerate(zip(rels, texts)):
        parsed = parse_assertion(rel, text)
        if parsed is None:
            continue
        t, l, p, d = parsed
        keep.append(i)
        toks.append(t)
        lems.append(l)
        poss.append(p)
        depss.append([{"gov": g, "rel": lab, "dep": dp} for g, lab, dp in d])
        sids.append(f"{surfs_a[i]}-{rel}-{surfs_b[i]}|{i}")
    out = batch.take(pa.array(keep, pa.int64()))
    out = out.append_column("sid", pa.array(sids, pa.string()))
    out = out.append_column("tokens", pa.array(toks, pa.list_(pa.string())))
    out = out.append_column("lemmas", pa.array(lems, pa.list_(pa.string())))
    out = out.append_column("pos_tags", pa.array(poss, pa.list_(pa.string())))
    out = out.append_column("deps", pa.array(depss, pa.list_(DEP_STRUCT)))
    return out
