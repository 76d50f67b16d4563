"""Pattern matching: parsed assertions × broadcast pattern set -> eventualities.

The reference's per-line VF2 match loop (src/pattern/pattern_match.py:70-172)
as a Ray Data stage: the (tiny) frequent-pattern list is put in the object
store ONCE (``ray.put``) and every match task reads it zero-copy — never
re-shipped per batch.  1 parsed row -> 0..k eventuality rows (flat explode
inside ``map_batches``).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..patterns import Pattern, match_row
from .parse import DEP_STRUCT

EVENT_COLS = [
    "repo", "path", "commit", "content_sha256", "surf_a", "surf_b", "rel",
    "pair_key", "gen_idx", "plausibility", "typicality", "sid",
]


class PatternMatcher:
    """Callable for ``map_batches``; accepts the pattern list directly or as a
    ``ray.ObjectRef`` (broadcast — resolved once per worker, not per batch)."""

    def __init__(self, patterns):
        if isinstance(patterns, ray.ObjectRef):
            patterns = ray.get(patterns)
        self.patterns: list[Pattern] = sorted(patterns, key=Pattern.priority)
        self.by_rel: dict[str, list[Pattern]] = {}
        for p in self.patterns:
            self.by_rel.setdefault(p.rel, []).append(p)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rels = batch.column("rel").to_pylist()
        toks = batch.column("tokens").to_pylist()
        lems = batch.column("lemmas").to_pylist()
        poss = batch.column("pos_tags").to_pylist()
        depss = batch.column("deps").to_pylist()
        src_idx: list[int] = []
        evs: list[dict] = []
        for i, (rel, t, l, p, dd) in enumerate(zip(rels, toks, lems, poss, depss)):
            pats = self.by_rel.get(rel)
            if not pats:
                continue
            dep_triples = [(d["gov"], d["rel"], d["dep"]) for d in dd]
            for ev in match_row(pats, rel, t, l, p, dep_triples):
                src_idx.append(i)
                evs.append(ev)
        lineage = batch.select(EVENT_COLS).take(pa.array(src_idx, pa.int64()))
        out = lineage
        out = out.append_column("eid", pa.array([e["eid"] for e in evs], pa.string()))
        out = out.append_column("pattern", pa.array([e["pattern"] for e in evs], pa.string()))
        out = out.append_column("words", pa.array([e["words"] for e in evs], pa.list_(pa.string())))
        out = out.append_column(
            "ev_pos_tags", pa.array([e["pos_tags"] for e in evs], pa.list_(pa.string()))
        )
        out = out.append_column("ev_deps", pa.array([e["deps"] for e in evs], pa.list_(DEP_STRUCT)))
        out = out.append_column(
            "skeleton_indices",
            pa.array([e["skeleton_indices"] for e in evs], pa.list_(pa.int32())),
        )
        out = out.append_column(
            "frequency", pa.array([e["frequency"] for e in evs], pa.float64())
        )
        return out
