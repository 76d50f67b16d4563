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

EVENT_COLS = [
    "repo", "path", "commit", "content_sha256", "surf_a", "surf_b", "rel",
    "pair_key", "gen_idx", "plausibility", "typicality", "sid",
]


# per-worker cache: broadcast objects are fetched (zero-copy) once per worker
# process, then reused by every task scheduled there
_WORKER_CACHE: dict[str, object] = {}


def make_match_fn(pat_ref, canon_ref):
    """Stateless-task matcher with broadcast pattern set + canonical map.

    Plain tasks beat an actor pool here: no pool spin-up, fully elastic, and
    the broadcast refs resolve once per worker process via a module cache."""
    from .canonicalize import apply_canonical

    def match_and_canonicalize(batch: pa.Table) -> pa.Table:
        key = pat_ref.hex()
        matcher = _WORKER_CACHE.get(key)
        if matcher is None:
            matcher = PatternMatcher(ray.get(pat_ref))
            _WORKER_CACHE[key] = matcher
        ckey = canon_ref.hex()
        canon = _WORKER_CACHE.get(ckey)
        if canon is None:
            canon = ray.get(canon_ref)
            _WORKER_CACHE[ckey] = canon
        return apply_canonical(matcher(batch), canon)

    return match_and_canonicalize


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
        from .parse import deps_array, iter_deps, iter_strlists, list_string_array

        rels = batch.column("rel").to_pylist()
        toks = iter_strlists(batch.column("tokens"))
        lems = iter_strlists(batch.column("lemmas"))
        poss = iter_strlists(batch.column("pos_tags"))
        depss = iter_deps(batch.column("deps"))
        src_idx: list[int] = []
        eids, pats_out, freqs = [], [], []
        w_off, w_flat = [0], []
        p_flat: list[str] = []
        d_off, d_gov, d_lab, d_dep = [0], [], [], []
        sk_off, sk_flat = [0], []
        for i, (rel, t, l, p, dd) in enumerate(zip(rels, toks, lems, poss, depss)):
            pats = self.by_rel.get(rel)
            if not pats:
                continue
            for ev in match_row(pats, rel, t, l, p, dd):
                src_idx.append(i)
                eids.append(ev["eid"])
                pats_out.append(ev["pattern"])
                freqs.append(ev["frequency"])
                w_flat.extend(ev["words"])
                p_flat.extend(ev["pos_tags"])
                w_off.append(len(w_flat))
                for g, lab, dp in ev["deps"]:
                    d_gov.append(g)
                    d_lab.append(lab)
                    d_dep.append(dp)
                d_off.append(len(d_gov))
                sk_flat.extend(ev["skeleton_indices"])
                sk_off.append(len(sk_flat))
        out = batch.select(EVENT_COLS).take(pa.array(src_idx, pa.int64()))
        out = out.append_column("eid", pa.array(eids, pa.string()))
        out = out.append_column("pattern", pa.array(pats_out, pa.string()))
        out = out.append_column("words", list_string_array(w_off, w_flat))
        out = out.append_column("ev_pos_tags", list_string_array(w_off, p_flat))
        out = out.append_column("ev_deps", deps_array(d_off, d_gov, d_lab, d_dep))
        out = out.append_column(
            "skeleton_indices",
            pa.ListArray.from_arrays(pa.array(sk_off, pa.int32()), pa.array(sk_flat, pa.int32())),
        )
        out = out.append_column("frequency", pa.array(freqs, pa.float64()))
        return out
