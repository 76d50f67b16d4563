"""Pattern mining: per-relation frequent skeleton-pattern discovery.

Replaces the reference's gSpan-Java + Counter pipeline
(src/pattern/pattern_filter.py:71-117 meta/full-pattern Counters;
pattern_filter.py:15-33 gSpan subprocess; pattern_miner.py:426-604 support
counting) with the idiomatic Ray Data shape:

1. ``map_batches`` computes each parsed row's canonical skeleton-pattern key
   and PRE-AGGREGATES counts within the batch (map-side combine) — the
   groupby then shuffles one row per (rel, pattern_key) per batch instead of
   one per sentence, which is what keeps this viable at 10^12 rows;
2. ``groupby(["rel", "pattern_key"]).aggregate(Sum)`` — the only shuffle, over
   the tiny partial-count table;
3. the surviving pattern set (dozens) is collected on the driver, thresholded
   at support ≥ max(min_support, N × 1e-4) (reference floor,
   pattern_miner.py:564), deduped by subgraph-isomorphism maximality
   (pattern_miner.py:464-478) and broadcast to the match stage via
   ``ray.put``.
"""

from __future__ import annotations

import math

import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

from ..patterns import (
    Pattern,
    attribute_exclusive_support,
    decode_pattern,
    encode_pattern,
    enumerate_anchored_subgraphs,
    pattern_of_parsed,
)

MIN_SUPPORT = 2
SUPPORT_FLOOR_FRAC = 1e-4  # support ≥ N * 1e-4, pattern_miner.py:564
GROWTH_TH_SCALE = 0.1      # min_th = log(1 + bucket/N) * 0.1, pattern_filter.py:146
GROWTH_MIN_TH = 1e-6       # stop when min_th < 1e-6, pattern_filter.py:147
GROWTH_EARLY_STOP = 2      # consecutive empty sizes before stopping, pattern_filter.py:196-200


def grow_subskeleton_patterns(skeleton_counts: dict[str, int],
                              length_counts: dict[str, dict[int, int]]) -> list[Pattern]:
    """Sub-skeleton frequent-pattern growth — the capability gSpan provides
    in the reference (src/pattern/pattern_filter.py:103-200): a pattern
    frequent only as a SUBGRAPH of many individually-infrequent skeletons is
    still discovered.

    Driver-side over the per-relation skeleton multiset (dozens of distinct
    skeletons — the distributed work already happened in the stats pass that
    produced the counts).  Per relation, for sizes k = n_template+1 upward
    while k < ceil(avg token length): enumerate connected anchored induced
    size-k subgraphs of every skeleton within the prefix window k+delta,
    count with skeleton multiplicities, keep fragments whose count clears the
    CDF-adaptive floor

        min_th   = log(1 + (cum(k-1+delta) - cum(k-1)) / N) * 0.1
        min_freq = (N - cum(k-1)) * min_th        (stop if < N * 1e-4)

    (pattern_filter.py:139-151), early-stopping after 2 empty sizes.  Shared
    verbatim by the single-process oracle so the P/R gate validates the
    distributed plumbing around identical leaf semantics."""
    from ..relations import REL_INDEX

    by_rel: dict[str, list[Pattern]] = {}
    for key, cnt in skeleton_counts.items():
        p = decode_pattern(key, cnt)
        by_rel.setdefault(p.rel, []).append(p)

    out: list[Pattern] = []
    for rel, skels in sorted(by_rel.items()):
        lens = length_counts.get(rel)
        if not lens:
            continue
        n_rows = sum(lens.values())
        if n_rows == 0:
            continue
        avg = sum(ln * c for ln, c in lens.items()) / n_rows
        n_template = len(REL_INDEX[rel].tokens)
        if n_template == 0:  # template-less relation (pattern_filter.py:126-128)
            continue
        sorted_lens = sorted(lens.items())

        def cum_leq(x: int) -> int:
            return sum(c for ln, c in sorted_lens if ln <= x)

        early = 0
        delta = 1
        while n_template + delta < math.ceil(avg):
            k = n_template + delta
            cum1 = cum_leq(k - 1)
            cum2 = cum_leq(k - 1 + delta)
            min_th = math.log(1 + (cum2 - cum1) / n_rows) * GROWTH_TH_SCALE
            if min_th < GROWTH_MIN_TH:
                break
            min_freq = int((n_rows - cum1) * min_th)
            if min_freq < n_rows * SUPPORT_FLOOR_FRAC:
                break
            counts: dict[str, int] = {}
            for p in skels:
                if len(p.verts) < k:
                    continue
                for sv, se in enumerate_anchored_subgraphs(
                    p.verts, p.edges, n_template, k, k + delta
                ):
                    ckey = encode_pattern(rel, sv, se)
                    counts[ckey] = counts.get(ckey, 0) + p.support
            freq = [decode_pattern(ck, c) for ck, c in sorted(counts.items())
                    if c >= max(min_freq, MIN_SUPPORT)]
            if not freq:
                early += 1
                if early >= GROWTH_EARLY_STOP:
                    break
            else:
                early = 0
                out.extend(freq)
            delta += 1
    return out


def pattern_counts_batch(batch: pa.Table) -> pa.Table:
    """Emit per-batch partial counts of canonical skeleton-pattern keys.

    Uses the precomputed ``skeleton_key`` column (vectorized value_counts)
    when the parse stage provided it; falls back to recomputing per row."""
    if "skeleton_key" in batch.column_names:
        import pyarrow.compute as pc

        vc = pc.value_counts(batch.column("skeleton_key"))
        keys = vc.field("values").to_pylist()
        ns = vc.field("counts").to_pylist()
        rels = [k.split("|", 1)[0] for k in keys]
        return pa.table(
            {
                "rel": pa.array(rels, pa.string()),
                "pattern_key": pa.array(keys, pa.string()),
                "n": pa.array(ns, pa.int64()),
            }
        )
    from .parse import iter_deps, iter_strlists

    rels = batch.column("rel").to_pylist()
    poss = iter_strlists(batch.column("pos_tags"))
    depss = iter_deps(batch.column("deps"))
    counts: dict[tuple[str, str], int] = {}
    for rel, pos, deps in zip(rels, poss, depss):
        key = pattern_of_parsed(rel, pos, deps)
        k = (rel, key)
        counts[k] = counts.get(k, 0) + 1
    return pa.table(
        {
            "rel": pa.array([k[0] for k in counts], pa.string()),
            "pattern_key": pa.array([k[1] for k in counts], pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        }
    )


def length_counts_batch(batch: pa.Table) -> pa.Table:
    """Per-batch (rel, n_tokens, n) partials — the length histogram
    grow_subskeleton_patterns' CDF-adaptive window needs."""
    import pyarrow.compute as pc

    rels = batch.column("rel")
    nt = pc.list_value_length(batch.column("tokens"))
    t = pa.table({"rel": rels, "n_tokens": pc.cast(nt, pa.int64())})
    g = t.group_by(["rel", "n_tokens"]).aggregate([("rel", "count")])
    return g.rename_columns(["rel", "n_tokens", "n"])


def mine_patterns(parsed: Dataset, total_rows: int | None = None) -> list[Pattern]:
    """Full mining pass; returns the deduped frequent pattern list (small).

    Matches the pipeline's fused stats pass EXACTLY: skeleton counts AND
    the per-relation token-length histogram feed
    :func:`grow_subskeleton_patterns` BEFORE the exclusive attribution —
    a pattern frequent only as a subgraph of individually-infrequent
    skeletons is discovered here too, not just in pipelines/kg.py."""
    parsed = parsed.materialize()  # two aggregates read it
    partials = parsed.map_batches(pattern_counts_batch, batch_format="pyarrow")
    counted = partials.groupby(["rel", "pattern_key"]).aggregate(
        Sum("n", alias_name="support")
    )
    tbl = counted.to_pandas()  # dozens–hundreds of rows: driver-side is correct
    lt = (parsed.map_batches(length_counts_batch, batch_format="pyarrow")
          .groupby(["rel", "n_tokens"]).aggregate(Sum("n", alias_name="n"))
          .to_pandas())
    length_counts: dict[str, dict[int, int]] = {}
    for row in lt.itertuples():
        length_counts.setdefault(row.rel, {})[int(row.n_tokens)] = int(row.n)
    if total_rows is None:
        total_rows = int(tbl["support"].sum())
    floor = max(MIN_SUPPORT, math.ceil(total_rows * SUPPORT_FLOOR_FRAC))
    skel_counts = {row.pattern_key: int(row.support) for row in tbl.itertuples()}
    grown = grow_subskeleton_patterns(skel_counts, length_counts)
    # A5 reference semantics: priority-ordered exclusive attribution — a
    # below-floor skeleton releases its lines to smaller contained candidates
    return attribute_exclusive_support(
        skel_counts, [decode_pattern(k) for k in skel_counts] + grown, floor
    )


def patterns_to_table(patterns: list[Pattern]) -> pa.Table:
    """Pattern artifact as Arrow (the analogue of the freq.txt/.lg side files,
    pattern_miner.py:321-328) — written next to the run's checkpoints."""
    return pa.table(
        {
            "rel": pa.array([p.rel for p in patterns], pa.string()),
            "pattern_key": pa.array([p.key for p in patterns], pa.string()),
            "support": pa.array([p.support for p in patterns], pa.int64()),
        }
    )


def patterns_from_table(tbl: pa.Table) -> list[Pattern]:
    return [
        decode_pattern(k, int(s))
        for k, s in zip(tbl.column("pattern_key").to_pylist(), tbl.column("support").to_pylist())
    ]
