"""End-to-end KG construction: source files -> (subj, pred, obj) triples.

The flagship pipeline (SURVEY.md §3.2 re-expressed Ray-Data-first):

    read_parquet(source)                                   [pruned, split read]
      -> ingest (sha256 + entities, content dropped)       [map_batches]
      -> pairs -> 21-relation prompt fan-out               [map_batches explode]
      -> generation (3 gens/prompt, fixed internal batches)[tasks; actor pool for real models]
      -> critic scoring + plausibility filter              [tasks]
      == checkpoint "scored" (slim; two-phase mining needs a second pass) ==
      -> deterministic parse, memoized per distinct text   [lazy map_batches]
      -> fused stats pass: pattern counts + distinct surfaces
         (map-side combine -> driver merge)                [one scan]
      -> fused match -> (subj, pred, obj) partials with
         patterns + canonical map broadcast (ray.put once) [map_batches]
      -> bucketed triple combine                           [shuffle: hash bucket]
      -> canonicalization (minhash-LSH + union-find)       [driver or distributed]
      -> eventuality merge on eid                          [shuffle: bucket(eid)]
      -> conceptualizer actor pool -> concept aggregation  [shuffle: bucket(cid)]
      -> partitioned parquet by pred + manifests           [resumable sink]

With ``run_dir`` set, stages checkpoint through ``state.manifest`` and a
killed run resumes without recomputing completed stages.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as _pd
import pyarrow as pa
import ray
import ray.data as rd
from ray.data import Dataset

from ..stages.conceptualize import Conceptualizer
from ..stages.critic import Critic
from ..stages.generate import MockGenerator
from ..stages.ingest import ingest_batch, pairs_batch
from ..stages.mine import patterns_from_table, patterns_to_table
from ..stages.parse import parse_batch
from ..stages.prompts import expand_prompts
from ..state import manifest as mf
from ..synth import taxonomy_rows


def _cpus() -> int:
    try:
        return int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        return 4


ROWS_PER_BUCKET = 100_000  # target rows per bucketed-combine shuffle bucket


@dataclass
class KGPipeline:
    """Lazily composed KG build over one source Parquet table.

    Each product property returns a (lazy) Dataset; heavy barriers (pattern
    mining, canonical map) are cached on the instance.  ``run_dir=None`` keeps
    intermediates in the object store; a path makes the run resumable.
    """

    source_path: str
    run_dir: str | None = None
    _cache: dict = field(default_factory=dict)
    # incremental/sharded mode: read the scored stage from these ALREADY
    # CHECKPOINTED shard directories instead of generating it (see
    # build_kg_incremental) — generation/critic cost is paid once per shard
    scored_sources: tuple[str, ...] | None = None

    # ------------------------------------------------- lineage fingerprints

    def _fp(self, stage: str) -> str:
        """Chained stage fingerprint: source content (file sizes+mtimes) +
        stage config constants + the upstream stage's fingerprint, so a
        changed input file, threshold, or upstream result invalidates this
        stage and everything after it."""
        fps = self._cache.get("_fps")
        if fps is None:
            from ..stages import canonicalize as cz
            from ..stages.critic import PLAUSIBILITY_THRESHOLD
            from ..stages.generate import MAX_PROMPT_WORDS, N_GENS
            from ..stages.mine import MIN_SUPPORT, SUPPORT_FLOOR_FRAC

            if self.scored_sources:
                # union identity = the shard checkpoints' content identity:
                # a recomputed/added shard invalidates everything downstream
                src = mf.fingerprint(
                    "union",
                    *[mf.source_fingerprint(p) for p in self.scored_sources])
            else:
                src = mf.source_fingerprint(self.source_path)
            fps = {}
            fps["scored"] = mf.fingerprint(
                "scored", src, PLAUSIBILITY_THRESHOLD, N_GENS, MAX_PROMPT_WORDS
            )
            fps["patterns"] = mf.fingerprint(
                "patterns", fps["scored"], MIN_SUPPORT, SUPPORT_FLOOR_FRAC
            )
            fps["eventualities"] = mf.fingerprint(
                "eventualities", fps["patterns"], cz.JACCARD_THRESHOLD,
                cz.MAX_SUFFIX_EXTRA, cz.LSH_BANDS, cz.LSH_ROWS,
            )
            fps["triples"] = mf.fingerprint("triples", fps["eventualities"])
            self._cache["_fps"] = fps
        return fps[stage]

    # ------------------------------------------------------------ stages

    def _n_buckets(self, est_rows: int | None = None) -> int:
        """Shuffle bucket count for the bucketed combines, computed ONCE on
        the driver and captured in closures — a worker-side
        ``cluster_resources()`` call can return different values between
        tasks on an elastic cluster, hashing the same key to different
        buckets and breaking groupby co-location.  Scaled to the DATA
        (target ~``ROWS_PER_BUCKET`` rows per bucket, parallelism floor of
        2×cpus): a fixed 4×cpus would make each bucket hold data/(4·cpus)
        rows in one task's memory at 100× data on a fixed cluster."""
        if est_rows is None:
            if "n_buckets" in self._cache:
                return self._cache["n_buckets"]
            est_rows = self.scored().count()  # metadata count (checkpointed)
            nb = int(max(2 * _cpus(), min(est_rows // ROWS_PER_BUCKET + 1, 65_536)))
            self._cache["n_buckets"] = nb
            return nb
        return int(max(2 * _cpus(), min(est_rows // ROWS_PER_BUCKET + 1, 65_536)))

    def files(self) -> Dataset:
        # A single-file synthetic corpus would otherwise become 1-2 read
        # blocks and serialize the whole ingest; split the read to keep every
        # core busy.  (A real 10^12-file corpus arrives as many files and
        # needs no override.)
        ds = rd.read_parquet(self.source_path, override_num_blocks=2 * _cpus())
        return ds.map_batches(ingest_batch, batch_format="pyarrow", batch_size=None)

    def pairs(self) -> Dataset:
        return self.files().map_batches(pairs_batch, batch_format="pyarrow",
                                        batch_size=None)

    def assertions(self) -> Dataset:
        """Scored candidate assertions (post-critic).

        No Ray-level ``batch_size`` on the generator/critic: a batch_size here
        becomes min_rows_per_bundle for the FUSED read->...->generator
        operator, i.e. it counts *source* rows and caps the whole pipeline at
        n_files/batch_size tasks.  Instead each actor slices its block into
        fixed-size inference batches internally (the reference's fixed-batch
        contract, generation.py:238-243), and task fan-out follows the source
        block count."""
        ds = self.pairs().map_batches(expand_prompts, batch_format="pyarrow",
                                      batch_size=None)
        # The mock generator/critic carry no real model state, so they run as
        # stateless tasks (pickled instances).  A real GPU deployment swaps
        # each line for an actor pool —
        #   map_batches(RealGenerator, concurrency=N, num_gpus=1, batch_size=None)
        # — with weights loaded in __init__; the I/O contract is identical.
        ds = ds.map_batches(MockGenerator(), batch_format="pyarrow", batch_size=None)
        ds = ds.map_batches(Critic(), batch_format="pyarrow", batch_size=None)
        return ds

    def scored(self) -> Dataset:
        """Scored assertions, checkpointed — the pipeline's one wide-fan-in
        barrier (two-phase mining needs a second pass over the corpus).

        This is deliberately the SLIM table (no token/lemma/POS/dep list
        columns): assertion texts repeat heavily, so downstream stages
        re-derive parses from per-worker memo caches at dict-lookup cost
        instead of shipping ~2.5x the bytes through the object store."""
        if "scored" in self._cache:
            return self._cache["scored"]
        if self.scored_sources:
            # sharded mode: the expensive generate+critic work already lives
            # in the shard checkpoints; the union is just a multi-dir read
            # (expanded to files — read_parquet takes dirs only singly)
            import glob as _glob

            paths = [f for d in self.scored_sources
                     for f in sorted(_glob.glob(os.path.join(d, "*.parquet")))]
            ds = rd.read_parquet(paths)
            self._cache["scored"] = ds
            return ds
        ds = self.assertions()
        if self.run_dir:
            fp = self._fp("scored")
            ds = mf.checkpoint(ds, self.run_dir, "scored", fp)
        else:
            ds = ds.materialize()
        self._cache["scored"] = ds
        return ds

    def parsed(self) -> Dataset:
        """Fully parsed assertions (token/lemma/POS/dep list columns) — lazy
        over the scored checkpoint; the heavy parse is memoized per worker so
        repeated consumption costs dict lookups, not re-parsing."""
        if "parsed" in self._cache:
            return self._cache["parsed"]
        ds = self.scored().map_batches(parse_batch, batch_format="pyarrow",
                                       batch_size=None)
        self._cache["parsed"] = ds
        return ds

    def _stats_pass(self) -> None:
        """ONE scan of the scored checkpoint computes every driver-side
        barrier: frequent-pattern mining counts (SURVEY.md A1/A2), the
        distinct entity surfaces for canonicalization, and the distinct
        assertion set feeding the broadcast match memo.

        Two-phase so NO worker ever parses the whole distinct vocabulary:

        1. **scan** (parallel): per-block ``(rel\\x1ftext) -> row count``
           partials + distinct norms.  No parsing — the scan is pure
           dict/Arrow work, so its wall time scales with rows/cpus instead
           of being floored at (per-worker vocabulary warm-up).
        2. **parse** (parallel): the merged distinct set is chunked across
           ``parse_stats_chunk`` tasks; each distinct assertion is parsed
           exactly ONCE cluster-wide, returning (skeleton key, token count)
           used to fold row counts into skeleton/length histograms.

        The driver merge is vectorized (pandas groupby over the partials),
        not a Python row loop."""
        import math as _math
        from collections import Counter

        from ..stages.canonicalize import (
            DRIVER_BANDING_MAX,
            _distinct_norms_batch,
            build_canonical_map,
            canonical_from_norms,
        )
        from ..stages.mine import (
            MIN_SUPPORT,
            SUPPORT_FLOOR_FRAC,
            grow_subskeleton_patterns,
        )
        from ..stages.parse import parse_stats_chunk
        from ..patterns import attribute_exclusive_support, decode_pattern

        def stats_batch(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # vectorized per-block combine: value_counts over rel\x1ftext
            # (consumers sum "n" per key — emit order is irrelevant)
            joined = pc.binary_join_element_wise(
                batch.column("rel"), batch.column("assertion"), "\x1f")
            vc = (joined.combine_chunks()
                  if isinstance(joined, pa.ChunkedArray) else joined)
            vc = pc.value_counts(vc)
            keys = vc.field("values")
            counts = pc.cast(vc.field("counts"), pa.int64())
            dn_tbl = _distinct_norms_batch(batch)
            # per-block distinct file lineages ("f" rows): feeds the global
            # lineage-rank broadcast that lets the triple shuffle ship int64
            # ranks instead of ~150-byte lineage strings (56% of the partial
            # stream).  Files are block-local, so this adds ~n_files/blocks
            # rows per block — noise next to the assertion partials.
            lin = pc.unique(pc.binary_join_element_wise(
                batch.column("repo"), batch.column("path"),
                batch.column("commit"), batch.column("content_sha256"),
                "\t").combine_chunks())
            n_t, n_n, n_f = len(keys), dn_tbl.num_rows, len(lin)
            return pa.table(
                {
                    "kind": pa.array(["t"] * n_t + ["n"] * n_n + ["f"] * n_f,
                                     pa.string()),
                    "k1": pa.concat_arrays(
                        [keys, dn_tbl.column("norm").combine_chunks()
                         .cast(pa.string()), lin]),
                    "n": pa.concat_arrays(
                        [counts, pa.nulls(n_n + n_f, pa.int64()).fill_null(0)]),
                }
            )

        # scan: materialize the partials ONCE so the map runs at full
        # parallelism and both consumers (assertion counts, distinct norms)
        # read the same blocks back from the object store
        partials = self.scored().map_batches(
            stats_batch, batch_format="pyarrow", batch_size=None
        ).materialize()

        def keep(kind: str, cols: list[str]):
            def fn(b: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return b.filter(pc.equal(b.column("kind"), kind)).select(cols)
            return fn

        t_rows = partials.map_batches(keep("t", ["k1", "n"]),
                                      batch_format="pyarrow")
        n_rows = partials.map_batches(keep("n", ["k1"]),
                                      batch_format="pyarrow")
        evs_max = int(os.environ.get("FOLKSCOPE_EVS_BROADCAST_MAX", 3_000_000))

        # Distinct-assertion vocabulary, driver memory BOUNDED by evs_max:
        # per-block partial rows upper-bound the distinct count, so a cheap
        # count() clears the driver merge in the common case without any
        # shuffle; past the bound we pay one distributed distinct aggregation,
        # and if THAT still exceeds the gate nothing assertion-sized ever
        # reaches the driver (the skeleton fold stays on the cluster below).
        from ..ops.relational import map_combine_aggregate

        text_counts: dict[str, int] | None = None
        distinct_t: Dataset | None = None
        if t_rows.count() <= evs_max:
            pdf = t_rows.to_pandas()
            text_counts = pdf.groupby("k1", sort=False)["n"].sum().to_dict()
        else:
            distinct_t = map_combine_aggregate(
                t_rows, keys=["k1"], sums={"n": "n"}).materialize()
            if distinct_t.count() <= evs_max:
                dtf = distinct_t.to_pandas()
                text_counts = dict(zip(dtf["k1"], dtf["n"]))
        evs_overflow = text_counts is None

        # distinct entity surfaces, bounded the same way by the banding gate
        norms: set[str] = set()
        norms_overflow = True
        if n_rows.count() <= DRIVER_BANDING_MAX:
            norms = set(n_rows.to_pandas()["k1"].unique())
            norms_overflow = False
        else:
            distinct_n = map_combine_aggregate(
                n_rows, keys=["k1"]).materialize()
            if distinct_n.count() <= DRIVER_BANDING_MAX:
                norms = set(distinct_n.to_pandas()["k1"])
                norms_overflow = False

        # distinct file lineages -> SORTED global rank array for the triple
        # shuffle (int64 rank ships instead of the ~150-byte string; ranks
        # are lexicographic so min(rank) == min(string) bit-exactly).  File
        # count ≪ assertion count (96x fan-out), bounded by its own gate; on
        # overflow triples() falls back to string lineage — identical
        # output, pytest-gated.
        lin_gate = int(os.environ.get(
            "FOLKSCOPE_LINEAGE_BROADCAST_MAX", 2_000_000))
        self._cache["lineage_sorted"] = None
        if lin_gate:
            f_rows = partials.map_batches(keep("f", ["k1"]),
                                          batch_format="pyarrow")
            if f_rows.count() <= lin_gate:
                lins = f_rows.to_pandas()["k1"].unique()
                if len(lins) <= lin_gate:
                    lins.sort()
                    self._cache["lineage_sorted"] = lins
            else:
                distinct_f = map_combine_aggregate(
                    f_rows, keys=["k1"]).materialize()
                if distinct_f.count() <= lin_gate:
                    lins = distinct_f.to_pandas()["k1"].unique()
                    lins.sort()
                    self._cache["lineage_sorted"] = lins

        counts: Counter = Counter()
        length_counts: dict[str, Counter] = {}
        assertions_set: list[str] = []
        total = 0
        if not evs_overflow:
            # parse each distinct assertion exactly once, cluster-wide
            items = sorted(text_counts)
            chunk = max(2_000, len(items) // (4 * _cpus()) + 1)
            futs = [
                parse_stats_chunk.remote(items[i:i + chunk])
                for i in range(0, len(items), chunk)
            ]
            for part in ray.get(futs):
                for key, skel, n_tokens in part:
                    n = text_counts[key]
                    counts[skel] += n
                    total += n
                    rel = key.split("\x1f", 1)[0]
                    length_counts.setdefault(rel, Counter())[n_tokens] += n
                    assertions_set.append(key)
        else:
            # fully distributed: parse the distinct Dataset in place (each
            # distinct key sits in exactly one block after the aggregation,
            # so it is parsed exactly once cluster-wide — same guarantee as
            # the chunked driver path), then map-combine down to
            # (skeleton, rel, n_tokens) rows.  The driver folds ONLY
            # skeleton-level aggregates; downstream consumers
            # (grow_subskeleton_patterns, attribute_exclusive_support) sort
            # internally, so the two paths are bit-equal.
            from ..stages.parse import parse_stats_batch

            srows = map_combine_aggregate(
                distinct_t.map_batches(parse_stats_batch,
                                       batch_format="pyarrow"),
                keys=["skel", "rel", "n_tokens"], sums={"n": "n"},
            ).to_pandas()
            srows = srows.sort_values(["skel", "rel", "n_tokens"],
                                      kind="mergesort")
            for skel, rel, ntok, n in zip(srows["skel"], srows["rel"],
                                          srows["n_tokens"], srows["n"]):
                counts[skel] += int(n)
                total += int(n)
                length_counts.setdefault(rel, Counter())[int(ntok)] += int(n)
        floor = max(MIN_SUPPORT, _math.ceil(total * SUPPORT_FLOOR_FRAC))
        grown = grow_subskeleton_patterns(dict(counts), length_counts)
        # reference support semantics: priority-ordered exclusive line
        # attribution with hierarchy-flag behavior (A5) — full skeletons are
        # candidates UNthresholded; the greedy drops the infrequent ones and
        # releases their lines to the grown sub-patterns
        pats = attribute_exclusive_support(
            dict(counts), [decode_pattern(k) for k in counts] + grown, floor
        )
        if not norms_overflow:
            canon = canonical_from_norms(sorted(norms))
        else:  # fully distributed path: (norm, canon) labels Dataset
            canon = build_canonical_map(
                self.scored().map_batches(
                    lambda b: b.select(["surf_a", "surf_b"]),
                    batch_format="pyarrow",
                )
            )
        self._cache["patterns"] = pats
        self._cache["canon"] = canon
        # distinct keys kept for the eventualities-path full-ev memo (same
        # broadcast gate: None past the ceiling -> per-row fallback)
        self._cache["assertions_set"] = (
            None if evs_overflow else assertions_set)

    def _build_evs_ref(self, pats: list, items: list[str]):
        """Global match memo {rel\\x1ftext: [(obj, freq)]}: distributed
        parse+match over the DISTINCT assertion set (each distinct matched
        exactly once, chunked across the cluster), then one ``ray.put`` so
        the triples pass reads it zero-copy — replaces every worker lazily
        re-matching the whole distinct set to warm a private memo (an
        O(workers × distinct) duplicated cost that grows with cluster size)."""
        from ..stages.match import match_objs_chunk

        if not items:
            return ray.put({})
        pat_ref = ray.put(pats)
        chunk = max(2_000, len(items) // (4 * _cpus()) + 1)
        futs = [
            match_objs_chunk.remote(pat_ref, items[i:i + chunk])
            for i in range(0, len(items), chunk)
        ]
        evs: dict = {}
        for d in ray.get(futs):
            evs.update(d)
        return ray.put(evs)

    def _evs_ref(self):
        """Broadcast {rel\\x1ftext: [(obj, freq)]} match memo for the
        TRIPLES path — built lazily on first triples() consumption so
        eventualities-only consumers never pay the distinct match twice
        (the full-payload memo below is theirs).  None past the broadcast
        gate (workers fall back to private lazy memos)."""
        if "evs_ref" in self._cache:
            return self._cache["evs_ref"]
        self.patterns()  # ensures _stats_pass ran
        items = self._cache.get("assertions_set")
        ref = (None if items is None
               else self._build_evs_ref(self.patterns(), items))
        self._cache["evs_ref"] = ref
        return ref

    def _full_evs_ref(self):
        """Broadcast full-eventuality memo for the eventualities path: ONE
        Arrow table of distinct-level ev payloads (read zero-copy per
        worker) + a ``rel\\x1ftext -> (row_start, n_evs)`` index, each
        DISTINCT assertion parsed + matched exactly once cluster-wide
        (``match_events_chunk``).  None when the distinct set overflowed its
        broadcast ceiling (or ``FOLKSCOPE_EV_MEMO_MAX=0`` forces the
        per-row path) — consumers fall back to ``PatternMatcher`` over the
        parsed stream."""
        if "full_evs_ref" in self._cache:
            return self._cache["full_evs_ref"]
        self.patterns()  # ensures _stats_pass ran
        items = self._cache.get("assertions_set")
        limit = int(os.environ.get(
            "FOLKSCOPE_EV_MEMO_MAX",
            os.environ.get("FOLKSCOPE_EVS_BROADCAST_MAX", 3_000_000)))
        ref = None
        if items and len(items) <= limit:
            import numpy as np

            from ..stages.match import match_events_chunk

            pat_ref = ray.put(self.patterns())
            chunk = max(2_000, len(items) // (4 * _cpus()) + 1)
            chunks = [items[i:i + chunk] for i in range(0, len(items), chunk)]
            futs = [match_events_chunk.remote(pat_ref, c) for c in chunks]
            parts = ray.get(futs)  # (table, per-key ev counts), items order
            tbl = pa.concat_tables([t for t, _c in parts])
            counts = np.concatenate([c for _t, c in parts])
            starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
            index = {k: (int(s), int(c))
                     for k, s, c in zip(items, starts, counts)}
            # combine ONCE on the driver: workers read the broadcast table
            # zero-copy from plasma, and a multi-chunk put would force each
            # worker's combine_chunks() to heap-copy the whole memo
            ref = (ray.put(tbl.combine_chunks()), ray.put(index))
        self._cache["full_evs_ref"] = ref
        return ref

    def patterns(self) -> list:
        if "patterns" in self._cache:
            return self._cache["patterns"]
        if self.run_dir:
            fp = self._fp("patterns")
            if mf.stage_complete(self.run_dir, "patterns", fp):
                import pyarrow.parquet as pq

                d = mf.stage_dir(self.run_dir, "patterns")
                tbls = [pq.read_table(os.path.join(d, f)) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
                self._cache["patterns"] = patterns_from_table(pa.concat_tables(tbls))
                return self._cache["patterns"]
        self._stats_pass()
        if self.run_dir:
            fp = self._fp("patterns")
            ds = rd.from_arrow(patterns_to_table(self._cache["patterns"]))
            mf.checkpoint(ds, self.run_dir, "patterns", fp)
        return self._cache["patterns"]

    def canonical_map(self):
        """Surface->canonical mapping (built in the fused stats pass): a
        ``{norm: canon}`` dict below ``DRIVER_BANDING_MAX`` distinct
        surfaces, a (norm, canon) labels Dataset above it."""
        if "canon" not in self._cache:
            self._stats_pass()
        return self._cache["canon"]

    def _resolved_canon(self):
        """('dict', {norm: canon}) when the map fits a broadcast, else
        ('ds', labels Dataset) — consumers broadcast-apply or hash-join.

        The broadcast ceiling is ``FOLKSCOPE_CANON_BROADCAST_MAX`` entries
        (env-overridable; a billion-entity map cannot ship as one dict)."""
        canon = self.canonical_map()
        if isinstance(canon, dict):
            return "dict", canon
        limit = int(os.environ.get("FOLKSCOPE_CANON_BROADCAST_MAX", 2_000_000))
        canon = canon.materialize()
        if canon.count() <= limit:
            df = canon.to_pandas()
            return "dict", dict(zip(df["norm"], df["canon"]))
        return "ds", canon

    def eventualities(self) -> Dataset:
        """Per-occurrence eventualities with canonical entity ids."""
        if "events" in self._cache:
            return self._cache["events"]
        from ..stages.canonicalize import apply_canonical_join
        from ..stages.match import make_match_from_memo_fn, make_match_fn

        kind, canon = self._resolved_canon()
        ev_ref = self._full_evs_ref()
        if ev_ref is not None:
            # distinct-level memo path: each distinct assertion parsed +
            # matched ONCE cluster-wide; the per-occurrence stage over the
            # SLIM scored table is dict lookups (bit-equal to the parsed
            # path, pytest-gated) — removes the O(workers × distinct)
            # duplicated VF2 AND the per-occurrence parse
            mk = make_match_from_memo_fn(
                ev_ref[0], ev_ref[1],
                ray.put(canon) if kind == "dict" else None)
            matched = self.scored().map_batches(
                mk, batch_format="pyarrow", batch_size=None)
            ds = (matched if kind == "dict"
                  else apply_canonical_join(matched, canon))
        elif kind == "dict":
            pat_ref = ray.put(self.patterns())
            ds = self.parsed().map_batches(
                make_match_fn(pat_ref, ray.put(canon)), batch_format="pyarrow",
                batch_size=None,
            )
        else:  # canonical map exceeds broadcast size: apply via hash join
            pat_ref = ray.put(self.patterns())
            matched = self.parsed().map_batches(
                make_match_fn(pat_ref, None), batch_format="pyarrow",
                batch_size=None,
            )
            ds = apply_canonical_join(matched, canon)
        if self.run_dir:
            fp = self._fp("eventualities")
            ds = mf.checkpoint(ds, self.run_dir, "eventualities", fp)
        self._cache["events"] = ds
        return ds

    def eventualities_merged(self) -> Dataset:
        """Corpus-level exact dedup on eid with frequency merge
        (object.py:132-160 / extractor.py:417-423): shuffle keyed on eid.

        Implemented as a pure ``aggregate`` (partial+final combine — no
        map_groups): the eid is a content hash of (deps, words, pos_tags), so
        every row of a group carries an identical payload; we pack it into
        delimiter-joined string columns (Arrow ``binary_join`` kernels — no
        per-row serialization on the full occurrence stream), take first
        (any representative), and unpack with ``split_pattern`` after the
        shuffle.  Only (eid, packed payload, frequency) rows move."""
        import json

        import pyarrow.compute as pc

        nb = self._n_buckets()  # driver-side once; captured in the closure

        def pack(batch: pa.Table) -> pa.Table:
            n_rows = batch.num_rows
            # deps list<struct{gov,rel,dep}> -> "g\x1fl\x1fd" triples joined
            # on \x1e (parser-internal labels/ints: separators can't collide)
            dl = batch.column("ev_deps").combine_chunks()
            trip = pc.binary_join_element_wise(
                pc.cast(dl.values.field("gov"), pa.string()),
                dl.values.field("rel"),
                pc.cast(dl.values.field("dep"), pa.string()), "\x1f")
            d_p = pc.binary_join(
                pa.ListArray.from_arrays(dl.offsets, trip), "\x1e")
            sk_p = pc.binary_join(
                pc.cast(batch.column("skeleton_indices"),
                        pa.list_(pa.string())), ",")
            has_ner = "ev_ners" in batch.column_names
            if has_ner:
                # byte-identical to json.dumps(list[str]) — NER tags are a
                # closed alphanumeric set (never quotes/escapes), and the
                # string carries through as the merged output column
                nl = batch.column("ev_ners").combine_chunks()
                ners_json = pc.if_else(
                    pc.equal(pc.list_value_length(nl), 0), "[]",
                    pc.binary_join_element_wise(
                        '["', pc.binary_join(nl, '", "'), '"]', ""))
            else:
                ners_json = pa.array(["[]"] * n_rows, pa.string())
            if "ev_mentions" in batch.column_names:
                ml = batch.column("ev_mentions").combine_chunks()
                mlens = pc.list_value_length(ml).to_numpy()
                if (mlens == 0).all():  # common case: no mentions anywhere
                    mentions_json = pa.array(["[]"] * n_rows, pa.string())
                else:  # per-row dumps only where a mention list is non-empty
                    rows = ml.to_pylist()
                    mentions_json = pa.array(
                        ["[]" if n == 0 else json.dumps(x)
                         for n, x in zip(mlens, rows)], pa.string())
            else:
                mentions_json = pa.array(["[]"] * n_rows, pa.string())
            # vectorized co-location bucket (pd.util.hash_array, process-
            # stable) — any deterministic fn works: the merge is per-eid
            # inside the bucket and sorts on deterministic keys
            eid_np = batch.column("eid").to_pandas().to_numpy()
            buckets = (_pd.util.hash_array(eid_np, categorize=False)
                       % nb).astype("int32")
            return pa.table(
                {
                    "bucket": pa.array(buckets, pa.int32()),
                    "eid": batch.column("eid"),
                    "w_p": pc.binary_join(batch.column("words"), "\x1e"),
                    "p_p": pc.binary_join(batch.column("ev_pos_tags"), "\x1e"),
                    "d_p": d_p,
                    "sk_p": sk_p,
                    "pattern": batch.column("pattern"),
                    "rel": batch.column("rel"),
                    "ners_json": ners_json,
                    "mentions_json": mentions_json,
                    "frequency": batch.column("frequency"),
                }
            )

        def bucket_merge(df):
            # shuffle arrival order varies run to run; sort on deterministic
            # keys so the NER/mention merge (order-sensitive Counter promotion)
            # and 'first' picks are reproducible bit-for-bit
            df = df.sort_values(["eid", "ners_json", "mentions_json", "frequency"],
                                kind="mergesort")
            out = (
                df.groupby("eid", sort=False)
                .agg(w_p=("w_p", "first"), p_p=("p_p", "first"),
                     d_p=("d_p", "first"), sk_p=("sk_p", "first"),
                     pattern=("pattern", "first"), rel=("rel", "first"),
                     frequency=("frequency", "sum"),
                     support=("w_p", "size"),
                     ners_json=("ners_json", "first"),
                     n_ner=("ners_json", "nunique"),
                     mentions_json=("mentions_json", "first"),
                     n_men=("mentions_json", "nunique"))
                .reset_index()
            )
            # NER-Counter merge + mention union (object.py:145-156) only for
            # the rare eids whose occurrences actually disagree — agreeing
            # groups take the vectorized fast path above
            mixed = out.index[(out["n_ner"] > 1) | (out["n_men"] > 1)]
            if len(mixed):
                from ..patterns import merge_mention_lists, merge_ner_lists

                for ridx in mixed:
                    eid = out.at[ridx, "eid"]
                    rows = df[df["eid"] == eid]
                    out.at[ridx, "ners_json"] = json.dumps(merge_ner_lists(
                        [(json.loads(nj), f) for nj, f in
                         zip(rows["ners_json"], rows["frequency"])]
                    ), sort_keys=True)
                    out.at[ridx, "mentions_json"] = json.dumps(
                        merge_mention_lists(
                            [json.loads(mj) for mj in rows["mentions_json"]]
                        )
                    )
            return out.drop(columns=["n_ner", "n_men"])

        from ..stages.parse import DEP_STRUCT, MENTION_STRUCT

        def split_list(col, sep: str) -> pa.ListArray:
            """split_pattern with the empty-string row fixed to [] (split
            alone yields [""]); only rows that ARE empty pay any Python."""
            arr = (col.combine_chunks()
                   if isinstance(col, pa.ChunkedArray) else col)
            lst = pc.split_pattern(arr, sep)
            if isinstance(lst, pa.ChunkedArray):
                lst = lst.combine_chunks()
            empty = pc.equal(arr, "")
            if not pc.any(empty).as_py():
                return lst
            import numpy as np

            off = lst.offsets.to_numpy()
            emp = empty.to_numpy(zero_copy_only=False).astype(bool)
            lens = np.diff(off)
            lens[emp] = 0
            new_off = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
            keep = np.ones(len(lst.values), dtype=bool)
            for i in np.nonzero(emp)[0]:
                keep[off[i]:off[i + 1]] = False
            return pa.ListArray.from_arrays(
                pa.array(new_off, pa.int32()),
                lst.values.filter(pa.array(keep)))

        def unpack(batch: pa.Table) -> pa.Table:
            trip = split_list(batch.column("d_p"), "\x1e")
            fields = pc.split_pattern(trip.values, "\x1f")
            dep_struct = pa.StructArray.from_arrays(
                [pc.cast(pc.list_element(fields, 0), pa.int32()),
                 pc.list_element(fields, 1),
                 pc.cast(pc.list_element(fields, 2), pa.int32())],
                names=["gov", "rel", "dep"],
            ) if len(trip.values) else pa.array([], DEP_STRUCT)
            deps = pa.ListArray.from_arrays(trip.offsets, dep_struct)
            mj = batch.column("mentions_json").to_pylist()
            mentions = [[] if m == "[]" else json.loads(m) for m in mj]
            return pa.table(
                {
                    "eid": batch.column("eid"),
                    "words": split_list(batch.column("w_p"), "\x1e"),
                    "ev_pos_tags": split_list(batch.column("p_p"), "\x1e"),
                    "ev_deps": pc.cast(deps, pa.list_(DEP_STRUCT)),
                    "skeleton_indices": pc.cast(
                        split_list(batch.column("sk_p"), ","),
                        pa.list_(pa.int32())),
                    "pattern": batch.column("pattern"),
                    "rel": batch.column("rel"),
                    # per-position tag or frequency-weighted tag-Counter dict
                    # (heterogeneous after a disagreeing merge -> JSON column)
                    "ners": batch.column("ners_json"),
                    "mentions": pa.array(mentions, pa.list_(MENTION_STRUCT)),
                    "frequency": batch.column("frequency"),
                    "support": batch.column("support"),
                }
            )

        return (
            self.eventualities()
            .map_batches(pack, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_merge, batch_format="pandas")
            .map_batches(unpack, batch_format="pyarrow")
        )

    def concepts(self) -> Dataset:
        """Concept instances per distinct eventuality (actor-pool taxonomy)."""
        tax_ref = ray.put(taxonomy_rows())
        return self.eventualities_merged().map_batches(
            Conceptualizer,
            batch_format="pyarrow",
            fn_constructor_kwargs={"taxonomy": tax_ref},
            concurrency=(1, max(2, _cpus() // 2)),
        )

    def concept_agg(self) -> Dataset:
        """cid-level aggregation: score = Σ score×frequency
        (conceptualizer.py:649-663).  Bucketed combine like the triple agg —
        most cids have few instances, so a keyed aggregate would pay
        per-group overhead on ~1-row groups."""
        nb = self._n_buckets()  # driver-side once; captured in the closure

        def weighted(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            w = pc.multiply(batch.column("score"), batch.column("frequency"))
            out = batch.append_column("weighted_score", w)
            cid_np = batch.column("cid").to_pandas().to_numpy()
            buckets = (_pd.util.hash_array(cid_np, categorize=False)
                       % nb).astype("int32")
            return out.append_column("cbucket", pa.array(buckets, pa.int32()))

        def combine(df):
            # deterministic float-summation order: shuffle arrival order varies
            # run to run, so sort on a unique key before the groupby-sum (the
            # fixture/oracle compare hashes raw float bits)
            df = df.sort_values(["cid", "eid", "weighted_score"], kind="mergesort")
            return (
                df.groupby("cid", sort=False)
                .agg(score=("weighted_score", "sum"), n_instances=("cid", "size"))
                .reset_index()
            )

        return (
            self.concepts()
            .map_batches(weighted, batch_format="pyarrow")
            .groupby("cbucket")
            .map_groups(combine, batch_format="pandas")
        )

    def triples(self) -> Dataset:
        """Final KG edges: (subj, pred, obj) + scores + support + lineage."""
        if "triples" in self._cache:
            return self._cache["triples"]

        # _stats_pass (via patterns()) publishes the sorted lineage array;
        # force it BEFORE reading the cache so rank mode engages on a fresh
        # pipeline (patterns() is cached/idempotent — no extra work)
        self.patterns()
        lineage_sorted = self._cache.get("lineage_sorted")
        lin_is_rank = lineage_sorted is not None

        def bucket_combine(t: pa.Table) -> pa.Table:
            # Arrow-native final combine: ~3x faster than the pandas
            # equivalent on these string-heavy 100k-row buckets (no
            # Arrow->pandas conversion, single-pass hash aggregate).
            # ``use_threads=False``: each map_groups task is already one
            # CPU slot; letting Arrow fan out threads oversubscribes.
            # lineage is ASCII, so Arrow's binary min == Python str min;
            # in rank mode it is the int64 global rank (same min order).
            if t.num_rows == 0:
                # typed empty: an empty group block would otherwise emit a
                # column-less table and diverge the stream schema
                return pa.table(
                    {"subj": pa.array([], pa.string()),
                     "pred": pa.array([], pa.string()),
                     "obj": pa.array([], pa.string()),
                     "support": pa.array([], pa.int64()),
                     "frequency": pa.array([], pa.float64()),
                     "plausibility": pa.array([], pa.float64()),
                     "typicality": pa.array([], pa.float64()),
                     "lineage": pa.array(
                         [], pa.int64() if lin_is_rank else pa.string())}
                )
            g = t.group_by(["subj", "pred", "obj"], use_threads=False).aggregate(
                [("support_p", "sum"), ("frequency_p", "sum"),
                 ("plausibility_p", "max"), ("typicality_p", "max"),
                 ("lineage_p", "min")]
            )
            renames = {"support_p_sum": "support", "frequency_p_sum": "frequency",
                       "plausibility_p_max": "plausibility",
                       "typicality_p_max": "typicality", "lineage_p_min": "lineage"}
            return g.rename_columns([renames.get(c, c) for c in g.column_names])

        # Fused match -> per-block (subj, pred, obj) partials: the map side
        # never materializes the per-event table, and hot triples (the skewed
        # hot entity's pairs) collapse inside each block BEFORE the shuffle —
        # the reducer sees pre-combined partials, never the raw row stream.
        # The shuffle keys on a hash BUCKET (≈4×cpus of them), not the raw
        # 3-string key: with ~1 output row per key, per-group accumulator
        # overhead in a keyed aggregate dwarfs the math, so each bucket runs
        # one VECTORIZED pandas groupby instead (bucket_combine above).
        from ..stages.match import make_triple_partials_fn

        pat_ref = ray.put(self.patterns())
        kind, canon = self._resolved_canon()
        nb = self._n_buckets()
        evs_ref = self._evs_ref()  # broadcast global match memo (lazy)
        lineage_ref = (ray.put(pa.array(lineage_sorted, pa.string()))
                       if lin_is_rank else None)
        if kind == "dict":
            partial_ds = self.scored().map_batches(
                make_triple_partials_fn(pat_ref, ray.put(canon), nb,
                                        evs_ref=evs_ref,
                                        lineage_ref=lineage_ref),
                batch_format="pyarrow",
                batch_size=None,
            )
        else:
            # web-scale canonical map: partials key on normalized surfaces,
            # the (norm, canon) labels join on afterwards, THEN the subj key
            # fuses and buckets — sum/max/min partials re-aggregate exactly
            from ..stages.canonicalize import apply_canonical_join
            from ..util import stable_u64

            norm_partials = self.scored().map_batches(
                make_triple_partials_fn(pat_ref, None, nb, evs_ref=evs_ref,
                                        lineage_ref=lineage_ref),
                batch_format="pyarrow",
                batch_size=None,
            )
            joined = apply_canonical_join(
                norm_partials, canon,
                cols=(("norm_a", "canon_a"), ("norm_b", "canon_b")),
            )

            def fuse_subj(b: pa.Table) -> pa.Table:
                # Vectorized: ONE Arrow join kernel for the subj strings and
                # the stable_u64 bucket hash paid only per DISTINCT
                # (subj, pred, obj) key — this runs exactly in the
                # beyond-broadcast (web-scale) regime, where partials from
                # many blocks share keys, so distinct << rows.  Bucket
                # values are IDENTICAL to the broadcast path's
                # (make_triple_partials_fn) per-key stable_u64, keeping the
                # CANON_BROADCAST_MAX=0 equivalence bit-exact.
                import numpy as np
                import pandas as pd
                import pyarrow.compute as pc

                if b.num_rows == 0:
                    out = b.drop_columns(
                        ["norm_a", "norm_b", "canon_a", "canon_b"])
                    out = out.append_column("subj", pa.array([], pa.string()))
                    return out.append_column(
                        "bucket", pa.array([], pa.int32()))
                from ..util import factorize_string_columns

                subj = pc.binary_join_element_wise(
                    b.column("canon_a"), b.column("canon_b"), "-")
                # length-prefixed packing: two distinct triples can never
                # share a factorize group even when a field contains the
                # delimiter; nulls (impossible after the canonical-join
                # coalesce) raise instead of corrupting the last group
                codes, ng = factorize_string_columns(
                    subj, b.column("pred"), b.column("obj"))
                # hash the actual field values at each key's first row (not
                # a split of the packed key) so the bucket equals the
                # broadcast path's stable_u64(s, p, o) for ANY strings
                first = np.full(ng, b.num_rows, dtype=np.int64)
                np.minimum.at(first, codes,
                              np.arange(b.num_rows, dtype=np.int64))
                subj_np = subj.to_numpy(zero_copy_only=False)
                pred_np = b.column("pred").to_numpy(zero_copy_only=False)
                obj_np = b.column("obj").to_numpy(zero_copy_only=False)
                hb = np.fromiter(
                    (stable_u64(subj_np[r], pred_np[r], obj_np[r]) % nb
                     for r in first),
                    dtype=np.int64, count=ng)
                out = b.drop_columns(["norm_a", "norm_b", "canon_a", "canon_b"])
                out = out.append_column(
                    "subj", subj.combine_chunks()
                    if isinstance(subj, pa.ChunkedArray) else subj)
                return out.append_column(
                    "bucket", pa.array(hb[codes].astype(np.int32), pa.int32()))

            partial_ds = joined.map_batches(fuse_subj, batch_format="pyarrow")
        agg = (
            partial_ds
            .groupby("bucket")
            .map_groups(bucket_combine, batch_format="pyarrow")
        )

        def unpack(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            lin_col = batch.column("lineage")
            if lineage_ref is not None:
                # rank mode: restore the string from the broadcast sorted
                # array (one take kernel; array resolved once per worker)
                from ..stages.match import _WORKER_CACHE

                lkey = "LA" + lineage_ref.hex()
                lin_arr = _WORKER_CACHE.get(lkey)
                if lin_arr is None:
                    from ..util import broadcast_cache_put as _bput

                    lin_arr = ray.get(lineage_ref)
                    # bounded insert: a raw assignment would re-open the
                    # per-invocation broadcast leak the FIFO cache closes
                    _bput(_WORKER_CACHE, lkey, lin_arr)
                lin_col = pc.take(lin_arr, lin_col)
            # vectorized lineage split (Arrow kernel, no per-row Python):
            # lineage = repo\tpath\tcommit\tsha, all four tab-free
            parts = pc.split_pattern(lin_col, pattern="\t")
            out = batch.drop_columns(["lineage"])
            for i, name in enumerate(("repo", "path", "commit",
                                      "content_sha256")):
                out = out.append_column(
                    name, pc.list_element(parts, i).combine_chunks()
                    if batch.num_rows else pa.array([], pa.string()))
            return out

        ds = agg.map_batches(unpack, batch_format="pyarrow")
        if self.run_dir:
            fp = self._fp("triples")
            if not mf.stage_complete(self.run_dir, "triples", fp):
                import tempfile

                tmp_out = tempfile.mkdtemp(dir=self.run_dir, prefix=".triples-tmp-")
                ds.write_parquet(tmp_out, partition_cols=["pred"])
                mf.finalize_stage_partitioned(self.run_dir, "triples", fp, tmp_out)
            ds = rd.read_parquet(mf.stage_dir(self.run_dir, "triples"))
        self._cache["triples"] = ds
        return ds


    def concept_triples(self) -> Dataset:
        """Concept-level KG edges: (subj, pred, concept_obj, score, support).

        The reference's released KG carries both eventuality- and
        concept-level assertions (conceptualized_eventualities,
        conceptualizer.py:667-688; consumed preprocess.py:172-199).  Shape:
        eventuality occurrences (eid -> subj,pred) joined to concept
        instances (eid -> cid) via a hash join keyed on eid, then the same
        bucketed combine as triples."""
        ev = self.eventualities().map_batches(
            lambda b: b.select(["eid", "canon_a", "canon_b", "rel", "frequency"]),
            batch_format="pyarrow", batch_size=None,
        )
        def concept_obj(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            # Arrow list-join kernel == " ".join(words) per row, no Python
            col = b.column("concept_words")
            joined = (pc.binary_join(col, " ").cast(pa.string())
                      if b.num_rows else pa.array([], pa.string()))
            return pa.table({"eid": b.column("eid"), "concept_obj": joined,
                             "score": b.column("score")})

        conc = self.concepts().map_batches(concept_obj, batch_format="pyarrow")
        from ..ops.relational import hash_join

        joined = hash_join(ev, conc, on="eid")
        nb = self._n_buckets()  # driver-side once; captured in the closure

        def partials(batch: pa.Table) -> pa.Table:
            # Vectorized map-side combine (the make_triple_partials_fn
            # discipline, stages/match.py:344): Python touches only the
            # DISTINCT (subj, pred, obj) keys per block — the joined
            # occurrence stream stays in Arrow/numpy.  Bit-equal to the
            # per-row dict loop it replaced: pd.factorize's first-occurrence
            # order mirrors dict insertion order, np.rint is the same
            # round-half-even as Python round(), and int64 partial sums are
            # associative so the final score is bit-identical across any
            # block/batch partitioning (float partials would differ in the
            # LSB between parallelism levels and break fixture hash-compare).
            import numpy as np
            import pandas as pd
            import pyarrow.compute as pc

            from ..util import stable_u64

            if batch.num_rows == 0:
                return pa.table(
                    {"bucket": pa.array([], pa.int32()),
                     "subj": pa.array([], pa.string()),
                     "pred": pa.array([], pa.string()),
                     "obj": pa.array([], pa.string()),
                     "support_p": pa.array([], pa.int64()),
                     "score_p": pa.array([], pa.int64())}
                )
            from ..util import factorize_string_columns

            subj = pc.binary_join_element_wise(
                batch.column("canon_a"), batch.column("canon_b"), "-")
            # length-prefixed packed key (see factorize_string_columns):
            # fields containing the delimiter can never merge two distinct
            # (subj, rel, concept_obj) groups' partial sums
            codes, g = factorize_string_columns(
                subj, batch.column("rel"), batch.column("concept_obj"))
            sp = np.rint(
                batch.column("score").to_numpy(zero_copy_only=False)
                * batch.column("frequency").to_numpy(zero_copy_only=False)
                * 1e6).astype(np.int64)
            support = np.bincount(codes, minlength=g).astype(np.int64)
            score_p = np.zeros(g, dtype=np.int64)
            np.add.at(score_p, codes, sp)
            first = np.full(g, batch.num_rows, dtype=np.int64)
            np.minimum.at(first, codes,
                          np.arange(batch.num_rows, dtype=np.int64))
            subj_g = subj.to_numpy(zero_copy_only=False)[first]
            pred_g = batch.column("rel").to_numpy(
                zero_copy_only=False)[first]
            obj_g = batch.column("concept_obj").to_numpy(
                zero_copy_only=False)[first]
            return pa.table(
                {
                    "bucket": pa.array(
                        [stable_u64(s, p, o) % nb
                         for s, p, o in zip(subj_g, pred_g, obj_g)],
                        pa.int32()),
                    "subj": pa.array(subj_g, pa.string()),
                    "pred": pa.array(pred_g, pa.string()),
                    "obj": pa.array(obj_g, pa.string()),
                    "support_p": pa.array(support, pa.int64()),
                    "score_p": pa.array(score_p, pa.int64()),
                }
            )

        def combine(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            if t.num_rows == 0:
                return pa.table(
                    {"subj": pa.array([], pa.string()),
                     "pred": pa.array([], pa.string()),
                     "obj": pa.array([], pa.string()),
                     "support": pa.array([], pa.int64()),
                     "score": pa.array([], pa.float64())}
                )
            g = t.group_by(["subj", "pred", "obj"], use_threads=False).aggregate(
                [("support_p", "sum"), ("score_p", "sum")]
            )
            score = pc.divide(
                pc.cast(g.column("score_p_sum"), pa.float64()), 1e6
            )  # back from fixed-point; same int64-sum -> float64 divide as before
            g = g.rename_columns(
                ["support" if c == "support_p_sum" else c for c in g.column_names]
            )
            return g.drop_columns(["score_p_sum"]).append_column("score", score)

        return (
            joined.map_batches(partials, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(combine, batch_format="pyarrow")
        )

    def edge_features(self) -> Dataset:
        """SBERT-contract edge embeddings (T7): every (subj, pred, obj) edge
        text encoded by the actor-pool embedder (model loaded once per
        actor), feeding the mean-pool / ANN consumers — the reference's
        eventuality_SBERT_feature.json step
        (src/recommendation/preprocess.py:168-199) as a streaming stage."""
        from ..stages.embed import SentenceEmbedder

        return self.triples().map_batches(
            SentenceEmbedder,
            batch_format="pyarrow",
            fn_constructor_kwargs={"text_col": "obj"},
            concurrency=(1, max(2, _cpus() // 2)),
        )

    def run_metrics(self) -> dict:
        """Per-stage metrics for the current run (north rule: lineage +
        metrics): stage row counts from manifests (checkpointed runs) or
        live counts, pattern/canonicalization cardinalities."""
        out: dict = {"source_path": self.source_path}
        if self.run_dir:
            for stage in ("scored", "patterns", "eventualities", "triples"):
                m = mf.load_manifest(self.run_dir, stage)
                if m:
                    out[stage] = {"rows": m["rows"], "partitions": len(m["partitions"])}
        if "patterns" in self._cache:
            out["n_patterns"] = len(self._cache["patterns"])
        if "canon" in self._cache:
            canon = self._cache["canon"]
            if isinstance(canon, dict):
                out["n_surfaces"] = len(canon)
                out["n_canonical_entities"] = len(set(canon.values()))
            else:  # labels Dataset (web-scale path): count non-identity rows
                out["n_merged_surfaces"] = canon.count()
        if self.run_dir:
            import json as _json

            path = os.path.join(self.run_dir, "metrics.json")
            with open(path, "w") as f:
                _json.dump(out, f, indent=1)
        return out


def build_kg(source_path: str, run_dir: str | None = None) -> KGPipeline:
    if run_dir:
        os.makedirs(run_dir, exist_ok=True)
    return KGPipeline(source_path, run_dir)


def shard_dir_name(src: str) -> str:
    """Checkpoint dir for one incremental shard, keyed by a content hash of
    the shard's source path — NOT its list position.  Inserting or
    reordering shards must not shift other shards' checkpoint dirs
    (positional keys would fingerprint-miss and rebuild every later shard —
    correct but defeats the incremental point)."""
    import hashlib

    tag = hashlib.sha256(os.path.abspath(src).encode()).hexdigest()[:16]
    return f"shard-{tag}"


def build_kg_incremental(shard_sources: list[str], run_dir: str) -> KGPipeline:
    """Incremental / sharded KG build: new corpus increments pay ONLY their
    own generation cost; the KG products stay exactly equal to a full
    rebuild over the union.

    Per shard, a sub-pipeline materializes the ``scored`` checkpoint under
    ``run_dir/shard{i}`` — an already-checkpointed shard (manifest
    fingerprint matching its source files) is skipped entirely, so adding
    shard k+1 to a k-shard run re-runs generation/critic for the NEW shard
    only.  The returned union pipeline reads the scored checkpoints
    directly (a multi-directory parquet scan) and computes pattern mining,
    canonicalization and triple aggregation over the FULL union — those are
    the corpus-global barriers (mining thresholds and the LSH canonical map
    depend on union-wide counts/surfaces), so recomputing them from the
    checkpoints is what EXACT equality with a monolithic rebuild requires;
    they are scan+shuffle passes, not model work.  The union's own stage
    fingerprints chain from the shard checkpoints' content identity, so a
    recomputed or added shard invalidates union products (and nothing else).

    Equality with the monolithic build is pytest-gated
    (``test_incremental_build_matches_full``)."""
    os.makedirs(run_dir, exist_ok=True)
    scored_dirs: list[str] = []
    for src in shard_sources:
        sub = os.path.join(run_dir, shard_dir_name(src))
        shard = build_kg(src, run_dir=sub)
        shard.scored()  # checkpoint if absent; resume-skip if fingerprint matches
        scored_dirs.append(mf.stage_dir(sub, "scored"))
    # canonical (sorted) shard order: the union's identity, fingerprint and
    # read order must not depend on the caller's list order — downstream
    # stages are partition-order invariant (pytest-gated), so a reordered
    # shard list resumes every union product instead of rebuilding it
    union = KGPipeline("union://" + "|".join(sorted(shard_sources)),
                       os.path.join(run_dir, "union"),
                       scored_sources=tuple(sorted(scored_dirs)))
    os.makedirs(union.run_dir, exist_ok=True)
    return union
