"""Distributed inverted index: term -> (document frequency, posting list).

The foundational text-retrieval structure a 100-TB corpus pipeline needs
(dedup diagnostics, BM25 features, corpus search).  Two stages:

1. **Postings map** (``map_batches``): tokenize each document (lowercase,
   ``[a-z0-9]+`` — byte-for-byte the oracle's ``regexp_split_to_array``
   semantics), de-duplicate terms *within* the document, and emit slim
   ``(term, doc_id)`` rows.  Per-block term sets are the map-side combine:
   a term repeated k times in a doc ships once.
2. **Posting-list reduce**: rows shuffle keyed on ``hash(term) % n_buckets``
   (NOT on the raw term — millions of tiny groups would drown the sort in
   per-group overhead), then one vectorized pandas groupby per bucket builds
   ``df`` and the doc_id-sorted posting string.

Skew note (100 TB): stopword-grade terms produce giant posting lists; the
``max_df`` guard drops terms whose document frequency exceeds it BEFORE the
posting string is built (df comes from a cheap count first), which is also
what a retrieval system wants.  Posting lists beyond single-task memory
would shard as (term, shard_idx) rows — documented, not needed at driver
scale.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

TERM_RE = re.compile(r"[a-z0-9]+")


def _n_buckets(ds_size_hint: int | None) -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8))
    if ds_size_hint:
        return max(2 * cpus, min(ds_size_hint // 200_000 + 1, 65_536))
    return 2 * cpus


def inverted_index(
    ds: Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    max_df: int | None = None,
    size_hint_rows: int | None = None,
) -> Dataset:
    """Build the index; returns (term, df, postings) with postings a
    comma-joined doc_id-ascending string (deterministic at any parallelism)."""
    nb = _n_buckets(size_hint_rows)

    def postings_map(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        out_terms: list[str] = []
        out_ids: list[int] = []
        for did, t in zip(ids, texts):
            toks = set(TERM_RE.findall(t.lower()))
            out_terms.extend(toks)
            out_ids.extend([did] * len(toks))
        return pa.table(
            {
                "term": pa.array(out_terms, pa.string()),
                id_col: pa.array(out_ids, pa.int64()),
            }
        )

    pairs = ds.select_columns([id_col, text_col]).map_batches(
        postings_map, batch_format="pyarrow"
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        # stable cross-process bucket: pd.util.hash_array (siphash with
        # pandas' fixed key — process-stable, unlike salted builtin hash();
        # bucket assignment is an internal co-location detail, not part of
        # the output contract, so pandas-version stability is not required)
        buckets = pd.util.hash_array(
            batch.column("term").to_pandas().to_numpy(dtype=object)
        ).astype("int64") % nb
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    bucketed = pairs.map_batches(add_bucket, batch_format="pyarrow")

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"term": pd.Series([], dtype=str),
                 "df": pd.Series([], dtype="int64"),
                 "postings": pd.Series([], dtype=str)}
            )
        df = df.sort_values(["term", id_col], kind="mergesort")
        g = df.groupby("term", sort=False)
        counts = g[id_col].count()
        keep = counts[counts >= min_df]
        if max_df is not None:
            keep = keep[keep <= max_df]
        sub = df[df["term"].isin(keep.index)]
        posts = sub.groupby("term", sort=False)[id_col].agg(
            lambda s: ",".join(map(str, s))
        )
        return pd.DataFrame(
            {"term": keep.index.to_numpy(dtype=object),
             "df": keep.to_numpy(dtype="int64"),
             "postings": posts.loc[keep.index].to_numpy(dtype=object)}
        )

    return (
        bucketed.groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )


def bm25_topk(
    docs: Dataset,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize_digits: int = 6,
) -> pd.DataFrame:
    """Top-k documents for a term query under BM25-style scoring.

    Two shuffle-free passes:

    1. **Corpus stats**: each block emits ONE partial row (n_docs, sum_dl,
       per-term df); the driver folds them into N, avgdl and the idf
       vector (a handful of doubles, broadcast into pass 2's closure).
    2. **Score + block top-k**: per block, per-doc tf/dl drive the BM25
       sum; scores are quantized to 1e-``quantize_digits`` BEFORE top-k
       selection (ties then break by id ascending) and only k rows per
       block travel to the driver merge — k × n_blocks, never the corpus.

    The idf is the RATIONAL variant ``(N - df + 0.5) / (df + 0.5)`` — no
    transcendental log, so every float op is one IEEE division /
    multiplication / addition evaluated in the same order as the SQL
    oracle's expression tree and the quantized score hash-compares exactly
    (same discipline as ``tfidf_top_terms`` / ``ann_cosine_topk``)."""
    terms = list(query_terms)
    ncols = [f"__df{i}" for i in range(len(terms))]

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        dfs = [0] * len(terms)
        sum_dl = 0
        for t in texts:
            toks = TERM_RE.findall(t.lower())
            sum_dl += len(toks)
            s = set(toks)
            for i, term in enumerate(terms):
                if term in s:
                    dfs[i] += 1
        cols = {"__nd": pa.array([len(texts)], pa.int64()),
                "__dl": pa.array([sum_dl], pa.int64())}
        for c, v in zip(ncols, dfs):
            cols[c] = pa.array([v], pa.int64())
        return pa.table(cols)

    parts = (docs.select_columns([text_col])
             .map_batches(stats, batch_format="pyarrow").to_pandas())
    n_total = float(parts["__nd"].sum()) if len(parts) else 0.0
    sum_dl = float(parts["__dl"].sum()) if len(parts) else 0.0
    if n_total == 0.0 or sum_dl == 0.0:
        # empty corpus (or all-empty texts): no doc can score
        return pd.DataFrame({id_col: pd.Series([], dtype="int64"),
                             "score": pd.Series([], dtype="float64")})
    avgdl = sum_dl / n_total
    idf = [(n_total - float(parts[c].sum()) + 0.5)
           / (float(parts[c].sum()) + 0.5) for c in ncols]
    scale = float(10 ** quantize_digits)

    import numpy as np
    import ray as _ray

    idf_ref = _ray.put((idf, avgdl))

    def score_block(batch: pa.Table) -> pa.Table:
        idf_v, avg = _ray.get(idf_ref)
        ids = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        n = len(ids)
        dl = np.empty(n, dtype=np.float64)
        tf = np.zeros((len(terms), n), dtype=np.float64)
        for j, t in enumerate(texts):
            toks = TERM_RE.findall(t.lower())
            dl[j] = float(len(toks))
            # one Counter pass per doc, not one full token-list rescan per
            # query term (T x |doc| comparisons -> |doc| + T lookups)
            cnt = Counter(toks)
            for i, term in enumerate(terms):
                tf[i, j] = float(cnt[term])
        total = np.zeros(n, dtype=np.float64)
        for i in range(len(terms)):
            # expression tree mirrors the SQL oracle exactly (same order)
            total = total + idf_v[i] * (tf[i] * (k1 + 1.0)) / (
                tf[i] + k1 * ((1.0 - b) + (b * dl / avg)))
        q = np.round(total * scale).astype(np.int64) / scale
        order = np.lexsort((np.asarray(ids), -q))[:k]
        return pa.table({
            id_col: pa.array([ids[i] for i in order]),
            "score": pa.array(q[order], pa.float64()),
        })

    merged = (docs.select_columns([id_col, text_col])
              .map_batches(score_block, batch_format="pyarrow").to_pandas())
    merged = merged.sort_values(["score", id_col], ascending=[False, True],
                                kind="mergesort").head(k)
    return merged.reset_index(drop=True)


def rrf_fuse(ranked: list[Dataset], id_col: str, rank_col: str = "rnk",
             k0: int = 60, ppm: int = 1_000_000,
             score_alias: str = "rrf_ppm",
             lists_alias: str = "n_lists") -> Dataset:
    """Reciprocal-rank fusion (Cormack et al. 2009): merge N independent
    ranked lists into one consensus ranking with
    ``score = sum_lists ppm // (k0 + rank)`` — the standard way a curation
    pipeline combines a lexical ranker (BM25) with a dense one (ANN) or a
    quality prior, with no score calibration between them.

    Contract: each input Dataset carries ``(id, rank)`` with rank 1-based;
    scores are integer micro-units (``ppm // (k0 + rank)``, floor division)
    so the fused sum is hash-exact across engines and parallelism.

    Scale shape: scoring is a stateless scan per list, the union is
    block-level concat (no data movement), and the per-id sum is map-side
    combined — the shuffle moves one partial row per (id, block), bounded
    by the lists' lengths, never by corpus size."""
    from .relational import map_combine_aggregate

    if not ranked:
        raise ValueError("rrf_fuse: need at least one ranked list")

    def score(b: pa.Table) -> pa.Table:
        r = b.column(rank_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(r) and r.min() < 1:
            raise ValueError("rrf_fuse: ranks must be 1-based positive")
        return pa.table({
            id_col: b.column(id_col),
            "__s": pa.array(ppm // (k0 + r), pa.int64()),
        })

    scored = ranked[0].select_columns([id_col, rank_col]).map_batches(
        score, batch_format="pyarrow")
    for ds in ranked[1:]:
        scored = scored.union(ds.select_columns([id_col, rank_col])
                              .map_batches(score, batch_format="pyarrow"))
    return map_combine_aggregate(scored, keys=[id_col],
                                 sums={"__s": score_alias},
                                 count_alias=lists_alias)


def ndcg_at_k(ds: Dataset, id_col: str, score_col: str, rel_col: str,
              k: int = 50) -> pd.DataFrame:
    """nDCG@k of a ranking against graded relevance labels — the standard
    retrieval/eval metric a curation pipeline reports when it reorders
    documents (by quality, BM25, or a reward model).

    ``DCG = sum_i rel_i / log2(i + 1)`` over the top-k by
    ``(score DESC, id ASC)`` (a TOTAL order — boundary ties cut
    identically on both engines); ``IDCG`` uses the ideal ordering of the
    SAME top-k's relevance grades (the within-window convention, so both
    engines sort the identical multiset).  Every per-rank term is
    quantized to integer micro-units before summing (the entropy_docs
    discipline).  Returns one row per rank ``(rnk, rel, dcg_micro,
    idcg_micro)`` — column sums give DCG/IDCG, their ratio the nDCG.

    Scale shape: ONE distributed total-order sort with an early limit —
    the driver only ever holds k rows; relevance grading is part of the
    upstream scan."""

    top = (ds.select_columns([id_col, score_col, rel_col])
           .sort([score_col, id_col], descending=[True, False])
           .limit(k).to_pandas())
    r = np.arange(1, len(top) + 1, dtype=np.int64)
    rel = top[rel_col].to_numpy().astype(np.float64)
    # the emitted rel column is int64: fractional grades would silently
    # contradict the DCG computed from the float values — enforce the
    # integral-grade contract instead (quantize fractional labels upstream)
    if not np.array_equal(rel.astype(np.int64).astype(np.float64), rel):
        raise ValueError(
            "ndcg_at_k: rel_col must carry integral relevance grades "
            "(emitted rel is int64); scale fractional labels to integers "
            "upstream")
    dcg = rel / np.log2(r + 1)
    ideal = np.sort(rel)[::-1]
    idcg = ideal / np.log2(r + 1)
    return pd.DataFrame({
        "rnk": pd.array(r, dtype="int64"),
        "rel": pd.array(rel.astype(np.int64), dtype="int64"),
        "dcg_micro": pd.array(
            np.floor(dcg * 1e6 + 0.5).astype(np.int64), dtype="int64"),
        "idcg_micro": pd.array(
            np.floor(idcg * 1e6 + 0.5).astype(np.int64), dtype="int64"),
    })
