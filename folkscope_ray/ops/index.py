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
        # stable cross-process bucket: md5 of the term (hash() is salted)
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
