"""Benchmark decontamination: flag corpus documents that share n-gram spans
with an evaluation/benchmark set.

The standard training-data hygiene pass (the n-gram-overlap rule used by
GPT-3/PaLM-style dataset reports): a document is contaminated when a
sufficient fraction of its token n-grams also occur in the benchmark set.

Execution shape (100-TB contract):

- The benchmark side is SMALL (eval sets are thousands of documents): its
  distinct n-grams are collected once and broadcast via ``ray.put`` — read
  once per worker, never re-shipped per batch.  At this scale we broadcast
  the exact string set; a benchmark too large for that would broadcast
  64-bit n-gram hashes instead (collision odds ~1e-19 per pair) or fall
  back to the Bloom-prefiltered semi-join in ``ops/bloom.py``.
- The corpus side is one stateless ``map_batches`` scan — no shuffle at
  all.  Per document we count n-gram POSITIONS hitting the set (the
  conservative variant: repeated contaminated spans keep counting).

Tokenization is ``[a-z0-9]+`` on the lowercased text — byte-identical to a
DuckDB ``regexp_extract_all`` oracle, so the contamination ratio (one IEEE
division of identical integer operands) hash-compares exactly.
"""

from __future__ import annotations

import pyarrow as pa
import ray
from ray.data import Dataset

from ..util import broadcast_cache_put

from .index import TERM_RE

# per-worker-process cache for broadcast-state task closures (the
# stages/match.py pattern: ray.get once per worker process, not per batch)
_WORKER_CACHE: dict[str, object] = {}


def _ngrams(text: str, n: int) -> list[str]:
    toks = TERM_RE.findall(text.lower())
    if len(toks) < n:
        return []
    return [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]


def benchmark_ngram_set(bench: Dataset, text_col: str, n: int) -> set[str]:
    """Distinct n-grams of the (small) benchmark set, gathered per block
    remotely and union-merged on the driver (only distinct grams travel)."""

    def grams(batch: pa.Table) -> pa.Table:
        out: set[str] = set()
        for t in batch.column(text_col).to_pylist():
            out.update(_ngrams(t, n))
        return pa.table({"ng": pa.array(sorted(out), pa.string())})

    parts = bench.select_columns([text_col]).map_batches(
        grams, batch_format="pyarrow")
    result: set[str] = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        result.update(b.column("ng").to_pylist())
    return result


def ngram_contamination(
    docs: Dataset,
    bench: Dataset,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    threshold: float = 0.5,
) -> Dataset:
    """Per-document contamination report vs the benchmark set.

    Returns (id, n_ngrams, n_hits, contamination, contaminated) — documents
    with fewer than ``n`` tokens carry n_ngrams = 0 and contamination 0.0
    (nothing to match on)."""
    grams = benchmark_ngram_set(bench, bench_text_col or text_col, n)
    grams_ref = ray.put(grams)

    def scan_batch(batch: pa.Table) -> pa.Table:
        # stateless task; the broadcast n-gram set resolves once per worker
        # process via the module cache (no actor-pool spin-up)
        ck = "dc" + grams_ref.hex()
        g = _WORKER_CACHE.get(ck)
        if g is None:
            g = ray.get(grams_ref)
            broadcast_cache_put(_WORKER_CACHE, ck, g)
        texts = batch.column(text_col).to_pylist()
        totals, hits, ratios = [], [], []
        for t in texts:
            ngs = _ngrams(t, n)
            h = sum(1 for x in ngs if x in g)
            totals.append(len(ngs))
            hits.append(h)
            ratios.append(h / len(ngs) if ngs else 0.0)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_ngrams": pa.array(totals, pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
                "contamination": pa.array(ratios, pa.float64()),
                "contaminated": pa.array(
                    [r >= threshold for r in ratios], pa.bool_()),
            }
        )

    return docs.select_columns([id_col, text_col]).map_batches(
        scan_batch, batch_format="pyarrow"
    )
