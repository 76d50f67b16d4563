"""Similarity search over embedding columns (list<float>).

- brute_force_topk : exact cosine top-k per query — numpy matmul per batch
  against a broadcast query matrix (``ray.put`` once, read per worker), then a
  driver-side merge of per-batch partial top-ks.  This is the scale baseline:
  each batch does one (B × d) @ (d × Q) GEMM, no shuffle at all.
- lsh_bucketed_topk : random-hyperplane LSH variant — candidates restricted to
  query-colliding buckets, so at corpus scale only a fraction of batches do
  real work.  Same output contract; approximate.
"""

from __future__ import annotations

import heapq

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset


def _as_matrix(col) -> np.ndarray:
    # float64 so results are reproducible against a float64 oracle
    return np.asarray(col.to_pylist(), dtype=np.float64)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceTopK:
    """map_batches callable: emits per-batch partial top-k (query_id, vec_id, cosine)."""

    def __init__(self, queries_ref, k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 quantize_digits: int | None = None):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.q = _normalize(np.asarray(q, dtype=np.float64))  # (Q, d)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col
        # quantize BEFORE selecting the top-k so boundary vectors that collide
        # after rounding rank identically to a quantizing SQL oracle
        # (tiebreak: vec_id ascending)
        self.q_scale = float(10 ** quantize_digits) if quantize_digits else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch.column(self.vec_col)))  # (B, d)
        ids = np.asarray(batch.column(self.id_col).to_pylist(), dtype=np.int64)
        sims = m @ self.q.T  # (B, Q)
        if self.q_scale:
            sims = np.round(sims * self.q_scale).astype(np.int64) / self.q_scale
        k = min(self.k, len(ids))
        o_q, o_id, o_s = [], [], []
        for qi in range(self.q.shape[0]):
            col = sims[:, qi]
            top = np.lexsort((ids, -col))[:k]  # cosine desc, vec_id asc
            for t in top:
                o_q.append(qi)
                o_id.append(int(ids[t]))
                o_s.append(float(col[t]))
        return pa.table(
            {
                "query_id": pa.array(o_q, pa.int32()),
                "vec_id": pa.array(o_id, pa.int64()),
                "cosine": pa.array(o_s, pa.float64()),
            }
        )


def brute_force_topk(ds: Dataset, queries: np.ndarray, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     quantize_digits: int | None = None):
    """Exact cosine top-k for each query row; returns a pandas DataFrame
    (query_id, vec_id, cosine) with exactly k rows per query."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = ds.map_batches(
        BruteForceTopK,
        batch_format="pyarrow",
        fn_constructor_kwargs={"queries_ref": qref, "k": k,
                               "vec_col": vec_col, "id_col": id_col,
                               "quantize_digits": quantize_digits},
        concurrency=(1, 8),
    ).to_pandas()
    out = []
    for qi, grp in partials.groupby("query_id"):
        top = heapq.nlargest(k, grp.itertuples(), key=lambda r: (r.cosine, -r.vec_id))
        for r in top:
            out.append({"query_id": qi, "vec_id": r.vec_id, "cosine": r.cosine})
    import pandas as pd

    return pd.DataFrame(out).sort_values(["query_id", "cosine", "vec_id"],
                                         ascending=[True, False, True]).reset_index(drop=True)


# ------------------------------------------------------- LSH-bucketed ANN

_rng = np.random.RandomState(1234)


def hyperplanes(dim: int, n_planes: int = 8) -> np.ndarray:
    """Size n_planes to the corpus: ~log2(n_vectors / expected_candidates);
    small corpora want few planes (wide buckets), web-scale wants 16+."""
    return _rng.standard_normal((n_planes, dim)).astype(np.float64)


def bucket_of(vecs: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (vecs @ planes.T) > 0
    out = np.zeros(len(vecs), dtype=np.int64)
    for j in range(planes.shape[0]):
        out = (out << 1) | bits[:, j].astype(np.int64)
    return out


class LshTopK(BruteForceTopK):
    """Approximate variant: only score vectors landing in a query's bucket
    (or a bucket at hamming distance <= 1 — cheap multi-probe)."""

    def __init__(self, queries_ref, planes_ref, k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 quantize_digits: int | None = None):
        super().__init__(queries_ref, k, vec_col, id_col, quantize_digits)
        planes = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        self.planes = planes
        qb = bucket_of(self.q, planes)
        probe = set(qb.tolist())
        for b in qb.tolist():
            for j in range(planes.shape[0]):
                probe.add(b ^ (1 << j))
        self.probe = probe

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _normalize(_as_matrix(batch.column(self.vec_col)))
        buckets = bucket_of(m, self.planes)
        mask = np.isin(buckets, list(self.probe))
        if not mask.any():
            return pa.table(
                {"query_id": pa.array([], pa.int32()),
                 "vec_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        sub = batch.filter(pa.array(mask))
        return super().__call__(sub)
