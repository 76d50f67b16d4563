"""Distributed descriptive statistics: pairwise Pearson correlation matrix.

Single-pass, shuffle-free: every block reduces to one tiny partial row of
EXACT integer sums (n, S_i, P_ij of values quantized at ``scale``), the
driver combines partials with Python bignums, and the closed-form
correlation is evaluated once from the exact totals —

    corr(i, j) = (n*P_ij - S_i*S_j)
                 / (sqrt(n*P_ii - S_i^2) * sqrt(n*P_jj - S_j^2))

so the result is bit-deterministic at any block layout / parallelism (the
repo's fixed-point discipline: float sums are order-dependent, integer sums
commute).  The SQL oracle spells out the same formula over HUGEINT sums
with the identical float operation order, so hashes match bit-for-bit.

The reference engine has no multi-column statistics (its aggregations are
counters and score means, e.g. conceptualizer topK); this is part of the
LLM-data-pipeline analysis family next to quantiles/sketches in
``ops/sketch.py``.

Scale notes: the shuffle is O(blocks * d^2) partial strings — independent
of row count.  Per-block products are accumulated in int64 chunks sized so
``chunk * max|q_i| * max|q_j| < 2^62`` and promoted to Python ints between
chunks, so no magnitude overflows at any corpus size.  Rows with NaN are
the caller's problem (filter first); values must be exact multiples of
``1/scale`` for the quantization to be lossless (prices/quantities at
scale=100).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def corr_matrix(ds: Dataset, cols: list[str], scale: int = 100) -> pd.DataFrame:
    """Pearson correlation for every unordered column pair (col_a < col_b by
    list position).  Returns a small pandas frame (col_a, col_b, corr) —
    d*(d-1)/2 rows.  corr is None when either side has zero variance."""
    d = len(cols)

    def partial(batch: pa.Table) -> pa.Table:
        qs = [np.round(batch.column(c).to_numpy(zero_copy_only=False)
                       * scale).astype(np.int64) for c in cols]
        n = batch.num_rows
        mm = max((int(np.abs(q).max()) if n else 0) for q in qs) if d else 0
        sums = [0] * d
        prods = {(i, j): 0 for i in range(d) for j in range(i, d)}
        if mm * mm >= (1 << 62):
            # pathological magnitude: even a single per-element int64
            # product q_i*q_j can overflow (chunking bounds the SUM, not
            # the element) — promote this block to Python bignums via an
            # object-dtype pass; exactness is preserved, only speed drops,
            # and only for blocks whose |q| exceeds ~3e9 at scale
            oq = [q.astype(object) for q in qs]
            for i in range(d):
                sums[i] += int(oq[i].sum()) if n else 0
                for j in range(i, d):
                    prods[(i, j)] += int((oq[i] * oq[j]).sum()) if n else 0
        else:
            chunk = int(min(65536, max(1, (1 << 62) // (mm * mm + 1))))
            for st in range(0, n, chunk):
                en = min(st + chunk, n)
                cq = [q[st:en] for q in qs]
                for i in range(d):
                    sums[i] += int(cq[i].sum(dtype=np.int64))
                    for j in range(i, d):
                        prods[(i, j)] += int(
                            (cq[i] * cq[j]).sum(dtype=np.int64))
        out = {"n": pa.array([n], pa.int64())}
        for i in range(d):
            out[f"s{i}"] = pa.array([str(sums[i])], pa.string())
            for j in range(i, d):
                out[f"p{i}_{j}"] = pa.array([str(prods[(i, j)])], pa.string())
        return pa.table(out)

    parts = (ds.select_columns(cols)
             .map_batches(partial, batch_format="pyarrow").to_pandas())
    n = int(parts["n"].sum()) if len(parts) else 0
    S = [sum(int(x) for x in parts[f"s{i}"]) for i in range(d)]
    P = {(i, j): sum(int(x) for x in parts[f"p{i}_{j}"])
         for i in range(d) for j in range(i, d)}

    rows_a, rows_b, rows_c = [], [], []
    for i in range(d):
        for j in range(i + 1, d):
            num = n * P[(i, j)] - S[i] * S[j]
            den_i = n * P[(i, i)] - S[i] * S[i]
            den_j = n * P[(j, j)] - S[j] * S[j]
            c = (float(num) / (math.sqrt(float(den_i))
                               * math.sqrt(float(den_j)))
                 if den_i > 0 and den_j > 0 else None)
            rows_a.append(cols[i])
            rows_b.append(cols[j])
            rows_c.append(c)
    return pd.DataFrame({"col_a": rows_a, "col_b": rows_b,
                         "corr": pd.array(rows_c, dtype="float64")})
