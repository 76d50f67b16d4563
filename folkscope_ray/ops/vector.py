"""Vector-column aggregation: per-key mean pooling of embeddings.

The analogue of the reference's per-asin mean-pool of SBERT edge embeddings
(src/recommendation/preprocess.py:216-234), expressed scale-first: each batch
computes one (key -> sum-vector, count) PARTIAL with numpy, the groupby only
shuffles the tiny partials, and a final vectorized combine divides.  No raw
embedding row ever crosses the shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def mean_vector_by_key(ds: Dataset, key_col: str, vec_col: str,
                       fixed_point_digits: int | None = None) -> pd.DataFrame:
    """Returns a DataFrame (key, dim, mean_val) — exploded per dimension so
    the result is flat-schema (and SQL-comparable).

    ``fixed_point_digits``: when set, each element is quantized to
    ``10^-digits`` and accumulated in int64 — integer addition is associative,
    so the result is bit-identical across any block/batch partitioning
    (required for golden-fixture hash-compare across parallelism levels).
    """
    scale = float(10 ** fixed_point_digits) if fixed_point_digits else None

    def partial(batch: pa.Table) -> pa.Table:
        vtype_ = pa.list_(pa.int64()) if scale else pa.list_(pa.float64())
        if batch.num_rows == 0:
            # typed empty — an untyped empty block diverges the stream schema
            return pa.table(
                {
                    key_col: pa.array([], batch.schema.field(key_col).type),
                    "vsum": pa.array([], vtype_),
                    "n": pa.array([], pa.int64()),
                }
            )
        keys = batch.column(key_col).to_pylist()
        vecs = np.asarray(batch.column(vec_col).to_pylist(), dtype=np.float64)
        if scale:
            vecs = np.round(vecs * scale).astype(np.int64)
        sums: dict = {}
        counts: dict = {}
        for k, v in zip(keys, vecs):
            if k in sums:
                sums[k] += v
                counts[k] += 1
            else:
                sums[k] = v.copy()
                counts[k] = 1
        ks = list(sums.keys())
        vtype = pa.list_(pa.int64()) if scale else pa.list_(pa.float64())
        return pa.table(
            {
                key_col: pa.array(ks),
                "vsum": pa.array([sums[k].tolist() for k in ks], vtype),
                "n": pa.array([counts[k] for k in ks], pa.int64()),
            }
        )

    def combine(grp: pd.DataFrame) -> pd.DataFrame:
        total = np.sum(np.stack([np.asarray(v) for v in grp["vsum"]]), axis=0)
        n = int(grp["n"].sum())
        mean = (total / n) / scale if scale else total / n
        return pd.DataFrame(
            {
                key_col: grp[key_col].iloc[0],
                "dim": np.arange(len(mean), dtype=np.int64),
                "mean_val": mean.astype(np.float64),
            }
        )

    # partials shuffle (tiny: n_keys x n_blocks rows), distributed per-key
    # combine in map_groups; only the finished (key, dim, mean_val) result —
    # n_keys x dim rows — ever reaches the driver.
    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key_col)
        .map_groups(combine, batch_format="pandas")
        .to_pandas()
    )
    if out.empty:
        return pd.DataFrame(columns=[key_col, "dim", "mean_val"])
    return out.sort_values([key_col, "dim"]).reset_index(drop=True)
