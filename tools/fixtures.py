"""Golden-fixture harness for the non-SQL-expressible queries.

The driver's correctness gate (CORRECTNESS_r{N}.json) compares each
``queries()`` entry against its ``oracle_sql()`` SQL in DuckDB.  The
FIXTURE_QUERIES below (KG products, dedup/similarity kernels, raw-media
multimodal, trained models) are not
ANSI-SQL-expressible, so their oracle is a **committed golden fixture**: the
expected output at the driver's scale factor, written once as parquet under
``fixtures/sf0.01/`` and read back by DuckDB ``read_parquet`` in
``oracle_sql()``.  A pipeline regression then shows up as a rows/schema/hash
mismatch exactly like a SQL-backed query.

Every fixture query is engineered to be *bit-deterministic across
parallelism levels* (fixed-point integer accumulation for float sums,
quantize-before-top-k, canonical JSON for nested payloads, deterministic
merge ordering), so the fixture generated here matches whatever num_cpus the
driver runs with.  ``check --cpus N`` verifies exactly that.

Usage:
    python tools/fixtures.py make  [--sf-dir /root/testdata/sf0.01] [--cpus 32]
    python tools/fixtures.py check [--sf-dir /root/testdata/sf0.01] [--cpus 8]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE_QUERIES = [
    "kg_triples",
    "kg_eventualities",
    "kg_concept_agg",
    "kg_concept_triples",
    "edge_features",
    "transe_entity_embeddings",
    "ncf_recommender",
    "wnd_recommender",
    "minhash_dedup_docs",
    "simhash_docs",
    "fingerprint_docs",
    "langid_quality_docs",
    "multimodal_image_features",
    "multimodal_frame_sample",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "hll_distinct_users",
    "kg_pagerank",
    "kg_components",
    "ddsketch_price_quantiles",
    "embedding_neardup_pairs_lsh",
    "kg_parse_strings",
    "embedding_kmeans_clusters",
    "bpe_vocab_docs",
    "bpe_token_counts_docs",
    "lm_perplexity_docs",
    "pca_embeddings",
    "classifier_finetune_docs",
    "semantic_dedup_embeddings",
    "countmin_user_freq_events",
]


def fixture_dir(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    return os.path.join(REPO, "fixtures", sf)


def to_canonical_df(res) -> pd.DataFrame:
    """Result (Dataset | pa.Table | DataFrame) -> column-name-sorted,
    row-sorted DataFrame (the same canonicalization on both sides makes the
    comparison order-insensitive, like the driver's)."""
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        df = res.to_pandas()
    elif isinstance(res, pa.Table):
        df = res.to_pandas()
    else:
        df = res.copy()
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for col in df.columns:
        vals = df[col]
        if vals.dtype.kind == "f":
            h.update(np.ascontiguousarray(vals.to_numpy(np.float64)).tobytes())
        else:
            h.update("\x1f".join(str(v) for v in vals.tolist()).encode())
    return h.hexdigest()


def _run_queries(sf_dir: str, names: list[str]):
    sys.path.insert(0, REPO)
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    for name in names:
        yield name, qs[name](sf_dir)


def cmd_make(sf_dir: str, names: list[str] | None = None) -> None:
    out_dir = fixture_dir(sf_dir)
    os.makedirs(out_dir, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    for name, res in _run_queries(sf_dir, names or FIXTURE_QUERIES):
        df = to_canonical_df(res)
        path = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)
        print(f"wrote {path}: {len(df)} rows, hash={value_hash(df)[:16]}")


def cmd_check(sf_dir: str, names: list[str] | None = None) -> int:
    """Re-run every fixture query and compare against the committed fixture
    through DuckDB read_parquet — the exact oracle path the driver uses."""
    import duckdb

    out_dir = fixture_dir(sf_dir)
    failures = 0
    for name, res in _run_queries(sf_dir, names or FIXTURE_QUERIES):
        got = to_canonical_df(res)
        path = os.path.join(out_dir, f"{name}.parquet")
        exp = to_canonical_df(duckdb.sql(
            f"SELECT * FROM read_parquet('{path}')").df())
        rows_ok = len(got) == len(exp)
        schema_ok = list(got.columns) == list(exp.columns)
        hash_ok = value_hash(got) == value_hash(exp)
        status = "OK" if (rows_ok and schema_ok and hash_ok) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(json.dumps({"query": name, "status": status,
                          "rows": [len(got), len(exp)],
                          "schema_match": schema_ok, "hash_match": hash_ok}))
    return failures


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["make", "check"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    ap.add_argument("--only", nargs="*", default=None,
                    help="restrict to these fixture queries")
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    try:
        if args.cmd == "make":
            cmd_make(args.sf_dir, args.only)
        else:
            sys.exit(1 if cmd_check(args.sf_dir, args.only) else 0)
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
