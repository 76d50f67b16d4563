"""Golden-fixture parity: the committed fixtures under fixtures/sf0.01 are
the oracle for the non-SQL-expressible queries (tools/fixtures.py).  This
guard re-runs the *fast* fixture queries (documents-table kernels + the
synthetic multimodal/ANN paths — the KG products are covered by the
P/R=1.0 oracle gate in test_kg_pipeline and by the driver's own compare)
and checks rows + schema + value hash against the fixture through DuckDB
``read_parquet``, i.e. the exact oracle path the driver takes."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
SF_DIR = "/root/testdata/sf0.01"

FAST_FIXTURE_QUERIES = [
    "minhash_dedup_docs",
    "simhash_docs",
    "fingerprint_docs",
    "langid_quality_docs",
    "multimodal_image_features",
    "multimodal_frame_sample",
    "ann_lsh_topk",
]


@pytest.mark.parametrize("name", FAST_FIXTURE_QUERIES)
def test_fixture_parity(name):
    from tools.fixtures import fixture_dir, to_canonical_df, value_hash

    import __ray_entry__ as entrymod

    path = os.path.join(fixture_dir(SF_DIR), f"{name}.parquet")
    assert os.path.exists(path), f"fixture missing: {path} (run tools/fixtures.py make)"
    got = to_canonical_df(entrymod.queries()[name](SF_DIR))
    exp = to_canonical_df(duckdb.sql(f"SELECT * FROM read_parquet('{path}')").df())
    assert len(got) == len(exp)
    assert list(got.columns) == list(exp.columns)
    assert value_hash(got) == value_hash(exp)


def test_every_query_has_an_oracle():
    """Driver contract: every queries() entry carries an oracle_sql() entry
    (SQL or golden fixture) — no more no_oracle rows."""
    import __ray_entry__ as entrymod

    missing = set(entrymod.queries()) - set(entrymod.oracle_sql())
    assert not missing, f"queries without an oracle: {sorted(missing)}"


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.01",
                                    "/root/testdata/sf0.1"])
def test_psi_two_scale_fixture_and_oracle(sf_dir):
    """r4 verdict ask 5: the drift family does quantization-dependent float
    math, and a hash gate at ONE scale does not pin the quantization policy
    at another.  PSI (the cheapest member) therefore carries a committed
    fixture at BOTH sf0.01 and sf0.1, and this test checks the live query
    against the fixture AND the SQL oracle at each scale."""
    from tools.fixtures import fixture_dir, to_canonical_df, value_hash

    import __ray_entry__ as entrymod

    path = os.path.join(fixture_dir(sf_dir), "psi_orders.parquet")
    assert os.path.exists(path), f"fixture missing: {path}"
    got = to_canonical_df(entrymod.queries()["psi_orders"](sf_dir))
    exp = to_canonical_df(duckdb.sql(
        f"SELECT * FROM read_parquet('{path}')").df())
    assert len(got) == len(exp)
    assert list(got.columns) == list(exp.columns)
    assert value_hash(got) == value_hash(exp)
    # and the SQL oracle agrees at this scale too (not just the fixture)
    con = duckdb.connect()
    for t in ("orders",):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    sql = to_canonical_df(con.execute(
        entrymod.oracle_sql()["psi_orders"]).df())
    assert value_hash(sql) == value_hash(got)
