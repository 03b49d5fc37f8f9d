"""Cross-check every queries() entry against its oracle_sql() via DuckDB —
a local mirror of the driver's correctness gate (row count + schema-ish +
order-insensitive value comparison) at sf0.01.
"""

import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if hasattr(v, "isoformat"):  # datetime/date: tz-insensitive compare
        return v.replace(tzinfo=None).isoformat() if hasattr(v, "tzinfo") \
            else v.isoformat()
    return str(v)


def _rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        key = tuple(_norm(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, ddb, name):
    q = entrymod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    res = ddb.execute(entrymod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(c.lower() for c in spark_cols) == \
        sorted(c.lower() for c in duck_cols), (spark_cols, duck_cols)
    assert len(spark_rows) == len(duck_rows), (
        name, len(spark_rows), len(duck_rows))

    ms_s = _rows_to_multiset([tuple(r) for r in spark_rows], spark_cols)
    ms_d = _rows_to_multiset(duck_rows, duck_cols)
    if ms_s != ms_d:
        only_s = {k: v for k, v in ms_s.items() if ms_d.get(k) != v}
        only_d = {k: v for k, v in ms_d.items() if ms_s.get(k) != v}
        raise AssertionError(
            f"{name}: value mismatch\nspark-only (≤3): "
            f"{list(only_s.items())[:3]}\nduck-only (≤3): "
            f"{list(only_d.items())[:3]}")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"url", "text_md5"}
    assert all(len(r.text_md5) == 32 for r in rows)


def test_engine_lineage_verified(spark):
    from skar_spark.ops.engine_queries import q_engine_lineage
    rows = q_engine_lineage(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert all(r.verified for r in rows)
    assert all(r.text_mismatches == 0 for r in rows)
