"""Oracle-parity harness mimicking the driver's correctness gate:

for every queries() entry with an oracle_sql(), run the PySpark query and
the DuckDB SQL over the same parquet tables and compare row count, sorted
column names, and order-insensitive canonicalized values.

Run at sf0.01 (the driver's t2 scale) by default; set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.001 for a fast pass.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from conftest import SF_ORACLE

from filebeat_to_clickhouse_spark.io import TABLES


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    yield con
    con.close()


def _canon_cell(v):
    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        return repr(v)  # exact: parity contract is bit-identical doubles
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return f"{type(v).__name__}:{v}"


def canonical(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    return sorted(out)


def _query_names():
    from filebeat_to_clickhouse_spark.queries import ORACLE_SQL

    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", _query_names())
def test_oracle_parity(spark, ddb, name):
    from filebeat_to_clickhouse_spark.queries import ORACLE_SQL, QUERIES

    spark_pdf = QUERIES[name](spark, SF_ORACLE).toPandas()
    oracle_pdf = ddb.sql(ORACLE_SQL[name]).df()

    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), "column names differ"
    assert len(spark_pdf) == len(oracle_pdf), "row counts differ"
    s, o = canonical(spark_pdf), canonical(oracle_pdf)
    mismatches = [(a, b) for a, b in zip(s, o) if a != b]
    assert not mismatches, f"{len(mismatches)} value mismatches; first: {mismatches[:3]}"


def test_rows_only_queries_run(spark):
    """Entries without an oracle still must run and return a stable schema."""
    from filebeat_to_clickhouse_spark.queries import ORACLE_SQL, QUERIES

    for name in sorted(set(QUERIES) - set(ORACLE_SQL)):
        df = QUERIES[name](spark, SF_ORACLE)
        assert df.columns, name
        df.limit(5).collect()


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "timestamp" in df.columns and "raw_json" in df.columns
