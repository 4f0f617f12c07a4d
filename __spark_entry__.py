"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship ingest→normalize→top-N pipeline on sf0.001;
queries()/oracle_sql() expose every implemented operator from SURVEY.md §2
plus the north-star extensions, each with a DuckDB-equivalent oracle where
SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: events → ES-bulk NDJSON wire bodies → bulk parse →
    normalize to the reference's 10-column log row → latest-10 (B10).

    Exercises the whole §2A transform surface (A2, A6-A10, B12) plus the
    reference's headline analytic (B10) in one plan.
    """
    import pyspark.sql.functions as F

    from filebeat_to_clickhouse_spark.io import load_table
    from filebeat_to_clickhouse_spark.ingest import parse_bulk_ndjson
    from filebeat_to_clickhouse_spark.normalize import normalize_events, with_month_partition
    from filebeat_to_clickhouse_spark.queries import _line_expr

    events = load_table(spark, SMOKE_SF_DIR, "events")
    bodies = events.select(F.concat(F.lit('{"index":{}}\n'), _line_expr()).alias("value"))
    rows = normalize_events(parse_bulk_ndjson(bodies), raw_col="raw_json")
    return with_month_partition(rows).orderBy(F.desc("timestamp"), F.desc("message")).limit(10)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from filebeat_to_clickhouse_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from filebeat_to_clickhouse_spark.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
