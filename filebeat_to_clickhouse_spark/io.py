"""Table loading for the driver's synthetic parquet testdata.

The testdata writer emits parquet TIMESTAMP(NANOS, isAdjustedToUTC=false)
for ``events.ts``, which Spark rejects outright ([PARQUET_TYPE_ILLEGAL]).
We read it via ``spark.sql.legacy.parquet.nanosAsLong`` and convert
long-nanos → TIMESTAMP_NTZ micros, which matches DuckDB's own ns→us
truncation bit-for-bit (both floor positive nanos).

All timestamps in this engine are TIMESTAMP_NTZ (wall-clock, no zone), the
same semantics as ClickHouse ``DateTime`` in the reference schema
(/root/reference/clickhouse-init/init.sql:9) and DuckDB ``TIMESTAMP``.
"""

from __future__ import annotations

import os
import weakref

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .session import RUNTIME_CONFS

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Columns stored as TIMESTAMP(NANOS) that arrive as LongType under
# nanosAsLong and need explicit conversion. (orders.o_orderdate and
# lineitem.l_shipdate are TIMESTAMP(MILLIS) — Spark reads those natively
# as TIMESTAMP_NTZ.)
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to a session we may not have built."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on this build; session.get_spark sets it at build time
    return spark


# DataFrame cache for the (static, read-only) testdata tables: the parquet
# open — file listing + footer/schema read — costs ~30-80 ms of driver time
# PER load_table call, paid again by every query build. DataFrames are
# immutable logical plans, but they stay BOUND to the SparkSession that
# built them — so the cache is a WeakKeyDictionary keyed by the session
# object itself: a different or restarted session builds its own plans
# (never inherits ones tied to a stopped session), and a session's entries
# vanish with it instead of accumulating as dead weight. Correct only
# because the testdata never changes underneath a running session (a table
# that gets appended to must be re-read, not cached — which is why only
# load_table uses this, not the log-table readers in storage.py); restart
# the session — or call _TABLE_CACHE.clear() — if testdata is regenerated
# in-process.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = weakref.WeakKeyDictionary()


def _scan_splits_wide(path: str, n_par: int) -> bool:
    """True when the parquet scan ALREADY splits to ≥ ``n_par`` tasks, so a
    requested rebalance would be a pure-overhead full exchange. Two
    conditions, both required: (a) ≥ n_par row groups (a row group is the
    atomic split unit — a single-row-group file yields ONE task with rows
    no matter how Spark ranges it), and (b) enough bytes that Spark's
    split sizing — maxSplitBytes = min(maxPartitionBytes, max(openCost,
    size/defaultParallelism)) — actually produces n_par splits (≥ n_par ×
    2·openCost, openCost 4 MB default). Measured at sf10 (300-row-group
    1.18 GB lineitem): the rebalance exchange cost ~2.3 s of q1's 6.5 s
    for zero parallelism gain. Unreadable/missing footers return False
    (keep the rebalance — the safe direction)."""
    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            files = [
                os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
            ]
        else:
            files = [path]
        total_bytes = sum(os.path.getsize(f) for f in files)
        row_groups = sum(pq.ParquetFile(f).metadata.num_row_groups for f in files)
        return row_groups >= n_par and total_bytes >= n_par * 8 * 1024 * 1024
    except Exception:  # noqa: BLE001 - unsizable input keeps the old behavior
        return False


def load_table(spark: SparkSession, sf_dir: str, name: str, rebalance: bool = False) -> DataFrame:
    """Load one synthetic table, normalizing timestamp columns to TIMESTAMP_NTZ.

    ``rebalance=True`` round-robins the scan output across the session's
    parallelism WHEN the scan cannot split that wide on its own. The
    small-SF testdata files are single-row-group parquet, so their scans
    can never split past one task; queries whose per-row cost dwarfs the
    scan (decimal aggregation, JSON round-trips, shingling) request a
    rebalance so that work runs wide. Production multi-row-group inputs
    split at the scan, where the same flag becomes a no-op
    (``_scan_splits_wide``) instead of a corpus-wide exchange.
    """
    from .session import default_parallelism

    # Applied on cache hits too so the caller's confs (nanosAsLong, UTC)
    # are in place before any plan built here executes.
    configure_session(spark)
    n_par = default_parallelism()
    key = (sf_dir, name, rebalance, n_par)
    per_session = _TABLE_CACHE.setdefault(spark, {})
    cached = per_session.get(key)
    if cached is not None:
        return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if rebalance and not _scan_splits_wide(path, n_par):
        df = df.repartition(n_par)
    for c in _NANOS_TS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer-divide nanos to micros — `div`, NOT `/` (float division
            # loses precision above 2^53 ns ≈ 1970+104 days and lands ±1 µs
            # off); then NTZ wall-clock (session tz pinned UTC → identity).
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000")).cast("timestamp_ntz")
            )
    per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
