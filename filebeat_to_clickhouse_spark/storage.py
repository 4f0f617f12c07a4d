"""Storage layout for the normalized log table — the batch analog of the
reference's MergeTree tuning (init.sql:20-23), plus bucketing for
co-located joins and small-file compaction.

| MergeTree mechanism | Here |
|---|---|
| PARTITION BY toYYYYMM(timestamp) (init.sql:21) | directory partition `ym` → Catalyst partition pruning |
| ORDER BY (timestamp) (init.sql:22) | sortWithinPartitions before write → parquet row-group min/max skipping |
| index_granularity (init.sql:23) | parquet row-group/page stats (built-in) |
| background merges | ``compact_log_table`` (explicit, schedulable) |
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .normalize import with_month_partition


_GRAIN_FORMATS = {"month": "yyyyMM", "day": "yyyyMMdd", "hour": "yyyyMMddHH"}


def write_log_table(
    rows: DataFrame, path: str, mode: str = "append", grain: str = "month"
) -> None:
    """Write normalized log rows time-partitioned and time-sorted.

    Reads then prune partitions from the path (`ym=...` directories) and
    skip row groups via the timestamp sort — the two MergeTree behaviors
    the reference's DDL encodes.

    ``grain`` picks the partition granularity: 'month' mirrors the
    reference's toYYYYMM (init.sql:21) and is right up to ~TB/month;
    'day'/'hour' are the 100 TB settings (a partition should stay in the
    100 GB range so compaction, retention, and partition pruning operate
    on manageable units). Same column name either way, so readers and
    compaction are grain-agnostic.
    """
    if grain not in _GRAIN_FORMATS:
        raise ValueError(f"grain must be one of {sorted(_GRAIN_FORMATS)}, got {grain!r}")
    if "ym" in rows.columns:
        out = rows
    elif grain == "month":
        out = with_month_partition(rows)
    else:
        out = rows.withColumn(
            "ym", F.date_format(F.col("timestamp"), _GRAIN_FORMATS[grain])
        )
    # Sort by (ym, timestamp): dynamic-partition writes require an ordering
    # on the partition columns and will inject their own ym-only sort if the
    # data isn't already sorted — which would destroy the timestamp order.
    (
        out.sortWithinPartitions("ym", "timestamp")
        .write.mode(mode)
        .partitionBy("ym")
        .parquet(path)
    )


def read_log_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def compact_log_table(
    spark: SparkSession, path: str, target_partitions: int = 1
) -> None:
    """Rewrite each month partition into ``target_partitions`` time-sorted
    files — the explicit form of MergeTree's background merges. Streaming
    appends leave one small file per micro-batch; compaction restores scan
    efficiency (few large row groups, tight min/max bounds).

    Writes to a staging dir then swaps. Readers never see a PARTIAL
    partition, but the swap is two renames, so they must tolerate a brief
    missing-path window between them (retry the read); a crash inside the
    window leaves the data in the ``._old`` backup, which the next
    invocation restores automatically.
    """
    import os
    import shutil

    staging = path.rstrip("/") + "._compact"
    backup = path.rstrip("/") + "._old"
    # Recover from a prior failed run before touching anything:
    # - backup exists and the live path is gone → we died mid-swap; the
    #   backup IS the data, put it back.
    # - backup exists alongside the live path → we died after the swap
    #   completed; the live path is current, the backup is residue.
    # - staging is always residue (rebuilt below).
    if os.path.exists(backup):
        if os.path.exists(path):
            shutil.rmtree(backup)
        else:
            os.rename(backup, path)
    if os.path.exists(staging):
        shutil.rmtree(staging)

    df = spark.read.parquet(path)
    (
        df.repartition(target_partitions, "ym")
        .sortWithinPartitions("ym", "timestamp")
        .write.mode("overwrite")
        .partitionBy("ym")
        .parquet(staging)
    )
    os.rename(path, backup)
    try:
        os.rename(staging, path)
    except BaseException:
        os.rename(backup, path)  # put the live table back before propagating
        raise
    shutil.rmtree(backup)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
) -> None:
    """Persist a table bucketed (and optionally sorted) by a join key.

    Two tables bucketed on the same key with the same bucket count join
    WITHOUT a shuffle — the co-location replaces the exchange, which at
    100 TB turns the dominant repeated join cost into a one-time write
    cost. Requires the session catalog (saveAsTable), not a bare path.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def z_value_expr(quantized: list, bits: int = 8):
    """Morton (Z-order) interleave of pre-quantized integer columns.

    ``quantized`` columns must already be in [0, 2^bits); the z-value
    interleaves their bits (column j contributes bit i to output bit
    i*N + j), so sorting by it clusters rows that are close in EVERY
    dimension — the multi-column generalization of the single-column
    ORDER BY the reference's MergeTree DDL encodes (init.sql:22). A
    flat sum of bits×N shift-mask terms: pure integer Catalyst
    expression, whole-stage-codegen'd (32 terms at bits=8, N=2 — far
    below the codegen-blowup sizes that hurt wide vector math).
    """
    n = len(quantized)
    terms = []
    for j, q in enumerate(quantized):
        for i in range(bits):
            terms.append(
                F.shiftright(q.cast("bigint"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (i * n + j))
            )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("bigint")


def quantize_expr(col, lo: int, range_bits: int, bits: int = 8):
    """Scale a numeric column into [0, 2^bits) with a pure shift:
    (x - lo) >> (range_bits - bits), clamped. The domain is declared as
    [lo, lo + 2^range_bits) — ``lo``/``range_bits`` come from table stats
    at scale; keeping them explicit (and the division a power of two)
    makes the expression deterministic, integer-exact, and portable to
    any engine's ``>>`` — no double division, no data-dependent scan."""
    top = (1 << bits) - 1
    q = F.shiftright((col.cast("bigint") - F.lit(lo)), range_bits - bits)
    return F.greatest(F.lit(0), F.least(F.lit(top), q)).cast("bigint")


def zorder_write(
    df: DataFrame,
    path: str,
    quantized_cols: list,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` clustered by the Z-order of ``quantized_cols``
    (expressions built with quantize_expr): range-partition on the
    z-value so each output file covers a compact z-range — i.e. a small
    hyper-rectangle of ALL clustering dimensions — making parquet
    min/max footer stats prune files for predicates on ANY of them.
    A single-column sort only skips on that column; Z-order is what a
    100 TB log table needs when queries filter by user OR by time."""
    z = z_value_expr(quantized_cols, bits=bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
