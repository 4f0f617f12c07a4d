"""Streaming sources, each producing a ``value: string`` DataFrame that the
batch wire-format parsers (ingest.formats) consume unchanged.

| Source | Reference analog |
|---|---|
| spool dir (file stream) | HTTP push bodies landed by the receiver sidecar (A1/A3); file-tail input stub (C4, config.yaml:43-46) |
| socket | TCP JSON-lines server stub (C5, config.yaml:49-52) |
| kafka | Kafka consumer stub (C2, config.yaml:27-32) |

The reference declares C2/C4/C5 as TODO bodies (main.go:612-665); in Spark
all three are built-in sources, so "framework prepared" becomes "works".
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def stream_spool_dir(
    spark: SparkSession,
    path: str,
    whole_body: bool = True,
    max_files_per_trigger: int | None = None,
    clean_source: str | None = None,
) -> DataFrame:
    """Tail a landing directory of spooled HTTP request bodies.

    ``whole_body=True`` reads one row per file (one HTTP request body —
    the reference's batch unit, main.go:332) via the text source's
    ``wholetext``; ``False`` reads line-by-line, which is equivalent for
    NDJSON formats and preferable when bodies are concatenated into large
    spool segments. ``clean_source`` ('archive'|'delete') bounds the landing
    dir's growth in production.
    """
    reader = spark.readStream.format("text").option("wholetext", str(whole_body).lower())
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if clean_source:
        reader = reader.option("cleanSource", clean_source)
    return reader.load(path)


def stream_socket(spark: SparkSession, host: str = "localhost", port: int = 9999) -> DataFrame:
    """TCP JSON-lines source (C5). Test-quality (no replay), like the
    reference's stub intent."""
    return (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", str(port))
        .load()
    )


def stream_kafka(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka source (C2, config.yaml:27-32) → value strings.

    Requires the spark-sql-kafka package on the cluster; the call itself is
    environment-independent (fails at stream start, not import, when absent).
    """
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    return raw.select(F.col("value").cast("string").alias("value"))
