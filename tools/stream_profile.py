#!/usr/bin/env python
"""sf10 profile of the two slowest streaming roundtrips: wall, per-batch
durations, state-operator metrics (rows, memory), and shuffle-partition
usage for the stream-stream interval join and the watermark dedup."""
import json
import os
import sys
import tempfile
import time

REPO = "/root/repo"
sys.path.insert(0, REPO)
SF10 = os.path.join(REPO, ".scratch", "sf10")

from pyspark.sql import functions as F

from filebeat_to_clickhouse_spark.io import load_table
from filebeat_to_clickhouse_spark.queries import _line_expr
from filebeat_to_clickhouse_spark.session import get_spark
from filebeat_to_clickhouse_spark.streaming.pipeline import (
    attribute_purchases_stream,
    parse_stream,
    streaming_dedup,
)
from filebeat_to_clickhouse_spark.streaming.sources import stream_spool_dir

spark = get_spark("stream-profile")
spark.sparkContext.setLogLevel("ERROR")
spark.conf.set("spark.sql.streaming.stopTimeout", "30000")


def drain(out_df, tmp, label):
    sink, ck = os.path.join(tmp, "out"), os.path.join(tmp, "ck")
    t0 = time.perf_counter()
    q = (
        out_df.writeStream.format("parquet")
        .option("path", sink)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    print(f"== {label}: wall {wall:.1f}s")
    for p in q.recentProgress:
        so = [
            {
                "op": s.get("operatorName"),
                "rowsTotal": s.get("numRowsTotal"),
                "rowsUpdated": s.get("numRowsUpdated"),
                "memUsedMB": round((s.get("memoryUsedBytes") or 0) / 1e6, 1),
                "shufflePartitions": s.get("numShufflePartitions"),
            }
            for s in p.get("stateOperators", [])
        ]
        dm = p.get("durationMs", {})
        print(
            json.dumps(
                {
                    "batch": p.get("batchId"),
                    "inRows": p.get("numInputRows"),
                    "durationMs": dm,
                    "state": so,
                }
            )
        )


which = sys.argv[1] if len(sys.argv) > 1 else "both"

if which in ("attr", "both"):
    tmp = tempfile.mkdtemp(prefix="prof-attr-")
    spool = os.path.join(tmp, "spool")
    load_table(spark, SF10, "events").select(_line_expr().alias("value")).coalesce(1).write.text(spool)
    rows = parse_stream(stream_spool_dir(spark, spool, whole_body=False), "single")
    out = attribute_purchases_stream(
        rows, click_marker="evt-click", purchase_marker="evt-purchase", horizon="10 minutes"
    )
    drain(out, tmp, "attribution")

if which in ("dedup", "both"):
    tmp = tempfile.mkdtemp(prefix="prof-dd-")
    spool = os.path.join(tmp, "spool")
    lines = load_table(spark, SF10, "events").select(_line_expr().alias("value"))
    lines.union(lines).write.text(spool)
    rows = streaming_dedup(parse_stream(stream_spool_dir(spark, spool, whole_body=False), "single"))
    drain(rows, tmp, "dedup")
