#!/usr/bin/env python
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is forced end-to-end with the noop sink (full computation, no
driver-side collect overhead). One warmup query amortizes JVM/codegen start.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# Headline set: scan-agg, fact joins, windows, sessionization, ingest
# round-trip, dedup, similarity, text quality — the engine's breadth.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q10_returned_items",
    "top_order_per_customer",
    "orders_rollup",
    "user_sessions",
    "hourly_event_rate",
    "latest_events_top10",
    "range_filter_counts",
    "bulk_ndjson_ingest",
    "ingest_normalize_roundtrip",
    "asof_click_attribution",
    "daily_revenue_moving7",
    "dedup_exact_fingerprints",
    "minhash_lsh_neardup",
    "simhash_neardup_pairs",
    "embedding_cosine_neardup",
    "winnow_fingerprints",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "text_quality_score",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    from filebeat_to_clickhouse_spark.queries import QUERIES
    from filebeat_to_clickhouse_spark.session import get_spark

    spark = get_spark("fbck-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: str, at: str = sf_dir) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, at).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    # Warmup: run every headline query once at the smallest scale so each
    # plan's WholeStageCodegen is JIT-compiled before it is measured —
    # standard steady-state benchmarking; data volume at sf0.001 is
    # negligible next to sf0.1, so only compilation is amortized.
    run("count_events")
    for name in HEADLINE:
        run(name, at="/root/testdata/sf0.001")

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(run(name), 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": f"headline_suite_wall_sec_sf{sf}",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
