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
    "event_rate_anomalies",
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
    "repetition_stats",
    "decontamination_overlap",
    "neardup_clusters",
    "sequence_packing",
    "tfidf_top_terms",
    "purchase_window_clicks",
    "corpus_curation_pipeline",
    "curation_funnel",
    "bm25_topk",
    "hybrid_rrf_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from growth_check import run_watched

    from filebeat_to_clickhouse_spark.queries import QUERIES
    from filebeat_to_clickhouse_spark.session import get_spark

    spark = get_spark("fbck-bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stopTimeout", "30000")
    cap_sec = float(os.environ.get("SPARK_GRAFT_BENCH_CAP", "240"))
    errors: dict[str, str] = {}

    # Same watchdog+drain as the growth check (r5 verdict item 8): a query
    # past the cap is job-group-cancelled, leaked streams swept, and
    # executor running-task counts drained to ZERO before the next timing —
    # cancelled tasks keep burning cores until an interruption point and
    # were measured inflating adjacent growth-check entries up to 12×. A
    # TIMED-OUT query is charged the cap (it genuinely burned that wall);
    # a query that FAILS fast is charged its measured elapsed time — a
    # 0.3 s analysis error billed as 240 s would swamp the suite number
    # with fiction (r7 advice). Both land in "errors" either way.
    def run(name: str, at: str = sf_dir) -> float:
        t0 = time.perf_counter()
        r = run_watched(spark, QUERIES, name, at, cap_sec=cap_sec)
        if isinstance(r, float):
            return r
        errors[name] = str(r)
        return cap_sec if r == "timeout" else min(time.perf_counter() - t0, cap_sec)

    # Steady-state protocol: pass 1 runs every query once at the TARGET
    # scale (warms JIT-compiled codegen, shuffle paths, and the OS page
    # cache for the actual input files — an sf0.001 warmup leaves all three
    # cold and was measured to inflate sub-second queries 2-3×); the
    # reported number is then the MIN of 3 timed runs per query (each run
    # rebuilds the DataFrame, so plan construction + analysis is included;
    # min-of-N is the standard way to strip scheduler/GC noise from
    # sub-second measurements). The cold first-run pass is reported
    # alongside as cold_value/cold_queries so both regimes stay visible.
    #
    # Pre-warm pass (r4): each query runs ONCE at sf0.001 first. The
    # whole-stage codegen source a query generates is scale-independent,
    # so Janino's source-keyed cache compiles it here — seconds of per-
    # distinct-plan compile+JIT measured as the bulk of the old cold pass
    # (~1-3 s/query) — against microseconds of data; the subsequent sf0.1
    # first runs then measure data-cold execution, which is what "cold"
    # should mean for sizing a production run. The pre-warm cost is
    # reported as prewarm_sec, not hidden.
    run("count_events")
    t_pre = time.perf_counter()
    for name in HEADLINE:
        run(name, at="/root/testdata/sf0.01")
    prewarm_sec = round(time.perf_counter() - t_pre, 3)
    cold: dict[str, float] = {}
    for name in HEADLINE:
        cold[name] = round(run(name), 3)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(min(run(name) for _ in range(3)), 3)

    total = round(sum(timings.values()), 3)
    # Contract line: metric/value/unit/queries/sf ONLY (~1.3 KB for 33
    # queries) so it parses from a bounded tail window — the r10 driver
    # could not compare rounds because the r9 line, carrying cold_queries
    # too, ran ~2.5 KB and overflowed its 2000-char tail (PERF_r10
    # n_common: 0; r10 verdict item 2). Measurement methodology is
    # UNCHANGED (same prewarm/cold/min-of-3 passes); the cold pass and
    # prewarm cost now land in BENCH_LOCAL.json next to the repo instead
    # of on stdout. `queries` keeps every existing entry, additions-only.
    line = {
        "metric": f"headline_suite_wall_sec_sf{sf}",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        **({"errors": errors} if errors else {}),
    }
    full = {
        **line,
        "cold_value": round(sum(cold.values()), 3),
        "cold_queries": cold,
        "prewarm_sec": prewarm_sec,
    }
    try:
        with open(os.path.join(REPO, "BENCH_LOCAL.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass  # read-only checkout: the stdout line is the contract
    print(json.dumps(line))
    spark.stop()


if __name__ == "__main__":
    main()
