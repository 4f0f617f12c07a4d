#!/usr/bin/env python
"""Two-engine crossover measurement at sf10 (100× the bench data) for the
queries whose sf0.1 Spark-vs-DuckDB gap was ever flagged as perf-weak or
whose plan changed in r7/r8: the per-query Spark job floor dominates at
small scale, so THIS is the scale where "matches-or-beats the single-node
engine" is actually decidable.

Protocol (r10, the single of-record one): EVERY entry on EACH engine runs
in its own fresh subprocess — a fresh JVM per Spark entry, a fresh DuckDB
process per oracle — with a warm pass then min-of-2 inside that process.
The shared-session variant this replaces accumulated heap state across
entries: the first r9 run died mid-registry when decontamination_pairs'
warm pass hit a GCLocker allocation failure in a JVM warmed by nine prior
queries, and the r8/r9 artifacts carried dual-protocol reconciliation
notes because standalone and shared-session numbers disagreed. Process
isolation makes every number standalone by construction (the OS page
cache stays warm across processes, so scan-bound entries keep their warm
floor). Inside each subprocess the growth-check watchdog still applies
(job-group cancel at the cap + running-task drain).

The r7 session collected these numbers standalone but persisted them only
in commit messages (r7 verdict "What's missing" item 2) — this tool makes
the measurement a one-command, auditable artifact.

Usage: python tools/crossover_sf10.py  (expects .scratch/sf10 from
tools/make_scale_data.py --copies 100; SPARK_GRAFT_ROUND names the
artifact, default r08). Writes CROSSOVER10_{round}.json and prints one
JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SF10 = os.path.join(REPO, ".scratch", "sf10")

# The measured set: every query whose crossover was cited from r7 commit
# messages plus the two r8-touched percentile entries. Keep this list in
# sync with SURVEY §18 — each name here must have a registered oracle.
NAMES = [
    "hybrid_rrf_topk",        # r7 fusion      (r6 verdict: the one `weak`)
    "bm25_topk",              # r7 in-row fast path
    "kn_bigram_scores",       # r7 bigram generator rewrite
    "lm_bigram_predictability",
    "bucketed_fact_join_topk",  # r7 one-file-per-bucket + sized count
    "remove_duplicated_spans",  # r7 standalone re-measure (contention)
    "mad_quality_outliers",   # r8 fused single-evaluation form
    "quality_percentile_rank_ranged",  # r8 range-partitioned CDF rung
    # --- r8 second sitting: the vectorized batch + single-derivation TPC-H ---
    "semdedup_survivors",       # int-matmul Lloyd + pair step (73.5 -> 4.9 s)
    "semdedup_survivors_ivf",   # coarse level over the k1=28 numpy path
    "embedding_cosine_neardup",  # order-preserving signature pass
    "ann_ivf_topk",             # vectorized cell assignment
    "q21_waiting_suppliers",    # single-derivation window rewrite
    "q22_dormant_high_balance",  # deduped anti-join side
    "q11_important_parts",      # lineage-cut per-part aggregate
    "q2_min_price_supplier",    # r8 pushdown (landed after the mid-round run)
    "quality_percentile_rank",  # shared stopword-score lineage cut
    "quality_percentile_rank_by_source_ranged",  # grouped CDF rung, same cut
]

# Override the measured set (e.g. just the names a round touched):
# SPARK_GRAFT_CROSSOVER_NAMES="q1_pricing_summary,q11_important_parts"
if os.environ.get("SPARK_GRAFT_CROSSOVER_NAMES"):
    NAMES = [n.strip() for n in os.environ["SPARK_GRAFT_CROSSOVER_NAMES"].split(",") if n.strip()]


def main() -> None:
    import faulthandler
    import subprocess

    # a wedged run dumps every thread's stack to stderr every 10 min so
    # the hang site is diagnosable from the log (the first r8 run wedged
    # silently with zero CPU and had to be killed blind)
    faulthandler.dump_traceback_later(600, repeat=True)
    if not os.path.isdir(SF10):
        sys.exit(f"{SF10} missing - run tools/make_scale_data.py --copies 100")

    from filebeat_to_clickhouse_spark.queries import ORACLE_SQL

    spark_cap = float(os.environ.get("SPARK_GRAFT_SPARK_CAP", "300"))
    duck_cap = float(os.environ.get("SPARK_GRAFT_DUCK_CAP", "300"))

    # Each Spark entry runs in its OWN subprocess (fresh JVM): warm pass +
    # min-of-2 inside it. Budget = 3 capped runs + JVM startup slack; a
    # subprocess that exceeds even that is hard-killed and recorded.
    spark_t: dict[str, float | str] = {}
    for name in NAMES:
        try:
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--spark-one", name],
                capture_output=True,
                text=True,
                timeout=3 * spark_cap + 120,
            )
            last = (r.stdout.strip().splitlines() or [""])[-1]
            try:
                spark_t[name] = float(last)
            except ValueError:
                spark_t[name] = last if last else f"err: rc={r.returncode} {r.stderr[-160:]}"
        except subprocess.TimeoutExpired:
            spark_t[name] = "timeout (subprocess killed)"
        print(f"  spark {name}: {spark_t[name]}", flush=True)

    # Each DuckDB measurement runs in its own SUBPROCESS: the first r8
    # attempts showed that (a) fetchall() of a corpus-sized result
    # materializes GBs of Python objects whose heap poisons the next
    # query, and (b) a query interrupted mid-spill leaves the allocator
    # in a state where even a FRESH connection in the same process dies
    # with OutOfMemoryException on CREATE VIEW. Process isolation makes
    # every entry standalone (matching the r7 single-query sessions this
    # tool replaces) and lets a hard kill stand in for the interrupt.
    duck_t: dict[str, float | str] = {}
    for name in NAMES:
        if ORACLE_SQL.get(name) is None:
            duck_t[name] = "no oracle"
            continue
        ts: list[float] | None = []
        for _ in range(2):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--duck-one", name],
                    capture_output=True,
                    text=True,
                    timeout=duck_cap,
                )
                line = (r.stdout.strip().splitlines() or [""])[-1]
                ts.append(float(line))
            except (subprocess.TimeoutExpired, ValueError):
                ts = None
            if ts is None:
                break
        duck_t[name] = round(min(ts), 3) if ts else f">{int(duck_cap)}s timeout/oom"
        print(f"  duckdb {name}: {duck_t[name]}", flush=True)

    ratios = {
        n: round(spark_t[n] / duck_t[n], 3)
        for n in NAMES
        if isinstance(spark_t[n], float) and isinstance(duck_t[n], float)
    }
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "r08")
    out = {
        "metric": "crossover_sf10_two_engine",
        "value": max(ratios.values()) if ratios else None,
        "unit": "spark/duckdb wall ratio (worst of set)",
        "sf": 10,
        "protocol": "fresh subprocess per entry per engine (fresh JVM / fresh "
        "DuckDB process), warm pass then min-of-2 inside it; Spark local[32] "
        "under watchdog+drain; DuckDB 32 threads on the repo's oracle SQL",
        "spark_sec": spark_t,
        "duckdb_sec": duck_t,
        "ratio": ratios,
    }
    with open(os.path.join(REPO, f"CROSSOVER10_{rnd}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": out["metric"], "worst_ratio": out["value"],
                      "ratio": ratios}))


def spark_one(name: str) -> None:
    """Subprocess entry: fresh JVM → one session warm-up (count_events, so
    scheduler/codegen infrastructure is hot), then warm pass + min-of-2 of
    the named query at sf10 under the watchdog. Prints the best seconds —
    or 'timeout' / 'err: ...' — as the last stdout line."""
    from growth_check import run_watched

    from filebeat_to_clickhouse_spark.queries import QUERIES
    from filebeat_to_clickhouse_spark.session import get_spark

    cap = float(os.environ.get("SPARK_GRAFT_SPARK_CAP", "300"))
    spark = get_spark("fbck-crossover-one")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stopTimeout", "30000")
    run_watched(spark, QUERIES, "count_events", SF10, cap_sec=cap)
    best = None
    for i in range(3):  # first run is the warm pass
        r = run_watched(spark, QUERIES, name, SF10, cap_sec=cap)
        print(f"  run {i}: {r}", file=sys.stderr, flush=True)
        if not isinstance(r, float):
            print(r)
            return
        if i > 0:
            best = r if best is None else min(best, r)
    print(round(best, 3))


def duck_one(name: str) -> None:
    """Subprocess entry: run one oracle SQL at sf10 and print its wall
    seconds as the last stdout line. Fetches as Arrow (no Python-object
    materialization); the parent enforces the cap by killing us."""
    import duckdb

    from filebeat_to_clickhouse_spark.io import TABLES
    from filebeat_to_clickhouse_spark.queries import ORACLE_SQL

    con = duckdb.connect()
    con.execute("SET threads TO 32")
    con.execute("SET memory_limit='48GB'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF10}/{t}.parquet'")
    t0 = time.perf_counter()
    tbl = con.execute(ORACLE_SQL[name]).fetch_arrow_table()
    dt = time.perf_counter() - t0
    del tbl
    print(dt)


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--duck-one":
        duck_one(sys.argv[2])
    elif len(sys.argv) == 3 and sys.argv[1] == "--spark-one":
        spark_one(sys.argv[2])
    else:
        main()
