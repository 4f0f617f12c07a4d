#!/usr/bin/env python
"""Round-9 of-record re-measurements (VERDICT r8 items 4 and 7):

- ``lm_bigram_predictability``: two conflicting sf10 crossover numbers
  existed on identical code (1.25× recorded r7 vs 1.94× in
  CROSSOVER10_r08, Spark absolute 11.9 vs 15.6 s). This designates ONE
  quiet-machine, same-session, min-of-2-per-engine number as of-record.
- The three largest sf10/sf1 growth ratios from SCALE10_r08
  (bulk_ingest_error_stats 11.05×, bulk_ndjson_ingest 10.37×,
  repetition_stats 9.68×): re-measured warm min-of-2 at both scales so
  a real superlinearity separates from machine noise (a ratio ≈ 10 for
  10× data is LINEAR scaling; the flag threshold 5× only means
  "not floor-dominated").

Writes REMEASURE_r09.json. Run on a quiet machine (no concurrent Spark).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
SF1 = os.path.join(REPO, ".scratch", "sf1")
SF10 = os.path.join(REPO, ".scratch", "sf10")

GROWTH_NAMES = ["bulk_ingest_error_stats", "bulk_ndjson_ingest", "repetition_stats"]
LM = "lm_bigram_predictability"

DUCK_ONE = r"""
import sys, time
sys.path.insert(0, {repo!r})
import duckdb
from filebeat_to_clickhouse_spark.io import TABLES
from filebeat_to_clickhouse_spark.queries import ORACLE_SQL
con = duckdb.connect()
con.execute("SET threads TO 32")
con.execute("SET memory_limit='48GB'")
for t in TABLES:
    con.execute(f"CREATE VIEW {{t}} AS SELECT * FROM '{sf10}/{{t}}.parquet'")
t0 = time.perf_counter()
tbl = con.execute(ORACLE_SQL[{name!r}]).fetch_arrow_table()
print(time.perf_counter() - t0)
"""


def main() -> None:
    from filebeat_to_clickhouse_spark.queries import QUERIES
    from filebeat_to_clickhouse_spark.session import get_spark

    spark = get_spark("fbck-remeasure-r09")
    spark.sparkContext.setLogLevel("ERROR")

    def noop(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        return time.perf_counter() - t0

    def best(name: str, sf_dir: str, n: int = 2) -> float:
        noop(name, sf_dir)  # warm at this scale
        return round(min(noop(name, sf_dir) for _ in range(n)), 3)

    growth = {}
    for name in GROWTH_NAMES:
        s1, s10 = best(name, SF1), best(name, SF10)
        growth[name] = {
            "sf1_sec": s1,
            "sf10_sec": s10,
            "ratio_10x_data": round(s10 / s1, 2),
        }
        print(f"growth {name}: {growth[name]}", flush=True)

    lm_spark = best(LM, SF10)
    print(f"lm spark sf10: {lm_spark}", flush=True)
    duck = []
    code = DUCK_ONE.format(repo=REPO, sf10=SF10, name=LM)
    for _ in range(3):  # first run is the warm pass
        r = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, timeout=300)
        # a failed run must surface its own stderr, not a downstream parse error
        assert r.returncode == 0, f"duckdb subprocess failed ({r.returncode}): {r.stderr}"
        duck.append(float(r.stdout.strip().splitlines()[-1]))
        print(f"lm duckdb sf10: {duck[-1]:.3f}", flush=True)
    lm_duck = round(min(duck[1:]), 3)

    out = {
        "metric": "remeasure_r09_of_record",
        "sf": 10,
        "protocol": "same-session, quiet machine; Spark local[32] noop sink, "
        "warm then min-of-2; DuckDB 32 threads subprocess-isolated, warm then "
        "min-of-2 on the registered oracle SQL",
        "lm_bigram_predictability": {
            "spark_sec": lm_spark,
            "duckdb_sec": lm_duck,
            "ratio": round(lm_spark / lm_duck, 2),
            "prior_numbers": {"r7_recorded": 1.25, "r8_crossover": 1.94},
        },
        "growth_remeasure": growth,
        "growth_note": "ratio ≈ 10 for 10× data is LINEAR; the SCALE10 over_5x "
        "flag only separates floor-dominated entries from data-bound ones",
    }
    with open(os.path.join(REPO, "REMEASURE_r09.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
