#!/usr/bin/env python
"""Per-shape decomposition of the scan-agg crossover family at sf10 —
the q11 playbook (Q11DECOMP_r09.json) applied to the five entries that
entered CROSSOVER10_r09 over 2× with only a collective "scan-floor" note:
q5 (11.9×), q1 (8.5×), q3 (7.2×), q10 (6.4×), q15 (3.8×).

Each query's wall is split into cumulative stages — each stage is a real
executed plan that ADDS one component, so successive deltas attribute the
time:

  scan_floor   all fact scans the query touches, count-only aggregate
               (no joins, no arithmetic): Spark's parquet+hash floor
  fact_join    + the fact-fact shuffle join (q3/q5/q10)
  plus_dims    + every dimension probe (broadcast/gated joins)
  group_agg    + the grouped aggregation with COUNT only (hash agg cost,
               no decimal/fp arithmetic)
  full         the registered query (adds the fp/decimal kernels, top-N)

Protocol: one FRESH JVM for the whole decomposition, every (query, stage)
pair INTERLEAVED round-robin × N_ROUNDS so time-of-run effects (JIT, page
cache, GC) separate from stage effects — the same discipline as
Q11DECOMP_r09. DuckDB's ENTIRE query (the repo's oracle SQL, fresh
process per run via crossover_sf10 --duck-one) is the floor comparison:
the q11 precedent is that DuckDB's whole exact-decimal query lands at
Spark's no-arithmetic scan+hash floor, making the residual an engine
constant, not a plan defect.

Usage: python tools/scanagg_decomp.py   (expects .scratch/sf10; set
SPARK_GRAFT_ROUND to name the artifact, default r10). Writes
QDECOMP_{round}.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

SF10 = os.path.join(REPO, ".scratch", "sf10")
N_ROUNDS = 5


def _variants():
    """(query, stage) → callable(spark, sf_dir) -> DataFrame, in
    cumulative order per query. Stage frames reuse the queries module's
    own loaders/filters so each stage is exactly a prefix of the real
    plan."""
    import pyspark.sql.functions as F

    from filebeat_to_clickhouse_spark.io import load_table
    from filebeat_to_clickhouse_spark.queries import QUERIES, _dim_hint

    def ts(s):
        return F.lit(s).cast("timestamp_ntz")

    def count_of(df):
        return df.agg(F.count(F.lit(1)).alias("n"))

    # ---- q1: single scan + 4-accumulator grouped agg -------------------
    def q1_li(spark):
        return load_table(spark, SF10, "lineitem", rebalance=True).filter(
            F.col("l_shipdate") <= ts("2001-09-01 00:00:00")
        )

    # ---- q3: filtered facts, orderkey join, gated customer, topN -------
    def q3_parts(spark):
        cust = load_table(spark, SF10, "customer").filter(F.col("c_mktsegment") == "BUILDING")
        orders = load_table(spark, SF10, "orders").filter(F.col("o_orderdate") < ts("1998-07-01 00:00:00"))
        li = load_table(spark, SF10, "lineitem").filter(F.col("l_shipdate") > ts("1998-07-01 00:00:00"))
        return cust, orders, li

    # ---- q5: 6-way star, orders window filter ---------------------------
    def q5_parts(spark):
        t = {n: load_table(spark, SF10, n) for n in ("customer", "orders", "lineitem", "supplier", "nation", "region")}
        orders = t["orders"].filter(
            (F.col("o_orderdate") >= ts("1996-01-01 00:00:00")) & (F.col("o_orderdate") < ts("1997-01-01 00:00:00"))
        )
        return t, orders

    def q5_joined(spark):
        t, orders = q5_parts(spark)
        return (
            t["lineitem"]
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(_dim_hint(SF10, "customer")(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
            .join(
                _dim_hint(SF10, "supplier")(t["supplier"]),
                (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")),
            )
            .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")), F.col("n_regionkey") == F.col("r_regionkey"))
        )

    # ---- q10: filtered facts, orderkey join, cust+nation, topN ---------
    def q10_parts(spark):
        orders = load_table(spark, SF10, "orders").filter(
            (F.col("o_orderdate") >= ts("1997-01-01 00:00:00")) & (F.col("o_orderdate") < ts("1997-04-01 00:00:00"))
        )
        li = load_table(spark, SF10, "lineitem").filter(F.col("l_returnflag") == "R")
        return orders, li

    # ---- q15: filtered scan, per-suppkey agg, max join ------------------
    def q15_li(spark):
        return load_table(spark, SF10, "lineitem").filter(
            (F.col("l_shipdate") >= ts("1996-01-01 00:00:00")) & (F.col("l_shipdate") < ts("1996-04-01 00:00:00"))
        )

    V: dict[tuple[str, str], object] = {}

    V[("q1_pricing_summary", "scan_floor")] = lambda s, _: count_of(q1_li(s))
    V[("q1_pricing_summary", "group_agg")] = lambda s, _: (
        q1_li(s).groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))
    )
    V[("q1_pricing_summary", "full")] = lambda s, _: QUERIES["q1_pricing_summary"](s, SF10)

    def q3_scan(s, _):
        _, orders, li = q3_parts(s)
        return count_of(li.select(F.col("l_orderkey").alias("k")).unionByName(orders.select(F.col("o_orderkey").alias("k"))))

    def q3_join(s, _):
        _, orders, li = q3_parts(s)
        return count_of(li.join(orders, li.l_orderkey == orders.o_orderkey))

    def q3_dims(s, _):
        cust, orders, li = q3_parts(s)
        return count_of(
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(_dim_hint(SF10, "customer")(cust), orders.o_custkey == cust.c_custkey)
        )

    def q3_group(s, _):
        cust, orders, li = q3_parts(s)
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(_dim_hint(SF10, "customer")(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    V[("q3_shipping_priority", "scan_floor")] = q3_scan
    V[("q3_shipping_priority", "fact_join")] = q3_join
    V[("q3_shipping_priority", "plus_dims")] = q3_dims
    V[("q3_shipping_priority", "group_agg")] = q3_group
    V[("q3_shipping_priority", "full")] = lambda s, _: QUERIES["q3_shipping_priority"](s, SF10)

    def q5_scan(s, _):
        t, orders = q5_parts(s)
        return count_of(
            t["lineitem"].select(F.col("l_orderkey").alias("k")).unionByName(orders.select(F.col("o_orderkey").alias("k")))
        )

    def q5_join(s, _):
        t, orders = q5_parts(s)
        return count_of(t["lineitem"].join(orders, F.col("l_orderkey") == F.col("o_orderkey")))

    V[("q5_local_supplier_volume", "scan_floor")] = q5_scan
    V[("q5_local_supplier_volume", "fact_join")] = q5_join
    V[("q5_local_supplier_volume", "plus_dims")] = lambda s, _: count_of(q5_joined(s))
    V[("q5_local_supplier_volume", "group_agg")] = lambda s, _: (
        q5_joined(s).groupBy("n_name").agg(F.count(F.lit(1)).alias("n"))
    )
    V[("q5_local_supplier_volume", "full")] = lambda s, _: QUERIES["q5_local_supplier_volume"](s, SF10)

    def q10_scan(s, _):
        orders, li = q10_parts(s)
        return count_of(li.select(F.col("l_orderkey").alias("k")).unionByName(orders.select(F.col("o_orderkey").alias("k"))))

    def q10_join(s, _):
        orders, li = q10_parts(s)
        return count_of(li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")))

    def q10_dims(s, _):
        orders, li = q10_parts(s)
        cust = load_table(s, SF10, "customer")
        nation = load_table(s, SF10, "nation")
        return count_of(
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(_dim_hint(SF10, "customer")(cust), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        )

    def q10_group(s, _):
        orders, li = q10_parts(s)
        cust = load_table(s, SF10, "customer")
        nation = load_table(s, SF10, "nation")
        return (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(_dim_hint(SF10, "customer")(cust), F.col("o_custkey") == F.col("c_custkey"))
            .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    V[("q10_returned_items", "scan_floor")] = q10_scan
    V[("q10_returned_items", "fact_join")] = q10_join
    V[("q10_returned_items", "plus_dims")] = q10_dims
    V[("q10_returned_items", "group_agg")] = q10_group
    V[("q10_returned_items", "full")] = lambda s, _: QUERIES["q10_returned_items"](s, SF10)

    V[("q15_top_supplier", "scan_floor")] = lambda s, _: count_of(q15_li(s))
    V[("q15_top_supplier", "group_agg")] = lambda s, _: (
        q15_li(s).groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("n"))
    )
    V[("q15_top_supplier", "full")] = lambda s, _: QUERIES["q15_top_supplier"](s, SF10)

    return V


def main() -> None:
    if not os.path.isdir(SF10):
        sys.exit(f"{SF10} missing - run tools/make_scale_data.py --copies 100")

    from growth_check import run_watched

    from filebeat_to_clickhouse_spark.queries import ORACLE_SQL
    from filebeat_to_clickhouse_spark.session import get_spark

    spark = get_spark("fbck-scanagg-decomp")
    spark.sparkContext.setLogLevel("ERROR")

    V = _variants()
    runnable = {f"{q}:{st}": fn for (q, st), fn in V.items()}

    # warm pass: every stage once (codegen + page cache)
    for key in runnable:
        r = run_watched(spark, runnable, key, SF10, cap_sec=300)
        print(f"  warm {key}: {r}", flush=True)

    times: dict[str, list[float]] = {k: [] for k in runnable}
    for rnd in range(N_ROUNDS):
        for key in runnable:  # interleaved round-robin
            r = run_watched(spark, runnable, key, SF10, cap_sec=300)
            print(f"  round {rnd} {key}: {r}", flush=True)
            if isinstance(r, float):
                times[key].append(r)

    # DuckDB whole-query floor, fresh process per run (warm + min-of-2)
    queries = sorted({q for q, _ in V})
    duck: dict[str, float | str] = {}
    for q in queries:
        if ORACLE_SQL.get(q) is None:
            duck[q] = "no oracle"
            continue
        ts_: list[float] = []
        ok = True
        for _ in range(3):  # first is the warm pass
            try:
                r = subprocess.run(
                    [sys.executable, os.path.join(REPO, "tools", "crossover_sf10.py"), "--duck-one", q],
                    capture_output=True,
                    text=True,
                    timeout=300,
                )
                assert r.returncode == 0, r.stderr[-200:]
                ts_.append(float(r.stdout.strip().splitlines()[-1]))
            except Exception as e:  # noqa: BLE001 - recorded, not hidden
                duck[q] = f"err: {e}"
                ok = False
                break
        if ok:
            duck[q] = round(min(ts_[1:]), 3)
        print(f"  duckdb {q}: {duck[q]}", flush=True)

    stages: dict[str, dict[str, dict]] = {}
    for (q, st), _ in V.items():
        key = f"{q}:{st}"
        ts_ = times[key]
        stages.setdefault(q, {})[st] = {
            "min_sec": round(min(ts_), 3) if ts_ else None,
            "median_sec": round(statistics.median(ts_), 3) if ts_ else None,
            "n": len(ts_),
        }

    # cumulative deltas: what each added component costs (on medians, the
    # interleave's noise-stable statistic)
    deltas: dict[str, dict[str, float]] = {}
    for q, st_map in stages.items():
        order = [st for st in ("scan_floor", "fact_join", "plus_dims", "group_agg", "full") if st in st_map]
        d = {}
        prev = 0.0
        for st in order:
            m = st_map[st]["median_sec"]
            if m is None:
                continue
            d[f"+{st}" if st != "scan_floor" else st] = round(m - prev, 3)
            prev = m
        deltas[q] = d

    rnd_name = os.environ.get("SPARK_GRAFT_ROUND", "r10")
    out = {
        "metric": "scanagg_decomposition_sf10",
        "unit": "sec",
        "sf": 10,
        "n_rounds": N_ROUNDS,
        "protocol": "one fresh JVM; all (query, stage) pairs interleaved "
        f"round-robin x{N_ROUNDS} after a warm pass; DuckDB whole-query floor "
        "fresh-process per run (warm + min-of-2), repo oracle SQL, 32 threads",
        "stages": stages,
        "stage_deltas_median": deltas,
        "duckdb_whole_query_sec": duck,
    }
    path = os.path.join(REPO, f"QDECOMP_{rnd_name}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": out["metric"], "file": path, "duckdb": duck}))


if __name__ == "__main__":
    main()
