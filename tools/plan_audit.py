"""Plan audit: executed-plan shape statistics for every registered query.

For each entry in the registry, builds the DataFrame at a small sf and
reports, from the executed plan string:
  - scans: total parquet scans, and the max number of scans hitting the
    SAME table file (>=2 means the plan re-derives a subtree from the
    source instead of reusing/cutting it — the pattern behind the
    mad_outliers, curated_mixture_selection, and retention fixes);
  - exchanges: data shuffles (ReusedExchange not counted);
  - per-row python: BatchEvalPython / ArrowEvalPython occurrences
    (row-at-a-time UDFs in the hot path are banned by SURVEY §2 rules);
  - cartesian: CartesianProduct / BroadcastNestedLoopJoin occurrences
    (legit only against broadcast model tables — flagged for eyeballs).

Pure diagnostics — builds plans, runs NO jobs (except the registry
functions' own construction-time work, e.g. bounded model pulls).

Usage: python tools/plan_audit.py [sf_dir] [name_substring ...]
Prints one line per query plus a summary of outliers.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def audit_one(spark, name, fn, sf_dir):
    df = fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Count scans per source path (the "file:" fragment Spark prints in
    # FileScan lines); localCheckpoint'd subtrees scan nothing.
    tables = re.findall(r"FileScan parquet[^\n]*?Location[^\n]*?\[([^\]]*)\]", plan)
    paths = re.findall(r"FileScan parquet", plan)
    per_table: dict[str, int] = {}
    for line in plan.splitlines():
        m = re.search(r"FileScan parquet[^\[]*", line)
        if m:
            pm = re.search(r"([a-zA-Z0-9_]+)\.parquet", line)
            key = pm.group(1) if pm else "?"
            per_table[key] = per_table.get(key, 0) + 1
    return {
        "scans": len(paths),
        "max_same_table": max(per_table.values(), default=0),
        "dup_tables": {t: c for t, c in per_table.items() if c >= 2},
        "exchanges": len(re.findall(r"\n[^\n]*\bExchange\b", plan))
        - len(re.findall(r"ReusedExchange", plan)),
        "py_eval": len(re.findall(r"BatchEvalPython", plan)),
        "cartesian": len(re.findall(r"CartesianProduct|BroadcastNestedLoopJoin", plan)),
    }


def main():
    from filebeat_to_clickhouse_spark.session import get_spark
    import __spark_entry__ as entry

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join("/root/testdata", "sf0.01")
    filters = sys.argv[2:]
    spark = get_spark("plan-audit")
    qs = entry.queries()
    rows = []
    for name, fn in sorted(qs.items()):
        if filters and not any(f in name for f in filters):
            continue
        try:
            r = audit_one(spark, name, fn, sf_dir)
        except Exception as e:  # streaming-only or env-gated entries
            print(f"{name:45s} SKIP ({type(e).__name__})")
            continue
        rows.append((name, r))
        flag = ""
        if r["max_same_table"] >= 2:
            flag += f" DUP-SCAN {r['dup_tables']}"
        if r["py_eval"]:
            flag += f" PY-EVAL x{r['py_eval']}"
        print(
            f"{name:45s} scans={r['scans']:2d} dup={r['max_same_table']:2d} "
            f"exch={r['exchanges']:2d} cart={r['cartesian']}{flag}"
        )
    dup = [(n, r) for n, r in rows if r["max_same_table"] >= 2]
    print(f"\n{len(rows)} audited; {len(dup)} with >=2 scans of one table:")
    for n, r in sorted(dup, key=lambda x: -x[1]["max_same_table"]):
        print(f"  {n:45s} {r['dup_tables']}")
    spark.stop()


if __name__ == "__main__":
    main()
