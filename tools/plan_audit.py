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


# ---------------------------------------------------------------------------
# Broadcast-boundedness audit (r10 mandate): every F.broadcast() in the
# package must name a PROVABLY bounded side — a fixed-cardinality dim, a
# ≤k-row model/aggregate table, a query set, or a size-gated helper —
# because an explicit broadcast hint is BINDING (AQE cannot demote it), so
# a corpus-scaling side behind one is a guaranteed OOM at some scale (the
# r8 span-dedup and r10 TPC-H dim findings). Sites are matched by
# (file, argument-prefix regex); an UNMATCHED site fails the audit until a
# rule with an explicit boundedness reason is added — the class cannot
# silently recur. Corpus-scaling sides must go through queries._dim_hint /
# dedup._eval_join_hint instead (both size-gate with a spillable fallback).
# ---------------------------------------------------------------------------

BROADCAST_RULES: list[tuple[str, str, str]] = [
    # --- queries.py ---
    ("queries.py", r"t\[\"nation\"\]|t\[\"region\"\]|nation|nat\b|reg\b|sn\b|cn\b|n1\b|n2\b",
     "fixed-cardinality dim (nation 25 rows / region 5; filters only shrink)"),
    ("queries.py", r"mx\b|avg_bal\b|thr\b",
     "1-row scalar aggregate (max / avg / quantile threshold)"),
    ("queries.py", r"top\b",
     "top-N aggregate (<= LIMIT rows; q10's deferred-dim decoration side)"),
    ("queries.py", r"tot\b",
     "global-aggregate table: 1 row or <=|fixed domain| rows (event types)"),
    ("queries.py", r"cells\b",
     "count-min sketch table (depth x width, config-fixed)"),
    ("queries.py", r"dim\b",
     "host-metadata enrichment dim: fleet-sized (<< corpus; literal fixture here)"),
    ("queries.py", r"stat\b",
     "per-cluster stats (<=k rows, k config-fixed)"),
    ("queries.py", r"csize\b",
     "per-cohort counts (<= #first-seen days: time-bounded, not corpus-bounded)"),
    ("queries.py", r"allocs\b",
     "per-source allocation table (<= #sources, mixture-config-sized)"),
    # --- operators.py ---
    ("operators.py", r"boundary\b",
     "1-row boundary (limit(1) on the coarse histogram)"),
    ("operators.py", r"med\b|model",
     "per-group model table (<=|caller's key domain|; keyed-MAD caller contract)"),
    # off broadcasts ONLY on the keyless path (per-partition offsets)
    ("operators.py", r"off\b",
     "keyless path only: per-partition offsets (<= n_partitions rows)"),
    # --- streaming/pipeline.py ---
    ("streaming/pipeline.py", r"dim\b",
     "enrichment dim: fleet-sized (<< corpus)"),
    # extensions/dedup.py: NO rule on purpose — its only broadcast is the
    # F.broadcast function REFERENCE returned by _eval_join_hint under the
    # counted row cap (not a call site); any new F.broadcast(...) call
    # there must flag until explained.
    # --- extensions/retrieval.py ---
    ("extensions/retrieval.py", r"stats\b|row\b",
     "1-row corpus stats"),
    ("extensions/retrieval.py", r"model\b",
     "per-query-term BM25 model (<=|standing query terms| rows)"),
    ("extensions/retrieval.py", r"qrows\b|q\b",
     "query-side table (<=|queries| x |terms|, caller's standing set)"),
    # --- extensions/similarity.py ---
    ("extensions/similarity.py", r"_pack_centroids\(|cents\b|cent\b|coarse_cent\b|packed\b",
     "centroid model (<=k rows, k config-fixed)"),
    ("extensions/similarity.py", r"probes\b",
     "probe list (<= |queries| x n_probe rows)"),
    ("extensions/similarity.py", r"_pack_codebook\(|cb\b|cbm\b|lut\b|lutm\b",
     "PQ codebook / LUT (m x 2^bits rows, config-fixed)"),
    ("extensions/similarity.py", r"smap\b|seed_ids\b",
     "k-row model (subspace map / kmeans++ seed ids)"),
    ("extensions/similarity.py", r"q\b|qv\b|vq\b|qrow\b",
     "query-side vectors (caller's query set)"),
    ("extensions/similarity.py", r"short\b|short\.join",
     "k-row rerank shortlist"),
    ("extensions/similarity.py", r"e\b",
     "semantic_decontaminate eval registry: VERIFIED <= max_eval_rows "
     "(early-exit count, loud raise past cap - r10)"),
    # --- extensions/text.py ---
    ("extensions/text.py", r"dfm\b",
     "vocabulary-packed single row (term-type count: sublinear in corpus; "
     "per-doc top-k consumer)"),
    ("extensions/text.py",
     r"n1all\b|tot\b|nmin\b|tgt_total\b|raw_total\b|binding\b|cls\b|lam_arr\b|best\.|pick\b",
     "1-row aggregate (totals / classifier / lambda table / BPE pick)"),
    ("extensions/text.py", r"rates\b",
     "per-stratum rates (<= #strata)"),
    ("extensions/text.py", r"vocab\b",
     "BPE vocab (word types: sublinear; merges-budget bounded)"),
    ("extensions/text.py", r"weights\b",
     "hashed-feature weight table (<= 2^n_buckets, config-fixed)"),
    ("extensions/text.py", r"b\b|b\.select|lvl\b",
     "per-source metadata (<= #sources, mixture-config-sized)"),
]


def _broadcast_arg(src: str, start: int) -> str:
    """The balanced-paren argument text of an F.broadcast( call."""
    depth, i = 1, start
    while i < len(src) and depth:
        if src[i] == "(":
            depth += 1
        elif src[i] == ")":
            depth -= 1
        i += 1
    return " ".join(src[start : i - 1].split())


def broadcast_audit(pkg_root: str | None = None) -> list[dict]:
    pkg_root = pkg_root or os.path.join(REPO, "filebeat_to_clickhouse_spark")
    sites = []
    for dirpath, _, files in os.walk(pkg_root):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, pkg_root)
            src = open(path).read()
            for m in re.finditer(r"F\.broadcast\(", src):
                # skip comment/docstring mentions (e.g. the class NOTE in
                # queries.py): code sites never sit after a '#' on the line
                line_start = src.rfind("\n", 0, m.start()) + 1
                if "#" in src[line_start : m.start()]:
                    continue
                arg = _broadcast_arg(src, m.end())
                if not arg:
                    continue
                line = src[: m.start()].count("\n") + 1
                reason = None
                for fsuf, pat, why in BROADCAST_RULES:
                    if rel.endswith(fsuf) and re.match(pat, arg):
                        reason = why
                        break
                sites.append(
                    {"file": rel, "line": line, "arg": arg[:70], "bounded": reason}
                )
    return sites


def print_broadcast_audit() -> int:
    sites = broadcast_audit()
    unexplained = [s for s in sites if s["bounded"] is None]
    print(f"\nbroadcast audit: {len(sites)} F.broadcast() sites")
    for s in sites:
        tag = "OK " if s["bounded"] else "UNEXPLAINED"
        print(f"  {tag} {s['file']}:{s['line']:<5} {s['arg'][:58]:58s} "
              f"{(s['bounded'] or '')[:70]}")
    print(f"broadcast audit: {len(unexplained)} unexplained unbounded site(s)")
    return len(unexplained)


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
    n_unexplained = print_broadcast_audit()
    spark.stop()
    if n_unexplained:
        sys.exit(1)


if __name__ == "__main__":
    if sys.argv[1:2] == ["--broadcast"]:
        sys.exit(1 if print_broadcast_audit() else 0)
    main()
