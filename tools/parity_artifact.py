#!/usr/bin/env python
"""Persist the full-registry oracle-parity run as a per-round artifact
(VERDICT r8 item 3): the driver's own CORRECTNESS rotation has sampled
69/161 names cumulatively and added no new names in r8, so the in-repo
parity harness is the compensating control — this makes its result
auditable DATA (PARITY_r{N}.json: name → rows/schema/hash verdict at
sf0.01) instead of a pytest exit code.

The compare mirrors the driver gate and tests/test_queries_oracle.py:
row count, sorted column names, and order-insensitive canonicalized
values (doubles compared by exact repr — the parity contract is
bit-identical values, not approximate). The value hash is sha256 over
the sorted canonical rows.

Usage: python tools/parity_artifact.py   (SPARK_GRAFT_ROUND names the
artifact, default r09; SPARK_GRAFT_TEST_SF_DIR overrides the sf0.01
default). Queries without an oracle are recorded as rows-only smokes.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

# Evidence links for the oracle-less entries (r9 verdict item 4): each
# rows-only verdict in the artifact carries the pytest node ids that pin
# its correctness and WHAT they assert, so "rows_only" is auditable data,
# not a bare smoke. parity runs refuse to emit a rows-only entry that has
# no evidence registered here.
ROWS_ONLY_EVIDENCE: dict[str, dict] = {
    "approx_distinct_users_hll": {
        "tests": [
            "tests/test_queries.py::TestRowsOnlyEntriesEvidence::"
            "test_hll_estimate_tracks_exact_count_within_sketch_error",
        ],
        "asserts": "per-group HLL estimate within the sketch's relative-error "
        "envelope of the exact distinct count (<=8% at lgK=12, 5-sigma), "
        "positive for every non-empty group",
    },
    "quality_classifier_mixed_scores": {
        "tests": [
            "tests/test_queries.py::TestRowsOnlyEntriesEvidence::"
            "test_mixed_perceptron_entry_matches_library_path",
            "tests/test_operators.py::TestMixedPerceptron::"
            "test_beats_the_centroid_baseline",
            "tests/test_operators.py::TestMixedPerceptron::"
            "test_deterministic_across_partitionings",
        ],
        "asserts": "registered composition scores EVERY document with holdout "
        "accuracy >=0.85; library path beats the centroid baseline (>=0.92) "
        "and produces identical weights across partitionings (determinism)",
    },
}


def _canon_cell(v):
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return f"{type(v).__name__}:{v}"


def canonical(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(
        tuple(_canon_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )


def value_hash(rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for r in rows:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def main() -> None:
    import duckdb

    from filebeat_to_clickhouse_spark.io import TABLES
    from filebeat_to_clickhouse_spark.queries import ORACLE_SQL, QUERIES
    from filebeat_to_clickhouse_spark.session import get_spark

    spark = get_spark("fbck-parity-artifact")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    results: dict[str, dict] = {}
    t_start = time.time()
    for name in sorted(QUERIES):
        entry: dict = {}
        try:
            spdf = QUERIES[name](spark, SF).toPandas()
            if name not in ORACLE_SQL or ORACLE_SQL.get(name) is None:
                ev = ROWS_ONLY_EVIDENCE.get(name)
                entry = {
                    "mode": "rows_only",
                    "spark_rows": len(spdf),
                    # a rows-only entry with NO registered evidence fails
                    # the artifact: every oracle-less verdict must point at
                    # the pytest nodes that actually pin it
                    "ok": bool(len(spdf.columns)) and ev is not None,
                    "evidence": ev,
                }
            else:
                odf = con.sql(ORACLE_SQL[name]).df()
                s_rows, o_rows = canonical(spdf), canonical(odf)
                sh, oh = value_hash(s_rows), value_hash(o_rows)
                entry = {
                    "mode": "oracle",
                    "spark_rows": len(spdf),
                    "oracle_rows": len(odf),
                    "rows_match": len(spdf) == len(odf),
                    "schema_match": sorted(spdf.columns) == sorted(odf.columns),
                    "hash_match": sh == oh,
                    "value_hash": sh,
                    "ok": len(spdf) == len(odf)
                    and sorted(spdf.columns) == sorted(odf.columns)
                    and sh == oh,
                }
        except Exception as e:  # noqa: BLE001 - recorded per entry, run continues
            entry = {"mode": "error", "ok": False, "err": f"{type(e).__name__}: {e}"[:300]}
        results[name] = entry
        print(f"{'PASS' if entry['ok'] else 'FAIL'} {name} {entry.get('mode')}", flush=True)

    n_ok = sum(1 for e in results.values() if e["ok"])
    rnd = os.environ.get("SPARK_GRAFT_ROUND", "r09")
    out = {
        "metric": "full_registry_oracle_parity",
        "sf_dir": SF,
        "n_queries": len(results),
        "n_oracle": sum(1 for e in results.values() if e.get("mode") == "oracle"),
        "n_rows_only": sum(1 for e in results.values() if e.get("mode") == "rows_only"),
        "n_ok": n_ok,
        "all_ok": n_ok == len(results),
        "wall_sec": round(time.time() - t_start, 1),
        "entries": results,
    }
    with open(os.path.join(REPO, f"PARITY_{rnd}.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in out if k != "entries"}))


if __name__ == "__main__":
    main()
