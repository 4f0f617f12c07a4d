#!/usr/bin/env python
"""Per-stage decomposition of the two curation-family headline entries at
the BENCH scale (sf0.1) — the r10 verdict's item 4: corpus_curation_pipeline
and curation_funnel had been "examined, left" for three rounds with no fresh
per-stage measurement while staying the two slowest headline entries in the
driver's bench.

Each stage is a real executed plan that ADDS one pipeline step, run through
the noop sink (every column forced — a count() would let Spark prune the
very text kernels being measured), so successive deltas attribute the wall:

corpus_curation_pipeline:
  gate_scan        rebalanced documents scan + n_chars gate
  exact_dedup      + md5 survivor window (dedup.exact_dedup_survivors)
  minhash_pairs    + shingle → minhash → LSH bands → verified pairs
  components       + connected components over the pairs
  survivors_sample + cluster-survivor join + stratified sample
  full             the registered query (adds greedy packing)

curation_funnel:
  split        hash_split + lineage cut (the shared base)
  rep_gate     + bigram repetition gate over the train split
  decon_join   + decontaminate(train, eval) left join (the flags frame)
  dedup_window + skinny-projection md5 window (the `pre` frame + f_dedup)
  full         the registered query (adds the tally agg + raw union)

Protocol: one JVM, every (query, stage) pair INTERLEAVED round-robin
× N_ROUNDS after a warm pass (same discipline as tools/scanagg_decomp.py);
medians reported. Writes CURDECOMP_{round}.json.

Usage: python tools/curation_decomp.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

N_ROUNDS = 5


def _variants(sf_dir: str):
    import pyspark.sql.functions as F

    from filebeat_to_clickhouse_spark.checkpointing import (
        default_checkpoint_dir,
        make_lineage_cut,
    )
    from filebeat_to_clickhouse_spark.extensions import dedup
    from filebeat_to_clickhouse_spark.extensions import text as text_ops
    from filebeat_to_clickhouse_spark.io import load_table
    from filebeat_to_clickhouse_spark.queries import QUERIES

    cut = make_lineage_cut(default_checkpoint_dir())

    # ---- corpus_curation_pipeline stage frames (mirror queries.py) ------
    def ccp_docs(s):
        return load_table(s, sf_dir, "documents", rebalance=True).filter(
            F.col("n_chars") >= 100
        )

    def ccp_ex(s):
        return cut(dedup.exact_dedup_survivors(ccp_docs(s)), eager=False)

    def ccp_pairs(s):
        return dedup.minhash_lsh_neardup_pairs(ccp_ex(s), threshold=0.5)

    def ccp_comps(s):
        return dedup.connected_components(
            ccp_pairs(s), checkpoint_dir=default_checkpoint_dir()
        )

    def ccp_samp(s):
        ex = ccp_ex(s)
        comps = dedup.connected_components(
            dedup.minhash_lsh_neardup_pairs(ex, threshold=0.5),
            checkpoint_dir=default_checkpoint_dir(),
        )
        surv = ex.join(comps.withColumnRenamed("node", "doc_id"), "doc_id", "left").filter(
            F.col("component").isNull() | (F.col("component") == F.col("doc_id"))
        )
        return text_ops.stratified_hash_sample(
            surv, rates={"en": 0.5, "zh": 0.3}, default_rate=0.1
        )

    # ---- curation_funnel stage frames (mirror queries.py) ---------------
    def cf_split(s):
        return cut(
            text_ops.hash_split(load_table(s, sf_dir, "documents", rebalance=True)),
            eager=False,
        )

    def cf_train_ev(s):
        split = cf_split(s)
        return (
            split.filter(F.col("split") == "train").drop("split"),
            split.filter(F.col("split") == "test"),
        )

    def cf_repgate(s):
        train, _ = cf_train_ev(s)
        return text_ops.with_repetition_gate(train)

    def cf_flags(s):
        train, ev = cf_train_ev(s)
        return text_ops.with_repetition_gate(train).join(
            dedup.decontaminate(train, ev, n=3), "doc_id", "left"
        )

    def cf_window(s):
        flags = cf_flags(s)
        from pyspark.sql import Window

        len_ok = F.col("n_chars") >= 100
        rep_ok = len_ok & F.col("_rep_gate")
        decon_ok = rep_ok & (F.coalesce(F.col("n_shared_grams"), F.lit(0)) < 5)
        pre = flags.select(
            "doc_id",
            "lang",
            F.md5(F.col("text")).alias("_h"),
            len_ok.alias("f_len"),
            rep_ok.alias("f_rep"),
            decon_ok.alias("f_decon"),
        )
        w = Window.partitionBy("_h")
        dedup_ok = F.col("f_decon") & (
            F.col("doc_id") == F.min(F.when(F.col("f_decon"), F.col("doc_id"))).over(w)
        )
        return pre.select("*", dedup_ok.alias("f_dedup"))

    V: dict[tuple[str, str], object] = {}
    V[("corpus_curation_pipeline", "gate_scan")] = lambda s, _: ccp_docs(s)
    V[("corpus_curation_pipeline", "exact_dedup")] = lambda s, _: ccp_ex(s)
    V[("corpus_curation_pipeline", "minhash_pairs")] = lambda s, _: ccp_pairs(s)
    V[("corpus_curation_pipeline", "components")] = lambda s, _: ccp_comps(s)
    V[("corpus_curation_pipeline", "survivors_sample")] = lambda s, _: ccp_samp(s)
    V[("corpus_curation_pipeline", "full")] = lambda s, _: QUERIES[
        "corpus_curation_pipeline"
    ](s, sf_dir)
    V[("curation_funnel", "split")] = lambda s, _: cf_split(s)
    V[("curation_funnel", "rep_gate")] = lambda s, _: cf_repgate(s)
    V[("curation_funnel", "decon_join")] = lambda s, _: cf_flags(s)
    V[("curation_funnel", "dedup_window")] = lambda s, _: cf_window(s)
    V[("curation_funnel", "full")] = lambda s, _: QUERIES["curation_funnel"](s, sf_dir)
    return V


STAGE_ORDER = {
    "corpus_curation_pipeline": [
        "gate_scan",
        "exact_dedup",
        "minhash_pairs",
        "components",
        "survivors_sample",
        "full",
    ],
    "curation_funnel": ["split", "rep_gate", "decon_join", "dedup_window", "full"],
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from growth_check import run_watched

    from filebeat_to_clickhouse_spark.session import get_spark

    spark = get_spark("fbck-curation-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.streaming.stopTimeout", "30000")

    V = _variants(sf_dir)
    runnable = {f"{q}:{st}": fn for (q, st), fn in V.items()}

    for key in runnable:  # warm pass (codegen + page cache)
        r = run_watched(spark, runnable, key, sf_dir, cap_sec=300)
        print(f"  warm {key}: {r}", flush=True)

    times: dict[str, list[float]] = {k: [] for k in runnable}
    for rnd in range(N_ROUNDS):
        for key in runnable:
            r = run_watched(spark, runnable, key, sf_dir, cap_sec=300)
            if isinstance(r, float):
                times[key].append(r)
        print(f"  round {rnd} done", flush=True)

    stages: dict[str, dict[str, dict]] = {}
    for (q, st), _ in V.items():
        ts = times[f"{q}:{st}"]
        stages.setdefault(q, {})[st] = {
            "min_sec": round(min(ts), 3) if ts else None,
            "median_sec": round(statistics.median(ts), 3) if ts else None,
            "n": len(ts),
        }

    deltas: dict[str, dict[str, float]] = {}
    for q, st_map in stages.items():
        d, prev = {}, 0.0
        for st in STAGE_ORDER[q]:
            m = st_map[st]["median_sec"]
            if m is None:
                continue
            d[f"+{st}" if prev else st] = round(m - prev, 3)
            prev = m
        deltas[q] = d

    rnd_name = os.environ.get("SPARK_GRAFT_ROUND", "r11")
    out = {
        "metric": "curation_decomposition",
        "unit": "sec",
        "sf_dir": sf_dir,
        "n_rounds": N_ROUNDS,
        "protocol": "one JVM; all (query, stage) pairs interleaved round-robin "
        f"x{N_ROUNDS} after a warm pass; noop sink (all columns forced)",
        "stages": stages,
        "stage_deltas_median": deltas,
    }
    path = os.path.join(REPO, f"CURDECOMP_{rnd_name}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"metric": out["metric"], "file": path, "deltas": deltas}))
    spark.stop()


if __name__ == "__main__":
    main()
