"""SparkSession construction with scale-oriented defaults.

The engine is designed for a large multi-executor cluster; locally we run
``local[N]``. Every config below is chosen for the 100 TB design point and
degrades gracefully on a laptop:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- shuffle partitions sized to cores locally; on a real cluster AQE coalesces
  from a high initial number, so this is safe to raise
- Arrow enabled for the (rare) pandas-UDF paths
- session timezone pinned to UTC so timestamp semantics are deployment-independent
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs that query entry points also apply defensively to a
# session they did not create (see io.configure_session): the driver harness
# builds its own SparkSession.
RUNTIME_CONFS: dict[str, str] = {
    # testdata parquet stores TIMESTAMP(NANOS) which Spark cannot read natively;
    # read as long and convert (io.load_table) — truncation to micros matches DuckDB.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # RocksDB state store for every stateful streaming operator: the r9
    # sf10 profile measured the default in-memory (HDFS-backed) store
    # holding 2.0 GB heap for 10M dedup keys / 1.5 GB for the interval
    # join's 6M-row state — heap that grows with the watermark window and
    # sits in the SAME JVM as shuffle/aggregate memory. RocksDB keeps it
    # off-heap/on-disk (17.5 MB / 14.3 MB reported for identical state)
    # AND measured faster end-to-end (dedup roundtrip 97.3 -> 71.4 s,
    # attribution 163.6 -> 131.2 s at sf10): the design point for another
    # decade of state, where the in-memory store OOMs first.
    # COMPATIBILITY BREAK (r9 advice): Spark cannot resume a streaming
    # query across a state-store-provider change, so checkpoints written
    # under the previous HDFS-backed default will FAIL to restart under
    # this session factory. Resumed pre-existing queries must either start
    # a fresh checkpoint dir or override this conf back to
    # HDFSBackedStateStoreProvider for that query's lifetime. (The repo's
    # own streaming roundtrips always use fresh tmp checkpoints.)
    "spark.sql.streaming.stateStore.providerClass":
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    # AQE SMJ→shuffled-hash conversion: MEASURED AND REJECTED (r10).
    # The QDECOMP_r10 stage split showed the fact-fact orderkey join
    # dominating q3's wall, mostly the SMJ sort (isolated join 4.5 s SMJ
    # vs 1.8 s shuffled-hash), so r10 trialed
    # spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold=128m —
    # runtime-gated, self-demoting, q3 3.82→2.75 s same-session. The
    # first SCALE10_r10 run then produced the counter-evidence: the
    # conversion also fired on remove_duplicated_spans' BIG-INTERMEDIATE
    # join and its tasks died with "not enough memory to build hash map"
    # — the gate bounds each partition's SHUFFLE BYTES, but 32 CONCURRENT
    # UnsafeHashedRelation builds share one ~4.6 GiB execution pool, and
    # nothing bounds their SUM. Lowering to 16m is a no-op (AQE coalesces
    # partitions to the 64m advisory, so none qualify), and any threshold
    # that converts the winning dim-sized builds also converts enough of
    # a corpus-sized build side to exhaust the pool. Conclusion: the
    # per-partition gate cannot express the needed invariant (bounded
    # TOTAL concurrent build memory), so the conf stays OFF and the
    # q3-family SMJ sort stays an attributed engine constant
    # (QDECOMP_r10 + the SHJ A/B numbers preserve the measurement).
    # Runtime Bloom-filter injection (r10 second sitting, guide §3.2 /
    # SPARK-32268): the optimizer builds a Bloom filter over a join's
    # filtered creation side and drops definitely-non-matching rows from
    # the big application side BEFORE its shuffle. Stock thresholds never
    # fire here (creation ≤10 MB, application scan ≥10 GB); these values
    # open the window to the shapes that measured as wins while keeping
    # the bench scale untouched (application side ≥256 MB — at sf0.1 the
    # largest scan is 17 MB, so sf0.1 plans and the driver bench are
    # byte-identical). Unlike the SMJ→SHJ trial above, this cannot OOM:
    # the filter is ≤ numBits/8 = 4 MiB per join regardless of creation
    # row count (saturation only raises the false-positive rate, which
    # costs shuffle bytes, never correctness — no false negatives), and
    # it is built by a spillable aggregate. Measured at sf10 (fresh JVM
    # per entry, min-of-2 warm, same-session interleaved off/on):
    #   q5  8.17 → 3.71 s   q9  9.57 → 5.47   q2 10.58 → 6.27
    #   q3  6.91 → 4.66     q21 7.71 → 6.19   q8  9.61 → 7.94
    # Costs, measured and accepted: q10 2.67→3.26 and q17 1.65→2.20 —
    # both inject next to an ALREADY-broadcast probe, so the hash+filter
    # pass buys nothing (bounded overhead: one extra creation-side scan
    # + a per-row xxhash64). Every other registry entry at sf10 plans
    # zero might_contain nodes (application sides: only lineitem 1.18 GB
    # and orders 263 MB qualify). At 100 TB the win side grows with
    # shuffle volume (guide §2.2) while the cost side stays linear-scan.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "512MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "256MB",
    "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems": "4000000",
    "spark.sql.optimizer.runtime.bloomFilter.numBits": "33554432",
    # Round-robin repartition normally LOCAL-SORTS every partition first so a
    # retried task deals rows identically (SPARK-23207). Every repartition in
    # this engine sits directly on a deterministic parquet scan (io.load_table
    # rebalance), where the row order is already reproducible, so the sort is
    # pure overhead — measured 2× on the rebalance (0.80 s → 0.38 s for
    # lineitem at sf0.1). Deployments that repartition non-deterministic
    # sources (e.g. after a shuffle with spill) should flip this back.
    "spark.sql.execution.sortBeforeRepartition": "false",
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "filebeat-to-clickhouse-spark", cpus: int | None = None) -> SparkSession:
    """Build (or get) a SparkSession tuned for this engine."""
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Always use the sort-based shuffle writer, never the bypass-merge
        # writer (r11, guide §2.2 "fewer, larger blocks" applied to the
        # write side). The bypass writer opens R partition files PER MAP
        # TASK whenever R ≤ 200 (the default threshold), so an M-map-task →
        # R-partition shuffle creates M×R files; the sort writer — the ONLY
        # writer large-R shuffles ever use at production scale — writes one
        # sorted file + index per map task (M files). The M×R explosion is
        # exactly the regime of a many-small-shuffle analytics suite:
        # stage-metric attribution at local[32] measured shuffleWriteTime
        # 18.6 s of curation_funnel's 53.7 s total task time (0.18 s at
        # local[8]) and 14.1 s of hybrid_rrf_topk's 44.8 s, and flipping
        # this threshold cut the 7-probe anti-scaler suite 12.0 → 9.1 s
        # while a tmpfs spark.local.dir (the I/O-contention ceiling) read
        # 8.3 s — the file count, not the bytes, was the cost. Static conf
        # (core, not SQL), so it binds only sessions this factory builds;
        # value 2 keeps the trivial ≤2-partition shuffles on the cheap
        # unsorted path. At cluster scale this is a no-op for any shuffle
        # with > 200 reducers (they already sort) and removes the same
        # small-R file explosion for AQE-coalesced short shuffles.
        .config("spark.shuffle.sort.bypassMergeThreshold", "2")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
