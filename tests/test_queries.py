"""Query-level kernel pins that don't fit the oracle harness: cross-form
row identity (a fast kernel vs the reference relational form) and the
plan shapes those kernels rely on."""

from __future__ import annotations

import re

from conftest import SF_ORACLE

from pyspark.sql import functions as F


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestQ11FixedPointKernel:
    def test_fp_sum_equals_decimal_sum_per_part(self, spark):
        """The int64 fixed-point revenue kernel (_rev_fp_sum) is EXACTLY
        the decimal sum on every part — same casts fix the rounding, the
        multiply-accumulate is exact integers (q11 NOTE: sf10 3.19→1.88 s)."""
        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.queries import _rev_expr, _rev_fp_sum

        li = load_table(spark, SF_ORACLE, "lineitem")
        dec = li.groupBy("l_partkey").agg(F.sum(_rev_expr()).alias("v_dec"))
        fp = li.groupBy("l_partkey").agg(_rev_fp_sum().alias("v_fp"))
        joined = dec.join(fp, "l_partkey")
        assert joined.count() == dec.count() == fp.count()
        bad = joined.filter(
            F.col("v_dec").cast("decimal(38,4)") != F.col("v_fp")
        ).count()
        assert bad == 0, f"{bad} parts diverge between decimal and fixed-point sums"

    def test_q1_two_level_fp_equals_decimal_form(self, spark):
        """q1's two-level fixed-point aggregate (long partials per (group,
        partition) merged with decimal sums — safe at any scale and any
        group cardinality) must be bit-identical to the single-level
        decimal aggregate it replaced, including the derived avgs."""
        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.queries import QUERIES, _dec, _rev_expr

        got = {tuple(r) for r in QUERIES["q1_pricing_summary"](spark, SF_ORACLE).collect()}

        li = load_table(spark, SF_ORACLE, "lineitem")
        rev = _rev_expr()
        charge = rev * (F.lit(1).cast("decimal(3,2)") + _dec("l_tax", 5, 2))
        ref = (
            li.filter(F.col("l_shipdate") <= F.lit("2001-09-01 00:00:00").cast("timestamp_ntz"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
                F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
                F.sum(rev).cast("double").alias("sum_disc_price"),
                F.sum(charge).cast("double").alias("sum_charge"),
                F.count(F.lit(1)).alias("count_order"),
            )
            .select(
                "l_returnflag",
                "l_linestatus",
                "sum_qty",
                "sum_base_price",
                "sum_disc_price",
                "sum_charge",
                (F.col("sum_qty") / F.col("count_order")).alias("avg_qty"),
                (F.col("sum_base_price") / F.col("count_order")).alias("avg_price"),
                "count_order",
            )
        )
        want = {tuple(r) for r in ref.collect()}
        assert got == want and got

    def test_q11_returns_rows_and_single_scan(self, spark):
        """The r9 threshold fix (1.5× mean part value) must keep the gate
        non-vacuous — the original total·0.001 filter returned 0 rows at
        every SF, so hash-matching proved nothing — and the lineage-cut
        single-derivation shape must hold (one lineitem scan, total by
        broadcast, no sort-merge join)."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        df = QUERIES["q11_important_parts"](spark, SF_ORACLE)
        assert df.count() > 0, "threshold must select at least one part"
        p = plan_of(df)
        assert len(re.findall(r"FileScan parquet", p)) <= 1
        assert "SortMergeJoin" not in p
        assert "BroadcastNestedLoopJoin" in p or "BroadcastExchange" in p


class TestRowsOnlyEntriesEvidence:
    """The registry's 2 oracle-less entries (engine-specific by design)
    carry their correctness evidence HERE; tools/parity_artifact.py links
    these node ids into PARITY_r{N}.json so the rows-only verdicts are
    auditable instead of bare smokes (r9 verdict item 4)."""

    def test_hll_estimate_tracks_exact_count_within_sketch_error(self, spark):
        """approx_distinct_users_hll returns BOTH the HLL-sketch estimate
        and the exact distinct count per event_type: the estimate must sit
        within the sketch's published relative-error envelope (lgK=12 ⇒
        σ≈1.6%; 5σ bound at these cardinalities) and be positive for every
        non-empty group — the property an engine-specific sketch CAN
        guarantee, where a value-hash against another engine's sketch
        could not."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        rows = QUERIES["approx_distinct_users_hll"](spark, SF_ORACLE).collect()
        assert rows, "grouped sketch returned no groups"
        for r in rows:
            exact = r["exact_users"]
            assert exact > 0
            rel_err = abs(r["approx_users"] - exact) / exact
            assert rel_err <= 0.08, (r["event_type"], r["approx_users"], exact)

    def test_mixed_perceptron_entry_matches_library_path(self, spark):
        """quality_classifier_mixed_scores is the registered face of
        text.train_token_perceptron_mixed, whose determinism (identical
        weights across partitionings) and accuracy (beats the centroid
        baseline) are pinned by
        tests/test_operators.py::TestMixedPerceptron — here the REGISTERED
        composition itself must produce scored rows for every document
        with the holdout accuracy the perceptron tests establish."""
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.queries import QUERIES

        df = QUERIES["quality_classifier_mixed_scores"](spark, SF_ORACLE)
        n_docs = load_table(spark, SF_ORACLE, "documents").count()
        rows = df.collect()
        assert len(rows) == n_docs  # one score per document, none dropped
        acc = sum(1 for r in rows if r["pred"] == r["label"]) / len(rows)
        assert acc >= 0.85, acc


class TestFastCents:
    """The r10 fast cents extraction ((x·100+0.5)::long) must be
    bit-identical to the decimal(prec,2)-cast reference ON ITS CONTRACT
    (2-decimal non-negative money) and is EXPECTED to diverge outside it
    — both directions pinned so the contract stays honest."""

    def test_equals_decimal_cast_on_two_decimal_grid(self, spark):
        """Exhaustive-by-construction: every k/100 double over a dense
        grid (all cent values to $100, coarse strides to $10M, plus the
        percentage domain) must extract to exactly k under both forms."""
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.queries import _fp_cents, _fp_cents_decimal

        ks = list(range(0, 10_001)) + list(range(10_001, 1_000_000_000, 37_337))
        df = spark.createDataFrame([(k, k / 100.0) for k in ks], "k bigint, v double")
        bad = df.select(
            "k",
            _fp_cents("v").alias("fast"),
            _fp_cents_decimal("v").alias("ref"),
        ).filter((F.col("fast") != F.col("ref")) | (F.col("fast") != F.col("k")))
        assert bad.count() == 0, bad.limit(5).collect()

    def test_corpus_columns_identical_at_oracle_sf(self, spark):
        """All four lineitem money columns: zero fast-vs-reference
        mismatches at the oracle SF (the sf10 sweep measured the same
        zero over 59M rows; this keeps the pin in the suite)."""
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.queries import _fp_cents, _fp_cents_decimal

        li = load_table(spark, SF_ORACLE, "lineitem")
        row = li.select(
            *[
                F.sum((_fp_cents(c) != _fp_cents_decimal(c)).cast("long")).alias(c)
                for c in ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
            ]
        ).collect()[0]
        assert all(v == 0 for v in row.asDict().values()), row.asDict()

    def test_q18_fp_sum_equals_decimal_form(self, spark):
        """q18's kernelized per-order quantity sum (r10 second sitting)
        must reproduce the decimal-sum form exactly — rescale, HAVING cut
        and double cast included."""
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.queries import QUERIES, _dec

        li = load_table(spark, SF_ORACLE, "lineitem")
        ref = sorted(
            map(
                tuple,
                li.groupBy("l_orderkey")
                .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
                .filter(F.col("qty_dec") > 300)
                .select("l_orderkey", F.col("qty_dec").cast("double"))
                .collect(),
            )
        )
        got = sorted(
            map(
                tuple,
                QUERIES["q18_large_quantity_orders"](spark, SF_ORACLE)
                .select("o_orderkey", "total_qty")
                .collect(),
            )
        )
        assert got == ref

    def test_diverges_outside_contract_as_documented(self, spark):
        """The docstring's two counterexamples must actually diverge —
        if they ever stop diverging, the contract text is stale."""
        from filebeat_to_clickhouse_spark.queries import _fp_cents, _fp_cents_decimal

        df = spark.createDataFrame([(1.005,), (-1.23,)], "v double")
        rows = df.select(
            _fp_cents("v").alias("fast"), _fp_cents_decimal("v").alias("ref")
        ).collect()
        assert (rows[0]["fast"], rows[0]["ref"]) == (100, 101)  # 3-decimal input
        assert (rows[1]["fast"], rows[1]["ref"]) == (-122, -123)  # negative
