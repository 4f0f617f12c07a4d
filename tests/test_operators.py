"""Unit tests for relational operators and multimodal plumbing beyond the
oracle harness: salted join equivalence, as-of edge cases, frame/resize
fanout shapes."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


class TestSaltedJoin:
    def test_row_identical_to_plain_join(self, spark):
        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.operators import salted_join

        ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
            "event_id", (F.col("user_id") % 5).alias("k"), "value"
        )
        dim = spark.createDataFrame(
            [(i, f"grp{i % 2}") for i in range(5)], "k bigint, grp string"
        )
        plain = ev.join(dim, "k").select("event_id", "k", "grp")
        salted = salted_join(ev, dim, "k", n_salt=8).select("event_id", "k", "grp")
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0

    def test_salt_join_carries_both_keys(self, spark):
        from filebeat_to_clickhouse_spark.operators import salted_join

        l = spark.createDataFrame([(1, "a"), (1, "b")], "k bigint, v string")
        r = spark.createDataFrame([(1, "x")], "k bigint, w string")
        plan = salted_join(l, r, "k", n_salt=4)._jdf.queryExecution().executedPlan().toString()
        assert "_salt" in plan  # join key includes the salt column


class TestAsofEdges:
    def test_no_prior_right_row_keeps_nulls(self, spark):
        from filebeat_to_clickhouse_spark.operators import asof_join_backward

        left = spark.createDataFrame(
            [(1, "2024-01-01 09:00:00"), (1, "2024-01-01 12:00:00")],
            "k bigint, lts string",
        ).select("k", F.col("lts").cast("timestamp_ntz").alias("lts"))
        right = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", 77)], "k bigint, rts string, rid bigint"
        ).select("k", F.col("rts").cast("timestamp_ntz").alias("rts"), "rid")
        out = {
            r["lts"].hour: r["rid"]
            for r in asof_join_backward(
                left, right, on="k", left_ts="lts", right_ts="rts",
                right_cols=("rid",), right_seq="rid",
            ).collect()
        }
        assert out == {9: None, 12: 77}

    def test_equal_timestamp_is_inclusive_and_tiebreaks_high_seq(self, spark):
        from filebeat_to_clickhouse_spark.operators import asof_join_backward

        left = spark.createDataFrame([(1, "2024-01-01 10:00:00")], "k bigint, lts string").select(
            "k", F.col("lts").cast("timestamp_ntz").alias("lts")
        )
        right = spark.createDataFrame(
            [(1, "2024-01-01 10:00:00", 5), (1, "2024-01-01 10:00:00", 9)],
            "k bigint, rts string, rid bigint",
        ).select("k", F.col("rts").cast("timestamp_ntz").alias("rts"), "rid")
        (row,) = asof_join_backward(
            left, right, on="k", left_ts="lts", right_ts="rts",
            right_cols=("rid",), right_seq="rid",
        ).collect()
        assert row["rid"] == 9  # >= semantics, highest seq wins ties


class TestMultimodalFanout:
    def test_frame_sample_shape(self, spark):
        from filebeat_to_clickhouse_spark.extensions.multimodal import (
            STUB_FRAME_BYTES,
            frame_sample,
        )

        payload = bytes(range(256)) * 2  # 512 bytes → 16 stub frames
        df = spark.createDataFrame([(1, payload)], "doc_id bigint, payload binary")
        rows = frame_sample(df, every_n=4, fake=True).collect()
        assert [r["frame_idx"] for r in rows] == [0, 4, 8, 12]
        assert all(len(r["frame"]) == STUB_FRAME_BYTES for r in rows)
        assert bytes(rows[1]["frame"]) == payload[4 * 32 : 5 * 32]

    def test_resize_deterministic_output(self, spark):
        from filebeat_to_clickhouse_spark.extensions.multimodal import resize_images

        df = spark.createDataFrame(
            [(1, bytes(range(100))), (2, b"")], "doc_id bigint, payload binary"
        )
        rows = {r["doc_id"]: r for r in resize_images(df, width=4, height=4, fake=True).collect()}
        assert len(rows[1]["resized"]) == 16 and len(rows[2]["resized"]) == 16
        expected = bytes((i * 100) // 16 for i in range(16))
        assert bytes(rows[1]["resized"]) == expected


class TestLshFrequencyCapping:
    def test_oversized_buckets_dropped(self, spark):
        import pyspark.sql.functions as F
        from filebeat_to_clickhouse_spark.extensions.dedup import lsh_candidate_pairs

        # band 0 bucket "hot": 4 docs (6 pairs); band 1 bucket "cold": 2 docs
        rows = [(i, 0, "hot") for i in range(4)] + [(10, 1, "cold"), (11, 1, "cold")]
        buckets = spark.createDataFrame(rows, "doc_id bigint, band int, bucket string")
        uncapped = lsh_candidate_pairs(buckets)
        assert uncapped.count() == 7
        capped = lsh_candidate_pairs(buckets, max_bucket_size=3)
        got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
        assert got == {(10, 11)}  # hot bucket dropped entirely


class TestSaltedJoinModes:
    def test_right_and_full_rejected(self, spark):
        import pytest

        from filebeat_to_clickhouse_spark.operators import salted_join

        l = spark.range(4).withColumnRenamed("id", "k")
        r = spark.range(2).withColumnRenamed("id", "k")
        for how in ("right", "full", "outer", "cross"):
            with pytest.raises(ValueError, match="left-preserving"):
                salted_join(l, r, on="k", how=how)

    def test_left_anti_matches_unsalted(self, spark):
        from filebeat_to_clickhouse_spark.operators import salted_join

        l = spark.range(10).withColumnRenamed("id", "k")
        r = spark.range(4).withColumnRenamed("id", "k")
        got = {row["k"] for row in salted_join(l, r, on="k", how="left_anti").collect()}
        assert got == {4, 5, 6, 7, 8, 9}


class TestConnectedComponents:
    def test_chain_star_and_isolated(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import connected_components

        # chain 1-2-3-4 (worst-case diameter), star 10-{11,12,13}, pair 20-21
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
            "doc_a bigint, doc_b bigint",
        )
        got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10, 20: 20, 21: 20}

    def test_min_label_regardless_of_edge_direction(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import connected_components

        # labels must flow against the (doc_a < doc_b) pair orientation too
        edges = spark.createDataFrame([(5, 9), (1, 9)], "doc_a bigint, doc_b bigint")
        got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
        assert got == {1: 1, 5: 1, 9: 1}


class TestSaltedWindowTopk:
    def _skewed(self, spark):
        # one hot key holding 80% of rows + 7 cold keys; (score, uid) is a
        # total order within every key
        return spark.range(5000).select(
            F.when(F.col("id") < 4000, F.lit("hot"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
            .alias("key"),
            F.pmod(F.xxhash64(F.col("id")), F.lit(997)).alias("score"),
            F.col("id").alias("uid"),
        )

    def test_row_identical_to_plain_window_on_skewed_fixture(self, spark):
        from pyspark.sql import Window

        from filebeat_to_clickhouse_spark.operators import salted_window_topk

        rows = self._skewed(spark)
        got = salted_window_topk(
            rows, ("key",), (F.desc("score"), "uid"), k=5, n_salt=16
        ).collect()
        w = Window.partitionBy("key").orderBy(F.desc("score"), "uid")
        want = (
            rows.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5)
            .collect()
        )
        assert sorted(map(tuple, got)) == sorted(map(tuple, want))
        assert len(want) == 8 * 5  # every key produced exactly k rows

    def test_two_stage_plan_shape(self, spark):
        """Phase 1 windows over (key, _salt), phase 2 over key alone — the
        hot key is spread across n_salt tasks before any single-task merge
        (which then sees at most k × n_salt rows per key)."""
        from filebeat_to_clickhouse_spark.operators import salted_window_topk

        out = salted_window_topk(
            self._skewed(spark), ("key",), (F.desc("score"), "uid"), k=5
        )
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("Window [") == 2
        # the tree prints root-first: the OUTER (final, key-only) window
        # line comes before the inner salted partial window
        final_window, salt_window = (
            ln for ln in plan.splitlines() if "Window [" in ln
        )
        assert "_salt" in salt_window and "_salt" not in final_window

    def test_reserved_column_collision_raises(self, spark):
        """An input already carrying _salt/_lr must raise, not get its
        column silently overwritten and dropped (r3 advice)."""
        import pytest

        from filebeat_to_clickhouse_spark.operators import salted_join, salted_window_topk

        rows = self._skewed(spark).withColumn("_salt", F.lit(1))
        with pytest.raises(ValueError, match="_salt"):
            salted_window_topk(rows, ("key",), (F.desc("score"), "uid"), k=5)
        with pytest.raises(ValueError, match="_salt"):
            salted_join(rows, rows.select("key"), on="key")

    def test_salt_cols_subset_row_identical(self, spark):
        """Salting only key+order columns must stay row-identical to the
        whole-row salt — and keeps placement stable when unrelated columns
        are added."""
        from filebeat_to_clickhouse_spark.operators import salted_window_topk

        rows = self._skewed(spark)
        whole = salted_window_topk(
            rows, ("key",), (F.desc("score"), "uid"), k=5
        ).collect()
        scoped = salted_window_topk(
            rows, ("key",), (F.desc("score"), "uid"), k=5,
            salt_cols=("key", "score", "uid"),
        ).collect()
        assert sorted(map(tuple, whole)) == sorted(map(tuple, scoped))


class TestPiiRedaction:
    def test_counts_and_tokens(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import redact_pii

        rows = [
            (1, "mail me at a.b+c@ex-ample.org or b@x.io thanks"),
            (2, "server 10.0.0.7 and 192.168.1.255 up"),
            (3, "call +1-555-0142-99 now"),
            (4, "no pii here at all"),
            (5, ""),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r for r in redact_pii(docs).collect()}
        assert got[1]["n_email"] == 2 and got[1]["redacted"] == (
            "mail me at <EMAIL> or <EMAIL> thanks"
        )
        assert got[2]["n_ipv4"] == 2 and got[2]["redacted"] == (
            "server <IPV4> and <IPV4> up"
        )
        assert got[3]["n_phone"] == 1 and got[3]["redacted"] == "call <PHONE> now"
        assert got[4]["redacted"] == "no pii here at all"
        assert all(got[4][f"n_{k}"] == 0 for k in ("email", "ipv4", "phone"))
        assert got[5]["redacted"] == ""

    def test_zero_shuffle_plan(self, spark):
        """Redaction is a pure map — no exchange may appear in its plan."""
        from filebeat_to_clickhouse_spark.extensions.text import redact_pii

        docs = spark.createDataFrame([(1, "x@y.zz")], "doc_id long, text string")
        plan = redact_pii(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestRowwiseMinhash:
    def test_equals_groupby_form_and_no_exchange(self, spark):
        """The zero-shuffle row-wise minhash must produce byte-identical
        signatures to the exploded groupBy form, and its plan may not
        contain an Exchange."""
        from filebeat_to_clickhouse_spark.extensions.dedup import (
            minhash_signatures,
            rowwise_minhash,
            word_shingles,
        )
        from filebeat_to_clickhouse_spark.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        a = {tuple(r) for r in minhash_signatures(word_shingles(docs)).collect()}
        b = {tuple(r) for r in rowwise_minhash(docs).collect()}
        assert a == b and a
        plan = rowwise_minhash(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestIncrementalNeardup:
    def _sigs(self, spark, rows):
        from filebeat_to_clickhouse_spark.extensions.dedup import minhash_signature_store

        return minhash_signature_store(
            spark.createDataFrame(rows, "doc_id long, text string")
        )

    def test_planted_neardup_found_exact_miss(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import incremental_neardup

        base = "the quick brown fox jumps over the lazy dog again and again today"
        store = self._sigs(
            spark,
            [(1, base), (2, "completely different words about spark shuffles here")],
        )
        batch = self._sigs(
            spark,
            [
                (10, base + " extra"),  # near-dup of store doc 1
                (11, "nothing like anything stored before in any way at all"),
            ],
        )
        got = incremental_neardup(batch, store, min_agree=6).collect()
        assert [(r["batch_doc"], r["store_doc"]) for r in got] == [(10, 1)]
        assert got[0]["n_agree"] >= 6 and got[0]["est_jaccard"] >= 0.5

    def test_broadcast_flag_row_identical(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import incremental_neardup

        store = self._sigs(spark, [(i, f"shared text body number {i % 3} repeated") for i in range(9)])
        batch = self._sigs(spark, [(100 + i, f"shared text body number {i} repeated") for i in range(3)])
        a = {tuple(r) for r in incremental_neardup(batch, store, broadcast_batch=True).collect()}
        b = {tuple(r) for r in incremental_neardup(batch, store, broadcast_batch=False).collect()}
        assert a == b and a  # same matches either strategy, and non-empty


class TestTemperatureRebalance:
    def test_flattens_toward_sqrt_and_keeps_smallest_whole(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import temperature_rebalance

        # strata 6400 / 1600 / 100 docs → rates sqrt(100/n): 0.125 / 0.25 / 1.0
        docs = spark.range(8100).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 6400, F.lit("en"))
            .when(F.col("id") < 8000, F.lit("zh"))
            .otherwise(F.lit("tail"))
            .alias("lang"),
        )
        out = temperature_rebalance(docs)
        sizes = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert sizes["tail"] == 100  # smallest stratum kept whole (rate 1.0)
        # md5 buckets are uniform: keep-counts land near rate × n
        assert abs(sizes["en"] - 800) < 120    # 6400 × 0.125
        assert abs(sizes["zh"] - 400) < 90     # 1600 × 0.25
        # deterministic: same input → same keep-set
        again = {r["doc_id"] for r in temperature_rebalance(docs).select("doc_id").collect()}
        assert again == {r["doc_id"] for r in out.select("doc_id").collect()}

    def test_corpus_never_shuffles(self, spark):
        """The rate table broadcasts; the only exchanges in the plan feed
        the (tiny) stratum-count aggregation, never the corpus join side."""
        from filebeat_to_clickhouse_spark.extensions.text import temperature_rebalance

        docs = spark.range(100).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("l"), (F.col("id") % 3).cast("string")).alias("lang"),
        )
        plan = temperature_rebalance(docs)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan

    def test_null_stratum_is_its_own_stratum_not_dropped(self, spark):
        """Docs with a missing lang tag must be rebalanced as one stratum
        of their own, not silently lost to the rate join (r3 advice)."""
        from filebeat_to_clickhouse_spark.extensions.text import temperature_rebalance

        docs = spark.range(300).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 200, F.lit("en"))
            .when(F.col("id") < 290, F.lit(None).cast("string"))
            .otherwise(F.lit("tail"))
            .alias("lang"),
        )
        out = temperature_rebalance(docs)
        sizes = {
            r["lang"]: r["n"]
            for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert sizes.get("tail") == 10  # smallest kept whole
        # NULL stratum present and downsampled like any other: 90 docs at
        # rate sqrt(10/90) ≈ 0.333 → ~30 kept
        assert None in sizes and 12 <= sizes[None] <= 50, sizes


class TestStratifiedSampleRounding:
    def test_rate_with_float_repr_error_rounds_not_truncates(self, spark):
        """0.29 × 1000 is 289.999… in binary; the permille threshold must
        round to 290, not truncate to 289 (r2 advice). Expected keep-set
        computed independently with hashlib over the same md5-mod-1000."""
        import hashlib

        from filebeat_to_clickhouse_spark.extensions.text import stratified_hash_sample

        docs = spark.range(500).select(
            F.col("id").alias("doc_id"), F.lit("en").alias("lang")
        )
        got = {
            r["doc_id"]
            for r in stratified_hash_sample(docs, rates={"en": 0.29}).collect()
        }
        want = {
            i
            for i in range(500)
            if int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 1000 < 290
        }
        assert got == want


class TestRangeJoinBanded:
    def test_matches_theta_join_exactly(self, spark):
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.operators import range_join_banded

        pts = spark.range(0, 200).select(F.col("id").alias("p"))
        iv = spark.createDataFrame(
            # spans 0, 1, and 3 bands at width 50; includes touching bounds
            [(0, 10, 10), (1, 49, 51), (2, 0, 149), (3, 180, 180), (4, 300, 310)],
            "iv_id bigint, lo bigint, hi bigint",
        )
        got = {
            (r["iv_id"], r["p"])
            for r in range_join_banded(pts, iv, "p", "lo", "hi", band_width=50).collect()
        }
        want = {
            (r["iv_id"], r["p"])
            for r in pts.join(iv, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))).collect()
        }
        assert got == want
        assert (4, 199) not in got  # interval beyond the point domain matches nothing

    def test_no_nested_loop_join_in_plan(self, spark):
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.operators import range_join_banded

        pts = spark.range(0, 10).select(F.col("id").alias("p"))
        iv = spark.createDataFrame([(1, 2, 5)], "iv_id bigint, lo bigint, hi bigint")
        plan = range_join_banded(pts, iv, "p", "lo", "hi", band_width=4)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestSequencePacking:
    def test_greedy_boundaries_and_oversize(self, spark):
        from filebeat_to_clickhouse_spark.extensions.packing import pack_sequences

        # one bucket; budget 10: [4,6] fills pack 0 exactly, 7 starts pack 1,
        # 25 (oversize) gets pack 2 alone, 1 starts pack 3
        rows = [(0, 4), (1, 6), (2, 7), (3, 25), (4, 1)]
        docs = spark.createDataFrame(rows, "doc_id bigint, n_tokens bigint")
        out = {
            r["doc_id"]: (r["pack_id"], r["seq_in_pack"])
            for r in pack_sequences(docs, budget=10, n_buckets=1).collect()
        }
        assert out == {0: (0, 1), 1: (0, 2), 2: (1, 1), 3: (2, 1), 4: (3, 1)}

    def test_buckets_pack_independently(self, spark):
        from filebeat_to_clickhouse_spark.extensions.packing import pack_sequences

        docs = spark.createDataFrame([(i, 5) for i in range(8)], "doc_id bigint, n_tokens bigint")
        out = pack_sequences(docs, budget=10, n_buckets=4).collect()
        # bucket = id % 4 → two docs per bucket, both fit in pack 0
        assert all(r["bucket"] == r["doc_id"] % 4 for r in out)
        assert all(r["pack_id"] == 0 for r in out)
        assert sorted(r["seq_in_pack"] for r in out) == [1, 1, 1, 1, 2, 2, 2, 2]


class TestChunkDedup:
    def test_boilerplate_dropped_first_kept(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import chunk_dedup_docs

        # 4-word chunks; "a b c d" is shared boilerplate, doc 2 also repeats
        # its own chunk "x x x x" twice.
        docs = spark.createDataFrame(
            [
                (1, "a b c d e f"),
                (2, "x x x x a b c d x x x x"),
                (3, "p q r s"),
            ],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in chunk_dedup_docs(docs, chunk_words=4).collect()}
        # doc 1 owns the first occurrence of "a b c d" (pos 1e6+0 < 2e6+1)
        assert out[1]["clean_text"] == "a b c d e f"
        assert (out[1]["n_chunks"], out[1]["n_kept"]) == (2, 2)
        # doc 2 loses the boilerplate AND its own second "x x x x"
        assert out[2]["clean_text"] == "x x x x"
        assert (out[2]["n_chunks"], out[2]["n_kept"]) == (3, 1)
        assert out[3]["clean_text"] == "p q r s"

    def test_all_dropped_doc_survives_empty(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import chunk_dedup_docs

        docs = spark.createDataFrame(
            [(1, "a b c d"), (2, "a b c d")], "doc_id bigint, text string"
        )
        out = {r["doc_id"]: r for r in chunk_dedup_docs(docs, chunk_words=4).collect()}
        assert out[2]["clean_text"] == "" and out[2]["n_kept"] == 0
        assert out[1]["clean_text"] == "a b c d"

    def test_trailing_partial_chunk(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import chunk_occurrences

        docs = spark.createDataFrame([(1, "a b c d e")], "doc_id bigint, text string")
        got = {(r["idx"], r["chunk"]) for r in chunk_occurrences(docs, chunk_words=2).collect()}
        assert got == {(0, "a b"), (1, "c d"), (2, "e")}


class TestWeightedBernoulliSample:
    def test_weight_zero_never_kept_and_cap(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import weighted_bernoulli_sample

        docs = spark.createDataFrame(
            [(i, 0 if i < 50 else 10) for i in range(100)], "doc_id bigint, w int"
        )
        out = weighted_bernoulli_sample(docs, target_rows=1000, weight_col="w").collect()
        # zero-weight rows can never be sampled; all positive-weight rows
        # saturate at ppm=1e6 (1000 targets × uniform weight ≫ population)
        ids = {r["doc_id"] for r in out}
        assert ids == set(range(50, 100))
        assert all(r["keep_ppm"] == 1000000 for r in out)

    def test_expected_size_tracks_target(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import weighted_bernoulli_sample
        from filebeat_to_clickhouse_spark.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.01", "documents")
        n = weighted_bernoulli_sample(docs, target_rows=150).count()
        assert 100 <= n <= 200  # binomial around 150, sd ≈ 11

    def test_corpus_not_shuffled(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import weighted_bernoulli_sample
        from filebeat_to_clickhouse_spark.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        plan = (
            weighted_bernoulli_sample(docs, target_rows=50)
            ._jdf.queryExecution().executedPlan().toString()
        )
        # the only exchange feeds the 1-row total aggregate; the corpus
        # side is scan → broadcast-join → filter
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestC4RuleFlags:
    def test_each_rule_fires(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import c4_rule_flags

        docs = spark.createDataFrame(
            [
                (1, "short doc"),                                   # too short
                (2, " ".join(["word"] * 30)),                       # dup chunks (all same)
                (3, " ".join(["lorem"] + ["fine"] * 25)),           # bad word
                (4, " ".join(["a"] * 30)),                          # mean word len < 2
                (5, " ".join(f"w{i}" for i in range(30))),          # clean
            ],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in c4_rule_flags(docs, chunk_words=10).collect()}
        assert out[1]["f_too_short"] and not out[1]["keep"]
        assert out[2]["f_dup_chunk"] and not out[2]["keep"]
        assert out[3]["f_bad_word"] and not out[3]["keep"]
        assert out[4]["f_word_len"] and not out[4]["keep"]
        assert out[5]["keep"] and not any(
            out[5][c] for c in ("f_too_short", "f_too_long", "f_word_len", "f_bad_word", "f_dup_chunk")
        )

    def test_zero_shuffle_plan(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import c4_rule_flags
        from filebeat_to_clickhouse_spark.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        plan = c4_rule_flags(docs)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestLmBigramPredictability:
    def test_scores_and_edge_docs(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import lm_bigram_predictability

        # corpus: "a b" appears twice, "a c" once → P(b|a)=2/3, P(c|a)=1/3
        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in lm_bigram_predictability(docs).collect()}
        assert out[1]["avg_cond_ppm"] == 666666  # floor(1e6*2/3)
        assert out[3]["avg_cond_ppm"] == 333333
        assert out[4]["n_bigrams"] == 0 and out[4]["avg_cond_ppm"] is None

    def test_min_count_prunes_to_smoothing_floor(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import lm_bigram_predictability

        docs = spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "x y")], "doc_id bigint, text string"
        )
        out = {r["doc_id"]: r for r in lm_bigram_predictability(docs, min_count=2).collect()}
        # "x y" pruned from the model → scores the 0-ppm smoothing floor
        assert out[3]["avg_cond_ppm"] == 0
        assert out[1]["avg_cond_ppm"] == 1000000  # only surviving bigram: P=2/2

    def test_model_broadcast_no_corpus_shuffle_join(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import lm_bigram_predictability
        from filebeat_to_clickhouse_spark.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        plan = (
            lm_bigram_predictability(docs)._jdf.queryExecution().executedPlan().toString()
        )
        # scoring joins are broadcast; no sort-merge join on token keys
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestLeakfreeSplit:
    def test_clusters_never_straddle_sides(self, spark):
        from filebeat_to_clickhouse_spark.queries import QUERIES

        out = QUERIES["leakfree_cluster_split"](spark, "/root/testdata/sf0.001").toPandas()
        sides_per_cluster = out.groupby("cluster_id")["side"].nunique()
        assert (sides_per_cluster == 1).all()
        # the split actually splits (both sides populated)
        assert set(out["side"].unique()) == {"train", "val"}
        # multi-member clusters exist in the testdata, so the guarantee is
        # exercised, not vacuous
        assert (out.groupby("cluster_id").size() > 1).any()


class TestDuplicatedSpanStats:
    def test_cross_doc_and_self_repeats_counted(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import duplicated_span_stats

        docs = spark.createDataFrame(
            [
                (1, "a b c d e x1 x2 x3 x4 x5"),   # shares "a b c d e" with doc 2
                (2, "a b c d e y1 y2 y3 y4 y5"),
                (3, "r r r r r r"),                 # self-repeating gram
                (4, "u1 u2 u3 u4 u5 u6"),           # all unique
                (5, "tiny doc"),                    # shorter than n → 0 grams
            ],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in duplicated_span_stats(docs, n=5).collect()}
        # docs 1/2: 6 positions each, exactly position 0 ("a b c d e") duplicated
        assert (out[1]["n_grams"], out[1]["n_dup"]) == (6, 1)
        assert (out[2]["n_grams"], out[2]["n_dup"]) == (6, 1)
        # doc 3: both positions carry the same gram → both are repeats
        assert (out[3]["n_grams"], out[3]["n_dup"]) == (2, 2)
        assert out[3]["dup_frac"] == 1.0
        assert (out[4]["n_grams"], out[4]["n_dup"]) == (2, 0)
        assert out[4]["dup_frac"] == 0.0
        assert (out[5]["n_grams"], out[5]["n_dup"]) == (0, 0)
        assert out[5]["dup_frac"] is None


class TestRemoveDuplicatedSpans:
    def test_second_occurrence_removed_any_offset(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import remove_duplicated_spans

        docs = spark.createDataFrame(
            [
                (1, "a b c d e t1 t2 t3 t4 t5"),
                # same 5-gram at a DIFFERENT offset (chunk dedup would miss it)
                (2, "z9 a b c d e u1 u2 u3 u4"),
                (3, "v1 v2 v3 v4 v5 v6"),
            ],
            "doc_id bigint, text string",
        )
        out = {r["doc_id"]: r for r in remove_duplicated_spans(docs, n=5).collect()}
        assert out[1]["clean_text"] == "a b c d e t1 t2 t3 t4 t5"
        assert out[1]["n_removed"] == 0
        # doc 2 loses exactly the 5 covered words, keeps both flanks
        assert out[2]["clean_text"] == "z9 u1 u2 u3 u4"
        assert (out[2]["n_words"], out[2]["n_removed"]) == (10, 5)
        assert out[3]["n_removed"] == 0

    def test_self_repeat_keeps_first_span(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import remove_duplicated_spans

        docs = spark.createDataFrame(
            [(1, "a b c d e a b c d e")], "doc_id bigint, text string"
        )
        out = remove_duplicated_spans(docs, n=5).collect()[0]
        assert out["clean_text"] == "a b c d e"
        assert (out["n_words"], out["n_removed"]) == (10, 5)


class TestBpeTrainMerges:
    def test_classic_merge_sequence(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import bpe_train_merges

        # vocab: "aaab" (freq 2), "ab" (freq 1)
        # round 1: (a,a)=4 beats (a,b)=3 → merge "aa"
        # round 2: (a,b)=3 beats (aa,a)=2 → merge "ab"
        # round 3: (aa,ab)=2 → merge "aaab"; round 4: no pairs left
        docs = spark.createDataFrame(
            [(1, "aaab aaab ab")], "doc_id bigint, text string"
        )
        rows = {r["rank"]: r for r in bpe_train_merges(docs, n_merges=4).collect()}
        assert (rows[1]["merge_left"], rows[1]["merge_right"], rows[1]["pair_count"]) == ("a", "a", 4)
        assert (rows[2]["merge_left"], rows[2]["merge_right"], rows[2]["pair_count"]) == ("a", "b", 3)
        assert (rows[3]["merge_left"], rows[3]["merge_right"], rows[3]["pair_count"]) == ("aa", "ab", 2)
        assert 4 not in rows  # vocabulary fully merged: no rank-4 pair exists

    def test_tie_breaks_lexicographic(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import bpe_train_merges

        docs = spark.createDataFrame([(1, "xy ab")], "doc_id bigint, text string")
        first = {r["rank"]: r for r in bpe_train_merges(docs, n_merges=1).collect()}[1]
        # (a,b) and (x,y) both count 1 → lexicographically smaller pair wins
        assert (first["merge_left"], first["merge_right"]) == ("a", "b")


class TestBpeTokenCounts:
    def test_counts_shrink_with_merges(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import bpe_token_counts

        docs = spark.createDataFrame([(1, "aaab aaab ab")], "doc_id bigint, text string")
        # 2 merges (aa, ab): aaab→[aa,ab], ab→[ab] → 2+2+1
        two = bpe_token_counts(docs, n_merges=2).collect()[0]
        assert (two["n_words"], two["n_tokens_bpe"]) == (3, 5)
        # 3rd merge (aa+ab→aaab) collapses each aaab to one token → 1+1+1
        three = bpe_token_counts(docs, n_merges=3).collect()[0]
        assert three["n_tokens_bpe"] == 3
        # a 4th round has no pairs left: the sentinel no-op keeps the
        # vocabulary intact instead of annihilating it
        four = bpe_token_counts(docs, n_merges=4).collect()[0]
        assert four["n_tokens_bpe"] == 3


class TestTokenCentroidClassifier:
    def test_learns_a_planted_lexical_concept(self, spark):
        """Distillation sanity on a fully separable corpus: positives are
        stopword-heavy, negatives stopword-free — the trained direction
        must classify held-out docs of both kinds correctly."""
        from filebeat_to_clickhouse_spark.extensions.text import (
            hashed_token_features,
            score_token_linear,
            stopword_ratio_label,
            train_token_centroid,
        )
        import pyspark.sql.functions as F

        pos = [(i, "the of and to data " * 5) for i in range(20)]
        neg = [(i + 100, "alpha beta gamma delta epsilon " * 5) for i in range(20)]
        docs = spark.createDataFrame(pos + neg, "doc_id bigint, text string")
        labels = stopword_ratio_label(docs)
        # sanity: the rule labels the two halves oppositely
        got = {r["doc_id"]: r["y"] for r in labels.collect()}
        assert got[0] == 1 and got[100] == -1

        train = docs.filter(F.col("doc_id") % 2 == 0)
        w = train_token_centroid(
            hashed_token_features(train), stopword_ratio_label(train)
        )
        held = docs.filter(F.col("doc_id") % 2 == 1)
        scored = score_token_linear(hashed_token_features(held), w)
        acc = (
            scored.join(stopword_ratio_label(held), "doc_id")
            .select(F.avg((F.col("pred") == F.col("y")).cast("int")).alias("acc"))
            .collect()[0]["acc"]
        )
        assert acc == 1.0

    def test_real_corpus_beats_chance_on_holdout(self, spark):
        """The registered query's exact composition at sf0.001: accuracy of
        the distilled model on never-trained docs must clearly beat the
        0.5 coin — the 'it actually learns' gate."""
        from filebeat_to_clickhouse_spark.extensions.text import (
            hash_split,
            hashed_token_features,
            score_token_linear,
            stopword_ratio_label,
            train_token_centroid,
        )
        from filebeat_to_clickhouse_spark.io import load_table
        import pyspark.sql.functions as F

        docs = hash_split(load_table(spark, "/root/testdata/sf0.001", "documents"))
        labels = stopword_ratio_label(docs)
        feats = hashed_token_features(docs)
        train_ids = docs.filter(F.col("split") == "train").select("doc_id")
        w = train_token_centroid(
            feats.join(train_ids, "doc_id", "semi"),
            labels.join(train_ids, "doc_id", "semi"),
        )
        held = docs.filter(F.col("split") != "train").select("doc_id")
        acc = (
            score_token_linear(feats.join(held, "doc_id", "semi"), w)
            .join(labels, "doc_id")
            .select(F.avg((F.col("pred") == F.col("y")).cast("int")).alias("acc"))
            .collect()[0]["acc"]
        )
        assert acc >= 0.75, acc

    def test_single_class_input_degenerates_gracefully(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import (
            hashed_token_features,
            score_token_linear,
            train_token_centroid,
        )

        docs = spark.createDataFrame(
            [(1, "the of and"), (2, "the to in")], "doc_id bigint, text string"
        )
        labels = spark.createDataFrame([(1, 1), (2, 1)], "doc_id bigint, y bigint")
        w = train_token_centroid(hashed_token_features(docs), labels)
        out = score_token_linear(hashed_token_features(docs), w).collect()
        assert len(out) == 2  # one-sided direction, no division error

    def test_weights_broadcast_into_scoring(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import (
            hashed_token_features,
            score_token_linear,
            stopword_ratio_label,
            train_token_centroid,
        )
        from filebeat_to_clickhouse_spark.io import load_table

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        feats = hashed_token_features(docs)
        w = train_token_centroid(feats, stopword_ratio_label(docs))
        plan = (
            score_token_linear(feats, w)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestExactQuantileThreshold:
    def _thr(self, spark, vals, pct, **kw):
        from filebeat_to_clickhouse_spark.operators import exact_quantile_threshold

        df = spark.createDataFrame([(v,) for v in vals], "score bigint")
        rows = exact_quantile_threshold(df, "score", pct, **kw).collect()
        return rows[0]["thr"] if rows else None

    def test_matches_rank_rule_with_negatives_and_ties(self, spark):
        vals = [-70_000_000, -5, -5, 0, 3, 3, 3, 900, 40_000_000, 40_000_000]
        for pct in (10, 25, 40, 50, 90, 100):
            s = sorted(vals)
            want = next(v for i, v in enumerate(s) if (i + 1) * 100 >= pct * len(s))
            assert self._thr(spark, vals, pct) == want, pct

    def test_boundary_crossing_coarse_buckets(self, spark):
        # values straddle many coarse buckets; tiny coarse_bits forces
        # the refine level to matter
        vals = list(range(0, 1000, 7))
        s = sorted(vals)
        want = next(v for i, v in enumerate(s) if (i + 1) * 100 >= 50 * len(s))
        assert self._thr(spark, vals, 50, coarse_bits=3) == want

    def test_empty_input_yields_empty_threshold(self, spark):
        from filebeat_to_clickhouse_spark.operators import exact_quantile_threshold

        df = spark.createDataFrame([], "score bigint")
        assert exact_quantile_threshold(df, "score", 50).collect() == []

    def test_invalid_pct_raises(self, spark):
        import pytest

        with pytest.raises(ValueError, match="pct"):
            self._thr(spark, [1], 0)

    def test_windows_run_over_histograms_not_corpus(self, spark):
        """Both cumulative windows must consume an Aggregate (histogram),
        never the raw scan — the single-partition sort is bounded by the
        value domain, not the corpus."""
        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.operators import exact_quantile_threshold

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        plan = (
            exact_quantile_threshold(docs.select(docs.n_chars.alias("score")), "score", 40)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # each single-partition exchange (the cumulative windows' input)
        # is fed by a HashAggregate histogram, never the raw scan
        lines = plan.splitlines()
        hits = [i for i, l in enumerate(lines) if "Exchange SinglePartition" in l]
        assert len(hits) == 2, plan
        for i in hits:
            assert "HashAggregate" in lines[i + 1], lines[i : i + 2]


class TestMixedPerceptron:
    def _setup(self, spark, sf="/root/testdata/sf0.01"):
        from filebeat_to_clickhouse_spark.extensions.text import (
            hashed_token_features,
            stopword_ratio_label,
        )
        from filebeat_to_clickhouse_spark.io import load_table

        docs = load_table(spark, sf, "documents")
        return hashed_token_features(docs), stopword_ratio_label(docs)

    def test_beats_the_centroid_baseline(self, spark):
        """Iterative parameter mixing must outperform the closed-form
        centroid on the same distillation task (0.94 vs 0.91 measured) —
        the accuracy claim its docstring makes."""
        import pyspark.sql.functions as F
        from filebeat_to_clickhouse_spark.extensions.text import (
            score_token_linear,
            train_token_centroid,
            train_token_perceptron_mixed,
        )

        feats, labels = self._setup(spark)

        def acc(w):
            return (
                score_token_linear(feats, w)
                .join(labels, "doc_id")
                .select(F.avg((F.col("pred") == F.col("y")).cast("int")).alias("a"))
                .collect()[0]["a"]
            )

        a_mixed = acc(train_token_perceptron_mixed(feats, labels, n_rounds=3, n_shards=8))
        a_centroid = acc(train_token_centroid(feats, labels))
        assert a_mixed >= 0.92, a_mixed
        assert a_mixed > a_centroid, (a_mixed, a_centroid)

    def test_deterministic_across_partitionings(self, spark):
        """Content-keyed shards + explicit in-shard order: the trained
        weights must be bit-identical no matter how the input is
        physically partitioned."""
        from filebeat_to_clickhouse_spark.extensions.text import (
            train_token_perceptron_mixed,
        )

        feats, labels = self._setup(spark, "/root/testdata/sf0.001")

        def weights(fdf):
            w = train_token_perceptron_mixed(fdf, labels, n_rounds=2, n_shards=4)
            return {(r["bucket"], r["w"]) for r in w.collect()}

        assert weights(feats.repartition(3)) == weights(feats.repartition(17))


class TestClassifierEdges:
    def test_empty_training_input_yields_usable_zero_model(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import (
            hashed_token_features,
            score_token_linear,
            train_token_centroid,
        )

        empty_docs = spark.createDataFrame([], "doc_id bigint, text string")
        w = train_token_centroid(
            hashed_token_features(empty_docs),
            spark.createDataFrame([], "doc_id bigint, y bigint"),
        )
        docs = spark.createDataFrame([(1, "some words here")], "doc_id bigint, text string")
        [r] = score_token_linear(hashed_token_features(docs), w).collect()
        assert r["score"] == 0 and r["pred"] == -1

    def test_single_token_and_empty_text_docs_score(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import (
            hashed_token_features,
            score_token_linear,
            stopword_ratio_label,
            train_token_centroid,
        )

        docs = spark.createDataFrame(
            [(1, "the the the the"), (2, "x"), (3, "")],
            "doc_id bigint, text string",
        )
        w = train_token_centroid(hashed_token_features(docs), stopword_ratio_label(docs))
        got = {r["doc_id"] for r in score_token_linear(hashed_token_features(docs), w).collect()}
        assert got == {1, 2, 3}  # every doc, including empty text, gets a score


class TestMadOutliers:
    @staticmethod
    def _rank_median(vals):
        """The histogram-cumsum rank rule: smallest v with cum*100 >= 50*n
        (the lower median — no interpolation)."""
        s = sorted(vals)
        n = len(s)
        cum = 0
        seen = {}
        for v in s:
            cum += 1
            if v not in seen and cum * 100 >= 50 * n:
                return v
        return s[-1]

    def test_matches_python_model_grouped(self, spark):
        from filebeat_to_clickhouse_spark.operators import mad_outliers

        rows = [
            ("a", i, v)
            for i, v in enumerate([1, 2, 2, 3, 4, 100])
        ] + [("b", i, v) for i, v in enumerate([10, 11, 12, 13, 50, -40])]
        df = spark.createDataFrame(rows, "grp string, rid bigint, score bigint")
        got = {
            (r["grp"], r["rid"]): (r["med"], r["mad"], r["is_outlier"])
            for r in mad_outliers(df, "score", ("grp",), k=3).collect()
        }
        for grp in ("a", "b"):
            vals = [v for g, _, v in rows if g == grp]
            med = self._rank_median(vals)
            mad = self._rank_median([abs(v - med) for v in vals])
            for g, rid, v in rows:
                if g == grp:
                    assert got[(g, rid)] == (med, mad, abs(v - med) > 3 * mad), (g, rid)

    def test_ungrouped_and_null_value(self, spark):
        from filebeat_to_clickhouse_spark.operators import mad_outliers

        df = spark.createDataFrame(
            [(0, 5), (1, 6), (2, 7), (3, None)], "rid bigint, score bigint"
        )
        got = {r["rid"]: (r["med"], r["mad"], r["is_outlier"]) for r in
               mad_outliers(df, "score").collect()}
        # nulls sort first in the value histogram but never win the rank
        # rule (cum reaches 50% at a real value); flag stays NULL
        assert got[3][2] is None
        assert got[0] == (6, 1, False)

    def test_all_null_group_survives_with_null_flags(self, spark):
        """A group whose values are entirely NULL has no (med, mad) model
        row; the model join back must be a LEFT join so its rows come out
        with NULL med/mad/is_outlier instead of vanishing (r5 advice)."""
        from filebeat_to_clickhouse_spark.operators import mad_outliers

        df = spark.createDataFrame(
            [("a", 0, 5), ("a", 1, 6), ("a", 2, 7), ("z", 3, None), ("z", 4, None)],
            "grp string, rid bigint, score bigint",
        )
        got = {
            r["rid"]: (r["grp"], r["med"], r["mad"], r["is_outlier"])
            for r in mad_outliers(df, "score", ("grp",), k=3).collect()
        }
        assert len(got) == 5
        assert got[3] == ("z", None, None, None)
        assert got[4] == ("z", None, None, None)
        assert got[0] == ("a", 6, 1, False)

        # keyless degenerate twin: an entirely-NULL frame (0-row model)
        allnull = spark.createDataFrame([(0, None), (1, None)], "rid bigint, score bigint")
        rows = {r["rid"]: (r["med"], r["mad"], r["is_outlier"])
                for r in mad_outliers(allnull, "score").collect()}
        assert rows == {0: (None, None, None), 1: (None, None, None)}

    def test_reliable_checkpoint_dir_routes_input_cut(self, spark, tmp_path):
        """With checkpoint_dir set, the fused single-evaluation input cut
        must become a RELIABLE checkpoint (files in the dir) with
        unchanged results — same durability contract as the retrieval
        base scan and the iterative operators (r8 fusion)."""
        import os

        from filebeat_to_clickhouse_spark.operators import mad_outliers

        rows = [("a", i, v) for i, v in enumerate([1, 2, 2, 3, 4, 100])]
        df = spark.createDataFrame(rows, "grp string, rid bigint, score bigint")
        before = sorted(
            map(tuple, mad_outliers(df, "score", ("grp",), k=3).collect())
        )
        ckdir = str(tmp_path / "ck")
        after = sorted(
            map(
                tuple,
                mad_outliers(
                    df, "score", ("grp",), k=3, checkpoint_dir=ckdir
                ).collect(),
            )
        )
        assert after == before
        assert any(
            files for _root, _dirs, files in os.walk(ckdir)
        ), "reliable checkpoint dir must hold the materialized cut"

    def test_weighted_histogram_percentiles_equal_expanded(self, spark):
        """The weight_col form must equal the raw-row form on the expanded
        multiset — the contract mad_outliers' second pass relies on."""
        from filebeat_to_clickhouse_spark.operators import histogram_percentiles

        hist = [("a", 1, 3), ("a", 5, 1), ("b", 2, 2), ("b", 9, 5)]
        raw = [(g, v) for g, v, w in hist for _ in range(w)]
        hdf = spark.createDataFrame(hist, "grp string, val bigint, w bigint")
        rdf = spark.createDataFrame(raw, "grp string, val bigint")
        pw = {
            r["grp"]: (r["n"], r["p50"], r["p90"])
            for r in histogram_percentiles(
                hdf, "val", {"p50": 50, "p90": 90}, ("grp",), weight_col="w"
            ).collect()
        }
        pr = {
            r["grp"]: (r["n"], r["p50"], r["p90"])
            for r in histogram_percentiles(
                rdf, "val", {"p50": 50, "p90": 90}, ("grp",)
            ).collect()
        }
        assert pw == pr


class TestQuarterBitLog:
    def test_matches_python_shift_model_across_boundary(self, spark):
        """quarter_bit_log must equal the Python (x**4).bit_length()/
        mantissa-shift model on both sides of the L=15 branch boundary —
        including the exact powers of two and the boundary values 2^15−1
        and 2^15 where the branch flips (r5 advice pin)."""
        import pyspark.sql.functions as F

        from filebeat_to_clickhouse_spark.operators import quarter_bit_log

        def model(x: int) -> int:
            L = x.bit_length()
            if L <= 15:
                return (x**4).bit_length() - 1
            m = x >> (L - 15)
            return 4 * (L - 15) + (m**4).bit_length() - 1

        vals = [1, 2, 3, 4, 5, 7, 8, 100, 1000]
        vals += [(1 << 15) - 1, 1 << 15, (1 << 15) + 1]          # branch boundary
        vals += [(1 << k) - 1 for k in (16, 20, 31, 40, 62)]     # floor-minus-one risks
        vals += [1 << k for k in (16, 20, 31, 40, 62)]
        vals += [123456789, 987654321987, (1 << 62) + 12345]
        df = spark.createDataFrame([(v,) for v in vals], "x bigint")
        got = {
            r["x"]: r["q"]
            for r in df.select("x", quarter_bit_log(F.col("x")).alias("q")).collect()
        }
        for v in vals:
            assert got[v] == model(v), (v, got[v], model(v))
        # monotone nondecreasing over the sampled domain
        ordered = [got[v] for v in sorted(set(vals))]
        assert ordered == sorted(ordered)


class TestRealCodecPlugin:
    """The multimodal codec plug points proven with a REAL codec — a
    pure-Python PPM(P6) image decoder over genuine PPM bytes — through
    the same Arrow-batched mapInPandas path the fake codec tests drive
    (r5 verdict item 6: the contract must not rest on fake=True alone).
    The codec callables are defined here, outside the engine package, and
    reach the workers by cloudpickle value like any user codec would."""

    @staticmethod
    def _ppm_bytes(w: int, h: int, pixel_fn) -> bytes:
        header = f"P6\n{w} {h}\n255\n".encode()
        body = bytes(
            c for y in range(h) for x in range(w) for c in pixel_fn(x, y)
        )
        return header + body

    @staticmethod
    def _make_ppm_parser():
        """Build a minimal strict P6 parser as a NESTED function: codecs
        close over it, and cloudpickle then ships the whole chain by
        value — a module-level function would pickle by reference to this
        test module, which Spark's Python workers cannot import."""

        def parse(data: bytes):
            fields = []
            i = 0
            while len(fields) < 4:
                while i < len(data) and data[i : i + 1].isspace():
                    i += 1
                if data[i : i + 1] == b"#":
                    while data[i : i + 1] != b"\n":
                        i += 1
                    continue
                j = i
                while j < len(data) and not data[j : j + 1].isspace():
                    j += 1
                fields.append(data[i:j])
                i = j
            i += 1  # single whitespace after maxval
            magic, w, h, maxval = fields[0], int(fields[1]), int(fields[2]), int(fields[3])
            assert magic == b"P6" and maxval == 255
            return w, h, data[i : i + 3 * w * h]

        return parse

    def test_decode_features_with_real_ppm_codec(self, spark):
        from filebeat_to_clickhouse_spark.extensions.multimodal import decode_features

        parse = self._make_ppm_parser()

        def ppm_mean_rgb(payload: bytes):
            w, h, px = parse(payload)
            n = w * h
            return [
                sum(px[c::3]) / n for c in range(3)
            ]  # mean R, mean G, mean B

        img1 = self._ppm_bytes(4, 2, lambda x, y: (255, 0, x * 10 + y))
        img2 = self._ppm_bytes(2, 2, lambda x, y: (x * 100, y * 100, 7))
        df = spark.createDataFrame(
            [(1, img1), (2, img2)], "doc_id bigint, payload binary"
        )
        got = {r["doc_id"]: (r["n_bytes"], r["feature"]) for r in
               decode_features(df, codec=ppm_mean_rgb).collect()}
        assert got[1][0] == len(img1) and got[2][0] == len(img2)
        # local reference over the same real bytes
        for doc_id, img in ((1, img1), (2, img2)):
            want = ppm_mean_rgb(img)
            assert all(abs(a - b) < 1e-6 for a, b in zip(got[doc_id][1], want))
        # image 2: pixels (0,0),(100,0),(0,100),(100,100) → means (50, 50, 7)
        assert got[2][1] == [50.0, 50.0, 7.0]

    def test_resize_images_with_real_ppm_codec(self, spark):
        from filebeat_to_clickhouse_spark.extensions.multimodal import resize_images

        parse = self._make_ppm_parser()

        def ppm_nn_resize(payload: bytes, width: int, height: int) -> bytes:
            w, h, px = parse(payload)
            out = bytearray()
            for y in range(height):
                for x in range(width):
                    sx, sy = (x * w) // width, (y * h) // height
                    o = 3 * (sy * w + sx)
                    out += px[o : o + 3]
            return bytes(out)

        # 4x4 image whose quadrants are solid R/G/B/W → 2x2 resize picks
        # one pixel per quadrant (top-left under integer nearest-neighbor)
        def quad(x, y):
            if x < 2 and y < 2:
                return (255, 0, 0)
            if x >= 2 and y < 2:
                return (0, 255, 0)
            if x < 2:
                return (0, 0, 255)
            return (255, 255, 255)

        img = self._ppm_bytes(4, 4, quad)
        df = spark.createDataFrame([(9, img)], "doc_id bigint, payload binary")
        (row,) = resize_images(df, width=2, height=2, codec=ppm_nn_resize).collect()
        assert (row["width"], row["height"]) == (2, 2)
        assert bytes(row["resized"]) == bytes(
            (255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255)
        )

    def test_frame_sample_with_real_container_codec(self, spark):
        """A real (if tiny) length-prefixed container format: [2-byte BE
        length][frame bytes]..., demuxed by the plugged codec; the
        operator keeps every Nth decoded frame."""
        from filebeat_to_clickhouse_spark.extensions.multimodal import frame_sample

        def demux(payload: bytes):
            frames, i = [], 0
            while i < len(payload):
                n = int.from_bytes(payload[i : i + 2], "big")
                frames.append(payload[i + 2 : i + 2 + n])
                i += 2 + n
            return frames

        frames = [bytes([k]) * (k + 1) for k in range(6)]  # 6 variable-size frames
        payload = b"".join(len(f).to_bytes(2, "big") + f for f in frames)
        df = spark.createDataFrame([(3, payload)], "doc_id bigint, payload binary")
        rows = frame_sample(df, every_n=2, codec=demux).orderBy("frame_idx").collect()
        assert [r["frame_idx"] for r in rows] == [0, 2, 4]
        assert [bytes(r["frame"]) for r in rows] == [frames[0], frames[2], frames[4]]


class TestPercentileRank:
    def test_matches_python_cdf_with_ties_and_nulls(self, spark):
        from filebeat_to_clickhouse_spark.operators import percentile_rank

        rows = [("a", 0, 10), ("a", 1, 10), ("a", 2, 20), ("a", 3, 30),
                ("b", 4, 5), ("b", 5, None)]
        df = spark.createDataFrame(rows, "grp string, rid bigint, v bigint")
        got = {r["rid"]: r["pct_ppm"] for r in
               percentile_rank(df, "v", ("grp",)).collect()}
        # group a: CDF(10)=2/4, CDF(20)=3/4, CDF(30)=4/4 — ties share a rank
        assert got[0] == got[1] == 500_000
        assert got[2] == 750_000 and got[3] == 1_000_000
        # group b: the single non-NULL value is its own max → full scale;
        # the NULL row survives with a NULL rank (left join)
        assert got[4] == 1_000_000 and got[5] is None

    def test_keyless_global_rank(self, spark):
        from filebeat_to_clickhouse_spark.operators import percentile_rank

        df = spark.createDataFrame([(i, i) for i in range(10)], "rid bigint, v bigint")
        got = {r["rid"]: r["pct_ppm"] for r in percentile_rank(df, "v").collect()}
        assert got[0] == 100_000 and got[4] == 500_000 and got[9] == 1_000_000

    def test_range_partitioned_identity_on_skewed_duplicates(self, spark):
        """_range_partitioned_cdf row-identity vs the keyless
        single-window path on data that stresses its invariants: a value
        owning >half the rows (range boundaries MUST NOT split equal
        values), duplicate values straddling slice sizes, a NULL row,
        and more requested ranges than distinct values (empty slices)."""
        from filebeat_to_clickhouse_spark.operators import percentile_rank

        rows = (
            [(i, 7) for i in range(60)]          # one dominant duplicate value
            + [(100 + i, i % 5) for i in range(25)]  # small values, dup'd 5×
            + [(200 + i, 1000 + i) for i in range(15)]  # distinct tail
            + [(300, None)]
        )
        df = spark.createDataFrame(rows, "rid bigint, v bigint").repartition(7)
        base = {r["rid"]: r["pct_ppm"] for r in percentile_rank(df, "v").collect()}
        for n_ranges in (1, 3, 64):
            got = {
                r["rid"]: r["pct_ppm"]
                for r in percentile_rank(df, "v", range_partitions=n_ranges).collect()
            }
            assert got == base, f"range_partitions={n_ranges} diverged"

    def test_range_partitioned_boundaries_identity(self, spark):
        """exact_quantile_boundaries through the ranged CDF emits the
        identical k-row artifact as the single-window form."""
        from filebeat_to_clickhouse_spark.operators import exact_quantile_boundaries

        rows = [(i, (i * i) % 97) for i in range(500)] + [(1000, None)]
        df = spark.createDataFrame(rows, "rid bigint, v bigint")
        base = sorted(
            (r["q"], r["boundary"])
            for r in exact_quantile_boundaries(df, "v", k=20).collect()
        )
        got = sorted(
            (r["q"], r["boundary"])
            for r in exact_quantile_boundaries(
                df, "v", k=20, range_partitions=6
            ).collect()
        )
        assert got == base

    def test_range_partitioned_grouped_identity(self, spark):
        """The GROUPED ranged rung (r8): row-identity vs the grouped
        single-window-per-key path on data that stresses the per-key
        invariants — one HOT key whose histogram spans slices (the
        parallelism the rung exists for), a key entirely inside one
        slice, duplicate values within and across keys, a NULL value
        row, and a NULL key group."""
        from filebeat_to_clickhouse_spark.operators import percentile_rank

        rows = (
            [("hot", i, i % 40) for i in range(200)]      # hot key, 40 distinct
            + [("hot", 1000 + i, 7) for i in range(60)]   # dominant duplicate
            + [("cold", 2000 + i, 5 - i) for i in range(5)]
            + [("cold", 2100, None)]
            + [(None, 2200 + i, i) for i in range(3)]     # NULL key group
        )
        df = spark.createDataFrame(rows, "grp string, rid bigint, v bigint").repartition(7)
        base = {
            r["rid"]: (r["grp"], r["pct_ppm"])
            for r in percentile_rank(df, "v", ("grp",)).collect()
        }
        for n_ranges in (1, 4, 64):
            got = {
                r["rid"]: (r["grp"], r["pct_ppm"])
                for r in percentile_rank(
                    df, "v", ("grp",), range_partitions=n_ranges
                ).collect()
            }
            assert got == base, f"range_partitions={n_ranges} diverged"


class TestCapDropLogging:
    def test_df_cap_logs_once_when_it_actually_filters(self, spark, caplog):
        """The jaccard df-cap must announce when it ACTUALLY dropped index
        keys (r7 advice): the observation rides the executing plan as a
        CollectMetrics node and a daemon thread logs after the first
        action — no extra Spark job anywhere."""
        import logging
        import time as _time

        from filebeat_to_clickhouse_spark.extensions.dedup import ngram_jaccard_pairs

        # 'h h h h' is a 4x-hot shingle stream; with max_df=2 its shingles
        # are dropped while the rare pair survives
        rows = [(i, "h h h h h") for i in range(4)] + [
            (10, "p q r s t"),
            (11, "p q r s t"),
        ]
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        with caplog.at_level(logging.INFO, logger="filebeat_to_clickhouse_spark.extensions.dedup"):
            ngram_jaccard_pairs(df, threshold=0.5, max_df=2).collect()
            deadline = _time.monotonic() + 10
            while _time.monotonic() < deadline and not any(
                "frequency cap dropped" in r.message for r in caplog.records
            ):
                _time.sleep(0.05)
        hits = [r for r in caplog.records if "frequency cap dropped" in r.message]
        assert hits, "cap filtered keys but never logged"

    def test_no_log_when_cap_filters_nothing(self, spark, caplog):
        import logging
        import time as _time

        from filebeat_to_clickhouse_spark.extensions.dedup import ngram_jaccard_pairs

        df = spark.createDataFrame(
            [(0, "a b c d"), (1, "a b c e")], "doc_id bigint, text string"
        )
        with caplog.at_level(logging.INFO, logger="filebeat_to_clickhouse_spark.extensions.dedup"):
            ngram_jaccard_pairs(df, threshold=0.1, max_df=100).collect()
            _time.sleep(0.5)  # give the observer thread a chance to misfire
        assert not any("frequency cap dropped" in r.message for r in caplog.records)


class TestNgramNovelty:
    def test_first_seen_owns_its_shingles(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import ngram_novelty

        df = spark.createDataFrame(
            [
                (1, "a b c d"),          # 2 shingles, both first seen here
                (2, "a b c"),            # 1 shingle, already owned by doc 1
                (3, "a b c x y z"),      # 4 shingles: 'a b c' old, 3 novel
                (4, "q r"),              # < n tokens: no shingles, absent
            ],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_ppm"])
               for r in ngram_novelty(df).collect()}
        assert got[1] == (2, 2, 1_000_000)
        assert got[2] == (1, 0, 0)
        assert got[3] == (4, 3, 750_000)
        assert 4 not in got

    def test_exact_duplicate_scores_zero(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import ngram_novelty

        df = spark.createDataFrame(
            [(1, "u v w x y"), (2, "u v w x y")], "doc_id bigint, text string"
        )
        got = {r["doc_id"]: r["novelty_ppm"] for r in ngram_novelty(df).collect()}
        assert got[1] == 1_000_000 and got[2] == 0


class TestCrossSourceDuplicationMatrix:
    def test_pair_counts_without_materializing_pairs(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import (
            cross_source_duplication_matrix,
        )

        rows = (
            [(i, "dup one", "s1") for i in range(3)]        # 3 copies in s1
            + [(10 + i, "dup one", "s2") for i in range(2)]  # 2 copies in s2
            + [(20, "dup two", "s1"), (21, "dup two", "s2")]
            + [(30, "unique a", "s1"), (31, "unique b", "s2")]
        )
        df = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
        got = {
            (r["source_a"], r["source_b"]): (r["n_dup_pairs"], r["n_shared_fps"])
            for r in cross_source_duplication_matrix(df).collect()
        }
        # s1 internal: C(3,2)=3 pairs of "dup one"; cross: 3×2 + 1×1 = 7
        assert got[("s1", "s1")] == (3, 1)
        assert got[("s1", "s2")] == (7, 2)
        # s2 internal: C(2,2)=1
        assert got[("s2", "s2")] == (1, 1)
        # unique texts produce no row anywhere
        assert set(got) == {("s1", "s1"), ("s1", "s2"), ("s2", "s2")}


class TestExactQuantileBoundaries:
    def test_matches_rank_rule_model_with_ties(self, spark):
        from filebeat_to_clickhouse_spark.operators import exact_quantile_boundaries

        vals = [1, 1, 1, 2, 5, 5, 9, 100]  # ties + gaps
        df = spark.createDataFrame([(v,) for v in vals], "v bigint")
        k = 4
        got = {r["q"]: r["boundary"] for r in exact_quantile_boundaries(df, "v", k=k).collect()}

        def model(q):  # smallest v with cum*k >= q*total
            s = sorted(vals)
            cum = 0
            for v in s:
                cum += 1
                if cum * k >= q * len(s):
                    return v
            return s[-1]

        assert got == {q: model(q) for q in range(1, k + 1)}
        # dense spine, monotone, max at q=k
        assert sorted(got) == [1, 2, 3, 4]
        bs = [got[q] for q in sorted(got)]
        assert bs == sorted(bs) and got[k] == max(vals)

    def test_k_exceeding_distinct_values_still_dense(self, spark):
        from filebeat_to_clickhouse_spark.operators import exact_quantile_boundaries

        df = spark.createDataFrame([(1,), (2,), (None,)], "v bigint")
        got = {r["q"]: r["boundary"] for r in
               exact_quantile_boundaries(df, "v", k=10).collect()}
        # 2 non-NULL values, 10 quantiles: q 1..5 -> 1, q 6..10 -> 2
        assert got == {**{q: 1 for q in range(1, 6)}, **{q: 2 for q in range(6, 11)}}


class TestIncrementalNovelty:
    def test_matches_set_model_and_store_pattern(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import (
            incremental_novelty,
            word_shingles,
        )

        history = spark.createDataFrame(
            [(1, "a b c d e")], "doc_id bigint, text string"
        )
        store = word_shingles(history).select("shingle").distinct()
        batch = spark.createDataFrame(
            [
                (10, "a b c d e"),      # wholly seen → 0
                (11, "a b c x y z"),    # 'a b c' seen; 3 of 4 novel
                (12, "p q r s"),        # wholly novel → full scale
            ],
            "doc_id bigint, text string",
        )
        got = {r["doc_id"]: (r["n_shingles"], r["n_novel"], r["novelty_ppm"])
               for r in incremental_novelty(batch, store).collect()}
        assert got[10] == (3, 0, 0)
        assert got[11] == (4, 3, 750_000)
        assert got[12] == (2, 2, 1_000_000)

    def test_empty_store_means_everything_novel(self, spark):
        from filebeat_to_clickhouse_spark.extensions.dedup import incremental_novelty

        store = spark.createDataFrame([], "shingle bigint")
        batch = spark.createDataFrame([(1, "m n o p")], "doc_id bigint, text string")
        (row,) = incremental_novelty(batch, store).collect()
        assert (row["n_shingles"], row["n_novel"], row["novelty_ppm"]) == (2, 2, 1_000_000)


class TestTmpdirAutoclean:
    """The fixture spool dirs are corpus-sized; a leak across sessions
    filled the disk during the r8 growth-check refresh (ENOSPC mid-run).
    The helper must remove its dirs at interpreter exit — verified in a
    subprocess so the atexit hook actually fires."""

    def test_dir_removed_at_interpreter_exit(self, tmp_path):
        import subprocess
        import sys
        import os

        marker = tmp_path / "made_dir.txt"
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from filebeat_to_clickhouse_spark.queries import _tmpdir_autoclean\n"
            "d = _tmpdir_autoclean('fbck-test-clean-')\n"
            "import pathlib; pathlib.Path(%r).write_text(d)\n"
            % (os.getcwd(), str(marker))
        )
        subprocess.run([sys.executable, "-c", code], check=True, timeout=120)
        d = marker.read_text()
        assert "fbck-test-clean-" in d
        assert not os.path.exists(d), "atexit cleanup must remove the spool dir"

    def test_dir_exists_while_interpreter_lives(self):
        import os

        from filebeat_to_clickhouse_spark.queries import _tmpdir_autoclean

        d = _tmpdir_autoclean("fbck-test-live-")
        try:
            assert os.path.isdir(d), "cleanup must NOT be eager — lazy readers need the files"
        finally:
            import shutil

            shutil.rmtree(d, ignore_errors=True)
