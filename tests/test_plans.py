"""Physical-plan quality gates: the properties that make these plans hold
at 1000× the data are asserted, not assumed — a regression that turns a
broadcast join into a sort-merge join, loses filter pushdown, or adds a
shuffle fails here long before it shows up in a benchmark."""

from __future__ import annotations

import os
import re

import pytest

from conftest import SF_ORACLE


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def n(pattern: str, plan: str) -> int:
    return len(re.findall(pattern, plan))


@pytest.fixture(scope="module")
def plans(spark):
    from filebeat_to_clickhouse_spark.queries import QUERIES

    names = (
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "q10_returned_items",
        "acctbal_by_nation_region",
        "asof_click_attribution",
        "latest_events_top10",
        "ingest_normalize_roundtrip",
        "minhash_lsh_neardup",
        "q7_bilateral_trade_volume",
        "q17_small_quantity_revenue",
    )
    return {name: plan_of(QUERIES[name](spark, SF_ORACLE)) for name in names}


class TestJoinStrategies:
    def test_dim_joins_broadcast_never_sort_merge(self, plans):
        for q in ("q3_shipping_priority", "q5_local_supplier_volume", "q10_returned_items", "acctbal_by_nation_region"):
            assert n(r"SortMergeJoin", plans[q]) == 0, q
            assert n(r"BroadcastHashJoin", plans[q]) >= 2, q

    def test_fact_queries_single_agg_shuffle(self, plans):
        # one hashpartitioning exchange: the grouped aggregation. Dims ship
        # by broadcast, so no join exchanges appear.
        for q in ("q3_shipping_priority", "q10_returned_items"):
            assert n(r"Exchange hashpartitioning", plans[q]) == 1, q
        # q5's two-level fixed-point merge (r9) deliberately adds a SECOND
        # exchange carrying only |groups|×|partitions| partial rows (~25×32
        # here) — the per-row decimal arithmetic it removes dominates
        # (sf10 A/B 4.68 → 4.09 s); fact rows still shuffle exactly once
        assert n(r"Exchange hashpartitioning", plans["q5_local_supplier_volume"]) == 2

    def test_q7_only_fact_fact_join_shuffles(self, plans):
        # all four dimension probes (supplier, customer, and both nation
        # roles) broadcast; the only SortMergeJoin is lineitem⋈orders — the
        # genuine fact-fact join — plus one final agg exchange.
        p = plans["q7_bilateral_trade_volume"]
        assert n(r"BroadcastHashJoin", p) == 4
        assert n(r"\bSortMergeJoin\b", p) == 1
        assert n(r"Exchange hashpartitioning", p) == 3  # 2 join sides + 1 agg

    def test_q17_avg_subquery_broadcasts_back(self, plans):
        # the decorrelated per-partkey average joins back by broadcast; the
        # brand semi-filter is a broadcast too — no SortMergeJoin anywhere,
        # and the only hash exchange is the partkey aggregation.
        p = plans["q17_small_quantity_revenue"]
        assert n(r"\bSortMergeJoin\b", p) == 0
        assert n(r"Exchange hashpartitioning", p) == 1

    def test_asof_join_is_single_shuffle_sort(self, plans):
        p = plans["asof_click_attribution"]
        assert n(r"Exchange hashpartitioning", p) == 1
        assert n(r"\bSortMergeJoin\b", p) == 0  # union-tag, not a join at all


class TestScanHygiene:
    def test_filter_pushdown_reaches_scan(self, plans):
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plans["q1_pricing_summary"]

    def test_column_pruning(self, plans):
        # q1 touches 7 of lineitem's 10 columns; the scan must not read more
        m = re.search(r"FileScan parquet \[([^\]]*)\][^\n]*lineitem", plans["q1_pricing_summary"])
        assert m and len(m.group(1).split(",")) <= 7
        # latest-10 over events reads all event columns but plans a top-N,
        # never a global sort
        assert "TakeOrderedAndProject" in plans["latest_events_top10"]
        assert n(r"Exchange rangepartitioning", plans["latest_events_top10"]) == 0


class TestPipelineShapes:
    def test_ingest_normalize_is_shuffle_free(self, plans):
        # parse → normalize is a pure narrow pipeline: only the explicit
        # scan rebalance may repartition; no hash/range exchange.
        p = plans["ingest_normalize_roundtrip"]
        assert n(r"Exchange hashpartitioning", p) == 0
        assert n(r"Exchange rangepartitioning", p) == 0

    def test_minhash_signature_shuffle_is_bounded(self, plans):
        # signatures: one grouped aggregation per shingle table build; the
        # LSH band/bucket stage must stay projection-only (posexplode), so
        # the plan has no rangepartitioning anywhere.
        assert n(r"Exchange rangepartitioning", plans["minhash_lsh_neardup"]) == 0


class TestLlmPipelinePlans:
    def test_repetition_stats_is_shuffle_free(self, spark):
        """All five repetition metrics are per-row folds — ANY exchange
        besides the scan-side rebalance is a regression to a groupBy
        formulation."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["repetition_stats"](spark, SF_ORACLE))
        assert n(r"Exchange hashpartitioning", p) == 0
        assert n(r"Exchange rangepartitioning", p) == 0

    def test_decontaminate_eval_side_broadcasts(self, spark):
        """The eval shingle set must reach the corpus by broadcast — a
        SortMergeJoin here would shuffle the full corpus shingle table on
        a 100 TB run."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["decontamination_overlap"](spark, SF_ORACLE))
        assert n(r"BroadcastHashJoin", p) >= 1
        assert n(r"SortMergeJoin", p) == 0

    def test_kmeans_assignment_broadcasts_centroids(self, spark):
        """Every assignment pass joins the corpus against k centroid rows:
        broadcast nested-loop on a tiny build side, never a shuffled join
        of the corpus."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["kmeans_embedding_clusters"](spark, SF_ORACLE))
        # earlier iterations sit behind localCheckpoint cuts (Scan
        # ExistingRDD), so only the final assignment pass is visible here.
        assert n(r"SortMergeJoin", p) == 0
        assert n(r"BroadcastNestedLoopJoin|BroadcastHashJoin", p) >= 1

    def test_ivf_kmeans_probe_and_candidate_joins_broadcast(self, spark):
        """The trained-quantizer IVF: probes join k centroid rows and the
        candidate expansion joins the (small) probe table — both broadcast,
        never a shuffled join of the corpus against either."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["ann_ivf_kmeans_topk"](spark, SF_ORACLE))
        # the assignment carries xq, so even the candidate scoring join is
        # broadcast — nothing in the composition shuffles the corpus
        assert n(r"SortMergeJoin", p) == 0
        assert n(r"BroadcastNestedLoopJoin|BroadcastHashJoin", p) >= 2

    def test_incremental_neardup_batch_side_broadcasts(self, spark):
        """Batch-vs-store near-dup: the delivery side broadcasts into the
        bucket join; the store's banding stays a narrow projection — no
        store-wide shuffle for candidate generation."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["incremental_neardup_sigs"](spark, SF_ORACLE))
        assert n(r"BroadcastHashJoin", p) >= 1

    def test_incremental_dedup_antijoin_on_digest(self, spark):
        """The store anti-join keys on the digest (uniform), and the batch
        side needs exactly one aggregation exchange for the in-batch
        min-id dedup."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["incremental_dedup_survivors"](spark, SF_ORACLE))
        assert "LeftAnti" in p

    def test_ivf_pq_codebook_and_lut_joins_broadcast(self, spark):
        """IVF-PQ: codebooks, probe tables, and the packed ADC lookup maps
        are kilobyte-scale and must broadcast, and with the inline argmin
        assignment + narrow pq_encode + map-lookup ADC scoring NO join in
        the whole composition may shuffle the corpus: zero SortMergeJoin,
        zero cartesian products (the centroid/codebook crossJoins are
        single-row broadcast nested loops)."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["ann_ivf_pq_topk"](spark, SF_ORACLE))
        assert n(r"SortMergeJoin", p) == 0
        assert n(r"BroadcastHashJoin", p) >= 3
        assert n(r"CartesianProduct", p) == 0

    def test_bucketed_fact_join_zero_exchanges(self, spark):
        """The sf1000 SMJ mitigation end to end: bucket co-location feeds
        the orders⋈lineitem SortMergeJoin, the per-order aggregate reuses
        the bucket distribution, and the top-10 is TakeOrderedAndProject —
        the ENTIRE plan must contain no Exchange of any kind."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["bucketed_fact_join_topk"](spark, SF_ORACLE))
        assert n(r"Exchange", p) == 0, p[:3000]
        assert "SortMergeJoin" in p
        assert "TakeOrderedAndProject" in p

    def test_semantic_decontaminate_corpus_never_shuffles(self, spark):
        """The eval registry broadcasts into a nested-loop threshold join;
        the corpus side is one narrow scan — any hash/range exchange means
        the corpus is being shuffled for a ~1e4-row eval set."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["semantic_decontamination"](spark, SF_ORACLE))
        assert n(r"BroadcastNestedLoopJoin", p) >= 1
        assert n(r"SortMergeJoin", p) == 0
        assert n(r"Exchange hashpartitioning", p) == 0
        assert n(r"Exchange rangepartitioning", p) == 0

    def test_epoch_shuffle_never_global_sorts(self, spark):
        """The permutation must stay per-shard: a SinglePartition exchange
        (global ntile/sort shape) here would serialize the whole corpus
        through one task at 100 TB."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["epoch_shuffle_order"](spark, SF_ORACLE))
        assert "Exchange SinglePartition" not in p
        assert n(r"Exchange hashpartitioning", p) == 1

    def test_banded_asof_windows_partition_on_key_and_band(self, spark):
        """The whole point of banding: every corpus-sized window must
        partition on (key, band), so a hot key's sort state shards
        across bands instead of one straggler task. Only the carry
        window (one row per band summary) may partition on the bare key."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["asof_click_attribution_banded"](spark, SF_ORACLE))
        assert n(r"windowspecdefinition\(_k#\d+L?, _b#", p) >= 1
        # the union-tag running-last (the row-volume window) keys on (_k, _b):
        # no last(...) window over the bare key
        import re

        for frag in re.findall(r"last\(_r[^\n]*windowspecdefinition\([^\n]*", p):
            assert "_b#" in frag, frag

    def test_span_removal_dup_set_broadcasts(self, spark):
        """remove_duplicated_spans' r5 spill bound: the duplicated-gram
        winner table joins the occurrence stream as a BROADCAST (under
        the r8 auto-sizer's cap), so occ never re-shuffles for it (the
        pre-r5 occ⋈win shuffle was the sf10 15.4× cliff) — pinned as
        zero sort-merge on the gram key. The words⋈coverage left join is
        DELIBERATELY not pinned to broadcast: coverage is corpus-derived
        (duplication-sized), the pre-r8 broadcast there was an optimizer
        size estimate rather than a guarantee, and AQE upgrades the
        co-partitioned sort-merge to broadcast at runtime when coverage
        is actually small. Three irreducible hash exchanges: the words
        stream, the coverage distinct, and the document rebuild (the
        dup-gram aggregate now lives inside the sizer's lineage cut)."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["remove_duplicated_spans"](spark, SF_ORACLE))
        assert n(r"BroadcastHashJoin \[gram", p) >= 1
        assert n(r"SortMergeJoin \[gram", p) == 0
        assert n(r"Exchange hashpartitioning", p) <= 3

    def test_classifier_training_and_scoring_never_sort_merge(self, spark):
        """The whole train→score composition: every join (label attach,
        train semi-filters, class-count crossJoin, weight scoring) is
        broadcast — zero SortMergeJoin, and the only SinglePartition
        exchange is the 1-row class-count aggregate."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["quality_classifier_scores"](spark, SF_ORACLE))
        assert n(r"SortMergeJoin", p) == 0
        assert n(r"BroadcastHashJoin", p) >= 4
        assert n(r"Exchange SinglePartition", p) <= 1

    def test_histogram_percentiles_windows_over_aggregate(self, spark):
        """The shared percentile operator's cumulative window must consume
        a HashAggregate (the compact histogram), never raw rows — the
        property that keeps exact percentiles viable at corpus scale. The
        grouped form must also keep the window partitioned (no
        SinglePartition exchange at all)."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        grouped = plan_of(QUERIES["length_percentiles_by_source"](spark, SF_ORACLE))
        assert n(r"Window", grouped) >= 1
        assert n(r"HashAggregate", grouped) >= 2  # histogram + final
        assert n(r"Exchange SinglePartition", grouped) == 0
        glob = plan_of(QUERIES["session_duration_percentiles"](spark, SF_ORACLE))
        # global form: the only single-partition stages run over the
        # distinct-duration histogram, which a HashAggregate produced
        assert n(r"HashAggregate", glob) >= 2

    def test_prefix_jaccard_joins_stay_keyed(self, spark):
        """Prefix-filtered exact Jaccard: every join must be hash-keyed on
        a shingle or doc id — a nested-loop or cartesian anywhere here is
        all-pairs in disguise. The per-doc prefix rank must window on
        doc_id (rows per partition = shingles per doc, never the corpus)."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["ngram_jaccard_pairs_prefix"](spark, SF_ORACLE))
        assert n(r"CartesianProduct", p) == 0
        assert n(r"BroadcastNestedLoopJoin", p) == 0
        assert n(r"Exchange SinglePartition", p) == 0
        assert n(r"windowspecdefinition\(doc_id", p) >= 1

    def test_ann_filter_pushes_below_distance(self, spark):
        """Filtered ANN: the metadata predicate must prune the corpus at
        (or directly above) the scan — BEFORE the broadcast distance join
        — and the query side must broadcast. Post-filtering the scored
        pairs would do |corpus|×|queries| distance work regardless of
        selectivity."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["ann_filtered_topk"](spark, SF_ORACLE))
        # query side broadcasts (BNLJ BuildRight carries the != self-match
        # guard — same shape as the unfiltered exact baseline); corpus side
        # must never be the build side
        assert n(r"BroadcastNestedLoopJoin BuildRight", p) == 1
        assert n(r"CartesianProduct", p) == 0
        # the label predicate sits in the corpus scan's Filter, BELOW the join
        join_pos = p.index("BroadcastNestedLoopJoin")
        assert re.search(r"\(label#\d+L? % 2\) = 0", p[join_pos:]), "label filter below join"

    def test_bloom_dedup_join_sees_only_bitmap_hits(self, spark):
        """Bloom-prefiltered incremental dedup: the store anti-join's batch
        side must carry the bitmap-hit predicate (cleared rows bypass the
        join), and the join must stay hash-keyed on the digest."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["incremental_dedup_bloom"](spark, SF_ORACLE))
        assert n(r"LeftAnti", p) == 1
        assert n(r"CartesianProduct|BroadcastNestedLoopJoin", p) == 0
        anti_pos = p.index("LeftAnti")
        # the anti-join subtree filters on _hit; the cleared branch has NOT _hit
        assert "_hit" in p[anti_pos:]

    def test_bm25_inrow_two_exchanges_and_mapside_prune(self, spark):
        """BM25 (r7 in-row form, small standing-query set): per-(query,
        doc) scores are computed in-row against the broadcast 1-row
        stats/weights aggregate — so the ONLY data exchanges are the two
        salted ranking phases, the first of which must carry Spark's
        map-side partial WindowGroupLimit prune. Nothing may degrade to
        sort-merge or a cartesian on data (the lone nested-loop is the
        1-row stats cross join)."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["bm25_topk"](spark, SF_ORACLE))
        assert n(r"SortMergeJoin", p) == 0
        assert n(r"CartesianProduct", p) == 0
        assert n(r"Exchange hashpartitioning", p) == 2
        assert n(r"WindowGroupLimit.*Partial", p) >= 1
        # the (query_id, doc_id) score-combine shuffle of the join form
        # must be GONE — the only aggregate left is the keyless 1-row
        # stats pass inside the broadcast subtree
        assert n(r"HashAggregate\(keys=\[[^\]]", p) == 0

    def test_bm25_join_form_broadcasts_never_sort_merge(self, spark):
        """The general (large-query-set) BM25 form: model and query-term
        joins onto the match stream must broadcast, score combine is one
        partial-combined aggregate, no sort-merge/cartesian."""
        from filebeat_to_clickhouse_spark.extensions import retrieval
        from filebeat_to_clickhouse_spark.io import load_table

        docs = load_table(spark, SF_ORACLE, "documents")
        # string ids force the join form regardless of size thresholds
        p = plan_of(retrieval.bm25_topk(docs, {"q0": ["spark"], "q1": ["join"]}, k=5))
        assert n(r"SortMergeJoin", p) == 0
        assert n(r"BroadcastHashJoin", p) >= 2
        assert n(r"CartesianProduct", p) == 0

    def test_hybrid_fused_one_doc_scan_two_exchanges(self, spark):
        """The fused hybrid (r7, the round-6 perf-weak rebuild): ONE scan
        of documents (the checkpointed base feeds both the stats
        aggregate and the in-row scorer, so NO documents parquet scan
        survives into the executed plan), embeddings scanned exactly
        twice (corpus + broadcast query side), exactly TWO data
        exchanges end to end (the salted prune + the query_id tail
        clustering — phase-2 window, RRF groupBy, and final window all
        ride the second), map-side partial prune below the first, and
        the only nested-loop joins are the broadcast 1-row stats cross
        join and the != self-match query join."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["hybrid_rrf_topk"](spark, SF_ORACLE))
        assert n(r"Scan parquet[^\n]*documents", p) == 0
        assert n(r"Scan parquet[^\n]*embeddings", p) == 2
        assert n(r"Exchange hashpartitioning", p) == 2
        assert n(r"WindowGroupLimit.*Partial", p) >= 1
        assert n(r"SortMergeJoin", p) == 0
        assert n(r"CartesianProduct", p) == 0
        assert n(r"BroadcastNestedLoopJoin", p) <= 2


class TestR6GuardPlans:
    def test_capped_jaccard_carries_df_guard_and_stays_keyed(self, spark):
        """The default (df-capped) exact Jaccard: the max_df semi join must
        be IN the plan (the guard is structural, not advisory) — asserted
        on the index stage, which the operator checkpoints (the checkpoint
        truncates the downstream-visible plan); the full query stays
        hash-keyed with no cartesian/nested-loop/single-partition stage."""
        from filebeat_to_clickhouse_spark.extensions.dedup import _df_capped_shingles
        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.queries import QUERIES

        docs = load_table(spark, SF_ORACLE, "documents")
        idx = plan_of(_df_capped_shingles(docs, 3, 100))
        assert n(r"LeftSemi", idx) >= 1  # the df-cap postings filter
        p = plan_of(QUERIES["ngram_jaccard_pairs"](spark, SF_ORACLE))
        assert n(r"CartesianProduct", p) == 0
        assert n(r"BroadcastNestedLoopJoin", p) == 0
        assert n(r"Exchange SinglePartition", p) == 0
        # the uncapped legacy index has NO semi join (and none hidden)
        uncapped = plan_of(_df_capped_shingles(docs, 3, None))
        assert n(r"LeftSemi", uncapped) == 0

    def test_capped_winnow_carries_postings_guard(self, spark):
        from filebeat_to_clickhouse_spark.extensions.text import (
            _postings_capped_fingerprints,
        )
        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.queries import QUERIES

        docs = load_table(spark, SF_ORACLE, "documents")
        idx = plan_of(_postings_capped_fingerprints(docs, k=3, w=4, max_postings=100))
        assert n(r"LeftSemi", idx) >= 1  # the max_postings filter
        p = plan_of(QUERIES["winnow_overlap_pairs"](spark, SF_ORACLE))
        assert n(r"CartesianProduct", p) == 0
        assert n(r"BroadcastNestedLoopJoin", p) == 0

    def test_novelty_has_no_self_join_blowup(self, spark):
        """n-gram novelty must stay two aggregates + one keyed join — the
        whole point is that hot shingles NEVER pair-join. No cartesian, no
        nested loop, no single-partition exchange, exactly one join."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["ngram_novelty_scores"](spark, SF_ORACLE))
        assert n(r"CartesianProduct|BroadcastNestedLoopJoin", p) == 0
        assert n(r"Exchange SinglePartition", p) == 0
        assert n(r"Join|HashJoin", p) >= 1
        assert n(r"HashAggregate", p) >= 2

    def test_percentile_rank_windows_only_histogram_rows(self, spark):
        """percentile_rank: the cumulative window must run over the
        (source, score) HISTOGRAM (i.e. sit above a HashAggregate), and
        the model join back must be hash-keyed, never nested-loop."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["quality_percentile_rank"](spark, SF_ORACLE))
        assert n(r"CartesianProduct|BroadcastNestedLoopJoin", p) == 0
        assert n(r"Window", p) >= 1
        win_pos = p.index("Window")
        assert "HashAggregate" in p[win_pos:], "window must sit above the histogram agg"

    def test_ranged_percentile_cumsum_is_multi_partition(self, spark):
        """quality_percentile_rank_ranged (the _range_partitioned_cdf
        rung): the corpus-sized cumulative sum must run per range slice —
        a Window PARTITIONED on the baked slice id — never as one
        single-partition sort of the full histogram; the n_ranges-row
        offset model must come back as a broadcast; and the CDF join back
        onto rows must stay hash-keyed."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["quality_percentile_rank_ranged"](spark, SF_ORACLE))
        assert n(r"windowspecdefinition\(_pid", p) >= 1, (
            "local cumsum window must partition on the range-slice id"
        )
        assert n(r"CartesianProduct|BroadcastNestedLoopJoin", p) == 0
        assert n(r"BroadcastHashJoin", p) >= 1, "slice offsets must broadcast"
        # the ONLY single-partition windows allowed are the n_ranges-row
        # offset ladders (input = one row per slice, post-aggregate), which
        # order by _pid — every windowspec must lead with the slice id,
        # i.e. no window partitions-or-orders the full histogram by value
        for spec in re.findall(r"windowspecdefinition\(([^,]+),", p):
            assert "_pid" in spec, f"value-led window found: {spec}"

    def test_ranged_percentile_grouped_cumsum_is_multi_partition(self, spark):
        """The GROUPED ranged rung (r8): the per-source cumulative sum
        must window on (slice id, source) — a hot source spans slices
        instead of serializing into one task — and the per-source offset
        ladders window over slice summaries partitioned BY SOURCE (they
        lead with source and order by _pid). No windowspec may lead with
        the raw value: that would be a per-key full-histogram sort, the
        exact cliff the rung removes."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(
            QUERIES["quality_percentile_rank_by_source_ranged"](spark, SF_ORACLE)
        )
        assert n(r"windowspecdefinition\(_pid[^,]*, source", p) >= 1, (
            "local cumsum window must partition on (slice id, source)"
        )
        assert n(r"CartesianProduct|BroadcastNestedLoopJoin", p) == 0
        for spec in re.findall(r"windowspecdefinition\(([^,]+),", p):
            assert "_pid" in spec or "source" in spec, (
                f"value-led window found: {spec}"
            )


class TestAuditBatchPlans:
    """Gates for the late-r8 plan-audit batch: the single-derivation
    shapes the sf1/sf10 A/Bs measured must not silently regress back to
    per-consumer re-derivation."""

    def test_retention_is_single_user_aggregate(self, spark):
        """user_retention_cohorts: ONE user-keyed aggregate (collect_set
        of activity days) carries the whole computation — no user-keyed
        join of two event-scale subtrees, no distinct over (user, day)
        rows, cohort sizes arrive by broadcast."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["user_retention_cohorts"](spark, SF_ORACLE))
        assert n(r"SortMergeJoin", p) == 0
        assert n(r"BroadcastHashJoin", p) == 1, "cohort sizes must broadcast"
        # the per-user frame arrives through the lineage cut carrying the
        # collected day-set column — the collect_set itself runs below the
        # cut, so the visible plan reads (cohort, _days) from the cut
        assert n(r"Scan ExistingRDD\[cohort[^\]]*_days", p) >= 1, (
            "cell/csize must read the cut per-user (cohort, days) frame"
        )
        # the events source is consumed exactly once (through the cut);
        # nothing re-scans it for a second user-keyed pass
        assert n(r"FileScan parquet", p) <= 1

    def test_q2_semi_filters_fact_below_aggregate(self, spark):
        """q2: the p_size predicate reaches the fact BEFORE the
        (part, supp) aggregate as a broadcast LeftSemi — aggregating the
        full fact and filtering after measured 3.4x slower at sf10."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["q2_min_price_supplier"](spark, SF_ORACLE))
        semi = p.find("LeftSemi")
        agg = p.find("HashAggregate")
        assert semi != -1, "fact must be semi-filtered on qualifying parts"
        assert n(r"SortMergeJoin", p) == 0
        # in the printed tree the aggregate node appears ABOVE the semi
        # join feeding it: its offset must be smaller (printed first)
        assert agg != -1 and agg < semi, "semi filter must sit below the aggregate"

    def test_bulk_action_pairing_is_one_pass(self, spark):
        """parse_bulk_actions pairs action/document lines with a lead()
        window over the exploded body — the plan carries a window, not a
        positional self-join of two explode subtrees."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        p = plan_of(QUERIES["bulk_action_replay"](spark, SF_ORACLE))
        assert n(r"\bWindow\b", p) >= 1, "pairing must ride a lead() window"
        assert n(r"SortMergeJoin", p) == 0
        assert n(r"FileScan parquet", p) <= 1, "the wire body is derived once"


class TestCorpusScalingDimGate:
    """The r9 verdict's one remaining 100×-scale OOM class: hard-pinned
    F.broadcast() on tables that grow with the corpus (customer/supplier/
    part). The gate (queries._dim_hint) keeps the broadcast while the base
    table's parquet footprint is under BROADCAST_DIM_MAX_BYTES — all the
    testdata SFs, so every plan gate above is unchanged — and flips to a
    spillable sort-merge join past it. A binding broadcast hint cannot be
    demoted by AQE, so the flip must happen at plan-build time."""

    def test_past_cap_dim_flips_to_sort_merge(self, spark, monkeypatch):
        from filebeat_to_clickhouse_spark import queries

        monkeypatch.setattr(queries, "BROADCAST_DIM_MAX_BYTES", -1)
        monkeypatch.setattr(queries, "_DIM_HINT_MEMO", {})
        # q3: the customer probe degrades to sort-merge; q5: customer AND
        # supplier degrade while nation/region (fixed 25/5 rows) stay
        # broadcast — the gate distinguishes corpus-scaling from fixed dims.
        p3 = plan_of(queries.QUERIES["q3_shipping_priority"](spark, SF_ORACLE))
        assert n(r"\bSortMergeJoin\b", p3) >= 1
        p5 = plan_of(queries.QUERIES["q5_local_supplier_volume"](spark, SF_ORACLE))
        assert n(r"\bSortMergeJoin\b", p5) >= 2
        assert n(r"BroadcastHashJoin", p5) >= 2  # nation + region unaffected

    def test_under_cap_keeps_every_broadcast(self, spark):
        """With the real cap, the memoized decision is broadcast for all
        three gated tables at test scale (plan gates above already pin the
        resulting plans; this pins the decision surface itself)."""
        from filebeat_to_clickhouse_spark.queries import _dim_hint

        import pyspark.sql.functions as F

        for name in ("customer", "supplier", "part"):
            assert _dim_hint(SF_ORACLE, name) is F.broadcast, name


class TestRuntimeBloomFilter:
    """r10 second sitting: runtime Bloom-filter injection (SPARK-32268,
    guide §3.2) is opened up via session.RUNTIME_CONFS thresholds. Two
    invariants: (a) at test/bench scale NO scan crosses the 256 MB
    application-side threshold, so every plan gate above is unaffected;
    (b) when the injection does fire (thresholds forced down), it is a
    pure pre-shuffle filter — results are bit-identical (Bloom filters
    have no false negatives)."""

    BLOOM_KEYS = (
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.optimizer.runtime.bloomFilter.expectedNumItems",
        "spark.sql.optimizer.runtime.bloomFilter.numBits",
    )

    def test_confs_declared_and_quiet_at_test_scale(self, spark):
        from filebeat_to_clickhouse_spark.queries import QUERIES
        from filebeat_to_clickhouse_spark.session import RUNTIME_CONFS

        for k in self.BLOOM_KEYS:
            assert k in RUNTIME_CONFS, k
        assert RUNTIME_CONFS["spark.sql.optimizer.runtime.bloomFilter.enabled"] == "true"
        # quiet at test scale: the largest test scan is far below the
        # application-side threshold, so no might_contain anywhere
        for q in ("q5_local_supplier_volume", "q3_shipping_priority"):
            assert "might_contain" not in plan_of(QUERIES[q](spark, SF_ORACLE)), q

    SF10 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf10")

    @pytest.mark.skipif(
        not os.path.isdir(SF10),
        reason="needs .scratch/sf10 (make_scale_data.py --copies 100): the "
        "injection self-gates on the creation side outgrowing the broadcast "
        "threshold, which no test SF reaches — measured fire + 8-query "
        "result-identity at sf10 recorded in OPTIMIZATION_r10.md",
    )
    def test_fire_at_scale_is_result_identical(self, spark):
        """At sf10 the q5 orderkey join's creation side (orders, date-
        filtered) is past the broadcast threshold and the lineitem scan is
        past the application floor, so the injection fires — and being a
        Bloom filter (no false negatives) the rows are identical."""
        from filebeat_to_clickhouse_spark.queries import QUERIES

        def rows(df):
            return sorted(map(tuple, df.collect()))

        key = "spark.sql.optimizer.runtime.bloomFilter.enabled"
        prior = spark.conf.get(key)  # restore the SESSION value, not a literal (r10 advice)
        spark.conf.set(key, "false")
        try:
            baseline = rows(QUERIES["q5_local_supplier_volume"](spark, self.SF10))
        finally:
            spark.conf.set(key, prior)
        df = QUERIES["q5_local_supplier_volume"](spark, self.SF10)
        assert "might_contain" in plan_of(df)  # the injection fired
        assert rows(df) == baseline  # and changed nothing
