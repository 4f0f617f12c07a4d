"""Retrieval surface (extensions/retrieval.py): integer-exact BM25 and
reciprocal-rank fusion.

The oracle harness already hash-checks both registered queries against
DuckDB at sf0.01; these tests pin the semantics the oracle can't reach —
arbitrary corpora (hypothesis vs a pure-Python model of the same integer
contract), the rank-fusion algebra, and batch/stream bit-exactness."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from hypothesis import given, settings, strategies as st

from filebeat_to_clickhouse_spark.extensions import retrieval

SETTINGS = dict(max_examples=5, deadline=None)

_VOCAB = ["a", "b", "c", "d"]
_TEXTS = st.lists(
    st.lists(st.sampled_from(_VOCAB + ["zz"]), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=24,
)
_QUERIES = {0: ["a", "b"], 1: ["c"], 2: ["d", "a", "d"]}  # dup term on purpose


def py_bm25_topk(texts: list[str], queries: dict[int, list[str]], k: int):
    """Pure-Python model of the module's exact integer contract."""
    toks = {i: [t for t in txt.lower().split(" ") if t] for i, txt in enumerate(texts)}
    n = len(texts)
    total = sum(len(ts) for ts in toks.values())
    terms = sorted({t for ts in queries.values() for t in ts})
    df = {t: sum(1 for ts in toks.values() if t in ts) for t in terms}

    def weight(t):
        p = 1 + ((2 * df[t] + 1) * 32767) // (2 * n + 2)
        return max(60 - (p**4).bit_length(), 0) + 1

    out = []
    for qid, qts in queries.items():
        scores = {}
        for i, ts in toks.items():
            dl = len(ts)
            s = 0
            matched = False
            for t in set(qts):
                tf = ts.count(t)
                if tf == 0 or df[t] == 0:
                    continue
                matched = True
                tf_q = (22 * tf * total * 1048576) // (
                    10 * tf * total + 3 * total + 9 * dl * n
                )
                s += weight(t) * tf_q
            if matched:
                scores[i] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out.extend(
            (qid, i, s, r + 1) for r, (i, s) in enumerate(ranked)
        )
    return sorted(out)


class TestBm25:
    @settings(**SETTINGS)
    @given(_TEXTS)
    def test_matches_python_model(self, spark, texts):
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        got = sorted(
            (r["query_id"], r["doc_id"], r["score"], r["rank"])
            for r in retrieval.bm25_topk(docs, _QUERIES, k=5).collect()
        )
        assert got == py_bm25_topk(texts, _QUERIES, k=5)

    def test_rare_term_outranks_common(self, spark):
        """A doc matching the rare term beats any common-term-only doc at
        equal tf — the idf quantization must keep at least that much
        signal on a skewed df profile."""
        texts = ["x common"] * 20 + ["x rare"]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        out = retrieval.bm25_topk(docs, {0: ["rare", "common"]}, k=21).collect()
        top = min(out, key=lambda r: r["rank"])
        assert top["doc_id"] == 20

    @settings(**SETTINGS)
    @given(_TEXTS)
    def test_join_form_matches_python_model(self, spark, texts):
        """STRING query ids force the general broadcast-join + combine
        form (the in-row gate requires all-int ids), so the join form is
        row-pinned against the same pure-Python model the in-row path is
        — previously only a plan-shape test reached it (r7 advice)."""
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        str_queries = {f"q{qid}": ts for qid, ts in _QUERIES.items()}
        got = sorted(
            (int(r["query_id"][1:]), r["doc_id"], r["score"], r["rank"])
            for r in retrieval.bm25_topk(docs, str_queries, k=5).collect()
        )
        assert got == py_bm25_topk(texts, _QUERIES, k=5)

    def test_empty_queries_raise(self, spark):
        docs = spark.createDataFrame([(0, "a")], "doc_id bigint, text string")
        with pytest.raises(ValueError):
            retrieval.bm25_topk(docs, {0: []})

    def test_absent_terms_yield_empty(self, spark):
        docs = spark.createDataFrame([(0, "a b")], "doc_id bigint, text string")
        assert retrieval.bm25_topk(docs, {0: ["zz"]}).count() == 0


class TestRrfFuse:
    def test_matches_python_model(self, spark):
        lex = [(0, d, r + 1) for r, d in enumerate([5, 3, 9, 1])]
        vec = [(0, d, r + 1) for r, d in enumerate([3, 7, 5])]
        a = spark.createDataFrame(lex, "query_id bigint, doc_id bigint, rank bigint")
        b = spark.createDataFrame(vec, "query_id bigint, doc_id bigint, rank bigint")
        got = {
            (r["query_id"], r["doc_id"]): (r["rrf_score"], r["rank"])
            for r in retrieval.rrf_fuse(a, b, k=10).collect()
        }
        S = 1 << 30
        ra = {d: r for _, d, r in lex}
        rb = {d: r for _, d, r in vec}
        fused = {
            d: S // (60 + ra[d]) if d in ra else 0 for d in set(ra) | set(rb)
        }
        for d in rb:
            fused[d] += S // (60 + rb[d])
        ranked = sorted(fused.items(), key=lambda kv: (-kv[1], kv[0]))
        want = {
            (0, d): (s, r + 1) for r, (d, s) in enumerate(ranked)
        }
        assert got == want

    def test_item_in_both_lists_beats_single_list_at_same_rank(self, spark):
        a = spark.createDataFrame(
            [(0, 1, 1), (0, 2, 2)], "query_id bigint, doc_id bigint, rank bigint"
        )
        b = spark.createDataFrame(
            [(0, 2, 1)], "query_id bigint, doc_id bigint, rank bigint"
        )
        out = {r["doc_id"]: r["rank"] for r in retrieval.rrf_fuse(a, b, k=5).collect()}
        assert out[2] == 1 and out[1] == 2


class TestFusedHybrid:
    """The round-7 fused hybrid (one shared salted top-k, groupBy fusion)
    must be ROW-IDENTICAL to the composed form it replaced — that is the
    whole refactor contract; the oracle hash then transfers for free."""

    def _tables(self, spark):
        from filebeat_to_clickhouse_spark.io import load_table

        sf = "/root/testdata/sf0.001"
        return load_table(spark, sf, "documents"), load_table(spark, sf, "embeddings")

    def test_fused_matches_composed(self, spark):
        from filebeat_to_clickhouse_spark.extensions import similarity

        docs, emb = self._tables(spark)
        queries = {0: ["spark", "join"], 1: ["dup", "stream"]}
        fused = {
            tuple(r)
            for r in retrieval.hybrid_rrf_topk(docs, emb, queries, k=10, m=20).collect()
        }
        lex = retrieval.bm25_topk(docs, queries, k=20)
        vec = similarity.brute_force_topk(
            emb, emb.filter(F.col("vec_id") < 2), k=20
        ).select(
            F.col("q_id").alias("query_id"),
            F.col("neighbor_id").alias("doc_id"),
            "rank",
        )
        composed = {
            tuple(r)
            for r in retrieval.rrf_fuse(
                lex.select("query_id", "doc_id", "rank"), vec, k=10
            ).collect()
        }
        assert fused == composed

    def test_doc_absent_from_one_leg_still_fuses(self, spark):
        """A doc in only one leg's top-m must still appear with the other
        leg contributing 0 — the groupBy fusion must not turn the outer
        semantics into inner semantics."""
        docs = spark.createDataFrame(
            [(0, "alpha alpha"), (1, "beta"), (2, "gamma")],
            "doc_id bigint, text string",
        )
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0])],
            "vec_id bigint, embedding array<double>",
        )
        out = {
            r["doc_id"]: r["rrf_score"]
            for r in retrieval.hybrid_rrf_topk(
                docs, emb, {0: ["alpha"]}, k=10, m=2
            ).collect()
        }
        S = 1 << 30
        # doc 0: lex rank 1 (only alpha match) + excluded from own vector
        # leg (self); docs 1,2 vector-only at ranks 1,2
        assert out[0] == S // 61
        assert out[1] == S // 61 and out[2] == S // 62

    def test_non_int_query_ids_raise(self, spark):
        docs, emb = self._tables(spark)
        with pytest.raises(ValueError):
            retrieval.hybrid_rrf_topk(docs, emb, {"q0": ["spark"]})

    def test_zero_norm_embedding_ranks_last_and_matches_composed(self, spark):
        """An all-zero embedding has no defined cosine: the nullif guard
        scores it NULL (desc = nulls-last) instead of NaN, which Spark
        would sort ABOVE every real double — unguarded, garbage vectors
        silently win the vector leg (r7 advice). Identity with the
        composed form must survive the guard (both carry it)."""
        from filebeat_to_clickhouse_spark.extensions import similarity

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(["alpha x", "beta x", "gamma x", "delta x"])],
            "doc_id bigint, text string",
        )
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5])],
            "vec_id bigint, embedding array<double>",
        )
        queries = {0: ["x"]}
        fused = retrieval.hybrid_rrf_topk(docs, emb, queries, k=4, m=3).collect()
        # doc 2 (zero vector) must NOT outrank the real vectors: on the
        # vector leg it is NULL-scored, so among vector candidates 1,2,3
        # it ranks 3rd; every doc ties on the lexical leg
        vec_ranks = {
            r["neighbor_id"]: r["rank"]
            for r in similarity.brute_force_topk(
                emb, emb.filter(F.col("vec_id") == 0), k=3
            ).collect()
        }
        assert vec_ranks[2] == 3, "zero-norm vector must rank last, not first"
        lex = retrieval.bm25_topk(docs, queries, k=3)
        vec = similarity.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).select(
            F.col("q_id").alias("query_id"), F.col("neighbor_id").alias("doc_id"), "rank"
        )
        composed = retrieval.rrf_fuse(
            lex.select("query_id", "doc_id", "rank"), vec, k=4
        ).collect()
        assert {tuple(r) for r in fused} == {tuple(r) for r in composed}

    def test_reliable_checkpoint_dir_routes_base_scan(self, spark, tmp_path, monkeypatch):
        """With SPARK_GRAFT_CHECKPOINT_DIR set, the retrieval base scan's
        lineage cut must become a RELIABLE checkpoint (files in the dir)
        with unchanged results — executor loss on a real cluster destroys
        localCheckpoint blocks mid-query (r7 verdict item 8)."""
        import os

        docs, emb = self._tables(spark)
        queries = {0: ["spark", "join"], 1: ["dup"]}
        before = retrieval.bm25_topk(docs, queries, k=5).collect()
        ckdir = str(tmp_path / "ck")
        monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", ckdir)
        after = retrieval.bm25_topk(docs, queries, k=5).collect()
        assert sorted(map(tuple, after)) == sorted(map(tuple, before))
        assert any(
            files for _root, _dirs, files in os.walk(ckdir)
        ), "reliable checkpoint dir must hold the materialized cut"


class TestBm25ScoreStream:
    def test_stream_scorer_is_bit_exact_vs_batch(self, spark):
        """bm25_score_stream under a bm25_model artifact must reproduce
        bm25_corpus_scores for every matching document — same integer
        arithmetic, streaming-shaped plan."""
        from filebeat_to_clickhouse_spark.io import load_table
        from filebeat_to_clickhouse_spark.streaming.pipeline import bm25_score_stream

        docs = load_table(spark, "/root/testdata/sf0.001", "documents")
        terms = ["spark", "join", "dup"]
        batch = {
            r["doc_id"]: r["score"]
            for r in retrieval.bm25_corpus_scores(docs, terms).collect()
        }
        base = retrieval._base_scan(docs, sorted(set(terms)), "text", "doc_id")
        model = retrieval.bm25_model(
            retrieval._match_rows(base, sorted(set(terms)), "doc_id"), base
        )
        streamed = {
            r["doc_id"]: r["bm25_score"]
            for r in bm25_score_stream(docs, model, text_col="text").collect()
        }
        # every batch-scored doc identical; stream scores non-matching docs 0
        assert batch == {i: s for i, s in streamed.items() if s != 0}
        assert set(streamed) == {r["doc_id"] for r in docs.collect()}

    def test_null_text_scores_null_unmatched_zero(self, spark):
        from filebeat_to_clickhouse_spark.streaming.pipeline import bm25_score_stream

        model = spark.createDataFrame(
            [("x", 1, 5, 2, 10)], "term string, df bigint, w bigint, _n_docs bigint, _total bigint"
        )
        rows = spark.createDataFrame([("x y",), ("y z",), (None,)], "message string")
        got = {
            r["message"]: (r["bm25_score"], r["n_tokens"])
            for r in bm25_score_stream(rows, model).collect()
        }
        assert got["y z"] == (0, 2)
        assert got[None] == (None, None)
        assert got["x y"][0] > 0 and got["x y"][1] == 2

    def test_empty_model_raises(self, spark):
        from filebeat_to_clickhouse_spark.streaming.pipeline import bm25_score_stream

        model = spark.createDataFrame(
            [], "term string, df bigint, w bigint, _n_docs bigint, _total bigint"
        )
        rows = spark.createDataFrame([("x",)], "message string")
        with pytest.raises(ValueError):
            bm25_score_stream(rows, model)
