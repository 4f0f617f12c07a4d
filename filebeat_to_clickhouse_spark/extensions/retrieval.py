"""Lexical + hybrid retrieval over the ingested corpus: integer-exact
BM25 ranking and reciprocal-rank fusion with a vector ranker.

Reference parity: the reference ships log documents into ClickHouse and
documents search-style analytics over them as its query surface
(reference README.md:516-527); relevance-ranked full-text retrieval is
that capability's search face, re-expressed Spark-first. The vector leg
reuses ``similarity.brute_force_topk`` / the ANN rungs, so hybrid
(lexical + semantic) retrieval composes from parts that already carry
their own scale stories.

Determinism contract — every score is the SAME BIGINT in Spark and
DuckDB, so the oracle hash-compares exactly (no doubles anywhere):

- tokens: ``filter(split(lower(text), ' '), t -> t <> '')``; dl = token
  count; N = corpus doc count; L = corpus token count; df = docs
  containing the term.
- term weight (quarter-bit quantized Lucene idf with a BM25+-style
  floor)::

      p     = 1 + ((2*df + 1) * 32767) div (2*N + 2)       -- 15-bit fixed-point of (df+0.5)/(N+1)
      idf_q = greatest(60 - length(bin(p^4)), 0)            -- floor(4*log2((N+1)/(df+0.5))), quarter-bits
      w     = idf_q + 1

  ``length(bin(p^4)) = floor(4*log2 p) + 1`` is the exact integer
  quarter-bit log identity pinned by TestQuarterBitLogIdentity (the DSIR
  scorer uses the same kernel). The ``+ 1`` is the BM25+ lower-bound
  idea (Lv & Zhai, CIKM 2011): a matched term always contributes at
  least its tf-saturation part, so ranking stays tf-driven on corpora
  whose query terms are so common that the quantized idf floors to 0
  (exactly this testdata: 30 near-uniform terms, df/N ≈ 0.85).
- tf saturation at the standard k1 = 1.2 = 6/5, b = 0.75 = 3/4,
  cleared of fractions by multiplying through by 10*L and quantized to
  2^20 fixed point (one exact integer division)::

      tf_q = (22*tf*L * 1048576) div (10*tf*L + 3*L + 9*dl*N)

  (sanity: tf=1, dl=avgdl -> 2^20; tf -> inf -> 2.2 * 2^20 = k1+1.)
- score(doc, query) = sum over matched query terms of w * tf_q — a
  BIGINT sum, so aggregation order cannot perturb it.

Overflow bounds (int64): the tf numerator 22*tf*L*2^20 is exact while
tf*L < 4*10^11 — corpora to ~10^10 tokens at tf <= 40. Past that widen
the bound columns to DECIMAL(38,0); the mixture planners document the
same widening route.

Scale posture: ONE corpus scan (column-pruned to id + text), per-row
token folds with bound-column materialization (HOF lambdas get no CSE),
the df/stats aggregates partial-combine to <= n_terms + 1 rows, the
model joins back as broadcasts, and the only data-sized shuffle is the
(query_id, doc_id) score combine. Top-k uses the two-phase salted
ranking window, so one dominant query cannot serialize ranking into a
single task.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from ..operators import salted_window_topk

IDF_PROB_MAX = 32767  # 15-bit fixed-point probability ceiling
TF_SCALE = 1 << 20  # fixed-point scale of the tf-saturation quotient
RRF_SCALE = 1 << 30  # fixed-point scale of the reciprocal-rank terms


def _nonempty_tokens(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.col(text_col)), " "), lambda t: t != F.lit("")
    )


def _base_scan(
    docs: DataFrame, terms: list[str], text_col: str, id_col: str
) -> DataFrame:
    """One corpus scan → (id, _dl, _qt): doc length + the doc's tokens
    restricted to the query vocabulary, materialized as BOUND columns
    (each per-term tf below re-filters _qt; without the bound column the
    lambda would re-split and re-lower the text per term — HOF lambdas
    get no CSE). localCheckpoint'd because both the corpus stats and the
    match explode consume it."""
    terms_lit = F.array(*[F.lit(t) for t in terms])
    toks = _nonempty_tokens(text_col)
    return (
        docs.select(
            F.col(id_col),
            F.size(toks).cast("bigint").alias("_dl"),
            F.filter(toks, lambda t: F.array_contains(terms_lit, t)).alias("_qt"),
        )
        .localCheckpoint(eager=False)
    )


def _match_rows(base: DataFrame, terms: list[str], id_col: str) -> DataFrame:
    """(id, _dl, term, tf) for tf > 0 only — zero shuffle; output is
    bounded by occurrences of query terms, not by corpus size."""
    terms_lit = F.array(*[F.lit(t) for t in terms])
    entries = F.filter(
        F.transform(
            terms_lit,
            lambda term: F.struct(
                term.alias("term"),
                F.size(F.filter(F.col("_qt"), lambda x: x == term))
                .cast("bigint")
                .alias("tf"),
            ),
        ),
        lambda s: s["tf"] > 0,
    )
    return base.select(
        F.col(id_col), "_dl", F.explode(entries).alias("_e")
    ).select(F.col(id_col), "_dl", F.col("_e.term").alias("term"), F.col("_e.tf").alias("tf"))


def _weight_expr() -> Column:
    """Quarter-bit Lucene idf + the BM25+ delta floor, from bound
    columns ``df`` and ``_n_docs``."""
    p = F.expr(f"CAST(1 AS BIGINT) + ((2 * df + 1) * {IDF_PROB_MAX}) div (2 * _n_docs + 2)")
    p4 = p * p * p * p
    idf_q = F.greatest(
        F.lit(0).cast("bigint"),
        (F.lit(60) - F.length(F.bin(p4))).cast("bigint"),
    )
    return idf_q + F.lit(1).cast("bigint")


def bm25_model(matches: DataFrame, base: DataFrame) -> DataFrame:
    """The broadcastable model artifact → (term, df, w, _n_docs,
    _total): per-term document frequency and quantized weight plus the
    corpus constants the scorer needs. <= n_query_terms rows; this is
    what the streaming scorer collects once and bakes into its plan."""
    stats = base.agg(
        F.count(F.lit(1)).cast("bigint").alias("_n_docs"),
        F.sum("_dl").cast("bigint").alias("_total"),
    )
    dftab = matches.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    return (
        dftab.crossJoin(F.broadcast(stats))
        .withColumn("w", _weight_expr())
        .select("term", "df", "w", "_n_docs", "_total")
    )


def _with_contrib(scored: DataFrame) -> DataFrame:
    """Per-(doc, term) BM25 contribution from bound columns tf, _dl, w,
    _n_docs, _total — the fixed-point tf saturation times the term
    weight (module docstring has the derivation); `div` keeps the
    division in exact integer space (a double quotient would round the
    >2^53 dividend before dividing)."""
    return (
        scored.withColumn(
            "_tfnum",
            F.lit(22).cast("bigint") * F.col("tf") * F.col("_total") * F.lit(TF_SCALE),
        )
        .withColumn(
            "_tfden",
            F.lit(10).cast("bigint") * F.col("tf") * F.col("_total")
            + F.lit(3).cast("bigint") * F.col("_total")
            + F.lit(9).cast("bigint") * F.col("_dl") * F.col("_n_docs"),
        )
        .withColumn("_contrib", F.col("w") * F.expr("_tfnum div _tfden"))
    )


def bm25_corpus_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One standing query: BM25 score of every document matching at
    least one of ``terms`` → (<id_col>, score). This is the scoring core
    ``bm25_topk`` ranks, exposed so the streaming twin
    (``streaming.pipeline.bm25_score_stream``) has a batch face to be
    bit-exact against (pinned by test)."""
    ts = sorted(set(terms))
    base = _base_scan(docs, ts, text_col, id_col)
    matches = _match_rows(base, ts, id_col)
    model = bm25_model(matches, base)
    scored = _with_contrib(matches.join(F.broadcast(model), "term"))
    return scored.groupBy(id_col).agg(
        F.sum("_contrib").cast("bigint").alias("score")
    )


def bm25_topk(
    docs: DataFrame,
    queries: dict[object, list[str]],
    k: int = 10,
    n_salt: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 top-k per query → (query_id, <id_col>, score, rank), score
    and rank BIGINT, ties broken by ascending id. ``queries`` maps a
    query id (all int or all str) to its bag of terms; terms absent from
    the corpus contribute nothing (df = 0 rows never reach the model).

    Plan: scan → in-row matches → tiny df/stats aggregates → broadcast
    model join → one partial-combined (query_id, id) shuffle → salted
    two-phase top-k. See the module docstring for the exact integer
    score contract."""
    spark = docs.sparkSession
    terms = sorted({t for ts in queries.values() for t in ts})
    if not terms:
        raise ValueError("queries must contain at least one term")
    base = _base_scan(docs, terms, text_col, id_col)
    matches = _match_rows(base, terms, id_col)
    model = bm25_model(matches, base)

    ids = list(queries)
    id_type = "bigint" if all(isinstance(q, int) for q in ids) else "string"
    qrows = spark.createDataFrame(
        sorted({(q, t) for q, ts in queries.items() for t in ts}),
        schema=f"query_id {id_type}, term string",
    )

    scored = _with_contrib(
        matches.join(F.broadcast(model), "term").join(F.broadcast(qrows), "term")
    )
    per_q = scored.groupBy("query_id", id_col).agg(
        F.sum("_contrib").cast("bigint").alias("score")
    )
    out = salted_window_topk(
        per_q,
        ("query_id",),
        (F.desc("score"), F.asc(id_col)),
        k=k,
        n_salt=n_salt,
        salt_cols=("query_id", "score", id_col),
    )
    return out.select(
        "query_id", id_col, "score", F.col("rank").cast("bigint").alias("rank")
    )


def rrf_fuse(
    lexical: DataFrame,
    vector: DataFrame,
    k: int = 10,
    rrf_k: int = 60,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR 2009) of two rank
    lists → (query_id, <id_col>, rrf_score, rank). Each ranker
    contributes ``2^30 div (rrf_k + rank)`` — the fixed-point integer
    form of 1/(60+r), so the fused score is an exact BIGINT and the
    oracle compares bit-for-bit; an item missing from one list
    contributes 0 from that list (the standard convention).

    Both inputs are already per-query top-m lists, so this whole
    operator runs on <= 2m rows per query — the plain ranking window
    here is over a bounded set by construction, not corpus-sized."""
    a = lexical.select(query_col, id_col, F.col(rank_col).alias("_ra"))
    b = vector.select(query_col, id_col, F.col(rank_col).alias("_rb"))
    fused = (
        a.join(b, [query_col, id_col], "full_outer")
        .withColumn(
            "rrf_score",
            F.coalesce(F.expr(f"{RRF_SCALE} div ({rrf_k} + _ra)"), F.lit(0).cast("bigint"))
            + F.coalesce(F.expr(f"{RRF_SCALE} div ({rrf_k} + _rb)"), F.lit(0).cast("bigint")),
        )
    )
    out = salted_window_topk(
        fused.select(query_col, id_col, "rrf_score"),
        (query_col,),
        (F.desc("rrf_score"), F.asc(id_col)),
        k=k,
        n_salt=4,
        salt_cols=(query_col, "rrf_score", id_col),
    )
    return out.select(
        query_col, id_col, "rrf_score", F.col("rank").cast("bigint").alias("rank")
    )
