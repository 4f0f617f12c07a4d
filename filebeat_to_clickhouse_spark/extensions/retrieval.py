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

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from ..operators import salted_window_topk
from .similarity import _dot, _norm, as_double_vec

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
    get no CSE). Lineage-CUT because both the corpus stats and the match
    explode consume it — localCheckpoint by default, but routed through
    the checkpointing policy (``SPARK_GRAFT_CHECKPOINT_DIR``) so a real
    cluster can make the cut survive executor loss, exactly like the
    iterative operators (r7 verdict item 8)."""
    from ..checkpointing import default_checkpoint_dir, make_lineage_cut

    terms_lit = F.array(*[F.lit(t) for t in terms])
    toks = _nonempty_tokens(text_col)
    cut = make_lineage_cut(default_checkpoint_dir())
    return cut(
        docs.select(
            F.col(id_col),
            F.size(toks).cast("bigint").alias("_dl"),
            F.filter(toks, lambda t: F.array_contains(terms_lit, t)).alias("_qt"),
        ),
        eager=False,
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


def _weight_expr(df_col: str = "df") -> Column:
    """Quarter-bit Lucene idf + the BM25+ delta floor, from the bound
    df column named ``df_col`` and ``_n_docs``."""
    p = F.expr(
        f"CAST(1 AS BIGINT) + ((2 * {df_col} + 1) * {IDF_PROB_MAX}) div (2 * _n_docs + 2)"
    )
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
    what the streaming scorer collects once and bakes into its plan.

    This is the from-matches derivation (two aggregation jobs); the
    batch scorers below derive the identical artifact in ONE pass via
    ``_model_from_base``. Kept because the streaming artifact path
    already holds a match stream and the bit-equality test pins the two
    derivations to each other."""
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


def _stats_row(base: DataFrame, terms: list[str]) -> DataFrame:
    """ONE partial-combinable aggregation over the base scan → a 1-row
    frame (_n_docs, _total, _df_0.., _w_0..): corpus stats, every term's
    df (df = count of docs whose bound ``_qt`` contains the term — the
    same tf > 0 predicate the match explode applies), and every term's
    quantized weight derived right in the row. The single model pass
    both the artifact unpivot and the in-row scorer broadcast from."""
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("_n_docs"),
        F.sum("_dl").cast("bigint").alias("_total"),
    ] + [
        F.sum(F.array_contains(F.col("_qt"), F.lit(t)).cast("bigint")).alias(f"_df_{i}")
        for i, t in enumerate(terms)
    ]
    row = base.agg(*aggs)
    return row.select(
        "*", *[_weight_expr(f"_df_{i}").alias(f"_w_{i}") for i in range(len(terms))]
    )


def _model_from_base(base: DataFrame, terms: list[str]) -> DataFrame:
    """Single-aggregation BM25 model: the 1-row ``_stats_row`` aggregate
    unpivots to the (term, df, w, _n_docs, _total) artifact shape of
    ``bm25_model``. Saves one whole aggregation job + broadcast per
    query — the model derivation is exactly one corpus-stats pass.
    df = 0 terms are dropped, exactly as the groupBy form never produced
    them."""
    entries = F.array(
        *[
            F.struct(
                F.lit(t).alias("term"),
                F.col(f"_df_{i}").alias("df"),
                F.col(f"_w_{i}").alias("w"),
            )
            for i, t in enumerate(terms)
        ]
    )
    return (
        _stats_row(base, terms)
        .select(F.explode(entries).alias("_e"), "_n_docs", "_total")
        .select(
            F.col("_e.term").alias("term"),
            F.col("_e.df").alias("df"),
            F.col("_e.w").alias("w"),
            "_n_docs",
            "_total",
        )
        .filter(F.col("df") > 0)
        .select("term", "df", "w", "_n_docs", "_total")
    )


# In-row scoring bounds: past these the per-row expression tree (one
# bound tf column per term, one contribution sum per query) stops being
# the cheap path and the broadcast-join + partial-combined groupBy form
# scales better (its cost is |matches|, independent of the query count).
INROW_MAX_TERMS = 64
INROW_MAX_CELLS = 256


def _inrow_query_scores(
    base: DataFrame, terms: list[str], queries: dict, id_col: str
) -> DataFrame:
    """(query_id bigint, <id_col>, score bigint) for every (query, doc)
    with >= 1 matched term — computed ENTIRELY in-row, zero shuffle:

    - the 1-row ``_stats_row`` (stats + per-term df and w) cross-joins
      in as a broadcast, so every scoring input is a bound column;
    - per-term tf is one bound column per term (HOF lambdas get no CSE,
      so each tf is materialized once and every query's sum reuses it);
    - a doc explodes to its per-query (score, matched) structs and
      unmatched pairs are filtered — the exact rows the broadcast-join +
      groupBy form emits, with the (query_id, doc) score combine done
      by integer addition inside the row instead of a corpus-sized
      shuffle (BIGINT addition is associative: bit-identical).

    tf = 0 terms contribute exactly 0 (the contribution numerator is
    22·tf·L·2^20), so no per-term conditional is needed; matched is
    sum(tf) > 0. This is the few-standing-queries fast path — callers
    gate it on INROW_MAX_TERMS/INROW_MAX_CELLS."""
    idx = {t: i for i, t in enumerate(terms)}

    def tf_col(term: str) -> Column:
        # closure, NOT a default-arg lambda: a 2-arg HOF lambda would be
        # called as (element, index) and shadow the bound term
        lit = F.lit(term)
        return F.size(F.filter(F.col("_qt"), lambda x: x == lit)).cast("bigint")

    row = _stats_row(base, terms)
    with_tf = base.crossJoin(F.broadcast(row)).select(
        F.col(id_col),
        "_dl",
        "_n_docs",
        "_total",
        *[F.col(f"_w_{i}") for i in range(len(terms))],
        *[tf_col(t).alias(f"_tf_{i}") for t, i in idx.items()],
    )

    def contrib(i: int) -> Column:
        # greatest(..., 1) only guards the all-empty-docs corpus
        # (_total = 0): there tf = 0 makes the numerator 0 anyway, and
        # whenever _total > 0 the denominator is already positive — so
        # the value is unchanged on every row the matched filter keeps.
        # (The join form never sees this: it scores only tf > 0 rows.)
        return F.expr(
            f"_w_{i} * ((22 * _tf_{i} * _total * {TF_SCALE}) div "
            f"greatest(10 * _tf_{i} * _total + 3 * _total + 9 * _dl * _n_docs, 1))"
        )

    qstructs = []
    for qid in sorted(queries):
        idxs = sorted({idx[t] for t in queries[qid]})
        if idxs:
            score = sum((contrib(i) for i in idxs[1:]), contrib(idxs[0]))
            nmatch = sum(
                (F.col(f"_tf_{i}") for i in idxs[1:]), F.col(f"_tf_{idxs[0]}")
            )
            matched = nmatch > F.lit(0)
        else:
            score, matched = F.lit(0).cast("bigint"), F.lit(False)
        qstructs.append(
            F.struct(
                F.lit(qid).cast("bigint").alias("query_id"),
                score.cast("bigint").alias("score"),
                matched.alias("_m"),
            )
        )
    return (
        with_tf.select(F.col(id_col), F.explode(F.array(*qstructs)).alias("_q"))
        .filter(F.col("_q._m"))
        .select(
            F.col("_q.query_id").alias("query_id"),
            F.col(id_col),
            F.col("_q.score").alias("score"),
        )
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
    model = _model_from_base(base, ts)
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

    Plan, few standing queries (the INROW_MAX_TERMS/INROW_MAX_CELLS
    gate, integer query ids): scan → broadcast 1-row stats/weights →
    in-row per-query scores (``_inrow_query_scores`` — ZERO shuffle
    before ranking) → salted two-phase top-k. Larger query sets (or
    string ids) take the general form: scan → in-row matches → one-pass
    model broadcast join → partial-combined (query_id, id) score
    shuffle → salted top-k, whose cost is |matches| independent of the
    query count. Both forms are row-identical: the hypothesis model test
    drives the in-row path, and the join form is pinned against the same
    pure-Python model under string query ids (which force it). See the
    module docstring for the exact integer score contract."""
    spark = docs.sparkSession
    terms = sorted({t for ts in queries.values() for t in ts})
    if not terms:
        raise ValueError("queries must contain at least one term")
    base = _base_scan(docs, terms, text_col, id_col)

    ids = list(queries)
    all_int = all(isinstance(q, int) for q in ids)
    if (
        all_int
        and len(terms) <= INROW_MAX_TERMS
        and len(terms) * len(queries) <= INROW_MAX_CELLS
    ):
        per_q = _inrow_query_scores(base, terms, queries, id_col)
    else:
        matches = _match_rows(base, terms, id_col)
        model = _model_from_base(base, terms)
        qrows = spark.createDataFrame(
            sorted({(q, t) for q, ts in queries.items() for t in ts}),
            schema=f"query_id {'bigint' if all_int else 'string'}, term string",
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


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: dict[int, list[str]],
    k: int = 10,
    m: int = 20,
    rrf_k: int = 60,
    n_salt: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """FUSED hybrid retrieval: BM25 top-``m`` + exact-cosine top-``m``
    fused by reciprocal-rank fusion into a top-``k`` per query →
    (query_id, <id_col>, rrf_score, rank). ``queries`` maps an integer
    query id to its term bag; the SAME id selects the query vector from
    ``embeddings`` (the parallel-table convention, doc_id = vec_id).

    Row-identical to the composed form
    ``rrf_fuse(bm25_topk(..., k=m), brute_force_topk(..., k=m), k=k)``
    (pinned by test) but structurally collapsed — the composed plan was
    ~12 jobs deep and the round-6 suite's one perf-weak entry:

    - ONE documents scan: the localCheckpoint'd base projection feeds
      both the 1-row stats/weights aggregate and the scorer.
    - ZERO shuffles before ranking on the lexical leg (small standing-
      query sets): per-(query, doc) BM25 computed in-row against the
      broadcast stats row (``_inrow_query_scores``), and the cosine leg
      is map-side against the broadcast query vectors already.
    - ONE shared salted prune ranks BOTH legs: the legs union with a
      ``_leg`` tag and take the two-phase top-k in one pair of windows
      over (query_id, _leg) — replacing bm25_topk's salted pair AND
      brute_force_topk's plain per-query window (which sent each
      query's whole corpus-sized candidate list to one task: with 2
      queries that was a 2-task stage; here hot queries spread across
      ``n_salt`` tasks). Within a leg partition the other leg's score
      column is entirely NULL (desc = nulls-last makes it a no-op sort
      key), so one (score_lex desc, score_vec desc, id asc) order is a
      total order for both legs at once.
    - Fusion is a groupBy, not a join: each surviving (query, doc, leg)
      row contributes its fixed-point ``2^30 div (rrf_k + rank)`` and
      the sum per (query, doc) IS the RRF score — the full-outer join
      of the composed form computes exactly this with one extra
      two-sided shuffle.
    - The whole post-prune tail (phase-2 window, RRF groupBy, final
      window) rides ONE repartition on query_id — every step needs
      clustering only by a superset of {query_id}, and its input is
      <= m·n_salt rows per (query, leg) by construction, so the plan
      has exactly two data exchanges end to end (plan-gated).

    The cosine leg reuses similarity's ``_dot``/``_norm`` folds with the
    same projection shape as ``brute_force_topk`` (norms bound per side,
    never per pair), so the doubles — and therefore the ranks and the
    integer rrf_score — are bit-identical to the composed form and to
    the DuckDB oracle's replay. Self-matches are excluded on the vector
    leg only (a term query has no self)."""
    if not queries:
        raise ValueError("queries must be non-empty")
    if not all(isinstance(q, int) for q in queries):
        raise ValueError("query ids must be ints (they select query vectors by id)")
    terms = sorted({t for ts in queries.values() for t in ts})
    if not terms:
        raise ValueError("queries must contain at least one term")
    qids = sorted(queries)

    # lexical leg: one corpus scan -> integer BM25 per (query, doc),
    # computed in-row when the standing-query set is small enough (zero
    # shuffle before ranking), else the general join + combine form
    base = _base_scan(docs, terms, text_col, id_col)
    if len(terms) <= INROW_MAX_TERMS and len(terms) * len(queries) <= INROW_MAX_CELLS:
        lex = _inrow_query_scores(base, terms, queries, id_col).withColumnRenamed(
            "score", "_score_lex"
        )
    else:
        matches = _match_rows(base, terms, id_col)
        model = _model_from_base(base, terms)
        qrows = docs.sparkSession.createDataFrame(
            sorted({(q, t) for q, ts in queries.items() for t in ts}),
            schema="query_id bigint, term string",
        )
        lex = (
            _with_contrib(
                matches.join(F.broadcast(model), "term").join(
                    F.broadcast(qrows), "term"
                )
            )
            .groupBy("query_id", id_col)
            .agg(F.sum("_contrib").cast("bigint").alias("_score_lex"))
        )

    # vector leg: brute_force_topk's exact projection shapes (norms per
    # side), scored map-side against the broadcast query vectors
    q = embeddings.filter(F.col(vec_id_col).isin(qids)).select(
        F.col(vec_id_col).cast("bigint").alias("q_id"),
        as_double_vec(F.col(vec_col)).alias("q_vec"),
    )
    q = q.select("q_id", "q_vec", _norm(F.col("q_vec")).alias("_qn"))
    c = embeddings.select(
        F.col(vec_id_col).cast("bigint").alias("neighbor_id"),
        as_double_vec(F.col(vec_col)).alias("c_vec"),
    )
    c = c.select("neighbor_id", "c_vec", _norm(F.col("c_vec")).alias("_cn"))
    # nullif: zero-norm vectors score NULL (ranked last), never NaN
    # (ranked FIRST under desc) — the identical guard brute_force_topk
    # carries, so row-identity with the composed form holds
    vec = c.join(F.broadcast(q), F.col("neighbor_id") != F.col("q_id")).select(
        F.col("q_id").alias("query_id"),
        F.col("neighbor_id").alias(id_col),
        (
            _dot(F.col("q_vec"), F.col("c_vec"))
            / F.nullif(F.col("_qn") * F.col("_cn"), F.lit(0.0))
        ).alias("_score_vec"),
    )

    both = lex.select(
        "query_id",
        id_col,
        F.lit(1).alias("_leg"),
        F.col("_score_lex"),
        F.lit(None).cast("double").alias("_score_vec"),
    ).unionByName(
        vec.select(
            "query_id",
            id_col,
            F.lit(2).alias("_leg"),
            F.lit(None).cast("bigint").alias("_score_lex"),
            F.col("_score_vec"),
        )
    )
    # Ranking tail in exactly TWO exchanges. Phase 1 is the salted local
    # prune (hash on (query, leg, salt) — the only corpus-sized shuffle;
    # a hot query spreads over n_salt tasks). Everything after runs on
    # <= m x n_salt rows per (query, leg) BY CONSTRUCTION, so one
    # repartition on query_id alone clusters ALL remaining steps: the
    # phase-2 window on (query, leg), the RRF groupBy on (query, doc),
    # and the final window on (query) each require only clustering by a
    # SUPERSET of {query_id} — a hash partitioning on a subset of the
    # required keys satisfies ClusteredDistribution, so Catalyst inserts
    # no further exchange (plan-gated). The inlined two-phase top-k is
    # row-identical to salted_window_topk (same salt, same windows —
    # only the phase-2 clustering is coarser).
    order = (
        F.desc_nulls_last("_score_lex"),
        F.desc_nulls_last("_score_vec"),
        F.asc(id_col),
    )
    salt = F.pmod(
        F.xxhash64(
            F.struct("query_id", "_leg", "_score_lex", "_score_vec", id_col)
        ),
        F.lit(n_salt),
    ).cast("int")
    w_local = Window.partitionBy("query_id", "_leg", "_salt").orderBy(*order)
    survivors = (
        both.withColumn("_salt", salt)
        .withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= m)
        .drop("_salt", "_lr")
        .repartition("query_id")
    )
    w_leg = Window.partitionBy("query_id", "_leg").orderBy(*order)
    ranked = (
        survivors.withColumn("rank", F.row_number().over(w_leg))
        .filter(F.col("rank") <= m)
    )
    fused = ranked.groupBy("query_id", id_col).agg(
        F.sum(F.expr(f"{RRF_SCALE} div ({rrf_k} + rank)"))
        .cast("bigint")
        .alias("rrf_score")
    )
    w_final = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w_final))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            id_col,
            "rrf_score",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
