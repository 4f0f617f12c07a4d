"""Embedding similarity search: brute-force cosine top-k and LSH-bucketed ANN.

Scale design (100 TB):
- Brute force broadcasts the (small) query set against the full corpus —
  embarrassingly parallel, no shuffle on the corpus side; the only shuffle
  is the per-query top-k (tiny). This is the exact baseline.
- The LSH variant buckets corpus + queries by random-hyperplane sign bits
  (deterministic, hash-derived hyperplanes) and searches only matching
  buckets — the candidate set shrinks ~2^bits-fold; recall is tunable via
  multi-probe (hamming-adjacent buckets).

All vector math is built-in higher-order functions (zip_with/aggregate) on
array<double> — JVM-side, no Python in the row path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def _dot(a: Column, b: Column) -> Column:
    """Left-fold dot product — deterministic evaluation order."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def as_double_vec(c: Column) -> Column:
    return c.cast("array<double>")


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of ``queries`` against ``corpus``.

    Returns (q_id, neighbor_id, cosine_sim, rank). Self-matches excluded.
    The query side is broadcast; ranking ties broken by neighbor id for
    full determinism.
    """
    q = queries.select(
        F.col(id_col).alias("q_id"), as_double_vec(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(F.col(vec_col)).alias("c_vec")
    )
    scored = (
        c.join(F.broadcast(q), F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", cosine_sim(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cosine_sim", "rank")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------

def _hyperplane_coeff(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane coefficient in [-7.5, 7.5]:
    the first hex nibble of md5("<plane>-<dim>") minus 7.5. Reproducible in
    any engine — no RNG state."""
    import hashlib

    return int(hashlib.md5(f"{plane}-{dim}".encode()).hexdigest()[0], 16) - 7.5


def hyperplane_matrix(n_planes: int, n_dims: int) -> list[list[float]]:
    """The (n_planes × n_dims) hyperplane coefficients, computed once on the
    driver — a few KB of constants shipped inside the plan, so per-row work
    is ONLY the dot product (no md5 in the row path; coefficients depend on
    (plane, dim), never on data)."""
    return [[_hyperplane_coeff(p, d) for d in range(n_dims)] for p in range(n_planes)]


def signature_bits(vec: Column, n_planes: int, n_dims: int) -> Column:
    """Random-hyperplane sign bits as a bit string, e.g. '10110010'."""
    def bit(coeffs: list[float]) -> Column:
        plane = F.array(*[F.lit(v) for v in coeffs])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, h: x * h), F.lit(0.0), lambda acc, x: acc + x
        )
        return F.when(dot > 0, F.lit("1")).otherwise(F.lit("0"))

    return F.concat(*[bit(row) for row in hyperplane_matrix(n_planes, n_dims)])


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    n_dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate cosine top-k: candidates restricted to the query's LSH
    bucket (same hyperplane sign signature), then exact-ranked.

    At 100 TB the bucket join replaces the full scan per query: the corpus
    is hashed once (narrow), and the join key space is 2^n_planes uniform
    buckets. Recall < 1.0 by construction; raise via fewer planes or
    multi-probe.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_vec(F.col(vec_col)).alias("c_vec"),
    ).withColumn("bucket", signature_bits(F.col("c_vec"), n_planes, n_dims))
    q = queries.select(
        F.col(id_col).alias("q_id"), as_double_vec(F.col(vec_col)).alias("q_vec")
    ).withColumn("bucket", signature_bits(F.col("q_vec"), n_planes, n_dims))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "neighbor_id", cosine_sim(F.col("q_vec"), F.col("c_vec")).alias("cosine_sim"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine_sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cosine_sim", "rank")
    )
