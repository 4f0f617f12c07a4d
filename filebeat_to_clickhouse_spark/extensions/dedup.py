"""Deduplication operators: exact, MinHash+LSH near-dup, n-gram Jaccard.

Scale design (100 TB):
- Exact dedup is a hash-groupBy on a 128-bit fingerprint — one shuffle on
  uniformly distributed keys, map-side combinable.
- Near-dup avoids the O(n²) cross join entirely: MinHash signatures are
  computed per document (narrow), banded, and only documents sharing a band
  bucket are pair-joined (the LSH candidate join shuffles on band hash —
  uniformly distributed, skew-free). Verification runs only on candidates.
- All hashing is md5 (JVM built-in, codegen'd) so no Python crosses the
  row path, and results are portable across engines for oracle checks.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# MinHash parameters: K hashes in B bands of R rows (K = B*R).
# With R=3, B=4 the LSH collision curve crosses ~50% at J≈0.5 — tuned for
# the "verified pairs at J≥0.5" contract below.
MINHASH_K = 12
MINHASH_BAND_ROWS = 3


def exact_dedup_fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by md5(text) → (fingerprint, keeper id, copy count).

    The groupBy key is the 128-bit digest, not the text itself, so the
    shuffle moves 32-byte keys instead of documents.
    """
    return (
        docs.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def exact_dedup_survivors(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup keeping the lowest-id copy of each distinct text.

    Expressed as a min-id aggregation + semi join rather than a global
    window (a window over the full table would single-partition nothing here,
    but min-per-key + join keeps every stage map-side combinable).
    """
    keepers = (
        docs.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
    )
    return docs.join(keepers.select(id_col), on=id_col, how="semi")


def word_shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct word n-gram shingles per document → (id, shingle) rows."""
    toks = F.split(F.col(text_col), " ")
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
    )
    return (
        docs.select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("shingle"))
        .filter(F.length("shingle") > 0)
    )


def minhash_signatures(shingled: DataFrame, k: int = MINHASH_K, id_col: str = "doc_id") -> DataFrame:
    """(id, hash_index, minhash) — K permutations via md5("<k>:<shingle>").

    The min is lexicographic over hex digests: deterministic, uniform, and
    reproducible in any engine with md5. Partial aggregation (map-side min)
    keeps the shuffle at K rows per document regardless of document size.
    """
    hashes = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.md5(F.concat(i.cast("string"), F.lit(":"), F.col("shingle"))),
    )
    exploded = shingled.select(F.col(id_col), F.posexplode(hashes).alias("k", "h"))
    return exploded.groupBy(id_col, "k").agg(F.min("h").alias("minhash"))


def lsh_band_buckets(signatures: DataFrame, band_rows: int = MINHASH_BAND_ROWS, id_col: str = "doc_id") -> DataFrame:
    """(id, band, bucket) — concatenate each band's minhashes (k-ordered) and md5."""
    ordered = F.array_sort(F.collect_list(F.struct(F.col("k"), F.col("minhash"))))
    concat = F.array_join(F.transform(ordered, lambda s: s["minhash"]), "")
    return (
        signatures.withColumn("band", (F.col("k") / band_rows).cast("int"))
        .groupBy(id_col, "band")
        .agg(F.md5(concat).alias("bucket"))
    )


def lsh_candidate_pairs(buckets: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_a < doc_b) pairs sharing any band bucket.

    This is the join that replaces the O(n²) cross join: equi-join on
    (band, bucket), whose key space is uniform md5 — no skew at any scale.
    """
    a, b = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.bucket") == F.col("b.bucket")))
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b"))
        .distinct()
    )


def shingle_jaccard(pairs: DataFrame, shingled: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs → (doc_a, doc_b, jaccard)."""
    sizes = shingled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    ex_a = shingled.select(F.col(id_col).alias("doc_a"), F.col("shingle"))
    ex_b = shingled.select(F.col(id_col).alias("doc_b"), F.col("shingle"))
    inter = (
        pairs.join(ex_a, "doc_a")
        .join(ex_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_inter") * F.lit(1.0) / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
    )


def minhash_lsh_neardup_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    k: int = MINHASH_K,
    band_rows: int = MINHASH_BAND_ROWS,
) -> DataFrame:
    """Full near-dup pipeline: shingle → minhash → LSH bands → candidate
    pairs → exact-Jaccard verification at ``threshold``.

    Returns (doc_a, doc_b, jaccard) for verified near-duplicates.
    """
    sh = word_shingles(docs, n=shingle_n)
    cands = lsh_candidate_pairs(lsh_band_buckets(minhash_signatures(sh, k=k), band_rows=band_rows))
    return shingle_jaccard(cands, sh).filter(F.col("jaccard") >= threshold)


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5, shingle_n: int = 3) -> DataFrame:
    """All-pairs n-gram Jaccard ≥ threshold via inverted-index join.

    Exact (no LSH): the self-join is on the shingle value itself — an
    inverted index. Correct at any scale but costlier than LSH when shingle
    document-frequency is skewed; prefer minhash_lsh_neardup_pairs beyond
    ~10⁷ docs.
    """
    sh = word_shingles(docs, n=shingle_n)
    ex_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    ex_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        ex_a.join(ex_b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("n_inter") * F.lit(1.0) / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
