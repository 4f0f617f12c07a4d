"""Relational operators Spark lacks as built-ins, composed from DataFrame
primitives with scale-sound plans.

As-of join: the reference has no joins at all (SURVEY §2D), but a log/event
engine needs temporal alignment ("latest config/click/price at event time").
The naive formulation — inequality join + per-left-row max — explodes to
|L|×|R| per key before aggregating. This implementation is the union-tag
algorithm: one shuffle-sort per key over |L|+|R| rows, identical asymptotics
to a sort-merge join, no row explosion at any scale or skew.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...],
    right_seq: str | None = None,
) -> DataFrame:
    """For each left row: the latest right row with ``right_ts <= left_ts``
    on the same key (left join — unmatched left rows keep NULL right cols).

    Algorithm: tag right rows side=0 / left rows side=1, union, and take a
    running ``last(right_payload, ignorenulls=True)`` over
    (key ORDER BY ts, side, right_payload ROWS UNBOUNDED PRECEDING) —
    side 0 sorts before side 1 at equal timestamps, so ties are inclusive
    (>= semantics). ``right_seq`` (a unique right column, e.g. its id)
    makes the winner among equal-timestamp right rows deterministic.

    Column names in ``right_cols`` must not clash with left's columns.
    """
    rseq = right_seq or right_ts
    rpayload = F.struct(
        F.col(rseq).alias("_seq"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in right_cols],
    )
    l_side = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(rpayload.alias("_r")).schema["_r"].dataType
        ).alias("_r"),
    )
    r_side = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*[F.col(c) for c in left.columns]).alias("_l")).schema["_l"].dataType
        ).alias("_l"),
        rpayload.alias("_r"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_side.unionByName(r_side)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select(
        F.col("_l.*"),
        F.col("_m._rts").alias(f"asof_{right_ts}"),
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )


def range_join_banded(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    band_width: int,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Point-in-interval join (``lo <= point <= hi``) without an inequality
    join.

    The naive formulation is a theta-join: Spark plans it as
    BroadcastNestedLoopJoin (driver OOM when neither side broadcasts) or a
    cartesian product — both O(|P|×|I|) at any scale. This implementation
    bands the numeric axis into fixed ``band_width`` buckets: each point
    belongs to exactly one band, each interval is exploded to every band it
    covers (ceil(len/width)+1 rows — bounded, small for width ≳ typical
    interval length), and the join is a plain shuffled EQUI-join on
    (band, *extra_keys), refined by the exact BETWEEN predicate. Each
    (point, interval) pair meets in exactly one band — the point's — so no
    dedup is needed and the output is exactly the theta-join's.

    Inner join only: an interval spans several exploded band rows, so any
    interval-preserving outer mode would emit unmatched intervals once per
    band. Aggregate-then-left-join the result instead (see
    ``purchase_window_clicks`` in queries.py).

    Columns ``point_col``/``lo_col``/``hi_col`` must be numeric (cast
    timestamps to epoch seconds first); names must not clash.
    """
    p = points.withColumn("_band", F.floor(F.col(point_col) / band_width).cast("bigint"))
    i = intervals.withColumn(
        "_band",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / band_width).cast("bigint"),
                F.floor(F.col(hi_col) / band_width).cast("bigint"),
            )
        ),
    )
    return (
        p.join(i, ["_band", *extra_keys])
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) <= F.col(hi_col)))
        .drop("_band")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to heavy key skew: a hot key's rows spread over
    ``n_salt`` partitions instead of landing on one straggler task.

    Left rows get a deterministic salt (xxhash64 of the whole row, mod
    n_salt — no RNG, so retries/replays place rows identically); the right
    side replicates each row n_salt times; the join runs on (key, salt).
    Result is row-identical to the unsalted join at n_salt× right-side
    inflation — use when the right side is small-ish but too big (or too
    hot) to broadcast, and AQE's skew splitting can't help (it only splits
    sort-merge join partitions, not the aggregation or window that follows).

    Only left-preserving modes are allowed: because the right side is
    replicated, 'right'/'full' would emit each UNMATCHED right row n_salt
    times. (Matched right rows and 'left_anti' are safe — every right key
    exists under every salt value.)
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports only left-preserving modes {sorted(allowed)}; "
            f"got {how!r} — right/full outer would duplicate unmatched right rows n_salt times"
        )
    _check_reserved_cols("salted_join", ("_salt",), left.columns, right.columns)
    l = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.struct(*[F.col(c) for c in left.columns])), F.lit(n_salt)).cast("int")
    )
    r = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    return l.join(r, [on, "_salt"], how).drop("_salt")


def _check_reserved_cols(op: str, reserved: tuple[str, ...], *schemas: list[str]) -> None:
    """Raise rather than silently clobber/drop a user column whose name
    collides with an operator's internal working columns (r3 advice)."""
    for name in reserved:
        if any(name in cols for cols in schemas):
            raise ValueError(
                f"{op} uses {name!r} as an internal working column but the "
                f"input already has one — rename it before calling (the "
                "operator would overwrite and then drop it)"
            )


def salted_window_topk(
    df: DataFrame,
    key_cols: tuple[str, ...],
    order_cols: tuple,
    k: int,
    n_salt: int = 16,
    rank_col: str = "rank",
    salt_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Top-k rows per key, robust to heavy key skew: the two-phase
    (salted) form of ``row_number().over(partitionBy(keys).orderBy(...))
    <= k``.

    A plain ranking window sends EVERY row of a key to one task — the
    documented SURVEY §8 limitation for user_sessions/journeys-style
    queries when one user dominates. Here:

    - phase 1: rows get a deterministic salt (xxhash64 of the whole row
      mod ``n_salt`` — no RNG, replays place rows identically, mirroring
      ``salted_join``); a window over (keys…, salt) keeps each salt's
      local top-k. A hot key's rows spread over ``n_salt`` tasks.
    - phase 2: the plain window re-ranks the survivors — at most
      k × n_salt rows per key, bounded regardless of skew.

    Row-identical to the plain window because any global top-k row is in
    its own salt's local top-k (the local cut is a superset of the global
    winners — same argument as brute_force_topk's partial_topk).
    REQUIRES ``order_cols`` to be a total order within each key (every
    ranking query in this engine tie-breaks to totality already); with
    ties, both forms are nondeterministic and may differ.

    ``order_cols`` entries may be column names or Column expressions
    (e.g. ``F.desc("ts")``).

    ``salt_cols`` names the columns the salt hashes; default is ALL
    columns, which is result-invariant but means adding an unrelated
    column reshuffles row placement (plan stability, not correctness).
    Pass the key+order column names for placement that depends only on
    the ranking semantics. The hashed set must still vary WITHIN a key —
    salting key columns alone would put the whole hot key in one salt and
    defeat the operator; order columns (a total order per key) vary by
    construction, which is why they're the recommended set.
    Internal working columns ``_salt``/``_lr`` are reserved: input
    containing either raises instead of silently clobbering it.
    """
    _check_reserved_cols("salted_window_topk", ("_salt", "_lr"), df.columns)
    order = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    salt = F.pmod(
        F.xxhash64(F.struct(*[F.col(c) for c in (salt_cols or df.columns)])),
        F.lit(n_salt),
    ).cast("int")
    w_local = Window.partitionBy(*key_cols, "_salt").orderBy(*order)
    survivors = (
        df.withColumn("_salt", salt)
        .withColumn("_lr", F.row_number().over(w_local))
        .filter(F.col("_lr") <= k)
        .drop("_salt", "_lr")
    )
    w_final = Window.partitionBy(*key_cols).orderBy(*order)
    return survivors.withColumn(rank_col, F.row_number().over(w_final)).filter(
        F.col(rank_col) <= k
    )


def exact_quantile_threshold(
    df: DataFrame, col: str, pct: int, coarse_bits: int = 25
) -> DataFrame:
    """EXACT lower-quantile threshold of an integer column, distributed →
    a 1-row (thr) DataFrame: the smallest value v such that
    count(x ≤ v) · 100 ≥ pct · count(*). The deterministic rank rule every
    percentile gate in the curation family uses — no interpolation, no
    approx_percentile nondeterminism.

    Two-level histogram so no stage ever windows over the corpus (a naive
    cumulative window over distinct values is a single-partition sort of
    ~n rows — the classic exact-quantile scale trap):

    1. coarse: group by ``floor(x / 2^coarse_bits)`` — bucket count is
       bounded by the VALUE DOMAIN (≤ domain/2^coarse_bits rows, e.g.
       2^15 for 40-bit scores), independent of corpus size; one tiny
       cumulative window finds the boundary bucket and the rank mass
       strictly below it.
    2. refine: histogram of exact values INSIDE the boundary bucket only
       (≈ n/buckets rows), cumulative + the carried mass → threshold.

    Both cumulative windows run over bounded histogram rows; the corpus
    is scanned twice, shuffled only by (bucket) / (value) histogram keys
    — map-side combinable. floor() keeps the coarsening monotone for
    negative values (floor division, exact for powers of two in double
    arithmetic up to 2^53).

    Returns an EMPTY frame for empty input (a crossJoin gate then keeps
    nothing — the caller decides empty-corpus semantics)."""
    if not 0 < pct <= 100:
        raise ValueError(f"pct must be in (0, 100], got {pct}")
    width = F.lit(1 << coarse_bits)
    coarse = (
        df.groupBy(F.floor(F.col(col) / width).cast("bigint").alias("_cb"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("_cnt"))
    )
    w1 = Window.orderBy("_cb").rowsBetween(Window.unboundedPreceding, 0)
    c1 = coarse.select(
        "_cb",
        "_cnt",
        F.sum("_cnt").over(w1).alias("_cum"),
        F.sum("_cnt").over(Window.partitionBy()).alias("_total"),
    )
    boundary = (
        c1.filter(F.col("_cum") * 100 >= F.lit(pct) * F.col("_total"))
        .orderBy("_cb")
        .limit(1)
        .select(
            F.col("_cb").alias("_b"),
            (F.col("_cum") - F.col("_cnt")).alias("_below"),
            F.col("_total").alias("_total"),
        )
    )
    fine = (
        df.select(F.col(col).alias("_v"), F.floor(F.col(col) / width).cast("bigint").alias("_cb"))
        .join(F.broadcast(boundary), F.col("_cb") == F.col("_b"))
        .groupBy("_v", "_below", "_total")
        .agg(F.count(F.lit(1)).cast("bigint").alias("_cnt"))
    )
    w2 = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    c2 = fine.select(
        "_v",
        (F.col("_below") + F.sum("_cnt").over(w2)).alias("_cum"),
        "_total",
    )
    return (
        c2.filter(F.col("_cum") * 100 >= F.lit(pct) * F.col("_total"))
        .agg(F.min("_v").alias("thr"))
        .filter(F.col("thr").isNotNull())
    )


def histogram_percentiles(
    df: DataFrame,
    value_col: str,
    pcts: dict[str, int],
    partition_cols: tuple[str, ...] = (),
    count_alias: str = "n",
    weight_col: str | None = None,
) -> DataFrame:
    """EXACT percentiles of an integer/orderable column via the
    histogram-cumsum rank rule → one row per partition group (or one row
    total) with ``count_alias`` and one column per ``pcts`` entry
    (alias → percentile, e.g. ``{"p50": 50, "p95": 95}``).

    The single statement of the rank rule (smallest value whose
    cumulative count reaches ⌈p·n⌉ — tie-stable and engine-exact, unlike
    interpolating approx_percentile) shared by
    ``session_duration_percentiles`` and ``length_percentiles_by_source``;
    ``exact_quantile_threshold`` above is its two-level sibling for
    corpus-scale UNGROUPED domains.

    Scale: aggregate to a (group, value) histogram FIRST — map-side
    combinable, bounded by distinct values per group — then run the
    cumulative window over the compact histogram, never over raw rows.
    With partition_cols the window partitions on the group key; without,
    the single-partition sort sees only the distinct-value histogram
    (fine when the value domain is small, e.g. second-granularity gaps;
    for corpus-sized domains use exact_quantile_threshold).

    ``weight_col`` lets the caller pass an ALREADY-AGGREGATED histogram
    (rows carry a count column) instead of raw rows — percentiles of
    weighted values, identical to expanding each row weight times. The
    consumer that needs it is ``mad_outliers``: its second pass ranks
    |value − median| whose histogram DERIVES from the first pass's, so
    re-counting raw rows would cost a third corpus scan."""
    keys = list(partition_cols)
    cnt = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    h = df.groupBy(*keys, value_col).agg(cnt.alias("_cnt"))
    w = Window.partitionBy(*keys).orderBy(value_col)
    c = h.select(
        *keys,
        value_col,
        F.sum("_cnt").over(w).alias("_cum"),
        F.sum("_cnt").over(Window.partitionBy(*keys)).alias("_total"),
    )
    aggs = [F.max("_total").cast("bigint").alias(count_alias)] + [
        F.min(F.when(F.col("_cum") * 100 >= p * F.col("_total"), F.col(value_col)))
        .cast("bigint")
        .alias(name)
        for name, p in pcts.items()
    ]
    return c.groupBy(*keys).agg(*aggs) if keys else c.agg(*aggs)


def mad_outliers(
    df: DataFrame,
    value_col: str,
    partition_cols: tuple[str, ...] = (),
    k: int = 3,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Robust outlier flags by the median-absolute-deviation rule →
    input columns + ``med`` + ``mad`` + ``is_outlier`` (true when
    |value − med| > k·MAD within the row's group). The distribution-free
    data-cleaning gate (mean/stddev z-scores move with the outliers they
    are meant to find; the median and MAD don't), exact-integer end to
    end — both medians come from the histogram-cumsum rank rule, so the
    flags are engine-portable.

    Scale: ONE evaluation of the input and nothing corpus-sized past it
    (fused r8 — the r6/r7 rehearsals measured the former two-scan form
    2.5×/1.86× behind the oracle engine, all of it the doubled score
    computation). The input's lineage is cut once via the checkpoint
    policy, so pass one (the map-side-combinable (group, value)
    histogram) and pass two (the broadcast model join-back) both read
    materialized blocks instead of recomputing the caller's scoring
    expression. The median comes from the histogram's cumulative
    window, and the |value − med| histogram DERIVES from the same
    histogram rows (each (value, cnt) maps to (|value − med|, cnt) — no
    re-scan), ranked via the ``weight_col`` form of
    ``histogram_percentiles``. Windows only ever see histogram rows,
    never the corpus. ``checkpoint_dir`` selects the durable lineage
    cut for multi-hour cluster jobs (checkpointing.py); the local
    default trades executor-loss recovery for speed, exactly like the
    retrieval base scan.

    Caveats (standard MAD): a group where >50% of values are identical
    has MAD = 0, flagging EVERY deviating row — intended for genuinely
    continuous-ish integer scores. NULL values are EXCLUDED from the
    med/MAD model (Spark windows sort NULLS FIRST, DuckDB NULLS LAST —
    letting them into the histogram would make the rank rule
    engine-divergent) and get NULL flags on the way out; a group whose
    values are ALL NULL has no model row, so the model join back is a
    LEFT join — its rows survive with NULL med/mad/is_outlier rather
    than silently dropping (r5 advice)."""
    from .checkpointing import make_lineage_cut

    cut = make_lineage_cut(checkpoint_dir)
    keys = list(partition_cols)
    # one evaluation of the (possibly expensive) caller scoring plan: the
    # histogram pass and the final model join-back both read the cut
    df = cut(df, eager=False)
    h = cut(
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_w")),
        eager=False,
    )  # consumed by the median and the deviation ranks
    med = histogram_percentiles(
        h, value_col, {"med": 50}, tuple(keys), weight_col="_w"
    ).select(*keys, "med")
    join_med = (lambda d: d.join(F.broadcast(med), keys)) if keys else (
        lambda d: d.crossJoin(F.broadcast(med))
    )
    h2 = join_med(h).select(
        *keys, F.abs(F.col(value_col) - F.col("med")).alias("_absdev"), "_w"
    )
    mad = histogram_percentiles(
        h2, "_absdev", {"mad": 50}, tuple(keys), weight_col="_w"
    ).select(*keys, "mad")
    model = med.join(mad, keys) if keys else med.crossJoin(mad)
    # LEFT join: all-NULL groups (no model row) keep their rows, with
    # NULL med/mad/is_outlier, instead of silently dropping (r5 advice).
    # The keyless form left-joins on a constant so an entirely-NULL frame
    # (empty 0-row model) degrades the same way, at no extra job.
    if keys:
        join_model = lambda d: d.join(F.broadcast(model), keys, "left")  # noqa: E731
    else:
        # collision-safe constant-join key: a caller column named _one
        # would break the equi-join (r7 advice)
        one = "_one"
        while one in df.columns:
            one += "_"
        join_model = lambda d: d.withColumn(one, F.lit(1)).join(  # noqa: E731
            F.broadcast(model.withColumn(one, F.lit(1))), [one], "left"
        ).drop(one)
    return join_model(df).withColumn(
        "is_outlier",
        F.abs(F.col(value_col) - F.col("med")) > F.lit(k).cast("bigint") * F.col("mad"),
    )


def asof_join_backward_banded(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: tuple[str, ...],
    right_seq: str | None = None,
    band_seconds: int = 86400,
) -> DataFrame:
    """``asof_join_backward``, skew-salted by TIME RANGE within the key —
    the hot-key mitigation the plain operator documents: a key holding a
    large fraction of both sides turns the per-key sort window into one
    straggler task; banding splits that key's window state across
    ``ceil(key_time_span / band_seconds)`` tasks.

    Row-identical to ``asof_join_backward`` (pinned by test, including a
    property test against the brute-force model): each left row's match
    is max(best right row in its own band, best right row before the
    band), and the boundary carry supplies the second term exactly.

    Algorithm (three bounded stages, no per-key full sort anywhere):
    1. band both sides by ``floor(unix_ts / band_seconds)``;
    2. per (key, band) of the right side take the last payload (one
       map-side-combinable max(struct) — ties on ts resolved by
       ``right_seq`` exactly as the plain operator resolves them), then
       a cumulative max over each key's BAND SUMMARIES (window state =
       #bands per key, not #rows) shifted by one band → the carry: the
       best right row strictly before each band;
    3. union-tag window per (key, band): in-band right rows ∪ that
       band's carry (whose ts is necessarily below every in-band left
       ts), same running-last as the plain operator.

    Choose ``band_seconds`` ≈ key_time_span / desired_parallelism; keys
    spanning few bands degrade gracefully to the plain plan's shape.
    Like the plain operator, ``right_cols`` must not clash with left's
    columns."""
    rseq = right_seq or right_ts
    band_l = F.floor(F.unix_timestamp(F.col(left_ts)) / F.lit(band_seconds)).cast("bigint")
    band_r = F.floor(F.unix_timestamp(F.col(right_ts)) / F.lit(band_seconds)).cast("bigint")
    # carry payload ordered exactly like the plain window resolves ties:
    # (ts, side=0 first, then (_seq, ...) struct order) → max(_rts, _seq, cols)
    cpayload = F.struct(
        F.col(right_ts).alias("_rts"),
        F.col(rseq).alias("_seq"),
        *[F.col(c) for c in right_cols],
    )
    rl = (
        right.select(F.col(on).alias("_k"), band_r.alias("_b"), cpayload.alias("_c"))
        .groupBy("_k", "_b")
        .agg(F.max("_c").alias("_last"))
    )
    # bands where a carry is NEEDED: every left band (dedup'd)
    lb = left.select(F.col(on).alias("_k"), band_l.alias("_b")).distinct()
    merged = lb.join(rl, ["_k", "_b"], "full")
    wc = (
        Window.partitionBy("_k")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carries = (
        merged.withColumn("_carry", F.max("_last").over(wc))
        .filter(F.col("_carry").isNotNull())
        .select("_k", "_b", "_carry")
    )
    # rebuild both sides in the plain operator's union-tag shape, plus _b
    rpayload = F.struct(
        F.col(rseq).alias("_seq"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c) for c in right_cols],
    )
    r_t = right.select(rpayload.alias("_r")).schema["_r"].dataType
    l_t = left.select(
        F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    ).schema["_l"].dataType
    l_side = left.select(
        F.col(on).alias("_k"),
        band_l.alias("_b"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(r_t).alias("_r"),
    )
    r_side = right.select(
        F.col(on).alias("_k"),
        band_r.alias("_b"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_t).alias("_l"),
        rpayload.alias("_r"),
    )
    carry_side = carries.select(
        F.col("_k"),
        F.col("_b"),
        F.col("_carry._rts").alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(l_t).alias("_l"),
        F.struct(
            F.col("_carry._seq").alias("_seq"),
            F.col("_carry._rts").alias("_rts"),
            *[F.col(f"_carry.{c}").alias(c) for c in right_cols],
        ).alias("_r"),
    )
    w = (
        Window.partitionBy("_k", "_b")
        .orderBy("_t", "_side", "_r")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        l_side.unionByName(r_side)
        .unionByName(carry_side)
        .withColumn("_m", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )
    return matched.select(
        F.col("_l.*"),
        F.col("_m._rts").alias(f"asof_{right_ts}"),
        *[F.col(f"_m.{c}").alias(c) for c in right_cols],
    )


def _range_partitioned_cdf(
    h: DataFrame, value_col: str, n_ranges: int, keys: tuple[str, ...] = ()
) -> DataFrame:
    """Distributed exact CDF over a (keys…, value, _w) histogram →
    (keys…, value_col, _w, _cum, _tot) with NO single-task sort: the
    two-level cumulative sum.

    The keyless histogram windows below this are single-partition by
    construction — harmless while distinct values ≈ a histogram, but a
    CONTINUOUS high-cardinality score makes distinct ≈ corpus and that
    is one task sorting ~n rows at 100 TB. The grouped window has the
    same cliff one level down: partitionBy(key) parallelizes ACROSS
    keys, but a single hot key with high-cardinality values is still
    one task sorting that key's whole histogram. Here instead:

    1. range-partition the histogram rows on (keys…, value) — equal
       tuples are never split across ranges, a hot key SPANS slices
       (that is the parallelism), and within a key the slice order
       follows the value order (lexicographic boundaries);
    2. cumulative-sum LOCALLY per (slice, keys…) — each task sorts only
       its slice, whatever one key's cardinality is;
    3. per-(slice, keys…) totals turn into per-key exclusive prefix
       offsets with one window partitioned by key over SLICE SUMMARIES —
       window state ≤ n_ranges rows per key, the summary table ≤
       (#keys + n_ranges) rows total, never corpus-sized;
    4. global cum = local cum + slice offset, joined back on
       (slice, keys…) — broadcast when keyless (n_ranges rows), a
       co-partitioned hash join when keyed (keys-sized). Exact
       regardless of where the sampled range boundaries land, so the
       output is deterministic even though repartitionByRange samples.

    The range exchange is lineage-CUT before fanning out (localCheckpoint,
    or a reliable checkpoint when ``SPARK_GRAFT_CHECKPOINT_DIR`` is set):
    both the local-cumsum side and the offset side key on ``_pid``, and
    repartitionByRange SAMPLES its boundaries — if the exchange
    re-executed per subtree (exchange reuse disabled, plan divergence),
    the two sides could see DIFFERENT partition ids for the same value
    and the ``_pid`` join would silently mis-sum. The cut makes
    exactly-once execution structural, not an optimizer courtesy."""
    from .checkpointing import default_checkpoint_dir, make_lineage_cut

    cut = make_lineage_cut(default_checkpoint_dir())
    ks = [F.col(k) for k in keys]
    hr = cut(
        h.repartitionByRange(n_ranges, *ks, F.col(value_col)).withColumn(
            "_pid", F.spark_partition_id()
        ),
        eager=False,
    )
    w_loc = Window.partitionBy("_pid", *keys).orderBy(value_col)
    loc = hr.withColumn("_lcum", F.sum("_w").over(w_loc))
    w_off = Window.partitionBy(*keys).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy(*keys).orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    off = (
        hr.groupBy("_pid", *keys)
        .agg(F.sum("_w").cast("bigint").alias("_ptot"))
        .select(
            "_pid",
            *keys,
            F.coalesce(F.sum("_ptot").over(w_off), F.lit(0).cast("bigint")).alias("_off"),
            F.sum("_ptot").over(w_all).cast("bigint").alias("_tot"),
        )
    )
    off = F.broadcast(off) if not keys else off  # keyed: keys-sized, hash join
    return loc.join(off, ["_pid", *keys]).select(
        *keys,
        value_col,
        "_w",
        (F.col("_lcum") + F.col("_off")).cast("bigint").alias("_cum"),
        "_tot",
    )


def percentile_rank(
    df: DataFrame,
    value_col: str,
    partition_cols: tuple[str, ...] = (),
    scale: int = 1_000_000,
    out_col: str = "pct_ppm",
    range_partitions: int | None = None,
) -> DataFrame:
    """Exact per-row percentile rank within each group → input columns +
    ``out_col`` = (#group rows with value ≤ this row's value) × scale
    div group size, as a BIGINT in parts-per-``scale``.

    The cross-source score NORMALIZER: raw quality scores are not
    comparable across sources (different length/style distributions);
    the percentile rank is — rank-normalize each source, then one global
    threshold means the same thing everywhere (the per-source twin of
    ``exact_quantile_threshold``'s single global cut). Inclusive-≤ rank
    (the CDF convention): the max of a group scores exactly ``scale``.

    Scale: the same histogram-cumsum machinery as the percentile family —
    one map-side-combinable (group, value) histogram, a cumulative window
    over HISTOGRAM rows only (rows per partition = distinct values per
    group, never corpus rows), then a join back keyed on
    (group, value) — co-partitioned uniform keys, no broadcast needed and
    none assumed (distinct-value count can approach corpus size for a
    continuous-ish score). NULL values get a NULL rank via the left join
    and are excluded from every denominator.

    When distinct values DO approach corpus size (continuous scores),
    the keyless histogram window degenerates to one task sorting ~n
    rows — and the grouped window to one task per key, which a single
    HOT key makes the same cliff; pass ``range_partitions`` (keyless or
    grouped, r8) to route the CDF through ``_range_partitioned_cdf``'s
    two-level cumulative sum — identical output (row-identity
    test-pinned for both forms), every per-task sort bounded by its
    range slice (plan-gated)."""
    keys = list(partition_cols)
    h = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_w"))
    )
    if range_partitions is not None:
        model = _range_partitioned_cdf(
            h, value_col, range_partitions, keys=tuple(keys)
        ).select(
            *keys,
            value_col,
            F.expr(f"(_cum * {int(scale)}) div _tot").alias(out_col),
        )
    else:
        w_cum = Window.partitionBy(*keys).orderBy(value_col)
        w_tot = Window.partitionBy(*keys)
        model = h.select(
            *keys,
            value_col,
            F.sum("_w").over(w_cum).alias("_cum"),
            F.sum("_w").over(w_tot).alias("_tot"),
        ).select(
            *keys,
            value_col,
            F.expr(f"(_cum * {int(scale)}) div _tot").alias(out_col),
        )
    return df.join(model, keys + [value_col], "left")


def exact_quantile_boundaries(
    df: DataFrame, value_col: str, k: int = 100, range_partitions: int | None = None
) -> DataFrame:
    """The k-quantile MODEL ARTIFACT → exactly k rows (q, boundary),
    q = 1..k, where ``boundary`` is the rank-rule quantile at q/k: the
    smallest value v with cum(v)·k ≥ q·total. Train once in batch, bake
    into a stream as a sorted array literal — the bounded-size CDF a
    streaming percentile gate scores against
    (``streaming.pipeline.cdf_gate_stream``), the same way the DSIR λ
    table and BM25 model bake.

    One aggregate pass + histogram-row arithmetic, all integer: each
    histogram row (v, cum, w) OWNS the quantile indices in
    (⌊(cum−w)·k/total⌋, ⌊cum·k/total⌋] — an interval of integers emitted
    with one sequence-explode, so no per-q scan, no k aggregate columns,
    and ties/duplicates resolve exactly as ``histogram_percentiles``'
    rank rule does (q=k is always the max value). NULLs are excluded
    (no rank). Total work beyond the histogram is O(distinct values + k).

    The histogram window is single-partition — bounded by DISTINCT
    values, fine for integer-ppm scores; for continuous/high-cardinality
    scores pass ``range_partitions`` to compute the CDF through
    ``_range_partitioned_cdf``'s two-level cumulative sum instead
    (identical k-row artifact, no single-task corpus sort)."""
    h = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("bigint").alias("_w"))
    )
    if range_partitions is not None:
        c = _range_partitioned_cdf(h, value_col, range_partitions).select(
            value_col, "_cum", "_tot", "_w"
        )
    else:
        w = Window.partitionBy(F.lit(1)).orderBy(value_col)
        c = h.select(
            value_col,
            F.sum("_w").over(w).alias("_cum"),
            F.sum("_w").over(Window.partitionBy(F.lit(1))).alias("_tot"),
            F.col("_w"),
        )
    lo = F.expr(f"((_cum - _w) * {int(k)}) div _tot")  # exclusive
    hi = F.expr(f"(_cum * {int(k)}) div _tot")  # inclusive
    return (
        c.select(F.col(value_col).alias("boundary"), lo.alias("_lo"), hi.alias("_hi"))
        .filter(F.col("_hi") > F.col("_lo"))
        .select(
            F.explode(F.sequence(F.col("_lo") + 1, F.col("_hi"))).alias("q"),
            "boundary",
        )
        .filter((F.col("q") >= 1) & (F.col("q") <= k))
    )


def quarter_bit_log(x) -> "F.Column":
    """``floor(4·log2 x)`` for a POSITIVE bigint column, as a pure integer
    expression both engines evaluate bit-identically — the quarter-bit
    integer-log kernel (the DSIR lambda table pins the small-domain form;
    this is the arbitrary-magnitude generalization).

    Identity: with L = length(bin(x)) (so 2^(L-1) <= x < 2^L),
    x^4 < 2^63 whenever L <= 15, and then floor(4·log2 x) =
    length(bin(x^4)) - 1 exactly. For larger x the top 15 bits
    m = x >> (L-15) carry the mantissa: q = 4·(L-15) + length(bin(m^4)) - 1,
    which equals floor(4·log2 x) up to the truncation of bits below the
    15th (error < 4·log2(1 + 2^-14) ~ 0.0004 quarter-bits — only values
    within that sliver of a quarter-bit boundary can differ from the true
    floor, and BOTH engines truncate identically, so parity is exact
    regardless). Deterministic, monotone nondecreasing, zero-shuffle.

    x = 0 or negative is undefined (bin() of a negative is its two's
    complement — callers must guard; every in-repo caller passes counts
    >= 1)."""
    L = F.length(F.bin(x))
    m = F.call_function("shiftright", x, (L - F.lit(15)).cast("int"))
    small = F.length(F.bin(x * x * x * x)) - 1
    big = (L - F.lit(15)).cast("bigint") * 4 + F.length(F.bin(m * m * m * m)) - 1
    return F.when(L <= 15, small).otherwise(big).cast("bigint")


def profile_columns(df: DataFrame, cols: tuple[str, ...] | None = None) -> DataFrame:
    """Data-quality profile -> one row per profiled column:
    (column, n_rows, n_nulls, n_distinct, min_val, max_val). The
    ingest-side sanity report a pipeline runs before training on a new
    source drop: silent-null regressions, cardinality collapse, and
    domain drift show up here before they poison a run.

    Semantics: n_distinct counts non-NULL distinct values (SQL
    count(DISTINCT c)); min/max are the column's native min/max rendered
    through the engine's string cast — exact for integer and string
    columns (callers profiling double columns should pre-round: float
    formatting is engine-specific).

    Scale: ONE pass — a single aggregate over all requested columns.
    Spark plans multi-countDistinct via expand (n_cols x corpus rows into
    the partial aggregate, the standard exact-profiling cost, map-side
    combinable); at extreme widths profile in column batches or swap
    countDistinct for approx_count_distinct(HLL) and accept the sketch
    error. The long-format pivot happens on the single 1-row result."""
    names = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for c in names:
        aggs.append(
            F.sum(F.col(c).isNull().cast("bigint")).cast("bigint").alias(f"_null_{c}")
        )
        aggs.append(F.countDistinct(F.col(c)).cast("bigint").alias(f"_dist_{c}"))
        aggs.append(F.min(F.col(c)).cast("string").alias(f"_min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"_max_{c}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"_null_{c}").alias("n_nulls"),
                F.col(f"_dist_{c}").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_val"),
                F.col(f"_max_{c}").alias("max_val"),
            )
            for c in names
        ]
    )
    return row.select(F.col("_n").alias("n_rows"), F.explode(per_col).alias("_p")).select(
        F.col("_p.column").alias("column"),
        "n_rows",
        F.col("_p.n_nulls").alias("n_nulls"),
        F.col("_p.n_distinct").alias("n_distinct"),
        F.col("_p.min_val").alias("min_val"),
        F.col("_p.max_val").alias("max_val"),
    )
