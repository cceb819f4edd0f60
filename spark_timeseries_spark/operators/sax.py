"""Symbolic Aggregate approXimation (SAX) and Piecewise Aggregate
Approximation (PAA) — per-series symbolic compression.

Beyond-reference (the reference has no symbolic layer); SAX is the
standard discretization for corpus-scale motif mining, similarity
hashing, and anomaly vocabularies (Lin, Keogh, Lonardi & Chiu 2003,
"A Symbolic Representation of Time Series"). The pipeline:

1. z-normalize each series (population std — the SAX convention);
2. PAA: split the non-null run into ``w`` near-equal segments by the
   non-null rank (point ``i`` of ``n`` lands in segment
   ``floor(i·w/n)`` — sizes differ by at most one; the fractional-
   weight PAA variant is deliberately NOT used so every value belongs
   to exactly one segment and the aggregate stays a plain groupBy);
3. symbolize each segment mean against the Gaussian equiprobable
   breakpoints for alphabet size ``a`` (the paper's Table 3 constants,
   two decimals — exact float literals, so an oracle can replay the
   CASE bit-for-bit): symbol index = number of breakpoints ≤ the mean,
   letter = ``"abcdefghij"[index]``.

Plan: everything rides the one (key, loc) sort — a partition-wide
window for mean/std/rank (one exchange on key), a (key, segment)
groupBy for the PAA means, and a final per-key sort-concat. All JVM
expressions, no Python, no self-joins; output is one short row per
series (the corpus-of-series shape — K rows out regardless of series
length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["BREAKPOINTS", "paa", "sax", "sax_mindist_pairs"]

# Gaussian equiprobable breakpoints, alphabet 2..10 (Lin et al. 2003,
# Table 3 — public constants, quoted at two decimals by the paper).
BREAKPOINTS: dict[int, list[float]] = {
    2: [0.0],
    3: [-0.43, 0.43],
    4: [-0.67, 0.0, 0.67],
    5: [-0.84, -0.25, 0.25, 0.84],
    6: [-0.97, -0.43, 0.0, 0.43, 0.97],
    7: [-1.07, -0.57, -0.18, 0.18, 0.57, 1.07],
    8: [-1.15, -0.67, -0.32, 0.0, 0.32, 0.67, 1.15],
    9: [-1.22, -0.76, -0.43, -0.14, 0.14, 0.43, 0.76, 1.22],
    10: [-1.28, -0.84, -0.52, -0.25, 0.0, 0.25, 0.52, 0.84, 1.28],
}

_LETTERS = "abcdefghij"


def paa(
    df: DataFrame,
    w: int,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Piecewise Aggregate Approximation → (key, seg, seg_n, paa): the
    mean of each of ``w`` near-equal segments of the series' non-null
    run (segment of the ``i``-th of ``n`` points = ``floor(i·w/n)``).
    Series shorter than ``w`` produce one singleton segment per point
    (fewer than ``w`` segments, ids still in [0, w) — documented, not
    an error)."""
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    v = F.col(value_col)
    wk = Window.partitionBy(key_col)
    ws = Window.partitionBy(key_col).orderBy(order_col)
    return (
        df.where(v.isNotNull())
        .withColumn("_rk", F.row_number().over(ws) - 1)
        .withColumn("_n", F.count(v).over(wk))
        # _rk·w ≤ 2^53 for any real series, and (_rk·w)/n is ≥ 1/n away
        # from the next integer whenever it isn't exact — the float
        # floor is exact for every feasible n
        .withColumn("seg", F.floor(F.col("_rk") * w / F.col("_n")))
        .groupBy(key_col, "seg")
        .agg(F.count(v).alias("seg_n"), F.avg(v).alias("paa"))
    )


def sax(
    df: DataFrame,
    w: int = 8,
    a: int = 4,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """SAX word per series → (key, n, n_segments, sax). ``n`` counts
    non-null cells; ``sax`` is the ``min(n, w)``-letter word over
    alphabet ``a``. A zero-variance (or single-point) series has no
    z-scores — its row carries a NULL word so downstream joins see the
    key rather than losing it."""
    if a not in BREAKPOINTS:
        raise ValueError(f"a must be in {sorted(BREAKPOINTS)}, got {a}")
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    bps = BREAKPOINTS[a]
    v = F.col(value_col)
    wk = Window.partitionBy(key_col)
    ws = Window.partitionBy(key_col).orderBy(order_col)
    base = (
        df.where(v.isNotNull())
        .withColumn("_mu", F.avg(v).over(wk))
        .withColumn("_sd", F.stddev_pop(v).over(wk))
        .withColumn("_rk", F.row_number().over(ws) - 1)
        .withColumn("_n", F.count(v).over(wk))
        .withColumn(
            "_z",
            F.when(F.col("_sd") > 0, (v - F.col("_mu")) / F.col("_sd")),
        )
        .withColumn("seg", F.floor(F.col("_rk") * w / F.col("_n")))
    )
    segs = base.groupBy(key_col, "seg").agg(
        F.count(v).alias("_seg_n"),
        F.avg("_z").alias("_paa"),
        F.max("_sd").alias("_sd"),
        F.max("_n").alias("_kn"),
    )
    # symbol index = #breakpoints ≤ the segment mean (ties take the
    # upper symbol; breakpoints are exact two-decimal literals)
    idx = sum(
        ((F.col("_paa") >= F.lit(b)).cast("int") for b in bps), F.lit(0)
    )
    sym = F.substring(F.lit(_LETTERS[:a]), idx + 1, 1)
    return (
        segs.withColumn("_sym", sym)
        .groupBy(key_col)
        .agg(
            F.max("_kn").alias("n"),
            F.count("seg").alias("n_segments"),
            F.when(
                F.max("_sd") > 0,
                F.concat_ws(
                    "",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("seg", "_sym"))
                        ),
                        lambda s: s["_sym"],
                    ),
                ),
            ).alias("sax"),
        )
    )


def sax_mindist_pairs(
    df: DataFrame,
    w: int = 8,
    a: int = 4,
    max_dist: float | None = None,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    cache_registry: list | None = None,
) -> DataFrame:
    """Lower-bounding shape-similarity candidates from SAX words →
    (key_a, key_b, n, mindist) for every pair of equal-length series
    with full-length words (strict upper triangle). MINDIST (Lin et al.
    2003, eq. 6) = √(n/w)·√(Σᵢ cell(qᵢ,cᵢ)²), where adjacent-or-equal
    symbols cost 0 and distant symbols cost the breakpoint gap — it
    provably LOWER-BOUNDS the true z-normalized Euclidean distance, so
    filtering on ``max_dist`` never drops a true match (the classic
    cheap-prune before an exact pass such as
    :func:`~spark_timeseries_spark.operators.matrixprofile.matrix_profile`
    or DTW). Pairs with different lengths or a NULL word (flat series)
    are excluded — MINDIST is undefined there.

    Plan: the K-row word table is persisted (bounded: one short row
    per series — the same internal-cache contract as the dedup
    signature tables; LOOPING callers pass ``cache_registry`` to collect
    the handle and unpersist after materializing, else each call leaks
    one session-lifetime cached table) and self-joins as an EQUI-join on
    the length
    ``n`` (the a < b triangle is a post-join filter, so Catalyst plans
    a hash join, not a nested loop) — without the cache the whole
    sax/fill/grid subtree would recompute once per join side, which
    measured 10× slower. Words pre-decode once per row into int symbol
    arrays so the per-pair cost is one ``zip_with`` fold over two int
    arrays; at corpus scale, bucket by the word itself first (identical
    words are distance-0 candidates for free)."""
    if a not in BREAKPOINTS:
        raise ValueError(f"a must be in {sorted(BREAKPOINTS)}, got {a}")
    bps = BREAKPOINTS[a]
    words = sax(df, w, a, key_col, order_col, value_col).where(
        F.col("sax").isNotNull() & (F.col("n_segments") == w)
    )
    syms = words.select(
        F.col(key_col).alias("key"),
        "n",
        F.transform(
            F.split(F.col("sax"), "").cast("array<string>"),
            lambda ch: F.ascii(ch) - 97,
        ).alias("_ix"),
    ).persist()
    if cache_registry is not None:
        cache_registry.append(syms)
    lhs = syms.select(
        F.col("key").alias("key_a"),
        F.col("n").alias("_na"),
        F.col("_ix").alias("_ia"),
    )
    rhs = syms.select(
        F.col("key").alias("key_b"),
        F.col("n").alias("_nb"),
        F.col("_ix").alias("_ib"),
    )
    # broadcast the (tiny) right side: equal-length corpora put every
    # key in ONE n-bucket, which a shuffled hash join would serialize
    # into a single reducer — the broadcast keeps the left side's full
    # parallelism
    pairs = lhs.join(F.broadcast(rhs), F.col("_na") == F.col("_nb")).where(
        F.col("key_a") < F.col("key_b")
    )
    bp_arr = F.array(*[F.lit(b) for b in bps])
    cells = F.zip_with(
        "_ia",
        "_ib",
        lambda x, y: F.when(
            F.greatest(x, y) - F.least(x, y) <= 1, F.lit(0.0)
        ).otherwise(
            F.element_at(bp_arr, F.greatest(x, y))
            - F.element_at(bp_arr, F.least(x, y) + 1)
        ),
    )
    total = F.aggregate(cells, F.lit(0.0), lambda acc, c: acc + c * c)
    mind = F.sqrt(F.col("_na").cast("double") / w) * F.sqrt(total)
    out = pairs.select(
        "key_a", "key_b", F.col("_na").alias("n"), mind.alias("mindist")
    )
    if max_dist is not None:
        out = out.where(F.col("mindist") <= float(max_dist))
    return out
