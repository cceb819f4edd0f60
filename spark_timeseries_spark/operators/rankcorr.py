"""Rank correlation between two named series: Spearman ρ and Kendall τ-b.

Beyond-reference (sryza/spark-timeseries stops at Pearson via the
instants matrix); these are the robust monotone-association companions
of :func:`~spark_timeseries_spark.operators.rolling.crosscorr` — rank
statistics survive outliers and nonlinear-but-monotone couplings that
flatten a Pearson estimate.

Scale notes (the two-named-series diagnostic envelope, the
coherence/crosscorr precedent):

- **spearman_corr** is LINEAR: average-ranks are two window expressions
  and ρ is one corr aggregate — fine at any overlap length.
- **kendall_tau** is a PAIR statistic: the concordance count is an
  O(T²/2) self-join on the bounded overlap of the one named pair —
  correct and cheap at the diagnostic envelope (an overlap of 10⁴ rows
  is 5·10⁷ join rows, map-side-combined down to four counters), but it
  is the quadratic member of this module; a merge-sort inversion-count
  kernel (O(T log T) grouped-map) is the long-overlap path if the
  envelope ever grows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["spearman_corr", "kendall_tau"]


def _overlap(df, key_a, key_b, key_col, loc_col, value_col) -> DataFrame:
    """Non-null overlap of the two named series → (_l, _x, _y)."""
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    a = pts.where(F.col(key_col) == key_a).select(
        F.col(loc_col).alias("_l"), v.alias("_x")
    )
    b = pts.where(F.col(key_col) == key_b).select(
        F.col(loc_col).alias("_l"), v.alias("_y")
    )
    return a.join(b, "_l")


def spearman_corr(
    df: DataFrame,
    key_a: str,
    key_b: str,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Spearman rank correlation over the two series' non-null overlap
    → one row (key_a, key_b, n, rho): Pearson correlation of the
    AVERAGE ranks (ties get the mean of the positions they span —
    rank + (ties−1)/2 — the textbook mid-rank convention, so ρ matches
    ``scipy.stats.spearmanr`` exactly, ties included). NULL rho when
    the overlap has < 2 rows or either side is constant.

    Plan: overlap equi-join on loc, two rank windows + two tie-count
    windows over the bounded pair overlap, ONE corr aggregate. All
    JVM, no Python, no explode."""
    j = _overlap(df, key_a, key_b, key_col, loc_col, value_col)
    wx = Window.partitionBy(F.lit(1)).orderBy("_x")
    wy = Window.partitionBy(F.lit(1)).orderBy("_y")
    tx = Window.partitionBy("_x")
    ty = Window.partitionBy("_y")
    r = j.select(
        (
            F.rank().over(wx)
            + (F.count(F.lit(1)).over(tx) - 1) / 2.0
        ).alias("_rx"),
        (
            F.rank().over(wy)
            + (F.count(F.lit(1)).over(ty) - 1) / 2.0
        ).alias("_ry"),
    )
    # NOT F.corr: under ANSI mode corr() raises DIVIDE_BY_ZERO on a
    # constant side; the sample-moment form (the (n-1)s cancel) gives
    # the identical value with try_divide -> NULL degeneracy
    return r.agg(
        F.lit(key_a).alias("key_a"),
        F.lit(key_b).alias("key_b"),
        F.count(F.lit(1)).alias("n"),
        F.try_divide(
            F.covar_samp("_rx", "_ry"),
            F.stddev_samp("_rx") * F.stddev_samp("_ry"),
        ).alias("rho"),
    )


def kendall_tau(
    df: DataFrame,
    key_a: str,
    key_b: str,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Kendall τ-b over the two series' non-null overlap → one row
    (key_a, key_b, n, n_concordant, n_discordant, tau): for every
    unordered pair of overlap rows, concordant if x and y move the
    same way, discordant if opposite, dropped from the respective
    denominator when tied; τ-b = (nc − nd)/√((n0 − tx)(n0 − ty)) with
    n0 = n(n−1)/2 and tx/ty the tied-pair counts (matches
    ``scipy.stats.kendalltau`` default). NULL tau when either side is
    fully tied or n < 2.

    Plan: O(T²/2) self-join on the BOUNDED named-pair overlap (module
    docstring — the quadratic diagnostic member), map-side-combined to
    four counters; one final single-row select."""
    j = _overlap(df, key_a, key_b, key_col, loc_col, value_col)
    l_ = j.select(
        F.col("_l").alias("_l1"),
        F.col("_x").alias("_x1"),
        F.col("_y").alias("_y1"),
    )
    r_ = j.select(
        F.col("_l").alias("_l2"),
        F.col("_x").alias("_x2"),
        F.col("_y").alias("_y2"),
    )
    pairs = l_.join(r_, F.col("_l1") < F.col("_l2"))
    sx = F.signum(F.col("_x2") - F.col("_x1"))
    sy = F.signum(F.col("_y2") - F.col("_y1"))
    agg = pairs.agg(
        F.count(F.lit(1)).alias("_n0"),
        F.sum(F.when(sx * sy > 0, 1).otherwise(0)).alias("nc"),
        F.sum(F.when(sx * sy < 0, 1).otherwise(0)).alias("nd"),
        F.sum(F.when(sx == 0, 1).otherwise(0)).alias("_tx"),
        F.sum(F.when(sy == 0, 1).otherwise(0)).alias("_ty"),
    )
    n_rows = j.agg(F.count(F.lit(1)).alias("n"))
    tau = F.try_divide(
        (F.col("nc") - F.col("nd")).cast("double"),
        F.sqrt(
            (F.col("_n0") - F.col("_tx")).cast("double")
            * (F.col("_n0") - F.col("_ty")).cast("double")
        ),
    )
    return agg.crossJoin(n_rows).select(
        F.lit(key_a).alias("key_a"),
        F.lit(key_b).alias("key_b"),
        "n",
        F.col("nc").alias("n_concordant"),
        F.col("nd").alias("n_discordant"),
        tau.alias("tau"),
    )
