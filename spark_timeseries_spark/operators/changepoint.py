"""Single mean-shift changepoint per series (binary-segmentation step).

Beyond-reference (the reference's change detection surface is the CUSUM
gate this engine already ships in ``operators/cusum.py``); this is the
offline companion: the first step of binary segmentation (Scott & Knott
1974; the AMOC case of Killick & Eckley's ``changepoint``), which an
alerting pipeline runs to LOCATE the level shift CUSUM flagged.

Statistic: for every admissible split after position ``i`` (1-based,
``minseg ≤ i ≤ n - minseg``) over the non-NULL cells of a series,

    T(i) = sqrt(i · (n − i) / n) · |mean(left) − mean(right)|

— the two-sample mean-shift statistic under a common-variance normal
model; the changepoint is the argmax split. Returned per key:
``cp_loc`` (the ``loc`` of the LAST point of the left segment),
``stat`` (T at the argmax), ``mean_left``, ``mean_right``.

Determinism: the argmax is taken on T ROUNDED to ``round_digits``
decimals with ties broken by the SMALLEST split position — so two
engines that agree on T to 6 decimals (they do: it's one subtraction,
one multiply, one sqrt over exact prefix sums) pick the same split even
when the unrounded values differ in the last bit.

Plan: one (key, loc) window pass builds prefix count/sum (map-side after
the single exchange), a per-key window computes the series totals, the
statistic is a JVM column expression per row, and ONE map-side-combined
groupBy takes the struct-min argmax. No Python, no self-join, no
quadratic anything — O(n) rows per series throughout, so the operator
scales to arbitrarily many series (the 100 TB axis) and to long series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["changepoint_mean"]


def changepoint_mean(
    df: DataFrame,
    minseg: int = 2,
    round_digits: int = 6,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Most likely single mean-shift split per series.

    NULL cells are dropped first (splits are over the observed
    subsequence, positions counted over non-NULL cells only). Series with
    fewer than ``2 * minseg`` observations produce no row.
    """
    if minseg < 1:
        raise ValueError("minseg must be >= 1")
    obs = df.where(F.col(value_col).isNotNull())
    wcum = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy(key_col)
    pre = (
        obs.withColumn("_i", F.count(value_col).over(wcum))
        .withColumn("_s", F.sum(value_col).over(wcum))
        .withColumn("_n", F.count(value_col).over(wall))
        .withColumn("_t", F.sum(value_col).over(wall))
    )
    i, s, n, t = F.col("_i"), F.col("_s"), F.col("_n"), F.col("_t")
    admissible = (i >= minseg) & (i <= n - minseg)
    ml = s / i
    mr = (t - s) / (n - i)
    stat = F.sqrt(i * (n - i) / n) * F.abs(ml - mr)
    # argmax on the ROUNDED statistic; earliest split on ties (struct-min
    # over (-stat_r, i) — both components integer-or-rounded, so the pick
    # is bit-stable across engines)
    scale = float(10**round_digits)
    stat_r = F.floor(stat * scale + F.lit(0.500001)) / scale
    arg = F.struct(
        (-stat_r).alias("negstat"),
        i.alias("i"),
        F.col(order_col).alias("loc"),
        ml.alias("ml"),
        mr.alias("mr"),
    )
    return (
        pre.where(admissible & (n >= 2 * minseg))
        .groupBy(key_col)
        .agg(F.min(arg).alias("_a"))
        .select(
            key_col,
            F.col("_a.loc").alias("cp_loc"),
            (-F.col("_a.negstat")).alias("stat"),
            F.col("_a.ml").alias("mean_left"),
            F.col("_a.mr").alias("mean_right"),
        )
    )
