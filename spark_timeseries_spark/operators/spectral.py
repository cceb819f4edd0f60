"""Per-series spectral analysis: Schuster periodogram + dominant period.

Beyond-reference (sryza/spark-timeseries has no frequency-domain surface),
but the natural diagnostic next to :mod:`decompose` — "is there a cycle,
and at what period?" answered with the classic periodogram
P(k) = (2/n)·(a_k² + b_k²), a_k = Σ v'_t·cos(2πkt/n),
b_k = Σ v'_t·sin(2πkt/n) over the demeaned series v', evaluated at the
Fourier frequencies k = 1..⌊n/2⌋ (Schuster 1898; the length-normalized
variant used by R's ``spec.pegram`` family up to its scaling constant).

Plan: one per-series moment aggregate (n, mean), then each point explodes
into its ⌊n/2⌋ frequency contributions and ONE map-side-combined groupBy
(key, k) sums the projections — all JVM trig expressions, no Python, no
window, no global sort. The explode is O(n²/2) per series — the
reference's own one-series-in-memory envelope (same documented quadratic
class as Theil-Sen), keyed per series so the corpus dimension
parallelizes; swap in a grouped-map FFT kernel if series outgrow it.

Missing cells: the input should be FILLED first (``fill.fill_linear`` et
al.) — a NULL cell is dropped from the sums, which is the "treat as the
mean" convention after demeaning (exact only for truly-missing-at-random
holes; the docstring exists so nobody mistakes this for Lomb-Scargle).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["periodogram", "dominant_period"]


def periodogram(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """(key, k, power): periodogram ordinate at each Fourier frequency
    k = 1..⌊n/2⌋, where n is the series' grid length (rows per key) and
    t is the grid location — a spike at k means a cycle of period n/k
    grid steps."""
    v = F.col(value_col)
    stats = df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("_n"), F.avg(v).alias("_mu")
    )
    # _n >= 2 guard: sequence(1, 0) counts DOWN in Spark (default step -1),
    # so a 1-point series would emit spurious k=1,0 rows instead of none.
    pts = (
        df.join(stats, key_col)
        .where(v.isNotNull())
        .where(F.col("_n") >= F.lit(2))
    )
    two_pi = 2.0 * math.pi
    freq = pts.withColumn(
        "k", F.explode(F.sequence(F.lit(1), (F.col("_n") / 2).cast("int")))
    )
    ang = (
        F.lit(two_pi)
        * F.col("k").cast("double")
        * F.col(loc_col).cast("double")
        / F.col("_n").cast("double")
    )
    dv = v - F.col("_mu")
    return (
        freq.groupBy(key_col, "k")
        .agg(
            F.sum(dv * F.cos(ang)).alias("_a"),
            F.sum(dv * F.sin(ang)).alias("_b"),
            F.first("_n").alias("_n"),
        )
        .select(
            key_col,
            "k",
            (
                (F.col("_a") * F.col("_a") + F.col("_b") * F.col("_b"))
                * 2.0
                / F.col("_n")
            ).alias("power"),
        )
    )


def dominant_period(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
    tie_digits: int | None = None,
) -> DataFrame:
    """(key, k, period, power): the argmax-power Fourier frequency per
    series and its period n/k in grid steps (ties to the LOWEST k — the
    longest period — deterministically). One aggregation over the
    periodogram via struct-max.

    ``tie_digits`` ranks on ``round(power, tie_digits)`` instead of the
    raw float: near-tied ordinates whose difference is below summation-
    order noise then resolve by the deterministic lowest-k rule on every
    engine, instead of by whichever side's fp dust is larger.
    """
    per = periodogram(df, key_col, loc_col, value_col)
    n = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
    rank_p = (
        F.round(F.col("power"), tie_digits)
        if tie_digits is not None
        else F.col("power")
    )
    best = per.groupBy(key_col).agg(
        F.max(
            F.struct(
                rank_p.alias("rp"),
                (-F.col("k")).alias("nk"),
                F.col("power").alias("p"),
            )
        ).alias("_best")
    )
    return (
        best.join(n, key_col)
        .select(
            key_col,
            (-F.col("_best.nk")).alias("k"),
            (F.col("_n").cast("double") / (-F.col("_best.nk"))).alias(
                "period"
            ),
            F.col("_best.p").alias("power"),
        )
    )
