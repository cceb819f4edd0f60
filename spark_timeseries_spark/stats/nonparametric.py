"""Distribution-free randomness / random-walk diagnostics as DataFrame
operators: Wald-Wolfowitz runs test, Lo-MacKinlay variance ratio.

Beyond-reference (the reference's test surface —
``stats/TimeSeriesStatisticalTests.scala`` — is regression-residual
oriented); these are the corpus-scale screens: "is this series random
noise?" (runs) and "is this a random walk?" (variance ratio), both exact
closed forms over window prefix algebra — per-series aggregates on the
shared (key, loc) sort, no Python in the statistic path (only the
bounded K-row normal-tail p-value pandas_udf, the same shape as
mann_kendall's — DuckDB has no erf, so oracles check through z).

The companion turning-points test lives in ``operators/features.py``
(it is part of the tsfeatures-style per-series catalog there).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["runs_test", "variance_ratio"]


def runs_test(
    df: DataFrame,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Wald-Wolfowitz runs test about the MEDIAN per series → (key, n1,
    n2, runs, z, p_value): values above/below the series median form a
    binary sequence; ``runs`` counts its maximal same-sign blocks.
    Under randomness E[R] = 1 + 2·n1·n2/(n1+n2), Var[R] =
    2n1n2(2n1n2 − n1 − n2) / ((n1+n2)²(n1+n2−1)); z = (R − E)/√Var,
    two-sided normal p. Values EQUAL to the median are dropped (the
    standard convention — they belong to neither side), as are NULL
    cells; series with n1 = 0 or n2 = 0 (or fewer than 2 kept points)
    yield NULL z/p.

    Plan: one exact-percentile aggregate for the median (broadcast back
    — K rows), then sign + lag + one aggregate on the (key, loc) sort."""
    from ..models._numeric import norm_cdf

    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    med = pts.groupBy(key_col).agg(
        F.percentile(value_col, F.lit(0.5)).alias("_med")
    )
    ws = Window.partitionBy(key_col).orderBy(order_col)
    kept = (
        pts.join(F.broadcast(med), key_col)
        .where(v != F.col("_med"))
        .withColumn("_up", (v > F.col("_med")).cast("int"))
        .withColumn("_chg", (F.col("_up") != F.lag("_up").over(ws)).cast("int"))
    )
    agg = kept.groupBy(key_col).agg(
        F.sum("_up").alias("n1"),
        F.sum(1 - F.col("_up")).alias("n2"),
        (F.coalesce(F.sum("_chg"), F.lit(0)) + 1).alias("runs"),
    )
    # anchor on every input series: a constant series drops ALL its
    # points (every value equals the median) and must still report a row
    agg = (
        pts.select(key_col)
        .distinct()
        .join(agg, key_col, "left")
        .withColumn("n1", F.coalesce("n1", F.lit(0)))
        .withColumn("n2", F.coalesce("n2", F.lit(0)))
        .withColumn("runs", F.coalesce("runs", F.lit(0)))
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    nn = n1 + n2
    mu = 1.0 + 2.0 * n1 * n2 / nn
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - nn) / (nn * nn * (nn - 1.0))
    z = F.when(
        (F.col("n1") > 0) & (F.col("n2") > 0) & (nn >= 2) & (var > 0),
        (F.col("runs").cast("double") - mu) / F.sqrt(var),
    )
    out = agg.withColumn("z", z)

    @F.pandas_udf("double")
    def _p(zc: pd.Series) -> pd.Series:
        return zc.map(
            lambda x: None if pd.isna(x) else 2.0 * (1.0 - norm_cdf(abs(x)))
        )

    return out.select(
        key_col, "n1", "n2", "runs", "z", _p(F.col("z")).alias("p_value")
    )


def variance_ratio(
    df: DataFrame,
    q: int = 2,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Lo-MacKinlay (1988) variance-ratio test per series → (key, n, vr,
    z): if x is a random walk, the variance of q-step differences is q
    times the 1-step variance, so VR(q) = σ̂²_q/σ̂²_1 ≈ 1. Estimators
    (the overlapping, bias-corrected form of the paper):

        μ̂    = (x_n − x_0)/n                       (n = #one-step diffs)
        σ̂²_1 = Σ (Δx_t − μ̂)² / (n − 1)
        σ̂²_q = Σ (x_t − x_{t−q} − q·μ̂)² / m,
        m    = q·(n − q + 1)·(1 − q/n)

    z = (VR − 1)/√(2(2q−1)(q−1)/(3·q·n)) — the homoskedastic statistic
    (the heteroskedasticity-robust variant needs per-lag delta terms and
    is out of scope; stated). VR > 1 → momentum, < 1 → mean reversion.
    NULL cells are dropped; positions are the observed subsequence's
    ranks (gaps are treated as consecutive — fill first for calendar
    spacing); series with n ≤ q yield NULL vr/z.

    Plan: two lag windows + one aggregate on the shared sort; first/last
    ride the same partition frame. All JVM; the z is closed-form so the
    whole row is SQL-oracle-replayable (no erf needed)."""
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    ws = Window.partitionBy(key_col).orderBy(order_col)
    wk = Window.partitionBy(key_col)
    d = (
        pts.withColumn("_d1", v - F.lag(value_col, 1).over(ws))
        .withColumn("_dq", v - F.lag(value_col, q).over(ws))
        .withColumn("_first", F.first(value_col).over(ws))
        .withColumn("_last", F.last(value_col).over(
            ws.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ))
        .withColumn("_cnt", F.count(value_col).over(wk))
    )
    mu = (F.col("_last") - F.col("_first")) / (F.col("_cnt") - 1).cast("double")
    agg = (
        d.withColumn("_mu", mu)
        .groupBy(key_col)
        .agg(
            (F.max("_cnt") - 1).alias("n"),
            F.sum(
                (F.col("_d1") - F.col("_mu")) * (F.col("_d1") - F.col("_mu"))
            ).alias("_s1"),
            F.sum(
                (F.col("_dq") - q * F.col("_mu"))
                * (F.col("_dq") - q * F.col("_mu"))
            ).alias("_sq"),
        )
    )
    n = F.col("n").cast("double")
    var1 = F.col("_s1") / (n - 1.0)
    mq = q * (n - q + 1.0) * (1.0 - q / n)
    varq = F.col("_sq") / mq
    vr = F.try_divide(varq, var1)
    se = F.sqrt(2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q * n))
    return agg.select(
        key_col,
        "n",
        F.when(F.col("n") > q, vr).alias("vr"),
        F.when(F.col("n") > q, F.try_divide(vr - 1.0, se)).alias("z"),
    )
