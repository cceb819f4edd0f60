"""Classical seasonal decomposition (additive): y = trend + seasonal + resid.

The moving-average decomposition of statsmodels'
``seasonal_decompose(model="additive")`` — the standard first look at any
seasonal series, and a natural companion to the reference's Holt-Winters
smoother (``models/HoltWinters.scala`` fits level/trend/season; this
operator *measures* them non-parametrically):

1. **Trend** — centered moving average of one full period. Odd period:
   plain ``period``-wide mean. Even period: the textbook 2×MA — a
   ``period+1``-wide window with half weight on both end points. Windows
   that would extend past the series (or contain a missing cell) yield
   NULL, exactly statsmodels' NaN edges.
2. **Seasonal** — per period-position mean of the detrended series,
   re-centered to sum to zero over one period, tiled across the whole
   series (edges included, like statsmodels).
3. **Residual** — ``y − trend − seasonal`` (NULL wherever trend is).

Plan shape: one (key, loc)-windowed pass for the trend (rides the standard
per-series exchange every grid transform shares), one
(key, position) groupBy for the seasonal means (period-sized per series),
one broadcast-friendly join back. No Python, no per-series collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["seasonal_decompose", "decomposition_strength"]


def seasonal_decompose(
    df: DataFrame,
    period: int,
    key_col: str = "key",
    loc_col: str = "loc",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """→ (key, loc, ts, value, trend, seasonal, resid) over a conformed
    grid. ``period`` ≥ 2; seasonal position = ``loc % period`` (the grid's
    loc is the index position, so phase is stable under slicing only if
    the slice offset is a multiple of the period — slice first, decompose
    second, as with every loc-derived statistic)."""
    p = int(period)
    if p < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    w = Window.partitionBy(key_col).orderBy(loc_col)
    if p % 2 == 1:
        h = (p - 1) // 2
        wf = w.rowsBetween(-h, h)
        trend = F.when(
            (F.count(F.lit(1)).over(wf) == p)
            & (F.count(value_col).over(wf) == p),
            F.avg(value_col).over(wf),
        )
    else:
        h = p // 2
        wf = w.rowsBetween(-h, h)
        ends = F.lag(value_col, h).over(w) + F.lead(value_col, h).over(w)
        trend = F.when(
            (F.count(F.lit(1)).over(wf) == p + 1)
            & (F.count(value_col).over(wf) == p + 1),
            (F.sum(value_col).over(wf) - 0.5 * ends) / p,
        )
    base = df.select(
        key_col, loc_col, ts_col, value_col,
        trend.alias("trend"),
        (F.col(loc_col) % p).alias("_pos"),
    )
    smeans = (
        base.withColumn("_dt", F.col(value_col) - F.col("trend"))
        .groupBy(key_col, "_pos")
        .agg(F.avg("_dt").alias("_sm"))
    )
    wk = Window.partitionBy(key_col)
    # a seasonal estimate needs every period position to carry at least
    # one detrended observation (statsmodels raises "x must have 2
    # complete cycles"; a lazy distributed plan can't raise driver-side,
    # so short/gappy series get NULL seasonal+resid instead of a
    # silently mis-centered cycle averaged over partial positions)
    seasonal = smeans.withColumn(
        "seasonal",
        F.when(
            F.count("_sm").over(wk) == p,
            F.col("_sm") - F.avg("_sm").over(wk),
        ),
    ).select(key_col, "_pos", "seasonal")
    return (
        base.join(seasonal, [key_col, "_pos"], "left")
        .withColumn(
            "resid", F.col(value_col) - F.col("trend") - F.col("seasonal")
        )
        .select(
            key_col, loc_col, ts_col, value_col,
            "trend", "seasonal", "resid",
        )
    )


def decomposition_strength(
    df: DataFrame,
    period: int,
    key_col: str = "key",
    loc_col: str = "loc",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """→ (key, n, trend_strength, seasonal_strength) per series — the FPP
    strength-of-components features (Hyndman & Athanasopoulos, FPP3 §4.3)
    over the classical decomposition:

        F_T = max(0, 1 − Var(R) / Var(T + R))
        F_S = max(0, 1 − Var(R) / Var(S + R))

    computed over the rows where all three components exist (the
    decomposition's NULL edges drop out; ``n`` counts the rows used).
    A zero-variance denominator yields NULL (undefined, not 0 or 1).
    One more per-key aggregate on top of :func:`seasonal_decompose` —
    still no Python."""
    parts = seasonal_decompose(
        df, period, key_col, loc_col, ts_col, value_col
    ).where(F.col("resid").isNotNull())
    vr = F.var_samp("resid")
    vtr = F.var_samp(F.col("trend") + F.col("resid"))
    vsr = F.var_samp(F.col("seasonal") + F.col("resid"))
    return parts.groupBy(key_col).agg(
        F.count("resid").alias("n"),
        F.when(vtr > 0.0, F.greatest(F.lit(0.0), 1.0 - vr / vtr)).alias(
            "trend_strength"
        ),
        F.when(vsr > 0.0, F.greatest(F.lit(0.0), 1.0 - vr / vsr)).alias(
            "seasonal_strength"
        ),
    )
