"""Forecast-accuracy metrics: per-series MAE / RMSE / MAPE / sMAPE / MASE.

Beyond-reference (sryza/spark-timeseries fits and forecasts —
``models/ARIMA.scala``, ``models/HoltWinters.scala:61-77`` even computes an
internal SSE — but ships no user-facing accuracy surface), yet every
forecasting workflow ends in exactly this comparison. Conventions, stated
because every library picks differently:

- MAE  = mean |y − ŷ|
- RMSE = √(mean (y − ŷ)²)
- MAPE = mean |y − ŷ| / |y|, over rows where y ≠ 0 (zero-actual rows are
  EXCLUDED, not clamped — the classic undefined case)
- sMAPE = mean 2·|y − ŷ| / (|y| + |ŷ|), over rows where the denominator is
  non-zero (the 0-200% symmetric variant)
- MASE = MAE / mean |y_t − y_{t−m}| (Hyndman & Koehler 2006): the scale is
  the IN-SAMPLE naive-m error over the SAME actual series, so MASE < 1
  beats the seasonal-naive baseline. ``m`` is the season length (1 =
  plain naive).

Rows where either y or ŷ is NULL are skipped in every metric (pairwise
deletion), and the per-metric row counts are returned so the caller can
see how much each exclusion rule dropped.

Plan: one lag window for the naive error + ONE per-key aggregate — a
single exchange on key, all JVM expressions; corpus-scale in the number
of series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["forecast_accuracy"]


def forecast_accuracy(
    df: DataFrame,
    actual_col: str = "actual",
    forecast_col: str = "forecast",
    key_col: str = "key",
    order_col: str = "loc",
    m: int = 1,
) -> DataFrame:
    """→ (key, n, mae, rmse, mape, smape, mase) per series.

    ``n`` counts the rows where BOTH actual and forecast are present (the
    MAE/RMSE population). MASE's denominator is the mean |y_t − y_{t−m}|
    over consecutive in-sample actual pairs ON THE NON-NULL-ACTUAL
    SUBSEQUENCE (``lag … IGNORE NULLS`` — a plain physical-row lag would
    pair non-adjacent observations across holes/forecast-only rows and
    silently drop terms, skewing the denominator vs Hyndman-Koehler);
    a constant series (zero naive error) yields NULL MASE rather than
    ±Infinity. Note that with ``m`` > 1 the seasonal pairing is by
    POSITION in the observed subsequence, so a gappy seasonal grid
    should be filled first (same contract as the resample family)."""
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")
    y = F.col(actual_col)
    f_ = F.col(forecast_col)
    w = Window.partitionBy(key_col).orderBy(order_col)
    err = F.when(y.isNotNull() & f_.isNotNull(), F.abs(y - f_))
    sq = F.when(y.isNotNull() & f_.isNotNull(), (y - f_) * (y - f_))
    ape = F.when(y.isNotNull() & f_.isNotNull() & (y != 0.0), F.abs(y - f_) / F.abs(y))
    sden = F.abs(y) + F.abs(f_)
    sape = F.when(
        y.isNotNull() & f_.isNotNull() & (sden != 0.0),
        2.0 * F.abs(y - f_) / sden,
    )
    # the m-th previous NON-NULL actual (pyspark's F.lag has no
    # ignoreNulls parameter — SQL-expression window instead); gating on
    # the current y keeps the pair fully inside the observed subsequence
    prev = F.expr(
        f"lag(`{actual_col}`, {int(m)}) IGNORE NULLS OVER "
        f"(PARTITION BY `{key_col}` ORDER BY `{order_col}`)"
    )
    naive = F.when(y.isNotNull(), F.abs(y - prev))
    return (
        df.withColumn("_naive", naive)
        .groupBy(key_col)
        .agg(
            F.count(err).alias("n"),
            F.avg(err).alias("mae"),
            F.sqrt(F.avg(sq)).alias("rmse"),
            F.avg(ape).alias("mape"),
            F.avg(sape).alias("smape"),
            F.avg("_naive").alias("_scale"),
        )
        .withColumn("mase", F.try_divide(F.col("mae"), F.col("_scale")))
        .drop("_scale")
    )
