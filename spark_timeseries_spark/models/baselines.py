"""Baseline forecasts: naive / seasonal-naive / drift.

Beyond-reference, but methodologically load-bearing: every forecast
accuracy claim needs the benchmark these provide (MASE is DEFINED against
the naive forecast — :mod:`..stats.evaluation`), and at corpus scale the
baselines are often the only methods cheap enough to run on every series.

All three are pure DataFrame algebra — per-key aggregates + an explode
over the horizon + (for snaive) one equi-join back to the observations.
No Python, no per-series kernel: these run on a million series as one
job. Conventions (Hyndman & Athanasopoulos, FPP3 §5.2):

- naive:  ŷ_{T+h} = y_T (last non-null observation)
- snaive: ŷ_{T+h} = y_{T+h−m·k}, k = ⌈h/m⌉ (the value one whole number
  of seasonal cycles back; NULL if that location is missing/null)
- drift:  ŷ_{T+h} = y_T + h·(y_T − y_first)/(loc_T − loc_first)
  (the line through the first and last observations, extrapolated;
  NULL for a single-point series)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["baseline_forecast"]

_METHODS = {"naive", "snaive", "drift"}


def baseline_forecast(
    df: DataFrame,
    h: int,
    method: str = "naive",
    period: int | None = None,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """→ (key, step, forecast), step 1..h, per series."""
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")
    if h < 1:
        raise ValueError("h must be >= 1")
    if method == "snaive":
        if period is None or period < 1:
            raise ValueError("snaive needs period >= 1")
    v = F.col(value_col)
    obs = df.where(v.isNotNull())
    stats = obs.groupBy(key_col).agg(
        F.max(order_col).alias("_T"),
        F.min(order_col).alias("_t0"),
        F.max_by(v, F.col(order_col)).alias("_last"),
        F.min_by(v, F.col(order_col)).alias("_first"),
    )
    steps = stats.withColumn(
        "step", F.explode(F.sequence(F.lit(1), F.lit(int(h))))
    )
    if method == "naive":
        out = steps.select(
            key_col, "step", F.col("_last").alias("forecast")
        )
    elif method == "drift":
        slope = F.try_divide(
            F.col("_last") - F.col("_first"),
            (F.col("_T") - F.col("_t0")).cast("double"),
        )
        out = steps.select(
            key_col,
            "step",
            (F.col("_last") + F.col("step") * slope).alias("forecast"),
        )
    else:  # snaive
        m = int(period)
        src = F.col("_T") + F.col("step") - F.lit(m) * F.ceil(
            F.col("step") / F.lit(m)
        ).cast("long")
        keyed = steps.select(key_col, "step", src.alias("_src"))
        src_vals = df.select(
            key_col,
            F.col(order_col).alias("_src"),
            v.alias("forecast"),
        )
        out = keyed.join(src_vals, [key_col, "_src"], "left").select(
            key_col, "step", "forecast"
        )
    return out
