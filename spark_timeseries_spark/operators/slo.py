"""SLO / error-budget analytics over raw event streams.

Beyond-reference (the reference has no reliability surface); the
multiwindow burn-rate rule is the standard SRE alerting construction
(Beyer et al., *The Site Reliability Workbook* ch. 5): alert when the
error-budget burn rate is high over BOTH a short window (still
happening) and a long window (significant) — the pairing that kills
both flappy one-bucket alerts and slow-burn blindness.

Scale: hourly (or any unit) error fractions are ONE map-side-combinable
groupBy over the raw events; the window pass then runs on the
per-(key, bucket) aggregate — bucket-count cardinality, thousands of
times smaller than the stream. No joins, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["error_burn"]


def error_burn(
    df: DataFrame,
    slo: float = 0.05,
    short: int = 1,
    long: int = 6,
    unit: str = "hour",
    error_type: str = "error",
    key_col: str = "key",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ one row per (key, ``date_trunc(unit)`` bucket with events):
    ``n``/``n_err`` (bucket totals), ``frac_short``/``frac_long``
    (error fraction over the trailing ``short``/``long`` OBSERVED
    buckets — event-weighted: Σerr/Σn, not a mean of fractions),
    ``burn_short``/``burn_long`` (fractions ÷ the ``slo`` error
    budget; 1.0 = burning exactly at budget), and ``alarm`` (both
    burns > 1 — the multiwindow rule). Buckets with zero events emit
    no row and are skipped by the trailing windows (observed-bucket
    convention, stated — densify with a calendar first for strict
    wall-clock windows).

    Plan: one groupBy(key, bucket) + two same-sort trailing windows on
    the aggregate — two exchanges total (the second over bucket-level
    rows), no joins, all JVM."""
    if not 0.0 < slo < 1.0:
        raise ValueError(f"slo must be in (0, 1), got {slo}")
    if not 1 <= short < long:
        raise ValueError(f"need 1 <= short < long, got {short}, {long}")
    bucket = F.date_trunc(unit, F.col(ts_col))
    g = (
        df.withColumn("_b", bucket)
        .groupBy(key_col, F.col("_b").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col(type_col) == error_type, 1).otherwise(0)
            ).alias("n_err"),
        )
    )
    ws = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(-(short - 1), 0)
    )
    wl = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(-(long - 1), 0)
    )
    fs = F.try_divide(
        F.sum("n_err").over(ws).cast("double"),
        F.sum("n").over(ws).cast("double"),
    )
    fl = F.try_divide(
        F.sum("n_err").over(wl).cast("double"),
        F.sum("n").over(wl).cast("double"),
    )
    d = (
        g.withColumn("frac_short", fs)
        .withColumn("frac_long", fl)
        .withColumn("burn_short", F.col("frac_short") / slo)
        .withColumn("burn_long", F.col("frac_long") / slo)
    )
    return d.withColumn(
        "alarm", (F.col("burn_short") > 1.0) & (F.col("burn_long") > 1.0)
    )
