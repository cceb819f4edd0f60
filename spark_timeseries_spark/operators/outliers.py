"""Per-series outlier flagging: z-score and MAD (robust) variants.

Beyond-reference (the reference has no anomaly surface), but the natural
next step after ``seriesStats``: flag observations implausibly far from
their series' center. Two estimators:

- ``method="zscore"``: (x − mean)/stddev — cheap, but mean and stddev are
  themselves dragged by the outliers being hunted (masking).
- ``method="mad"``: (x − median)/(1.4826·MAD) — the robust default;
  median and MAD have a 50% breakdown point, so a contaminated series
  still flags its spikes. 1.4826 rescales MAD to σ under normality.

Plan: one per-series aggregate (exact interpolated ``percentile`` for the
medians — per-series cardinality is the series length, the reference's
own in-memory envelope, NOT corpus-scale; swap ``approx_percentile`` in if
series outgrow it) joined back broadcast-style, then a row-local score —
two exchanges total, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["outliers"]

_MAD_K = 1.4826022185056018  # 1/Phi^-1(0.75): MAD→sigma under normality


def outliers(
    df: DataFrame,
    method: str = "mad",
    threshold: float = 3.5,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Input columns + ``score`` (signed, in σ-equivalents) +
    ``is_outlier`` (|score| > threshold). Missing values get NULL score
    and NULL flag (no evidence either way). Zero scale yields NULL
    scores rather than ±Infinity — and note MAD collapses to zero
    whenever MORE THAN HALF the series equals its median (e.g.
    [5,5,5,5,100] flags nothing), not only for constant series; on
    corpora with heavy repeated values prefer ``method="zscore"`` or
    pre-filter the repeats."""
    if method not in ("zscore", "mad"):
        raise ValueError(f"method must be 'zscore' or 'mad', got {method!r}")
    v = F.col(value_col)
    if method == "zscore":
        stats = df.groupBy(key_col).agg(
            F.avg(v).alias("_c"), F.stddev(v).alias("_s")
        )
        joined = df.join(stats, key_col)
    else:
        med = df.groupBy(key_col).agg(
            F.percentile(v, F.lit(0.5)).alias("_c")
        )
        joined = df.join(med, key_col)
        mad = joined.groupBy(key_col).agg(
            (
                F.percentile(F.abs(v - F.col("_c")), F.lit(0.5)) * _MAD_K
            ).alias("_s")
        )
        joined = joined.join(mad, key_col)
    score = F.try_divide(v - F.col("_c"), F.col("_s"))
    # try_divide(x, 0) -> NULL: zero-spread series report no outliers
    return (
        joined.withColumn("score", score)
        .withColumn(
            "is_outlier",
            F.when(
                F.col("score").isNotNull(),
                F.abs(F.col("score")) > float(threshold),
            ),
        )
        .drop("_c", "_s")
    )
