"""Per-series scaling / normalization transforms.

Beyond-reference; the preprocessing layer every cross-series model or
similarity pipeline needs before comparing series of different levels
(k-means over series shapes, SAX, distance-based motif search all
assume comparable scales):

- ``zscore`` — (v − mean)/sample-std; the classical standardization.
- ``robust`` — (v − median)/(1.4826·MAD); the outlier-proof variant
  (1.4826 makes MAD a consistent σ estimator under normality —
  Hampel/Rousseeuw convention, same constant the engine's
  :func:`~spark_timeseries_spark.operators.outliers.outliers` robust
  mode uses). Medians are exact interpolated percentiles, matching
  DuckDB ``quantile_cont`` bit-for-bit.
- ``minmax`` — (v − min)/(max − min) onto [0, 1].

Degenerate series (zero spread under the chosen method) yield NULL
scaled values — never a divide-by-zero and never a silent 0 (a constant
series has no shape to normalize; downstream should see that).

Plan: per-key statistics are ONE groupBy producing K rows, broadcast
back onto the observations — the big side is never re-shuffled (the
same broadcast-stats shape as the streaming outlier gate). The robust
method needs a second K-row pass for the MAD (deviations need the
median first); both stat tables stay broadcast-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["scale"]

_MAD_K = 1.4826


def scale(
    df: DataFrame,
    method: str = "zscore",
    key_col: str = "key",
    value_col: str = "value",
    out_col: str = "scaled",
) -> DataFrame:
    """Append ``out_col`` with the per-series scaled value (NULL cells
    pass through as NULL; they are excluded from the statistics)."""
    if method not in ("zscore", "robust", "minmax"):
        raise ValueError(
            f"method must be zscore|robust|minmax, got {method!r}"
        )
    v = F.col(value_col)
    obs = df.where(v.isNotNull())
    if method == "zscore":
        stats = obs.groupBy(key_col).agg(
            F.avg(v).alias("_ctr"), F.stddev_samp(v).alias("_spr")
        )
    elif method == "minmax":
        stats = obs.groupBy(key_col).agg(
            F.min(v).alias("_ctr"),
            (F.max(v) - F.min(v)).alias("_spr"),
        )
    else:  # robust
        med = obs.groupBy(key_col).agg(
            F.percentile(v, F.lit(0.5)).alias("_ctr")
        )
        stats = (
            obs.join(F.broadcast(med), key_col)
            .groupBy(key_col)
            .agg(
                F.first("_ctr").alias("_ctr"),
                (
                    F.percentile(F.abs(v - F.col("_ctr")), F.lit(0.5))
                    * _MAD_K
                ).alias("_spr"),
            )
        )
    scaled = F.when(
        F.col("_spr") > 0, (v - F.col("_ctr")) / F.col("_spr")
    )
    return (
        df.join(F.broadcast(stats), key_col, "left")
        .withColumn(out_col, scaled)
        .drop("_ctr", "_spr")
    )
