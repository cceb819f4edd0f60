"""Cross-sectional operators: rank/score ACROSS series at each instant.

Beyond-reference (sryza/spark-timeseries is strictly series-wise — its
only cross-series surface is the instants layout); these partition by
the TIME axis instead of the key axis — the portfolio-construction /
leaderboard shape (rank every asset each day, demean each date, pick
deciles).

Scale note: the window partitions on the instant, so the shuffle key is
``loc`` — K values per partition (one per series), bounded by series
count not series length. A corpus with millions of keys and long
history shuffles the same rows a (key)-partitioned pass would, just
keyed the other way; skew only if one instant holds most observations
(it can't on a grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cross_rank", "cross_zscore"]


def cross_rank(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Input non-null rows + per-instant cross-sectional position:
    ``rank`` (1 = largest value at that instant; ties share the rank
    and leave gaps after it — SQL RANK on value DESC), ``n_keys``
    (series observed at the instant), ``pct`` (percent_rank ∈ [0, 1],
    0 = largest; 0 for a single-series instant by SQL convention).
    One loc-partitioned window pass."""
    v = F.col(value_col)
    wr = Window.partitionBy(loc_col).orderBy(F.desc(value_col))
    wn = Window.partitionBy(loc_col)
    return (
        df.where(v.isNotNull())
        .withColumn("rank", F.rank().over(wr))
        .withColumn("n_keys", F.count(F.lit(1)).over(wn))
        .withColumn("pct", F.percent_rank().over(wr))
    )


def cross_zscore(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Input non-null rows + ``zscore`` — the value demeaned and scaled
    by the CROSS-SECTIONAL (per-instant) mean/sample-std: the standard
    neutralization step before cross-sectional regression or signal
    blending. NULL where the instant has < 2 series or zero dispersion
    (try_divide). One loc-partitioned window pass."""
    v = F.col(value_col)
    wn = Window.partitionBy(loc_col)
    return (
        df.where(v.isNotNull())
        .withColumn(
            "zscore",
            F.try_divide(
                v - F.avg(value_col).over(wn),
                F.stddev_samp(value_col).over(wn),
            ),
        )
    )
