"""Series- and instant-level filtering.

Reference equivalents (all in
``/root/reference/src/main/scala/com/cloudera/sparkts/TimeSeriesRDD.scala``):
``filter`` (:133-135), ``filterStartingBefore`` (:140-143),
``filterEndingAfter`` (:148-151), ``filterByInstant`` (:158-184),
``removeInstantsWithNaNs`` (:189-210), ``findSeries`` (:105-107),
``slice`` (:218-233); trim kernels ``UnivariateTimeSeries.scala:98-142``.

Spark-first: series-level predicates become aggregate + semi-join (the
aggregate side is tiny — one row per key — so the join broadcasts); instant-
level predicates become a distinct-bad-timestamps set + broadcast anti-join.
The reference's two-phase distributed boolean-mask ``aggregate``
(:161-176) is exactly a ``groupBy(ts)`` in disguise.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def slice_by_time(
    df: DataFrame, start, end, ts_col: str = "ts", rebase_loc: bool = True,
    loc_col: str = "loc",
) -> DataFrame:
    """Inclusive [start, end] time slice (``TimeSeriesRDD.scala:218-233``) —
    a plain pushdown-friendly predicate. ``rebase_loc`` renumbers locations so
    the sliced frame is again conformed to its (sliced) index."""
    out = df.where((F.col(ts_col) >= F.lit(start)) & (F.col(ts_col) <= F.lit(end)))
    if rebase_loc and loc_col in df.columns:
        base = out.groupBy().agg(F.min(loc_col).alias("_b"))
        out = (
            out.join(F.broadcast(base))
            .withColumn(loc_col, F.col(loc_col) - F.col("_b"))
            .drop("_b")
        )
    return out


def islice(
    df: DataFrame, start: int, end: int, loc_col: str = "loc", rebase_loc: bool = True
) -> DataFrame:
    """Integer-location slice [start, end) (``DateTimeIndex.scala:60-69``)."""
    out = df.where((F.col(loc_col) >= start) & (F.col(loc_col) < end))
    if rebase_loc:
        out = out.withColumn(loc_col, F.col(loc_col) - F.lit(start))
    return out


def find_series(df: DataFrame, key, key_col: str = "key") -> DataFrame:
    """Point lookup of one series (``TimeSeriesRDD.scala:105-107``)."""
    return df.where(F.col(key_col) == F.lit(key))


def filter_starting_before(
    df: DataFrame, dt, key_col: str = "key", ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Keep series whose first non-null observation is at/before ``dt``
    (``TimeSeriesRDD.scala:140-143``)."""
    keep = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("_first"))
        .where(F.col("_first") <= F.lit(dt))
        .select(key_col)
    )
    return df.join(F.broadcast(keep), key_col, "left_semi")


def filter_ending_after(
    df: DataFrame, dt, key_col: str = "key", ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Keep series whose last non-null observation is at/after ``dt``
    (``TimeSeriesRDD.scala:148-151``)."""
    keep = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(key_col)
        .agg(F.max(ts_col).alias("_last"))
        .where(F.col("_last") >= F.lit(dt))
        .select(key_col)
    )
    return df.join(F.broadcast(keep), key_col, "left_semi")


def filter_by_instant(
    df: DataFrame,
    predicate: Column,
    keys: list | None = None,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    rebase_loc: bool = True,
    loc_col: str = "loc",
) -> DataFrame:
    """Drop every time point at which ``predicate`` (a boolean Column over
    ``value_col``) fails for ANY of the named series (all series if
    ``keys=None``) — ``TimeSeriesRDD.scala:158-184``. The surviving frame is
    renumbered (the reference's result index becomes irregular).

    A NULL predicate result counts as FAILED: the reference evaluates the
    predicate over doubles where a missing cell is NaN and every NaN
    comparison is plain false, so the instant is dropped — ``~predicate``
    alone would leave SQL-NULL rows out of the bad set and silently KEEP
    instants where a series is missing."""
    scoped = df if keys is None else df.where(F.col(key_col).isin(list(keys)))
    bad = (
        scoped.where(predicate.isNull() | ~predicate)
        .select(ts_col)
        .distinct()
    )
    # No broadcast hint: the bad-instant set is usually tiny but is NOT
    # bounded (a predicate most instants fail yields ~the whole index), so a
    # forced broadcast can exceed driver/executor limits at scale. AQE picks
    # broadcast at runtime when the built side is actually small.
    out = df.join(bad, ts_col, "left_anti")
    if rebase_loc and loc_col in df.columns:
        w = Window.partitionBy(key_col).orderBy(loc_col)
        out = out.withColumn(loc_col, F.row_number().over(w) - 1)
    return out


def remove_instants_with_nans(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    rebase_loc: bool = True,
    loc_col: str = "loc",
) -> DataFrame:
    """Drop time points where any series is missing
    (``TimeSeriesRDD.scala:189-210``). Requires the dense conformed layout."""
    return filter_by_instant(
        df,
        F.col(value_col).isNotNull(),
        None,
        key_col,
        ts_col,
        value_col,
        rebase_loc,
        loc_col,
    )


def trim_leading_trailing(
    df: DataFrame,
    leading: bool = True,
    trailing: bool = True,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Strip each series' missing prefix/suffix
    (``UnivariateTimeSeries.scala:98-120``) — per-key window min/max of
    non-null positions; one exchange."""
    w = Window.partitionBy(key_col)
    pos = F.when(F.col(value_col).isNotNull(), F.col(order_col))
    out = df.withColumn("_lo", F.min(pos).over(w)).withColumn("_hi", F.max(pos).over(w))
    cond = F.lit(True)
    if leading:
        cond = cond & (F.col(order_col) >= F.col("_lo"))
    if trailing:
        cond = cond & (F.col(order_col) <= F.col("_hi"))
    return out.where(cond).drop("_lo", "_hi")


def min_max_datetimes(
    df: DataFrame, key_col: str = "key", ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Per-series argmin/argmax timestamps (``TimeSeriesUtils.scala:280-301``)
    via native ``min_by``/``max_by``."""
    return df.where(F.col(value_col).isNotNull()).groupBy(key_col).agg(
        F.min_by(ts_col, value_col).alias("min_dt"),
        F.max_by(ts_col, value_col).alias("max_dt"),
    )
