"""Lagging, differencing, quotients, return rates.

Window-function reimplementation of the reference kernels:

- ``lags`` — ``TimeSeriesRDD.scala:77-100`` + ``Lag.lagMatTrimBoth``
  (``Lag.scala:20-130``): per series produce maxLag lagged copies as NEW
  series keyed ``lag{i}(key)``; the result drops the first ``maxLag`` stamps
  of the index (trim-both).
- ``differences(n)`` — ``TimeSeriesRDD.scala:113-115`` /
  ``UnivariateTimeSeries.scala:384-415`` (drops first n stamps).
- ``quotients(n)`` — ``TimeSeriesRDD.scala:121-123``.
- ``return_rates`` — ``TimeSeriesRDD.scala:129-131``.

All are single-window plans: one exchange on the key, whole-stage codegen
after that. ``lags`` fans out rows via an exploded literal array of structs
(one pass, no self-joins), so maxLag lagged series cost one shuffle total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _w(key_col: str, order_col: str) -> Window:
    return Window.partitionBy(key_col).orderBy(order_col)


def lagged_string_key(key_col: str, n: int):
    """Key naming convention ``lag{n}(key)`` (``TimeSeries.scala:406-409``)."""
    return F.format_string(f"lag{n}(%s)", F.col(key_col))


def lags(
    df: DataFrame,
    max_lag: int,
    include_originals: bool = True,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Per-series lagged copies as new series, first ``max_lag`` stamps
    trimmed (semantics of ``TimeSeriesRDD.scala:77-100``)."""
    w = _w(key_col, order_col)
    staged = df.withColumn("_rn", F.row_number().over(w))
    for i in range(1, max_lag + 1):
        staged = staged.withColumn(f"_lag{i}", F.lag(value_col, i).over(w))
    pairs = []
    if include_originals:
        pairs.append(F.struct(F.col(key_col).alias("k"), F.col(value_col).alias("v")))
    for i in range(1, max_lag + 1):
        pairs.append(
            F.struct(lagged_string_key(key_col, i).alias("k"), F.col(f"_lag{i}").alias("v"))
        )
    return (
        staged.where(F.col("_rn") > max_lag)
        .withColumn("_fan", F.explode(F.array(*pairs)))
        .select(
            F.col("_fan.k").alias(key_col),
            *[c for c in df.columns if c not in (key_col, value_col)],
            F.col("_fan.v").alias(value_col),
        )
    )


def lags_per_key(
    df: DataFrame,
    spec: dict[str, tuple[bool, int]],
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Per-series lag map (``TimeSeries.scala:86-148``):
    ``spec[key] = (keep_original, max_lag)`` lets every series choose its
    own lag depth and whether the unlagged copy survives. The global trim
    is the MAX lag across the spec (the reference's ``maxLag`` —
    ``TimeSeries.scala:110``), so all output series share one shortened
    index; lag-k keys are named ``lag{k}(key)`` and the kept original
    retains its bare key (``laggedStringKey``, ``TimeSeries.scala:406-407``
    — lag order 0 maps to the key itself). Series absent from ``spec``
    are dropped (the reference throws on them; dropping is the
    distributed-friendly containment of the same contract).

    Plan shape matches :func:`lags`: ONE window pass per series computes
    every lag column, then a key-conditional explode fans each row into
    that series' configured copies — no join, no second shuffle."""
    if not spec:
        raise ValueError("spec must name at least one series")
    for k, (_, n) in spec.items():
        if n < 0:
            raise ValueError(f"negative max_lag for {k!r}")
    max_lag = max(n for _, n in spec.values())
    w = _w(key_col, order_col)
    staged = df.where(
        F.col(key_col).isin([str(k) for k in spec])
    ).withColumn("_rn", F.row_number().over(w))
    for i in range(1, max_lag + 1):
        staged = staged.withColumn(f"_lag{i}", F.lag(value_col, i).over(w))

    def fan_for(keep: bool, n: int):
        pairs = []
        if keep:
            pairs.append(
                F.struct(F.col(key_col).alias("k"), F.col(value_col).alias("v"))
            )
        for i in range(1, n + 1):
            pairs.append(
                F.struct(
                    lagged_string_key(key_col, i).alias("k"),
                    F.col(f"_lag{i}").alias("v"),
                )
            )
        # a (keep=False, max_lag=0) entry contributes nothing: empty
        # typed array so the explode drops the series cleanly
        if not pairs:
            return F.array().cast("array<struct<k:string,v:double>>")
        return F.array(*pairs)

    fan = None
    for k, (keep, n) in spec.items():
        branch = fan_for(keep, n)
        fan = (
            F.when(F.col(key_col) == str(k), branch)
            if fan is None
            else fan.when(F.col(key_col) == str(k), branch)
        )
    return (
        staged.where(F.col("_rn") > max_lag)
        .withColumn("_fan", F.explode(fan))
        .select(
            F.col("_fan.k").alias(key_col),
            *[c for c in df.columns if c not in (key_col, value_col)],
            F.col("_fan.v").alias(value_col),
        )
    )


def differences(
    df: DataFrame,
    n: int = 1,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """value(t) − value(t−n); drops the first n stamps
    (``UnivariateTimeSeries.scala:384-415``)."""
    w = _w(key_col, order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn(value_col, F.col(value_col) - F.lag(value_col, n).over(w))
        .where(F.col("_rn") > n)
        .drop("_rn")
    )


def quotients(
    df: DataFrame,
    n: int = 1,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """value(t) / value(t−n); drops the first n stamps
    (``UnivariateTimeSeries.scala:47-55``)."""
    w = _w(key_col, order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn(value_col, F.try_divide(F.col(value_col), F.lag(value_col, n).over(w)))
        .where(F.col("_rn") > n)
        .drop("_rn")
    )


def return_rates(
    df: DataFrame,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """value(t)/value(t−1) − 1 (``UnivariateTimeSeries.scala:57-65``)."""
    w = _w(key_col, order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn(value_col, F.try_divide(F.col(value_col), F.lag(value_col, 1).over(w)) - 1.0)
        .where(F.col("_rn") > 1)
        .drop("_rn")
    )


def differences_by_frequency(
    df: DataFrame,
    freq_us: int,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Difference vs the value at/just-before ``t − freq`` with skip-back over
    missing values (``TimeSeries.scala:200-235``) — a backward as-of self-join
    expressed as a native range window: ``last(value, ignorenulls) OVER
    (PARTITION BY key ORDER BY unix_micros(ts) RANGE BETWEEN UNBOUNDED
    PRECEDING AND freq PRECEDING)``. Rows with no base observation (the first
    ``freq`` of each series) are dropped, matching the reference's NaN head.

    Pure JVM plan — one exchange on the key, one sort, no join, no Python —
    so the as-of scales exactly like any other window op."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(Window.unboundedPreceding, -int(freq_us))
    )
    base = F.last(value_col, ignorenulls=True).over(w)
    return (
        df.withColumn("_base", base)
        .where(F.col("_base").isNotNull())
        .withColumn(value_col, F.col(value_col) - F.col("_base"))
        .drop("_base")
    )


def differences_of_order_d(
    df: DataFrame,
    d: int,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Apply first-differencing d times
    (``UnivariateTimeSeries.scala:468-480``). d chained window expressions,
    still one exchange (same window spec throughout)."""
    out = df
    for _ in range(d):
        out = differences(out, 1, key_col, order_col, value_col)
    return out
