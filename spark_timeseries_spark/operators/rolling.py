"""Rolling-window aggregation and autocorrelation.

- ``roll_sum(n, align)`` / ``roll_mean(n, align)`` — reference
  ``TimeSeriesRDD.scala:611-621,640-642`` + kernel
  ``UnivariateTimeSeries.rollSum`` (``:497-499``). The reference stamps the
  n-window aggregate on the Left/Center/Right element of the window by
  re-slicing the result index (``islice`` arithmetic at ``:614-619``); we get
  identical semantics with a rows-frame anchored accordingly, keeping only
  complete windows (count == n).
- ``autocorr(max_lag)`` — per-series autocorrelation
  (``UnivariateTimeSeries.scala:43-45,70-96``): the reference computes the
  PEARSON CORRELATION of the lag-k slice pairs (each slice demeaned by its
  own mean, normalized by its own variance) — NOT the classical
  global-mean ACF Σ(x_t−µ)(x_{t+k}−µ)/Σ(x_t−µ)², which differs on short
  or trending series. We mirror the reference exactly with ``F.corr``
  over (x_t, x_{t−k}) pairs — window lags + one aggregate, no Python.

Each is one exchange on the key; all window frames share the (key, loc) sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_ALIGN = {"right", "center", "left"}


def _frame(n: int, align: str):
    a = align.lower()
    if a not in _ALIGN:
        raise ValueError(f"align must be one of {_ALIGN}")
    if a == "right":
        return (-(n - 1), 0)
    if a == "left":
        return (0, n - 1)
    half = (n - 1) // 2
    return (-half, n - 1 - half)


def roll_agg(
    df: DataFrame,
    n: int,
    agg: str,
    align: str = "right",
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """Generic rolling aggregate (sum/avg/min/max/stddev...).

    NaN propagation matches the reference kernel: a window containing a
    missing cell yields a missing result (Scala double arithmetic over the
    dense vector), while positions whose window would extend past the series
    boundary are trimmed entirely (result has size − n + 1 stamps)."""
    lo, hi = _frame(n, align)
    w = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(lo, hi)
    out_col = out_col or value_col
    agg_fn = getattr(F, agg)
    return (
        df.withColumn("_rows", F.count(F.lit(1)).over(w))
        .withColumn("_vals", F.count(value_col).over(w))
        .withColumn(
            out_col,
            F.when(F.col("_vals") == n, agg_fn(value_col).over(w)),
        )
        .where(F.col("_rows") == n)
        .drop("_rows", "_vals")
    )


def roll_sum(df, n, align="right", key_col="key", order_col="loc", value_col="value"):
    return roll_agg(df, n, "sum", align, key_col, order_col, value_col)


def roll_mean(df, n, align="right", key_col="key", order_col="loc", value_col="value"):
    return roll_agg(df, n, "avg", align, key_col, order_col, value_col)


def roll_min(df, n, align="right", key_col="key", order_col="loc", value_col="value"):
    return roll_agg(df, n, "min", align, key_col, order_col, value_col)


def roll_max(df, n, align="right", key_col="key", order_col="loc", value_col="value"):
    return roll_agg(df, n, "max", align, key_col, order_col, value_col)


def roll_std(df, n, align="right", key_col="key", order_col="loc", value_col="value"):
    """Rolling SAMPLE standard deviation (n−1 denominator — the Spark /
    SQL ``stddev`` default, stated because rolling-volatility users
    habitually assume one or the other)."""
    return roll_agg(df, n, "stddev", align, key_col, order_col, value_col)


def roll_var(df, n, align="right", key_col="key", order_col="loc", value_col="value"):
    """Rolling sample variance (n−1 denominator)."""
    return roll_agg(df, n, "variance", align, key_col, order_col, value_col)


def roll_quantile(
    df: DataFrame,
    n: int,
    q: float,
    align: str = "right",
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """Exact rolling quantile over a complete n-window — linear
    interpolation at position (n−1)·q of the sorted window (numpy
    default / DuckDB ``quantile_cont``). Same contract as
    :func:`roll_agg`: windows with a missing cell yield NULL, boundary
    positions with incomplete windows are trimmed.

    Plan: the window pass collects the n-cell array once; because n and
    q are Python constants the interpolation indices fold to literals,
    so the whole expression is two ``element_at`` picks off one
    let-bound ``array_sort`` — single exchange, no Python, no
    self-join."""
    import math

    from ..functions import let

    if not 0.0 <= q <= 1.0:
        raise ValueError(f"q must be in [0, 1], got {q}")
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    lo, hi = _frame(n, align)
    w = Window.partitionBy(key_col).orderBy(order_col).rowsBetween(lo, hi)
    out_col = out_col or value_col
    # Index arithmetic happens in Python floats; (n−1)·q can land a hair off
    # a mathematically exact pick (10·0.7 = 7.000000000000001), which would
    # flip the exact-pick branch into a near-zero-weight interpolation with
    # platform-dependent last bits. Snap to the integer within 1e-9 so exact
    # picks stay exact — matches numpy/DuckDB to the bit on those quantiles.
    idx = (n - 1) * q
    k = int(math.floor(idx + 1e-9))
    k = min(k, n - 1)  # q=1.0 (or round-off above it) must not index past n
    frac = idx - k
    if frac < 1e-9 or k >= n - 1:
        frac = 0.0  # k+2 would read past the array; the pick is exact anyway

    def pick(srt):
        if frac == 0.0:
            return F.element_at(srt, k + 1)
        # lo + frac·(hi − lo): the lerp form numpy and DuckDB quantile_cont
        # both use — bit-identical to them, unlike the (1−f)·lo + f·hi form.
        lo_v = F.element_at(srt, k + 1)
        return lo_v + F.lit(frac) * (F.element_at(srt, k + 2) - lo_v)

    srt = F.array_sort(F.collect_list(F.col(value_col).cast("double")).over(w))
    return (
        df.withColumn("_rows", F.count(F.lit(1)).over(w))
        .withColumn("_vals", F.count(value_col).over(w))
        .withColumn(
            out_col, F.when(F.col("_vals") == n, let(srt, pick))
        )
        .where(F.col("_rows") == n)
        .drop("_rows", "_vals")
    )


def roll_median(df, n, align="right", key_col="key", order_col="loc", value_col="value"):
    """Exact rolling median (interpolated on even windows) — the robust
    companion of :func:`roll_mean`; see :func:`roll_quantile`."""
    return roll_quantile(df, n, 0.5, align, key_col, order_col, value_col)


def crosscorr(
    df: DataFrame,
    key_a: str,
    key_b: str,
    max_lag: int,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Sample cross-correlation between two conformed series → rows
    (lag, ccf) for lag 0..max_lag: the Pearson correlation of
    (a_t, b_{t−lag}) over the overlap — the two-series companion of
    :func:`autocorr`, same per-overlap convention (each slice demeaned by
    its own mean), beyond-reference (the reference ships autocorr only).
    Positive lag means ``key_a`` LAGS ``key_b`` (b leads). Plan: the two
    series align by location (one equi-join), then the lag window runs
    over the single joined pair — a one-partition window bounded by the
    SERIES length, i.e. the reference's own one-series-fits-in-memory
    envelope (``src/site/markdown/index.md:35-40``), not corpus-sized."""
    if max_lag < 0:
        raise ValueError("max_lag must be >= 0")
    a = df.where(F.col(key_col) == key_a).select(
        F.col(order_col).alias("_o"), F.col(value_col).alias("_a")
    )
    b = df.where(F.col(key_col) == key_b).select(
        F.col(order_col).alias("_o"), F.col(value_col).alias("_b")
    )
    j = a.join(b, "_o")
    w = Window.orderBy("_o")
    for k in range(1, max_lag + 1):
        j = j.withColumn(f"_b{k}", F.lag("_b", k).over(w))
    cols = ["_b"] + [f"_b{k}" for k in range(1, max_lag + 1)]
    agg = j.agg(
        *[F.corr("_a", c).alias(f"_c{k}") for k, c in enumerate(cols)]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("lag"), F.col(f"_c{k}").alias("ccf"))
            for k in range(max_lag + 1)
        ]
    )
    return agg.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.lag").alias("lag"), F.col("_p.ccf").alias("ccf")
    )


def autocorr(
    df: DataFrame,
    max_lag: int,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Sample autocorrelation for lags 1..max_lag per series → rows
    (key, lag, acf), as the Pearson correlation of the (y_t, y_{t−k}) pairs —
    exactly the reference's formula (``UnivariateTimeSeries.scala:66-96``
    computes per-slice means/variances, i.e. Pearson over the overlap).
    Pure window+aggregate plan: one exchange."""
    w = Window.partitionBy(key_col).orderBy(order_col)
    lagged = df
    for k in range(1, max_lag + 1):
        lagged = lagged.withColumn(f"_l{k}", F.lag(value_col, k).over(w))
    agg = lagged.groupBy(key_col).agg(
        *[F.corr(value_col, f"_l{k}").alias(f"_c{k}") for k in range(1, max_lag + 1)]
    )
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("lag"), F.col(f"_c{k}").alias("acf"))
            for k in range(1, max_lag + 1)
        ]
    )
    return agg.select(key_col, F.explode(pairs).alias("_p")).select(
        key_col, F.col("_p.lag").alias("lag"), F.col("_p.acf").alias("acf")
    )
