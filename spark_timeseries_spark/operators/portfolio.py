"""Two-named-series portfolio diagnostics: capture ratios, tracking
error, information ratio.

Beyond-reference (sryza/spark-timeseries has no benchmark-relative
surface); these are the standard "how does series A behave relative to
benchmark B" statistics, computed over the two series' ALIGNED non-null
overlap — the :mod:`~spark_timeseries_spark.operators.rankcorr`
envelope (one bounded named pair, linear plans).

Alignment convention (stated, shared by both functions): the overlap is
the equi-join of the two series on ``loc_col``; per-period simple
returns are then computed over CONSECUTIVE OVERLAP rows (lag over the
joined frame), so both sides' returns always span the same pair of
instants — a hole in either series drops the period from both, never
from one (mismatched spans would make the comparison meaningless).
Precondition: unique (key, loc) per series (the rankcorr equi-join
precondition). Annualization is left to the caller (multiply IR /
divide TE by the usual √periods-per-year — the ``rolling_sharpe``
convention).

Scale: one equi-join on loc + one lag window + ONE map-side-combinable
aggregate each — all JVM, no Python, no pair blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["capture_ratios", "active_stats", "downside_stats"]


def _overlap_returns(
    df: DataFrame,
    key_a: str,
    key_b: str,
    key_col: str,
    loc_col: str,
    value_col: str,
) -> DataFrame:
    """Aligned per-period simple returns of the two named series →
    (_l, _ra, _rb), one row per consecutive overlap pair (module
    docstring alignment convention). Zero/NULL denominators drop the
    period (try_divide → NULL → filtered)."""
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    a = pts.where(F.col(key_col) == key_a).select(
        F.col(loc_col).alias("_l"), v.alias("_va")
    )
    b = pts.where(F.col(key_col) == key_b).select(
        F.col(loc_col).alias("_l"), v.alias("_vb")
    )
    j = a.join(b, "_l")
    ws = Window.partitionBy(F.lit(1)).orderBy("_l")
    d = (
        j.withColumn("_ra", F.try_divide(F.col("_va"), F.lag("_va").over(ws)) - 1.0)
        .withColumn("_rb", F.try_divide(F.col("_vb"), F.lag("_vb").over(ws)) - 1.0)
        .where(F.col("_ra").isNotNull() & F.col("_rb").isNotNull())
    )
    return d.select("_l", "_ra", "_rb")


def capture_ratios(
    df: DataFrame,
    key_a: str,
    key_b: str,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Up/down capture of series A vs benchmark B → one row (key_a,
    key_b, n_periods, n_up, n_down, up_capture, down_capture):
    up_capture = mean(rₐ | r_b > 0) / mean(r_b | r_b > 0) — how much of
    the benchmark's average up-period move A captures (arithmetic-mean
    convention, stated; the geometric variant differs only at long
    horizons) — and down_capture the same over r_b < 0 periods (< 1 is
    GOOD on the down side). NULL when a side has no qualifying periods
    or a zero mean benchmark move (try_divide). Flat benchmark periods
    (r_b = 0) count toward ``n_periods`` but neither capture.

    Plan: aligned overlap returns (module docstring) + ONE conditional-
    sum aggregate — no second pass."""
    r = _overlap_returns(df, key_a, key_b, key_col, loc_col, value_col)
    up = F.col("_rb") > 0
    dn = F.col("_rb") < 0
    return r.agg(
        F.lit(key_a).alias("key_a"),
        F.lit(key_b).alias("key_b"),
        F.count(F.lit(1)).alias("n_periods"),
        F.sum(up.cast("long")).alias("n_up"),
        F.sum(dn.cast("long")).alias("n_down"),
        F.try_divide(
            F.avg(F.when(up, F.col("_ra"))),
            F.avg(F.when(up, F.col("_rb"))),
        ).alias("up_capture"),
        F.try_divide(
            F.avg(F.when(dn, F.col("_ra"))),
            F.avg(F.when(dn, F.col("_rb"))),
        ).alias("down_capture"),
    )


def downside_stats(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Downside-risk summary PER SERIES (every key at once, unlike the
    two-series functions above) → one row per key: (key, n, mean_ret,
    downside_dev, sortino, omega, win_rate). Per-period simple returns
    come from CONSECUTIVE non-null observations per key (a hole skips
    to the next value — the ``realized_vol`` bridge convention);
    target return θ = 0 throughout (state a different θ by shifting
    returns upstream). downside_dev = √(Σ min(r,0)² / n) — the
    FULL-moment form (denominator counts all n periods, Sortino &
    Price 1994), not the below-target-only variant; sortino =
    mean_ret / downside_dev; omega = Σ max(r,0) / Σ max(−r,0) (Keating
    & Shadwick 2002 at θ = 0); win_rate = #(r > 0)/n. NULLs via
    try_divide when a series never loses (omega) or never moves
    (sortino). Per-period values; annualize downstream (module
    docstring). Plan: one lag window + ONE map-side-combinable
    aggregate per key — all JVM, linear, no join."""
    from pyspark.sql import Window as _W

    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    wk = _W.partitionBy(key_col).orderBy(loc_col)
    r = pts.withColumn(
        "_r", F.try_divide(v, F.lag(value_col).over(wk)) - 1.0
    ).where(F.col("_r").isNotNull())
    rr = F.col("_r")
    neg = F.when(rr < 0, -rr).otherwise(F.lit(0.0))
    pos = F.when(rr > 0, rr).otherwise(F.lit(0.0))
    agg = r.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(rr).alias("mean_ret"),
        F.sqrt(F.avg(neg * neg)).alias("downside_dev"),
        F.sum(pos).alias("_gain"),
        F.sum(neg).alias("_loss"),
        F.avg((rr > 0).cast("double")).alias("win_rate"),
    )
    return agg.select(
        key_col,
        "n",
        "mean_ret",
        "downside_dev",
        F.try_divide(F.col("mean_ret"), F.col("downside_dev")).alias(
            "sortino"
        ),
        F.try_divide(F.col("_gain"), F.col("_loss")).alias("omega"),
        "win_rate",
    )


def active_stats(
    df: DataFrame,
    key_a: str,
    key_b: str,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Active-return diagnostics of series A vs benchmark B → one row
    (key_a, key_b, n_periods, mean_active, tracking_error,
    information_ratio): active = rₐ − r_b per aligned period,
    tracking_error = its sample standard deviation, IR = mean_active /
    tracking_error (NULL at zero TE or < 2 periods — try_divide).
    Per-period values; annualize downstream (module docstring).

    Plan: aligned overlap returns + ONE aggregate."""
    r = _overlap_returns(df, key_a, key_b, key_col, loc_col, value_col)
    act = F.col("_ra") - F.col("_rb")
    return r.agg(
        F.lit(key_a).alias("key_a"),
        F.lit(key_b).alias("key_b"),
        F.count(F.lit(1)).alias("n_periods"),
        F.avg(act).alias("mean_active"),
        F.stddev_samp(act).alias("tracking_error"),
        F.try_divide(F.avg(act), F.stddev_samp(act)).alias(
            "information_ratio"
        ),
    )
