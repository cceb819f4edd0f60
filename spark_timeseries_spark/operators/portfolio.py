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

__all__ = [
    "capture_ratios", "active_stats", "downside_stats",
    "pairs_spread", "tail_dependence",
]


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
    try_divide: omega when a series never loses, sortino when the
    downside deviation is 0 (never loses OR never moves). Per-period values; annualize downstream (module
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


def pairs_spread(
    df: DataFrame,
    key_a: str,
    key_b: str,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Pairs-trading spread of series A vs B → per overlap instant
    (key_a, key_b, loc, beta, spread, z): one full-sample OLS hedge
    ratio β = cov(vₐ, v_b)/var(v_b) and intercept α over the aligned
    non-null overlap, spread = vₐ − (α + β·v_b), z the spread's own
    full-sample z-score — the tradeable signal downstream of a
    cointegration test (run :func:`~..stats.tests.engle_granger`
    FIRST; an un-cointegrated pair's spread z-score mean-reverts to
    nothing). Computed on VALUE levels (log-transform upstream for
    log-price spreads, stated); β/α repeat on every row so the output
    is self-describing. NULL β (try_divide) when B never varies.

    Plan: one equi-join on loc + full-overlap window aggregates on a
    single-task partition — the bounded two-named-series envelope
    (the :mod:`~.rankcorr` adjudication: fine for one diagnostic
    pair, would serialize at corpus scale)."""
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    a = pts.where(F.col(key_col) == key_a).select(
        F.col(loc_col).alias("loc"), v.alias("_va")
    )
    b = pts.where(F.col(key_col) == key_b).select(
        F.col(loc_col).alias("loc"), v.alias("_vb")
    )
    j = a.join(b, "loc")
    w = Window.partitionBy(F.lit(1))
    beta = F.try_divide(
        F.covar_samp("_va", "_vb").over(w), F.var_samp("_vb").over(w)
    )
    d = (
        j.withColumn("beta", beta)
        .withColumn(
            "_alpha",
            F.avg("_va").over(w) - F.col("beta") * F.avg("_vb").over(w),
        )
        .withColumn(
            "spread", F.col("_va") - (F.col("_alpha") + F.col("beta") * F.col("_vb"))
        )
    )
    z = F.try_divide(
        F.col("spread") - F.avg("spread").over(w),
        F.stddev_samp("spread").over(w),
    )
    return d.select(
        F.lit(key_a).alias("key_a"),
        F.lit(key_b).alias("key_b"),
        "loc",
        "beta",
        "spread",
        z.alias("z"),
    )


def tail_dependence(
    df: DataFrame,
    key_a: str,
    key_b: str,
    q: float = 0.9,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Empirical upper-tail dependence of series A and B → one row
    (key_a, key_b, q, n, thresh_a, thresh_b, n_joint, lambda_u,
    lift): do the two series spike TOGETHER? thresh are each side's
    EXACT q-quantile over the aligned overlap (``percentile`` — the
    ``robust_scale`` parity convention), n_joint counts instants where
    BOTH strictly exceed their threshold, λ̂_u = P(both exceed)/(1−q)
    (the empirical estimator of the tail-dependence coefficient
    lim P(A > qₐ | B > q_b); ≈ (1−q) under tail independence, → 1
    under comonotone tails, → 0 as q → 1 when the tails decouple), lift = λ̂_u/(1−q) = observed
    joint exceedance over the independence expectation. Linear
    correlation misses exactly this (Embrechts, McNeil & Straumann
    2002) — two series can be ρ ≈ 0 yet always crash together.

    Plan: one equi-join + one two-percentile aggregate + one
    conditional count — bounded pair envelope, no Python."""
    if not 0.0 < q < 1.0:
        raise ValueError(f"q must be in (0, 1), got {q}")
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    a = pts.where(F.col(key_col) == key_a).select(
        F.col(loc_col).alias("loc"), v.alias("_va")
    )
    b = pts.where(F.col(key_col) == key_b).select(
        F.col(loc_col).alias("loc"), v.alias("_vb")
    )
    j = a.join(b, "loc")
    w = Window.partitionBy(F.lit(1))
    d = j.withColumn(
        "_ta", F.expr(f"percentile(_va, {q!r})").over(w)
    ).withColumn("_tb", F.expr(f"percentile(_vb, {q!r})").over(w))
    joint = (F.col("_va") > F.col("_ta")) & (F.col("_vb") > F.col("_tb"))
    agg = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.first("_ta").alias("thresh_a"),
        F.first("_tb").alias("thresh_b"),
        F.sum(joint.cast("long")).alias("n_joint"),
    )
    lam = F.try_divide(
        F.col("n_joint").cast("double") / F.col("n").cast("double"),
        F.lit(1.0 - q),
    )
    return agg.select(
        F.lit(key_a).alias("key_a"),
        F.lit(key_b).alias("key_b"),
        F.lit(q).alias("q"),
        "n",
        "thresh_a",
        "thresh_b",
        "n_joint",
        lam.alias("lambda_u"),
        (lam / F.lit(1.0 - q)).alias("lift"),
    )
