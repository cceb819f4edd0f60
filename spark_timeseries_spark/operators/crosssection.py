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

__all__ = [
    "cross_rank", "cross_zscore", "information_coefficient", "turnover",
    "kendall_w", "cronbach_alpha",
]


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


def information_coefficient(
    df: DataFrame,
    horizon: int = 1,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Per-instant information coefficient → (loc, n_keys, ic): the
    cross-sectional Pearson correlation between each series' value (the
    SIGNAL) and its own FORWARD return over the next ``horizon``
    OBSERVATIONS of that key (lead over the key's own observation
    sequence — on series with missing instants the elapsed wall-clock
    horizon therefore differs per key at the same loc; densify/fill
    first if strict same-instant semantics are required) — the
    standard daily health metric of a ranking signal (mean IC ≈ its
    predictive power; the companion of :func:`cross_rank`). Forward
    return = lead(value, horizon)/value − 1 per key; rows where it is
    undefined (series end, zero/NULL value) drop out of that instant's
    correlation; instants with < 2 usable series or zero dispersion
    yield NULL ic (SQL corr convention).

    Plan: one key-partitioned lead window + one map-side-combinable
    groupBy(loc) with a corr aggregate — two exchanges total, no joins,
    all JVM."""
    if horizon < 1:
        raise ValueError(f"horizon must be >= 1, got {horizon}")
    v = F.col(value_col)
    wk = Window.partitionBy(key_col).orderBy(loc_col)
    d = (
        df.where(v.isNotNull())
        .withColumn("_nx", F.lead(value_col, horizon).over(wk))
        .withColumn("_fr", F.try_divide(F.col("_nx"), v) - 1.0)
        .where(F.col("_fr").isNotNull())
    )
    # sample-moment corr with try_divide, not F.corr — ANSI mode makes
    # corr() raise DIVIDE_BY_ZERO on a zero-dispersion instant
    return d.groupBy(loc_col).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.try_divide(
            F.covar_samp(value_col, "_fr"),
            F.stddev_samp(value_col) * F.stddev_samp("_fr"),
        ).alias("ic"),
    )


def turnover(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Per-instant rank autocorrelation → (loc, n_keys, rank_autocorr,
    turnover): the cross-sectional Pearson correlation between each
    key's rank at the instant and its rank one observation earlier
    (per key), and ``turnover`` = (1 − that)/2 — the standard proxy for
    how much a rank-driven portfolio churns between rebalances (0 =
    frozen ranks, 1 = fully shuffled). Keys missing either rank drop
    out of that instant; instants with < 2 comparable keys yield NULLs.

    Plan: one loc-partitioned rank window, one key-partitioned lag,
    one groupBy(loc) corr — no joins, all JVM."""
    v = F.col(value_col)
    wr = Window.partitionBy(loc_col).orderBy(F.desc(value_col), key_col)
    wk = Window.partitionBy(key_col).orderBy(loc_col)
    d = (
        df.where(v.isNotNull())
        .withColumn("_r", F.row_number().over(wr).cast("double"))
        .withColumn("_pr", F.lag("_r").over(wk))
        .where(F.col("_pr").isNotNull())
    )
    g = d.groupBy(loc_col).agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.try_divide(
            F.covar_samp("_r", "_pr"),
            F.stddev_samp("_r") * F.stddev_samp("_pr"),
        ).alias("rank_autocorr"),
    )
    return g.withColumn(
        "turnover", (1.0 - F.col("rank_autocorr")) / 2.0
    )


def _complete_panel(df, key_col, loc_col, value_col):
    """Non-null rows restricted to instants observed by EVERY key →
    (key, loc, value) plus the panel dimensions. The agreement
    statistics below are only defined on a complete k×n panel;
    incomplete instants are dropped (stated) rather than imputed."""
    v = F.col(value_col)
    pts = df.where(v.isNotNull()).select(key_col, loc_col, value_col)
    # one-row distinct-key count, broadcast — NOT a global window (which
    # would serialize the panel through a single task at corpus scale)
    kcount = pts.agg(F.countDistinct(key_col).alias("_k_all"))
    wloc = Window.partitionBy(loc_col)
    d = pts.crossJoin(F.broadcast(kcount)).withColumn(
        "_k_loc", F.count(F.lit(1)).over(wloc)
    )
    return d.where(F.col("_k_loc") == F.col("_k_all")).drop("_k_loc")


def kendall_w(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Kendall's coefficient of concordance ACROSS the whole panel →
    one row (k, n, w): do the k series agree on WHICH instants are
    high? Each series ranks the n complete-panel instants by its own
    values (mid-ranks for ties); W = 12·S / (k²(n³−n) − k·ΣTᵢ), S the
    variance-sum of the per-instant rank totals, Tᵢ = Σ(t³−t) the
    per-series tie correction (Kendall & Babington Smith 1939). W = 1
    when every series produces the same ordering, ≈ 0 when orderings
    are unrelated; NULL when every series is constant (the corrected
    denominator hits 0 — try_divide). The panel-wide complement of
    the pairwise :mod:`~.rankcorr` operators (W is an affine map of
    the MEAN pairwise Spearman: ρ̄ = (kW − 1)/(k − 1)).

    Only instants observed by EVERY series count (see
    :func:`_complete_panel`). Plan: one completeness window, one
    per-series rank window, one loc aggregate + one global aggregate
    — all JVM, no join beyond the window passes."""
    d = _complete_panel(df, key_col, loc_col, value_col)
    wr = Window.partitionBy(key_col).orderBy(value_col)
    wt = Window.partitionBy(key_col, value_col)
    r = d.select(
        F.col(loc_col).alias("_l"),
        F.col("_k_all"),
        (
            F.rank().over(wr)
            + (F.count(F.lit(1)).over(wt) - 1) / 2.0
        ).alias("_r"),
        (
            F.count(F.lit(1)).over(wt) * F.count(F.lit(1)).over(wt) - 1
        ).alias("_tt"),
    )
    g = r.groupBy("_l").agg(
        F.first("_k_all").alias("_k"),
        F.sum("_r").alias("_rsum"),
        F.sum("_tt").alias("_t1"),
    )
    kk = F.col("k").cast("double")
    nn = F.col("n").cast("double")
    agg = g.agg(
        F.first("_k").alias("k"),
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("_rsum") * F.col("_rsum"))
            - F.sum("_rsum") * F.sum("_rsum") / F.count(F.lit(1))
        ).alias("_s"),
        F.sum("_t1").alias("_tsum"),
    )
    denom = kk * kk * (nn * nn * nn - nn) - kk * F.col(
        "_tsum"
    ).cast("double")
    return agg.select(
        "k", "n",
        F.try_divide(12.0 * F.col("_s"), denom).alias("w"),
    )


def cronbach_alpha(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Cronbach's α of the panel → one row (k, n, alpha): internal
    consistency of the k series as parallel measurements of one
    signal, α = k/(k−1) · (1 − Σᵢvar(seriesᵢ)/var(Σ per-instant sum))
    (Cronbach 1951; sample variances, n−1). α → 1 when the series
    co-move (the panel is "one signal measured k ways"), ≤ 0 when
    they cancel; NULL when the summed series is constant
    (try_divide). The variance-based sibling of :func:`kendall_w`'s
    rank agreement. Complete instants only (:func:`_complete_panel`).

    Plan: one completeness window, one per-key variance aggregate,
    one per-loc sum + its variance — two small aggregates, no join."""
    d = _complete_panel(df, key_col, loc_col, value_col)
    pv = d.groupBy(key_col).agg(
        F.var_samp(value_col).alias("_v")
    ).agg(
        F.count(F.lit(1)).alias("k"), F.sum("_v").alias("_vsum")
    )
    tv = d.groupBy(loc_col).agg(
        F.sum(value_col).alias("_s")
    ).agg(
        F.count(F.lit(1)).alias("n"), F.var_samp("_s").alias("_vt")
    )
    j = pv.crossJoin(tv)
    kk = F.col("k").cast("double")
    return j.select(
        "k", "n",
        (
            kk / (kk - 1.0)
            * (1.0 - F.try_divide(F.col("_vsum"), F.col("_vt")))
        ).alias("alpha"),
    )


def capm_cross(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Market-model (CAPM) regression of every series against the
    EQUAL-WEIGHT cross-sectional market → one row per key: (key, n,
    alpha, beta, r2). Per instant, the market return is the mean of the
    per-key simple returns of every series observable at that instant
    (the standard equal-weight index when no cap weights exist); each
    key's excess behavior is then the OLS of its return on the market
    return — beta = cov/var, alpha = ȳ − β·x̄, r2 = corr². Instants
    where a key's return is undefined (series start, zero/NULL previous
    value) drop from that key's regression only. NULL beta/r2 when the
    market variance is zero over a key's rows (try_divide convention).

    Plan: one key-partitioned lag window (returns), one loc-partitioned
    window (the market mean — instants are bounded, this is the
    cross_zscore exchange), one groupBy(key) of OLS moments — three
    exchanges, no joins, all JVM. The market mean excludes nothing: a
    key regresses against an index that INCLUDES itself (the standard
    index convention; with K keys the self-weight is 1/K and vanishes
    at scale)."""
    v = F.col(value_col)
    wk = Window.partitionBy(key_col).orderBy(loc_col)
    d = (
        df.where(v.isNotNull())
        .withColumn("_ret", F.try_divide(v, F.lag(value_col).over(wk)) - 1.0)
        .where(F.col("_ret").isNotNull())
    )
    wl = Window.partitionBy(loc_col)
    d = d.withColumn("_mkt", F.avg("_ret").over(wl))
    return d.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.try_divide(
            F.covar_pop("_ret", "_mkt"), F.var_pop("_mkt")
        ).alias("beta"),
        (
            F.avg("_ret")
            - F.try_divide(F.covar_pop("_ret", "_mkt"), F.var_pop("_mkt"))
            * F.avg("_mkt")
        ).alias("alpha"),
        F.try_divide(
            F.covar_pop("_ret", "_mkt") * F.covar_pop("_ret", "_mkt"),
            F.var_pop("_ret") * F.var_pop("_mkt"),
        ).alias("r2"),
    )
