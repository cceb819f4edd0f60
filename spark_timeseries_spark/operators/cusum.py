"""CUSUM mean-shift detection (Page 1954), per series, windows-only.

Page's one-sided CUSUM recursion ``g_t = max(0, g_{t-1} + (z_t − k))``
looks imperatively stateful, but has the classic closed form

    g_t = s_t − min_{j ≤ t} s_j,      s_t = Σ_{i ≤ t} (z_i − k)

— a running sum minus a running minimum, i.e. two window frames over the
same (key, loc) sort: the whole detector stays in whole-stage codegen,
no Python, no recursion. Both shift directions run side by side
(``z − k`` and ``−z − k``); values are standardized per series first, so
``k`` (slack) and ``h`` (decision threshold) are in σ units — the usual
(0.5, 4–5) defaults detect a 1σ mean shift quickly while ignoring noise.

Missing cells carry no evidence and are EXCLUDED from the cumulative
sums (the statistic simply bridges the gap); a zero-variance series
yields NULL statistics.

Beyond-reference: sryza/spark-timeseries has no change-point surface.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cusum", "cusum_changepoints", "theil_sen", "mann_kendall", "seasonal_mann_kendall"]


def cusum(
    df: DataFrame,
    k: float = 0.5,
    h: float = 5.0,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
    standardize: bool = True,
) -> DataFrame:
    """Per-point CUSUM: input columns (missing-value rows dropped) +
    ``g_pos`` / ``g_neg`` (the one-sided statistics, in σ) + ``alarm``
    (either side above ``h``).

    ``standardize=True`` scales by the FULL series' mean/std — a series
    containing a level shift then sits persistently off-center on both
    sides of the change, so BOTH one-sided statistics grow and the first
    alarm can fire in the pre-change segment (that is the statistic, not
    a bug). For the textbook monitoring setup — calibrate on an
    in-control baseline, watch what follows — standardize the values
    yourself against the baseline's mean/σ and pass
    ``standardize=False`` (``k``/``h`` are then in the caller's units)."""
    pts = df.where(F.col(value_col).isNotNull())
    if standardize:
        stats = pts.groupBy(key_col).agg(
            F.avg(value_col).alias("_m"), F.stddev(value_col).alias("_s")
        )
        z = F.try_divide(F.col(value_col) - F.col("_m"), F.col("_s"))
    else:
        stats = pts.groupBy(key_col).agg(
            F.lit(0.0).alias("_m"), F.lit(1.0).alias("_s")
        )
        z = F.col(value_col).cast("double")
    wc = (
        Window.partitionBy(key_col)
        .orderBy(loc_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        pts.join(F.broadcast(stats), key_col)
        .withColumn("_zp", z - F.lit(float(k)))
        .withColumn("_zn", -z - F.lit(float(k)))
        .withColumn("_sp", F.sum("_zp").over(wc))
        .withColumn("_sn", F.sum("_zn").over(wc))
        .withColumn(
            "g_pos",
            F.col("_sp") - F.least(F.min("_sp").over(wc), F.lit(0.0)),
        )
        .withColumn(
            "g_neg",
            F.col("_sn") - F.least(F.min("_sn").over(wc), F.lit(0.0)),
        )
        .withColumn(
            "alarm",
            F.when(
                F.col("g_pos").isNotNull(),
                (F.col("g_pos") > float(h)) | (F.col("g_neg") > float(h)),
            ),
        )
        .drop("_m", "_s", "_zp", "_zn", "_sp", "_sn")
    )
    return out


def cusum_changepoints(
    df: DataFrame,
    k: float = 0.5,
    h: float = 5.0,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
    standardize: bool = True,
) -> DataFrame:
    """Per-series summary → (key, max_stat, alarm_loc, direction):
    the peak one-sided statistic, the FIRST location where either side
    crosses ``h`` (NULL if never), and which side peaked ("up"/"down",
    ties to "up"; NULL when the statistics themselves are NULL —
    zero-variance or single-point series — rather than a spurious
    "down")."""
    pts = cusum(df, k, h, key_col, loc_col, value_col, standardize)
    first_alarm = F.min(
        F.when(F.col("alarm"), F.col(loc_col))
    ).alias("alarm_loc")
    return pts.groupBy(key_col).agg(
        F.greatest(F.max("g_pos"), F.max("g_neg")).alias("max_stat"),
        first_alarm,
        F.when(F.max("g_pos").isNull() | F.max("g_neg").isNull(), F.lit(None))
        .when(F.max("g_pos") >= F.max("g_neg"), F.lit("up"))
        .otherwise(F.lit("down"))
        .alias("direction"),
    )


def theil_sen(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Theil–Sen robust trend per series → (key, slope, intercept,
    n_pairs): slope = median of all pairwise slopes (29% breakdown
    point — a few spikes cannot bend it, unlike OLS), intercept =
    median of ``y − slope·loc``. The pairwise self-join is quadratic in
    SERIES LENGTH — the reference's own one-series-in-memory envelope
    (``src/site/markdown/index.md:35-40``), keyed per series so the
    corpus dimension parallelizes; medians are exact interpolated
    percentiles (per-series cardinality, not corpus-scale). Series with
    <2 observations yield NULLs.

    The input lineage feeds several consumers (both self-join sides, the
    residual join, the key anchor); on an EXPENSIVE upstream plan,
    persist the input grid before calling — the lazy builder cannot own
    a cache lifetime (the ``pretrain_clean`` caller-owns-the-cache
    rule)."""
    pts = df.where(F.col(value_col).isNotNull()).select(
        key_col,
        F.col(loc_col).alias("_l"),
        F.col(value_col).alias("_v"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    pairs = (
        a.join(b, key_col)
        .where(F.col("a._l") < F.col("b._l"))
        .select(
            key_col,
            (
                (F.col("b._v") - F.col("a._v"))
                / (F.col("b._l") - F.col("a._l"))
            ).alias("_s"),
        )
    )
    slopes = pairs.groupBy(key_col).agg(
        F.percentile("_s", F.lit(0.5)).alias("slope"),
        F.count("*").alias("n_pairs"),
    )
    resid = pts.join(slopes, key_col).select(
        key_col,
        "slope",
        "n_pairs",
        (F.col("_v") - F.col("slope") * F.col("_l")).alias("_r"),
    )
    out = resid.groupBy(key_col, "slope", "n_pairs").agg(
        F.percentile("_r", F.lit(0.5)).alias("intercept")
    )
    # anchor on every input series so <2-point series report NULLs
    return (
        df.select(key_col)
        .distinct()
        .join(out, key_col, "left")
        .select(
            key_col,
            "slope",
            "intercept",
            F.coalesce("n_pairs", F.lit(0)).alias("n_pairs"),
        )
    )


def mann_kendall(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Mann-Kendall nonparametric trend test per series → (key, n, s,
    var_s, z, p_value): S = Σ_{i<j} sign(v_j − v_i) over time-ordered
    pairs, tie-corrected variance Var(S) = [n(n−1)(2n+5) −
    Σ_t t(t−1)(2t+5)]/18 (Mann 1945, Kendall 1975), and the
    continuity-corrected normal z ((S∓1)/√Var; 0 when S=0). The
    distribution-free companion of :func:`theil_sen` — same pairwise
    self-join, same quadratic-in-SERIES-LENGTH envelope (the reference's
    one-series-in-memory bound, ``src/site/markdown/index.md:35-40``),
    keyed per series so the corpus dimension parallelizes. Two-sided
    p-value from the closed-form normal tail; n < 3 or all-tied series
    yield NULL z/p. NULL cells are skipped (pairs form over the
    observed run)."""
    from ..models._numeric import norm_cdf

    pts = df.where(F.col(value_col).isNotNull()).select(
        key_col,
        F.col(loc_col).alias("_l"),
        F.col(value_col).alias("_v"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    s_agg = (
        a.join(b, key_col)
        .where(F.col("a._l") < F.col("b._l"))
        .groupBy(key_col)
        .agg(
            F.sum(
                F.signum(F.col("b._v") - F.col("a._v")).cast("long")
            ).alias("s")
        )
    )
    n_agg = pts.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    ties = (
        pts.groupBy(key_col, "_v")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(key_col)
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            ).alias("_tie")
        )
    )
    n = F.col("n").cast("double")
    var_s = (
        n * (n - 1) * (2 * n + 5) - F.col("_tie").cast("double")
    ) / 18.0
    s = F.col("s").cast("double")
    z = F.when(F.col("var_s") <= 0, None).otherwise(
        F.when(s > 0, (s - 1) / F.sqrt("var_s"))
        .when(s < 0, (s + 1) / F.sqrt("var_s"))
        .otherwise(0.0)
    )
    out = (
        n_agg.join(s_agg, key_col, "left")
        .join(ties, key_col, "left")
        .withColumn("var_s", F.when(F.col("n") >= 3, var_s))
        .withColumn("z", z)
    )

    @F.pandas_udf("double")
    def _p(zc: pd.Series) -> pd.Series:
        return zc.map(
            lambda v: None if pd.isna(v) else 2.0 * (1.0 - norm_cdf(abs(v)))
        )

    return out.select(
        key_col, "n", "s", "var_s", "z", _p(F.col("z")).alias("p_value")
    )


def seasonal_mann_kendall(
    df: DataFrame,
    period: int,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Seasonal Mann-Kendall trend test (Hirsch, Slack & Smith 1982) →
    (key, n, s, var_s, z, p_value): the :func:`mann_kendall` statistic
    computed WITHIN each season (``loc mod period`` — January-vs-January,
    Monday-vs-Monday) and summed across seasons, so a strong seasonal
    cycle can't masquerade as (or mask) a monotone trend. S = Σ_g S_g,
    Var = Σ_g Var_g (tie-corrected per season; the seasons-independent
    form — the serial-correlation covariance correction is out of
    scope and documented as such), continuity-corrected z, closed-form
    two-sided normal p. Same pairwise-per-season envelope as
    :func:`mann_kendall` — the self-join is quadratic in SERIES LENGTH
    divided by the period, keyed per (series, season) so everything
    parallelizes."""
    from ..models._numeric import norm_cdf

    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    pts = df.where(F.col(value_col).isNotNull()).select(
        key_col,
        F.col(loc_col).alias("_l"),
        F.pmod(F.col(loc_col), F.lit(period)).alias("_g"),
        F.col(value_col).alias("_v"),
    )
    a, b = pts.alias("a"), pts.alias("b")
    s_agg = (
        a.join(b, [key_col])
        .where(
            (F.col("a._g") == F.col("b._g"))
            & (F.col("a._l") < F.col("b._l"))
        )
        .groupBy(key_col)
        .agg(
            F.sum(
                F.signum(F.col("b._v") - F.col("a._v")).cast("long")
            ).alias("s")
        )
    )
    per_season = pts.groupBy(key_col, "_g").agg(
        F.count(F.lit(1)).alias("_ng")
    )
    ties = (
        pts.groupBy(key_col, "_g", "_v")
        .agg(F.count(F.lit(1)).alias("_t"))
        .groupBy(key_col, "_g")
        .agg(
            F.sum(
                F.col("_t") * (F.col("_t") - 1) * (2 * F.col("_t") + 5)
            ).alias("_tie")
        )
    )
    ng = F.col("_ng").cast("double")
    var_g = F.when(
        F.col("_ng") >= 2,
        (ng * (ng - 1) * (2 * ng + 5) - F.col("_tie").cast("double"))
        / 18.0,
    ).otherwise(0.0)
    vars_ = (
        per_season.join(ties, [key_col, "_g"])
        .withColumn("_vg", var_g)
        .groupBy(key_col)
        .agg(
            F.sum("_ng").alias("n"),
            F.sum("_vg").alias("var_s"),
        )
    )
    s = F.col("s").cast("double")
    z = F.when(F.col("var_s") <= 0, None).otherwise(
        F.when(s > 0, (s - 1) / F.sqrt("var_s"))
        .when(s < 0, (s + 1) / F.sqrt("var_s"))
        .otherwise(0.0)
    )
    out = (
        vars_.join(s_agg, key_col, "left")
        .withColumn("s", F.coalesce(F.col("s"), F.lit(0)))
        .withColumn("z", z)
    )

    @F.pandas_udf("double")
    def _p(zc: pd.Series) -> pd.Series:
        return zc.map(
            lambda v: None if pd.isna(v) else 2.0 * (1.0 - norm_cdf(abs(v)))
        )

    return out.select(
        key_col, "n", "s", "var_s", "z", _p(F.col("z")).alias("p_value")
    )
