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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["cusum", "cusum_changepoints", "theil_sen"]


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
