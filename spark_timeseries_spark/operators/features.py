"""Per-series feature extraction: the tsfeatures-style catalog.

Beyond-reference (the reference's per-series summary stops at
``seriesStats`` — count/mean/stdev/min/max); this is the feature-vector
layer a forecasting or clustering pipeline runs over a CORPUS of series
(Hyndman et al.'s tsfeatures catalog; the subset here is the part with
exact closed forms — no optimizer, no decomposition dependency):

- ``acf1`` — lag-1 autocorrelation, the engine's per-overlap Pearson
  convention (same as :func:`operators.rolling.autocorr` at k=1).
- ``crossing_points`` — number of times the series crosses its own mean
  (structural-change proxy).
- ``stability`` / ``lumpiness`` — variance of tiled MEANS / tiled
  VARIANCES over non-overlapping tiles of ``tile`` points (level shifts
  inflate stability; variance shifts inflate lumpiness). The trailing
  partial tile is DROPPED (stated: a 3-point tail tile's variance is
  noise, and the R reference's tiling conventions differ by version —
  this engine pins complete-tiles-only).

Plan: everything stacks on the ONE (key, loc) sort every series operator
shares — whole-series mean/lag ride a partition-wide window, the tile
aggregates are two small (key, tile) groupBys — all JVM expressions,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["ts_features", "detect_seasonality", "spectral_entropy"]


def ts_features(
    df: DataFrame,
    tile: int = 10,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """→ (key, n, mean, variance, acf1, crossing_points, stability,
    lumpiness) per series. ``n`` counts non-null cells; null cells are
    skipped by every moment and excluded from tiles (tiles are formed
    over the non-null rank so a hole doesn't shift every later tile
    boundary by a fraction)."""
    if tile < 2:
        raise ValueError(f"tile must be >= 2, got {tile}")
    v = F.col(value_col)
    wk = Window.partitionBy(key_col)
    ws = Window.partitionBy(key_col).orderBy(order_col)
    base = (
        df.where(v.isNotNull())
        .withColumn("_m", F.avg(v).over(wk))
        .withColumn("_prev", F.lag(v).over(ws))
        .withColumn("_rk", F.row_number().over(ws) - 1)
    )
    cross = F.when(
        F.col("_prev").isNotNull()
        & ((v > F.col("_m")) != (F.col("_prev") > F.col("_m"))),
        1,
    )
    stats = base.groupBy(key_col).agg(
        F.count(v).alias("n"),
        F.avg(v).alias("mean"),
        F.var_samp(v).alias("variance"),
        F.corr(v, "_prev").alias("acf1"),
        F.coalesce(F.sum(cross), F.lit(0)).alias("crossing_points"),
    )
    tiles = (
        base.withColumn("_tile", (F.col("_rk") / tile).cast("int"))
        .groupBy(key_col, "_tile")
        .agg(
            F.count(v).alias("_tn"),
            F.avg(v).alias("_tmean"),
            F.var_samp(v).alias("_tvar"),
        )
        .where(F.col("_tn") == tile)  # complete tiles only
        .groupBy(key_col)
        .agg(
            F.var_samp("_tmean").alias("stability"),
            F.var_samp("_tvar").alias("lumpiness"),
        )
    )
    return stats.join(tiles, key_col, "left")


def detect_seasonality(
    df: DataFrame,
    max_period: int = 24,
    min_acf: float = 0.3,
    harmonic_tol: float = 0.05,
    tie_digits: int = 6,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """ACF-based season-length detection → (key, period, acf): the lag in
    2..``max_period`` with the highest autocorrelation (the engine's
    per-overlap Pearson convention), or NULL period when no lag reaches
    ``min_acf`` (no seasonality evidence). Lag 1 is excluded — trend
    dominates it on almost any smooth series. The time-domain
    complement of :func:`~spark_timeseries_spark.operators.spectral.dominant_period`
    (spectral argmax): run both and trust agreement.

    Harmonic rule: every MULTIPLE of the true period correlates almost
    as highly as the period itself (a period-7 series has acf(14) ≈
    acf(7), and finite-sample noise decides which is a hair larger), so
    the detector returns the SMALLEST lag whose acf is within
    ``harmonic_tol`` of the maximum — which also stays correct for a
    genuine period-14 series, whose acf(7) is strongly NEGATIVE, far
    outside the tolerance. ``round(acf, tie_digits)`` keeps the max
    itself engine-deterministic. One window pass + one aggregate per
    series — all JVM."""
    if max_period < 2:
        raise ValueError(f"max_period must be >= 2, got {max_period}")
    w = Window.partitionBy(key_col).orderBy(order_col)
    lagged = df
    for k in range(2, max_period + 1):
        lagged = lagged.withColumn(f"_l{k}", F.lag(value_col, k).over(w))
    agg = lagged.groupBy(key_col).agg(
        *[
            F.corr(value_col, f"_l{k}").alias(f"_c{k}")
            for k in range(2, max_period + 1)
        ]
    )
    from ..functions import let

    cands = F.filter(
        F.array(
            *[
                F.struct(
                    F.lit(k).alias("lag"),
                    F.round(F.col(f"_c{k}"), tie_digits).alias("r"),
                    F.col(f"_c{k}").alias("acf"),
                )
                for k in range(2, max_period + 1)
            ]
        ),
        lambda x: x["acf"].isNotNull(),
    )

    def pick(arr):
        # max rounded acf, then the SMALLEST lag within harmonic_tol of it
        best_r = F.array_max(F.transform(arr, lambda x: x["r"]))

        def with_best(br):
            return F.array_min(
                F.filter(arr, lambda x: x["r"] >= br - harmonic_tol)
            )

        return let(best_r, with_best)

    best = pick(cands)
    return agg.select(
        key_col,
        F.when(best["acf"] >= min_acf, best["lag"]).alias("period"),
        F.when(best["acf"] >= min_acf, best["acf"]).alias("acf"),
    )


def spectral_entropy(
    df: DataFrame,
    method: str = "auto",
    fft_threshold: int | None = None,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Normalized spectral (Shannon) entropy per series → (key, entropy)
    ∈ [0, 1]: H = −Σ p̂_k ln p̂_k / ln m over the normalized periodogram
    ordinates (tsfeatures' ``entropy``) — ≈1 for white noise (flat
    spectrum, hard to forecast), →0 for a pure cycle (all power in one
    bin, easy). Composes :func:`~spark_timeseries_spark.operators.spectral.periodogram`
    (inheriting its explode/FFT auto-routing) with one per-key aggregate:
    Σ p̂ ln p̂ = (ln S − Σ p ln p / S) with S = Σ p, so no second pass.
    Degenerate series (zero total power, i.e. constant; or a single
    frequency bin) yield NULL."""
    from .spectral import _FFT_THRESHOLD, periodogram

    per = periodogram(
        df, key_col, order_col, value_col, method,
        fft_threshold if fft_threshold is not None else _FFT_THRESHOLD,
    )
    p = F.col("power")
    agg = per.groupBy(key_col).agg(
        F.sum(p).alias("_S"),
        F.sum(F.when(p > 0.0, p * F.log(p))).alias("_plp"),
        F.count(F.lit(1)).alias("_m"),
    )
    h = (F.log("_S") - F.col("_plp") / F.col("_S")) / F.log(
        F.col("_m").cast("double")
    )
    return agg.select(
        key_col,
        F.when((F.col("_S") > 0.0) & (F.col("_m") > 1), h).alias("entropy"),
    )
