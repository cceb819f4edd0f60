"""Baseline forecasts: naive / seasonal-naive / drift.

Beyond-reference, but methodologically load-bearing: every forecast
accuracy claim needs the benchmark these provide (MASE is DEFINED against
the naive forecast — :mod:`..stats.evaluation`), and at corpus scale the
baselines are often the only methods cheap enough to run on every series.

All three are pure DataFrame algebra — per-key aggregates + an explode
over the horizon + (for snaive) one equi-join back to the observations.
No Python, no per-series kernel: these run on a million series as one
job. Conventions (Hyndman & Athanasopoulos, FPP3 §5.2):

- naive:  ŷ_{T+h} = y_T (last non-null observation)
- snaive: ŷ_{T+h} = y_{T+h−m·k}, k = ⌈h/m⌉ (the value one whole number
  of seasonal cycles back; NULL if that location is missing/null)
- drift:  ŷ_{T+h} = y_T + h·(y_T − y_first)/(loc_T − loc_first)
  (the line through the first and last observations, extrapolated;
  NULL for a single-point series)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "baseline_forecast",
    "theta_forecast",
    "croston",
    "conformal_interval",
    "pinball_loss",
]

_METHODS = {"naive", "snaive", "drift"}


def baseline_forecast(
    df: DataFrame,
    h: int,
    method: str = "naive",
    period: int | None = None,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """→ (key, step, forecast), step 1..h, per series."""
    if method not in _METHODS:
        raise ValueError(f"method must be one of {_METHODS}, got {method!r}")
    if h < 1:
        raise ValueError("h must be >= 1")
    if method == "snaive":
        if period is None or period < 1:
            raise ValueError("snaive needs period >= 1")
    v = F.col(value_col)
    obs = df.where(v.isNotNull())
    stats = obs.groupBy(key_col).agg(
        F.max(order_col).alias("_T"),
        F.min(order_col).alias("_t0"),
        F.max_by(v, F.col(order_col)).alias("_last"),
        F.min_by(v, F.col(order_col)).alias("_first"),
    )
    steps = stats.withColumn(
        "step", F.explode(F.sequence(F.lit(1), F.lit(int(h))))
    )
    if method == "naive":
        out = steps.select(
            key_col, "step", F.col("_last").alias("forecast")
        )
    elif method == "drift":
        slope = F.try_divide(
            F.col("_last") - F.col("_first"),
            (F.col("_T") - F.col("_t0")).cast("double"),
        )
        out = steps.select(
            key_col,
            "step",
            (F.col("_last") + F.col("step") * slope).alias("forecast"),
        )
    else:  # snaive
        m = int(period)
        src = F.col("_T") + F.col("step") - F.lit(m) * F.ceil(
            F.col("step") / F.lit(m)
        ).cast("long")
        keyed = steps.select(key_col, "step", src.alias("_src"))
        src_vals = df.select(
            key_col,
            F.col(order_col).alias("_src"),
            v.alias("forecast"),
        )
        out = keyed.join(src_vals, [key_col, "_src"], "left").select(
            key_col, "step", "forecast"
        )
    return out


def theta_forecast(
    df: DataFrame,
    h: int,
    alpha: float = 0.4,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Classical Theta-method forecast (Assimakopoulos & Nikolopoulos
    2000, the M3 winner), theta lines {0, 2} → (key, step, forecast).

    Over the non-null cells of each series at positions t = 1..T (non-null
    rank): OLS trend a + b·t; theta-2 line θ_t = 2y_t − (a + b·t); SES on
    θ with fixed ``alpha`` and l₁ = θ₁, whose level has the closed form

        l_T = (1−α)^{T−1}·θ₁ + Σ_{t=2..T} α(1−α)^{T−t}·θ_t ;

    ŷ_{T+h} = ½[(a + b(T+h)) + l_T] — the theta-0 (trend) and theta-2
    (SES, flat) forecasts averaged. Series with < 2 observations yield
    NULL forecasts (degenerate trend).

    Plan: ONE exchange — the OLS moments ride partition-wide windows over
    the shared (key, loc) sort, each row contributes its closed-form SES
    weight, one groupBy sums the level, and the horizon explodes from the
    per-key row. No Python, no iteration, no per-series kernel."""
    if h < 1:
        raise ValueError("h must be >= 1")
    if not (0.0 < alpha <= 1.0):
        raise ValueError("alpha must be in (0, 1]")
    v = F.col(value_col)
    obs = df.where(v.isNotNull())
    from pyspark.sql import Window

    wk = Window.partitionBy(key_col)
    wp = Window.partitionBy(key_col).orderBy(order_col)
    t = F.row_number().over(wp).cast("double")
    pre = obs.select(
        key_col, v.alias("_y"), t.alias("_t"),
        F.count(F.lit(1)).over(wk).cast("double").alias("_n"),
    )
    # partition-wide OLS moments (every row sees the same values)
    pre = (
        pre.withColumn("_st", F.sum("_t").over(wk))
        .withColumn("_sy", F.sum("_y").over(wk))
        .withColumn("_sty", F.sum(F.col("_t") * F.col("_y")).over(wk))
        .withColumn("_stt", F.sum(F.col("_t") * F.col("_t")).over(wk))
    )
    n, st, sy, sty, stt = (
        F.col("_n"), F.col("_st"), F.col("_sy"), F.col("_sty"), F.col("_stt")
    )
    b = F.try_divide(n * sty - st * sy, n * stt - st * st)
    a = (sy - b * st) / n
    theta = 2.0 * F.col("_y") - (a + b * F.col("_t"))
    w_ses = F.when(
        F.col("_t") == 1.0, F.pow(F.lit(1.0 - alpha), n - 1.0)
    ).otherwise(
        F.lit(alpha) * F.pow(F.lit(1.0 - alpha), n - F.col("_t"))
    )
    per_key = (
        pre.withColumn("_c", w_ses * theta)
        .groupBy(key_col)
        .agg(
            F.sum("_c").alias("_l"),
            F.first(a).alias("_a"),
            F.first(b).alias("_b"),
            F.first(n).alias("_T"),
        )
    )
    steps = per_key.withColumn(
        "step", F.explode(F.sequence(F.lit(1), F.lit(int(h))))
    )
    trend = F.col("_a") + F.col("_b") * (F.col("_T") + F.col("step"))
    return steps.select(
        key_col,
        "step",
        F.when(
            F.col("_b").isNotNull(), 0.5 * (trend + F.col("_l"))
        ).alias("forecast"),
    )


def croston(
    df: DataFrame,
    alpha: float = 0.1,
    variant: str = "classic",
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Croston's method for INTERMITTENT demand (Croston 1972) →
    (key, n, n_demands, size_hat, interval_hat, forecast) per series:
    the standard baseline when most periods are zero (spare parts,
    rare-event rates — a regime where naive/drift are useless and SES
    biases toward zero). Two exponential smoothers run over the
    NON-ZERO subsequence only: one on the demand sizes z_k, one on the
    inter-demand intervals p_k (gaps in ``order_col`` units between
    consecutive non-zero points); the demand-rate forecast is ẑ/p̂ —
    or ``variant="sba"`` for the Syntetos-Boyd approximation
    (1 − α/2)·ẑ/p̂, which corrects Croston's documented positive bias.

    Both smoothers initialize at their first observation, so each
    estimate is the closed-form weighted sum
    ẑ = (1−α)^{m−1} z_1 + α·Σ_{k≥2} (1−α)^{m−k} z_k — a per-key
    aggregate over power weights, NOT a sequential recursion, which is
    what makes the method run on a million series as one job (and lets
    a SQL oracle replay it term-for-term). Series with no non-zero
    demand yield NULLs; with a single demand, ``interval_hat`` (and the
    forecast) is NULL — one point defines no interval. NULL cells are
    skipped entirely (unobserved ≠ zero demand)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if variant not in ("classic", "sba"):
        raise ValueError(f"variant must be classic|sba, got {variant!r}")
    v = F.col(value_col)
    obs = df.where(v.isNotNull())
    wk = Window.partitionBy(key_col)
    totals = obs.groupBy(key_col).agg(F.count(v).alias("n"))
    nz = obs.where(v != 0)
    ws = Window.partitionBy(key_col).orderBy(order_col)
    d = (
        nz.withColumn("_k", F.row_number().over(ws))
        .withColumn("_m", F.count(F.lit(1)).over(wk))
        .withColumn(
            "_gap",
            (F.col(order_col) - F.lag(order_col).over(ws)).cast("double"),
        )
    )
    beta = 1.0 - alpha
    # weight of the k-th of m terms: (1-a)^(m-1) for k=1 (the init),
    # a*(1-a)^(m-k) for k>1 — identical for the interval smoother over
    # its m-1 gaps (k=2..m, init at the first gap)
    wz = F.when(
        F.col("_k") == 1, F.pow(F.lit(beta), F.col("_m") - 1)
    ).otherwise(
        alpha * F.pow(F.lit(beta), (F.col("_m") - F.col("_k")).cast("double"))
    )
    wp = F.when(
        F.col("_k") == 2, F.pow(F.lit(beta), F.col("_m") - 2)
    ).otherwise(
        alpha * F.pow(F.lit(beta), (F.col("_m") - F.col("_k")).cast("double"))
    )
    est = d.groupBy(key_col).agg(
        F.max("_m").alias("n_demands"),
        F.sum(wz * v).alias("size_hat"),
        F.sum(F.when(F.col("_k") >= 2, wp * F.col("_gap"))).alias(
            "interval_hat"
        ),
    )
    factor = (1.0 - alpha / 2.0) if variant == "sba" else 1.0
    fc = factor * F.try_divide(F.col("size_hat"), F.col("interval_hat"))
    return (
        totals.join(est, key_col, "left")
        .withColumn(
            "n_demands", F.coalesce(F.col("n_demands"), F.lit(0))
        )
        .withColumn("forecast", fc)
        .select(
            key_col, "n", "n_demands", "size_hat", "interval_hat",
            "forecast",
        )
    )


def demand_classification(
    df: DataFrame,
    adi_cut: float = 1.32,
    cv2_cut: float = 0.49,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Syntetos-Boylan-Croston demand-pattern classification per series
    → (key, n, n_demands, adi, cv2, pattern): ADI = average inter-
    demand interval over the series span ((last_loc − first_loc + 1) /
    #nonzero — the period-count convention, so leading/trailing zero
    runs count), CV² = (σ/µ)² of the NONZERO demand sizes (sample σ),
    and the standard quadrant (Syntetos, Boylan & Croston 2005 cuts
    ADI 1.32 / CV² 0.49):

    - ``smooth``        (ADI < cut, CV² < cut) — use exp. smoothing;
    - ``intermittent``  (ADI ≥ cut, CV² < cut) — use :func:`croston`/SBA;
    - ``erratic``       (ADI < cut, CV² ≥ cut);
    - ``lumpy``         (ADI ≥ cut, CV² ≥ cut) — the hard quadrant.

    The routing gate a forecasting pipeline runs BEFORE choosing a
    model per series. NULL cells are skipped; a series with no nonzero
    demand (or with one, where sample CV² is undefined) classifies
    NULL. ONE map-side-combinable groupBy — a word-count at 100 TB."""
    v = F.col(value_col)
    loc = F.col(order_col)
    pts = df.where(v.isNotNull())
    nz = F.when(v != 0, v)
    agg = pts.groupBy(key_col).agg(
        F.count(v).alias("n"),
        F.count(nz).alias("n_demands"),
        F.min(loc).alias("_l0"),
        F.max(loc).alias("_l1"),
        F.avg(nz).alias("_mu"),
        F.stddev_samp(nz).alias("_sd"),
    )
    adi = F.try_divide(
        (F.col("_l1") - F.col("_l0") + 1).cast("double"),
        F.col("n_demands").cast("double"),
    )
    cv2 = F.pow(F.try_divide(F.col("_sd"), F.col("_mu")), F.lit(2.0))
    pattern = (
        F.when(cv2.isNull() | adi.isNull(), F.lit(None).cast("string"))
        .when((adi < adi_cut) & (cv2 < cv2_cut), F.lit("smooth"))
        .when((adi >= adi_cut) & (cv2 < cv2_cut), F.lit("intermittent"))
        .when((adi < adi_cut) & (cv2 >= cv2_cut), F.lit("erratic"))
        .otherwise(F.lit("lumpy"))
    )
    return agg.select(
        key_col, "n", "n_demands",
        adi.alias("adi"), cv2.alias("cv2"), pattern.alias("pattern"),
    )


def conformal_interval(
    df: DataFrame,
    alpha: float = 0.1,
    period: int = 1,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Split-conformal prediction interval for the (seasonal-)naive
    one-step forecast, evaluated at each series' LAST prediction-
    bearing observation → one row per key: (key, n_cal, pred, actual,
    qhat, lo, hi, covered). Predictions are ŷ_t = y_{t−period} over
    the OBSERVATION clock (lag over non-null rows, stated — densify
    first for strict calendar seasonality); nonconformity scores
    sᵢ = |yᵢ − ŷᵢ| over every prediction-bearing row BEFORE the last
    one form the calibration set; q̂ is the ⌈(n_cal+1)(1−α)⌉-th
    smallest score — the finite-sample-valid conformal quantile
    (Vovk et al. 2005; Lei et al. 2018): P(actual ∈ [ŷ ± q̂]) ≥ 1−α
    for ANY distribution, no residual-normality assumption (the
    honest alternative to ±1.96σ bands on heavy-tailed series).
    When ⌈(n_cal+1)(1−α)⌉ > n_cal the guarantee needs an infinite
    interval — qhat/lo/hi/covered come back NULL (too few points for
    this α, stated). Keys with < 2 predictions drop out.

    Plan: one lag window + one max window + ONE aggregate whose
    calibration list is bounded by the series length (the exact-
    ``percentile`` per-series envelope) — no join, no Python."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if period < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    lvl = 1.0 - alpha
    v = F.col(value_col)
    obs = df.where(v.isNotNull())
    ws = Window.partitionBy(key_col).orderBy(loc_col)
    d = obs.withColumn("_pred", F.lag(value_col, period).over(ws)).where(
        F.col("_pred").isNotNull()
    )
    wk = Window.partitionBy(key_col)
    d = d.withColumn("_maxloc", F.max(loc_col).over(wk))
    cal_score = F.when(
        F.col(loc_col) < F.col("_maxloc"),
        F.abs(v - F.col("_pred")),
    )
    agg = d.groupBy(key_col).agg(
        F.count(cal_score).alias("n_cal"),
        F.array_sort(F.collect_list(cal_score)).alias("_scores"),
        F.max_by(F.col("_pred"), F.col(loc_col)).alias("pred"),
        F.max_by(v, F.col(loc_col)).alias("actual"),
    )
    k = F.ceil(
        (F.col("n_cal") + 1).cast("double") * F.lit(lvl)
    ).cast("int")
    qhat = F.when(
        (F.col("n_cal") >= 1) & (k <= F.col("n_cal")),
        F.element_at("_scores", k),
    )
    out = agg.where(F.col("n_cal") >= 1).select(
        key_col,
        "n_cal",
        "pred",
        "actual",
        qhat.alias("qhat"),
    )
    return out.select(
        key_col,
        "n_cal",
        "pred",
        "actual",
        "qhat",
        (F.col("pred") - F.col("qhat")).alias("lo"),
        (F.col("pred") + F.col("qhat")).alias("hi"),
        F.when(
            F.col("qhat").isNotNull(),
            (F.col("actual") >= F.col("pred") - F.col("qhat"))
            & (F.col("actual") <= F.col("pred") + F.col("qhat")),
        ).alias("covered"),
    )


def pinball_loss(
    df: DataFrame,
    taus: tuple[float, ...] = (0.1, 0.5, 0.9),
    cal_frac: float = 0.8,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Quantile-forecast evaluation with the pinball (quantile) loss →
    one row per (key, tau): (key, tau, q_hat, n_test, pinball). Per key,
    the first ``cal_frac`` of observations (time order) calibrate an
    EMPIRICAL-QUANTILE forecast q̂_τ = exact linear-interpolation
    percentile of the calibration values (the constant-quantile
    baseline — the "climatological" forecast every probabilistic model
    must beat); the remaining holdout scores it with the proper scoring
    rule L_τ(y, q) = max(τ·(y−q), (τ−1)·(y−q)). Keys where either side
    is empty drop out: an empty holdout (every row calibrates) has
    nothing to score, and an empty calibration set (⌊cal_frac·n⌋ < 1,
    e.g. a single-observation key) has no q̂ to score with.

    Plan: a row-number window and one full-frame key window computing
    ALL |taus| percentiles over the calibration rows in a single pass
    (percentile ignores the holdout NULLs), then one explode to |taus|
    rows and one combinable groupBy(key, tau) — a single exchange on
    the entity key, no joins, all JVM. The per-key exact percentile
    holds the same per-series buffer envelope as ``robust_location``'s
    exact path."""
    if not taus or any(not (0.0 < t < 1.0) for t in taus):
        raise ValueError(f"taus must be in (0, 1), got {taus}")
    if not (0.0 < cal_frac < 1.0):
        raise ValueError(f"cal_frac must be in (0, 1), got {cal_frac}")
    v = F.col(value_col)
    wk = Window.partitionBy(key_col).orderBy(loc_col)
    wfull = Window.partitionBy(key_col)
    d = (
        df.where(v.isNotNull())
        .withColumn("_rn", F.row_number().over(wk))
        .withColumn("_n", F.count(F.lit(1)).over(wfull))
        .withColumn(
            "_cal",
            F.col("_rn") <= F.floor(F.lit(cal_frac) * F.col("_n")),
        )
        # drop keys with an empty calibration set (⌊cal_frac·n⌋ = 0, the
        # single-observation case): they would otherwise surface as NULL
        # q_hat/pinball rows, breaking the drop-out contract (r11 ADVICE)
        .where(F.floor(F.lit(cal_frac) * F.col("_n")) >= 1)
    )
    cal_v = F.when(F.col("_cal"), v)
    # window aggregates must be materialized BEFORE the explode (Spark
    # rejects window expressions nested inside generator projections)
    for i, t in enumerate(taus):
        d = d.withColumn(
            f"_p{i}", F.percentile(cal_v, F.lit(float(t))).over(wfull)
        )
    qs = F.array(*[
        F.struct(
            F.lit(float(t)).alias("tau"), F.col(f"_p{i}").alias("q")
        )
        for i, t in enumerate(taus)
    ])
    test = (
        d.where(~F.col("_cal"))
        .withColumn("_q", F.explode(qs))
        .select(
            F.col(key_col).alias("key"),
            F.col("_q.tau").alias("tau"),
            F.col("_q.q").alias("q_hat"),
            v.alias("_y"),
        )
    )
    err = F.col("_y") - F.col("q_hat")
    loss = F.greatest(F.col("tau") * err, (F.col("tau") - 1.0) * err)
    return test.groupBy("key", "tau").agg(
        F.first("q_hat").alias("q_hat"),
        F.count(F.lit(1)).alias("n_test"),
        F.avg(loss).alias("pinball"),
    )
