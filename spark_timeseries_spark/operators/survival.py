"""Survival analysis over event logs: Kaplan-Meier curves, Weibull fits,
and time-to-event extraction.

An extension beyond the reference (which has no survival surface): the
standard toolkit for churn/retention duration modelling and reliability
analysis over event streams. Three surfaces:

- :func:`time_to_event` — per-entity (duration, event) extraction from a
  raw event log: time from the entity's first ``start_type`` event to its
  first subsequent ``end_type`` event, right-censored at the log horizon.
- :func:`kaplan_meier` — the product-limit survival estimator
  (Kaplan & Meier 1958) on a (duration, event) table.
- :func:`weibull_mrr` — Weibull shape/scale via median-rank regression
  (Bernard's approximation), the classic linearized probability-plot fit.

All three are pure DataFrame plans (windows + aggregates, no Python in
the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_to_event(
    df: DataFrame,
    start_type: str,
    end_type: str,
    unit_seconds: float = 3600.0,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """→ (key, duration, event): per entity, elapsed time (in units of
    ``unit_seconds``) from its FIRST ``start_type`` event to its first
    ``end_type`` event AT OR AFTER that start. Entities that never reach
    ``end_type`` are right-CENSORED (``event`` = 0) at the log horizon
    (the global max timestamp — the natural "observation ended here"
    boundary of a batch extract); entities with no ``start_type`` event
    are not at risk and drop out.

    Plan: one key-partitioned window (start time), one groupBy(key) on
    the SAME key (the window's hash partitioning is reused — no second
    exchange), plus a broadcast of the single-row global-horizon
    aggregate. No entity-table broadcast anywhere."""
    if unit_seconds <= 0:
        raise ValueError(f"unit_seconds must be > 0, got {unit_seconds}")
    ts_us = F.unix_micros(F.col(ts_col))
    wk = Window.partitionBy("key")
    start_us = F.min(
        F.when(F.col("_t") == start_type, F.col("_us"))
    ).over(wk)
    d = (
        df.select(
            F.col(key_col).alias("key"),
            F.col(type_col).alias("_t"),
            ts_us.alias("_us"),
        )
        .withColumn("_start", start_us)
        .where(F.col("_start").isNotNull())
    )
    per_key = d.groupBy("key").agg(
        F.first("_start").alias("_start"),
        F.min(
            F.when(
                (F.col("_t") == end_type) & (F.col("_us") >= F.col("_start")),
                F.col("_us"),
            )
        ).alias("_end"),
    )
    horizon = F.broadcast(
        df.select(F.max(F.unix_micros(F.col(ts_col))).alias("_hor"))
    )
    unit_us = float(unit_seconds) * 1e6
    return per_key.crossJoin(horizon).select(
        "key",
        (
            (
                F.coalesce(F.col("_end"), F.col("_hor")) - F.col("_start")
            ).cast("double")
            / F.lit(unit_us)
        ).alias("duration"),
        F.col("_end").isNotNull().cast("int").alias("event"),
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str = "duration",
    event_col: str = "event",
) -> DataFrame:
    """Kaplan-Meier product-limit estimator → one row per distinct
    duration: (duration, n_risk, n_events, n_censored, survival), where
    ``survival`` = Π over t' ≤ t of (1 − d_{t'}/n_{t'}) — the running
    product including the current row (censor-only times contribute a
    factor of 1 and appear in the table so the at-risk ledger is
    complete). Standard convention: subjects censored AT t are still at
    risk for the deaths at t. Reaches exactly 0 when the last at-risk
    subject dies.

    Plan: one groupBy(duration), then three windows over the GLOBAL
    duration grid — a single-partition sort that is bounded by the
    number of DISTINCT durations, not subjects (callers at scale bin
    durations to a grid first, e.g. :func:`time_to_event` with hour
    units + ``F.ceil``; an unbinned continuous duration column would
    make the grid as big as the cohort). The cumulative product is
    exp∘sum∘log with an explicit zero-factor guard (both Spark and the
    SQL oracle choke on ln(0))."""
    g = df.groupBy(F.col(duration_col).alias("duration")).agg(
        F.sum(F.col(event_col).cast("long")).alias("n_events"),
        F.sum(
            (F.lit(1) - F.col(event_col).cast("long"))
        ).alias("n_censored"),
    )
    w_tot = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    w_prev = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_cum = Window.orderBy("duration").rowsBetween(
        Window.unboundedPreceding, 0
    )
    exits = F.col("n_events") + F.col("n_censored")
    n_risk = (
        F.sum(exits).over(w_tot)
        - F.coalesce(F.sum(exits).over(w_prev), F.lit(0))
    )
    d = g.withColumn("n_risk", n_risk)
    factor = F.lit(1.0) - F.try_divide(
        F.col("n_events").cast("double"), F.col("n_risk").cast("double")
    )
    d = d.withColumn("_f", factor)
    # the log argument is guarded to 1 on the zero-factor row (both Spark
    # ANSI and DuckDB reject ln(0) even under a CASE that discards it —
    # window sums evaluate eagerly); the outer WHEN still pins the
    # survival to exactly 0 from that row on
    safe_log = F.log(
        F.when(F.col("_f") > 0.0, F.col("_f")).otherwise(F.lit(1.0))
    )
    surv = F.when(F.min("_f").over(w_cum) <= 0.0, F.lit(0.0)).otherwise(
        F.exp(F.sum(safe_log).over(w_cum))
    )
    return d.select(
        "duration", "n_risk", "n_events", "n_censored",
        surv.alias("survival"),
    )


def weibull_mrr(
    df: DataFrame,
    duration_col: str = "duration",
    group_col: str | None = None,
    event_col: str | None = None,
) -> DataFrame:
    """Weibull fit via median-rank regression → one row per group:
    (group?, n, shape, scale, r2). Linearization: F(t) = 1−exp(−(t/λ)^k)
    ⇒ ln(−ln(1−F)) = k·ln t − k·ln λ, with F estimated by Bernard's
    median-rank approximation F_i = (i − 0.3)/(n + 0.4) over the sorted
    durations. OLS of y on x = ln t gives shape k (slope) and scale
    λ = exp(x̄ − ȳ/k); r2 = corr(x, y)². Non-positive durations are
    excluded (ln t undefined); if ``event_col`` is given, censored rows
    (event = 0) are excluded too (MRR is an uncensored-sample method —
    use :func:`kaplan_meier` when censoring matters). Duration ties are
    safe: tied rows share x, and the SET of ranks assigned among them is
    fixed, so the OLS moments are deterministic regardless of tie order.

    Plan: one rank window + one map-side-combinable aggregate per group.
    With ``group_col=None`` the rank window is a single global sort —
    bounded only by the cohort, so at scale pass a group column (the
    cross-key parallelism) or pre-sample."""
    gcol = group_col if group_col is not None else "_g"
    pts = df.where(F.col(duration_col) > 0)
    if event_col is not None:
        pts = pts.where(F.col(event_col).cast("int") == 1)
    if group_col is None:
        pts = pts.withColumn("_g", F.lit(1))
    wg = Window.partitionBy(gcol).orderBy(duration_col)
    wn = Window.partitionBy(gcol)
    i = F.row_number().over(wg).cast("double")
    n = F.count(F.lit(1)).over(wn).cast("double")
    fi = (i - 0.3) / (n + 0.4)
    d = pts.select(
        F.col(gcol).alias("_grp"),
        F.log(F.col(duration_col).cast("double")).alias("_x"),
        F.log(-F.log(F.lit(1.0) - fi)).alias("_y"),
    )
    agg = d.groupBy("_grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.try_divide(
            F.covar_pop("_x", "_y"), F.var_pop("_x")
        ).alias("_k"),
        F.avg("_x").alias("_mx"),
        F.avg("_y").alias("_my"),
        F.try_divide(
            F.covar_pop("_x", "_y") * F.covar_pop("_x", "_y"),
            F.var_pop("_x") * F.var_pop("_y"),
        ).alias("r2"),
    )
    out = agg.select(
        F.col("_grp"),
        "n",
        F.col("_k").alias("shape"),
        F.exp(
            F.col("_mx") - F.try_divide(F.col("_my"), F.col("_k"))
        ).alias("scale"),
        "r2",
    )
    if group_col is None:
        return out.drop("_grp")
    return out.withColumnRenamed("_grp", group_col)
