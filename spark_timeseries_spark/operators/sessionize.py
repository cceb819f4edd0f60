"""Gap-based sessionization over irregular event streams.

An extension beyond the reference (which has no session concept): the
standard building block for activity analysis and training-data pipelines
over event logs. Two surfaces:

- :func:`sessionize` — per-event 0-based session ids via lag + running sum:
  two window functions over ONE (key, ts) sort, single exchange — the same
  plan-shape budget as the series transforms (``tests/test_plans.py``).
- :func:`session_stats` — per-session aggregates via Spark's NATIVE
  ``session_window`` grouping (the Catalyst operator built for exactly
  this; also the streaming-compatible form — the same expression works
  under Structured Streaming with a watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    gap_seconds: float,
    key_col: str = "key",
    ts_col: str = "ts",
) -> DataFrame:
    """Append ``session_id`` (0-based per key): a new session starts at the
    first event and whenever the gap from the previous event EXCEEDS
    ``gap_seconds`` (a gap of exactly ``gap_seconds`` continues the session,
    matching ``session_window``'s closed-left semantics)."""
    gap_us = int(round(gap_seconds * 1_000_000))
    w = Window.partitionBy(key_col).orderBy(ts_col)
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    starts = F.when(
        prev_us.isNull()
        | (F.unix_micros(F.col(ts_col)) - prev_us > gap_us),
        1,
    ).otherwise(0)
    return df.withColumn(
        "session_id", (F.sum(starts).over(w) - 1).cast("long")
    )


def session_stats(
    df: DataFrame,
    gap_seconds: float,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str | None = "value",
) -> DataFrame:
    """Per-session aggregates via the native ``session_window`` operator:
    (key, session_start, session_end_ts, n_events, duration_seconds
    [, value_sum]). ``session_end_ts`` is the LAST EVENT's timestamp (the
    raw ``session_window.end`` is last event + gap)."""
    gap_expr = f"{int(round(gap_seconds * 1_000_000))} microseconds"
    aggs = [
        F.count("*").alias("n_events"),
        F.max(ts_col).alias("session_end_ts"),
    ]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("value_sum"))
    out = df.groupBy(
        key_col, F.session_window(F.col(ts_col), gap_expr).alias("_w")
    ).agg(*aggs)
    return out.select(
        key_col,
        F.col("_w.start").alias("session_start"),
        "session_end_ts",
        "n_events",
        (
            (
                F.unix_micros("session_end_ts")
                - F.unix_micros(F.col("_w.start"))
            )
            / 1_000_000.0
        ).alias("duration_seconds"),
        *([F.col("value_sum")] if value_col is not None else []),
    )


def max_concurrency(
    sessions: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end_ts",
) -> DataFrame:
    """Peak concurrency over a table of [start, end] INTERVALS
    (inclusive both ends — a session ending at the instant another
    starts overlaps it, stated) → ONE row (n_sessions, max_concurrent,
    peak_ts = the EARLIEST instant the peak is reached). The classic
    sweep-line: +1 at each start, −1 at each end, running sum in
    (ts, +1-before-−1) order; feed it :func:`session_stats` output for
    "peak simultaneous users", or any interval table.

    Plan: one explode to 2·S change points, one GLOBAL ordered
    running-sum window, one aggregate. The global window is a single
    task over 2·S rows — the documented envelope (S = sessions, not
    events; the spearman global-sort precedent): this is a one-number
    corpus diagnostic, and a per-key variant would partition the same
    sweep. The two-level prefix-sum rewrite (per-partition subtotals +
    broadcast offsets) is the named 100× path if S itself outgrows a
    task."""
    deltas = sessions.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("_ts"), F.lit(1).alias("_d")
                ),
                F.struct(
                    F.col(end_col).alias("_ts"), F.lit(-1).alias("_d")
                ),
            )
        ).alias("_e")
    ).select("_e._ts", "_e._d")
    # +1 sorts before -1 at the same instant (inclusive-end overlap)
    wsweep = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.col("_ts"), F.col("_d").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = deltas.withColumn("_run", F.sum("_d").over(wsweep))
    wall = Window.partitionBy(F.lit(1))
    mx = run.withColumn("_mx", F.max("_run").over(wall))
    return mx.groupBy(F.lit(1).alias("_g")).agg(
        (F.count(F.lit(1)) / 2).cast("long").alias("n_sessions"),
        F.min("_mx").alias("max_concurrent"),
        F.min(F.when(F.col("_run") == F.col("_mx"), F.col("_ts"))).alias(
            "peak_ts"
        ),
    ).drop("_g")


def interevent_stats(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
) -> DataFrame:
    """Inter-event time statistics per key → (key, n_gaps, mean_gap_s,
    sd_gap_s, cv, burstiness, memory): the Goh-Barabási (EPL 2008)
    burstiness parameter B = (σ−µ)/(σ+µ) of the inter-event gaps (−1 =
    perfectly regular, 0 = Poisson, →1 = extremely bursty) and the
    memory coefficient M = corr(Δt_i, Δt_{i+1}) (positive: long gaps
    follow long gaps). Population moments (deterministic at n_gaps = 1,
    where sample σ is undefined); M is NULL when fewer than 2
    consecutive gap pairs exist or either side has zero dispersion
    (SQL corr convention, via try_divide).

    Plan: two lag windows over ONE (key, ts) sort + one
    map-side-combinable groupBy(key) on the same key — a single
    exchange, all JVM."""
    wk = Window.partitionBy("key").orderBy("_ts")
    us = F.unix_micros(F.col("_ts"))
    gap = (us - F.lag(us).over(wk)).cast("double") / 1e6
    d = df.select(
        F.col(key_col).alias("key"), F.col(ts_col).alias("_ts")
    ).withColumn("_gap", gap)
    d = d.withColumn("_prev", F.lag("_gap").over(wk)).where(
        F.col("_gap").isNotNull()
    )
    mu = F.avg("_gap")
    sd = F.stddev_pop("_gap")
    pair = F.when(
        F.col("_prev").isNotNull(), F.col("_gap")
    )
    return d.groupBy("key").agg(
        F.count("_gap").alias("n_gaps"),
        mu.alias("mean_gap_s"),
        sd.alias("sd_gap_s"),
        F.try_divide(sd, mu).alias("cv"),
        F.try_divide(sd - mu, sd + mu).alias("burstiness"),
        F.try_divide(
            F.covar_pop(pair, F.col("_prev")),
            F.stddev_pop(pair) * F.stddev_pop("_prev"),
        ).alias("memory"),
    )


def engagement_histogram(
    df: DataFrame,
    unit: str = "week",
    key_col: str = "key",
    ts_col: str = "ts",
) -> DataFrame:
    """Activity-frequency histogram (the product-analytics "L-ness"
    curve, e.g. L7/L28) → one row per (bucket, active_days): how many
    entities were active on exactly that many distinct days inside each
    ``date_trunc(unit)`` bucket, with ``share`` = n_keys / entities
    active in the bucket at all. The histogram's shape (smile vs decay)
    is the standard engagement-depth read.

    Plan: distinct → two map-side-combinable groupBys (the second on a
    strict subset of the first's keys — no extra exchange beyond the
    rollup) + one bucket-partitioned window for the share (buckets =
    time units, trivially bounded)."""
    acts = df.select(
        F.col(key_col).alias("_k"),
        F.date_trunc(unit, F.col(ts_col)).alias("_b"),
        F.date_trunc("day", F.col(ts_col)).alias("_d"),
    ).distinct()
    per_key = acts.groupBy("_b", "_k").agg(
        F.count(F.lit(1)).alias("_days")
    )
    hist = per_key.groupBy(
        F.col("_b").alias("bucket"), F.col("_days").alias("active_days")
    ).agg(F.count(F.lit(1)).alias("n_keys"))
    wb = Window.partitionBy("bucket")
    return hist.withColumn(
        "share",
        F.try_divide(
            F.col("n_keys").cast("double"),
            F.sum("n_keys").over(wb).cast("double"),
        ),
    )


def type_diversity(
    df: DataFrame,
    key_col: str = "key",
    type_col: str = "event_type",
) -> DataFrame:
    """Behavioral-mix diversity per key → (key, n_events, n_types,
    shannon, simpson, effective_types): Shannon entropy H = −Σ p ln p
    (nats), the Gini-Simpson index 1 − Σ p², and Hill number
    exp(H) — the "effective number of equally-common types". The
    standard read on whether an entity's activity is concentrated in
    one behavior or spread across the catalog.

    Plan: groupBy(key, type) → key-partitioned window for the totals →
    groupBy(key); the window and the second aggregate reuse the first
    shuffle's key prefix. All JVM."""
    cnt = df.groupBy(
        F.col(key_col).alias("key"), F.col(type_col).alias("_t")
    ).agg(F.count(F.lit(1)).alias("_c"))
    wk = Window.partitionBy("key")
    p = F.col("_c").cast("double") / F.sum("_c").over(wk).cast("double")
    d = cnt.withColumn("_p", p)
    return d.groupBy("key").agg(
        F.sum("_c").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        (-F.sum(F.col("_p") * F.log("_p"))).alias("shannon"),
        (F.lit(1.0) - F.sum(F.col("_p") * F.col("_p"))).alias("simpson"),
        F.exp(-F.sum(F.col("_p") * F.log("_p"))).alias(
            "effective_types"
        ),
    )
