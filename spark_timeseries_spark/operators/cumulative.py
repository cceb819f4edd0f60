"""Cumulative path statistics: running extrema and drawdown.

Beyond-reference (the reference's per-series summaries stop at
``seriesStats`` — ``TimeSeriesRDD.scala:472-478``); drawdown is the
standard path-dependent risk statistic a financial pipeline runs right
after ``returnRates`` (Magdon-Ismail & Atiya 2004 conventions):

- ``drawdown`` — per-row running peak and drawdown below it, either
  relative (``value/peak - 1``, the finance convention for positive
  series) or absolute (``value - peak``, sign-safe for arbitrary series).
- ``max_drawdown`` — per-series worst drawdown with its trough location
  and the peak/trough values realizing it.

Plan: ONE window pass over the (key, loc) sort every series operator
shares (running ``max`` is a rows-unbounded-preceding frame, computed
map-side after the single exchange), then for ``max_drawdown`` one
map-side-combined groupBy. NULL cells carry through as NULL drawdowns
and are ignored by the running peak — identical to SQL ``MAX() OVER``
semantics, so the DuckDB oracle replays it verbatim. No Python, no
self-join, no second exchange beyond the final aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "drawdown", "max_drawdown", "counter_increase", "underwater",
    "top_drawdowns",
]


def drawdown(
    df: DataFrame,
    mode: str = "ratio",
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Running peak + drawdown per row.

    ``mode="ratio"`` → ``value/peak - 1`` (requires positive values to be
    meaningful); ``mode="abs"`` → ``value - peak``. Rows with NULL values
    get NULL drawdown; the running peak skips NULLs (MAX ignores them).
    """
    if mode not in ("ratio", "abs"):
        raise ValueError("mode must be 'ratio' or 'abs'")
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max(value_col).over(w)
    v = F.col(value_col)
    dd = (v / peak - 1.0) if mode == "ratio" else (v - peak)
    return df.withColumn("peak", peak).withColumn(
        "dd", F.when(v.isNotNull(), dd)
    )


def max_drawdown(
    df: DataFrame,
    mode: str = "ratio",
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Per-series worst drawdown: ``(key, max_dd, trough_loc, peak_value,
    trough_value)``.

    ``max_dd`` is the MINIMUM of the per-row drawdown (most negative);
    ``trough_loc`` is the EARLIEST location attaining it (deterministic
    tie-break: min loc among argmin rows — cross-engine stable because the
    comparison value is the exact drawdown both engines compute
    identically from the same peak/value pair). A series with no non-NULL
    cell yields a NULL row set (filtered out).
    """
    per_row = drawdown(df, mode, key_col, order_col, value_col)
    arg = F.struct(
        F.col("dd").alias("dd"),
        F.col(order_col).alias("loc"),
        F.col("peak").alias("peak"),
        F.col(value_col).alias("trough"),
    )
    return (
        per_row.where(F.col("dd").isNotNull())
        .groupBy(key_col)
        .agg(F.min(arg).alias("_a"))
        .select(
            key_col,
            F.col("_a.dd").alias("max_dd"),
            F.col("_a.loc").alias("trough_loc"),
            F.col("_a.peak").alias("peak_value"),
            F.col("_a.trough").alias("trough_value"),
        )
    )


def counter_increase(
    df: DataFrame,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
    ts_col: str | None = None,
) -> DataFrame:
    """Reset-aware monotonic-counter analysis per series → one row
    (key, n, n_resets, increase, elapsed, rate): the Prometheus
    ``increase()``/``rate()`` semantics for cumulative counters that
    occasionally RESET to ~0 (process restarts, rollovers) — naive
    last−first under-counts by the pre-reset total every time.
    Per-step delta = v_t − v_{t−1}; a negative delta marks a reset and
    contributes v_t (the counter restarted from zero, so everything
    since the reset is new increase — the Prometheus extrapolation-free
    convention). ``elapsed`` is in ``order_col`` units, or seconds when
    ``ts_col`` names a timestamp column; ``rate`` = increase/elapsed
    (NULL for single-point series). NULL cells are skipped (a missed
    scrape is not a reset).

    Plan: ONE lag window on the shared (key, loc) sort + one per-key
    aggregate — all JVM, same shuffle budget as a fill."""
    v = F.col(value_col)
    obs = df.where(v.isNotNull())
    ws = Window.partitionBy(key_col).orderBy(order_col)
    prev = F.lag(v).over(ws)
    delta = v - prev
    step = F.when(prev.isNull(), None).otherwise(
        F.when(delta >= 0, delta).otherwise(v)
    )
    reset = F.when(prev.isNotNull() & (delta < 0), 1)
    if ts_col is not None:
        span_lo = F.min(F.unix_micros(F.col(ts_col)))
        span_hi = F.max(F.unix_micros(F.col(ts_col)))
        elapsed = (span_hi - span_lo).cast("double") / 1e6
    else:
        elapsed = (
            F.max(order_col) - F.min(order_col)
        ).cast("double")
    agg = (
        obs.withColumn("_step", step)
        .withColumn("_reset", reset)
        .groupBy(key_col)
        .agg(
            F.count(v).alias("n"),
            F.coalesce(F.sum("_reset"), F.lit(0)).alias("n_resets"),
            F.coalesce(F.sum("_step"), F.lit(0.0)).alias("increase"),
            elapsed.alias("elapsed"),
        )
    )
    return agg.withColumn(
        "rate",
        F.when(
            F.col("elapsed") > 0,
            F.col("increase") / F.col("elapsed"),
        ),
    )


def underwater(
    df: DataFrame,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Drawdown-SPELL summary per series → (key, n, n_underwater,
    underwater_frac, n_spells, longest_spell, max_dd): how long the
    series spends below its running peak, how many distinct underwater
    spells it had, the longest one (in observations), and the depth —
    the duration companion of :func:`max_drawdown` (a strategy with
    the same max-dd but 10× the longest spell is a different risk).
    A spell is a maximal run of consecutive observations with
    dd < 0; NULL values are skipped (they neither extend nor break a
    spell, matching the running peak's NULL-skip).

    Plan: running-peak window → spell ids by the classic
    gaps-and-islands double-cumsum (a spell starts where dd < 0 follows
    dd ≥ 0) → one groupBy(key, spell) → one groupBy(key). Three
    exchanges on aggregated data, no joins, all JVM."""
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ws = Window.partitionBy(key_col).orderBy(order_col)
    v = F.col(value_col)
    d = (
        df.where(v.isNotNull())
        .withColumn("_peak", F.max(value_col).over(w))
        .withColumn("_dd", v / F.col("_peak") - 1.0)
        .withColumn("_uw", (F.col("_dd") < 0).cast("int"))
        .withColumn(
            "_start",
            F.when(
                (F.col("_uw") == 1)
                & (F.coalesce(F.lag("_uw").over(ws), F.lit(0)) == 0),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "_spell",
            F.sum("_start").over(
                ws.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    spells = (
        d.where(F.col("_uw") == 1)
        .groupBy(key_col, "_spell")
        .agg(F.count(F.lit(1)).alias("_len"), F.min("_dd").alias("_dep"))
    )
    per_key = d.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_uw").alias("n_underwater"),
    )
    sp_key = spells.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_spells"),
        F.max("_len").alias("longest_spell"),
        F.min("_dep").alias("max_dd"),
    )
    return per_key.join(sp_key, key_col, "left").select(
        key_col,
        "n",
        "n_underwater",
        F.try_divide(
            F.col("n_underwater").cast("double"), F.col("n").cast("double")
        ).alias("underwater_frac"),
        F.coalesce("n_spells", F.lit(0)).alias("n_spells"),
        F.coalesce("longest_spell", F.lit(0)).alias("longest_spell"),
        F.col("max_dd"),
    )


def top_drawdowns(
    df: DataFrame,
    k: int = 3,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """The k DEEPEST drawdown spells per series → (key, spell_rank,
    start_loc, end_loc, n_obs, depth): each spell is a maximal run of
    consecutive observations below the running peak (the
    :func:`underwater` gaps-and-islands definition), ``depth`` its most
    negative peak-relative drawdown, ranked deepest-first
    (``spell_rank`` 1 = worst; ties broken by earliest start — stated,
    deterministic). The episode TABLE behind :func:`underwater`'s
    summary — risk reports want the dates, not just the count.

    Plan: running-peak window → double-cumsum spell ids → ONE
    groupBy(key, spell) → one rank window over the (small) spell table
    — no joins, all JVM."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ws = Window.partitionBy(key_col).orderBy(order_col)
    v = F.col(value_col)
    d = (
        df.where(v.isNotNull())
        .withColumn("_peak", F.max(value_col).over(w))
        .withColumn("_dd", v / F.col("_peak") - 1.0)
        .withColumn("_uw", (F.col("_dd") < 0).cast("int"))
    )
    start = (
        (F.col("_uw") == 1)
        & (F.coalesce(F.lag("_uw").over(ws), F.lit(0)) == 0)
    ).cast("int")
    d = d.withColumn("_spell", F.sum(start).over(ws)).where(F.col("_uw") == 1)
    spells = d.groupBy(key_col, "_spell").agg(
        F.min(order_col).alias("start_loc"),
        F.max(order_col).alias("end_loc"),
        F.count(F.lit(1)).alias("n_obs"),
        F.min("_dd").alias("depth"),
    )
    wr = Window.partitionBy(key_col).orderBy(
        F.col("depth").asc(), F.col("start_loc").asc()
    )
    return (
        spells.withColumn("spell_rank", F.row_number().over(wr))
        .where(F.col("spell_rank") <= k)
        .select(
            key_col, "spell_rank", "start_loc", "end_loc", "n_obs", "depth"
        )
    )
