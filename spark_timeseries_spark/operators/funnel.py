"""Event funnel and retention-cohort analytics over raw event streams.

Beyond-reference (the reference has no event-analytics surface); these
are the two queries every product/events warehouse runs daily, included
because a 100 TB events table is exactly where a distributed engine
earns its keep:

- **funnel**: per entity, how far through an ORDERED step sequence did
  it get, requiring each step to happen AFTER the previous one (the
  strict-order convention; un-ordered "did all steps" is a plain
  filter). One aggregate computes the first-completion time of step k
  as min(ts of step-k events after the step-(k−1) completion) —
  resolved as a chain of conditional mins, k passes over the per-key
  aggregate but ONE pass over the data.
- **retention_cohorts**: entities grouped by their FIRST-activity
  bucket (the cohort); retention(cohort, offset) = distinct entities of
  that cohort active offset buckets later. The classic triangle
  matrix, as two map-side-combinable aggregates.

Both scale like word-counts: groupBy on well-distributed keys, no
windows over the raw stream, no self-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "funnel", "retention_cohorts", "cohort_values", "rfm_scores",
    "transition_matrix", "attribution",
]


def funnel(
    df: DataFrame,
    steps: list[str],
    key_col: str = "key",
    ts_col: str = "ts",
    step_col: str = "event_type",
    max_gap: float | None = None,
) -> DataFrame:
    """→ one row per entity that performed step 1: (key, ts_1..ts_k —
    first strictly-ordered completion time of each step, NULL once the
    chain breaks — and ``steps_completed``). Step k's time is the
    MINIMUM timestamp of a step-k event STRICTLY AFTER step k−1's
    completion time; an entity that did step 2 only before step 1
    does not count as reaching step 2. ``max_gap`` (seconds) bounds
    each hop: a step-k event counts only within ``max_gap`` seconds of
    the step-(k−1) completion — the time-boxed conversion window every
    product funnel report uses (None = unbounded, the default).

    Plan: k rounds of (filter step-k events) ⋈ (entities with step k−1
    time) → conditional min — every round a key-partitioned equi-join +
    map-side-combinable aggregate, NO per-entity event collection (a
    collect_set funnel holds every step-k timestamp of an entity in one
    aggregation buffer — a memory blowup on a hot entity at 100 TB; the
    join rounds keep state at one timestamp per entity per step, at the
    price of k scans of the step-filtered stream — k is small and each
    scan prunes to one step's events)."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if max_gap is not None and max_gap <= 0:
        raise ValueError(f"max_gap must be positive seconds, got {max_gap}")
    base = df.select(key_col, ts_col, step_col)
    cur = (
        base.where(F.col(step_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("ts_1"))
    )
    for i in range(1, len(steps)):
        within = F.col(ts_col) > F.col(f"ts_{i}")
        if max_gap is not None:
            within = within & (
                F.unix_micros(F.col(ts_col))
                - F.unix_micros(F.col(f"ts_{i}"))
                <= int(max_gap * 1_000_000)
            )
        nxt = (
            base.where(F.col(step_col) == steps[i])
            .join(cur.select(key_col, f"ts_{i}"), key_col)
            .where(within)
            .groupBy(key_col)
            .agg(F.min(ts_col).alias(f"ts_{i + 1}"))
        )
        cur = cur.join(nxt, key_col, "left")
    completed = sum(
        F.when(F.col(f"ts_{i + 1}").isNotNull(), 1).otherwise(0)
        for i in range(len(steps))
    )
    return cur.select(
        key_col,
        *[f"ts_{i + 1}" for i in range(len(steps))],
        completed.alias("steps_completed"),
    )


def retention_cohorts(
    df: DataFrame,
    unit: str = "week",
    key_col: str = "key",
    ts_col: str = "ts",
) -> DataFrame:
    """→ (cohort, offset, n_active, cohort_size, retention): cohort =
    the entity's first-activity ``date_trunc(unit)`` bucket; a cohort
    member is ``n_active`` at ``offset`` k if it has ANY event in
    cohort + k buckets (offset 0 is the cohort itself — retention 1.0
    by construction). Offsets are CALENDAR bucket differences —
    ``datediff`` for day, ``datediff/7`` for week (exact: both ends are
    week-truncated), elapsed epoch hours for hour, ``months_between``
    for month (exact integers: both ends are month-truncated firsts,
    so variable month width and leap days never produce a fraction) —
    so a DST-shortened week (601200 s) still counts as one offset.

    Plan: ZERO joins. The per-entity first-activity bucket is a
    ``min() OVER (PARTITION BY key)`` on the distinct (key, bucket)
    activity — one exchange on the entity key, never a broadcast of the
    entity table (entity cardinality is unbounded at scale: forcing it
    into a broadcast OOMs a 1000-executor job; the window keeps it a
    plain hash exchange). Cohort sizes come from the offset-0 row of the
    SAME aggregate via a cohort-partitioned window (cohorts = time
    buckets, trivially bounded)."""
    if unit not in ("day", "week", "hour", "month"):
        raise ValueError(
            f"unit must be one of ['day', 'hour', 'month', 'week'],"
            f" got {unit}"
        )
    bucket = F.date_trunc(unit, F.col(ts_col))
    acts = df.select(
        F.col(key_col).alias("_k"), bucket.alias("_b")
    ).distinct()
    wk = Window.partitionBy("_k")
    if unit == "day":
        off = F.datediff(F.col("_b"), F.col("_cohort"))
    elif unit == "week":
        off = F.floor(F.datediff(F.col("_b"), F.col("_cohort")) / 7)
    elif unit == "month":
        # both ends are date_trunc('month') firsts-at-midnight, so
        # months_between is an exact integer (31-day month, February,
        # leap day — no fractional component to round)
        off = F.months_between(F.col("_b"), F.col("_cohort"))
    else:  # hour — fixed 3600 s epoch buckets
        off = (
            F.unix_timestamp("_b") - F.unix_timestamp("_cohort")
        ) / 3600
    joined = acts.withColumn("_cohort", F.min("_b").over(wk)).select(
        "_k", "_cohort", off.cast("long").alias("_off")
    )
    ret = joined.groupBy(
        F.col("_cohort").alias("cohort"), F.col("_off").alias("offset")
    ).agg(F.count_distinct("_k").alias("n_active"))
    wc = Window.partitionBy("cohort")
    return ret.withColumn(
        "cohort_size",
        F.max(
            F.when(F.col("offset") == 0, F.col("n_active"))
        ).over(wc),
    ).select(
        "cohort", "offset", "n_active", "cohort_size",
        F.try_divide(
            F.col("n_active").cast("double"),
            F.col("cohort_size").cast("double"),
        ).alias("retention"),
    )


def rfm_scores(
    df: DataFrame,
    buckets: int = 5,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM segmentation over an event stream → one row per entity:
    (key, recency_days, frequency, monetary, r_score, f_score,
    m_score, rfm). Recency = whole days between the entity's last
    event and the CORPUS max timestamp (the "as-of" anchor — stated:
    the data's own end, so the operator is deterministic and
    replayable; pass a pre-filtered frame to anchor elsewhere);
    frequency = event count; monetary = Σ ``value_col`` (NULLs skipped
    by SUM; an all-null entity gets monetary 0). Scores are
    ``ntile(buckets)`` ranks, ordered so HIGHER = better (most recent /
    most frequent / highest spend = ``buckets``), tie-broken by the
    key for cross-engine determinism; ``rfm`` concatenates them
    (r·100 + f·10 + m — the classic 3-digit code; NOTE the digit
    positions overlap for ``buckets`` > 9, so read the individual
    score columns there).

    Plan: ONE map-side-combinable groupBy over the raw stream (the
    expensive pass — scales like a word count), then three ntile
    windows over the K-row ENTITY AGGREGATE — a global sort of K rows,
    not of events (the cross_rank per-instant precedent: fine because
    the scored table is the small output, never the input); the
    corpus anchor is a 1-row broadcast."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    per = df.groupBy(key_col).agg(
        F.max(ts_col).alias("_last"),
        F.count(F.lit(1)).alias("frequency"),
        F.coalesce(F.sum(value_col), F.lit(0.0)).alias("monetary"),
    )
    anchor = df.agg(F.max(ts_col).alias("_anchor"))
    d = per.join(F.broadcast(anchor)).withColumn(
        "recency_days",
        F.floor(
            (F.unix_micros(F.col("_anchor").cast("timestamp"))
             - F.unix_micros(F.col("_last").cast("timestamp")))
            / F.lit(86400000000.0)
        ).cast("long"),
    )
    wr = Window.orderBy(F.col("recency_days").desc(), F.col(key_col))
    wf = Window.orderBy(F.col("frequency").asc(), F.col(key_col))
    wm = Window.orderBy(F.col("monetary").asc(), F.col(key_col))
    d = (
        d.withColumn("r_score", F.ntile(buckets).over(wr))
        .withColumn("f_score", F.ntile(buckets).over(wf))
        .withColumn("m_score", F.ntile(buckets).over(wm))
    )
    return d.select(
        key_col, "recency_days", "frequency", "monetary",
        "r_score", "f_score", "m_score",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10
            + F.col("m_score")
        ).alias("rfm"),
    )


def transition_matrix(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """First-order Markov transition counts between event types →
    (from_type, to_type, n, prob): for every consecutive event pair
    WITHIN an entity (ordered by ``ts_col``, then ``tiebreak_col`` —
    REQUIRED to be unique per (key, ts) duplicates for a deterministic
    sequence; pass the event id), count the (from → to) bigram;
    ``prob`` = n / Σ n over the same from_type (the maximum-likelihood
    transition probability). Entities with one event contribute
    nothing; cross-entity pairs are never formed.

    Plan: one lag window on the (key, order) sort + one
    map-side-combinable groupBy(from, to) + one from-partitioned
    window for the row-normalizer (|types|² rows at most — tiny) —
    scales like a word count."""
    order = [F.col(ts_col)]
    if tiebreak_col is not None:
        order.append(F.col(tiebreak_col))
    w = Window.partitionBy(key_col).orderBy(*order)
    d = (
        df.withColumn("_prev", F.lag(type_col).over(w))
        .where(F.col("_prev").isNotNull())
        .groupBy(
            F.col("_prev").alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wf = Window.partitionBy("from_type")
    return d.withColumn(
        "prob",
        F.col("n").cast("double") / F.sum("n").over(wf).cast("double"),
    )


def cohort_values(
    df: DataFrame,
    unit: str = "week",
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Cohort VALUE (LTV) triangle → (cohort, offset, n_active,
    value_sum, cum_value, cohort_size, cum_value_per_member): the
    revenue companion of :func:`retention_cohorts` — per first-
    activity cohort and calendar offset (same ``unit`` conventions,
    incl. exact month arithmetic), the period's Σ ``value_col`` over
    the cohort's events, its running cumulative, and the classic
    LTV-curve normalization cum_value / cohort_size (members counted
    at offset 0, the cohort definition). NULL values add 0 (SUM
    skips them; a period with only-NULL values still counts its
    actives).

    Plan: the retention plan plus one value sum — per-entity cohort
    via ``min() OVER (PARTITION BY key)`` on the (key, bucket)
    aggregate (ZERO joins, no entity broadcast — the r9 adjudication),
    one (cohort, offset) aggregate, two cohort-partitioned windows
    (cumulative + size) over the triangle table (tiny)."""
    if unit not in ("day", "week", "hour", "month"):
        raise ValueError(
            f"unit must be one of ['day', 'hour', 'month', 'week'],"
            f" got {unit}"
        )
    bucket = F.date_trunc(unit, F.col(ts_col))
    acts = df.select(
        F.col(key_col).alias("_k"), bucket.alias("_b"),
        F.col(value_col).alias("_v"),
    ).groupBy("_k", "_b").agg(
        F.coalesce(F.sum("_v"), F.lit(0.0)).alias("_s")
    )
    wk = Window.partitionBy("_k")
    if unit == "day":
        off = F.datediff(F.col("_b"), F.col("_cohort"))
    elif unit == "week":
        off = F.floor(F.datediff(F.col("_b"), F.col("_cohort")) / 7)
    elif unit == "month":
        off = F.months_between(F.col("_b"), F.col("_cohort"))
    else:  # hour
        off = (
            F.unix_timestamp("_b") - F.unix_timestamp("_cohort")
        ) / 3600
    joined = acts.withColumn("_cohort", F.min("_b").over(wk)).select(
        "_k", "_cohort", off.cast("long").alias("_off"), "_s"
    )
    tri = joined.groupBy(
        F.col("_cohort").alias("cohort"), F.col("_off").alias("offset")
    ).agg(
        F.count_distinct("_k").alias("n_active"),
        F.sum("_s").alias("value_sum"),
    )
    wc = Window.partitionBy("cohort")
    wcum = (
        Window.partitionBy("cohort")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        tri.withColumn("cum_value", F.sum("value_sum").over(wcum))
        .withColumn(
            "cohort_size",
            F.max(
                F.when(F.col("offset") == 0, F.col("n_active"))
            ).over(wc),
        )
        .select(
            "cohort", "offset", "n_active", "value_sum", "cum_value",
            "cohort_size",
            F.try_divide(
                F.col("cum_value"),
                F.col("cohort_size").cast("double"),
            ).alias("cum_value_per_member"),
        )
    )


def attribution(
    df: DataFrame,
    conversion: str,
    touches: list[str],
    lookback: float = 7 * 86400.0,
    key_col: str = "key",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """First/last-touch marketing attribution → one row per CONVERSION
    event: (key, conv_ts, n_touches, first_touch_ts, first_touch_type,
    last_touch_ts, last_touch_type): the touch events (types in
    ``touches``) of the same entity STRICTLY BEFORE the conversion and
    within ``lookback`` seconds of it. No touch in the window → NULL
    touch columns (an "organic" conversion, n_touches 0). Two touches
    at the same microsecond tie-break by event type (struct ordering —
    stated, deterministic).

    Plan: ONE range-frame window pass over the (key, epoch-µs) sort —
    the first/last touch are min/max of a (ts, type) struct over
    ``RANGE [conv − lookback µs, conv − 1 µs]``, so no self-join, no
    per-conversion re-scan; scales like any keyed window."""
    if lookback <= 0:
        raise ValueError(f"lookback must be positive seconds, got {lookback}")
    if not touches:
        raise ValueError("touches must be non-empty")
    if conversion in touches:
        raise ValueError("conversion must not be one of the touches")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    lb_us = int(round(lookback * 1_000_000))
    d = df.where(F.col(type_col).isin([conversion, *touches])).select(
        key_col, ts_col, type_col, us.alias("_us")
    )
    is_touch = F.col(type_col).isin(list(touches))
    w = (
        Window.partitionBy(key_col)
        .orderBy("_us")
        .rangeBetween(-lb_us, -1)
    )
    tstruct = F.when(
        is_touch, F.struct(F.col("_us").alias("u"), F.col(type_col).alias("t"))
    )
    d = (
        d.withColumn("_first", F.min(tstruct).over(w))
        .withColumn("_last", F.max(tstruct).over(w))
        .withColumn(
            "_n", F.coalesce(F.sum(is_touch.cast("long")).over(w), F.lit(0))
        )
    )
    conv = d.where(F.col(type_col) == conversion)
    to_ts = lambda c: F.timestamp_micros(c.cast("long"))
    return conv.select(
        key_col,
        F.col(ts_col).alias("conv_ts"),
        F.col("_n").alias("n_touches"),
        to_ts(F.col("_first")["u"]).alias("first_touch_ts"),
        F.col("_first")["t"].alias("first_touch_type"),
        to_ts(F.col("_last")["u"]).alias("last_touch_ts"),
        F.col("_last")["t"].alias("last_touch_type"),
    )
