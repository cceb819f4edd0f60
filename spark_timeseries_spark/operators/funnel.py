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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "retention_cohorts"]


def funnel(
    df: DataFrame,
    steps: list[str],
    key_col: str = "key",
    ts_col: str = "ts",
    step_col: str = "event_type",
) -> DataFrame:
    """→ one row per entity that performed step 1: (key, ts_1..ts_k —
    first strictly-ordered completion time of each step, NULL once the
    chain breaks — and ``steps_completed``). Step k's time is the
    MINIMUM timestamp of a step-k event STRICTLY AFTER step k−1's
    completion time; an entity that did step 2 only before step 1
    does not count as reaching step 2.

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
    base = df.select(key_col, ts_col, step_col)
    cur = (
        base.where(F.col(step_col) == steps[0])
        .groupBy(key_col)
        .agg(F.min(ts_col).alias("ts_1"))
    )
    for i in range(1, len(steps)):
        nxt = (
            base.where(F.col(step_col) == steps[i])
            .join(cur.select(key_col, f"ts_{i}"), key_col)
            .where(F.col(ts_col) > F.col(f"ts_{i}"))
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
    by construction). Offsets are exact bucket-index differences
    (months are NOT fixed-width — use week/day/hour units; stated).

    Plan: one groupBy(key) for first-activity, broadcast back onto the
    per-(key, bucket) distinct activity, one groupBy(cohort, offset) +
    one cohort-size join — all map-side-combinable, no windows."""
    bucket = F.date_trunc(unit, F.col(ts_col))
    acts = df.select(
        F.col(key_col).alias("_k"), bucket.alias("_b")
    ).distinct()
    first = acts.groupBy("_k").agg(F.min("_b").alias("_cohort"))
    secs = {"day": 86400, "week": 604800, "hour": 3600}
    if unit not in secs:
        raise ValueError(
            f"unit must be one of {sorted(secs)} (fixed-width), got {unit}"
        )
    step = secs[unit]
    joined = acts.join(F.broadcast(first), "_k").select(
        "_k",
        "_cohort",
        (
            (F.unix_timestamp("_b") - F.unix_timestamp("_cohort")) / step
        ).cast("long").alias("_off"),
    )
    ret = joined.groupBy(
        F.col("_cohort").alias("cohort"), F.col("_off").alias("offset")
    ).agg(F.count_distinct("_k").alias("n_active"))
    sizes = first.groupBy(F.col("_cohort").alias("cohort")).agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return ret.join(sizes, "cohort").select(
        "cohort", "offset", "n_active", "cohort_size",
        F.try_divide(
            F.col("n_active").cast("double"),
            F.col("cohort_size").cast("double"),
        ).alias("retention"),
    )
