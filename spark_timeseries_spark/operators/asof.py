"""As-of (temporal) join — match each left row to the nearest right row.

Beyond-reference surface-wise, but the canonical time-series join every
TS store ships (kdb+ ``aj``, pandas ``merge_asof``, DuckDB/Flink ASOF
JOIN): enrich an event stream with the most recent quote/config/state
row per key. Directions:

- ``backward`` (default): largest right ``on`` ≤ left ``on``;
- ``forward``: smallest right ``on`` ≥ left ``on``;
- ``nearest``: whichever side is closer (ties → backward — the pandas
  convention).

Exact-timestamp matches count in every direction. ``tolerance`` (in
seconds for timestamp keys, else in ``on``'s own units) nulls out
matches farther than the bound — a stale quote is worse than no quote.

Plan — the 100 TB story is the whole point: NOT a range join (which
explodes) and NOT a per-row subquery. Tag and UNION the two inputs,
then ONE window pass per key ordered by (on, side): the most recent
right payload reaches every left row as ``last(payload,
ignorenulls=True)`` over the running frame. One hash exchange on the
key, one sort, zero joins — the same shuffle budget as a fill. Right
rows match as ROWS (the payload travels as one struct), never as
per-column latest-non-null Franken-rows. ``nearest`` adds a second
window over the same exchange (two sorts, still one shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["asof_join", "window_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str = "key",
    value_cols: list[str] | None = None,
    tolerance: float | None = None,
    direction: str = "backward",
    suffix: str = "_right",
) -> DataFrame:
    """→ every left row, plus the matched right row's ``value_cols`` and
    its ``on`` stamp as ``{on}{suffix}`` (NULL where nothing matches —
    no right row on that side, a NULL left ``on``, or a match beyond
    ``tolerance``). Right value columns keep their names unless they
    collide with a left column, in which case they carry ``suffix``."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}"
        )
    if tolerance is not None and tolerance < 0:
        raise ValueError(f"tolerance must be >= 0, got {tolerance}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, by)]
    missing = [c for c in value_cols if c not in right.columns]
    if missing:
        raise ValueError(f"right is missing value_cols {missing}")

    out_names = {
        c: (c + suffix if c in left.columns else c) for c in value_cols
    }
    on_out = on + suffix

    pay = F.struct(
        F.col(on).alias("_rts"), *[F.col(c).alias(c) for c in value_cols]
    )
    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(None).cast(
            right.select(pay.alias("_p")).schema["_p"].dataType
        ).alias("_pay"),
        F.lit(1).alias("_is_left"),
    )
    r_tag = right.select(
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            if c not in (on, by)
            else F.col(c)
            for c in left.columns
        ],
        pay.alias("_pay"),
        F.lit(0).alias("_is_left"),
    )
    u = l_tag.unionByName(r_tag)

    is_ts = isinstance(left.schema[on].dataType, (T.TimestampType,
                                                  T.TimestampNTZType))

    def _delta(a, b):  # a - b in tolerance units, both non-null
        if is_ts:
            return (F.unix_micros(a) - F.unix_micros(b)) / F.lit(1e6)
        return a.cast("double") - b.cast("double")

    def _gate(payload, dist):
        ok = payload.isNotNull() & F.col(on).isNotNull()
        if tolerance is not None:
            ok = ok & (dist <= F.lit(float(tolerance)))
        return F.when(ok, payload)

    # backward: right rows sort BEFORE a left row at the same stamp, so
    # the running last() sees exact matches; forward mirrors it
    wb = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(by)
        .orderBy(F.col(on).desc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    u = u.withColumn(
        "_b",
        F.last(F.when(F.col("_is_left") == 0, F.col("_pay")), True).over(wb)
        if direction in ("backward", "nearest")
        else F.lit(None).cast(r_tag.schema["_pay"].dataType),
    ).withColumn(
        "_f",
        F.last(F.when(F.col("_is_left") == 0, F.col("_pay")), True).over(wf)
        if direction in ("forward", "nearest")
        else F.lit(None).cast(r_tag.schema["_pay"].dataType),
    )
    db = _delta(F.col(on), F.col("_b._rts"))
    df_ = _delta(F.col("_f._rts"), F.col(on))
    b_ok = _gate(F.col("_b"), db)
    f_ok = _gate(F.col("_f"), df_)
    if direction == "backward":
        chosen = b_ok
    elif direction == "forward":
        chosen = f_ok
    else:  # nearest: closer side wins, ties -> backward
        chosen = (
            F.when(b_ok.isNull(), f_ok)
            .when(f_ok.isNull(), b_ok)
            .when(df_ < db, f_ok)
            .otherwise(b_ok)
        )
    out = (
        u.where(F.col("_is_left") == 1)
        .withColumn("_m", chosen)
        .select(
            *[F.col(c) for c in left.columns],
            F.col("_m._rts").alias(on_out),
            *[
                F.col(f"_m.{c}").alias(out_names[c])
                for c in value_cols
            ],
        )
    )
    return out


_WJ_AGGS = {"count", "sum", "avg", "min", "max"}


def window_join(
    left: DataFrame,
    right: DataFrame,
    lower: float,
    upper: float,
    aggs: list[str] | None = None,
    on: str = "loc",
    by: str = "key",
    right_value: str = "value",
    prefix: str = "w_",
) -> DataFrame:
    """kdb-style window join (``wj``): every left row aggregates the
    right rows of its key whose ``on`` lies in
    ``[left.on + lower, left.on + upper]`` → all left columns plus one
    ``{prefix}{agg}`` column per requested aggregate (count/sum/avg/
    min/max over ``right_value``; unmatched rows get count 0 and NULL
    moments). The event-context primitive as-of can't express: "the
    quote statistics AROUND each trade", not just the latest one.

    Plan — NOT a range join (which Catalyst plans as a nested loop and
    explodes at corpus scale): the classic interval-bucket trick. Right
    rows hash ONCE into buckets of width (upper − lower); a left row's
    window overlaps at most TWO consecutive buckets, so the left side
    duplicates 2× into an EQUI-join on (key, bucket) and the exact
    range check runs as a post-filter. One shuffle each side, join
    parallelism = keys × buckets, zero nested loops."""
    if not upper > lower:
        raise ValueError(f"need upper > lower, got [{lower}, {upper}]")
    aggs = aggs if aggs is not None else ["count", "avg"]
    bad = [a for a in aggs if a not in _WJ_AGGS]
    if bad:
        raise ValueError(f"unsupported aggs {bad}; pick from {_WJ_AGGS}")
    width = float(upper - lower)
    r2 = right.select(
        F.col(by).alias("_rby"),
        F.col(on).alias("_ron"),
        F.col(right_value).alias("_rv"),
    ).withColumn("_rb", F.floor(F.col("_ron") / width))
    l2 = left.withColumn("_lid", F.monotonically_increasing_id()).withColumn(
        "_b0", F.floor((F.col(on) + F.lit(lower)) / width)
    )
    cand = l2.withColumn(
        "_lb", F.explode(F.array(F.col("_b0"), F.col("_b0") + 1))
    ).join(
        r2,
        (F.col(by) == F.col("_rby")) & (F.col("_lb") == F.col("_rb")),
        "left",
    )
    in_win = F.col("_ron").between(
        F.col(on) + F.lit(lower), F.col(on) + F.lit(upper)
    )
    hit = F.when(in_win, F.col("_rv"))
    agg_exprs = []
    for a in aggs:
        if a == "count":
            agg_exprs.append(F.count(hit).alias(prefix + "count"))
        else:
            agg_exprs.append(getattr(F, a)(hit).alias(prefix + a))
    out = cand.groupBy("_lid", *[l2[c] for c in left.columns]).agg(
        *agg_exprs
    )
    return out.drop("_lid")
