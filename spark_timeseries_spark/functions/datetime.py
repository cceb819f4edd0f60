"""Date/time scalar kernels as Spark column expressions.

Reference equivalents (all cited against ``/root/reference/``):

- nanosecond ⇄ timestamp conversion — ``TimeSeriesUtils.scala:303-310``
  (Spark timestamps are µs precision; nanos ride along as LONG).
- ``rebaseDayOfWeek`` — ``DateTimeIndex.scala:820-853``.
- ``nextBusinessDay`` — ``DateTimeIndex.scala:855-869``.
- business-day difference — the /5·2+remainder closed-form arithmetic of
  ``BusinessDayFrequency.difference`` (``Frequency.scala:143-189``).

Everything here is a pure column expression (no UDF, no Python at runtime):
the formulas fold into whole-stage codegen and scale with the scan.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ts_to_nanos(ts: Column) -> Column:
    """Timestamp → nanos-since-epoch LONG (µs precision preserved)."""
    return F.unix_micros(ts) * F.lit(1000)


def nanos_to_ts(nanos: Column) -> Column:
    """Nanos-since-epoch LONG → timestamp (truncates to µs — integer div,
    never a double divide, which would lose µs)."""
    return F.timestamp_micros((nanos / F.lit(1000)).cast("long"))


def iso_dow(ts: Column) -> Column:
    """ISO day-of-week 1=Monday..7=Sunday (Spark's ``dayofweek`` is
    1=Sunday..7=Saturday)."""
    return F.pmod(F.dayofweek(ts) + F.lit(5), F.lit(7)) + F.lit(1)


def rebase_day_of_week(ts: Column, first_day_of_week: int = 1) -> Column:
    """Day-of-week rebased so ``first_day_of_week`` (ISO) maps to 0
    (``DateTimeIndex.scala:820-853``)."""
    return F.pmod(iso_dow(ts) - F.lit(first_day_of_week), F.lit(7))


def next_business_day(ts: Column, first_day_of_week: int = 1) -> Column:
    """The timestamp itself if it falls on a business day, else the next one
    (``DateTimeIndex.scala:855-869``): rebased-Saturday → +2 days,
    rebased-Sunday → +1 day."""
    dow = rebase_day_of_week(ts, first_day_of_week)
    return (
        F.when(dow == 5, F.timestamp_add("DAY", F.lit(2), ts))
        .when(dow == 6, F.timestamp_add("DAY", F.lit(1), ts))
        .otherwise(ts)
    )


def business_day_difference(
    start: Column, end: Column, first_day_of_week: int = 1
) -> Column:
    """Business days from ``start`` to ``end`` (start ≤ end), the closed-form
    weekend-skipping arithmetic of ``Frequency.scala:178-189``: full weeks
    contribute 5 each; the ≤6 remainder days are tested individually against
    the rebased weekend."""
    days = F.datediff(F.to_date(end), F.to_date(start))
    full_weeks = F.floor(days / 7)
    rem = F.pmod(days, F.lit(7))
    dow1 = rebase_day_of_week(start, first_day_of_week)
    inc = F.lit(0)
    for i in range(6):  # rem ∈ [0, 6]
        inc = inc + F.when(
            (F.lit(i) < rem) & (F.pmod(dow1 + F.lit(1 + i), F.lit(7)) < 5),
            F.lit(1),
        ).otherwise(F.lit(0))
    return (full_weeks * 5 + inc).cast("long")
