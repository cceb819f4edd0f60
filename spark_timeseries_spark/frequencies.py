"""Frequency types for uniform date-time indices.

PySpark-native reimplementation of the reference's ``Frequency`` trait
(``/root/reference/src/main/scala/com/cloudera/sparkts/Frequency.scala:26-39``):
a frequency knows how to ``advance`` a datetime by n periods and compute the
``difference`` (number of whole periods) between two datetimes.

Driver-side arithmetic runs on ``pandas.Timestamp`` (nanosecond precision,
matching the reference's nanos-since-epoch longs). Each frequency also knows
how to express itself as a Spark SQL ``INTERVAL`` string so uniform index
generation can stay JVM-side via ``F.sequence``.

String round-trip format matches the reference exactly
(``Frequency.scala:82-188``): ``"days 1"``, ``"hours 2"``,
``"businessDays 1 firstDayOfWeek 1"``, ...
"""

from __future__ import annotations

import pandas as pd

_NANOS = {
    "milliseconds": 1_000_000,
    "microseconds": 1_000,
    "seconds": 1_000_000_000,
    "minutes": 60 * 1_000_000_000,
    "hours": 3600 * 1_000_000_000,
}


class Frequency:
    """Base frequency: advance/difference on pandas Timestamps."""

    def advance(self, dt: pd.Timestamp, n: int) -> pd.Timestamp:
        raise NotImplementedError

    def difference(self, dt1: pd.Timestamp, dt2: pd.Timestamp) -> int:
        """Number of whole periods from dt1 to dt2 (floor)."""
        raise NotImplementedError

    def spark_interval(self) -> str:
        """A Spark SQL interval expression string for ``sequence()``."""
        raise NotImplementedError

    def __eq__(self, other) -> bool:
        return type(self) is type(other) and self.__dict__ == other.__dict__

    def __hash__(self):
        return hash((type(self).__name__, tuple(sorted(self.__dict__.items()))))

    def __repr__(self):
        return str(self)


class DurationFrequency(Frequency):
    """Fixed-duration frequency (reference ``Frequency.scala:41-89,125-141``)."""

    unit: str = ""

    def __init__(self, periods: int):
        self.periods = int(periods)

    @property
    def nanos(self) -> int:
        return self.periods * _NANOS[self.unit]

    def advance(self, dt: pd.Timestamp, n: int) -> pd.Timestamp:
        return dt + pd.Timedelta(self.nanos * n, unit="ns")

    def difference(self, dt1: pd.Timestamp, dt2: pd.Timestamp) -> int:
        return int((dt2.value - dt1.value) // self.nanos)

    def spark_interval(self) -> str:
        unit = self.unit.rstrip("s").upper()
        if unit == "MILLISECOND":
            return f"INTERVAL {self.periods * 1000} MICROSECOND"
        return f"INTERVAL {self.periods} {unit}"

    def __str__(self):
        return f"{self.unit} {self.periods}"


class MillisecondFrequency(DurationFrequency):
    unit = "milliseconds"


class MicrosecondFrequency(DurationFrequency):
    unit = "microseconds"


class SecondFrequency(DurationFrequency):
    unit = "seconds"


class MinuteFrequency(DurationFrequency):
    unit = "minutes"


class HourFrequency(DurationFrequency):
    unit = "hours"


class DayFrequency(Frequency):
    """Calendar days (reference ``Frequency.scala:112-122``)."""

    def __init__(self, days: int):
        self.days = int(days)

    def advance(self, dt: pd.Timestamp, n: int) -> pd.Timestamp:
        return dt + pd.Timedelta(days=self.days * n)

    def difference(self, dt1: pd.Timestamp, dt2: pd.Timestamp) -> int:
        # ChronoUnit.DAYS.between semantics: whole 24h days (calendar-naive
        # here; we do not model DST since our data plane is tz-naive UTC)
        return int((dt2 - dt1) // pd.Timedelta(days=1)) // self.days

    def spark_interval(self) -> str:
        return f"INTERVAL {self.days} DAY"

    def __str__(self):
        return f"days {self.days}"


class WeekFrequency(Frequency):
    def __init__(self, weeks: int):
        self.weeks = int(weeks)

    def advance(self, dt: pd.Timestamp, n: int) -> pd.Timestamp:
        return dt + pd.Timedelta(weeks=self.weeks * n)

    def difference(self, dt1: pd.Timestamp, dt2: pd.Timestamp) -> int:
        return int((dt2 - dt1) // pd.Timedelta(weeks=1)) // self.weeks

    def spark_interval(self) -> str:
        return f"INTERVAL {self.weeks * 7} DAY"

    def __str__(self):
        return f"weeks {self.weeks}"


class MonthFrequency(Frequency):
    """Calendar months with end-of-month clamping (``Frequency.scala:91-99``)."""

    def __init__(self, months: int):
        self.months = int(months)

    def advance(self, dt: pd.Timestamp, n: int) -> pd.Timestamp:
        return dt + pd.DateOffset(months=self.months * n)

    def difference(self, dt1: pd.Timestamp, dt2: pd.Timestamp) -> int:
        # ChronoUnit.MONTHS.between: whole months
        months = (dt2.year - dt1.year) * 12 + (dt2.month - dt1.month)
        if months > 0 and dt1 + pd.DateOffset(months=months) > dt2:
            months -= 1
        elif months < 0 and dt1 + pd.DateOffset(months=months) < dt2:
            months += 1
        return months // self.months

    def spark_interval(self) -> str:
        return f"INTERVAL {self.months} MONTH"

    def __str__(self):
        return f"months {self.months}"


class YearFrequency(Frequency):
    def __init__(self, years: int):
        self.years = int(years)

    def advance(self, dt: pd.Timestamp, n: int) -> pd.Timestamp:
        return dt + pd.DateOffset(years=self.years * n)

    def difference(self, dt1: pd.Timestamp, dt2: pd.Timestamp) -> int:
        return MonthFrequency(12).difference(dt1, dt2) // self.years

    def spark_interval(self) -> str:
        return f"INTERVAL {self.years} YEAR"

    def __str__(self):
        return f"years {self.years}"


class BusinessDayFrequency(Frequency):
    """Weekday-only frequency; closed-form weekend skipping.

    Reimplements the /5·2+remainder arithmetic of the reference
    (``Frequency.scala:143-189``): ``advance`` requires the anchor to BE a
    business day (raises otherwise, matching the reference's
    ``IllegalArgumentException``). ``first_day_of_week`` follows ISO numbering
    (1=Monday .. 7=Sunday) and rebases which two consecutive days count as the
    weekend.
    """

    def __init__(self, days: int, first_day_of_week: int = 1):
        if not 1 <= first_day_of_week <= 7:
            raise ValueError("first day of week must be in [1, 7]")
        self.days = int(days)
        self.first_day_of_week = int(first_day_of_week)

    def _rebased_dow(self, dt: pd.Timestamp) -> int:
        """Day-of-week rebased so first_day_of_week → 0 (cf.
        ``DateTimeIndex.scala:820-853`` rebaseDayOfWeek)."""
        iso = dt.isoweekday()  # 1=Mon..7=Sun
        return (iso - self.first_day_of_week) % 7

    def advance(self, dt: pd.Timestamp, n: int) -> pd.Timestamp:
        dow = self._rebased_dow(dt)
        if dow >= 5:
            raise ValueError(f"{dt} is not a business day")
        n_days = n * self.days
        full_weeks, rem = divmod(abs(n_days), 5)
        sign = 1 if n_days >= 0 else -1
        offset = full_weeks * 7 * sign
        if sign >= 0:
            offset += rem + (2 if dow + rem >= 5 else 0)
        else:
            offset -= rem + (2 if dow - rem < 0 else 0)
        return dt + pd.Timedelta(days=offset)

    def difference(self, dt1: pd.Timestamp, dt2: pd.Timestamp) -> int:
        if dt1 > dt2:
            return -self.difference(dt2, dt1)
        days = int((dt2 - dt1) // pd.Timedelta(days=1))
        full_weeks, rem = divmod(days, 7)
        business = full_weeks * 5
        dow1 = self._rebased_dow(dt1)
        for i in range(rem):
            if (dow1 + 1 + i) % 7 < 5:
                business += 1
        return business // self.days

    def spark_interval(self) -> str:
        raise ValueError(
            "business-day frequency has no fixed interval; "
            "generate via index.to_df() which filters weekend days"
        )

    def __str__(self):
        return f"businessDays {self.days} firstDayOfWeek {self.first_day_of_week}"


def parse_frequency(s: str) -> Frequency:
    """Parse the reference's frequency string format
    (``DateTimeIndex.scala:892-898`` + ``Frequency.scala`` toString)."""
    toks = s.strip().split(" ")
    name, n = toks[0], int(toks[1])
    table = {
        "milliseconds": MillisecondFrequency,
        "microseconds": MicrosecondFrequency,
        "seconds": SecondFrequency,
        "minutes": MinuteFrequency,
        "hours": HourFrequency,
        "days": DayFrequency,
        "weeks": WeekFrequency,
        "months": MonthFrequency,
        "years": YearFrequency,
    }
    if name == "businessDays":
        fdow = int(toks[3]) if len(toks) >= 4 else 1
        return BusinessDayFrequency(n, fdow)
    if name not in table:
        raise ValueError(f"Frequency {name} not recognized")
    return table[name](n)
