"""Date-time indices, PySpark-native.

The reference models indices as a Scala class hierarchy with driver-side loc
arithmetic (``/root/reference/src/main/scala/com/cloudera/sparkts/DateTimeIndex.scala:28-40``
trait; uniform ``:158-167``, irregular ``:308-315``, hybrid ``:434-449``).

Our design ("index as data + metadata", SURVEY.md §7): a small Python object
that

- does O(1)/O(log n) driver-side loc↔datetime arithmetic for API parity,
- emits a **distributed** Spark DataFrame ``(loc BIGINT, ts TIMESTAMP)`` via
  ``spark.range(n)`` + JVM-side interval arithmetic (NOT a driver-materialized
  list, so a 10-year-per-second index of ~3×10⁸ rows is generated in parallel
  and never touches the driver),
- round-trips the reference's sidecar string format
  (``DateTimeIndex.scala:886-913``) for save/load parity.

Time plane convention: tz-naive timestamps interpreted in the index's zone
(our engines pin ``spark.sql.session.timeZone=UTC``). Nanosecond parity with
the reference is available via ``loc_at_nanos``/``nanos_at_loc`` on the driver
side; the Spark data plane is microsecond ``TimestampType``.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterable, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .frequencies import (
    BusinessDayFrequency,
    DayFrequency,
    DurationFrequency,
    Frequency,
    MonthFrequency,
    WeekFrequency,
    YearFrequency,
    parse_frequency,
)

LOC_COL = "loc"
TS_COL = "ts"


def _to_ts(dt) -> pd.Timestamp:
    ts = pd.Timestamp(dt)
    if ts.tz is not None:
        ts = ts.tz_convert("UTC").tz_localize(None)
    return ts


class DateTimeIndex:
    """Common interface for uniform / irregular / hybrid indices."""

    zone: str = "Z"

    # -- driver-side arithmetic (API parity with the reference) ------------
    @property
    def size(self) -> int:
        raise NotImplementedError

    def first(self) -> pd.Timestamp:
        raise NotImplementedError

    def last(self) -> pd.Timestamp:
        raise NotImplementedError

    def datetime_at_loc(self, loc: int) -> pd.Timestamp:
        raise NotImplementedError

    def loc_at_datetime(self, dt) -> int:
        """Location of dt, or -1 if absent (``DateTimeIndex.scala:94-130``)."""
        raise NotImplementedError

    def islice(self, start: int, end: int) -> "DateTimeIndex":
        """Integer-location slice [start, end) (``DateTimeIndex.scala:60-69``)."""
        raise NotImplementedError

    def slice(self, start, end) -> "DateTimeIndex":
        """Datetime slice [start, end] inclusive (``DateTimeIndex.scala:177-197``)."""
        raise NotImplementedError

    def to_pandas(self) -> pd.DatetimeIndex:
        raise NotImplementedError

    # -- Spark-side --------------------------------------------------------
    def to_df(self, spark: SparkSession) -> DataFrame:
        """Distributed ``(loc BIGINT, ts TIMESTAMP)`` DataFrame."""
        raise NotImplementedError

    # -- serialization (reference sidecar format) --------------------------
    def to_string(self) -> str:
        raise NotImplementedError

    def __len__(self):
        return self.size

    def __eq__(self, other):
        return (
            isinstance(other, DateTimeIndex)
            and self.to_string() == other.to_string()
        )

    def __hash__(self):
        return hash(self.to_string())

    def __repr__(self):
        return f"{type(self).__name__}({self.to_string()})"


def _fmt_iso(ts: pd.Timestamp, zone: str) -> str:
    base = ts.isoformat()
    return f"{base}Z" if zone in ("Z", "UTC") else base


class UniformDateTimeIndex(DateTimeIndex):
    """(start, periods, frequency) — O(1) space, constant-time ops
    (cf. ``DateTimeIndex.scala:158-213``)."""

    def __init__(self, start, periods: int, freq: Frequency, zone: str = "Z"):
        self.start = _to_ts(start)
        self.periods = int(periods)
        self.freq = freq
        self.zone = zone

    @property
    def size(self) -> int:
        return self.periods

    def first(self) -> pd.Timestamp:
        return self.start

    def last(self) -> pd.Timestamp:
        return self.freq.advance(self.start, self.periods - 1)

    def datetime_at_loc(self, loc: int) -> pd.Timestamp:
        return self.freq.advance(self.start, int(loc))

    def loc_at_datetime(self, dt) -> int:
        dt = _to_ts(dt)
        loc = self.freq.difference(self.start, dt)
        if 0 <= loc < self.periods and self.freq.advance(self.start, loc) == dt:
            return loc
        return -1

    def loc_at_or_before(self, dt) -> int:
        dt = _to_ts(dt)
        if dt < self.start:
            return -1
        return min(self.freq.difference(self.start, dt), self.periods - 1)

    def loc_at_or_after(self, dt) -> int:
        dt = _to_ts(dt)
        if dt > self.last():
            return -1
        if dt <= self.start:
            return 0
        loc = self.freq.difference(self.start, dt)
        if self.freq.advance(self.start, loc) < dt:
            loc += 1
        return loc if loc < self.periods else -1

    def islice(self, start: int, end: int) -> "UniformDateTimeIndex":
        return UniformDateTimeIndex(
            self.datetime_at_loc(start), end - start, self.freq, self.zone
        )

    def slice(self, start, end) -> "UniformDateTimeIndex":
        lo = self.loc_at_or_after(start)
        hi = self.loc_at_or_before(end)
        if lo < 0 or hi < 0 or hi < lo:
            return UniformDateTimeIndex(self.start, 0, self.freq, self.zone)
        return self.islice(lo, hi + 1)

    def to_pandas(self) -> pd.DatetimeIndex:
        if isinstance(self.freq, DurationFrequency):
            return pd.DatetimeIndex(
                self.start + np.arange(self.periods) * pd.Timedelta(self.freq.nanos, "ns")
            )
        return pd.DatetimeIndex(
            [self.freq.advance(self.start, i) for i in range(self.periods)]
        )

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Distributed generation: ``spark.range(periods)`` + JVM interval
        arithmetic — scales to billions of instants with zero driver memory."""
        rng = spark.range(self.periods).withColumnRenamed("id", LOC_COL)
        start_lit = F.lit(self.start.isoformat(sep=" ")).cast("timestamp")
        f = self.freq
        loc = F.col(LOC_COL)
        if isinstance(f, DurationFrequency):
            ts = F.timestamp_micros(
                F.unix_micros(start_lit) + loc * F.lit(f.nanos // 1000)
            )
        elif isinstance(f, DayFrequency):
            ts = start_lit + F.make_interval(days=loc * F.lit(f.days))
        elif isinstance(f, WeekFrequency):
            ts = start_lit + F.make_interval(weeks=loc * F.lit(f.weeks))
        elif isinstance(f, MonthFrequency):
            ts = start_lit + F.make_interval(months=loc * F.lit(f.months))
        elif isinstance(f, YearFrequency):
            ts = start_lit + F.make_interval(years=loc * F.lit(f.years))
        elif isinstance(f, BusinessDayFrequency):
            # closed-form weekend skip, fully JVM-side: n business days from
            # the (validated business-day) anchor = floor(n/5) weeks + rem,
            # +2 days when the remainder crosses the weekend
            # (port of Frequency.scala:143-177)
            dow0 = (self.start.isoweekday() - f.first_day_of_week) % 7
            if dow0 >= 5:
                raise ValueError(f"{self.start} is not a business day")
            n_days = loc * F.lit(f.days)
            weeks = F.floor(n_days / 5)
            rem = n_days % 5
            cross = F.when(F.lit(dow0) + rem >= 5, F.lit(2)).otherwise(F.lit(0))
            ts = start_lit + F.make_interval(days=(weeks * 7 + rem + cross))
        else:
            raise ValueError(f"unsupported frequency {f}")
        return rng.select(loc.alias(LOC_COL), ts.alias(TS_COL))

    def to_string(self) -> str:
        return f"uniform,{self.zone},{_fmt_iso(self.start, self.zone)},{self.periods},{self.freq}"


class IrregularDateTimeIndex(DateTimeIndex):
    """Explicit instant array; O(log n) lookup
    (cf. ``DateTimeIndex.scala:308-397``)."""

    def __init__(self, instants: Iterable, zone: str = "Z"):
        self.instants = pd.DatetimeIndex([_to_ts(t) for t in instants])
        self.zone = zone
        self._nanos = self.instants.asi8

    @property
    def size(self) -> int:
        return len(self.instants)

    def first(self) -> pd.Timestamp:
        return self.instants[0]

    def last(self) -> pd.Timestamp:
        return self.instants[-1]

    def datetime_at_loc(self, loc: int) -> pd.Timestamp:
        return self.instants[int(loc)]

    def loc_at_datetime(self, dt) -> int:
        v = _to_ts(dt).value
        i = bisect.bisect_left(self._nanos, v)
        return i if i < len(self._nanos) and self._nanos[i] == v else -1

    def loc_at_or_before(self, dt) -> int:
        i = bisect.bisect_right(self._nanos, _to_ts(dt).value) - 1
        return i

    def loc_at_or_after(self, dt) -> int:
        i = bisect.bisect_left(self._nanos, _to_ts(dt).value)
        return i if i < len(self._nanos) else -1

    def insertion_loc(self, dt) -> int:
        return bisect.bisect_right(self._nanos, _to_ts(dt).value)

    def islice(self, start: int, end: int) -> "IrregularDateTimeIndex":
        return IrregularDateTimeIndex(self.instants[start:end], self.zone)

    def slice(self, start, end) -> "IrregularDateTimeIndex":
        lo = bisect.bisect_left(self._nanos, _to_ts(start).value)
        hi = bisect.bisect_right(self._nanos, _to_ts(end).value)
        return self.islice(lo, hi)

    def to_pandas(self) -> pd.DatetimeIndex:
        return self.instants

    def to_df(self, spark: SparkSession) -> DataFrame:
        pdf = pd.DataFrame(
            {LOC_COL: np.arange(len(self.instants), dtype=np.int64), TS_COL: self.instants}
        )
        return spark.createDataFrame(pdf)

    def to_string(self) -> str:
        stamps = ",".join(_fmt_iso(t, self.zone) for t in self.instants)
        return f"irregular,{self.zone},{stamps}"


class LazyIrregularDateTimeIndex(IrregularDateTimeIndex):
    """IrregularDateTimeIndex whose instants come from a thunk evaluated on
    first use. Lets instant-level filters (``filterByInstant``,
    ``removeInstantsWithNaNs``) hand back an index WITHOUT running a Spark
    job or holding O(#instants) driver memory up front — both are deferred
    until (unless) the index's instants are actually read."""

    def __init__(self, thunk, zone: str = "Z"):
        self._thunk = thunk
        self.zone = zone

    @property
    def materialized(self) -> bool:
        return "instants" in self.__dict__

    def __getattr__(self, name):
        # only reached when the attribute is missing, i.e. pre-materialization
        if name in ("instants", "_nanos"):
            IrregularDateTimeIndex.__init__(self, self._thunk(), self.zone)
            return getattr(self, name)
        raise AttributeError(name)


class HybridDateTimeIndex(DateTimeIndex):
    """Ordered disjoint sub-indices with prefix-sum loc offsets
    (cf. ``DateTimeIndex.scala:434-553``)."""

    def __init__(self, indices: Sequence[DateTimeIndex], zone: str = "Z"):
        self.indices = list(indices)
        self.zone = zone
        sizes = [ix.size for ix in self.indices]
        self._offsets = np.concatenate([[0], np.cumsum(sizes)])

    @property
    def size(self) -> int:
        return int(self._offsets[-1])

    def first(self) -> pd.Timestamp:
        return self.indices[0].first()

    def last(self) -> pd.Timestamp:
        return self.indices[-1].last()

    def datetime_at_loc(self, loc: int) -> pd.Timestamp:
        i = int(np.searchsorted(self._offsets, loc, side="right")) - 1
        return self.indices[i].datetime_at_loc(int(loc) - int(self._offsets[i]))

    def loc_at_datetime(self, dt) -> int:
        dt = _to_ts(dt)
        for i, ix in enumerate(self.indices):
            if ix.size and ix.first() <= dt <= ix.last():
                sub = ix.loc_at_datetime(dt)
                if sub >= 0:
                    return int(self._offsets[i]) + sub
        return -1

    def islice(self, start: int, end: int) -> DateTimeIndex:
        """STRUCTURAL slice (``DateTimeIndex.scala:434-553``): intersect the
        loc range with each sub-index via the prefix-sum offsets and slice
        the overlapping pieces in place — never materializes the index
        (``to_pandas`` of a hybrid-of-uniform over 10⁸ instants is
        gigabytes on the driver for a 10-element answer)."""
        pieces = []
        for i, ix in enumerate(self.indices):
            lo, hi = int(self._offsets[i]), int(self._offsets[i + 1])
            s, e = max(int(start), lo), min(int(end), hi)
            if s < e:
                pieces.append(ix.islice(s - lo, e - lo))
        return self._from_pieces(pieces)

    def slice(self, start, end) -> DateTimeIndex:
        """Structural datetime slice: each overlapping sub-index slices
        itself over the clipped [start, end] range (inclusive)."""
        start, end = _to_ts(start), _to_ts(end)
        pieces = [
            ix.slice(max(start, ix.first()), min(end, ix.last()))
            for ix in self.indices
            if ix.size and ix.last() >= start and ix.first() <= end
        ]
        return self._from_pieces([p for p in pieces if p.size])

    def _from_pieces(self, pieces: list) -> DateTimeIndex:
        if not pieces:
            return IrregularDateTimeIndex(pd.DatetimeIndex([]), self.zone)
        if len(pieces) == 1:
            return pieces[0]
        return HybridDateTimeIndex(pieces, self.zone)

    def to_pandas(self) -> pd.DatetimeIndex:
        parts = [ix.to_pandas() for ix in self.indices]
        return pd.DatetimeIndex(np.concatenate([p.values for p in parts]))

    def to_df(self, spark: SparkSession) -> DataFrame:
        """Union of sub-index DataFrames with prefix-sum loc offsets — stays
        distributed regardless of sub-index sizes."""
        out = None
        for i, ix in enumerate(self.indices):
            part = ix.to_df(spark).select(
                (F.col(LOC_COL) + F.lit(int(self._offsets[i]))).alias(LOC_COL),
                TS_COL,
            )
            out = part if out is None else out.unionByName(part)
        return out

    def to_string(self) -> str:
        subs = ";".join(ix.to_string() for ix in self.indices)
        return f"hybrid,{self.zone},{subs}"


# ---------------------------------------------------------------------------
# factories (parity with DateTimeIndex.scala:679-914 + python datetimeindex.py)
# ---------------------------------------------------------------------------

def uniform(start, periods: int, freq: Frequency, zone: str = "Z") -> UniformDateTimeIndex:
    return UniformDateTimeIndex(start, periods, freq, zone)


def uniform_from_interval(start, end, freq: Frequency, zone: str = "Z") -> UniformDateTimeIndex:
    s, e = _to_ts(start), _to_ts(end)
    return UniformDateTimeIndex(s, freq.difference(s, e) + 1, freq, zone)


def irregular(instants: Iterable, zone: str = "Z") -> IrregularDateTimeIndex:
    return IrregularDateTimeIndex(instants, zone)


def hybrid(indices: Sequence[DateTimeIndex], zone: str = "Z") -> HybridDateTimeIndex:
    return HybridDateTimeIndex(indices, zone)


def next_business_day(dt, first_day_of_week: int = 1) -> pd.Timestamp:
    """Reference ``DateTimeIndex.scala:855-869``."""
    dt = _to_ts(dt)
    dow = (dt.isoweekday() - first_day_of_week) % 7
    if dow == 5:
        return dt + pd.Timedelta(days=2)
    if dow == 6:
        return dt + pd.Timedelta(days=1)
    return dt


def union(indices: Sequence[DateTimeIndex], zone: str = "Z") -> DateTimeIndex:
    """Union of indices into one sorted deduplicated index.

    The reference builds a Hybrid index via priority-queue merge with
    overlap-trimming (``DateTimeIndexUtils.scala:80-153``). Semantically the
    result is just the sorted distinct set of instants; we return an irregular
    index (driver-side; for huge indices use DataFrame union + dropDuplicates
    through ``align.union_index_df``)."""
    merged = pd.DatetimeIndex(
        np.unique(np.concatenate([ix.to_pandas().asi8 for ix in indices]))
    ).astype("datetime64[ns]")
    return IrregularDateTimeIndex(pd.DatetimeIndex(merged), zone)


def from_string(s: str) -> DateTimeIndex:
    """Parse the reference's index string format
    (``DateTimeIndex.scala:886-913``)."""
    kind, rest = s.split(",", 1)
    if kind == "uniform":
        zone, start, periods, freq = rest.split(",")
        return UniformDateTimeIndex(
            pd.Timestamp(start.replace("Z", "")), int(periods), parse_frequency(freq), zone
        )
    if kind == "irregular":
        toks = rest.split(",")
        zone, stamps = toks[0], toks[1:]
        return IrregularDateTimeIndex(
            [pd.Timestamp(t.replace("Z", "")) for t in stamps], zone
        )
    if kind == "hybrid":
        zone, subs = rest.split(",", 1)
        return HybridDateTimeIndex([from_string(p) for p in subs.split(";")], zone)
    raise ValueError(f"DateTimeIndex type {kind} not recognized")
