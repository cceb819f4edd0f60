"""spark-ts-py — PySpark-native time-series analytics engine.

A from-scratch rebuild of the capabilities of sryza/spark-timeseries
(reference at /root/reference, cited per-module) on Spark DataFrames, window
functions, and Arrow-batched pandas UDFs, extended with large-scale
data-pipeline operators (dedup, similarity search, text analysis).
"""

from .frequencies import (
    BusinessDayFrequency,
    DayFrequency,
    HourFrequency,
    MicrosecondFrequency,
    MillisecondFrequency,
    MinuteFrequency,
    MonthFrequency,
    SecondFrequency,
    WeekFrequency,
    YearFrequency,
    parse_frequency,
)
from .index import (
    DateTimeIndex,
    HybridDateTimeIndex,
    IrregularDateTimeIndex,
    UniformDateTimeIndex,
    from_string,
    hybrid,
    irregular,
    next_business_day,
    uniform,
    uniform_from_interval,
    union,
)
from .tsdf import TimeSeriesDataFrame

__all__ = [
    "BusinessDayFrequency",
    "DayFrequency",
    "HourFrequency",
    "MicrosecondFrequency",
    "MillisecondFrequency",
    "MinuteFrequency",
    "MonthFrequency",
    "SecondFrequency",
    "WeekFrequency",
    "YearFrequency",
    "parse_frequency",
    "DateTimeIndex",
    "HybridDateTimeIndex",
    "IrregularDateTimeIndex",
    "UniformDateTimeIndex",
    "from_string",
    "hybrid",
    "irregular",
    "next_business_day",
    "uniform",
    "uniform_from_interval",
    "union",
    "TimeSeriesDataFrame",
]

__version__ = "0.1.0"
