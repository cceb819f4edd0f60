"""Save/load of conformed time-series frames with index sidecars.

Reference formats (kept for round-trip parity):

- CSV: one line per series ``key,v1,v2,...`` plus a ``timeIndex`` sidecar
  file containing ``DateTimeIndex.toString``
  (``TimeSeriesRDD.scala:498-509`` save, ``:750-764`` load).
- Parquet: ``(key STRING, series ARRAY<DOUBLE>)`` with a ``<path>.idx``
  text sidecar (``TimeSeriesRDD.scala:511-551``, ``:769-780``). We use a
  plain double array rather than the reference's MLlib-vector struct —
  simpler, columnar, and readable by any parquet client.

Scale note: data goes through ``spark.read``/``write`` (parallel); only the
tiny index string touches the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import index as index_mod
from ..index import DateTimeIndex
from ..operators import layout


def save_csv(df: DataFrame, index: DateTimeIndex, path: str) -> None:
    """Series-layout CSV + ``timeIndex`` sidecar (reference format)."""
    series = layout.to_series(df)
    lines = series.select(
        F.concat_ws(
            ",",
            F.col("key"),
            F.concat_ws(",", F.transform("series", lambda v: v.cast("string"))),
        ).alias("value")
    )
    lines.write.mode("overwrite").text(os.path.join(path, "data"))
    with open(os.path.join(path, "timeIndex"), "w") as f:
        f.write(index.to_string())


def load_csv(spark: SparkSession, path: str) -> tuple[DataFrame, DateTimeIndex]:
    with open(os.path.join(path, "timeIndex")) as f:
        index = index_mod.from_string(f.read().strip())
    raw = spark.read.text(os.path.join(path, "data"))
    parts = F.split(F.col("value"), ",")
    series_df = raw.select(
        parts[0].alias("key"),
        F.transform(F.slice(parts, 2, index.size), lambda s: s.cast("double")).alias(
            "series"
        ),
    )
    return layout.from_series(series_df, index), index


def save_parquet(df: DataFrame, index: DateTimeIndex, path: str) -> None:
    """Series-layout parquet (snappy) + ``.idx`` sidecar."""
    layout.to_series(df).write.mode("overwrite").parquet(path)
    with open(path.rstrip("/") + ".idx", "w") as f:
        f.write(index.to_string())


def load_parquet(spark: SparkSession, path: str) -> tuple[DataFrame, DateTimeIndex]:
    with open(path.rstrip("/") + ".idx") as f:
        index = index_mod.from_string(f.read().strip())
    series_df = spark.read.parquet(path)
    return layout.from_series(series_df, index), index


def load_yahoo_csv(
    spark: SparkSession, path: str, key_prefix: str = ""
) -> DataFrame:
    """Yahoo-finance OHLCV CSV → observations (key, ts, value), one series
    per price column keyed ``<prefix><Column>``
    (cf. ``parsers/YahooParser.scala:24-48``; the reference parses with
    ``sc.wholeTextFiles`` + string splitting — ours is a declarative csv scan
    + unpivot, so Catalyst parallelizes and prunes). Unlike
    :func:`~spark_timeseries_spark.sources.yahoo.read_yahoo_observations`
    (exact reference keying, raw header tokens), this convenience loader
    INTENTIONALLY normalizes "Adj Close" → "AdjClose" for friendlier keys."""
    df = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .csv(path)
    )
    cols = [c for c in ["Open", "High", "Low", "Close", "Volume", "Adj Close"] if c in df.columns]
    pairs = F.array(
        *[
            F.struct(
                F.lit(f"{key_prefix}{c.replace(' ', '')}").alias("key"),
                F.col(f"`{c}`").cast("double").alias("value"),
            )
            for c in cols
        ]
    )
    return (
        df.withColumn("_p", F.explode(pairs))
        .select(
            F.col("_p.key").alias("key"),
            F.to_timestamp("Date").alias("ts"),
            F.col("_p.value").alias("value"),
        )
        .orderBy("key", "ts")
    )
