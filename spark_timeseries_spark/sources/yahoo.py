"""Yahoo-finance CSV ingestion (``parsers/YahooParser.scala:24-48``).

The reference parses whole files on executors into local ``TimeSeries``
objects (one file = one multivariate series, newest row first, key =
``<filename><column>``). Spark-first version: one ``spark.read.csv`` over
the directory — schema inference off, explicit columns, predicate/column
pruning and file-splitting for free — then a melt to the observations
layout. ``input_file_name()`` supplies the reference's filename key prefix
distributively; no driver-side file loop, no whole-file text records (a
2 GB CSV streams instead of materializing one string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

YAHOO_FIELDS = ("Open", "High", "Low", "Close", "Volume", "Adj Close")


def read_yahoo_observations(
    spark: SparkSession, path: str, key_prefix_from_file: bool = True
) -> DataFrame:
    """Directory (or file) of Yahoo CSVs → observations ``(key, ts, value)``
    with key = ``<filename><field>`` as in ``yahooFiles``'s
    ``path.split('/').last`` prefixing (``YahooParser.scala:40-48``)."""
    df = spark.read.option("header", True).csv(path)
    fields = [c for c in df.columns if c != "Date"]
    prefix = (
        F.element_at(F.split(F.input_file_name(), "/"), -1)
        if key_prefix_from_file
        else F.lit("")
    )
    melted = df.select(
        F.to_timestamp("Date").alias("ts"),
        prefix.alias("_prefix"),
        F.stack(
            F.lit(len(fields)),
            *[
                # raw header token kept verbatim: the reference's key is
                # keyPrefix + header, so "Adj Close" → "GOOG.csvAdj Close"
                # (space preserved, YahooParser.scala:29-37)
                x
                for c in fields
                for x in (F.lit(c), F.col(c).cast("double"))
            ],
        ).alias("field", "value"),
    )
    return melted.select(
        F.concat("_prefix", F.col("field")).alias("key"), "ts", "value"
    ).where(F.col("value").isNotNull())
