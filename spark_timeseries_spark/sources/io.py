"""Table loading for the synthetic benchmark/test datasets.

The driver-generated ``events`` table stores nanosecond parquet timestamps
(``INT64 TIMESTAMP(NANOS)``) which Spark's vectorized reader rejects by
default. We flip ``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable)
and convert with exact integer arithmetic (``div`` — a double-precision
divide would be off by up to a microsecond at 2024 epochs), keeping the raw
``ts_nanos`` column for the reference's nanosecond-parity surface
(``python/sparkts/utils.py`` works in nanos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table, normalizing nanosecond timestamps."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = df.withColumn("ts_nanos", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    return df


def events_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``events`` table as an observations layout (key, ts, value):
    key = user_id, per FIXTURES.md F1."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("key"), "ts", "value"
    )
