"""Table loading for the synthetic benchmark/test datasets.

The driver-generated ``events`` table's ``ts`` column has shipped in two
physical parquet encodings across fixture generations:

* ``INT64 TIMESTAMP(NANOS)`` — readable as BIGINT nanos under older Spark
  with ``spark.sql.legacy.parquet.nanosAsLong=true``;
* ``INT64 TIMESTAMP(MICROS, isAdjustedToUTC=false)`` (current fixtures) —
  which Spark 4.x reads natively as ``TIMESTAMP_NTZ``.

Rather than assume either encoding, we branch on the *actual* dtype Spark
infers and normalize to a stable contract: ``ts`` is a session-TZ TIMESTAMP
and ``ts_nanos`` is the exact BIGINT epoch-nanos value. All engines pin
``spark.sql.session.timeZone=UTC``, so ``TIMESTAMP_NTZ -> TIMESTAMP`` casts
are lossless, and because the data is micros-precision,
``unix_micros(ts) * 1000`` loses nothing. Integer arithmetic throughout
(``div`` / ``unix_micros`` — a double-precision divide would be off by up to
a microsecond at 2024 epochs). The raw ``ts_nanos`` column backs the
reference's nanosecond-parity surface (``python/sparkts/utils.py`` works in
nanos).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

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
    """Read one synthetic table, normalizing ``events.ts`` to the
    ``(ts TIMESTAMP, ts_nanos BIGINT)`` contract regardless of the parquet
    timestamp encoding (see module docstring)."""
    # Harmless under Spark 4.x (ignored for micros-encoded files); keeps the
    # legacy INT64-nanos fixture readable if it ever reappears.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # Legacy fixture: BIGINT epoch-nanos.
            df = df.withColumn("ts_nanos", F.col("ts")).withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        elif isinstance(ts_type, (TimestampNTZType, TimestampType)):
            # Current fixture: micros-precision timestamp (NTZ under 4.x).
            # The NTZ→TIMESTAMP cast interprets the wall-clock in the
            # SESSION timezone; the fixture's wall-clock is UTC, so any
            # other session tz would silently shift every instant. Fail
            # loudly instead (every engine entry point pins UTC).
            if isinstance(ts_type, TimestampNTZType):
                tz = spark.conf.get("spark.sql.session.timeZone")
                if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
                    raise ValueError(
                        "load_table requires spark.sql.session.timeZone=UTC "
                        f"to read TIMESTAMP_NTZ events (session tz is {tz!r}"
                        "); a non-UTC session would shift ts/ts_nanos by "
                        "the UTC offset"
                    )
            ts = F.col("ts").cast("timestamp")
            df = df.withColumn(
                "ts_nanos", F.unix_micros(ts) * F.lit(1000).cast("bigint")
            ).withColumn("ts", ts)
        else:  # pragma: no cover - unknown future encoding
            raise TypeError(
                f"events.ts has unsupported dtype {ts_type}; expected "
                "LongType (nanos), TimestampType, or TimestampNTZType"
            )
    return df


def events_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``events`` table as an observations layout (key, ts, value):
    key = user_id, per FIXTURES.md F1."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.col("user_id").cast("string").alias("key"), "ts", "value"
    )


def save_jsonl(
    df: DataFrame, path: str, compression: str | None = "gzip", mode: str = "error"
) -> None:
    """Write a table as JSON-Lines — the interchange format most text
    corpora arrive in. One JSON object per line, partition-parallel;
    gzip by default (JSONL compresses ~10×, and Spark splits the READ by
    file, so writers should emit many moderate files — the upstream
    partitioning controls that, as usual)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def load_jsonl(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame:
    """Read a JSONL corpus. ALWAYS pass ``schema`` at scale: without one
    Spark runs a full inference pass over the data before the real scan —
    a silent double read of a 100 TB corpus. Malformed lines surface in
    the standard ``_corrupt_record`` column (PERMISSIVE mode) rather than
    failing the job; filter or count them explicitly."""
    r = spark.read
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)
