"""Environment-drift guards.

Round 2 proved fixture/runtime drift is a real failure mode: the driver
regenerated ``events.parquet`` with a TIMESTAMP(MICROS) NTZ ``ts`` column
(previously INT64 nanos) and the loader's hard-coded BIGINT assumption broke
every events-based query. These tests pin the loader's *output contract*
against the actual installed Spark and the actual on-disk fixtures, so any
future encoding change fails here first with a readable message.
"""

import glob
import os

import pytest
from pyspark.sql.types import LongType, TimestampType

from spark_timeseries_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not glob.glob(f"{SF_DIR}/events.parquet*"), reason="no testdata fixtures"
)


def test_events_loader_contract_on_real_fixture(spark):
    """load_table must yield (ts TIMESTAMP, ts_nanos BIGINT) from whatever
    encoding the driver's fixture actually uses under the installed Spark."""
    df = load_table(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), df.schema
    assert isinstance(df.schema["ts_nanos"].dataType, LongType), df.schema


def test_events_ts_and_nanos_agree(spark):
    """ts_nanos must be the exact epoch-nanos of ts (UTC session tz): the
    micros part of both columns must match for every sampled row."""
    from pyspark.sql import functions as F

    df = load_table(spark, SF_DIR, "events").limit(1000)
    bad = df.filter(
        F.unix_micros("ts") * F.lit(1000).cast("bigint") != F.col("ts_nanos")
    ).count()
    assert bad == 0


def test_events_range_is_january_2024(spark):
    """The fixture contract (FIXTURES.md F1): events span January 2024.
    A timezone slip in the loader would shift these bounds."""
    from pyspark.sql import functions as F

    row = (
        load_table(spark, SF_DIR, "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .first()
    )
    assert row.lo.year == 2024 and row.lo.month == 1, row
    assert row.hi.year == 2024 and row.hi.month == 1, row
