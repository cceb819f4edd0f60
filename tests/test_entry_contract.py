"""Contract tests for ``__spark_entry__`` — the driver-facing surface.

The driver's correctness harness canonicalizes each query's pandas frame
with ``sort_values`` over raw cells and hashes exact value
representations. Two structural properties must therefore hold for EVERY
``queries()`` entry (the r7 lessons — ``sq8_error`` crashed the driver on
an array column; a tolerant local checker masked it):

- no output column may be array/map/struct typed;
- every query with an oracle must share its exact column-name set with
  a ``SELECT``-able oracle (checked lightly here: the oracle string
  exists and is non-empty; full value parity is the check_correctness
  harness's job, run per-batch in strict mode).
"""

import os
import sys

import pytest
from pyspark.sql import types as T

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry  # noqa: E402

COMPLEX = (T.ArrayType, T.MapType, T.StructType)


def test_no_complex_output_columns(spark, sf_dir):
    """Build (don't execute) every query's DataFrame and assert no field
    is array/map/struct — the driver canonicalizer crash class."""
    offenders = {}
    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        bad = [f.name for f in df.schema.fields if isinstance(f.dataType, COMPLEX)]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"complex-typed output columns crash the driver harness: {offenders}"
    )


def test_every_query_has_oracle_or_documented_gap(spark):
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs), "oracle for a query that doesn't exist"
    for name, sql in oracles.items():
        assert isinstance(sql, str) and sql.strip(), f"empty oracle for {name}"


def test_entry_returns_dataframe(spark):
    df = entry.entry(spark)
    assert df.columns  # stable, non-empty schema
