"""Bucketed observation storage — the co-located-join / shuffle-free path
for repeated series workloads at cluster scale.

Every series-wise operator in this engine shuffles once on ``key`` and then
runs narrow. When the SAME observations table feeds many jobs (the normal
production shape), that one shuffle per job is the dominant repeated cost
at 100 TB. Writing the table bucketed by ``key`` moves the partitioning
into the LAYOUT: a bucketed scan reports ``HashPartitioning(key)`` to
Catalyst, so per-key aggregates and key-equi-joins skip their exchange
entirely (window functions still sort within buckets, but nothing moves
across the network).

Bucketed tables require the session catalog (``saveAsTable``), not bare
parquet paths — Spark persists bucket metadata in the table definition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_observations_bucketed(
    df: DataFrame,
    table: str,
    n_buckets: int = 64,
    key_col: str = "key",
    ts_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Persist observations bucketed by ``key_col`` and sorted by
    (``key_col``, ``ts_col``) within buckets. ``n_buckets`` should be sized
    so one bucket's largest key-group fits executor memory at full scale
    (same envelope as the series operators)."""
    (
        df.write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, key_col)
        .sortBy(key_col, ts_col)
        .saveAsTable(table)
    )


def load_observations_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed observations table; downstream per-key aggregates
    and key-joins on it plan with ZERO exchanges (assert via `.explain`;
    ``tests/test_plans.py`` pins this)."""
    return spark.table(table)
