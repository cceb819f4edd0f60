"""Deterministic sampling for training-data-mixture construction.

Production mixture pipelines need REPRODUCIBLE sampling: the same document
must make the same keep/drop decision on every run, engine, and cluster
size. `df.sample()`/`sampleBy()` cannot provide that (partition-dependent
RNG streams), so these operators derive the decision from a content-stable
hash of the document id — row-local, shuffle-free, and replayable in plain
SQL by the DuckDB oracle (``hash_fn="md5_60"``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_timeseries_spark.functions import hashed_with_seed

#: modulus for hash-bucketed rate comparison — rates are effectively
#: quantized to 1e-6, plenty for mixture weights
_MOD = 1_000_000


def _bucket(id_col: Column, seed: int, hash_fn: str) -> Column:
    return F.pmod(hashed_with_seed(id_col.cast("string"), seed, hash_fn), _MOD)


def deterministic_sample(
    df: DataFrame,
    rate: float,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep each row iff ``hash(id, seed) mod 1e6 < rate * 1e6`` — a
    reproducible Bernoulli(rate) over ids. Changing ``seed`` draws an
    (approximately) independent sample."""
    thr = int(round(rate * _MOD))
    return df.where(_bucket(F.col(id_col), seed, hash_fn) < thr)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_rate: float = 0.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum deterministic rates — the data-mixture operator: e.g.
    ``{"web": 0.1, "books": 1.0}``. Strata absent from ``rates`` keep
    ``default_rate``. Entirely row-local: the rate lookup is a CASE chain
    on the stratum column, the decision a hash compare — no shuffle, no
    join, no driver state; scales like a filter."""
    thr = F.lit(int(round(default_rate * _MOD)))
    for name, rate in sorted(rates.items()):
        thr = F.when(
            F.col(stratum_col) == name, int(round(rate * _MOD))
        ).otherwise(thr)
    return df.where(_bucket(F.col(id_col), seed, hash_fn) < thr)
