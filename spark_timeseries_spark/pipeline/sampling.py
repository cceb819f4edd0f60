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


def mixture_epochs(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    default_weight: float = 1.0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Repeat-factor UPsampling — the other half of mixture construction
    (:func:`stratified_sample` only drops rows). A stratum with weight
    ``w`` emits every row ``floor(w)`` times, plus one more with
    probability ``frac(w)`` decided by the same deterministic hash bucket
    as the samplers, so e.g. ``{"books": 2.5}`` sees each book 2 or 3
    times (mean 2.5 epochs) — the LLaMA/Gopher-style per-source epoch
    table. Adds an ``epoch`` column (0-based copy index) so downstream
    shuffles/packing see distinct rows.

    Scale: the weight lookup is a literal CASE chain and the copy count a
    hash compare — row-local. The only row-count change is the explode
    itself, which is exactly the upsampled corpus size; no shuffle, no
    join, no driver state. Fractional thresholds are precomputed to
    integer literals here so both engines compare integers (no float
    parity risk).

    The fractional coin hashes a NAMESPACED id (``id + "\\x02epoch"``),
    not the raw id the samplers hash: with a shared stream,
    ``stratified_sample(rate=0.5, seed=0)`` followed by
    ``mixture_epochs(w=1.5, seed=0)`` would give EVERY survivor the extra
    copy (bucket < 500000 twice) — realized mean 2.0 epochs instead of
    1.5. The namespace makes the two decisions independent even at equal
    seeds."""
    def _parts(w: float) -> tuple[int, int]:
        if w < 0:
            raise ValueError(f"negative mixture weight {w}")
        base = int(w)
        return base, int(round((w - base) * _MOD))

    dbase, dthr = _parts(default_weight)
    base_c, thr_c = F.lit(dbase), F.lit(dthr)
    for name, w in sorted(weights.items()):
        b, t = _parts(w)
        base_c = F.when(F.col(stratum_col) == name, b).otherwise(base_c)
        thr_c = F.when(F.col(stratum_col) == name, t).otherwise(thr_c)
    coin = _bucket(
        F.concat(F.col(id_col).cast("string"), F.lit("\x02epoch")),
        seed,
        hash_fn,
    )
    n = base_c + F.when(coin < thr_c, 1).otherwise(0)
    return (
        df.withColumn("_n_copies", n)
        .where(F.col("_n_copies") > 0)
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("_n_copies") - 1))
        )
        .drop("_n_copies")
    )


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
