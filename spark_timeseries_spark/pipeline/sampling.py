"""Deterministic sampling for training-data-mixture construction.

Production mixture pipelines need REPRODUCIBLE sampling: the same document
must make the same keep/drop decision on every run, engine, and cluster
size. `df.sample()`/`sampleBy()` cannot provide that (partition-dependent
RNG streams), so these operators derive the decision from a content-stable
hash of the document id — row-local, shuffle-free, and replayable in plain
SQL by the DuckDB oracle (``hash_fn="md5_60"``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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


def dsir_weights(
    df: DataFrame,
    target: DataFrame,
    buckets: int = 8192,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    NeurIPS) feature-space importance weights → (id, n_features, logw):
    score every raw-corpus document by how target-like its hashed
    n-gram profile is; downstream, sample ∝ exp(logw) (Gumbel top-k or
    :func:`deterministic_sample` on an exp(logw)-derived rate) to tilt
    a 100 TB crawl toward a quality target corpus.

    Model: unigrams + bigrams of whitespace tokens, feature-hashed into
    ``buckets`` buckets; bag-of-buckets multinomials p̂_target / p̂_raw
    with add-one smoothing; logw(doc) = Σ_g log(p̂_t(b(g)) / p̂_r(b(g)))
    over the doc's n-gram OCCURRENCES (the paper's log importance
    ratio under hashed n-gram multinomials). Docs with zero tokens get
    n_features = 0, logw = 0 (no evidence).

    Plan: both corpus profiles are ONE explode + groupBy(bucket) each
    (≤ ``buckets`` rows — vocabulary-scale, not corpus-scale); the
    per-bucket log-ratio table BROADCASTS into one equi-join against
    the raw corpus' exploded n-grams, then one groupBy(id). No pairs,
    no windows; the raw corpus is scanned once. ``hash_fn="md5_60"``
    is the DuckDB-replayable mode (the minhash precedent)."""
    from spark_timeseries_spark.functions import hashed

    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")

    def grams(frame, *cols):
        w = F.split(F.trim(F.col(text_col)), r"\s+")
        base = frame.where(
            F.col(text_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0)
        ).select(*cols, w.alias("_w"))
        uni = F.col("_w")
        bi = F.when(
            F.size("_w") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("_w") - 1),
                lambda i: F.concat(
                    F.element_at("_w", i), F.lit(" "), F.element_at("_w", i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        return base.select(
            *cols, F.explode(F.concat(uni, bi)).alias("_g")
        ).select(
            *cols, F.pmod(hashed(F.col("_g"), hash_fn), F.lit(buckets)).alias("_b")
        )

    def profile(frame):
        return grams(frame).groupBy("_b").agg(F.count(F.lit(1)).alias("_c"))

    tp = profile(target).select("_b", F.col("_c").alias("_ct"))
    rp = profile(df).select("_b", F.col("_c").alias("_cr"))
    # dense bucket table (every bucket present — smoothing needs the
    # zero-count buckets) via a buckets-row range, still broadcast-size
    rng = df.sparkSession.range(buckets).select(F.col("id").alias("_b"))
    ratio = (
        rng.join(tp, "_b", "left")
        .join(rp, "_b", "left")
        .select(
            "_b",
            (
                F.log(
                    (F.coalesce("_ct", F.lit(0)) + 1).cast("double")
                    / (
                        F.sum(F.coalesce("_ct", F.lit(0))).over(
                            Window.partitionBy(F.lit(1))
                        )
                        + buckets
                    ).cast("double")
                )
                - F.log(
                    (F.coalesce("_cr", F.lit(0)) + 1).cast("double")
                    / (
                        F.sum(F.coalesce("_cr", F.lit(0))).over(
                            Window.partitionBy(F.lit(1))
                        )
                        + buckets
                    ).cast("double")
                )
            ).alias("_lr"),
        )
    )
    docs = grams(df, id_col)
    scored = docs.join(F.broadcast(ratio), "_b").groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_features"),
        F.sum("_lr").alias("logw"),
    )
    anchor = df.select(F.col(id_col).alias("id")).distinct()
    return anchor.join(
        scored.select(F.col(id_col).alias("id"), "n_features", "logw"),
        "id",
        "left",
    ).select(
        "id",
        F.coalesce("n_features", F.lit(0)).alias("n_features"),
        F.coalesce("logw", F.lit(0.0)).alias("logw"),
    )


def priority_sample(
    df: DataFrame,
    k: int,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """EXACT-k deterministic sample per stratum — the bottom-k /
    priority-sampling companion of the rate-based samplers: each row's
    priority is its seeded id hash, and the k smallest per stratum
    survive (ties beyond the hash — astronomically unlikely but
    engine-divergence poison — break by id). Rows gain ``sample_rank``
    (1-based priority order). Same guarantees as
    :func:`deterministic_sample`: identical output on every run,
    engine, and cluster size; changing ``seed`` redraws. Strata with
    ≤ k rows pass through whole.

    Scale: one hash-partitioned window per stratum (a single exchange
    keyed on the stratum) + a rank filter. For corpora where one
    stratum dominates, the classic refinement is a pre-filter on the
    hash value (keep only priorities below a generous threshold) before
    the window — noted, not needed at the exact-k contract here."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    pri = hashed_with_seed(F.col(id_col).cast("string"), seed, hash_fn)
    w = Window.partitionBy(stratum_col).orderBy(
        pri.asc(), F.col(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= k)
    )
