"""Deduplication operators for large-scale text corpora.

Beyond-reference surface (BASELINE.json north star): exact, MinHash+LSH,
SimHash, n-gram Jaccard, and embedding-cosine near-dup — all designed for the
100 TB regime:

- **Exact**: hash-groupBy on a content digest. One shuffle on the digest;
  no driver state.
- **MinHash+LSH**: shingle → k minhashes via ``xxhash64(shingle, seed_i)``
  (JVM-side, whole-stage codegen; NO Python in the pipeline) → band into
  b bands of r rows → bucket-join candidates → exact-Jaccard verification
  restricted to candidates. Shuffles: one for the minhash groupBy, one for
  the band self-join — both on well-distributed hash keys. The candidate
  verification joins shingle sets only for candidate pairs, so the quadratic
  blow-up of naive all-pairs Jaccard never materializes.
- **SimHash**: 64-bit signature from per-token hash bit-votes (64 conditional
  sums in one aggregate — one shuffle); near-dup candidates by pigeonhole
  banding on 16-bit blocks (Hamming ≤ 3 ⇒ some block equal).
- **Embedding near-dup**: random-hyperplane LSH signatures (seeded,
  deterministic) → bucket join → exact cosine verify within buckets.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_timeseries_spark.functions import let

#: edge-table row bound under which :func:`connected_components` collects
#: the (symmetrized, distinct) near-dup edge list and label-propagates at
#: the driver — a few MB of longs, the broadcast-build-side envelope.
#: Above it, the distributed loop is the scale path.
DRIVER_EDGE_ROWS = 1 << 17


def content_digest(text: Column, normalize: bool = True) -> Column:
    """Stable digest for exact dedup; optional whitespace/case normalization."""
    if normalize:
        text = F.regexp_replace(F.lower(text), r"\s+", " ")
    return F.md5(text)


def dedup_exact(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Keep the lowest-id representative of each exact-content group."""
    w = Window.partitionBy("_h").orderBy(id_col)
    return (
        df.withColumn("_h", content_digest(F.col(text_col), normalize))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def shingles(
    text: Column, n: int = 3, as_words: bool = True
) -> Column:
    """Word (default) or character n-gram shingle array. Documents shorter
    than ``n`` units yield an EMPTY array (no partial shingles — empty or
    near-empty documents must not collide into spurious Jaccard-1.0 pairs).

    The tokenization/normalization is ``let``-bound so the lambda sees a
    plain variable — capturing the split/replace expression directly would
    re-run it per array element (interpreted HOF), turning shingling
    quadratic in document length.
    """
    empty = F.array().cast("array<string>")
    if as_words:
        return let(
            F.split(F.trim(text), r"\s+"),
            lambda words: F.when(
                F.size(words) >= n,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.size(words) - n),
                        lambda i: F.concat_ws(
                            " ", *[words[i + j] for j in range(n)]
                        ),
                    )
                ),
            ).otherwise(empty),
        )
    return let(
        text,
        lambda t: F.when(
            F.length(t) >= n,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.length(t) - n),
                    lambda i: t.substr(i + 1, F.lit(n)),
                )
            ),
        ).otherwise(empty),
    )


def shingle_sets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sh ARRAY<STRING>) distinct-shingle signature table. Shingling is
    the expensive stage of every text-dedup pipeline, so callers that need it
    more than once (signatures + exact verify) should ``.persist()`` the
    result — it is ~2 orders of magnitude smaller than the corpus."""
    return df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), shingle_n).alias("sh")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sig ARRAY<BIGINT>[num_hashes]) — min over shingle xxhash64 per
    seed. Entirely JVM expressions; one shuffle (groupBy id after explode)."""
    sets = shingle_sets(df, text_col, id_col, shingle_n).withColumnRenamed(
        "id", id_col
    )
    return minhash_signatures_from_sets(sets, id_col, num_hashes=num_hashes)


def minhash_signatures_from_sets(
    sets: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_col: str = "sh",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Signatures from a precomputed (id, shingle-array) table.
    ``hash_fn="md5_60"`` uses the DuckDB-reproducible seeded hash. (Measured:
    the 64 seeded digests per shingle are NOT a bottleneck — ~2 s for 1M
    shingle rows on 32 cores, on par with 64 plain long ops; a Carter-Wegman
    one-digest variant via DECIMAL modular arithmetic benched 5× SLOWER
    because Spark's >18-digit decimals leave codegen's long fast-path.)
    ``hash_fn="oph"`` routes to :func:`minhash_signatures_oph` — ONE hash
    per shingle with rotation densification, the extreme-scale signature
    path."""
    from spark_timeseries_spark.functions import hashed_with_seed

    if hash_fn == "oph":
        return minhash_signatures_oph(sets, id_col, num_hashes, shingle_col)
    sh = sets.select(id_col, F.explode(shingle_col).alias("_s"))
    aggs = [
        F.min(hashed_with_seed(F.col("_s"), i, hash_fn)).alias(f"_m{i}")
        for i in range(num_hashes)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(
        id_col, F.array(*[f"_m{i}" for i in range(num_hashes)]).alias("sig")
    )


def minhash_signatures_oph(
    sets: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_col: str = "sh",
) -> DataFrame:
    """One-Permutation-Hashing MinHash signatures (Li, Owen & Zhang 2012)
    with rotation densification (Shrivastava & Li 2014): ONE xxhash64 per
    shingle instead of ``num_hashes`` seeded hashes — the hashing work
    drops by the signature length (64×), which is the dominant signature
    cost at corpus scale. Each shingle's single hash lands in bin
    ``h mod k``; the signature is the per-bin minimum; empty bins borrow
    the nearest filled bin's value to the cyclic right (implemented as
    ``element_at(array_compact(slice(doubled, …)), 1)`` — still pure JVM
    array expressions, no Python).

    Estimator quality: the k-bin OPH estimate has ~the same variance as
    k independent permutations for sets ≫ k (our shingled documents);
    the densified bins make short documents band-comparable rather than
    NULL-filled. The published offset term (c·t per borrow distance) is
    omitted — its only effect is to decorrelate bands of NEAR-EMPTY
    signatures, and every candidate this engine emits is verified by
    exact Jaccard anyway, so spurious collisions cost candidates, never
    correctness. Drop-in compatible with :func:`_banded` /
    :func:`minhash_lsh_candidates` (select with ``hash_fn="oph"`` in
    :func:`minhash_signatures_from_sets`); NOT DuckDB-replayable (the
    oracle path stays md5_60)."""
    sh = sets.select(id_col, F.explode(shingle_col).alias("_s"))
    h = F.xxhash64("_s")
    k = num_hashes
    aggs = [
        F.min(F.when(F.pmod(h, F.lit(k)) == i, h)).alias(f"_m{i}")
        for i in range(k)
    ]
    sig = sh.groupBy(id_col).agg(*aggs)
    arr = F.array(*[f"_m{i}" for i in range(k)])

    def densify(a):
        doubled = F.concat(a, a)
        return F.array(
            *[
                F.coalesce(
                    F.element_at(a, i + 1),
                    F.element_at(
                        F.array_compact(F.slice(doubled, i + 2, k - 1)), 1
                    ),
                )
                for i in range(k)
            ]
        )

    from ..functions import let

    return sig.select(id_col, let(arr, densify).alias("sig"))


def cap_bucket_size(
    buckets: DataFrame, keys: list[str], max_bucket_size: int
) -> DataFrame:
    """Drop every bucket whose membership exceeds ``max_bucket_size`` —
    the standard guard against the quadratic candidate blow-up of a
    bucketed self-join: one hot bucket of B rows emits B² pairs, so a
    single degenerate hash value (boilerplate band, all-zero signature
    block, a mass-produced template) can dominate the whole job at corpus
    scale. Capping trades recall ONLY within oversized buckets; run
    :func:`dedup_exact` first so identical documents (which share every
    bucket and would lose all their bands at once) are already gone.

    The membership count is a window over the bucket keys — the same
    partitioning the downstream self-join shuffles on, so the count rides
    the exchange the join already pays."""
    w = Window.partitionBy(*keys)
    return (
        buckets.withColumn("_bsz", F.count("*").over(w))
        .where(F.col("_bsz") <= int(max_bucket_size))
        .drop("_bsz")
    )


def _validate_bands(bands: int, rows_per_band: int, num_hashes: int | None):
    if bands < 1 or rows_per_band < 1:
        raise ValueError(
            f"bands ({bands}) and rows_per_band ({rows_per_band}) must be >= 1"
        )
    if num_hashes is not None and bands * rows_per_band > num_hashes:
        raise ValueError(
            f"bands*rows_per_band = {bands * rows_per_band} exceeds the "
            f"signature length num_hashes = {num_hashes}"
        )


def _banded(
    sig_df: DataFrame,
    id_col: str,
    out_id: str,
    bands: int,
    rows_per_band: int,
    hash_fn: str,
) -> DataFrame:
    """(out_id, band, bh): one row per band per signature — the ONE
    band-hash construction both the self-join and cross-corpus candidate
    paths key on (a separator/index fix must hit both or the two paths
    silently produce incompatible band keys)."""
    from spark_timeseries_spark.functions import hashed

    return sig_df.select(
        F.col(id_col).alias(out_id),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        hashed(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col("sig")[
                                        b * rows_per_band + r
                                    ].cast("string")
                                    for r in range(rows_per_band)
                                ],
                            ),
                            hash_fn,
                        ).alias("bh"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(out_id, "bb.band", "bb.bh")


def minhash_lsh_candidates(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    num_hashes: int | None = None,
) -> DataFrame:
    """Candidate pairs whose signatures collide in ≥1 band → (id_a, id_b).
    Band hash = hash over the band's slice — a well-distributed join key,
    so the self-join shuffles evenly. ``max_bucket_size`` (off by default)
    applies :func:`cap_bucket_size` to the banded table before the
    self-join — the hot-bucket guard for corpora with template/boilerplate
    mass duplication. Pass ``num_hashes`` (the signature length) to
    fail fast when ``bands · rows_per_band`` overruns it — out-of-range
    signature indices yield NULLs that ``concat_ws`` silently drops,
    collapsing whole bands into hot buckets and exploding the candidate
    self-join."""
    _validate_bands(bands, rows_per_band, num_hashes)
    banded = _banded(sig_df, id_col, "id", bands, rows_per_band, hash_fn)
    if max_bucket_size is not None:
        banded = cap_bucket_size(banded, ["band", "bh"], max_bucket_size)
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, ["band", "bh"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def _jaccard_join(
    candidates: DataFrame,
    sets_a: DataFrame,
    sets_b: DataFrame,
    a_col: str,
    b_col: str,
    threshold: float,
) -> DataFrame:
    """Shared exact-Jaccard verify join: attach each side's shingle set
    (``(id, sh)`` tables) to the candidate pairs and keep pairs at or
    above ``threshold``. Serves both the self-join path
    (:func:`jaccard_verify`) and the cross-corpus path
    (:func:`dedup_minhash_cross`) so NULL/empty-set and threshold
    semantics cannot drift between them. An empty-vs-empty pair divides
    0/0 → NULL jaccard → dropped by the threshold filter."""
    sa = sets_a.withColumnsRenamed({"id": a_col, "sh": "_sh_a"})
    sb = sets_b.withColumnsRenamed({"id": b_col, "sh": "_sh_b"})
    return (
        candidates.join(sa, a_col)
        .join(sb, b_col)
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh_a", "_sh_b"))
            / F.size(F.array_union("_sh_a", "_sh_b")),
        )
        .where(F.col("jaccard") >= threshold)
        .select(a_col, b_col, "jaccard")
    )


def jaccard_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.7,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact Jaccard on candidate pairs only → (id_a, id_b, jaccard).
    Pass a precomputed/persisted ``sets`` (from :func:`shingle_sets`) to
    avoid re-shingling the corpus."""
    if sets is None:
        sets = shingle_sets(df, text_col, id_col, shingle_n)
    return _jaccard_join(candidates, sets, sets, "id_a", "id_b", threshold)


def dedup_minhash_lsh(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    cache_registry: list | None = None,
) -> DataFrame:
    """End-to-end near-dup pair detection: signatures → LSH candidates →
    exact verification. The shingle-set table is computed once and persisted;
    it feeds both the signature stage and the exact-verify join.

    Persist lifetime: the shingle-set cache lives until the session drops it
    — the CALLER owns it. Long-lived sessions issuing many dedup calls should
    ``spark.catalog.clearCache()`` between pipelines (bench.py does exactly
    that), or materialize the result and unpersist explicitly. Looping
    callers (micro-batch gates, ingest loops) pass ``cache_registry`` — a
    list this function APPENDS every internally-persisted frame to, so the
    loop can ``unpersist()`` them once the batch result is materialized
    (without it, each call leaks one cached sets + sig table for the
    session's lifetime — unbounded executor storage on a stream)."""
    sets = shingle_sets(df, text_col, id_col, shingle_n).persist()
    # the signature table feeds BOTH sides of the banded self-join in
    # minhash_lsh_candidates — without a persist Spark evaluates the whole
    # shingle→minhash subtree twice (measured: the sig stage alone doubled
    # the pipeline's wall time). It is tiny (one row × num_hashes longs per
    # doc), so caching is essentially free at any scale.
    sig = minhash_signatures_from_sets(
        sets.withColumnRenamed("id", id_col), id_col, num_hashes, hash_fn=hash_fn
    ).persist()
    if cache_registry is not None:
        cache_registry += [sets, sig]
    if bands < 1 or num_hashes < bands:
        raise ValueError(f"need 1 <= bands ({bands}) <= num_hashes ({num_hashes})")
    cand = minhash_lsh_candidates(
        sig, id_col, bands, num_hashes // bands, hash_fn=hash_fn,
        num_hashes=num_hashes,
    )
    return jaccard_verify(
        df, cand, text_col, id_col, shingle_n, threshold, sets=sets
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """64-bit SimHash per document → (id, simhash BIGINT). One explode +
    one groupBy with 64 conditional sums — all JVM-side. With
    ``hash_fn="md5_60"`` the token hash is 60-bit (bits 60-63 of the
    signature are then always 0 — an effectively-60-bit SimHash), which a
    DuckDB oracle can replay exactly."""
    from spark_timeseries_spark.functions import hashed

    toks = df.select(
        id_col, F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok")
    ).withColumn("h", hashed(F.col("tok"), hash_fn))
    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"_b{i}")
            for i in range(64)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(64):
        sig = sig + F.when(F.col(f"_b{i}") > 0, F.lit(1).cast("long") * (2**i if i < 63 else -(2**63))).otherwise(0)
    return votes.select(id_col, sig.alias("simhash"))


def simhash_near_dups(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs by pigeonhole banding: split the 64-bit signature into
    4 16-bit blocks; Hamming ≤ 3 ⇒ at least one block identical → join on
    (block_idx, block_value), verify Hamming exactly. ``max_bucket_size``
    (off by default) applies :func:`cap_bucket_size` to the block table —
    short/templated docs concentrate into few simhash values, and one hot
    16-bit block value makes the self-join quadratic."""
    blocks = sig_df.select(
        F.col(id_col).alias("id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("blk"),
                        F.shiftright("simhash", b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("bv"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", "bb.blk", "bb.bv")
    if max_bucket_size is not None:
        blocks = cap_bucket_size(blocks, ["blk", "bv"], max_bucket_size)
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = (
        a.join(b, ["blk", "bv"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sa"),
            F.col("b.simhash").alias("sb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
    return (
        pairs.withColumn("hamming", hamming)
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def dot_product(a: Column, b: Column) -> Column:
    """JVM-side fold dot product of two ARRAY<DOUBLE> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    """JVM-side fold L2 norm of an ARRAY<DOUBLE> column. Per-VECTOR, so
    pair-joins should compute it on each side BEFORE the join and combine
    the scalars per pair (same expressions, same values — the fold over a
    given vector is deterministic) instead of re-folding both arrays for
    every joined pair."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two ARRAY<DOUBLE> columns, JVM-side fold."""
    return F.try_divide(dot_product(a, b), l2_norm(a) * l2_norm(b))


def embedding_lsh_signature(
    vec: Column, dim: int, n_planes: int = 16, seed: int = 42
) -> Column:
    """Random-hyperplane signature (deterministic) as a BIGINT bucket id.
    The plane matrix ships as a literal — no Python at row time."""
    planes = _hyperplanes(dim, n_planes, seed)
    bits = []
    for i in range(n_planes):
        plane = F.array(*[F.lit(float(v)) for v in planes[i]])
        dot = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(dot >= 0, F.lit(2**i)).otherwise(0))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def dedup_embedding_cosine(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate vector pairs: LSH bucket join + exact cosine verify.
    At 100 TB the bucket join replaces the O(n²) cross join; bucket count
    2^n_planes is tuned so buckets stay executor-sized, and
    ``max_bucket_size`` (off by default) applies :func:`cap_bucket_size`
    for corpora where one direction dominates (e.g. zero/constant
    embeddings from a broken encoder land in one bucket)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    # per-vector norm computed ONCE per row here, not re-folded per joined
    # pair — cosine below combines the two scalars with the pair's dot
    # product (identical expressions per vector, identical values)
    base = df.select(
        F.col(id_col).alias("id"),
        v.alias("v"),
        embedding_lsh_signature(v, dim, n_planes, seed).alias("bucket"),
        l2_norm(v).alias("nv"),
    )
    if max_bucket_size is not None:
        base = cap_bucket_size(base, ["bucket"], max_bucket_size)
    a, b = base.alias("a"), base.alias("b")
    return (
        a.join(b, "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .withColumn(
            "cosine",
            F.try_divide(
                dot_product(F.col("a.v"), F.col("b.v")),
                F.col("a.nv") * F.col("b.nv"),
            ),
        )
        .where(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine"
        )
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Duplicate-CLUSTER resolution: collapse near-dup pairs into connected
    components → (id, component), component = min id in the cluster.

    Pair output alone over-deletes nothing and under-deletes a lot: A~B and
    B~C mean {A,B,C} is ONE duplicate group even if A~C never scored. This
    is the min-label-propagation algorithm (each round every node takes the
    min label among itself and its neighbors), a DataFrame-only iteration:
    per round one join + one groupBy(min) on the PAIRS table — which is
    orders of magnitude smaller than the corpus — converging in
    O(cluster diameter) rounds (near-dup clusters are tight; diameter is
    single-digit in practice, and ``max_iter`` bounds adversarial chains).
    The driver-side loop carries only a changed-row count per round, never
    data.

    Hitting ``max_iter`` with labels still changing means a duplicate chain
    whose diameter exceeds the bound — returning those labels silently
    would under-dedup with no signal (r3 VERDICT #2). ``on_nonconverged``
    controls the failure mode: ``"raise"`` (default) raises RuntimeError;
    ``"warn"`` logs a warning and returns the partial labels (each partial
    component is still a valid subset of a true component, so downstream
    dedup is conservative — it keeps too much, never drops a unique doc).

    Each round's labels are eagerly ``localCheckpoint``-ed, not persisted:
    persist caches DATA but keeps the full logical plan, so an iterative
    loop's plan doubles per round — by round ~15 the driver OOMs just
    stringifying it (observed r4, long-chain property test). The
    checkpoint truncates lineage, keeping every round's plan O(1). The
    returned frame is therefore already materialized distributed storage;
    its blocks free when the frame is garbage-collected (``.unpersist()``
    on it is a harmless no-op, so r3-era callers still work)."""
    if on_nonconverged not in ("raise", "warn"):
        raise ValueError(f"on_nonconverged must be raise|warn, got {on_nonconverged!r}")
    e = pairs.select(
        F.col(id_a).cast("long").alias("a"), F.col(id_b).cast("long").alias("b")
    )
    edges = (
        e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist()
    )
    n_edges = edges.count()  # also warms the persist the loop below reuses
    if n_edges <= DRIVER_EDGE_ROWS:
        # The pair table is tiny (near-dup edges, not the corpus — the
        # corpus-scale join that produced it already ran). The cluster
        # loop costs two job round-trips per round (materialize + changed
        # count) on near-empty tasks; min-label propagation over longs is
        # exact on any engine, so a driver-local replay of the SAME
        # round-by-round algorithm (same max_iter bound, same
        # nonconvergence contract) returns identical labels. Collect
        # once, propagate locally.
        rows = edges.collect()
        edges.unpersist()
        return _components_local(
            pairs.sparkSession,
            [(r["a"], r["b"]) for r in rows],
            max_iter,
            on_nonconverged,
        )
    labels = (
        edges.select(F.col("a").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    changed = 1
    for _ in range(max_iter):
        prop = edges.join(labels, edges["b"] == labels["id"]).select(
            edges["a"].alias("id"), "component"
        )
        # eager checkpoint = the round's materialization job (the old
        # persist+count did the same work) AND the lineage truncation that
        # keeps round k's plan from embedding rounds 0..k-1
        new = (
            labels.unionByName(prop)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new.alias("n")
            .join(labels.select("id", F.col("component").alias("_old")), "id")
            .where(F.col("component") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iter} rounds: "
            "a duplicate chain's diameter exceeds max_iter; labels are "
            "partial (under-merged)"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels


def _components_local(spark, edges, max_iter, on_nonconverged):
    """Driver-local replica of the distributed min-label propagation —
    used only when the symmetrized distinct edge list fits under
    :data:`DRIVER_EDGE_ROWS`. Identical round semantics: each round every
    node takes the min of its own label and its neighbors' labels from the
    PREVIOUS round, the loop stops on a fixed point, and hitting
    ``max_iter`` with labels still moving raises/warns exactly like the
    cluster loop."""
    labels = {a: a for a, _ in edges}
    changed = 1
    for _ in range(max_iter):
        new = dict(labels)
        for a, b in edges:
            lb = labels[b]
            if lb < new[a]:
                new[a] = lb
        changed = sum(1 for k in labels if labels[k] != new[k])
        labels = new
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iter} rounds: "
            "a duplicate chain's diameter exceeds max_iter; labels are "
            "partial (under-merged)"
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, RuntimeWarning, stacklevel=3)
    out = [(k, labels[k]) for k in sorted(labels)]
    return spark.createDataFrame(out, "id long, component long")


def keep_cluster_representatives(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Drop every clustered duplicate except its min-id representative —
    the corpus-side consumer of :func:`connected_components`. One anti-join
    against the non-representative set; AQE broadcasts it when it is
    actually small (no pinned hint — at dup-heavy corpora the drop set is
    a large fraction of the ids and must stay a shuffled join).

    The component cache is internal here (r3 ADVICE): the drop set is
    eagerly ``localCheckpoint``-ed — a distributed materialization that
    CUTS the lineage back to the iterative computation — so the iteration
    cache can be released before returning instead of leaking for the
    session. The checkpoint blocks themselves are reclaimed by the context
    cleaner once the returned frame is garbage-collected."""
    comp = connected_components(pairs, id_a, id_b)
    drop = (
        comp.where(F.col("id") != F.col("component"))
        .select(F.col("id").alias(id_col))
        .localCheckpoint(eager=True)
    )
    comp.unpersist()
    return df.join(drop, id_col, "left_anti")


# ---------------------------------------------------------------------------
# duplicated-substring detection (Lee et al. 2021)
# ---------------------------------------------------------------------------

def positioned_ngrams(
    df: DataFrame,
    n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(id, dl, start, gh) — the hash of every token ``n``-gram with its
    1-based start position. The scale path of Lee et al. 2021's
    suffix-array substring dedup ("Deduplicating Training Data Makes
    Language Models Better"): a long n-gram (default 20 tokens ≈ the
    paper's 50-token threshold at pretrain tokenization granularity) is a
    fingerprint of an exact substring; hashing keeps the shuffle rows
    narrow (16 bytes vs the ~120-byte gram text). Documents shorter than
    ``n`` tokens yield no rows."""
    from spark_timeseries_spark.functions import hashed
    from spark_timeseries_spark.pipeline.text import tokens

    toks = F.filter(
        tokens(F.lower(F.col(text_col))), lambda t: t != F.lit("")
    )
    base = df.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "dl", F.size("_toks")
    )
    # let-bound array: sequence over starts, slice per start — the text is
    # tokenized once; the per-start work is a slice + concat (O(n))
    gram = lambda i: F.concat_ws(" ", F.slice(F.col("_toks"), i, n))  # noqa: E731
    return (
        base.where(F.col("dl") >= n)
        .select(
            id_col,
            "dl",
            F.explode(F.sequence(F.lit(1), F.col("dl") - n + 1)).alias("start"),
            "_toks",
        )
        .select(
            id_col,
            "dl",
            "start",
            hashed(gram(F.col("start")), hash_fn).alias("gh"),
        )
    )


def duplicated_span_stats(
    df: DataFrame,
    n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-document duplicated-substring coverage: (id, n_tokens,
    dup_tokens, dup_token_ratio), where a token position counts as
    duplicated iff it lies inside some ``n``-gram whose hash occurs in at
    least ``min_docs`` distinct documents.

    Plan: one shuffle to find cross-document gram hashes (groupBy gh with
    map-side combine), a join back restricted to those hashes (AQE decides
    broadcast vs sort-merge; the dup-hash side is the small one), then an
    interval-union window per document: spans sorted by start, each
    contributing its length minus whatever a preceding span already covered
    (running max of span ends). One doc_id shuffle over *duplicated
    occurrences only*, no position explode — the n-fold row blow-up of the
    naive countDistinct(position) formulation never materializes. Output
    covers every input document (clean ones report ratio 0.0)."""
    grams = positioned_ngrams(df, n, text_col, id_col, hash_fn)
    dup = (
        grams.groupBy("gh")
        .agg(F.countDistinct(id_col).alias("_nd"))
        .where(F.col("_nd") >= int(min_docs))
        .select("gh")
    )
    prev = (
        Window.partitionBy(id_col)
        .orderBy("start")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    end = F.col("start") + n - 1
    new_cov = F.greatest(
        F.lit(0),
        end - F.greatest(
            F.coalesce(F.max(F.col("start") + n - 1).over(prev), F.lit(0)),
            F.col("start") - 1,
        ),
    )
    covered = (
        grams.join(dup, "gh")
        .select(id_col, "start")
        .withColumn("_new", new_cov)
        .groupBy(id_col)
        .agg(F.sum("_new").alias("dup_tokens"))
    )
    from spark_timeseries_spark.pipeline.text import token_count

    lens = df.select(
        F.col(id_col), token_count(F.col(text_col)).alias("n_tokens")
    )
    return (
        lens.join(covered, id_col, "left")
        .withColumn("dup_tokens", F.coalesce("dup_tokens", F.lit(0)))
        .withColumn(
            "dup_token_ratio",
            F.when(F.col("n_tokens") == 0, F.lit(0.0)).otherwise(
                F.col("dup_tokens") / F.col("n_tokens")
            ),
        )
    )


def remove_dup_spans(
    df: DataFrame,
    n: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    keep_first: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Substring-dedup REWRITE (the removal half of Lee et al. 2021, next
    to :func:`duplicated_span_stats`'s measurement half): cut every token
    span covered by a cross-document duplicated ``n``-gram and rebuild the
    text from what remains. With ``keep_first`` (default, the paper's
    keep-one-copy policy) each gram's canonical occurrence — the one in
    the smallest ``id`` containing it — is exempt, so exactly one copy of
    every duplicated substring survives the corpus. Output: (id,
    clean_text, n_tokens, removed_tokens); the rebuilt text is
    whitespace-normalized (tokens joined by single spaces). Documents
    shorter than ``n`` tokens pass through unchanged.

    Plan (100 TB lens): the dup-hash table is found with one gram-hash
    shuffle (map-side combine; carries (gh, count, min-id) only). Spans
    join back restricted to those hashes, then ALL span algebra — overlap
    merging via the running-max-of-ends window, gap extraction via lag —
    is windowed over one doc_id shuffle of *duplicated occurrences only*;
    no position explode, no quadratic HOF. The rebuild is a per-doc
    collect of non-overlapping keep-segments (bounded by the document's
    own token count) + array slices — row-local. Intra-document repeats
    do not count as duplicates (min_docs is over DISTINCT documents),
    matching duplicated_span_stats.
    """
    from spark_timeseries_spark.pipeline.text import tokens

    grams = positioned_ngrams(df, n, text_col, id_col, hash_fn)
    agg = [F.countDistinct(id_col).alias("_nd")]
    if keep_first:
        agg.append(F.min(id_col).alias("_canon"))
    dup = grams.groupBy("gh").agg(*agg).where(F.col("_nd") >= int(min_docs))
    occ = grams.join(dup, "gh")
    if keep_first:
        occ = occ.where(F.col(id_col) != F.col("_canon"))
    spans = occ.select(
        id_col, "dl", "start", (F.col("start") + n - 1).alias("end")
    )

    # merge overlapping/touching spans: a span starts a new merged group
    # iff it begins past the running max of previous ends (same trick as
    # duplicated_span_stats, kept relational to avoid O(m²) array HOFs)
    w_ord = Window.partitionBy(id_col).orderBy("start", "end")
    prev_max_end = F.max("end").over(w_ord.rowsBetween(Window.unboundedPreceding, -1))
    grouped = spans.withColumn(
        "_grp",
        F.sum(
            F.when(
                F.col("start") > F.coalesce(prev_max_end, F.lit(0)) + 1, 1
            ).otherwise(0)
        ).over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    )
    merged = grouped.groupBy(id_col, "_grp").agg(
        F.min("start").alias("a"),
        F.max("end").alias("b"),
        F.first("dl").alias("dl"),
    )

    # keep-segments = complement of merged spans inside [1, dl]. ONE pass
    # over merged (plan-pinned: a second consumer would recompute the
    # whole gram pipeline): each interval emits the gap before itself
    # (prev_end+1 .. a-1) and, if last in its doc, the tail (b+1 .. dl);
    # degenerate segments are filtered inside the aggregate. Every doc
    # with ≥1 merged span gets exactly one row here (possibly an empty
    # segment array — the fully-covered case), so the left-join NULL below
    # is precisely "no duplicated spans".
    w_m = Window.partitionBy(id_col).orderBy("a")
    pair = merged.select(
        id_col,
        F.array(
            F.struct(
                F.coalesce(F.lag("b").over(w_m) + 1, F.lit(1)).alias("s"),
                (F.col("a") - 1).alias("e"),
            ),
            F.struct(
                (F.col("b") + 1).alias("s"),
                F.when(
                    F.lead("a").over(w_m).isNull(), F.col("dl")
                ).otherwise(F.lit(0)).alias("e"),
            ),
        ).alias("_pair"),
    )
    segs = pair.groupBy(id_col).agg(
        F.sort_array(
            F.filter(
                F.flatten(F.collect_list("_pair")),
                lambda g: g["s"] <= g["e"],
            )
        ).alias("_segs")
    )

    toks_orig = F.filter(tokens(F.col(text_col)), lambda t: t != F.lit(""))
    base = df.select(F.col(id_col), toks_orig.alias("_toks")).withColumn(
        "dl", F.size("_toks")
    )
    kept = F.flatten(
        F.transform(
            F.col("_segs"),
            lambda s: F.slice(F.col("_toks"), s["s"], s["e"] - s["s"] + 1),
        )
    )
    out = (
        base.join(segs, id_col, "left")
        .withColumn(
            "_kept",
            F.when(F.col("_segs").isNull(), F.col("_toks")).otherwise(kept),
        )
        .select(
            id_col,
            F.concat_ws(" ", F.col("_kept")).alias("clean_text"),
            F.col("dl").alias("n_tokens"),
            (F.col("dl") - F.size("_kept")).alias("removed_tokens"),
        )
    )
    return out


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Corpus-wide paragraph dedup (the C4 three-sentence-span rule's
    paragraph-granularity cousin, applied by several pretraining corpora):
    every repeated paragraph keeps exactly its FIRST occurrence — smallest
    (doc, position) — and is cut everywhere else, then documents are
    rebuilt with blank-line joins. Output: (id, text, n_paras,
    removed_paras); a document whose every paragraph is a repeat rebuilds
    to ''.

    Scale shape: paragraphs are split row-locally; the canonical
    occurrence per paragraph hash is ONE partially-aggregated groupBy
    (min(struct(doc, pos)) — map-side combine collapses even a
    corpus-wide boilerplate paragraph to one row per partition, so there
    is no hot-key window; a row_number-over-hash formulation would put
    every copy of a viral paragraph in one task). The join back is
    hash-keyed (AQE skew-split applies) and the rebuild is one groupBy
    over the SURVIVING occurrences only."""
    from spark_timeseries_spark.functions import hashed

    paras = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.transform(
                    F.split(F.col(text_col), r"\n{2,}"), lambda p: F.trim(p)
                ),
                lambda p: p != F.lit(""),
            )
        ).alias("idx", "para"),
    ).withColumn("ph", hashed(F.col("para"), hash_fn))
    canon = paras.groupBy("ph").agg(
        F.min(F.struct(F.col(id_col).alias("i"), F.col("idx").alias("x"))).alias(
            "_first"
        )
    )
    kept = (
        paras.join(canon, "ph")
        .where(
            (F.col(id_col) == F.col("_first.i"))
            & (F.col("idx") == F.col("_first.x"))
        )
        .select(id_col, "idx", "para")
    )
    # anchor on the corpus so blank/whitespace-only documents (zero
    # paragraphs) still get an output row
    counts = (
        df.select(id_col)
        .join(
            paras.groupBy(id_col).agg(F.count("*").alias("n_paras")),
            id_col,
            "left",
        )
        .select(id_col, F.coalesce("n_paras", F.lit(0)).alias("n_paras"))
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("idx", "para"))).alias("_ps")
        )
        .select(
            id_col,
            F.concat_ws("\n\n", F.col("_ps.para")).alias("_reb"),
            F.size("_ps").alias("_kept"),
        )
    )
    return (
        counts.join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("_reb", F.lit("")).alias(text_col),
            "n_paras",
            (F.col("n_paras") - F.coalesce("_kept", F.lit(0))).alias(
                "removed_paras"
            ),
        )
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = 2,
    keep_first: bool = True,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """CCNet-style LINE-level dedup (Wenzek et al. 2020 dedupe lines by
    hash across shards; the single-``\\n`` cousin of
    :func:`dedup_paragraphs`): a line whose hash appears in at least
    ``min_docs`` DISTINCT documents is duplicated — with ``keep_first``
    its corpus-first occurrence (smallest (doc, position)) survives,
    without it every copy is cut; non-duplicated lines always keep all
    their occurrences (intra-document repeats below the threshold are
    untouched, unlike the paragraph operator's keep-first-everywhere).
    Output: (id, text, n_lines, removed_lines); rebuilt with ``\\n``.

    Normalization (dedup_paragraphs-family semantics): every document is
    rebuilt from its TRIMMED non-empty lines — leading/trailing
    whitespace per line and blank lines disappear even when nothing was
    deduplicated, and ``n_lines``/``removed_lines`` count non-empty
    lines only (dropped blank lines are normalization, not removal, and
    are not counted in ``removed_lines``).

    Scale shape mirrors :func:`dedup_paragraphs`: row-local split, ONE
    partially-aggregated groupBy per line hash carrying (distinct-doc
    count, min (doc, pos)) — map-side combine collapses a corpus-viral
    line to one row per partition — then a hash-keyed join back and a
    per-doc rebuild over surviving occurrences only."""
    from spark_timeseries_spark.functions import hashed

    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.filter(
                F.transform(F.split(F.col(text_col), r"\n"), lambda s: F.trim(s)),
                lambda s: s != F.lit(""),
            )
        ).alias("idx", "line"),
    ).withColumn("lh", hashed(F.col("line"), hash_fn))
    stats = lines.groupBy("lh").agg(
        F.countDistinct(id_col).alias("_nd"),
        F.min(F.struct(F.col(id_col).alias("i"), F.col("idx").alias("x"))).alias(
            "_first"
        ),
    )
    is_first = (F.col(id_col) == F.col("_first.i")) & (
        F.col("idx") == F.col("_first.x")
    )
    keep_pred = F.col("_nd") < int(min_docs)
    if keep_first:
        keep_pred = keep_pred | is_first
    kept = (
        lines.join(stats, "lh")
        .where(keep_pred)
        .select(id_col, "idx", "line")
    )
    counts = (
        df.select(id_col)
        .join(
            lines.groupBy(id_col).agg(F.count("*").alias("n_lines")),
            id_col,
            "left",
        )
        .select(id_col, F.coalesce("n_lines", F.lit(0)).alias("n_lines"))
    )
    rebuilt = (
        kept.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("idx", "line"))).alias("_ls"))
        .select(
            id_col,
            F.concat_ws("\n", F.col("_ls.line")).alias("_reb"),
            F.size("_ls").alias("_kept"),
        )
    )
    return counts.join(rebuilt, id_col, "left").select(
        id_col,
        F.coalesce("_reb", F.lit("")).alias(text_col),
        "n_lines",
        (F.col("n_lines") - F.coalesce("_kept", F.lit(0))).alias(
            "removed_lines"
        ),
    )


def containment_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact shingle CONTAINMENT on candidate pairs → (id_a, id_b,
    containment_a, containment_b, jaccard). Containment (Broder 1997's
    resemblance companion) is |A∩B|/|A| — near 1.0 when A is embedded in
    B even though Jaccard is small, which is exactly the
    quotation/expansion/contamination case symmetric near-dup scoring
    misses. ``threshold`` keeps pairs where EITHER direction reaches it.
    Same candidate-restricted plan as :func:`jaccard_verify`; pass a
    persisted ``sets`` to avoid re-shingling."""
    if sets is None:
        sets = shingle_sets(df, text_col, id_col, shingle_n)
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    # try_divide: an empty shingle set yields NULL scores (a plain 0/0
    # is NaN, which compares GREATER than any threshold in Spark and
    # would sail through the filter below)
    out = (
        candidates.join(
            sets.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a"
        )
        .join(sets.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn("containment_a", F.try_divide(inter, F.size("sh_a")))
        .withColumn("containment_b", F.try_divide(inter, F.size("sh_b")))
        .withColumn(
            "jaccard",
            F.try_divide(inter, F.size(F.array_union("sh_a", "sh_b"))),
        )
        .select("id_a", "id_b", "containment_a", "containment_b", "jaccard")
    )
    if threshold > 0.0:
        out = out.where(
            (F.col("containment_a") >= threshold)
            | (F.col("containment_b") >= threshold)
        )
    return out


def edit_verify(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int | None = None,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact Levenshtein verification on candidate pairs → (id_a, id_b,
    lev, edit_sim): lev is the character edit distance between the two
    texts, edit_sim = 1 − lev/max(len_a, len_b) ∈ [0, 1] (1 =
    identical; lengths are of the COMPARED strings — see max_chars).
    The character-level near-dup verifier, complementing the set-based
    :func:`jaccard_verify` (shingle Jaccard is order-insensitive and
    misses small in-place edits scattered through a doc; edit distance
    counts every one). ``threshold`` keeps pairs with edit_sim ≥ it;
    NULL edit_sim (two empty texts) is dropped by any threshold > 0.

    ``max_chars`` caps the comparison at each text's first max_chars
    characters — Levenshtein is O(len²) PER PAIR, so at corpus scale
    set a cap (or rely on the candidate generator's length blocking):
    the pair list must already be LSH/shingle-bounded upstream; this
    function never generates pairs.

    Plan: two equi-joins of the (bounded) pair table against the text
    table, then one JVM ``levenshtein`` expression per pair — no
    Python, no blow-up beyond |candidates|."""
    t = F.col(text_col)
    if max_chars is not None:
        if max_chars < 1:
            raise ValueError(f"max_chars must be >= 1, got {max_chars}")
        t = F.substring(t, 1, max_chars)
    texts = df.select(F.col(id_col).alias("_id"), t.alias("_t"))
    out = (
        candidates.select("id_a", "id_b")
        .join(texts.withColumnsRenamed({"_id": "id_a", "_t": "_ta"}), "id_a")
        .join(texts.withColumnsRenamed({"_id": "id_b", "_t": "_tb"}), "id_b")
        .withColumn("lev", F.levenshtein("_ta", "_tb").cast("long"))
        .withColumn(
            "edit_sim",
            1.0
            - F.try_divide(
                F.col("lev").cast("double"),
                F.greatest(F.length("_ta"), F.length("_tb")).cast("double"),
            ),
        )
        .select("id_a", "id_b", "lev", "edit_sim")
    )
    if threshold > 0.0:
        out = out.where(F.col("edit_sim") >= threshold)
    return out


def dedup_exact_incremental(
    new_df: DataFrame,
    existing_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Incremental-ingest exact dedup: keep the NEW documents whose
    content digest appears nowhere in the EXISTING corpus and is unique
    within the new batch itself (first id wins inside the batch) — the
    everyday shape of a growing training corpus, where re-deduplicating
    100 TB to admit a 100 GB crawl increment is not an option.

    Plan: digest both sides row-locally (same normalization as
    :func:`dedup_exact` so results compose), LEFT ANTI join the new
    batch against existing digests — the existing side ships ONLY its
    digest column (one narrow scan of a corpus-resident column, no text
    movement), then the in-batch keep-first resolves on the survivors
    only."""

    def digest(frame):
        return frame.withColumn(
            "_dig", content_digest(F.col(text_col), normalize=normalize)
        )

    old = digest(existing_df).select("_dig").distinct()
    fresh = digest(new_df).join(old, "_dig", "left_anti")
    first = fresh.groupBy("_dig").agg(F.min(id_col).alias(id_col))
    return fresh.join(first, ["_dig", id_col]).drop("_dig")


def minhash_cross_candidates(
    new_sigs: DataFrame,
    existing_sigs: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    rows_per_band: int = 4,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    num_hashes: int | None = None,
    broadcast_new: bool | None = None,
) -> DataFrame:
    """Cross-corpus LSH candidates → (id_new, id_old): band-hash join of
    a NEW batch's signatures against the EXISTING corpus's — the
    near-dup half of incremental ingest (verify with
    :func:`jaccard_verify`/:func:`containment_verify` against the union
    corpus). Unlike the self-join path there is no id ordering between
    the sides; both directions of near-duplication surface as the same
    row. The existing side's banded table is a build-once artifact at
    scale — persist it keyed by (band, bh) and each increment pays only
    its own banding plus the bucket join.

    ``broadcast_new=True`` ships the fresh batch's banded table to every
    executor so the EXISTING corpus's banded table is probed in place —
    zero shuffle of the big side, which is the whole point of incremental
    ingest (an increment is small relative to the corpus by
    construction). The default is ``None`` = no forced hint: Catalyst /
    AQE pick the strategy from size estimates, which is the safe default
    for this GENERAL entry point — a bulk backfill's "new" side is
    bands × new-docs rows and force-broadcasting it OOMs executors. The
    ingest wrapper :func:`dedup_minhash_cross`, whose contract is
    small-increment-vs-corpus, passes ``True`` explicitly. ``False``
    never broadcasts (always the (band, bh) hash exchange)."""
    _validate_bands(bands, rows_per_band, num_hashes)
    nb = _banded(new_sigs, id_col, "id_new", bands, rows_per_band, hash_fn)
    ob = _banded(existing_sigs, id_col, "id_old", bands, rows_per_band,
                 hash_fn)
    if max_bucket_size is not None:
        ob = cap_bucket_size(ob, ["band", "bh"], max_bucket_size)
    if broadcast_new:
        nb = F.broadcast(nb)
    return (
        nb.join(ob, ["band", "bh"])
        .select("id_new", "id_old")
        .distinct()
    )


def dedup_minhash_cross(
    new_df: DataFrame,
    existing_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    hash_fn: str = "xxhash64",
    max_bucket_size: int | None = None,
    broadcast_new: bool = True,
    new_sets: DataFrame | None = None,
    old_sets: DataFrame | None = None,
    cache_registry: list | None = None,
) -> DataFrame:
    """Incremental-ingest NEAR-dup: verified ``(id_new, id_old, jaccard)``
    pairs between a fresh batch and the existing corpus — the MinHash
    analog of :func:`dedup_exact_incremental` (Lee et al. 2021 applied at
    ingest time rather than corpus-wide). Signatures → cross-corpus band
    join (:func:`minhash_cross_candidates`) → exact Jaccard on candidates
    only. Anti-join the result's ``id_new`` against the batch to admit
    only genuinely novel documents. ``broadcast_new`` defaults True HERE
    (unlike the general :func:`minhash_cross_candidates` entry point)
    because this wrapper's contract is ingest: the increment is small
    relative to the corpus by construction; pass ``False`` for bulk
    backfills.

    Scale shape: the existing side's banded table is a build-once
    artifact — persist it keyed by (band, bh) and each increment pays
    only its OWN shingling/banding plus the bucket join; the existing
    corpus's text is never re-read (the verify join ships shingle sets,
    which callers should persist alongside).

    Cache ownership: the shingle-set tables feed both the signature and
    the verify sides, so they are persisted. Pass ``new_sets`` /
    ``old_sets`` (schema ``(id, sh)``, from :func:`shingle_sets` — the
    old side's is a build-once artifact like the banded table) to own
    their lifecycle yourself; when omitted, this function persists two
    session-lifetime cached tables per call — repeated ingest loops
    should pass their own, collect handles via ``cache_registry`` (every
    internally-persisted frame is appended for the caller to unpersist),
    or ``spark.catalog.clearCache()`` between increments."""
    if new_sets is None:
        new_sets = shingle_sets(new_df, text_col, id_col, shingle_n).persist()
        if cache_registry is not None:
            cache_registry.append(new_sets)
    if old_sets is None:
        old_sets = shingle_sets(existing_df, text_col, id_col, shingle_n).persist()
        if cache_registry is not None:
            cache_registry.append(old_sets)
    sig_new = minhash_signatures_from_sets(
        new_sets.withColumnRenamed("id", id_col), id_col, num_hashes,
        hash_fn=hash_fn,
    )
    sig_old = minhash_signatures_from_sets(
        old_sets.withColumnRenamed("id", id_col), id_col, num_hashes,
        hash_fn=hash_fn,
    )
    if bands < 1 or num_hashes < bands:
        raise ValueError(f"need 1 <= bands ({bands}) <= num_hashes ({num_hashes})")
    cand = minhash_cross_candidates(
        sig_new, sig_old, id_col, bands, num_hashes // bands,
        hash_fn=hash_fn, max_bucket_size=max_bucket_size,
        num_hashes=num_hashes, broadcast_new=broadcast_new,
    )
    return _jaccard_join(
        cand, new_sets, old_sets, "id_new", "id_old", threshold
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.9,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Corpus-wide containment pairs straight from the shingle inverted
    index → (id_a, id_b, containment_a, containment_b, jaccard), keeping
    pairs where EITHER direction reaches ``threshold``.

    Unlike :func:`containment_verify` (which joins full shingle ARRAYS
    onto an externally supplied candidate list — right when LSH has
    already cut candidates to a sliver), this computes the intersection
    as a COUNT over the inverted-index self-join: the pair stream carries
    (id_a, id_b, 1)-shaped rows with map-side combine, never a
    document's whole shingle set — the same plan shape as the n-gram
    Jaccard pipeline, so corpus-wide scans stay narrow. Pair with
    ``cap_bucket_size`` on the shingle key for corpora with viral
    shingles."""
    if sets is None:
        sets = shingle_sets(df, text_col, id_col, shingle_n)
    ex = sets.select("id", F.explode("sh").alias("_s"))
    inter = (
        ex.alias("a")
        .join(ex.alias("b"), "_s")
        .where(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").cast("double").alias("_i"))
    )
    sizes = sets.select("id", F.size("sh").alias("_n"))
    return (
        inter.join(sizes.withColumnsRenamed({"id": "id_a", "_n": "_na"}), "id_a")
        .join(sizes.withColumnsRenamed({"id": "id_b", "_n": "_nb"}), "id_b")
        .withColumn("containment_a", F.col("_i") / F.col("_na"))
        .withColumn("containment_b", F.col("_i") / F.col("_nb"))
        .withColumn(
            "jaccard", F.col("_i") / (F.col("_na") + F.col("_nb") - F.col("_i"))
        )
        .where(
            (F.col("containment_a") >= float(threshold))
            | (F.col("containment_b") >= float(threshold))
        )
        .select("id_a", "id_b", "containment_a", "containment_b", "jaccard")
    )


def ngram_novelty(
    new_df: DataFrame,
    ref_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty vs a reference corpus → (id,
    n_shingles, n_novel, novelty): the fraction of a document's DISTINCT
    word n-grams that appear NOWHERE in the reference — the standard
    "how much new text does this crawl snapshot add" score (the
    continuous companion of :func:`decontaminate_exact`'s binary flag,
    and of :func:`dedup_minhash_cross`'s pair view). Documents with no
    shingles (shorter than n words) emit NULL novelty.

    Plan: explode the new side's distinct-shingle sets, LEFT join the
    reference's DISTINCT shingle vocabulary on the shingle hash (one
    shuffle each side — vocabulary-scale, not corpus-scale, after the
    distinct), one per-doc aggregate. No pairs anywhere, so it scales in
    both corpus axes; the reference vocabulary is reusable — persist it
    across increments like the banded dedup artifact."""
    new_sh = (
        shingle_sets(new_df, text_col, id_col, shingle_n)
        .select("id", F.explode_outer("sh").alias("_sh"))
    )
    ref_vocab = (
        shingle_sets(ref_df, text_col, id_col, shingle_n)
        .select(F.explode("sh").alias("_sh"))
        .distinct()
        .withColumn("_seen", F.lit(1))
    )
    joined = new_sh.join(ref_vocab, "_sh", "left")
    return (
        joined.groupBy("id")
        .agg(
            F.count("_sh").alias("n_shingles"),
            F.coalesce(
                F.sum(F.when(F.col("_seen").isNull()
                             & F.col("_sh").isNotNull(), 1)),
                F.lit(0),
            ).alias("n_novel"),
        )
        .withColumn(
            "novelty",
            F.try_divide(
                F.col("n_novel").cast("double"),
                F.col("n_shingles").cast("double"),
            ),
        )
    )


def dup_cluster_stats(
    docs: DataFrame,
    components: DataFrame,
    id_col: str = "doc_id",
    component_col: str = "component",
) -> DataFrame:
    """Corpus-level duplicate-cluster report → ONE row (n_docs,
    n_clustered, n_clusters, n_removable, dup_frac, max_cluster,
    mean_cluster): how much of the corpus sits in near-dup clusters
    (``components`` = :func:`connected_components` output, which holds
    only docs that appeared in a pair — singletons are implicitly
    clean), how many docs a keep-one-per-cluster dedup would REMOVE
    (n_clustered − n_clusters), that as a fraction of the corpus, and
    the cluster-size extremes. The one-line health number every dedup
    run should log before anyone ships the survivor set.

    Plan: one groupBy(component) over the (small) components table +
    one global aggregate + a 1-row corpus-count broadcast — the raw
    corpus is scanned once, for its count only."""
    sizes = components.groupBy(component_col).agg(
        F.count(F.lit(1)).alias("_sz")
    )
    agg = sizes.agg(
        F.coalesce(F.sum("_sz"), F.lit(0)).alias("n_clustered"),
        F.count(F.lit(1)).alias("n_clusters"),
        F.coalesce(F.max("_sz"), F.lit(0)).alias("max_cluster"),
        F.avg("_sz").alias("mean_cluster"),
    )
    total = docs.agg(F.count(id_col).alias("n_docs"))
    return agg.join(F.broadcast(total)).select(
        "n_docs", "n_clustered", "n_clusters",
        (F.col("n_clustered") - F.col("n_clusters")).alias("n_removable"),
        F.try_divide(
            (F.col("n_clustered") - F.col("n_clusters")).cast("double"),
            F.col("n_docs").cast("double"),
        ).alias("dup_frac"),
        "max_cluster", "mean_cluster",
    )


def dedup_sweep(
    pairs: DataFrame,
    n_docs: int | DataFrame,
    thresholds: list[float] = (0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9),
    sim_col: str = "jaccard",
) -> DataFrame:
    """Threshold-sweep planning curve over a scored candidate-pair
    table → one row per threshold τ: (threshold, n_pairs,
    n_docs_flagged, flagged_frac). Before COMMITTING to a dedup
    threshold, a pipeline owner wants "how much would each τ remove"
    in one pass — this computes, for every τ, the surviving pair count
    and the documents a keep-first greedy would drop (every doc that
    appears as the LARGER id in some pair with sim ≥ τ — the
    :func:`keep_cluster_representatives` min-id convention applied
    pairwise; an upper bound on transitive-closure removal is the
    pair count, a lower bound this greedy count, stated).

    ``pairs`` must already be candidate-bounded (LSH/shingle-banded —
    this function NEVER generates pairs); ``n_docs`` is the corpus
    size (an int, or a 1-column 1-row DataFrame to keep it lazy).

    Plan: one |thresholds|-way explode of the bounded pair table +
    one groupBy(threshold) with a distinct-count — tiny."""
    ths = sorted(set(float(t) for t in thresholds))
    if not ths:
        raise ValueError("thresholds must be non-empty")
    e = pairs.select(
        F.col("id_a"), F.col("id_b"), F.col(sim_col).alias("_s")
    ).withColumn(
        "threshold", F.explode(F.array(*[F.lit(t) for t in ths]))
    ).where(F.col("_s") >= F.col("threshold"))
    g = e.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("id_b").alias("n_docs_flagged"),
    )
    if isinstance(n_docs, DataFrame):
        nd = n_docs.toDF("_nd")
        g = g.crossJoin(F.broadcast(nd))
    else:
        g = g.withColumn("_nd", F.lit(int(n_docs)))
    return g.select(
        "threshold", "n_pairs", "n_docs_flagged",
        (
            F.col("n_docs_flagged").cast("double")
            / F.col("_nd").cast("double")
        ).alias("flagged_frac"),
    )


def select_canonical(
    df: DataFrame,
    pairs: DataFrame,
    quality: Column,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Quality-based survivor selection per duplicate cluster → one row
    per INPUT document: (id, component, quality, canonical_id,
    is_canonical). The curation-grade upgrade of
    :func:`keep_cluster_representatives`: instead of the arbitrary
    min-id survivor, each connected component keeps its HIGHEST-
    ``quality`` member (ties → smallest id, stated) — "of these five
    near-identical crawls, keep the longest/cleanest one", the policy
    every pretraining dedup pipeline actually wants. Documents in no
    pair form singleton components (their own canonical). ``quality``
    is any Column over ``df`` (length, a :func:`~.text.quality_score`
    output, a model score...).

    Plan: min-label-propagation components (the bounded-iteration
    ``connected_components`` path with its localCheckpoint lineage
    cut), one left join of the component labels onto the corpus, one
    per-component rank window — the window partitions by component,
    whose cardinality is the document count at worst."""
    comp = connected_components(pairs, id_a, id_b)
    labels = comp.select(
        F.col("id").alias(id_col), "component"
    ).localCheckpoint(eager=True)
    comp.unpersist()
    d = (
        df.select(F.col(id_col), quality.alias("quality"))
        .join(labels, id_col, "left")
        .withColumn(
            "component", F.coalesce(F.col("component"), F.col(id_col))
        )
    )
    w = Window.partitionBy("component").orderBy(
        F.desc("quality"), F.asc(id_col)
    )
    d = d.withColumn("canonical_id", F.first(F.col(id_col)).over(w))
    return d.select(
        id_col, "component", "quality", "canonical_id",
        (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
    )


def source_dup_matrix(
    pairs: DataFrame,
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    sim_col: str | None = "jaccard",
) -> DataFrame:
    """Cross-source duplicate flow → one row per unordered source pair:
    (source_a ≤ source_b, n_pairs[, avg_sim]). Labels each near-dup
    pair with both members' corpus sources and counts the traffic —
    the dataset-curation diagnostic that separates "crawl A mirrors
    crawl B" (big off-diagonal) from "source C re-posts itself" (big
    diagonal), which decide whether to drop a SOURCE versus dedup
    within it. Source pairs are sorted lexicographically (pair order
    id_a < id_b says nothing about sources).

    Plan: two id-joins of the (bounded, post-threshold) pair table
    against the (id, source) projection, one groupBy over the
    source×source grid (k² bounded). The pair table is the expensive
    input and is already built by the dedup pipeline — this adds no
    new corpus scan beyond the projection."""
    a = docs.select(
        F.col(id_col).alias(id_a_name := "id_a"),
        F.col(source_col).alias("_sa"),
    )
    b = docs.select(
        F.col(id_col).alias("id_b"), F.col(source_col).alias("_sb")
    )
    j = pairs.join(a, id_a_name).join(b, "id_b")
    aggs = [F.count(F.lit(1)).alias("n_pairs")]
    if sim_col is not None:
        aggs.append(F.avg(F.col(sim_col)).alias("avg_sim"))
    return j.groupBy(
        F.least("_sa", "_sb").alias("source_a"),
        F.greatest("_sa", "_sb").alias("source_b"),
    ).agg(*aggs)
