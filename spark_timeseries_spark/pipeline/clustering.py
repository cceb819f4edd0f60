"""Distributed k-means over embedding columns + SemDeDup semantic dedup.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") deduplicates by meaning rather
than surface text: cluster the corpus's embeddings with k-means, then look
for high-cosine pairs ONLY within each cluster — the clustering turns the
O(N²) all-pairs comparison into k independent within-cluster problems.

Everything here is DataFrame ops on `array<double>` columns:

- **Assignment** ships the driver-held k×dim centroid matrix as LITERALS
  inside one row-local `array_min` argmin over `zip_with`/`aggregate`
  squared-L2 structs — cost O(N·k·dim), fully codegen, no Python, ZERO
  shuffles (the former broadcast-crossJoin + rank-window shape paid an
  exchange + sort of N·k rows per call).
- **Update** re-averages per (cluster, dimension) via posexplode — one
  shuffle of N·dim narrow rows with map-side partial aggregation.
- **Driver state** is exactly the k×dim centroid matrix per iteration
  (k·dim doubles — kilobytes), the same bounded-scalar pattern as
  `dedup.connected_components`'s per-round changed-count. Lloyd's algorithm
  is inherently iterative; the corpus itself is never collected.

At 100 TB: the assignment scan dominates and parallelizes perfectly; the
update shuffle carries (cid, dim, partial-sum) triples. For very large k,
swap the crossJoin argmin for an LSH/IVF pre-filter (same trick the search
path uses) without changing the update step. Init here is the k lowest-id
vectors (deterministic, oracle-replayable); production-scale init would use
k-means|| — the fit loop is unchanged.

No reference counterpart: sryza/spark-timeseries has no clustering surface.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_timeseries_spark.parallel import spread_rows
from spark_timeseries_spark.pipeline.dedup import dot_product, l2_norm

__all__ = ["KMeansModel", "kmeans_fit", "kmeans_assign", "semantic_dedup_pairs"]


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _as_double(vec):
    # twin of similarity._as_double (which uses a per-element transform);
    # both widen float→double exactly — kept separate so each module's
    # oracle-pinned plans stay byte-stable
    return vec.cast("array<double>")


@dataclass
class KMeansModel:
    """Fitted centroids as plain Python lists (k×dim — driver-small) plus
    the spark session to rebuild the broadcast frame on demand."""

    centroids: list[list[float]]
    n_iter: int

    def centroid_df(self, spark) -> DataFrame:
        rows = [(i, list(c)) for i, c in enumerate(self.centroids)]
        return spark.createDataFrame(rows, "cid int, cv array<double>")


def _lit_vec(c) -> "F.Column":
    """A centroid as a literal ARRAY<DOUBLE> column expression."""
    return F.array(*[F.lit(float(x)) for x in c])


def _dist_structs(v, centroids: list[list[float]]):
    """ARRAY<STRUCT<dist:double, cid:int>> of squared-L2 distances from
    ``v`` to every centroid (centroid list index = cid). The fold inside
    ``_sq_l2`` runs element-by-element exactly as the former broadcast
    crossJoin did, so the dist doubles are bit-identical."""
    return F.array(
        *[
            F.struct(
                _sq_l2(v, _lit_vec(c)).alias("dist"),
                F.lit(i).cast("int").alias("cid"),
            )
            for i, c in enumerate(centroids)
        ]
    )


def _assign(vecs: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """(vec_id, v, cid, dist): nearest centroid by squared L2; ties break
    to the smallest cid so assignment is deterministic.

    The centroids are a driver-held k×dim list (kilobytes), so they ship
    as LITERALS inside one row-local argmin expression — struct ordering
    is lexicographic (dist asc, cid asc), the exact order the former
    ``row_number`` window used. This replaces the broadcast crossJoin +
    rank-window assignment (which materialized N·k rows and paid an
    exchange + sort per call) with a narrow map: zero shuffles, zero
    broadcast, same values bit-for-bit."""
    near = F.array_min(_dist_structs(F.col("v"), centroids))
    return (
        vecs.withColumn("_n", near)
        .select(
            "vec_id", "v", F.col("_n.cid").alias("cid"),
            F.col("_n.dist").alias("dist"),
        )
    )


def kmeans_fit(
    df: DataFrame,
    k: int = 16,
    max_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> KMeansModel:
    """Lloyd's algorithm. Init = the ``k`` lowest-id vectors (deterministic
    and replayable; see module docstring for the scale-up init). Empty
    clusters keep their previous centroid. Each iteration materializes one
    k×dim centroid matrix on the driver — nothing else leaves the executors.
    """
    if k < 1 or max_iter < 1:
        raise ValueError("k and max_iter must be >= 1")
    spark = df.sparkSession
    vecs = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    # one materialization for the whole Lloyd loop: without it every
    # iteration's collect re-executes the full upstream lineage (decode /
    # UDF stages included) — max_iter+1 times
    vecs = vecs.persist()
    try:
        return _lloyd(spark, vecs, k, max_iter)
    finally:
        vecs.unpersist()


def _lloyd(spark, vecs, k, max_iter):
    # k lowest-id vectors via orderBy+limit (TakeOrderedAndProject — no
    # single-partition window over the whole corpus); the numbering
    # window then sorts only the k survivors
    init = (
        vecs.orderBy("vec_id")
        .limit(k)
        .withColumn(
            "_rn", F.row_number().over(Window.orderBy(F.asc("vec_id")))
        )
        .select((F.col("_rn") - 1).alias("cid"), F.col("v").alias("cv"))
    )
    centroids = {r.cid: list(r.cv) for r in init.collect()}
    if len(centroids) < k:
        raise ValueError(f"need at least k={k} vectors, got {len(centroids)}")

    for it in range(max_iter):
        new = (
            _assign(vecs, [centroids[c] for c in sorted(centroids)])
            .select("cid", F.posexplode("v").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(F.array_sort(F.collect_list(F.struct("i", "m"))).alias("_s"))
            .select("cid", F.col("_s.m").alias("cv"))
        )
        for r in new.collect():  # k rows — bounded driver transfer
            centroids[r.cid] = list(r.cv)
    return KMeansModel(
        centroids=[centroids[c] for c in sorted(centroids)], n_iter=max_iter
    )


def kmeans_assign(
    df: DataFrame,
    model: KMeansModel,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cid, dist) for every vector under the fitted model."""
    vecs = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    out = _assign(vecs, model.centroids)
    return out.select(F.col("vec_id").alias(id_col), "cid", "dist")


def semantic_dedup_pairs(
    df: DataFrame,
    model: KMeansModel,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster_size: int | None = None,
    n_subplanes: int = 4,
    seed: int = 42,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SemDeDup candidate pairs: (id_a, id_b, cid, sim) with id_a < id_b,
    cosine ≥ ``threshold``, compared ONLY within a shared k-means cluster.

    The self-join key is the cluster id, so the quadratic cost is per
    cluster, not per corpus — k partitions the problem. Feed the pairs to
    ``dedup.connected_components`` + ``keep_cluster_representatives`` to
    materialize the kept set (same composition as the MinHash path).

    Hot-cluster guard (both off by default — defaults reproduce the plain
    per-cluster join): a pathologically popular cluster re-concentrates
    the quadratic join, so

    - ``max_cluster_size`` SUB-SPLITS any cluster above the bound by a
      deterministic ``n_subplanes``-bit random-hyperplane signature
      (``dedup.embedding_lsh_signature`` — the cosine-LSH family, so
      high-cosine pairs mostly co-bucket); the join key becomes
      (cid, sub) and a size-B hot cluster pays ~B²/2^n_subplanes pairs
      instead of B². Recall is traded ONLY inside oversized clusters
      (pairs split across sub-buckets are missed), mirroring
      ``minhash_lsh_candidates``' banding trade.
    - ``max_bucket_size`` then HARD-CAPS (cid, sub) buckets via
      :func:`dedup.cap_bucket_size` — the worst-case bound for adversarial
      corpora (e.g. thousands of identical vectors, which no hyperplane
      can separate). Run ``dedup_exact`` first so identical documents are
      already gone, exactly as the MinHash path documents.

    The cluster-size count is a window over cid — the same partitioning
    the self-join shuffles on, so it rides the exchange the join pays."""
    from spark_timeseries_spark.pipeline.dedup import (
        cap_bucket_size,
        embedding_lsh_signature,
    )

    base = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    # the assignment feeds BOTH self-join sides; eager localCheckpoint
    # materializes it once and truncates the lineage (same pattern as
    # connected_components — blocks are freed when the frame is GC'd),
    # instead of running the literal-argmin over the corpus twice
    vecs = (
        _assign(base, model.centroids)
        .select("vec_id", "v", "cid")
        .localCheckpoint(eager=True)
    )
    keys = ["cid"]
    if max_cluster_size is not None:
        dim = len(model.centroids[0])
        wc = Window.partitionBy("cid")
        vecs = (
            vecs.withColumn("_csz", F.count("*").over(wc))
            .withColumn(
                "sub",
                F.when(
                    F.col("_csz") > int(max_cluster_size),
                    embedding_lsh_signature(
                        F.col("v"), dim, n_subplanes, seed
                    ),
                ).otherwise(F.lit(0).cast("long")),
            )
            .drop("_csz")
        )
        keys = ["cid", "sub"]
    if max_bucket_size is not None:
        # the hard cap applies with or without the sub-split — a caller
        # asking only for max_bucket_size must still get a bounded join
        vecs = cap_bucket_size(vecs, keys, max_bucket_size)
    # The self-join's stream side inherits the checkpoint's partitioning
    # (often ONE partition: a single-split scan through narrow ops), and
    # the broadcast hash join keeps it — so the quadratic cosine work
    # would run in one task. Spread rows cores-wide first (row-local, no
    # value change), and fold each vector's norm ONCE per row here rather
    # than re-folding both arrays per joined pair (identical expressions
    # per vector → identical values).
    vecs = spread_rows(vecs)
    left = vecs.select(
        *keys,
        F.col("vec_id").alias("id_a"),
        F.col("v").alias("va"),
        l2_norm(F.col("v")).alias("_na"),
    )
    right = vecs.select(
        *keys,
        F.col("vec_id").alias("id_b"),
        F.col("v").alias("vb"),
        l2_norm(F.col("v")).alias("_nb"),
    )
    return (
        left.join(right, keys)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "sim",
            F.try_divide(
                dot_product(F.col("va"), F.col("vb")),
                F.col("_na") * F.col("_nb"),
            ),
        )
        .where(F.col("sim") >= float(threshold))
        .select("id_a", "id_b", "cid", "sim")
    )


def silhouette_simplified(
    df: DataFrame,
    model: KMeansModel,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Simplified (centroid-based) silhouette per vector → (vec_id,
    cid, a_dist, b_dist, silhouette): a = Euclidean distance to the
    nearest centroid (the assignment, ties to the smallest cid — the
    :func:`kmeans_assign` convention), b = distance to the
    SECOND-nearest, s = (b − a)/max(a, b) (0 when both are 0 — the
    vector sits on two centroids at once). The medoid-free variant
    (Hruschka et al. 2004 "simplified silhouette"): the classic
    all-pairs silhouette is O(n²) per cluster; against centroids it is
    O(n·k) and broadcast-able, the only silhouette that scales to a
    100 TB corpus. Interpretation unchanged: s → 1 well-separated,
    s ≈ 0 boundary, s < 0 likely misassigned.

    Plan: the k×dim centroid matrix is driver-held, so the per-vector
    distances ship as one literal array_sort expression — nearest and
    second-nearest are elements 0/1 of the sorted (dist, cid) structs
    (lexicographic order = the dist-asc/cid-asc tie-break). Entirely
    row-local: zero joins, zero exchanges, no broadcast."""
    from spark_timeseries_spark.functions import let

    vecs = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )

    def _sil(pairs):
        one, two = F.get(pairs, F.lit(0)), F.get(pairs, F.lit(1))
        a = F.sqrt(one["dist"])
        b = F.sqrt(two["dist"])
        s = F.when(
            F.greatest(a, b) > 0,
            F.try_divide(b - a, F.greatest(a, b)),
        ).otherwise(F.lit(0.0))
        return F.struct(
            one["cid"].alias("cid"), a.alias("a_dist"), b.alias("b_dist"),
            s.alias("silhouette"),
        )

    out = vecs.withColumn(
        "_s",
        let(
            F.array_sort(_dist_structs(F.col("v"), model.centroids)), _sil
        ),
    )
    return out.select(
        F.col("vec_id").alias(id_col), "_s.cid", "_s.a_dist", "_s.b_dist",
        "_s.silhouette",
    )
