"""Distributed k-means over embedding columns + SemDeDup semantic dedup.

SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
web-scale through semantic deduplication") deduplicates by meaning rather
than surface text: cluster the corpus's embeddings with k-means, then look
for high-cosine pairs ONLY within each cluster — the clustering turns the
O(N²) all-pairs comparison into k independent within-cluster problems.

Everything here is DataFrame ops on `array<double>` columns:

- **Assignment** is a crossJoin against a broadcast centroid frame (k rows)
  with a `zip_with`/`aggregate` squared-L2 expression and a per-vector
  `row_number` argmin — the same shape `similarity.ivf_topk` pins. Cost
  O(N·k·dim), fully codegen, no Python.
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

from spark_timeseries_spark.pipeline.dedup import cosine

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


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, v, cid, dist): nearest centroid by squared L2; ties break
    to the smallest cid so assignment is deterministic."""
    w = Window.partitionBy("vec_id").orderBy(F.asc("dist"), F.asc("cid"))
    return (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("dist", _sq_l2(F.col("v"), F.col("cv")))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select("vec_id", "v", "cid", "dist")
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
        cents = spark.createDataFrame(
            sorted(centroids.items()), "cid int, cv array<double>"
        )
        new = (
            _assign(vecs, cents)
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
    out = _assign(vecs, model.centroid_df(df.sparkSession))
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
    # instead of running the crossJoin-argmin over the corpus twice
    vecs = (
        _assign(base, model.centroid_df(df.sparkSession))
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
    left = vecs.select(
        *keys, F.col("vec_id").alias("id_a"), F.col("v").alias("va")
    )
    right = vecs.select(
        *keys, F.col("vec_id").alias("id_b"), F.col("v").alias("vb")
    )
    return (
        left.join(right, keys)
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine(F.col("va"), F.col("vb")))
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

    Plan: broadcast crossJoin against the k×dim centroid table, one
    (vec_id) rank window + one groupBy on the SAME partitioning —
    a single data-sized exchange; k bounded."""
    vecs = df.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    cents = model.centroid_df(df.sparkSession)
    w = Window.partitionBy("vec_id").orderBy(F.asc("_sq"), F.asc("cid"))
    d = (
        vecs.crossJoin(F.broadcast(cents))
        .withColumn("_sq", _sq_l2(F.col("v"), F.col("cv")))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= 2)
    )
    top = d.groupBy("vec_id").agg(
        F.min(F.when(F.col("_rk") == 1, F.col("cid"))).alias("cid"),
        F.min(F.when(F.col("_rk") == 1, F.sqrt(F.col("_sq")))).alias(
            "a_dist"
        ),
        F.min(F.when(F.col("_rk") == 2, F.sqrt(F.col("_sq")))).alias(
            "b_dist"
        ),
    )
    a, b = F.col("a_dist"), F.col("b_dist")
    s = F.when(
        F.greatest(a, b) > 0,
        F.try_divide(b - a, F.greatest(a, b)),
    ).otherwise(F.lit(0.0))
    return top.select(
        F.col("vec_id").alias(id_col), "cid", "a_dist", "b_dist",
        s.alias("silhouette"),
    )
