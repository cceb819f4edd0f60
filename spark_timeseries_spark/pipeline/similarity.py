"""Similarity search over embedding columns.

- :func:`brute_force_topk` — exact cosine top-k: query×corpus join with the
  corpus (or query) side broadcast, JVM-side fold for the dot product,
  ``row_number`` ranking. The correctness baseline.
- :func:`lsh_topk` — the scale path: random-hyperplane bucket signatures with
  multiprobe (flip each signature bit) so a query only joins its own and
  adjacent buckets — replaces the O(|Q|·|C|) cross join with a bucketed join
  whose fan-in is |C| / 2^planes per probe.
- :func:`ivf_topk` — IVF-style: a seeded deterministic sample of centroids,
  vectors assigned to nearest centroid (one broadcast join), queries probe
  the ``nprobe`` nearest centroid lists.

All variants return (qid, vec_id, sim, rank).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine, embedding_lsh_signature


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _ranked(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "vec_id", "sim", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors. Broadcast the smaller side (queries is usually
    tiny); exclude self-matches when ids collide."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("qid") != F.col("vec_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("v")))
    )
    return _ranked(scored, k)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    multiprobe: bool = True,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: join only on matching (multiprobed) hyperplane
    buckets. Recall grows with probes; cost stays |C|/2^planes per probe."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    c = c.withColumn("bucket", embedding_lsh_signature(F.col("v"), dim, n_planes, seed))
    q = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    q = q.withColumn("_sig", embedding_lsh_signature(F.col("qv"), dim, n_planes, seed))
    if multiprobe:
        probes = F.array(
            F.col("_sig"),
            *[
                F.col("_sig").bitwiseXOR(F.lit(1 << i)).cast("long")
                for i in range(n_planes)
            ],
        )
        q = q.select("qid", "qv", F.explode(probes).alias("bucket"))
    else:
        q = q.select("qid", "qv", F.col("_sig").alias("bucket"))
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("qid") != F.col("vec_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("v")))
        .select("qid", "vec_id", "sim")
        .distinct()
    )
    return _ranked(scored, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """IVF-flat: centroids = deterministic corpus sample (ids hashed; at
    scale, swap in a trained k-means without changing the plan shape);
    every vector is assigned to its nearest centroid (broadcast join);
    queries scan only the ``nprobe`` nearest inverted lists."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    w = Window.orderBy(F.xxhash64(F.col("vec_id").cast("string")))
    cents = (
        c.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n_centroids)
        .select(F.col("_rn").alias("cid"), F.col("v").alias("cv"))
    )

    assigned = (
        c.crossJoin(F.broadcast(cents))
        .withColumn("_d", cosine(F.col("v"), F.col("cv")))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("_d"), F.asc("cid"))
            ),
        )
        .where(F.col("_rk") == 1)
        .select("vec_id", "v", "cid")
    )
    q = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    q_probe = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .withColumn("_d", cosine(F.col("qv"), F.col("cv")))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("_d"), F.asc("cid"))
            ),
        )
        .where(F.col("_rk") <= nprobe)
        .select("qid", "qv", "cid")
    )
    scored = (
        q_probe.join(assigned, "cid")
        .where(F.col("qid") != F.col("vec_id"))
        .withColumn("sim", cosine(F.col("qv"), F.col("v")))
        .select("qid", "vec_id", "sim")
        .distinct()
    )
    return _ranked(scored, k)
