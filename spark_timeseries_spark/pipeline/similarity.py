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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import cosine, dot_product, embedding_lsh_signature, l2_norm


def _pair_cosine(left_vec, left_norm, right_vec, right_norm):
    """Cosine for a joined pair from PRE-FOLDED per-side norms: identical
    expressions to :func:`~.dedup.cosine` (dot, then left·right norm
    product), but each side's norm is folded once per ROW before the join
    instead of once per PAIR after it — 3 array folds per pair down to 1."""
    return F.try_divide(
        dot_product(left_vec, right_vec), left_norm * right_norm
    )


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _ranked(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "vec_id", "sim", "rank")
    )


def blocked_all_pairs_cosine(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    num_blocks: int = 8,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via blocked BLAS matrix products.

    Vectors are hashed into ``num_blocks`` blocks; each of the
    ``num_blocks·(num_blocks+1)/2`` block pairs becomes one Arrow batch whose
    pandas stage computes a single normalized matrix product ``A·Bᵀ``. This
    replaces the n²·d interpreted array-fold of a naive self-join (measured
    ~60 s for 2k×2k×64 at sf0.1) with vectorized numpy (<1 s), while keeping
    the work distributed: block pairs are embarrassingly parallel tasks.

    At scale, pick ``num_blocks ≈ n·d·8B / (task memory budget)`` so one
    block pair fits in executor memory; the task count grows quadratically
    but each task is a dense GEMM — the canonical blocked all-pairs design.
    Returns (id_a, id_b, cosine) with id_a < id_b, cosine unrounded.

    Ids must be INTEGRAL: the GEMM stage packs them into int64 numpy
    arrays and the id_a < id_b canonicalization is numeric. Checked
    eagerly — string ids would otherwise die deep inside an Arrow worker
    with an opaque np.fromiter traceback.
    """
    id_type = dict(df.dtypes)[id_col]
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"blocked_all_pairs_cosine needs an integral {id_col!r} "
            f"(got {id_type}); map string ids to a surrogate long first"
        )
    e = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string")), F.lit(num_blocks))
        .cast("int")
        .alias("blk"),
    )
    blocks = e.groupBy("blk").agg(
        F.collect_list(F.struct("id", "v")).alias("items")
    )
    pairs = (
        blocks.select(F.col("blk").alias("blk_a"), F.col("items").alias("items_a"))
        .join(
            blocks.select(
                F.col("blk").alias("blk_b"), F.col("items").alias("items_b")
            ),
            F.col("blk_a") <= F.col("blk_b"),
        )
        # one block pair per task: the GEMM is the unit of parallelism
        .repartition(num_blocks * (num_blocks + 1) // 2, "blk_a", "blk_b")
    )

    def compute(batches):
        for pdf in batches:
            ids_a, ids_b, sims = [], [], []
            for row in pdf.itertuples(index=False):
                ia = np.fromiter((x["id"] for x in row.items_a), dtype=np.int64)
                A = np.vstack([np.asarray(x["v"], dtype=np.float64) for x in row.items_a])
                A /= np.linalg.norm(A, axis=1, keepdims=True)
                if row.blk_a == row.blk_b:
                    ib, B = ia, A
                else:
                    ib = np.fromiter((x["id"] for x in row.items_b), dtype=np.int64)
                    B = np.vstack(
                        [np.asarray(x["v"], dtype=np.float64) for x in row.items_b]
                    )
                    B /= np.linalg.norm(B, axis=1, keepdims=True)
                G = A @ B.T
                ii, jj = np.nonzero(G >= threshold)
                lo, hi = ia[ii], ib[jj]
                keep = lo < hi if row.blk_a == row.blk_b else lo != hi
                g = G[ii[keep], jj[keep]]
                lo, hi = lo[keep], hi[keep]
                ids_a.append(np.minimum(lo, hi))
                ids_b.append(np.maximum(lo, hi))
                sims.append(g)
            if ids_a:
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(ids_a),
                        "id_b": np.concatenate(ids_b),
                        "cosine": np.concatenate(sims),
                    }
                )

    return pairs.mapInPandas(compute, "id_a long, id_b long, cosine double")


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
    ).withColumn("_nv", l2_norm(F.col("v")))
    q = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("_nq", l2_norm(F.col("qv")))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .where(F.col("qid") != F.col("vec_id"))
        .withColumn(
            "sim",
            _pair_cosine(F.col("qv"), F.col("_nq"), F.col("v"), F.col("_nv")),
        )
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
    c = c.withColumn("_nv", l2_norm(F.col("v")))
    q = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    q = q.withColumn("_sig", embedding_lsh_signature(F.col("qv"), dim, n_planes, seed))
    q = q.withColumn("_nq", l2_norm(F.col("qv")))
    if multiprobe:
        probes = F.array(
            F.col("_sig"),
            *[
                F.col("_sig").bitwiseXOR(F.lit(1 << i)).cast("long")
                for i in range(n_planes)
            ],
        )
        q = q.select("qid", "qv", "_nq", F.explode(probes).alias("bucket"))
    else:
        q = q.select("qid", "qv", "_nq", F.col("_sig").alias("bucket"))
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .where(F.col("qid") != F.col("vec_id"))
        .withColumn(
            "sim",
            _pair_cosine(F.col("qv"), F.col("_nq"), F.col("v"), F.col("_nv")),
        )
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
    """IVF-flat: centroids = deterministic corpus sample (ids hashed with the
    cross-engine md5-based hash so the DuckDB oracle reproduces the same
    sample; at scale, swap in a trained k-means without changing the plan
    shape); every vector is assigned to its nearest centroid (broadcast
    join); queries scan only the ``nprobe`` nearest inverted lists."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    cents = _sampled_centroids(c, n_centroids)
    assigned = _ivf_assign(c, cents)
    q = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    q_probe = (
        F.broadcast(q.withColumn("_nq", l2_norm(F.col("qv"))))
        .crossJoin(F.broadcast(cents.withColumn("_nc", l2_norm(F.col("cv")))))
        .withColumn(
            "_d",
            _pair_cosine(F.col("qv"), F.col("_nq"), F.col("cv"), F.col("_nc")),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("_d"), F.asc("cid"))
            ),
        )
        .where(F.col("_rk") <= nprobe)
        .select("qid", "qv", "_nq", "cid")
    )
    scored = (
        q_probe.join(assigned.withColumn("_nv", l2_norm(F.col("v"))), "cid")
        .where(F.col("qid") != F.col("vec_id"))
        .withColumn(
            "sim",
            _pair_cosine(F.col("qv"), F.col("_nq"), F.col("v"), F.col("_nv")),
        )
        .select("qid", "vec_id", "sim")
        .distinct()
    )
    return _ranked(scored, k)


def _sampled_centroids(c: DataFrame, n_centroids: int) -> DataFrame:
    """Deterministic corpus sample as centroids — the cross-engine-stable
    init shared by ivf_topk / ivf_build / ivfpq_topk (swap in
    clustering.kmeans_fit centroids for trained quality; the plan shape
    is identical). Selection is the n smallest id-hashes via
    ``orderBy(...).limit(n)`` — TakeOrderedAndProject, per-partition
    top-k with only n rows reaching the driver-side merge; the cid
    numbering window then sorts ONLY the ≤n survivors (a bare
    ``row_number over orderBy(hash)`` here funneled the whole corpus
    through one window partition)."""
    from spark_timeseries_spark.functions import hash60

    top = (
        c.select("v", hash60(F.col("vec_id").cast("string")).alias("_h"))
        .orderBy("_h")
        .limit(n_centroids)
    )
    w = Window.orderBy("_h")
    return top.select(
        F.row_number().over(w).alias("cid"), F.col("v").alias("cv")
    )


def _ivf_assign(c: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest centroid by cosine, ties to the lowest cid →
    (vec_id, v, cid) — the single assignment implementation behind
    ivf_topk and ivf_build (one copy, so the inline and persisted paths
    cannot drift)."""
    return (
        c.withColumn("_nv", l2_norm(F.col("v")))
        .crossJoin(F.broadcast(cents.withColumn("_nc", l2_norm(F.col("cv")))))
        .withColumn(
            "_d",
            _pair_cosine(F.col("v"), F.col("_nv"), F.col("cv"), F.col("_nc")),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("_d"), F.asc("cid"))
            ),
        )
        .where(F.col("_rk") == 1)
        .select("vec_id", "v", "cid")
    )


def ivf_build(
    corpus: DataFrame,
    path: str,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cents: DataFrame | None = None,
) -> None:
    """Materialize an IVF-flat index for build-once / probe-many serving:
    ``{path}/centroids`` (cid, cv — k rows) and ``{path}/lists`` — the
    corpus vectors partitioned BY CID on disk. Probing then reads only the
    probed lists' files: the centroid join is broadcast, and Spark's
    dynamic partition pruning (plus the parquet cid= directory layout)
    keeps the scan at ~nprobe/k of the corpus instead of all of it. At
    100 TB this is the difference between an ANN query costing a corpus
    scan and costing a few partitions.

    Pass ``cents`` (cid, cv) to index under trained k-means centroids
    (:func:`clustering.kmeans_fit`); the default is the deterministic
    hash-sample init shared with :func:`ivf_topk`."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
    )
    if cents is None:
        # materialize the tiny centroid table once (k×dim doubles on the
        # driver, the same bound as a k-means model) — it feeds both the
        # centroids write and the assignment, which would otherwise each
        # recompute the corpus-wide sample
        rows = _sampled_centroids(c, n_centroids).collect()
        cents = corpus.sparkSession.createDataFrame(
            [(r.cid, list(r.cv)) for r in rows], "cid int, cv array<double>"
        )
    assigned = _ivf_assign(c, cents)
    cents.write.mode("overwrite").parquet(path + "/centroids")
    assigned.write.mode("overwrite").partitionBy("cid").parquet(path + "/lists")


def ivf_probe(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Top-k against a persisted :func:`ivf_build` index. The centroid
    table (k rows) broadcasts; each query picks its ``nprobe`` nearest
    lists; the inverted-list scan joins on the PARTITION column, so only
    the probed cid= directories are read."""
    cents = spark.read.parquet(path + "/centroids")
    lists = spark.read.parquet(path + "/lists")
    q = queries.select(
        F.col(query_id_col).alias("qid"), _as_double(F.col(vec_col)).alias("qv")
    )
    q_probe = (
        F.broadcast(q.withColumn("_nq", l2_norm(F.col("qv"))))
        .crossJoin(F.broadcast(cents.withColumn("_nc", l2_norm(F.col("cv")))))
        .withColumn(
            "_d",
            _pair_cosine(F.col("qv"), F.col("_nq"), F.col("cv"), F.col("_nc")),
        )
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("_d"), F.asc("cid"))
            ),
        )
        .where(F.col("_rk") <= nprobe)
        .select("qid", "qv", "_nq", "cid")
    )
    # the on-disk list format is unchanged — the norm is folded once per
    # list row after the read, not stored
    scored = (
        q_probe.join(lists.withColumn("_nv", l2_norm(F.col("v"))), "cid")
        .where(F.col("qid") != F.col("vec_id"))
        .withColumn(
            "sim",
            _pair_cosine(F.col("qv"), F.col("_nq"), F.col("v"), F.col("_nv")),
        )
        .select("qid", "vec_id", "sim")
        .distinct()
    )
    return _ranked(scored, k)


def prefix_dim_recall(
    corpus: DataFrame,
    queries: DataFrame,
    dims: list[int],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "vec_id",
) -> DataFrame:
    """Matryoshka-style truncation quality → one row per prefix
    dimension: (dim, n_queries, recall) — the fraction of each query's
    FULL-dimension exact top-k that survives when both sides are
    truncated to the first ``dim`` coordinates (averaged over queries).
    THE go/no-go table for serving shorter vectors: if recall@k at
    dim=32 is 0.95, the index can store a quarter of the floats.
    Cosine over prefixes, ties by id (the :func:`brute_force_topk`
    determinism convention).

    Plan: |dims|+1 broadcast-queries × corpus scored passes (each the
    brute_force_topk shape — the small side broadcast, rank window per
    query), one equi-join per dim on (qid, vec_id) against the
    full-dim top-k, one aggregate per dim, one union of |dims|
    single-row results. Corpus is scanned |dims|+1 times — at real
    scale cache/checkpoint the normalized corpus once (stated)."""
    if not dims:
        raise ValueError("dims must be non-empty")
    if any(d < 1 for d in dims):
        raise ValueError(f"dims must be positive, got {dims}")
    full = brute_force_topk(
        corpus, queries, k=k, vec_col=vec_col,
        id_col=id_col, query_id_col=query_id_col,
    ).select("qid", "vec_id")
    outs = []
    for d in sorted(dims):
        ctrunc = corpus.withColumn("_pv", F.slice(F.col(vec_col), 1, d))
        qtrunc = queries.withColumn("_pv", F.slice(F.col(vec_col), 1, d))
        got = brute_force_topk(
            ctrunc, qtrunc, k=k, vec_col="_pv",
            id_col=id_col, query_id_col=query_id_col,
        ).select("qid", "vec_id")
        hit = got.join(full, ["qid", "vec_id"]).groupBy("qid").agg(
            F.count(F.lit(1)).alias("_h")
        )
        nq = queries.select(F.col(query_id_col).alias("qid")).distinct()
        per_q = nq.join(hit, "qid", "left").select(
            F.coalesce("_h", F.lit(0)).alias("_h")
        )
        outs.append(
            per_q.agg(
                F.lit(d).alias("dim"),
                F.count(F.lit(1)).alias("n_queries"),
                (F.avg(F.col("_h").cast("double")) / k).alias("recall"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def ndcg_at_k(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Graded ranking quality of an approximate top-k against the
    exact top-k → one row per exact query: (qid, hits, dcg, ndcg).
    Relevance is position-derived from the ground truth — an item at
    exact rank r earns rel = k+1−r, anything outside the exact top-k
    earns 0 — so DCG = Σ relᵢ/log₂(i+1) over the APPROXIMATE
    positions i, and IDCG = Σ_{i=1..k} (k+1−i)/log₂(i+1) is a
    constant (Järvelin & Kekäläinen 2002). Unlike recall@k
    (:func:`~__spark_entry__._q_lsh_recall`'s metric) this rewards
    putting the best neighbors FIRST, not just anywhere in the top-k.
    Queries the index returned nothing for emit hits = 0, ndcg = 0.

    Both inputs are normalized before the join: ranks are truncated to
    ≤ k and duplicate (qid, id) rows collapse to their best (minimum)
    rank, so an over-long or duplicated approx table cannot accrue extra
    gain terms and push ndcg past 1 — the gain sum is bounded by the
    fixed IDCG over exactly k positions by construction.

    Plan: a per-query bounded join (both sides ≤ k rows per query) +
    one groupBy(qid); the query universe comes from the exact side so
    silent index misses can't drop rows."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    import math as _math

    idcg = sum((k + 1 - i) / _math.log2(i + 1) for i in range(1, k + 1))
    ar = F.col("_ar").cast("double")
    er = F.col("_er").cast("double")
    a_k = (
        approx.where(F.col(rank_col) <= k)
        .groupBy(qid_col, id_col)
        .agg(F.min(rank_col).alias("_ar"))
    )
    e_k = (
        exact.where(F.col(rank_col) <= k)
        .groupBy(qid_col, id_col)
        .agg(F.min(rank_col).alias("_er"))
    )
    j = a_k.join(e_k, [qid_col, id_col], "left")
    gain = F.when(
        F.col("_er").isNotNull(),
        (F.lit(float(k + 1)) - er) / F.log2(ar + 1.0),
    ).otherwise(F.lit(0.0))
    g = j.groupBy(qid_col).agg(
        F.count("_er").alias("hits"), F.sum(gain).alias("_dcg")
    )
    qids = exact.select(qid_col).distinct()
    return qids.join(g, qid_col, "left").select(
        qid_col,
        F.coalesce(F.col("hits"), F.lit(0)).cast("int").alias("hits"),
        F.coalesce(F.col("_dcg"), F.lit(0.0)).alias("dcg"),
        (
            F.coalesce(F.col("_dcg"), F.lit(0.0)) / F.lit(float(idcg))
        ).alias("ndcg"),
    )


def mrr_at_k(
    exact: DataFrame,
    approx: DataFrame,
    k: int,
    qid_col: str = "qid",
    id_col: str = "vec_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Mean-reciprocal-rank readout of an approximate top-k against
    the exact top-k → one row per exact query: (qid, first_rank, rr),
    where ``first_rank`` is the best approx position holding ANY
    exact-top-k item and rr = 1/first_rank (0 with NULL first_rank
    when the index returned no relevant item) — the "how fast do I
    hit something good" metric (Voorhees 1999 TREC QA), complementing
    :func:`ndcg_at_k` (full-list graded quality) and recall@k (set
    overlap, position-blind). Average rr downstream for the scalar
    MRR. Inputs are normalized exactly as in :func:`ndcg_at_k`:
    ranks truncated to ≤ k, duplicate (qid, id) rows collapse to
    their best rank, query universe from the exact side.

    Plan: per-query bounded join (both sides ≤ k rows per query) +
    one groupBy(qid) min — no Python, no data-sized broadcast."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    a_k = (
        approx.where(F.col(rank_col) <= k)
        .groupBy(qid_col, id_col)
        .agg(F.min(rank_col).alias("_ar"))
    )
    e_k = exact.where(F.col(rank_col) <= k).select(qid_col, id_col)
    hits = a_k.join(e_k, [qid_col, id_col]).groupBy(qid_col).agg(
        F.min("_ar").alias("first_rank")
    )
    qids = exact.select(qid_col).distinct()
    return qids.join(hits, qid_col, "left").select(
        qid_col,
        F.col("first_rank").cast("int").alias("first_rank"),
        F.coalesce(
            1.0 / F.col("first_rank").cast("double"), F.lit(0.0)
        ).alias("rr"),
    )
