"""Embedding-matrix analytics: distributed covariance and PCA.

The ANN stack (:mod:`similarity`, :mod:`pq`) benefits from decorrelated,
variance-balanced inputs — PQ in particular quantizes better after a
rotation that spreads energy across subspaces (the observation behind OPQ,
Ge et al. 2014; plain PCA is its standard cheap approximation). This module
keeps the heavy pass distributed and the tiny algebra on the driver:

- **Covariance** (:func:`embedding_covariance`): one Arrow-batched
  ``mapInPandas`` pass emits a single (n, Σx, XᵀX) moment partial per
  partition (numpy GEMM per Arrow batch — no per-row Python pickling,
  no dim²-per-row explode); partials reduce through one map-side-combined
  ``groupBy`` (1+d+d² groups total), so only the dim×dim result reaches
  the driver regardless of corpus size.
- **PCA fit** (:func:`pca_fit`): eigendecomposition of that covariance on
  the driver (numpy ``eigh`` — dim×dim, microseconds), eigenvectors
  sign-fixed (largest-|component| coordinate made positive) so the model
  is deterministic and replayable.
- **Projection** (:func:`pca_project`): k dot products per row as
  codegen'd ``zip_with``/``aggregate`` expressions over the literal
  component matrix — row-local, zero shuffles, zero Python, the same
  ship-the-model-as-literals pattern as PQ encoding.

No reference counterpart: sryza/spark-timeseries has no embedding surface.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PCAModel",
    "sq8_quantize",
    "embedding_covariance",
    "pca_fit",
    "pca_project",
    "embedding_dim_stats",
    "srp_lsh",
    "srp_candidates",
]


def _moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One flattened moment vector ``[n, Σx (d), XᵀX (d·d)]`` per
    partition, computed as a numpy GEMM over each Arrow batch — the
    whole corpus crosses into Python exactly once, in columnar batches
    (never per-row pickling), and each partition's output is a single
    (1+d+d²)-length array regardless of its row count."""
    import pandas as pd

    vdf = df.select(F.col(vec_col).cast("array<double>").alias("v"))

    def part(batches):
        n = 0
        s = g = None
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array(pdf["v"].tolist(), dtype=np.float64)
            n += x.shape[0]
            cs, cg = x.sum(axis=0), x.T @ x
            s = cs if s is None else s + cs
            g = cg if g is None else g + cg
        if n:
            yield pd.DataFrame(
                {"m": [[float(n), *s.tolist(), *g.ravel().tolist()]]}
            )

    return vdf.mapInPandas(part, "m array<double>")


def _moments(df: DataFrame, vec_col: str):
    """(n, Σx, XᵀX) of the embedding matrix. Partials reduce through one
    posexplode + map-side-combined groupBy (1+d+d² groups in total), so
    the driver receives ~d² scalars however many partitions fed in."""
    rows = (
        _moment_partials(df, vec_col)
        .select(F.posexplode("m").alias("k", "val"))
        .groupBy("k")
        .agg(F.sum("val").alias("val"))
        .collect()
    )
    if not rows:
        raise ValueError("empty input: no embedding rows")
    vals = {r["k"]: r["val"] for r in rows}
    n = int(vals[0])
    d = int(round((-1 + (1 + 4 * (len(vals) - 1)) ** 0.5) / 2))
    s = np.array([vals[1 + i] for i in range(d)])
    gram = np.array([vals[1 + d + i] for i in range(d * d)]).reshape(d, d)
    return n, s, gram


def _covariance(n: int, s: np.ndarray, gram: np.ndarray) -> np.ndarray:
    if n < 2:
        raise ValueError("need at least 2 rows for sample covariance")
    cov = (gram - np.outer(s, s) / n) / (n - 1)
    return (cov + cov.T) / 2.0  # enforce exact symmetry for eigh


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Sample covariance of the embedding matrix → (i, j, cov) rows,
    0-based coordinates, unbiased (n−1) normalization (matching
    ``covar_samp``). The distributed pass is the Arrow-batched moment
    aggregation of :func:`_moment_partials`; only the dim×dim result
    touches the driver."""
    n, s, gram = _moments(df, vec_col)
    cov = _covariance(n, s, gram)
    spark = df.sparkSession
    rows = [
        (i, j, float(cov[i, j]))
        for i in range(cov.shape[0])
        for j in range(cov.shape[1])
    ]
    return spark.createDataFrame(rows, "i int, j int, cov double")


@dataclass
class PCAModel:
    """k principal components (rows, each dim-length, unit-norm,
    sign-fixed) + per-component explained variance + the feature means
    used for centering."""

    components: list[list[float]]
    explained_variance: list[float]
    mean: list[float]

    @property
    def k(self) -> int:
        return len(self.components)


def pca_fit(df: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Top-k PCA from the distributed covariance: one Arrow-batched
    moment pass (covariance AND mean come from the same (n, Σx, XᵀX)
    partials — a single scan), ``numpy.linalg.eigh`` on the dim×dim
    matrix driver-side. Sign convention: each eigenvector's
    largest-|coordinate| entry is made positive — eigensolvers are
    sign-ambiguous and an unfixed sign makes the model non-replayable
    across runs/platforms."""
    n, s, gram = _moments(df, vec_col)
    cov = _covariance(n, s, gram)
    mean = s / n
    dim = cov.shape[0]
    if not (1 <= k <= dim):
        raise ValueError(f"need 1 <= k <= dim ({dim}), got {k}")
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps, ev = [], []
    for idx in order:
        v = vecs[:, idx]
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
        ev.append(float(max(vals[idx], 0.0)))
    return PCAModel(
        components=comps,
        explained_variance=ev,
        mean=[float(x) for x in mean],
    )


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pca",
) -> DataFrame:
    """(id, pca ARRAY<DOUBLE>[k]): centered dot products against the
    literal component matrix — row-local codegen, zero shuffles. The
    projected frame feeds :func:`pq.pq_train` / :func:`clustering`
    unchanged (``vec_col="pca"``)."""
    from spark_timeseries_spark.functions import let

    mean = F.array(*[F.lit(m) for m in model.mean])
    v = F.col(vec_col).cast("array<double>")

    def project(c):
        comp = F.array(*[F.lit(x) for x in c])
        return lambda centered: F.aggregate(
            F.zip_with(centered, comp, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    def build(centered):
        return F.array(*[project(c)(centered) for c in model.components])

    out = let(F.zip_with(v, mean, lambda x, m: x - m), build)
    return df.select(F.col(id_col), out.alias(out_col))


def sq8_quantize(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector 8-bit scalar quantization (SQ8) with reconstruction
    error → (id, codes array<int>, vmin, scale, mse, max_abs_err) — the
    standard 4×-compression trick an ANN index applies before PQ is
    worth its training cost (FAISS's ``ScalarQuantizer`` convention:
    per-vector min/max affine grid, 256 levels).

    code_i = ⌊(x_i − vmin)/scale + ½⌋ with scale = (vmax − vmin)/255;
    recon_i = vmin + code_i·scale. A constant vector (scale 0) codes to
    all-zeros and reconstructs exactly. Every step is a fixed IEEE
    double op sequence over the (float→double widened) inputs, so codes
    are bit-replayable in any engine — the determinism the DuckDB
    oracle relies on.

    Plan: one scan, all row-local JVM higher-order expressions
    (transform/aggregate over the array) — no shuffle, no Python, no
    UDF; at 100 TB this is scan-bound and embarrassingly parallel."""
    v = F.col(vec_col).cast("array<double>")
    vmin = F.array_min(v)
    vmax = F.array_max(v)
    scale = (vmax - vmin) / F.lit(255.0)
    codes = F.when(scale == 0.0, F.transform(v, lambda x: F.lit(0))).otherwise(
        F.transform(v, lambda x: F.floor((x - vmin) / scale + 0.5).cast("int"))
    )
    out = df.select(
        F.col(id_col),
        v.alias("_v"),
        vmin.alias("vmin"),
        scale.alias("scale"),
        codes.alias("codes"),
    )
    recon = F.transform(
        F.col("codes"), lambda c: F.col("vmin") + c * F.col("scale")
    )
    err = F.zip_with(F.col("_v"), recon, lambda a, b: a - b)
    mse = F.aggregate(
        err, F.lit(0.0), lambda acc, e: acc + e * e
    ) / F.size("_v")
    mae = F.array_max(F.transform(err, lambda e: F.abs(e)))
    return out.select(
        id_col, "codes", "vmin", "scale",
        mse.alias("mse"), mae.alias("max_abs_err"),
    )


def embedding_dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    quantiles: tuple[float, ...] = (0.05, 0.5, 0.95),
    exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-DIMENSION distribution profile of an embedding corpus →
    (dim, n, mean, std, q_05, q_50, q_95, ...): the drift/QA companion
    of :func:`embedding_covariance` — per-coordinate quantiles catch
    scale/clipping regressions between embedding-model versions that a
    centroid-cosine drift check (``pipeline.drift.embedding_drift``)
    averages away.

    Plan: one ``posexplode`` (rows × dim — the same fan-out every
    per-dimension pass costs) into ONE map-side-combinable groupBy(dim);
    d output rows. ``exact=True`` (default — the oracle-replayable form)
    uses exact interpolated percentiles, which buffer every group value
    in executor memory: correct for profiling samples and oracle checks,
    an OOM at corpus scale where a group = the whole corpus per
    dimension. ``exact=False`` is the 100 TB path: mergeable
    ``approx_percentile`` (KLL-style) sketches with bounded memory per
    group regardless of corpus size; ``accuracy`` trades sketch memory
    for error (~1/accuracy relative rank error)."""
    exploded = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "_x")
    ).withColumn("_x", F.col("_x").cast("double"))
    aggs = [
        F.count("_x").alias("n"),
        F.avg("_x").alias("mean"),
        F.stddev_samp("_x").alias("std"),
    ]
    for qq in quantiles:
        name = f"q_{str(qq).replace('0.', '').ljust(2, '0')}"
        if exact:
            aggs.append(F.percentile("_x", F.lit(float(qq))).alias(name))
        else:
            aggs.append(
                F.approx_percentile(
                    "_x", F.lit(float(qq)), F.lit(accuracy)
                ).alias(name)
            )
    return exploded.groupBy("dim").agg(*aggs)


def srp_lsh(
    df: DataFrame,
    planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed-random-projection LSH (Charikar 2002) → (id, bucket): bit
    p of the bucket is the SIGN of the vector's projection onto pseudo-
    random hyperplane p, so two vectors share a bucket with probability
    (1 − θ/π)^planes — the cosine-similarity analog of MinHash banding,
    and the scale path for near-neighbor candidate generation over
    embeddings (equi-join on bucket; no all-pairs anywhere).

    The hyperplanes are DERIVED, not stored: weight(p, d) = ±1 by one
    bit of a two-round integer mix — h = d·2654435761 + (p+1)·40503,
    then (xor(h, h>>13) mod 2^30)·3266489917, taking bit 29 of the
    product. Exact integer arithmetic both engines replay bit-for-bit
    (the reason this is not ``rand()``: a seeded Gaussian matrix would
    make the oracle non-replayable; ±1 hyperplanes are the standard
    cheap SRP variant). Every intermediate stays < 2^62 for any
    realistic dim, so ANSI-mode Spark and DuckDB never overflow. A
    single Lehmer-parity round is NOT enough — with odd multipliers
    that never wrap the modulus, parity degenerates to (d+p) mod 2 and
    every plane collapses onto one alternating vector; the xorshift +
    high-bit round gives near-orthogonal planes (measured pairwise
    |corr| ≤ 0.5 at d=16, distinct-bucket counts near the 2^planes
    ideal). Projection = one ``aggregate`` fold per plane over the
    vector — row-local, zero shuffle, zero Python.
    """
    if not 1 <= planes <= 62:
        raise ValueError(f"planes must be in [1, 62], got {planes}")
    v = F.col(vec_col)
    bits = []
    def _mk_w(p):
        # weight_d = 1 - 2*bit29(((h ^ (h>>13)) % 2^30) * 3266489917)
        def _w(x, d):
            h = d.cast("long") * F.lit(2654435761) + F.lit((p + 1) * 40503)
            h = h.bitwiseXOR(F.shiftright(h, 13)) % F.lit(1073741824)
            bit = F.shiftright(h * F.lit(3266489917), 29) % 2
            return x * (1 - 2 * bit).cast("double")

        return _w

    for p in range(planes):
        proj = F.aggregate(
            F.zip_with(
                v.cast("array<double>"),
                F.sequence(F.lit(1), F.size(v)),
                _mk_w(p),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)) * (1 << p))
    bucket = bits[0]
    for b in bits[1:]:
        bucket = bucket + b
    return df.select(F.col(id_col).alias("id"), bucket.cast("long").alias("bucket"))


def srp_candidates(
    df: DataFrame,
    planes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Same-bucket candidate pairs (id_a < id_b) from :func:`srp_lsh` —
    the equi-join-on-bucket shape that keeps SRP near-neighbor search
    linear in the corpus (pairs explode only WITHIN buckets; at 16
    planes a random pair collides with p ≈ (1−θ/π)^16, so buckets stay
    small unless the data genuinely clusters — cap with a bucket-size
    guard upstream if it does)."""
    b = srp_lsh(df, planes, id_col, vec_col)
    a_, b_ = b.alias("a"), b.alias("b")
    return (
        a_.join(b_, "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            "bucket",
        )
    )


def embedding_outliers(
    df: DataFrame,
    z: float = 3.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus-level embedding sanity scores → one row per vector:
    (id, norm, cos_centroid, is_outlier): L2 norm, cosine similarity
    to the CORPUS CENTROID (the per-dimension mean vector), and a flag
    for vectors whose centroid-cosine sits more than ``z`` sample
    standard deviations below the corpus mean cosine — the cheap
    "wrong model / corrupted batch / off-manifold" detector run before
    any ANN index build (an off-distribution shard drags recall for
    every query; catch it at ingest). Zero-norm vectors get NULL
    cos_centroid and a NULL flag (try_divide).

    Plan: centroid via ONE posexplode + groupBy(dim) (d rows),
    joined back on dim and re-aggregated per vector (two exchanges
    over rows × d — the per-dimension fan-out every embedding profile
    pass costs), then a 1-row corpus threshold broadcast. No driver
    collect, no d × d work, no pairwise anything."""
    if z <= 0:
        raise ValueError(f"z must be positive, got {z}")
    exploded = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col)).alias("dim", "_x"),
    ).withColumn("_x", F.col("_x").cast("double"))
    centroid = exploded.groupBy("dim").agg(F.avg("_x").alias("_c"))
    per = (
        exploded.join(centroid, "dim")
        .groupBy("_id")
        .agg(
            F.sqrt(F.sum(F.col("_x") * F.col("_x"))).alias("norm"),
            F.sum(F.col("_x") * F.col("_c")).alias("_dot"),
            F.sqrt(F.sum(F.col("_c") * F.col("_c"))).alias("_cn"),
        )
    )
    scored = per.select(
        F.col("_id").alias(id_col),
        "norm",
        F.try_divide(
            F.col("_dot"), F.col("norm") * F.col("_cn")
        ).alias("cos_centroid"),
    )
    thr = scored.agg(
        (
            F.avg("cos_centroid") - z * F.stddev_samp("cos_centroid")
        ).alias("_thr")
    )
    return scored.join(F.broadcast(thr)).select(
        id_col, "norm", "cos_centroid",
        F.when(
            F.col("cos_centroid").isNotNull(),
            F.col("cos_centroid") < F.col("_thr"),
        ).alias("is_outlier"),
    )


def intrinsic_dimension(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Participation-ratio intrinsic dimensionality of an embedding
    table → ONE row: (n, dim, total_var, pr, pr_ratio). PR =
    (Σλ)² / Σλ² = tr(Σ)² / tr(Σ²) — the effective number of directions
    the variance actually occupies (Gao et al. 2017's neural-dimension
    estimator; equals ``dim`` for isotropic data, → 1 when one
    direction dominates). Trace identities make it eig-free: tr(Σ) is
    the sum of per-dimension variances, tr(Σ²) the sum of SQUARED
    covariance entries — so the whole statistic reduces to the same
    (n, Σx, XᵀX) moment partials :func:`embedding_covariance` already
    aggregates (one Arrow pass, d² scalars to the driver; nothing else
    leaves the cluster). Sample (n−1) normalization throughout.

    ``pr_ratio`` = pr / dim (1 = isotropic, → 0 = collapsed): the
    standard one-number read on embedding-collapse during training."""
    n, s, gram = _moments(df, vec_col)
    cov = _covariance(n, s, gram)
    tr = float(np.trace(cov))
    tr2 = float(np.sum(cov * cov))  # tr(Σ²) for symmetric Σ
    d = cov.shape[0]
    pr = tr * tr / tr2 if tr2 > 0 else float("nan")
    spark = df.sparkSession
    return spark.createDataFrame(
        [(n, d, tr, pr, pr / d)],
        "n long, dim int, total_var double, pr double, pr_ratio double",
    )

def cluster_separation(
    df: DataFrame,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Calinski-Harabasz (variance-ratio) separation of a labeled /
    clustered embedding table → ONE row: (n, k, within, between,
    ch_index). Scatter identities keep it one-pass: total scatter
    T = Σ‖x − µ‖² = Σ‖x‖² − Σ_i (Σ_c s_ci)²/n, within W = Σ‖x‖² −
    Σ_c n_c‖µ_c‖², between B = T − W, and CH = (B/(k−1)) / (W/(n−k)) —
    higher = tighter, better-separated clusters (Calinski & Harabasz
    1974; the standard k-selection and label-quality diagnostic, e.g.
    over ``kmeans_assign`` output). NULL ch_index when k = 1 or k = n.

    Plan: one explode → ONE map-side-combinable groupBy(label, i)
    (k·d groups — bounded), then two one-row aggregates over that tiny
    table joined broadcast-trivially. No unbounded joins, nothing but
    the final row leaves the cluster, all JVM."""
    d = df.select(
        F.col(label_col).alias("_c"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias(
            "_i", "_x"
        ),
    )
    per = d.groupBy("_c", "_i").agg(
        F.sum("_x").alias("_s"),
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.col("_x") * F.col("_x")).alias("_ss"),
    )
    main = per.groupBy(F.lit(1).alias("_g")).agg(
        F.sum("_ss").alias("_sumsq"),
        F.sum(F.col("_s") * F.col("_s") / F.col("_n")).alias("_expl"),
        F.sum(F.when(F.col("_i") == 0, F.col("_n"))).alias("_ntot"),
        F.count_distinct("_c").alias("_k"),
    )
    # grand-mean term Σ_i (Σ_c s_ci)² / n needs a per-dimension rollup
    gterm = (
        per.groupBy("_i")
        .agg(F.sum("_s").alias("_si"), F.sum("_n").alias("_ni"))
        .groupBy(F.lit(1).alias("_g"))
        .agg(
            F.sum(F.col("_si") * F.col("_si") / F.col("_ni")).alias("_gm2")
        )
    )
    j = main.join(gterm, "_g")
    w = F.col("_sumsq") - F.col("_expl")
    b = F.col("_expl") - F.col("_gm2")
    n = F.col("_ntot")
    k = F.col("_k")
    ch = F.try_divide(
        F.try_divide(b, (k - F.lit(1)).cast("double")),
        F.try_divide(w, (n - k).cast("double")),
    )
    return j.select(
        n.alias("n"),
        k.cast("int").alias("k"),
        w.alias("within"),
        b.alias("between"),
        ch.alias("ch_index"),
    )
