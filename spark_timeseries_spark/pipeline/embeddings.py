"""Embedding-matrix analytics: distributed covariance and PCA.

The ANN stack (:mod:`similarity`, :mod:`pq`) benefits from decorrelated,
variance-balanced inputs — PQ in particular quantizes better after a
rotation that spreads energy across subspaces (the observation behind OPQ,
Ge et al. 2014; plain PCA is its standard cheap approximation). This module
keeps the heavy pass distributed and the tiny algebra on the driver:

- **Covariance** (:func:`embedding_covariance`): MLlib ``RowMatrix
  .computeCovariance()`` — the JVM-distributed one-pass moment
  aggregation (no dim²-per-row explode, no Python); result is a dim×dim
  local matrix (driver-small by construction).
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
    "embedding_covariance",
    "pca_fit",
    "pca_project",
]


def _row_matrix(df: DataFrame, vec_col: str):
    from pyspark.mllib.linalg import Vectors
    from pyspark.mllib.linalg.distributed import RowMatrix

    rows = df.select(F.col(vec_col).cast("array<double>").alias("v")).rdd.map(
        lambda r: Vectors.dense(r.v)
    )
    return RowMatrix(rows)


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Sample covariance of the embedding matrix → (i, j, cov) rows,
    0-based coordinates, unbiased (n−1) normalization (MLlib's
    convention). The distributed pass is MLlib's Gramian aggregation;
    only the dim×dim result touches the driver."""
    cov = _row_matrix(df, vec_col).computeCovariance().toArray()
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
    """Top-k PCA from the distributed covariance: one MLlib pass for the
    moments, ``numpy.linalg.eigh`` on the dim×dim matrix driver-side.
    Sign convention: each eigenvector's largest-|coordinate| entry is
    made positive — eigensolvers are sign-ambiguous and an unfixed sign
    makes the model non-replayable across runs/platforms."""
    rm = _row_matrix(df, vec_col)
    # two MLlib actions (covariance, summary stats) share one cached RDD —
    # uncached, the DataFrame→Vectors map would re-deserialize every row
    # twice, doubling the dominant pass
    rm.rows.cache()
    try:
        cov = rm.computeCovariance().toArray()
        mean = rm.computeColumnSummaryStatistics().mean()
    finally:
        rm.rows.unpersist()
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
