"""Scale-adaptive parallelism helpers for CPU-bound kernel stages.

AQE's partition coalescing is BYTE-based: a shuffle whose output is a few
MB collapses to one post-shuffle partition, which is exactly right for
byte-bound JVM stages and exactly wrong for the CPU-bound Python kernel
stages this package runs downstream of those shuffles (grouped-map model
fits, sequential-posterior filters, FFT/entropy kernels, broadcast-scoring
crossJoins). On a tiny input every per-series estimator then runs
SERIALLY in one Python worker — measured 7× slowdowns at bench scale, and
on a cluster the same mismatch appears whenever an aggregated (small)
frame feeds an expensive kernel.

``spread_kernel`` is the shared fix (hoisted from ``models.fit._spread``,
r9): an EXPLICIT repartition, which AQE preserves (it only coalesces
ENSURE_REQUIREMENTS exchanges), sized from the runtime's core count, not
from a constant — local[8] gets 17, local[32] gets 65, a 400-core cluster
gets 801. The odd ``2·parallelism + 1`` count deliberately differs from
any usual shuffle-partition setting so the optimizer cannot prune the
repartition as redundant against an upstream exchange (which WOULD be
AQE-coalesced; see ``models/fit.py:_spread`` for the measured case), and
the 2× over-decomposition load-balances CPU-skewed groups.

``spread_rows`` is the keyless variant for row-parallel (not grouped)
kernel stages fed by a single-file scan or a coalesced exchange:
round-robin, same count. Use it before broadcast-scoring joins and
mapInPandas stages whose per-row cost, not byte volume, is the bill.

Neither changes values: grouped-map kernels receive each group WHOLE
either way and sort internally, and row-parallel stages are row-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def kernel_parallelism(df: DataFrame) -> int:
    """Partition count for CPU-bound kernel stages: 2·cores + 1."""
    return 2 * df.sparkSession.sparkContext.defaultParallelism + 1


def spread_kernel(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition by the grouping key(s) with an explicit, cores-scaled
    partition count so a downstream grouped-map kernel runs parallel."""
    from pyspark.sql import functions as F

    return df.repartition(
        kernel_parallelism(df), *[F.col(c) for c in key_cols]
    )


def spread_rows(df: DataFrame) -> DataFrame:
    """Round-robin repartition with an explicit, cores-scaled count for
    row-parallel kernel stages (broadcast scoring, mapInPandas decode)."""
    return df.repartition(kernel_parallelism(df))
