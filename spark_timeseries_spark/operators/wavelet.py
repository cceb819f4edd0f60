"""Haar wavelet energy decomposition per series.

Beyond-reference: the multi-resolution companion of the periodogram
family (``spectral.periodogram`` / ``dominant_period``). The Haar
detail coefficient at level ℓ, block b,

    d_{ℓ,b} = (Σ first-half − Σ second-half) / √(2^ℓ)

captures variation at time-scale 2^ℓ; the per-level energy Σ_b d²
is the wavelet energy spectrum — a localized (shift-robust) view of
where a series' variance lives that Fourier bins smear when the
signal is non-stationary (Mallat 1989; Percival & Walden 2000,
"Wavelet Methods for Time Series Analysis").

Blocks are aligned to the series head (index = row_number−1 over the
non-null sort) and only FULL dyadic blocks emit a coefficient —
ragged tails are dropped per level (stated; the standard truncated
non-decimated convention for irregular lengths).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["haar_energy"]


def haar_energy(
    df: DataFrame,
    levels: int = 4,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Haar wavelet energy spectrum → one row per (key, level 1..L):
    (key, level, n_coeffs, energy, energy_frac), where ``energy`` is
    the sum of squared level-ℓ detail coefficients over full 2^ℓ
    blocks, and ``energy_frac`` normalizes across the emitted levels
    (NULL when the total is 0 — a constant series has no detail
    energy anywhere). Levels whose block size exceeds the series emit
    no row.

    Plan: one row-number sort per key, ONE explode to L rows per
    observation feeding a single (key, level, block) aggregate, then a
    (key, level) aggregate + per-key window for the share — the only
    data-sized exchange is the first; everything after is
    coefficient-sized."""
    if levels < 1:
        raise ValueError(f"levels must be >= 1, got {levels}")
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    ws = Window.partitionBy(key_col).orderBy(order_col)
    d = pts.select(
        F.col(key_col).alias("key"),
        v.alias("_v"),
        (F.row_number().over(ws) - 1).alias("_j"),
    )
    lvl = F.explode(
        F.array(*[F.lit(i) for i in range(1, levels + 1)])
    ).alias("level")
    e = d.select("key", "_v", "_j", lvl)
    blk = F.floor(F.col("_j") / F.pow(F.lit(2.0), F.col("level"))).cast(
        "long"
    )
    half = (
        F.col("_j") % F.pow(F.lit(2.0), F.col("level")).cast("long")
        < F.pow(F.lit(2.0), F.col("level") - 1).cast("long")
    )
    coef = e.groupBy("key", "level", blk.alias("_b")).agg(
        F.count(F.lit(1)).alias("_cnt"),
        (
            F.sum(F.when(half, F.col("_v")).otherwise(-F.col("_v")))
            / F.sqrt(F.pow(F.lit(2.0), F.col("level")))
        ).alias("_d"),
    )
    full = coef.where(
        F.col("_cnt") == F.pow(F.lit(2.0), F.col("level")).cast("long")
    )
    en = full.groupBy("key", "level").agg(
        F.count(F.lit(1)).alias("n_coeffs"),
        F.sum(F.col("_d") * F.col("_d")).alias("energy"),
    )
    wk = Window.partitionBy("key")
    return en.select(
        "key",
        F.col("level").cast("int").alias("level"),
        "n_coeffs",
        "energy",
        F.try_divide(F.col("energy"), F.sum("energy").over(wk)).alias(
            "energy_frac"
        ),
    )
