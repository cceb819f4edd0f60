"""Kleinberg burst detection over irregular event streams.

Beyond-reference (the reference has no event-stream surface): the
classic two-state automaton of Kleinberg, "Bursty and Hierarchical
Structure in Streams" (KDD 2002) — a base state emitting inter-arrival
gaps at the stream's own average rate λ₀ and a burst state at
λ₁ = s·λ₀, with a γ·ln(m)-cost barrier against entering the burst
state; the minimum-cost (Viterbi) state path labels each gap
burst/normal. The principled alternative to threshold-on-count burst
flags: rate-free, length-aware, and stable under slow drift.

Determinism contract (the cross-engine oracle story):

- λ₀ is derived from EXACT INTEGERS — gap microseconds and their sum —
  as ``(m · 1e6) / T_µs`` in this exact expression order, so Spark and
  any replaying engine compute bit-identical rates (no float
  aggregation order in sight).
- Every Viterbi cost is QUANTIZED to ``digits`` decimals (default 6)
  as soon as it is produced, via the half-up form
  ``floor(x·10^d + 0.5)/10^d`` — floor is exact and the two float ops
  are identical in any IEEE engine, unlike round() whose tie rule
  differs across engines. ln() may differ by an ulp across math
  libraries; quantization absorbs that BEFORE any comparison, so the
  argmin path — the branchy part a last-ulp wobble could flip — is
  engine-independent. Ties on quantized costs prefer the NON-burst
  state (stated).

Scale: the per-key Viterbi is a grouped-map numpy kernel — O(m) time,
scalar state, embarrassingly parallel across keys (the
kalman/bocpd sequential-posterior precedent); everything before it is
one lag window. The oracle replays the recursion with two recursive
CTEs (forward costs+parents MATERIALIZED, backward path walk) — the
kalman RTS-smoother technique.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kleinberg_bursts", "burst_episodes"]


def kleinberg_bursts(
    df: DataFrame,
    s: float = 2.0,
    gamma: float = 1.0,
    key_col: str = "key",
    ts_col: str = "ts",
    digits: int = 6,
) -> DataFrame:
    """Per-gap burst labels → (key, ts, gap_seconds, state): one row
    per inter-arrival gap (ts = the gap-CLOSING event's timestamp),
    ``state`` 1 while the minimum-cost Kleinberg path is in the burst
    state. Keys with < 2 events, or whose events all share one
    microsecond (zero span — no rate is defined), emit no rows.

    Emission cost −ln λ_j + λ_j·g, burst entry cost γ·ln(m), exit
    free; the path starts in the base state (Kleinberg's convention).
    See the module docstring for the quantized-cost determinism
    contract."""
    if s <= 1.0:
        raise ValueError(f"s must be > 1, got {s}")
    if gamma <= 0:
        raise ValueError(f"gamma must be positive, got {gamma}")
    w = Window.partitionBy(key_col).orderBy(ts_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    d = (
        df.select(F.col(key_col).alias("key"), F.col(ts_col).alias("ts"))
        .withColumn("_us", us)
        .withColumn("_gus", F.col("_us") - F.lag("_us").over(w))
        .where(F.col("_gus").isNotNull())
    )
    wk = Window.partitionBy("key")
    d = (
        d.withColumn("_m", F.count(F.lit(1)).over(wk))
        .withColumn("_tus", F.sum("_gus").over(wk))
        .where(F.col("_tus") > 0)
    )
    q = 10.0 ** digits

    def kern(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_us").reset_index(drop=True)
        gus = pdf["_gus"].to_numpy(dtype=np.int64)
        m = int(pdf["_m"].iloc[0])
        tus = int(pdf["_tus"].iloc[0])
        lam0 = (m * 1e6) / tus
        lam1 = s * lam0
        tau_up = gamma * math.log(m)
        ln0, ln1 = math.log(lam0), math.log(lam1)

        def rnd(x: float) -> float:
            # half-up via exact floor — engine-identical (module docstring)
            return math.floor(x * q + 0.5) / q

        g = gus / 1e6
        c0 = np.empty(m)
        c1 = np.empty(m)
        p0 = np.empty(m, dtype=np.int8)
        p1 = np.empty(m, dtype=np.int8)
        c0[0] = rnd(-ln0 + lam0 * g[0])
        c1[0] = rnd(rnd(tau_up) + rnd(-ln1 + lam1 * g[0]))
        p0[0] = 0
        p1[0] = 0
        for t in range(1, m):
            e0 = rnd(-ln0 + lam0 * g[t])
            e1 = rnd(-ln1 + lam1 * g[t])
            # into state 0: exit is free from either state
            if c0[t - 1] <= c1[t - 1]:
                c0[t], p0[t] = rnd(c0[t - 1] + e0), 0
            else:
                c0[t], p0[t] = rnd(c1[t - 1] + e0), 1
            # into state 1: entering from 0 pays the barrier
            up = rnd(rnd(c0[t - 1] + rnd(tau_up)) + e1)
            stay = rnd(c1[t - 1] + e1)
            if up <= stay:
                c1[t], p1[t] = up, 0
            else:
                c1[t], p1[t] = stay, 1
        state = np.empty(m, dtype=np.int32)
        state[m - 1] = 0 if c0[m - 1] <= c1[m - 1] else 1
        for t in range(m - 1, 0, -1):
            state[t - 1] = (
                p0[t] if state[t] == 0 else p1[t]
            )
        return pd.DataFrame(
            {
                "key": pdf["key"],
                "ts": pdf["ts"],
                "gap_seconds": g,
                "state": state,
            }
        )

    return d.groupBy("key").applyInPandas(
        kern, "key string, ts timestamp, gap_seconds double, state int"
    )


def burst_episodes(
    df: DataFrame,
    s: float = 2.0,
    gamma: float = 1.0,
    key_col: str = "key",
    ts_col: str = "ts",
    digits: int = 6,
) -> DataFrame:
    """Burst EPISODES per key → (key, episode, start_ts, end_ts,
    n_gaps): maximal runs of state-1 gaps from
    :func:`kleinberg_bursts`, numbered 1.. in time order; ``start_ts``
    is the first burst gap's closing event, ``end_ts`` the last. The
    report-ready surface (gaps-and-islands over the per-gap labels —
    one extra window pass, all JVM)."""
    lab = kleinberg_bursts(df, s, gamma, key_col, ts_col, digits)
    ws = Window.partitionBy("key").orderBy("ts")
    d = lab.withColumn(
        "_st",
        (
            (F.col("state") == 1)
            & (F.coalesce(F.lag("state").over(ws), F.lit(0)) == 0)
        ).cast("int"),
    )
    d = d.withColumn("_ep", F.sum("_st").over(ws)).where(F.col("state") == 1)
    return (
        d.groupBy("key", F.col("_ep").alias("episode"))
        .agg(
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
            F.count(F.lit(1)).alias("n_gaps"),
        )
        .select("key", "episode", "start_ts", "end_ts", "n_gaps")
    )
