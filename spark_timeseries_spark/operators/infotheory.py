"""Information-flow measures between series: binned transfer entropy.

Beyond-reference: the nonlinear companion of the cross-correlation
lead-lag family (``rolling.crosscorr`` / ``rolling.lead_lag``).
Transfer entropy (Schreiber 2000) measures DIRECTED predictive
information — how much knowing x_t reduces uncertainty about y_{t+1}
beyond what y_t already tells — and, unlike ccf, sees nonlinear and
asymmetric coupling. This implementation is the standard
coarse-grained estimator: each series is binarized at its own median
(the robust 2-state partition), and TE is the plug-in estimate over
the 8 possible (y_{t+1}, y_t, x_t) state triples:

    TE(X→Y) = Σ (n₃/N) · ln( n₃·n_y / (n_yx · n_y1y) )   [nats]

computed entirely from integer triple counts — every log argument is
a ratio of positive counts, so no guard is needed and both engines
see identical integers (float parity is confined to the median and
the final Σ of ≤ 8 terms).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["mutual_information", "transfer_entropy"]


def transfer_entropy(
    df: DataFrame,
    key_a: str,
    key_b: str,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Median-binarized transfer entropy between two conformed series
    → ONE row: (key_a, key_b, n, te_ab, te_ba, net). ``te_ab`` is
    TE(A→B) — information flowing FROM a TO b's next step; ``net`` =
    te_ab − te_ba (> 0: A drives B). Rows align on ``order_col``
    (inner — both series present), each series binarizes at its own
    EXACT median over the aligned sample (``percentile`` — the
    ``robust_scale`` parity convention; value > median → state 1), and
    triples need the next aligned step to exist. n = triple count;
    no row when n = 0.

    Plan: a 2-row filter + pivot to (loc, va, vb), one global-grid
    sort for the lead (bounded by the ALIGNED length of two named
    series — the kendall/coherence envelope), one groupBy over ≤ 8
    state triples, window sums over that 8-row table, one-row reduce.
    All JVM."""
    pts = df.where(
        F.col(key_col).isin([key_a, key_b])
        & F.col(value_col).isNotNull()
    )
    wide = pts.groupBy(F.col(order_col).alias("_loc")).agg(
        F.max(
            F.when(F.col(key_col) == key_a, F.col(value_col))
        ).alias("_va"),
        F.max(
            F.when(F.col(key_col) == key_b, F.col(value_col))
        ).alias("_vb"),
    ).where(F.col("_va").isNotNull() & F.col("_vb").isNotNull())
    wall = Window.partitionBy(F.lit(1))
    ws = Window.partitionBy(F.lit(1)).orderBy("_loc")
    d = (
        wide.withColumn("_ma", F.percentile("_va", F.lit(0.5)).over(wall))
        .withColumn("_mb", F.percentile("_vb", F.lit(0.5)).over(wall))
        .select(
            "_loc",
            (F.col("_va") > F.col("_ma")).cast("int").alias("x"),
            (F.col("_vb") > F.col("_mb")).cast("int").alias("y"),
        )
        .withColumn("_yn", F.lead("y").over(ws))
        .withColumn("_xn", F.lead("x").over(ws))
        .where(F.col("_yn").isNotNull())
    )

    def te(frm: str, to: str, to_next: str):
        """Triple counts -> plug-in TE(frm -> to), one scalar."""
        tri = d.groupBy(
            F.col(to_next).alias("s1"),
            F.col(to).alias("s0"),
            F.col(frm).alias("sx"),
        ).agg(F.count(F.lit(1)).alias("n3"))
        w_y = Window.partitionBy("s0")
        w_yx = Window.partitionBy("s0", "sx")
        w_y1y = Window.partitionBy("s1", "s0")
        w_all = Window.partitionBy(F.lit(1))
        t = tri.select(
            F.col("n3"),
            F.sum("n3").over(w_y).alias("ny"),
            F.sum("n3").over(w_yx).alias("nyx"),
            F.sum("n3").over(w_y1y).alias("ny1y"),
            F.sum("n3").over(w_all).alias("nn"),
        )
        term = (
            F.col("n3").cast("double")
            / F.col("nn").cast("double")
            * F.log(
                F.col("n3").cast("double")
                * F.col("ny").cast("double")
                / (
                    F.col("nyx").cast("double")
                    * F.col("ny1y").cast("double")
                )
            )
        )
        return t.groupBy(F.lit(1).alias("_j")).agg(
            F.sum(term).alias("te"), F.first("nn").alias("n")
        )

    # x drives y: predict y_{t+1} from (y_t, x_t); and the reverse
    ab = te("x", "y", "_yn").withColumnsRenamed({"te": "te_ab"})
    ba = te("y", "x", "_xn").select(
        "_j", F.col("te").alias("te_ba")
    )
    return ab.join(ba, "_j").select(
        F.lit(key_a).alias("key_a"),
        F.lit(key_b).alias("key_b"),
        F.col("n").cast("long").alias("n"),
        "te_ab",
        "te_ba",
        (F.col("te_ab") - F.col("te_ba")).alias("net"),
    )


def mutual_information(
    df: DataFrame,
    key_a: str,
    key_b: str,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Median-binarized mutual information between two conformed
    series → ONE row: (key_a, key_b, n, mi, nmi). The symmetric
    companion of :func:`transfer_entropy`: MI = Σ p(x,y)·ln(p(x,y)/
    (p(x)p(y))) over the 4 joint states (plug-in estimate from
    integer counts — the same zero-guard-free algebra), ``nmi``
    normalizes by √(H(X)·H(Y)) into [0, 1] (NULL when either marginal
    entropy is 0 — a constant-sided pair carries no information to
    normalize). Catches nonlinear association ccf misses; direction-
    blind where TE is directional.

    Plan: identical alignment to :func:`transfer_entropy` (pivot on
    the shared grid, exact medians), then one groupBy over ≤ 4 joint
    states + window sums on that 4-row table. All JVM."""
    pts = df.where(
        F.col(key_col).isin([key_a, key_b])
        & F.col(value_col).isNotNull()
    )
    wide = pts.groupBy(F.col(order_col).alias("_loc")).agg(
        F.max(
            F.when(F.col(key_col) == key_a, F.col(value_col))
        ).alias("_va"),
        F.max(
            F.when(F.col(key_col) == key_b, F.col(value_col))
        ).alias("_vb"),
    ).where(F.col("_va").isNotNull() & F.col("_vb").isNotNull())
    wall = Window.partitionBy(F.lit(1))
    d = (
        wide.withColumn("_ma", F.percentile("_va", F.lit(0.5)).over(wall))
        .withColumn("_mb", F.percentile("_vb", F.lit(0.5)).over(wall))
        .select(
            (F.col("_va") > F.col("_ma")).cast("int").alias("x"),
            (F.col("_vb") > F.col("_mb")).cast("int").alias("y"),
        )
    )
    j = d.groupBy("x", "y").agg(F.count(F.lit(1)).alias("nxy"))
    wx = Window.partitionBy("x")
    wy = Window.partitionBy("y")
    w_all = Window.partitionBy(F.lit(1))
    t = j.select(
        "nxy",
        F.sum("nxy").over(wx).alias("nx"),
        F.sum("nxy").over(wy).alias("ny"),
        F.sum("nxy").over(w_all).alias("nn"),
    )
    nn = F.col("nn").cast("double")
    term = (
        F.col("nxy").cast("double")
        / nn
        * F.log(
            F.col("nxy").cast("double")
            * nn
            / (F.col("nx").cast("double") * F.col("ny").cast("double"))
        )
    )
    # marginal entropies from the same table: each (x, y) cell carries
    # its marginal counts; -sum over DISTINCT marginal values needs the
    # per-cell share of its marginal to avoid double counting
    hx_term = (
        -(F.col("nxy").cast("double") / nn)
        * F.log(F.col("nx").cast("double") / nn)
    )
    hy_term = (
        -(F.col("nxy").cast("double") / nn)
        * F.log(F.col("ny").cast("double") / nn)
    )
    out = t.groupBy(F.lit(1).alias("_j")).agg(
        F.sum(term).alias("mi"),
        F.sum(hx_term).alias("_hx"),
        F.sum(hy_term).alias("_hy"),
        F.first("nn").alias("n"),
    )
    return out.select(
        F.lit(key_a).alias("key_a"),
        F.lit(key_b).alias("key_b"),
        F.col("n").cast("long").alias("n"),
        "mi",
        F.when(
            (F.col("_hx") > 0) & (F.col("_hy") > 0),
            F.col("mi") / F.sqrt(F.col("_hx") * F.col("_hy")),
        ).alias("nmi"),
    )
