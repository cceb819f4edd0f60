"""Experimentation analytics: CUPED variance reduction and
sample-ratio-mismatch detection.

Beyond-reference: the two workhorse checks of any event-log A/B
platform. Both are pure aggregate plans (no joins beyond a one-row
broadcast, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# upper-tail 5% chi-square critical values, df = 1..10 (standard table)
_CHI2_CRIT_05 = {
    1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.070,
    6: 12.592, 7: 14.067, 8: 15.507, 9: 16.919, 10: 18.307,
}


def chi2_crit_05(dfree: Column) -> Column:
    """Upper-5% chi-square critical value as a Column: the exact table
    for df ≤ 10, the Wilson-Hilferty (1931) cube approximation beyond
    (χ²_q ≈ df·(1 − 2/(9df) + z_q·√(2/(9df)))³, accurate to <0.1% at
    df > 10). Shared by :func:`srm_check`, the survival log-rank test,
    and any k-group chi-square readout."""
    d = dfree.cast("double")
    z95 = 1.6448536269514722  # Phi^{-1}(0.95)
    wh = d * F.pow(
        1.0 - 2.0 / (9.0 * d) + F.lit(z95) * F.sqrt(2.0 / (9.0 * d)),
        F.lit(3.0),
    )
    table = F.element_at(
        F.create_map(
            *[
                x
                for d_, c_ in _CHI2_CRIT_05.items()
                for x in (F.lit(d_), F.lit(c_))
            ]
        ),
        dfree.cast("int"),
    )
    return F.coalesce(table, wh)


def cuped(
    df: DataFrame,
    split: Column,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """CUPED (Controlled experiments Using Pre-Experiment Data, Deng
    et al. 2013) → one row per entity: (key, pre, post, post_cuped,
    theta, var_reduction). ``split`` is a boolean Column — True marks
    PRE-period rows. Per entity, pre/post are the period means of
    ``value_col``; θ = cov(pre, post)/var(pre) across entities, and
    post_cuped = post − θ·(pre − mean(pre)) — same expectation as post,
    variance shrunk by the squared pre/post correlation.
    ``var_reduction`` = 1 − var(post_cuped)/var(post) (population
    moments; it equals ρ² up to fp) and θ repeat on every row — they
    are the experiment-level certificate. Entities missing either
    period drop out (CUPED is defined on the paired sample).

    Plan: one groupBy(key) of conditional means, one single-row moment
    aggregate broadcast back — two exchanges + a broadcast, no entity
    joins, all JVM."""
    per = (
        df.groupBy(F.col(key_col).alias("key"))
        .agg(
            F.avg(F.when(split, F.col(value_col))).alias("pre"),
            F.avg(F.when(~split, F.col(value_col))).alias("post"),
        )
        .where(F.col("pre").isNotNull() & F.col("post").isNotNull())
    )
    theta = F.try_divide(F.covar_pop("pre", "post"), F.var_pop("pre"))
    stats = F.broadcast(
        per.groupBy(F.lit(1).alias("_g")).agg(
            theta.alias("theta"),
            F.avg("pre").alias("_mx"),
            F.var_pop("post").alias("_vy"),
            (
                F.var_pop("post")
                - F.try_divide(
                    F.covar_pop("pre", "post") * F.covar_pop("pre", "post"),
                    F.var_pop("pre"),
                )
            ).alias("_vadj"),
        )
    )
    adj = F.col("post") - F.col("theta") * (F.col("pre") - F.col("_mx"))
    return per.crossJoin(stats).select(
        "key", "pre", "post",
        adj.alias("post_cuped"),
        "theta",
        (F.lit(1.0) - F.try_divide(F.col("_vadj"), F.col("_vy"))).alias(
            "var_reduction"
        ),
    )


def srm_check(
    df: DataFrame,
    variant_col: str = "variant",
    expected: dict[str, float] | None = None,
) -> DataFrame:
    """Sample-ratio-mismatch chi-square screen → ONE row: (n, k, chi2,
    crit_05, srm_detected). ``expected`` maps variant → intended share
    (defaults to equal shares); χ² = Σ (obs − exp)²/exp over the
    variant counts, compared against the df = k−1 upper-5% critical
    value (exact table for df ≤ 10, Wilson-Hilferty cube approximation
    beyond — closed-form p-values are only available for special df, so
    the screen reports the standard stat-vs-critical decision — the
    universal SRM practice). An SRM firing means the assignment is
    broken and every downstream metric is suspect.

    With ``expected``, the variant UNIVERSE is the expected dict: a
    variant with zero observed traffic (the worst SRM) still
    contributes its (0 − exp)²/exp term and counts toward k/df (outer
    join against the k expected rows — r11 ADVICE), and an observed
    variant absent from ``expected`` raises instead of silently
    vanishing from the sum.

    Plan: one combinable groupBy(variant) (k groups — bounded) + one
    one-row reduce. All JVM."""
    cnt = df.groupBy(F.col(variant_col).alias("_v")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    if expected is not None:
        tot_w = sum(expected.values())
        exp_df = df.sparkSession.createDataFrame(
            [(k_, float(v_) / tot_w) for k_, v_ in expected.items()],
            ["_v", "_share"],
        )
        # full outer: expected-but-unobserved variants keep a zero count
        # (and their chi-square term); observed-but-unexpected raise —
        # the raise lives in the emitted _share column so pruning can't
        # drop it (it feeds the chi-square term)
        cnt = exp_df.join(cnt, "_v", "full_outer").select(
            "_v",
            F.coalesce(F.col("_c"), F.lit(0)).alias("_c"),
            F.when(
                F.col("_share").isNotNull(), F.col("_share")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "srm_check: observed variant missing from"
                            " `expected`: "
                        ),
                        F.col("_v").cast("string"),
                    )
                )
            ).alias("_share"),
        )
        share = F.col("_share")
    else:
        share = None
    # the per-variant expected count needs the total first: a one-row
    # broadcast back onto the k-row count table (k bounded)
    tot = F.broadcast(
        cnt.groupBy(F.lit(1).alias("_g")).agg(
            F.sum("_c").alias("n"), F.count(F.lit(1)).alias("_k")
        ).drop("_g")
    )
    ex = (
        F.col("n").cast("double") * share
        if share is not None
        else F.col("n").cast("double") / F.col("_k").cast("double")
    )
    chi = cnt.crossJoin(tot).select(
        "n", "_k",
        (
            (F.col("_c").cast("double") - ex)
            * (F.col("_c").cast("double") - ex)
            / ex
        ).alias("_t"),
    )
    # exact table for df ≤ 10; Wilson-Hilferty fallback beyond instead
    # of a silent NULL (r11 ADVICE)
    crit = chi2_crit_05(F.col("k") - 1)
    out = chi.groupBy("n", F.col("_k").alias("k")).agg(
        F.sum("_t").alias("chi2")
    )
    return out.select(
        "n", F.col("k").cast("int").alias("k"), "chi2",
        crit.alias("crit_05"),
        (F.col("chi2") > crit).alias("srm_detected"),
    )


def ab_conversion(
    df: DataFrame,
    converted: Column,
    variant_col: str = "variant",
    key_col: str = "key",
) -> DataFrame:
    """Two-variant conversion readout → ONE row per variant PAIR is
    overkill for k = 2, so: one row per variant (variant, n, conv,
    rate, wilson_lo, wilson_hi) plus the pooled two-proportion z-stat
    and |z| > 1.96 decision REPEATED on both rows (they are
    experiment-level). ``converted`` is a boolean Column evaluated per
    entity row — callers pass e.g. "did this user ever purchase".
    Wilson 95% score intervals (the interval that behaves at small n
    and extreme rates, unlike Wald); z from the pooled-proportion
    standard error — NULL (with NULL decision) when the pooled rate is
    exactly 0 or 1, where the z-test is undefined. Exactly 2 variants required — the k-variant
    omnibus is :func:`srm_check`'s chi-square shape applied to
    conversions (not provided; pairwise comparisons after an omnibus
    need multiplicity control — see ``hypothesis.fdr_bh``).

    Plan: one groupBy(key, variant) (entity-grain dedup of
    ``converted``), one groupBy(variant) (2 groups), one two-row
    reduce broadcast back. All JVM, no entity joins."""
    per = df.groupBy(
        F.col(key_col).alias("_k"), F.col(variant_col).alias("variant")
    ).agg(F.max(converted.cast("int")).alias("_c"))
    v = per.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_c").alias("conv"),
    )
    z169 = 1.959963984540054  # Phi^{-1}(0.975)
    n = F.col("n").cast("double")
    p = F.col("conv").cast("double") / n
    z2 = F.lit(z169 * z169)
    center = (p + z2 / (2 * n)) / (1 + z2 / n)
    half = (
        F.lit(z169)
        * F.sqrt(p * (1 - p) / n + z2 / (4 * n * n))
        / (1 + z2 / n)
    )
    v = v.select(
        "variant", "n", "conv",
        p.alias("rate"),
        (center - half).alias("wilson_lo"),
        (center + half).alias("wilson_hi"),
    )
    pooled = F.broadcast(
        v.groupBy(F.lit(1).alias("_g")).agg(
            F.count(F.lit(1)).alias("_nv"),
            F.sum("n").alias("_ntot"),
            F.sum("conv").alias("_ctot"),
            F.min("rate").alias("_pmin"),
            F.max("rate").alias("_pmax"),
            F.min("n").alias("_n1"),
            F.max("n").alias("_n2"),
        )
    )
    j = v.crossJoin(pooled)
    pp = F.col("_ctot").cast("double") / F.col("_ntot").cast("double")
    se = F.sqrt(
        pp
        * (1 - pp)
        * (
            1.0 / F.col("_n1").cast("double")
            + 1.0 / F.col("_n2").cast("double")
        )
    )
    z = F.try_divide(F.col("_pmax") - F.col("_pmin"), se)
    # the guard must live INSIDE an emitted column: a helper column that
    # the final select drops is eliminated by Catalyst column pruning and
    # the raise never fires (r11 ADVICE — reproduced with 3 variants)
    z = F.when(F.col("_nv") == 2, z).otherwise(
        F.raise_error(F.lit("ab_conversion requires exactly 2 variants"))
    )
    return j.select(
        "variant", "n", "conv", "rate", "wilson_lo", "wilson_hi",
        z.alias("z"),
        (z > F.lit(z169)).alias("significant_05"),
    )
