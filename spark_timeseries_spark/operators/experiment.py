"""Experimentation analytics: CUPED variance reduction and
sample-ratio-mismatch detection.

Beyond-reference: the two workhorse checks of any event-log A/B
platform. Both are pure aggregate plans (no joins beyond a one-row
broadcast, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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
    df > 10). Degenerate df ≤ 0 (k = 1 groups) yields NULL, matching
    the table-lookup behavior — the 2/(9df) term would otherwise divide
    by zero. Shared by :func:`srm_check`, the survival log-rank test,
    and any k-group chi-square readout."""
    d = dfree.cast("double")
    z95 = 1.6448536269514722  # Phi^{-1}(0.95)
    wh = F.when(
        d > 0,
        d
        * F.pow(
            1.0 - 2.0 / (9.0 * d) + F.lit(z95) * F.sqrt(2.0 / (9.0 * d)),
            F.lit(3.0),
        ),
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


def msprt(
    df: DataFrame,
    tau2: float = 1.0,
    mu0: float = 0.0,
    sigma2: float | None = None,
    key_col: str = "key",
    order_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Mixture sequential probability ratio test (mSPRT) per metric
    stream → one row per observation: (key, <order_col>, n, mean,
    lambda, p_always, reject_05). The always-valid inference of
    Johari, Koomen, Pekelis & Walsh (KDD 2017): under H₀ μ = ``mu0``
    with a N(0, ``tau2``) mixing prior over the alternative,

        ln Λ_n = ½·ln(σ²/(σ² + nτ²)) + n²τ²(x̄−μ₀)² / (2σ²(σ² + nτ²))

    and p_n = min(1, exp(−max_{i≤n} ln Λ_i)) is an always-valid
    p-value — monotone non-increasing, immune to continuous peeking
    (the failure mode of applying :func:`ab_conversion`'s
    fixed-horizon z at every refresh). Λ is emitted in LOG space
    (``log_lambda``) — the raw likelihood ratio overflows a double as
    soon as the effect is obvious; exp(−max ln Λ) underflows to an
    exact 0 instead. ``sigma2`` NULL-able plug-in: pass a known
    variance, or None to use the RUNNING sample variance (ln Λ is
    NULL until it exists, i.e. n ≥ 2, and p stays 1 there — the
    estimated-variance mSPRT variant, stated).

    Plan: cumulative count/mean/variance windows and a running-min
    window on one (key, order) sort — a single exchange, no joins, all
    JVM."""
    if tau2 <= 0:
        raise ValueError(f"tau2 must be > 0, got {tau2}")
    if sigma2 is not None and sigma2 <= 0:
        raise ValueError(f"sigma2 must be > 0, got {sigma2}")
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    wc = (
        Window.partitionBy(key_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    n = F.count(F.lit(1)).over(wc).cast("double")
    mean = F.avg(v).over(wc)
    s2 = (
        F.lit(float(sigma2))
        if sigma2 is not None
        else F.var_samp(v).over(wc)
    )
    dev = mean - F.lit(float(mu0))
    denom = s2 + n * F.lit(float(tau2))
    # s2 = 0 (a constant prefix) leaves ln(0) undefined — NULL ln-lambda,
    # p carries 1, matching the n=1 running-variance convention
    loglam = F.when(
        s2 > 0,
        0.5 * F.log(F.try_divide(s2, denom))
        + F.try_divide(
            n * n * F.lit(float(tau2)) * dev * dev, 2.0 * s2 * denom
        ),
    )
    d = pts.select(
        F.col(key_col),
        F.col(order_col),
        n.cast("long").alias("n"),
        mean.alias("mean"),
        loglam.alias("log_lambda"),
    )
    p = F.coalesce(
        F.least(
            F.lit(1.0), F.exp(-F.max(F.col("log_lambda")).over(wc))
        ),
        F.lit(1.0),
    )
    return d.select(
        key_col, order_col, "n", "mean", "log_lambda",
        p.alias("p_always"),
        (p <= 0.05).alias("reject_05"),
    )


def ab_power(
    df: DataFrame,
    converted: Column,
    variant_col: str = "variant",
    key_col: str = "key",
) -> DataFrame:
    """Two-proportion sensitivity readout → ONE row: (n_a, n_b,
    rate_a, rate_b, diff, se, z, mde_abs_80, mde_rel_80). The standard
    "could this experiment have seen anything?" companion of
    :func:`ab_conversion`: the minimum detectable effect at α = .05
    two-sided / 80% power is MDE = (z_{.975} + z_{.80})·SE with the
    unpooled standard error SE = √(p̂ₐ(1−p̂ₐ)/nₐ + p̂ᵦ(1−p̂ᵦ)/nᵦ);
    ``mde_rel_80`` divides by the baseline rate of variant a (the
    lexicographically smaller label, stated). z uses the same unpooled
    SE (NULL when both rates are degenerate). Exactly 2 variants
    required — the guard lives in emitted columns (the
    :func:`ab_conversion` pruning lesson).

    Plan: groupBy(key, variant) entity dedup, groupBy(variant)
    (2 rows), one two-row reduce. All JVM."""
    per = df.groupBy(
        F.col(key_col).alias("_k"), F.col(variant_col).alias("variant")
    ).agg(F.max(converted.cast("int")).alias("_c"))
    v = per.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n"), F.sum("_c").alias("conv")
    )
    one = v.groupBy(F.lit(1).alias("_j")).agg(
        F.count(F.lit(1)).alias("_nv"),
        F.min_by(F.struct("n", "conv"), "variant").alias("_a"),
        F.max_by(F.struct("n", "conv"), "variant").alias("_b"),
    )
    z975 = 1.959963984540054
    z80 = 0.8416212335729143  # Phi^{-1}(0.80)
    na = F.col("_a.n").cast("double")
    nb = F.col("_b.n").cast("double")
    pa = F.col("_a.conv").cast("double") / na
    pb = F.col("_b.conv").cast("double") / nb
    se = F.sqrt(pa * (1 - pa) / na + pb * (1 - pb) / nb)
    guard = F.when(
        F.col("_nv") == 2, F.lit(1.0)
    ).otherwise(
        F.raise_error(F.lit("ab_power requires exactly 2 variants"))
    )
    mde = guard * F.lit(z975 + z80) * se
    return one.select(
        F.col("_a.n").alias("n_a"),
        F.col("_b.n").alias("n_b"),
        pa.alias("rate_a"),
        pb.alias("rate_b"),
        (pb - pa).alias("diff"),
        se.alias("se"),
        F.try_divide(pb - pa, se).alias("z"),
        mde.alias("mde_abs_80"),
        F.try_divide(mde, pa).alias("mde_rel_80"),
    )


def eb_shrinkage(
    df: DataFrame,
    key_col: str = "key",
    trials_col: str = "trials",
    successes_col: str = "successes",
) -> DataFrame:
    """Empirical-Bayes beta-binomial shrinkage of per-key rates → one
    row per key: (key, trials, successes, rate, alpha, beta, rate_eb).
    The cure for small-sample league tables (a 1/1 key outranking a
    970/1000 key): fit a Beta(α, β) prior to the OBSERVED rate
    distribution by method of moments — with m and v the mean and
    population variance of the per-key rates, c = m(1−m)/v − 1,
    α = mc, β = (1−m)c — then shrink every key toward the prior mean:
    rate_eb = (s + α)/(t + α + β) (Robbins 1956 empirical Bayes;
    Efron & Morris 1975). When the rates are (near-)constant or
    over-dispersed past the beta envelope (v = 0 or c ≤ 0) the prior
    is undefined: α/β/rate_eb are NULL (documented — callers fall back
    to the raw rate). Zero-trial keys pass through with NULL rate and
    rate_eb = prior mean α/(α+β) (the no-data posterior).

    Plan: one groupBy(key) (or none if pre-aggregated), ONE one-row
    moment aggregate over the rates broadcast back — no key joins."""
    t = F.col(trials_col).cast("double")
    s = F.col(successes_col).cast("double")
    base = df.select(
        F.col(key_col).alias("key"),
        F.col(trials_col).cast("long").alias("trials"),
        F.col(successes_col).cast("long").alias("successes"),
        F.try_divide(s, t).alias("rate"),
    )
    m = F.avg("rate")
    vv = F.var_pop("rate")
    c = F.try_divide(m * (1 - m), vv) - 1.0
    # Global .agg (not groupBy(lit(1))): yields exactly ONE row even when
    # every key has zero trials (all rates NULL — avg/var_pop skip NULLs),
    # so the crossJoin below never empties the base rows; alpha/beta are
    # NULL and zero-trial keys keep their documented pass-through contract.
    prior = F.broadcast(
        base.agg(
            F.when(c > 0, m * c).alias("alpha"),
            F.when(c > 0, (1 - m) * c).alias("beta"),
        )
    )
    a, b = F.col("alpha"), F.col("beta")
    return base.crossJoin(prior).select(
        "key", "trials", "successes", "rate", "alpha", "beta",
        F.try_divide(
            F.col("successes").cast("double") + a,
            F.col("trials").cast("double") + a + b,
        ).alias("rate_eb"),
    )


def diff_in_diff(
    df: DataFrame,
    treated: Column,
    post: Column,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Two-period two-group difference-in-differences → ONE row:
    (n, mean_c_pre, mean_c_post, mean_t_pre, mean_t_post, did, se, z).
    The workhorse quasi-experimental estimator (Card & Krueger 1994
    canonical form): entities are first collapsed to one mean outcome
    per (entity, period) cell, then
    DID = (ȳ_T,post − ȳ_T,pre) − (ȳ_C,post − ȳ_C,pre) with the
    four-cell unpooled SE = √(Σ s²_gp/n_gp) over ENTITY-level means
    (sample variance; the parallel-trends assumption is the caller's
    burden, stated). z = DID/SE, NULL when any cell is empty or
    degenerate.

    Plan: groupBy(key, treated, post) entity-cell means, one 4-row
    reduce. All JVM, no joins."""
    cells = df.groupBy(
        F.col(key_col).alias("_k"),
        treated.cast("int").alias("_t"),
        post.cast("int").alias("_p"),
    ).agg(F.avg(F.col(value_col)).alias("_y"))
    g = cells.groupBy("_t", "_p").agg(
        F.count(F.lit(1)).alias("_n"),
        F.avg("_y").alias("_m"),
        F.var_samp("_y").alias("_v"),
    )
    one = g.groupBy(F.lit(1).alias("_j")).agg(
        F.sum("_n").alias("n"),
        *[
            F.first(
                F.when(
                    (F.col("_t") == t_) & (F.col("_p") == p_),
                    F.col(f"_{c_}"),
                ),
                ignorenulls=True,
            ).alias(f"_{c_}{t_}{p_}")
            for t_ in (0, 1)
            for p_ in (0, 1)
            for c_ in ("m", "v", "n")
        ],
    )
    did = (F.col("_m11") - F.col("_m10")) - (
        F.col("_m01") - F.col("_m00")
    )
    se = F.sqrt(
        F.try_divide(F.col("_v00"), F.col("_n00").cast("double"))
        + F.try_divide(F.col("_v01"), F.col("_n01").cast("double"))
        + F.try_divide(F.col("_v10"), F.col("_n10").cast("double"))
        + F.try_divide(F.col("_v11"), F.col("_n11").cast("double"))
    )
    return one.select(
        "n",
        F.col("_m00").alias("mean_c_pre"),
        F.col("_m01").alias("mean_c_post"),
        F.col("_m10").alias("mean_t_pre"),
        F.col("_m11").alias("mean_t_post"),
        did.alias("did"),
        se.alias("se"),
        F.try_divide(did, se).alias("z"),
    )


def cohens_d(
    df: DataFrame,
    group_col: str = "variant",
    value_col: str = "value",
) -> DataFrame:
    """Standardized two-group effect size → ONE row: (n1, n2, mean1,
    mean2, sd_pooled, d, g, se, ci_lo, ci_hi). d = (x̄₂ − x̄₁)/s_p
    with the pooled SAMPLE sd s_p = √(((n₁−1)s₁² + (n₂−1)s₂²)/
    (n₁+n₂−2)) (Cohen 1988); g applies Hedges' small-sample bias
    correction J = 1 − 3/(4(n₁+n₂) − 9) (Hedges 1981); se is the
    standard large-sample SE √((n₁+n₂)/(n₁n₂) + d²/(2(n₁+n₂))) and
    the CI is d ± 1.96·se. Group 1 = the lexicographically smaller
    group value (stated; flip the sign for the other direction).
    Exactly two groups required — raises otherwise (the srm_check
    discipline: a silent subset would misattribute the effect). NULL
    d/g/se/CI when either group is degenerate (n < 2 or s_p = 0).

    The missing third leg of the experiment readout: ab_conversion
    tests significance of proportions, :func:`ab_power` sizes the
    experiment, this measures HOW BIG a continuous-metric effect is
    on the scale every power calculation consumes.

    Empty-input contract: an EMPTY (or all-NULL-value) input yields
    ZERO rows, not a NULL-statistic row — the groupBy(lit(1)) reduce
    has nothing to group (module convention for pure one-row test
    readouts; see the log_rank class). Callers that crossJoin the
    result against base rows need a global ``.agg`` instead (the
    eb_shrinkage rule).

    Plan: ONE map-side-combinable groupBy(group) aggregate, then a
    2-row reduce. No windows, no joins, no Python."""
    g = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.avg(F.col(value_col).cast("double")).alias("_m"),
            F.var_samp(F.col(value_col).cast("double")).alias("_v"),
        )
    )
    w = Window.partitionBy(F.lit(1)).orderBy("_g")
    r = g.select(
        F.row_number().over(w).alias("_i"), "_g", "_n", "_m", "_v"
    )
    agg = r.groupBy(F.lit(1).alias("_j")).agg(
        F.count(F.lit(1)).alias("_k"),
        F.max(F.when(F.col("_i") == 1, F.col("_n"))).alias("n1"),
        F.max(F.when(F.col("_i") == 2, F.col("_n"))).alias("n2"),
        F.max(F.when(F.col("_i") == 1, F.col("_m"))).alias("mean1"),
        F.max(F.when(F.col("_i") == 2, F.col("_m"))).alias("mean2"),
        F.max(F.when(F.col("_i") == 1, F.col("_v"))).alias("_v1"),
        F.max(F.when(F.col("_i") == 2, F.col("_v"))).alias("_v2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    sp = F.sqrt(
        F.try_divide(
            (n1 - 1.0) * F.col("_v1") + (n2 - 1.0) * F.col("_v2"),
            n1 + n2 - 2.0,
        )
    )
    d = F.try_divide(F.col("mean2") - F.col("mean1"), sp)
    nn = n1 + n2
    jcorr = 1.0 - 3.0 / (4.0 * nn - 9.0)
    se = F.sqrt(
        F.try_divide(nn, n1 * n2) + F.try_divide(d * d, 2.0 * nn)
    )
    return agg.select(
        # the k-check lives INSIDE the emitted n1 column (the srm_check
        # raise_error pattern) so column pruning can't optimize it away
        F.when(F.col("_k") == 2, F.col("n1"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit("cohens_d needs exactly 2 groups, got "),
                    F.col("_k").cast("string"),
                )
            )
        )
        .alias("n1"),
        "n2", "mean1", "mean2",
        sp.alias("sd_pooled"),
        d.alias("d"),
        (d * jcorr).alias("g"),
        se.alias("se"),
        (d - 1.96 * se).alias("ci_lo"),
        (d + 1.96 * se).alias("ci_hi"),
    )


def odds_ratio(
    df: DataFrame,
    exposed: Column,
    outcome: Column,
) -> DataFrame:
    """2×2 association readout → ONE row: (n, n11, n10, n01, n00,
    odds_ratio, or_ci_lo, or_ci_hi, relative_risk, rr_ci_lo,
    rr_ci_hi). With a = exposed∧outcome, b = exposed∧¬outcome,
    c = ¬exposed∧outcome, d = neither: OR = ad/bc with the Woolf
    (1955) log CI exp(ln OR ± 1.96·√(1/a+1/b+1/c+1/d));
    RR = (a/(a+b))/(c/(c+d)) with the Katz (1978) log CI
    exp(ln RR ± 1.96·√(b/(a(a+b)) + d/(c(c+d)))). The effect-scale
    companion of :func:`ab_conversion`'s z-test (which answers "is
    there an effect", not "how big") and the 2×2 special case
    :func:`~.hypothesis.cramers_v` only sizes symmetrically. Any
    empty margin cell → NULL estimate/CI (try_divide + ln guards —
    add 0.5 Haldane-style upstream if zero cells are expected). NULL
    exposure/outcome rows are dropped (stated).

    Plan: ONE map-side-combinable aggregate of four cell counts. No
    windows, no joins, no Python."""
    e = exposed.cast("boolean")
    o = outcome.cast("boolean")
    pts = df.where(e.isNotNull() & o.isNotNull())
    agg = pts.groupBy(F.lit(1).alias("_j")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((e & o).cast("long")).alias("n11"),
        F.sum((e & ~o).cast("long")).alias("n10"),
        F.sum((~e & o).cast("long")).alias("n01"),
        F.sum((~e & ~o).cast("long")).alias("n00"),
    )
    a = F.col("n11").cast("double")
    b = F.col("n10").cast("double")
    c = F.col("n01").cast("double")
    d = F.col("n00").cast("double")
    orr = F.try_divide(a * d, b * c)
    # ln guard: a zero/NULL ratio must yield NULL CI, not an ANSI abort
    ln_or = F.when(orr > 0.0, F.log(orr))
    se_or = F.sqrt(
        F.try_divide(F.lit(1.0), a) + F.try_divide(F.lit(1.0), b)
        + F.try_divide(F.lit(1.0), c) + F.try_divide(F.lit(1.0), d)
    )
    rr = F.try_divide(
        F.try_divide(a, a + b), F.try_divide(c, c + d)
    )
    ln_rr = F.when(rr > 0.0, F.log(rr))
    se_rr = F.sqrt(
        F.try_divide(b, a * (a + b)) + F.try_divide(d, c * (c + d))
    )
    return agg.select(
        "n", "n11", "n10", "n01", "n00",
        orr.alias("odds_ratio"),
        F.exp(ln_or - 1.96 * se_or).alias("or_ci_lo"),
        F.exp(ln_or + 1.96 * se_or).alias("or_ci_hi"),
        rr.alias("relative_risk"),
        F.exp(ln_rr - 1.96 * se_rr).alias("rr_ci_lo"),
        F.exp(ln_rr + 1.96 * se_rr).alias("rr_ci_hi"),
    )
