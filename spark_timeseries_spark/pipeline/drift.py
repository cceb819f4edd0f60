"""Numeric distribution-drift scoring between two cohorts.

Beyond-reference; the data-quality gate a training pipeline runs when a
new crawl snapshot (or a new day of telemetry) lands: has the
distribution of a numeric feature moved against the reference cohort?
Implements the Population Stability Index (PSI — the standard credit-
scoring drift metric, e.g. Siddiqi 2006) over equal-width bins:

    PSI = Σ_i (q_i − p_i) · ln(q_i / p_i)

with p from the reference cohort and q from the current one. Rule of
thumb: < 0.1 stable, 0.1–0.25 moderate shift, > 0.25 investigate.

Equal-width bins (not reference quantiles) are deliberate: bin edges
are closed-form from (lo, hi, bins), so the binning is exact, engine-
independent, and oracle-replayable; quantile edges would couple the
metric to an engine's interpolation. Values outside [lo, hi] clamp to
the end bins (they count — tail drift is drift). Empty bins are
smoothed by flooring each proportion at ``eps`` (the standard PSI
fix — ln(q/p) is undefined on empty cells).

Plan: two single-pass groupBy-bin counts (each output ≤ ``bins``
rows — KB-scale regardless of input size), one broadcast-sized
full-outer join on bin id, one fold. When (lo, hi) aren't supplied
they come from ONE bounded aggregate over the reference (2 scalars to
the driver — the only materialization, same class as the engine's
other bounded transfers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["psi_bins", "psi", "gini", "ks_test", "embedding_drift", "benford",
           "hellinger"]


def _bin(col: F.Column, lo: float, width: float, bins: int) -> F.Column:
    raw = F.floor((col - F.lit(lo)) / F.lit(width))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(bins - 1))


def _fractions(
    df: DataFrame, value_col: str, lo: float, width: float, bins: int,
    out: str,
) -> DataFrame:
    v = F.col(value_col)
    counts = (
        df.where(v.isNotNull())
        .groupBy(_bin(v, lo, width, bins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    # counts is ≤ `bins` rows — the unpartitioned window is a single
    # KB-scale task, not a corpus-wide single-partition hazard
    total = F.sum("_c").over(Window.partitionBy())
    return counts.select("bin", (F.col("_c") / total).alias(out))


def psi_bins(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "value",
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    eps: float = 1e-4,
) -> DataFrame:
    """Per-bin PSI decomposition → (bin, p_ref, p_cur, contrib), one row
    per occupied bin id in either cohort (missing side floored at
    ``eps``). ``sum(contrib)`` is the PSI; :func:`psi` does that fold.
    NULL values are excluded from both cohorts (drift in nullness is a
    different metric)."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    if (lo is None) != (hi is None):
        raise ValueError("supply both lo and hi, or neither")
    if lo is None:
        row = ref.where(F.col(value_col).isNotNull()).agg(
            F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
        ).collect()[0]
        lo, hi = float(row["lo"]), float(row["hi"])
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    width = (hi - lo) / bins
    p = _fractions(ref, value_col, lo, width, bins, "p_ref")
    q = _fractions(cur, value_col, lo, width, bins, "q_cur")
    j = p.join(q, "bin", "full").select(
        "bin",
        F.coalesce("p_ref", F.lit(0.0)).alias("p_ref"),
        F.coalesce("q_cur", F.lit(0.0)).alias("p_cur"),
    )
    pe = F.greatest(F.col("p_ref"), F.lit(eps))
    qe = F.greatest(F.col("p_cur"), F.lit(eps))
    return j.withColumn("contrib", (qe - pe) * F.log(qe / pe))


def psi(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "value",
    bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
    eps: float = 1e-4,
) -> DataFrame:
    """Scalar PSI → one row (psi, n_bins). See :func:`psi_bins`."""
    b = psi_bins(ref, cur, value_col, bins, lo, hi, eps)
    return b.agg(
        F.sum("contrib").alias("psi"),
        F.count(F.lit(1)).alias("n_bins"),
    )


def gini(
    df: DataFrame,
    group_cols: list[str] | None = None,
    value_col: str = "value",
) -> DataFrame:
    """Gini concentration coefficient of a nonnegative quantity per
    group → (group…, n, total, gini): 0 = perfectly even, →1 = one row
    holds everything. The mixture-audit metric for a training corpus —
    e.g. how concentrated token counts are across sources, or documents
    across domains (a Zipf-ish corpus scores high; a curated balanced
    mix low). Uses the rank formula over the ascending sort,

        G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n,

    which is tie-invariant (equal values occupy a fixed rank SET, and
    the sum over that set doesn't depend on their order — so float-sort
    nondeterminism can't change the result). NULLs are excluded; a
    group with Σx = 0 or a negative value yields NULL (Gini is
    undefined there, and silently clamping would hide a data bug).

    Plan: one rank window + one aggregate per group — a single exchange
    on the group keys; no driver state, no self-join."""
    group_cols = group_cols or []
    v = F.col(value_col)
    w = Window.partitionBy(*group_cols).orderBy(value_col)
    ranked = df.where(v.isNotNull()).withColumn(
        "_i", F.row_number().over(w).cast("double")
    )
    agg = ranked.groupBy(*group_cols).agg(
        F.count(v).alias("n"),
        F.sum(v).alias("total"),
        F.sum(F.col("_i") * v).alias("_iw"),
        F.min(v).alias("_lo"),
    )
    n = F.col("n").cast("double")
    g = 2.0 * F.col("_iw") / (n * F.col("total")) - (n + 1.0) / n
    return agg.select(
        *group_cols,
        "n",
        "total",
        F.when((F.col("total") > 0) & (F.col("_lo") >= 0), g).alias("gini"),
    )


def ks_test(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "value",
    terms: int = 100,
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift test → one row (n_ref, n_cur,
    d_stat, p_value): D = sup|F̂_ref − F̂_cur| over the pooled support,
    p from the asymptotic Kolmogorov tail Q(λ) = 2·Σ_k (−1)^{k−1}
    e^{−2k²λ²} with λ = D·√(nm/(n+m)) (Smirnov 1948; ``terms`` series
    terms — it converges in a handful). The distribution-shape
    complement of :func:`psi_bins`: PSI sees binned mass, KS sees the
    single worst CDF gap and comes with a p-value.

    D is computed from integer rank counts (one groupBy per distinct
    value + one ordered cumulative), so the statistic is exact and
    engine-independent; only the p-value's exp() needs rounding
    tolerance. The ECDF cumulative runs as ONE ordered window over the
    DISTINCT pooled values — fine for metric-like columns whose distinct
    cardinality is bounded; for a continuous column at corpus scale,
    quantize first (the PSI/binning route exists for exactly that
    reason — documented trade, not an accident)."""
    a = ref.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("_v"), F.lit(1).alias("_r"),
        F.lit(0).alias("_c"),
    )
    b = cur.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("_v"), F.lit(0).alias("_r"),
        F.lit(1).alias("_c"),
    )
    u = (
        a.unionByName(b)
        .groupBy("_v")
        .agg(F.sum("_r").alias("_nr"), F.sum("_c").alias("_nc"))
    )
    wc = Window.orderBy("_v").rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy()
    ecdf = u.select(
        (
            F.sum("_nr").over(wc) / F.sum("_nr").over(wt)
            - F.sum("_nc").over(wc) / F.sum("_nc").over(wt)
        ).alias("_gap"),
        F.sum("_nr").over(wt).alias("_tn"),
        F.sum("_nc").over(wt).alias("_tm"),
    )
    agg = ecdf.groupBy().agg(
        F.max(F.abs(F.col("_gap"))).alias("d_stat"),
        F.max("_tn").alias("n_ref"),
        F.max("_tm").alias("n_cur"),
    )
    n = F.col("n_ref").cast("double")
    m = F.col("n_cur").cast("double")
    lam = F.col("d_stat") * F.sqrt(n * m / (n + m))
    p = 2.0 * F.aggregate(
        F.sequence(F.lit(1), F.lit(terms)),
        F.lit(0.0),
        lambda acc, k: acc
        + F.pow(F.lit(-1.0), (k - 1).cast("double"))
        * F.exp(-2.0 * k.cast("double") * k.cast("double") * lam * lam),
    )
    # the alternating series representation oscillates for tiny lambda
    # (it converges to Q(lam) only term-by-slow-term there), but Q(lam)
    # is 1 to ~5e-13 for lam <= 0.2 (dual theta-function form) — gate it
    p = F.when(lam <= 0.2, 1.0).otherwise(
        F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0))
    )
    return agg.select("n_ref", "n_cur", "d_stat", p.alias("p_value"))


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
    bins: int = 10,
    eps: float = 1e-4,
) -> DataFrame:
    """Embedding-space drift between two snapshots → one row (n_ref,
    n_cur, centroid_cosine, norm_psi): has a re-embedded (or newly
    crawled) corpus MOVED in vector space? ``centroid_cosine`` is the
    cosine between the two per-dimension mean vectors (1 = same
    direction; semantic drift pulls it down); ``norm_psi`` is the
    :func:`psi` of the L2-norm distributions (catches scale/calibration
    shifts — a re-trained encoder often changes norms before it changes
    directions). Elements are cast to double BEFORE any arithmetic so
    float32 storage cannot produce engine-dependent promotion.

    Plan: per-dimension means via posexplode + a d-group aggregate
    (map-side combined — n·d exploded rows collapse to d per cohort),
    the cosine via one d-row join; norms are row-local folds feeding the
    bounded PSI pipeline. No driver state beyond PSI's two scalars."""
    d_ref = _dim_means(ref, vec_col, "m_ref")
    d_cur = _dim_means(cur, vec_col, "m_cur")
    cos = (
        d_ref.join(d_cur, "_pos")
        .agg(
            F.sum(F.col("m_ref") * F.col("m_cur")).alias("_dot"),
            F.sum(F.col("m_ref") * F.col("m_ref")).alias("_na"),
            F.sum(F.col("m_cur") * F.col("m_cur")).alias("_nb"),
        )
        .select(
            F.try_divide(
                F.col("_dot"), F.sqrt(F.col("_na")) * F.sqrt(F.col("_nb"))
            ).alias("centroid_cosine")
        )
    )
    norms_ref = _norms(ref, vec_col)
    norms_cur = _norms(cur, vec_col)
    counts = norms_ref.agg(
        F.count(F.lit(1)).alias("n_ref")
    ).crossJoin(norms_cur.agg(F.count(F.lit(1)).alias("n_cur")))
    p = psi(norms_ref, norms_cur, "value", bins, eps=eps).select(
        F.col("psi").alias("norm_psi")
    )
    return counts.crossJoin(cos).crossJoin(p)


def _dim_means(df: DataFrame, vec_col: str, out: str) -> DataFrame:
    v = F.col(vec_col)
    return (
        df.where(v.isNotNull())
        .select(F.posexplode(v).alias("_pos", "_x"))
        .groupBy("_pos")
        .agg(F.avg(F.col("_x").cast("double")).alias(out))
    )


def _norms(df: DataFrame, vec_col: str) -> DataFrame:
    v = F.col(vec_col)
    sq = F.aggregate(
        v,
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return df.where(v.isNotNull()).select(F.sqrt(sq).alias("value"))


def benford(
    df: DataFrame,
    value_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """First-significant-digit profile vs Benford's law per group →
    (group, digit 1-9, n_digit, observed, expected) + the group-level
    conformance stats repeated on each row: ``mad`` (mean absolute
    deviation of the nine frequencies — Nigrini's gauge: < 0.006 close,
    > 0.015 nonconformity) and ``chi2`` (n·Σ(obs−exp)²/exp, 8 df). The
    classic anomaly screen for invented numbers (fabricated amounts,
    default-filled gauges, unit mix-ups) over any positive measure
    column; zero/negative/NULL values are excluded (no first digit).

    First digit via floor(v / 10^floor(log10 v)) — pure arithmetic, no
    string casts, so both engines agree bit-for-bit on the digit.

    Plan: one map-side-combinable groupBy(group, digit) + one
    group-partitioned window for the totals/MAD — scales like a word
    count."""
    v = F.col(value_col).cast("double")
    base = df.where(v.isNotNull() & (v > 0))
    g = F.col(group_col) if group_col else F.lit("all")
    digit = F.floor(v / F.pow(F.lit(10.0), F.floor(F.log10(v)))).cast("int")
    cnt = (
        base.select(g.alias("group"), digit.alias("digit"))
        .groupBy("group", "digit")
        .agg(F.count(F.lit(1)).alias("n_digit"))
    )
    wg = Window.partitionBy("group")
    exp = F.log10(1.0 + 1.0 / F.col("digit").cast("double"))
    d = (
        cnt.withColumn("_n", F.sum("n_digit").over(wg))
        .withColumn(
            "observed", F.col("n_digit").cast("double") / F.col("_n")
        )
        .withColumn("expected", exp)
    )
    # groups can MISS digits entirely; their |0 - exp| must still count
    # toward MAD/chi2, so fold the absent-digit mass in closed form:
    # sum over missing d of exp_d = 1 - sum over present d of exp_d
    dev = F.abs(F.col("observed") - F.col("expected"))
    mad = (
        F.sum(dev).over(wg)
        + (1.0 - F.sum(F.col("expected")).over(wg))
    ) / 9.0
    chi2_present = F.sum(
        F.pow(F.col("observed") - F.col("expected"), F.lit(2.0))
        / F.col("expected")
    ).over(wg)
    chi2_missing = 1.0 - F.sum(F.col("expected")).over(wg)
    chi2 = F.col("_n") * (chi2_present + chi2_missing)
    return (
        d.withColumn("mad", mad)
        .withColumn("chi2", chi2)
        .select(
            "group", "digit", "n_digit", "observed", "expected",
            "mad", "chi2",
        )
    )


def mix_drift(
    df: DataFrame,
    bucket_unit: str = "day",
    ts_col: str = "ts",
    cat_col: str = "event_type",
) -> DataFrame:
    """Per-bucket categorical-mix drift → (bucket, n, n_cats, chi2):
    the χ² statistic of each time bucket's category counts against the
    CORPUS-WIDE mix (expected count = bucket total × corpus share) —
    the "did the event-type mix shift today" alarm (compare χ² to the
    n_cats_corpus − 1 df quantile downstream; a category absent from a
    bucket still contributes its expected mass, which is why the
    per-bucket join is on the corpus category table, LEFT from it).
    ``n_cats`` counts categories OBSERVED in the bucket.

    Plan: one (bucket, cat) aggregate + a broadcast of the (tiny)
    corpus category-share table joined against the per-bucket totals —
    scales like a word count, no windows over raw events."""
    bucket = F.date_trunc(bucket_unit, F.col(ts_col)).alias("bucket")
    bc = df.groupBy(bucket, F.col(cat_col).alias("_c")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    corpus = df.groupBy(F.col(cat_col).alias("_c")).agg(
        F.count(F.lit(1)).alias("_cn")
    )
    tot = df.agg(F.count(F.lit(1)).alias("_tot"))
    share = F.broadcast(
        corpus.join(F.broadcast(tot)).select(
            "_c", (F.col("_cn").cast("double") / F.col("_tot")).alias("_p")
        )
    )
    btot = bc.groupBy("bucket").agg(
        F.sum("_n").alias("_bt"),
        F.count(F.lit(1)).alias("n_cats"),
    )
    # every (bucket, corpus category) cell — absent observed = 0
    grid = btot.crossJoin(share)
    cells = grid.join(bc, ["bucket", "_c"], "left").select(
        "bucket", "_bt", "n_cats",
        F.coalesce(F.col("_n"), F.lit(0)).cast("double").alias("_o"),
        (F.col("_bt").cast("double") * F.col("_p")).alias("_e"),
    )
    return cells.groupBy("bucket").agg(
        F.min("_bt").alias("n"),
        F.min("n_cats").alias("n_cats"),
        F.sum(
            (F.col("_o") - F.col("_e")) * (F.col("_o") - F.col("_e"))
            / F.col("_e")
        ).alias("chi2"),
    )


def wasserstein_halves(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """1-Wasserstein (earth-mover) distance between each series' first
    and second half in time order → one row per key: (key, n1, n2, w1,
    w1_norm). W₁ = ∫|F₁(x) − F₂(x)|dx over the merged support — the
    METRIC companion of :func:`ks_test`'s sup-norm (KS sees only the
    single worst gap; W₁ integrates every gap, so a small-but-everywhere
    drift that KS shrugs off still scores) and of
    :func:`~..operators.hypothesis.mann_whitney_halves`' rank test
    (which gives a p-value but no magnitude in value units). w1_norm
    divides by the merged value range (scale-free, NULL for a constant
    series — try_divide). The half split is the fixed midpoint
    (⌈n/2⌉ first — the mann_whitney convention).

    Exact, not binned: both empirical CDFs are step functions, so the
    integral is Σᵢ |F₁(xᵢ) − F₂(xᵢ)|·(xᵢ₊₁ − xᵢ) over the merged
    sorted points — tie order inside equal values cannot matter
    (their Δx is 0).

    Plan: one time row-number window + one value-ordered cumulative
    window + ONE aggregate per key — all JVM, no join, no binning
    error."""
    v = F.col(value_col)
    pts = df.where(v.isNotNull())
    wt = Window.partitionBy(key_col).orderBy(ts_col)
    wn = Window.partitionBy(key_col)
    d = pts.select(
        F.col(key_col).alias("_k"),
        v.alias("_v"),
        F.col(ts_col).alias("_ts"),
        (
            F.row_number().over(wt)
            <= F.ceil(F.count(F.lit(1)).over(wn) / 2.0)
        ).alias("_g1"),
    )
    wv = Window.partitionBy("_k").orderBy("_v", "_ts")
    wk = Window.partitionBy("_k")
    c = (
        d.withColumn("_n1", F.sum(F.col("_g1").cast("long")).over(wk))
        .withColumn("_n2", F.sum((~F.col("_g1")).cast("long")).over(wk))
        .withColumn("_c1", F.sum(F.col("_g1").cast("long")).over(wv))
        .withColumn("_c2", F.sum((~F.col("_g1")).cast("long")).over(wv))
        .withColumn("_nx", F.lead("_v").over(wv))
    )
    gap = F.abs(
        F.col("_c1").cast("double") / F.col("_n1").cast("double")
        - F.col("_c2").cast("double") / F.col("_n2").cast("double")
    )
    seg = F.when(
        F.col("_nx").isNotNull(), gap * (F.col("_nx") - F.col("_v"))
    ).otherwise(F.lit(0.0))
    agg = c.groupBy(F.col("_k").alias(key_col)).agg(
        F.first("_n1").alias("n1"),
        F.first("_n2").alias("n2"),
        F.sum(seg).alias("w1"),
        (F.max("_v") - F.min("_v")).alias("_range"),
    )
    return agg.select(
        key_col, "n1", "n2", "w1",
        F.try_divide(F.col("w1"), F.col("_range")).alias("w1_norm"),
    )


def group_rank_gap(
    df: DataFrame,
    value_col: str,
    group_col: str = "source",
) -> DataFrame:
    """Which group drags the metric? Rank-sum comparison of EACH group
    against all other rows → one row per group: (group, n, mean_value,
    u1, z). z is the tie-corrected Mann-Whitney normal approximation
    (the :func:`~..operators.hypothesis.mann_whitney_halves` machinery
    with group-vs-rest instead of half-vs-half, same ±0.5 continuity
    correction): strongly negative z = the group's values rank LOW
    against the rest of the corpus — the "which source is dragging
    quality" question answered distribution-free, immune to the heavy
    tails that make per-source means lie. NULL z when every value is
    tied or the group is the whole corpus.

    Plan: ONE global mid-rank window over (value, group) + one group
    aggregate. The global rank is a single-task sort — the stated
    diagnostic-scale trade (the ``quality_token_curve`` precedent);
    at corpus scale pre-bucket values (approx_percentile cuts) and
    rank within buckets."""
    v = F.col(value_col)
    pts = df.where(v.isNotNull() & F.col(group_col).isNotNull())
    wo = Window.partitionBy(F.lit(1)).orderBy(value_col)
    wt = Window.partitionBy(value_col)
    wall = Window.partitionBy(F.lit(1))
    d = pts.select(
        F.col(group_col),
        v.alias("_v"),
        (
            F.rank().over(wo)
            + (F.count(F.lit(1)).over(wt) - 1) / 2.0
        ).alias("_r"),
        F.count(F.lit(1)).over(wt).alias("_t"),
        F.count(F.lit(1)).over(wall).alias("_nn"),
    ).withColumn(
        # two stages: window functions cannot nest in one expression
        "_tsum_all",
        F.sum(F.col("_t") * F.col("_t") - 1).over(wall),
    )
    g = d.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("_v").alias("mean_value"),
        F.sum("_r").alias("_r1"),
        F.first("_nn").alias("_nn"),
        F.first("_tsum_all").alias("_ts"),
    )
    n1 = F.col("n").cast("double")
    nn = F.col("_nn").cast("double")
    n2 = nn - n1
    u1 = F.col("_r1") - n1 * (n1 + 1.0) / 2.0
    mu = n1 * n2 / 2.0
    sigma = F.sqrt(
        n1
        * n2
        / 12.0
        * ((nn + 1.0) - F.col("_ts").cast("double") / (nn * (nn - 1.0)))
    )
    dev = u1 - mu
    corrected = F.signum(dev) * F.greatest(F.abs(dev) - 0.5, F.lit(0.0))
    return g.select(
        group_col,
        "n",
        "mean_value",
        u1.alias("u1"),
        F.try_divide(corrected, sigma).alias("z"),
    )


def hellinger(
    df: DataFrame,
    group_col: str = "group",
    value_col: str = "value",
) -> DataFrame:
    """Hellinger distance between two groups' DISCRETE value
    distributions → ONE row: (n1, n2, bc, hellinger, bhattacharyya).
    BC = Σ√(p_v·q_v) is the Bhattacharyya coefficient over the shared
    value grid (values one side never takes contribute 0);
    H = √(1 − BC) ∈ [0, 1] (Hellinger 1909) — a bounded, symmetric
    distribution distance that, unlike KL, never blows up on
    zero-probability bins and, unlike :func:`psi`, is a true metric;
    ``bhattacharyya`` = −ln BC is its unbounded companion. Pre-bin a
    continuous column (the operator treats values as categories — the
    psi_bins caveat). Group 1 = the lexicographically smaller group
    value; exactly two groups required (raises, the srm_check
    discipline). NULL values AND NULL-group rows are dropped (a NULL
    group belongs to neither cohort); empty input → ZERO rows.

    Plan: one groupBy(value) full-data pass with conditional group
    counts (group-cardinality gate embedded, the energy_distance
    pattern) + ONE reduce on the value grid. No joins beyond the
    one-row broadcast gate, no windows, no Python."""
    v = F.col(value_col)
    pts = df.where(
        v.isNotNull() & F.col(group_col).isNotNull()
    ).select(F.col(group_col).alias("_g"), v.alias("_v"))
    kg = pts.groupBy(F.lit(1).alias("_j")).agg(
        F.countDistinct("_g").alias("_k"),
        F.min("_g").alias("_g1"),
    )
    cells = (
        pts.crossJoin(F.broadcast(kg))
        .select(
            "_v",
            F.when(
                F.col("_k") == 2, (F.col("_g") == F.col("_g1"))
            )
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("hellinger needs exactly 2 groups, got "),
                        F.col("_k").cast("string"),
                    )
                )
            )
            .alias("_isa"),
        )
        .groupBy("_v")
        .agg(
            F.sum(F.col("_isa").cast("long")).alias("_na"),
            F.sum((~F.col("_isa")).cast("long")).alias("_nb"),
        )
    )
    agg = cells.groupBy(F.lit(1).alias("_j")).agg(
        F.sum("_na").alias("_n1"),
        F.sum("_nb").alias("_n2"),
        F.sum(
            F.sqrt(
                F.col("_na").cast("double") * F.col("_nb").cast("double")
            )
        ).alias("_sroot"),
    )
    n1 = F.col("_n1").cast("double")
    n2 = F.col("_n2").cast("double")
    bc = F.try_divide(F.col("_sroot"), F.sqrt(n1 * n2))
    return agg.select(
        F.col("_n1").cast("long").alias("n1"),
        F.col("_n2").cast("long").alias("n2"),
        bc.alias("bc"),
        F.sqrt(F.greatest(F.lit(0.0), 1.0 - bc)).alias("hellinger"),
        # -ln BC: guarded — BC = 0 (disjoint supports) has no finite
        # Bhattacharyya distance
        F.when(bc > 0.0, -F.log(bc)).alias("bhattacharyya"),
    )
