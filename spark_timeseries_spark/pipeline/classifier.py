"""Linear text classification: model-based quality filtering.

The scoring half of a fastText/CCNet-style quality filter (Wenzek et al.
2020 filter CommonCrawl with a linear model over bag-of-words features;
GPT-3's data work does the same with an LR classifier): featurize each
document as normalized term frequencies, dot with a weight table, squash
through a sigmoid. Plus a distributed trainer — batch gradient descent
with executor-aggregated gradients and driver-held coefficients, the same
driver/executor split ``spark.ml``'s LogisticRegression uses (and the same
shape as :mod:`clustering`'s k-means loop: per-iteration driver transfer is
bounded by the model size, never the corpus).

Scale shape (100 TB): featurization is explode + per-doc groupBy (one
shuffle, map-side combine). Scoring joins the feature stream against a
BROADCAST weight table (vocab-bounded) and re-aggregates per doc — one
shuffle. Training repeats that per iteration plus a token-keyed gradient
aggregate whose shuffle is distinct-token-sized; only the k-dim gradient
vector ever reaches the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def featurize(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bpe: bool = False,
    lowercase: bool = True,
) -> DataFrame:
    """Bag-of-words features: ``(id, token, tf)`` with ``tf`` the token's
    within-document relative frequency (counts normalized by document
    length, the fastText input representation).

    The document length rides the explode as a row-local array size, so
    normalization needs NO doc-keyed window — one (id, token) shuffle
    total (a per-doc window here would re-exchange the whole token
    stream a second time)."""
    from spark_timeseries_spark.pipeline.text import bpe_like_tokens, tokens

    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    tok = bpe_like_tokens(t) if bpe else tokens(t)
    base = df.select(
        F.col(id_col), F.filter(tok, lambda x: x != F.lit("")).alias("_tk")
    )
    stream = base.select(
        id_col, F.size("_tk").alias("_dl"), F.explode("_tk").alias("token")
    )
    counts = stream.groupBy(id_col, "token").agg(
        F.count("*").alias("cnt"), F.first("_dl").alias("_dl")
    )
    return counts.select(
        id_col, "token", (F.col("cnt") / F.col("_dl")).alias("tf")
    )


def _weights_df(spark, weights) -> DataFrame:
    if isinstance(weights, DataFrame):
        return weights
    rows = sorted(weights.items())
    return spark.createDataFrame(rows, "token string, w double")


def linear_score(
    df: DataFrame,
    weights,
    bias: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    bpe: bool = False,
    lowercase: bool = True,
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document under a linear model: ``(id, margin, score,
    keep)`` with ``score = sigmoid(bias + Σ tf·w)`` and ``keep = score >=
    threshold``. ``weights`` is a ``(token, w)`` DataFrame (trained
    elsewhere or via :func:`train_logreg`) or a plain dict lexicon.
    Documents with no weighted token score ``sigmoid(bias)`` — they still
    get a row (left join from the corpus side)."""
    wdf = _weights_df(df.sparkSession, weights)
    feats = featurize(df, text_col, id_col, bpe, lowercase)
    margins = (
        feats.join(F.broadcast(wdf), "token")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("w")).alias("_dot"))
    )
    return (
        df.select(id_col)
        .join(margins, id_col, "left")
        .select(
            id_col,
            (F.coalesce("_dot", F.lit(0.0)) + F.lit(bias)).alias("margin"),
        )
        .withColumn("score", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))))
        .withColumn("keep", F.col("score") >= threshold)
    )


@dataclass
class LogRegModel:
    """Driver-held coefficients — bounded by the vocabulary size."""

    weights: dict[str, float]
    bias: float
    n_iter: int


def train_logreg(
    df: DataFrame,
    label_col: str,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_iter: int = 10,
    lr: float = 1.0,
    l2: float = 0.0,
    bpe: bool = False,
    lowercase: bool = True,
) -> LogRegModel:
    """Batch-gradient logistic regression over bag-of-words features
    restricted to ``vocab`` (build with :func:`vocab.build_vocab`; keeps
    the weight table broadcastable and the gradient shuffle bounded).

    Per iteration: one broadcast join to score, one doc-keyed aggregate
    for the residual, one token-keyed aggregate for the gradient; the
    collected gradient is |vocab| rows. Labels are 0/1 doubles.
    ``bpe``/``lowercase`` must match the settings the vocab was built
    with and the settings later passed to :func:`linear_score` — a
    case-preserving vocab against the lowercased default would silently
    drop every cased token at the join.
    """
    spark = df.sparkSession
    feats = featurize(df, text_col, id_col, bpe, lowercase).join(
        F.broadcast(vocab.select("token")), "token"
    )
    labels = df.select(id_col, F.col(label_col).cast("double").alias("_y"))
    n_docs = labels.count()
    feats = feats.persist()
    try:
        w: dict[str, float] = {}
        b = 0.0
        for _ in range(max_iter):
            wdf = _weights_df(spark, w) if w else spark.createDataFrame(
                [], "token string, w double"
            )
            margins = (
                feats.join(F.broadcast(wdf), "token", "left")
                .groupBy(id_col)
                .agg(
                    F.sum(
                        F.col("tf") * F.coalesce(F.col("w"), F.lit(0.0))
                    ).alias("_dot")
                )
            )
            resid = (
                labels.join(margins, id_col, "left")
                .select(
                    id_col,
                    (
                        F.lit(1.0)
                        / (
                            F.lit(1.0)
                            + F.exp(-(F.coalesce("_dot", F.lit(0.0)) + F.lit(b)))
                        )
                        - F.col("_y")
                    ).alias("_err"),
                )
            )
            grad_rows = (
                feats.join(resid, id_col)
                .groupBy("token")
                .agg((F.sum(F.col("tf") * F.col("_err")) / n_docs).alias("g"))
                .collect()
            )
            b_grad = resid.agg((F.sum("_err") / n_docs).alias("g")).collect()[0].g
            for r in grad_rows:
                w[r.token] = w.get(r.token, 0.0) - lr * (
                    r.g + l2 * w.get(r.token, 0.0)
                )
            b -= lr * b_grad
        return LogRegModel(weights=w, bias=b, n_iter=max_iter)
    finally:
        feats.unpersist()


def reliability_bins(
    df: DataFrame,
    score_col: str,
    label_col: str,
    bins: int = 10,
) -> DataFrame:
    """Calibration audit of a [0, 1] quality/filter score against a
    binary outcome → one row per equal-WIDTH score bin: (bin, n, w,
    mean_score, pos_rate, gap, ece). ``bin`` = ⌊score·bins⌋ clamped so
    score = 1.0 lands in the top bin; ``w`` = the bin's share of all
    scored rows; ``gap`` = pos_rate − mean_score (positive = the model
    UNDER-claims); ``ece`` = Σ w·|gap| — the expected calibration
    error (Naeini et al. 2015), repeated on every row so one result
    set carries both the reliability diagram and its summary. Empty
    bins are absent (their w is 0). A filter threshold chosen on an
    uncalibrated score keeps a different fraction than intended —
    run this BEFORE trusting :func:`linear_score` cutoffs.

    Precondition: score ∈ [0, 1] (raise upstream sigmoid/min-max),
    label ∈ {0, 1}/boolean, both non-null (null rows are dropped,
    counted out of w).

    Plan: one map-side-combinable groupBy(bin) + one tiny
    all-bins window for w/ece — ≤ bins rows ever shuffle."""
    if bins < 2:
        raise ValueError(f"bins must be >= 2, got {bins}")
    sc = F.col(score_col).cast("double")
    lb = F.col(label_col).cast("double")
    pts = df.where(sc.isNotNull() & lb.isNotNull())
    b = F.least(F.floor(sc * bins), F.lit(bins - 1)).cast("int")
    g = pts.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg(sc).alias("mean_score"),
        F.avg(lb).alias("pos_rate"),
    )
    w_all = Window.partitionBy(F.lit(1))
    g = g.withColumn(
        "w", F.col("n").cast("double") / F.sum("n").over(w_all)
    ).withColumn("gap", F.col("pos_rate") - F.col("mean_score"))
    return g.withColumn(
        "ece", F.sum(F.col("w") * F.abs(F.col("gap"))).over(w_all)
    ).select("bin", "n", "w", "mean_score", "pos_rate", "gap", "ece")



def _binary_label_guard(lb, op_name: str):
    """Label-domain gate shared by every binary-label eval operator:
    passes 0.0/1.0 through, raises on anything else. Lives INSIDE the
    aggregated expression at each call site (the guard-placement rule:
    every surviving row's label flows through it, so no predicate
    reordering can skip the check)."""
    return F.when((lb == 0.0) | (lb == 1.0), lb).otherwise(
        F.raise_error(
            F.concat(
                F.lit(op_name + ": label outside {0,1}: "),
                lb.cast("string"),
            )
        )
    )


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Area under the ROC curve of a score against a binary label →
    ONE row: (n, n_pos, n_neg, auc). Computed as the normalized
    Mann-Whitney U statistic with exact midrank tie handling:
    AUC = Σ_s n_pos(s)·(N_neg(<s) + n_neg(s)/2) / (N_pos·N_neg) —
    the probability a random positive outscores a random negative,
    ties counting half (Hanley & McNeil 1982). This is the
    trapezoidal AUC of the tie-grouped ROC curve exactly, with no
    curve materialized. NULL scores/labels are dropped (stated);
    degenerate inputs (no positives or no negatives) yield NULL auc.
    Labels outside {0, 1} RAISE (the srm_check discipline): n_pos and
    n_neg come from Σlabel and Σ(1−label), so a stray 2 or −1 would
    silently corrupt both counts and the AUC itself.

    The companion of :func:`reliability_bins`: AUC measures RANKING
    quality (threshold-free separation), calibration measures the
    score's probability scale — a quality filter needs both.

    Plan: one map-side-combinable groupBy(score) over the data, then
    one cumulative window + one reduce on the DISTINCT-SCORE grid —
    the global sort is bounded by score cardinality, not rows (a
    continuous score at corpus scale should be quantized first,
    stated; label-side counts make skew impossible)."""
    sc = F.col(score_col).cast("double")
    lb = F.col(label_col).cast("double")
    lb_ok = _binary_label_guard(lb, "roc_auc")
    pts = df.where(sc.isNotNull() & lb.isNotNull())
    g = pts.groupBy(sc.alias("_s")).agg(
        F.sum(lb_ok).alias("_np"),
        F.sum(F.lit(1.0) - lb_ok).alias("_nn"),
    )
    w_below = Window.orderBy("_s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    u = F.col("_np") * (
        F.coalesce(F.sum("_nn").over(w_below), F.lit(0.0))
        + F.col("_nn") / 2.0
    )
    return (
        g.withColumn("_u", u)
        .groupBy(F.lit(1).alias("_j"))
        .agg(
            F.sum(F.col("_np") + F.col("_nn")).cast("long").alias("n"),
            F.sum("_np").cast("long").alias("n_pos"),
            F.sum("_nn").cast("long").alias("n_neg"),
            F.try_divide(
                F.sum("_u"), F.sum("_np") * F.sum("_nn")
            ).alias("auc"),
        )
        .drop("_j")
    )


def brier(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Brier score of a probability forecast against a binary label,
    with its exact Murphy (1973) decomposition → ONE row: (n, n_pos,
    brier, reliability, resolution, uncertainty). BS = mean((p − y)²);
    grouping by the DISTINCT forecast values p_k (not arbitrary bins)
    makes the decomposition an identity:

        BS = REL − RES + UNC
        REL = Σ n_k (p_k − ȳ_k)² / n      (calibration: forecast vs
                                            realized rate at that p)
        RES = Σ n_k (ȳ_k − ȳ)² / n        (how much the forecast
                                            separates outcome rates)
        UNC = ȳ (1 − ȳ)                    (base-rate entropy floor)

    The proper-scoring-rule companion of :func:`roc_auc` (ranking) and
    :func:`reliability_bins` (binned diagram): AUC is blind to the
    probability SCALE, ECE is blind to sharpness — the Brier
    decomposition reads both at once, and BS is what a quality-filter
    threshold actually pays. Scores are expected in [0, 1] (stated —
    out-of-range scores still yield the mean squared error but void
    the probabilistic reading); labels outside {0, 1} RAISE (the
    roc_auc discipline — Σlabel feeds every term). NULL scores/labels
    are dropped. Empty input yields ZERO rows (module convention).

    Plan: one map-side-combinable groupBy(score) over the data, then
    ONE reduce on the DISTINCT-SCORE grid — quantize a continuous
    score first at corpus scale (the roc_auc caveat). No windows, no
    joins, no Python."""
    sc = F.col(score_col).cast("double")
    lb = F.col(label_col).cast("double")
    # domain gate INSIDE the aggregated expression (guard-placement
    # rule): every surviving row's label flows through it.
    lb_ok = _binary_label_guard(lb, "brier")
    pts = df.where(sc.isNotNull() & lb.isNotNull())
    g = pts.groupBy(sc.alias("_p")).agg(
        F.count(F.lit(1)).alias("_nk"),
        F.avg(lb_ok).alias("_yk"),
        # exact per-group positive count: n_pos must NOT be rebuilt as
        # n_k * avg(label) downstream — 49 * (1/49) is 0.99999... in
        # doubles and a long cast would truncate it to 0
        F.sum(lb_ok).alias("_pk"),
    )
    nk = F.col("_nk").cast("double")
    agg = g.groupBy(F.lit(1).alias("_j")).agg(
        F.sum("_nk").cast("long").alias("n"),
        F.sum("_pk").alias("_npos"),
        F.sum(
            nk * (F.col("_p") - F.col("_yk")) * (F.col("_p") - F.col("_yk"))
        ).alias("_rel_num"),
        F.sum(nk * F.col("_yk") * F.col("_yk")).alias("_y2_num"),
    )
    n = F.col("n").cast("double")
    ybar = F.col("_npos") / n
    rel = F.col("_rel_num") / n
    # RES = Σ n_k ȳ_k²/n − ȳ² (moment form); UNC = ȳ(1 − ȳ); the three
    # assemble BS exactly — no second pass over the data.
    res = F.col("_y2_num") / n - ybar * ybar
    unc = ybar * (F.lit(1.0) - ybar)
    return agg.select(
        "n",
        F.col("_npos").cast("long").alias("n_pos"),
        (rel - res + unc).alias("brier"),
        rel.alias("reliability"),
        res.alias("resolution"),
        unc.alias("uncertainty"),
    )


def average_precision(
    df: DataFrame,
    score_col: str,
    label_col: str,
) -> DataFrame:
    """Average precision (area under the precision-recall curve, step
    interpolation) of a score against a binary label → ONE row:
    (n, n_pos, n_neg, ap). AP = Σ_k (R_k − R_{k−1})·P_k over the
    DISTINCT score thresholds in descending order, with P_k = TP_k /
    rows-at-or-above and R_k = TP_k / N_pos — the threshold-grouped
    step AP (no trapezoid, which is optimistic for PR curves; see
    Davis & Goadrich 2006). Equals Σ_k pos_k·P_k / N_pos, so the whole
    statistic is one cumulative window + one reduce. Tied scores
    collapse into one threshold (their internal order is unknowable —
    the tie-grouped curve is the honest one). The PR companion of
    :func:`roc_auc`: under heavy class imbalance (the usual quality-
    filter regime — few good documents in a big crawl) AUC saturates
    while AP keeps discriminating (Saito & Rehmsmeier 2015). NULL
    scores/labels dropped; labels outside {0, 1} RAISE (the roc_auc
    discipline); no positives → NULL ap; empty input → ZERO rows
    (module convention).

    Plan: one map-side-combinable groupBy(score), then one cumulative
    window + one reduce on the DISTINCT-SCORE grid (global sort
    bounded by score cardinality — quantize a continuous score first
    at corpus scale, the roc_auc caveat)."""
    sc = F.col(score_col).cast("double")
    lb = F.col(label_col).cast("double")
    lb_ok = _binary_label_guard(lb, "average_precision")
    pts = df.where(sc.isNotNull() & lb.isNotNull())
    g = pts.groupBy(sc.alias("_s")).agg(
        F.sum(lb_ok).alias("_np"),
        F.count(F.lit(1)).alias("_nt"),
    )
    w_cum = Window.orderBy(F.desc("_s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    prec = F.try_divide(
        F.sum("_np").over(w_cum),
        F.sum("_nt").over(w_cum).cast("double"),
    )
    return (
        g.withColumn("_prec", prec)
        .groupBy(F.lit(1).alias("_j"))
        .agg(
            F.sum("_nt").cast("long").alias("n"),
            F.sum("_np").cast("long").alias("n_pos"),
            (F.sum("_nt") - F.sum("_np")).cast("long").alias("n_neg"),
            F.try_divide(
                F.sum(F.col("_np") * F.col("_prec")), F.sum("_np")
            ).alias("ap"),
        )
        .drop("_j")
    )


def log_loss(
    df: DataFrame,
    score_col: str,
    label_col: str,
    eps: float = 1e-15,
) -> DataFrame:
    """Cross-entropy (logarithmic loss) of a probability forecast
    against a binary label → ONE row: (n, n_pos, log_loss).
    LL = −mean(y·ln p̂ + (1−y)·ln(1−p̂)) with p̂ clipped into
    [eps, 1−eps] (the sklearn convention — a hard 0/1 forecast that
    is WRONG would otherwise cost ∞ and poison the mean). The
    likelihood-scale companion of :func:`brier`: both are strictly
    proper scoring rules, but log loss punishes confident mistakes
    exponentially harder — the right gate when a downstream consumer
    treats the score as a probability in expectation arithmetic.
    NULL scores/labels dropped; labels outside {0, 1} RAISE (the
    roc_auc discipline); empty input → ZERO rows (module convention).

    Plan: ONE map-side-combinable aggregate — no groupBy key, no
    windows, no joins, no Python."""
    if not 0.0 < eps < 0.5:
        raise ValueError(f"eps must be in (0, 0.5), got {eps}")
    sc = F.col(score_col).cast("double")
    lb = F.col(label_col).cast("double")
    lb_ok = _binary_label_guard(lb, "log_loss")
    # clip BEFORE the logs so both ln arguments are strictly positive
    # on every row (the guard-ln-on-both-engines rule)
    p = F.least(
        F.greatest(sc, F.lit(float(eps))), F.lit(1.0 - float(eps))
    )
    term = -(
        lb_ok * F.log(p) + (F.lit(1.0) - lb_ok) * F.log(F.lit(1.0) - p)
    )
    return (
        df.where(sc.isNotNull() & lb.isNotNull())
        .groupBy(F.lit(1).alias("_j"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(lb_ok).cast("long").alias("n_pos"),
            F.avg(term).alias("log_loss"),
        )
        .drop("_j")
    )


def classification_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    threshold: float,
) -> DataFrame:
    """Thresholded confusion-matrix readout → ONE row: (n, tp, fp, tn,
    fn, accuracy, precision, recall, specificity, f1, mcc). Predicted
    positive iff score ≥ threshold. MCC = (tp·tn − fp·fn) /
    √((tp+fp)(tp+fn)(tn+fp)(tn+fn)) (Matthews 1975) — the single
    number that stays honest under class imbalance where accuracy and
    even F1 mislead (Chicco & Jurman 2020); NULL when any marginal is
    zero (try_divide), as are the other ratio columns on degenerate
    margins. The operating-point companion of the threshold-free
    :func:`roc_auc`/:func:`average_precision`: once a filter cutoff is
    CHOSEN, this is what it does. NULL scores/labels dropped; labels
    outside {0, 1} RAISE (the roc_auc discipline); empty input → ZERO
    rows (module convention).

    Plan: ONE map-side-combinable aggregate of the four cells — no
    windows, no joins, no Python."""
    sc = F.col(score_col).cast("double")
    lb = F.col(label_col).cast("double")
    lb_ok = _binary_label_guard(lb, "classification_report")
    pred = (sc >= F.lit(float(threshold))).cast("double")
    agg = (
        df.where(sc.isNotNull() & lb.isNotNull())
        .groupBy(F.lit(1).alias("_j"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(pred * lb_ok).cast("long").alias("tp"),
            F.sum(pred * (1.0 - lb_ok)).cast("long").alias("fp"),
            F.sum((1.0 - pred) * (1.0 - lb_ok)).cast("long").alias("tn"),
            F.sum((1.0 - pred) * lb_ok).cast("long").alias("fn"),
        )
    )
    tp = F.col("tp").cast("double")
    fp = F.col("fp").cast("double")
    tn = F.col("tn").cast("double")
    fn = F.col("fn").cast("double")
    prec = F.try_divide(tp, tp + fp)
    rec = F.try_divide(tp, tp + fn)
    return agg.select(
        "n", "tp", "fp", "tn", "fn",
        ((tp + tn) / F.col("n").cast("double")).alias("accuracy"),
        prec.alias("precision"),
        rec.alias("recall"),
        F.try_divide(tn, tn + fp).alias("specificity"),
        F.try_divide(2.0 * prec * rec, prec + rec).alias("f1"),
        F.try_divide(
            tp * tn - fp * fn,
            F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)),
        ).alias("mcc"),
    )


def lift_table(
    df: DataFrame,
    score_col: str,
    label_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / lift table → one row per score bucket
    (descending score): (bucket, n, n_pos, pos_rate, cum_n, cum_pos,
    gain, lift). Rows are bucketed by their cumulative POSITION on the
    descending distinct-score grid — bucket = ⌈buckets · cum_n / N⌉ —
    so tied scores land in one bucket together and never straddle a
    boundary (a row-level ntile would split ties arbitrarily and make
    the table nondeterministic). ``gain`` = cumulative share of all
    positives captured through this bucket; ``lift`` = that share
    relative to the bucket's share of rows (gain / (cum_n/N)) — the
    "top-decile catches k× its share" campaign/filter readout
    completing the eval set (:func:`roc_auc` ranks, this BUDGETS).
    Bucket sizes are approximately N/buckets, exactly so when no tie
    group straddles a boundary. NULL scores/labels dropped; labels
    outside {0, 1} RAISE; no positives → NULL gain/lift.

    Plan: one map-side-combinable groupBy(score), one cumulative
    window on the DISTINCT-SCORE grid, one groupBy(bucket) reduce +
    one all-buckets window (≤ buckets rows) — quantize a continuous
    score first at corpus scale (the roc_auc caveat)."""
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    sc = F.col(score_col).cast("double")
    lb = F.col(label_col).cast("double")
    lb_ok = _binary_label_guard(lb, "lift_table")
    g = (
        df.where(sc.isNotNull() & lb.isNotNull())
        .groupBy(sc.alias("_s"))
        .agg(
            F.count(F.lit(1)).alias("_nt"),
            F.sum(lb_ok).alias("_np"),
        )
    )
    w_cum = Window.orderBy(F.desc("_s")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy(F.lit(1))
    cum = g.select(
        "_nt", "_np",
        F.sum("_nt").over(w_cum).alias("_cn"),
        F.sum("_np").over(w_cum).alias("_cp"),
        F.sum("_nt").over(w_all).alias("_N"),
        F.sum("_np").over(w_all).alias("_P"),
    )
    b = F.ceil(
        F.lit(buckets) * F.col("_cn").cast("double")
        / F.col("_N").cast("double")
    ).cast("int")
    per = cum.groupBy(b.alias("bucket")).agg(
        F.sum("_nt").cast("long").alias("n"),
        F.sum("_np").cast("long").alias("n_pos"),
        F.max("_cn").cast("long").alias("cum_n"),
        F.max("_cp").cast("long").alias("cum_pos"),
        F.max("_N").cast("long").alias("_N"),
        F.max("_P").cast("long").alias("_P"),
    )
    gain = F.try_divide(
        F.col("cum_pos").cast("double"), F.col("_P").cast("double")
    )
    share = F.col("cum_n").cast("double") / F.col("_N").cast("double")
    return per.select(
        "bucket", "n", "n_pos",
        (F.col("n_pos").cast("double") / F.col("n").cast("double"))
        .alias("pos_rate"),
        "cum_n", "cum_pos",
        gain.alias("gain"),
        F.try_divide(gain, share).alias("lift"),
    )
