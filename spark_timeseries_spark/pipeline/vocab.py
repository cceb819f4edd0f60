"""Vocabulary construction and out-of-vocabulary profiling.

Tokenizer training prep for a pretraining corpus: count every token once
across the corpus, keep the ``max_size`` most frequent above ``min_count``,
and profile each document's OOV rate against the frozen vocabulary (the
standard coverage check before committing to a tokenizer).

Scale shape (100 TB): token counting is one explode + one hash-shuffle
groupBy with map-side partial aggregation — the shuffle carries one row per
DISTINCT token per partition, not per occurrence. Top-k selection uses
``orderBy(...).limit(k)`` which Spark plans as ``TakeOrderedAndProject``:
each partition keeps its local top-k and only ``k`` rows ever reach the
driver — no global sort. The resulting vocabulary is small by construction
(a tokenizer vocab is ~10⁴–10⁵ rows), so OOV scoring broadcasts it and
stays a map-side join; the only shuffle is the per-document re-aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from spark_timeseries_spark.pipeline.text import bpe_like_tokens, tokens


def _token_stream(
    df: DataFrame, text_col: str, id_col: str | None, bpe: bool, lowercase: bool
) -> DataFrame:
    """One row per token occurrence. Empty tokens (blank/whitespace-only
    documents) are filtered so both engines agree on zero-token docs."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    tok = bpe_like_tokens(t) if bpe else tokens(t)
    cols = ([F.col(id_col)] if id_col else []) + [F.explode(tok).alias("token")]
    return df.select(*cols).where(F.col("token") != "")


def token_counts(
    df: DataFrame,
    text_col: str = "text",
    bpe: bool = False,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus-wide token frequencies: ``(token, cnt)``. One explode + one
    groupBy — partial aggregation makes the shuffle distinct-token-sized."""
    return (
        _token_stream(df, text_col, None, bpe, lowercase)
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
    )


def build_vocab(
    df: DataFrame,
    max_size: int = 50_000,
    min_count: int = 1,
    text_col: str = "text",
    bpe: bool = False,
    lowercase: bool = True,
) -> DataFrame:
    """The ``max_size`` most frequent tokens with ``cnt >= min_count``,
    ranked ``(cnt DESC, token ASC)`` (deterministic tie-break), with a
    0-based ``token_id`` in rank order.

    The global sort only exists on the post-``limit`` frame — at most
    ``max_size`` rows — so the ``row_number`` window's single-partition
    stage is bounded by the vocab size, never the corpus.
    """
    counted = token_counts(df, text_col, bpe, lowercase).where(
        F.col("cnt") >= min_count
    )
    top = counted.orderBy(F.desc("cnt"), F.asc("token")).limit(max_size)
    w = Window.orderBy(F.desc("cnt"), F.asc("token"))
    return top.select(
        (F.row_number().over(w) - 1).alias("token_id"), "token", "cnt"
    )


def oov_rate(
    df: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bpe: bool = False,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document OOV profile against a frozen vocabulary:
    ``(id, n_tokens, n_oov, oov_rate)``. Zero-token documents report
    ``n_tokens = 0`` and a NULL rate.

    The vocab side is explicitly broadcast (bounded by ``max_size``), so
    membership testing is map-side — as a LEFT ANTI join, so the one
    per-document shuffle carries only the OOV occurrences (for a healthy
    corpus the small minority), not the whole token stream; the total
    token count is a row-local array size computed before the explode.

    Deliberate trade-off: the corpus is tokenized twice (once for the
    counts projection, once for the OOV stream). The single-tokenization
    alternative must keep in-vocab rows through the aggregate — i.e.
    shuffle the ENTIRE token stream — because zero-OOV documents still
    need a count; repeating the row-local regex CPU is far cheaper than
    that corpus-wide exchange. Callers holding ``df`` cached pay only
    the CPU, not a second input read."""
    t = F.col(text_col)
    if lowercase:
        t = F.lower(t)
    tok = bpe_like_tokens(t) if bpe else tokens(t)
    base = df.select(
        F.col(id_col),
        F.size(F.filter(tok, lambda x: x != F.lit(""))).alias("n_tokens"),
    )
    stream = _token_stream(df, text_col, id_col, bpe, lowercase)
    oov = (
        stream.join(F.broadcast(vocab.select("token")), "token", "left_anti")
        .groupBy(id_col)
        .agg(F.count("*").alias("_oov"))
    )
    return (
        base.join(oov, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.coalesce("_oov", F.lit(0)).cast("long").alias("n_oov"),
            F.when(
                F.col("n_tokens") > 0,
                F.coalesce("_oov", F.lit(0)) / F.col("n_tokens"),
            ).alias("oov_rate"),
        )
    )


def zipf_slope(
    df: DataFrame,
    group_col: str | None = "source",
    top_r: int = 200,
    text_col: str = "text",
    bpe: bool = False,
    lowercase: bool = True,
) -> DataFrame:
    """Zipf's-law diagnostic per corpus stratum: OLS slope of
    ``ln(freq) ~ ln(rank)`` over the ``top_r`` most frequent tokens →
    (group, slope, intercept, r2, n_ranks). Natural text sits near
    slope ≈ −1; strata that deviate hard flag template/boilerplate mass
    (flat head) or tokenizer damage (steep head) — a one-number corpus
    health check a 100 TB pipeline can afford to run per ingest batch.

    Plan: token counting is the usual explode + partially-aggregated
    groupBy; ranking uses a per-group window over the counts table
    (distinct-token-sized, orders of magnitude under corpus size) with a
    deterministic (cnt DESC, token) tie-break; the regression is a
    closed-form moment aggregate per group — no Python, no global sort.
    With ``group_col=None`` the whole corpus is one stratum ``"_all"``.

    Degenerate strata yield NULL, never a masking constant: a single
    rank (zero x-variance) NULLs all three statistics, and all-equal
    top-r counts (zero RESPONSE variance — a uniform/template stratum,
    slope 0, exactly what the diagnostic exists to flag) NULLs ``r2``
    rather than reporting a vacuous 1.0.
    """
    gc = group_col
    stream = _token_stream(df, text_col, gc, bpe, lowercase)
    if gc is None:
        gc = "grp"
        stream = stream.withColumn(gc, F.lit("_all"))
    counts = stream.groupBy(gc, "token").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy(gc).orderBy(F.desc("cnt"), F.asc("token"))
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(top_r))
        .select(
            gc,
            F.log(F.col("rank").cast("double")).alias("x"),
            F.log(F.col("cnt").cast("double")).alias("y"),
        )
    )
    m = ranked.groupBy(gc).agg(
        F.count("*").alias("n_ranks"),
        F.covar_pop("x", "y").alias("_sxy"),
        F.var_pop("x").alias("_sxx"),
        F.var_pop("y").alias("_syy"),
        F.avg("x").alias("_mx"),
        F.avg("y").alias("_my"),
    )
    # degenerate strata (a single rank → zero x-variance) yield NULL, not
    # NaN: Spark's 0.0/0.0 is NaN while SQL engines return NULL — emit
    # NULL explicitly so the semantics are engine-independent
    slope = F.when(F.col("_sxx") == 0, F.lit(None)).otherwise(
        F.col("_sxy") / F.col("_sxx")
    )
    return m.select(
        F.col(gc).alias(group_col if group_col else "grp"),
        slope.alias("slope"),
        (F.col("_my") - slope * F.col("_mx")).alias("intercept"),
        F.when((F.col("_sxx") == 0) | (F.col("_syy") == 0), F.lit(None))
        .otherwise(F.col("_sxy") * F.col("_sxy") / (F.col("_sxx") * F.col("_syy")))
        .alias("r2"),
        "n_ranks",
    )


def corpus_stats(
    df: DataFrame,
    group_col: str | None = "source",
    text_col: str = "text",
    bpe: bool = False,
    lowercase: bool = True,
    approx: bool = True,
) -> DataFrame:
    """Per-stratum corpus profile: (group, n_docs, n_tokens,
    distinct_tokens, avg_doc_tokens) — the one-glance health table an
    ingest batch gets before heavier analysis.

    ``approx=True`` (default) counts distinct tokens with the HLL sketch
    (``approx_count_distinct``, ~2% error) — at 100 TB an exact distinct
    forces a full (group, token) de-duplicating shuffle; the sketch
    merges map-side in constant memory. Set ``approx=False`` for exact
    counts (the oracle-comparable mode). One corpus scan either way."""
    gc = group_col
    stream = _token_stream(df, text_col, gc, bpe, lowercase)
    if gc is None:
        gc = "grp"
        stream = stream.withColumn(gc, F.lit("_all"))
    cd = (
        F.approx_count_distinct("token")
        if approx
        else F.countDistinct("token")
    )
    toks = stream.groupBy(gc).agg(
        F.count("*").alias("n_tokens"), cd.alias("distinct_tokens")
    )
    group_expr = F.col(gc) if group_col else F.lit("_all").alias(gc)
    docs = df.groupBy(group_expr).agg(F.count("*").alias("n_docs"))
    return docs.join(toks, gc, "left").select(
        gc,
        "n_docs",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("distinct_tokens", F.lit(0)).alias("distinct_tokens"),
        (F.coalesce("n_tokens", F.lit(0)) / F.col("n_docs")).alias(
            "avg_doc_tokens"
        ),
    )


def token_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bpe: bool = False,
    lowercase: bool = True,
) -> DataFrame:
    """Per-document token-distribution profile: (id, n_tokens,
    distinct_tokens, entropy, hapax_ratio).

    ``entropy`` = −Σ (c/n)·ln(c/n) over the document's own token
    frequencies (natural log): near ln(n_tokens) for fully diverse text,
    collapsing toward 0 as repetition takes over — a scale-free
    companion to the Gopher repetition rules. ``hapax_ratio`` = share of
    distinct tokens occurring exactly once (high for natural prose,
    low for templates). Zero-token documents report 0 counts and NULL
    ratios.

    Plan: one explode + (id, token) groupBy with map-side combine, then
    the per-document aggregation — the shuffle carries one row per
    distinct (doc, token), not per occurrence."""
    stream = _token_stream(df, text_col, id_col, bpe, lowercase)
    counts = stream.groupBy(id_col, "token").agg(F.count("*").alias("_c"))
    # the doc total rides the same (id) partitioning the final aggregate
    # shuffles on (window before groupBy, same key — one exchange)
    wn = Window.partitionBy(id_col)
    enriched = counts.withColumn("_n", F.sum("_c").over(wn))
    p = F.col("_c") / F.col("_n")
    per = enriched.groupBy(id_col).agg(
        F.first("_n").alias("n_tokens"),
        F.count("*").alias("distinct_tokens"),
        (-F.sum(p * F.log(p))).alias("entropy"),
        F.try_divide(
            F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)),
            F.count("*"),
        ).alias("hapax_ratio"),
    )
    return (
        df.select(id_col)
        .join(per, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("distinct_tokens", F.lit(0)).alias("distinct_tokens"),
            "entropy",
            "hapax_ratio",
        )
    )


def token_divergence(
    df_a: DataFrame,
    df_b: DataFrame,
    k: float = 0.5,
    text_col: str = "text",
    bpe: bool = False,
    lowercase: bool = True,
) -> DataFrame:
    """Token-distribution drift between two corpus snapshots → ONE row
    (kl_ab, kl_ba, js, vocab_union, n_a, n_b): add-k-smoothed KL
    divergence both ways plus the symmetric bounded Jensen-Shannon
    divergence (0 = identical distributions, ln 2 = disjoint) — the
    standard drift monitor between ingest batches or before/after a
    cleaning pass ("did the filter change WHAT the corpus says or just
    how much of it there is?").

    Smoothing: P(t) = (c_a(t) + k) / (N_a + k·V) over the UNION
    vocabulary V, so tokens private to one side contribute finitely.

    Plan: one token-count groupBy per side (distinct-token shuffles), a
    full-outer join of the two count tables, one scalar aggregation —
    the corpus texts are each scanned once and only count tables move."""
    ca = token_counts(df_a, text_col, bpe, lowercase).withColumnRenamed(
        "cnt", "_ca"
    )
    cb = token_counts(df_b, text_col, bpe, lowercase).withColumnRenamed(
        "cnt", "_cb"
    )
    j = ca.join(cb, "token", "full_outer").select(
        F.coalesce("_ca", F.lit(0)).alias("_ca"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
    )
    tot = j.agg(
        F.sum("_ca").alias("_na"),
        F.sum("_cb").alias("_nb"),
        F.count("*").alias("_v"),
    )
    kf = float(k)
    p = (F.col("_ca") + kf) / (F.col("_na") + kf * F.col("_v"))
    q = (F.col("_cb") + kf) / (F.col("_nb") + kf * F.col("_v"))
    m = (p + q) / 2
    out = j.crossJoin(F.broadcast(tot)).agg(
        F.sum(p * F.log(p / q)).alias("kl_ab"),
        F.sum(q * F.log(q / p)).alias("kl_ba"),
        (
            0.5 * F.sum(p * F.log(p / m)) + 0.5 * F.sum(q * F.log(q / m))
        ).alias("js"),
        F.first("_v").alias("vocab_union"),
        F.first("_na").alias("n_a"),
        F.first("_nb").alias("n_b"),
    )
    return out


def heaps_law(
    df: DataFrame,
    points: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    lowercase: bool = True,
) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve + fitted exponent →
    ``points`` rows (point 1..points, n_docs, n_tokens, n_distinct,
    beta): scanning the corpus in ``id_col`` order, after the first
    k/points-th of the documents, how many token occurrences and how
    many DISTINCT tokens have been seen. Heaps: V ≈ K·N^β — β (the
    same value on every row) is the closed-form log-log OLS slope over
    the curve's points; sub-linear β (~0.4-0.6 for natural text) is
    the expected regime, β → 1 flags id-like/garbage token streams.

    Plan: the heavy lifting is two word-count-shaped aggregates —
    per-doc token totals and per-TOKEN first-occurrence doc — then the
    curve is windows/joins over the DOC-level table (one row per
    document; the bounded-by-construction envelope is "doc count fits
    a sort", i.e. always — it's the same cardinality every groupBy(doc)
    in this package already produces). No second corpus scan."""
    if points < 2:
        raise ValueError(f"points must be >= 2, got {points}")
    toks = _token_stream(df, text_col, id_col, bpe=False, lowercase=lowercase)
    per_doc = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("_nt"))
    wolo = Window.orderBy(id_col)
    wpre = wolo.rowsBetween(Window.unboundedPreceding, 0)
    docs = (
        per_doc.withColumn("_rank", F.row_number().over(wolo))
        .withColumn("_cum_toks", F.sum("_nt").over(wpre))
    )
    n_docs = docs.agg(F.max("_rank").alias("_d"))
    # per-token first occurrence, as the doc RANK it appeared at
    first = (
        toks.groupBy("token")
        .agg(F.min(id_col).alias("_fd"))
        .join(docs.select(F.col(id_col).alias("_fd"), "_rank"), "_fd")
        .groupBy("_rank")
        .agg(F.count(F.lit(1)).alias("_new"))
    )
    curve = (
        docs.join(first, "_rank", "left")
        .withColumn(
            "_cum_v",
            F.sum(F.coalesce("_new", F.lit(0))).over(
                Window.orderBy("_rank").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )
    # the `points` thresholds: rank ceil(D*k/points); take the row AT
    # each threshold rank
    marks = curve.crossJoin(n_docs).select(
        F.explode(
            F.sequence(F.lit(1), F.lit(points))
        ).alias("point"),
        "_rank", "_cum_toks", "_cum_v", "_d",
    ).where(
        F.col("_rank")
        == F.ceil(
            F.col("_d").cast("double") * F.col("point") / points
        ).cast("long")
    ).select(
        "point",
        F.col("_rank").alias("n_docs"),
        F.col("_cum_toks").alias("n_tokens"),
        F.col("_cum_v").alias("n_distinct"),
    )
    # closed-form OLS of log V on log N over the curve points
    ols = marks.agg(
        F.try_divide(
            F.count(F.lit(1)) * F.sum(F.log("n_tokens") * F.log("n_distinct"))
            - F.sum(F.log("n_tokens")) * F.sum(F.log("n_distinct")),
            F.count(F.lit(1))
            * F.sum(F.log("n_tokens") * F.log("n_tokens"))
            - F.sum(F.log("n_tokens")) * F.sum(F.log("n_tokens")),
        ).alias("beta")
    )
    return marks.crossJoin(ols).select(
        "point", "n_docs", "n_tokens", "n_distinct", "beta"
    )
