"""N-gram language-model perplexity scoring (CCNet-style quality filter).

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") ranks web documents by the perplexity of a
small LM trained on a high-quality reference corpus (Wikipedia): low
perplexity ≈ reference-like prose, high perplexity ≈ boilerplate/gibberish.
The production pipelines derived from it (CCNet buckets head/middle/tail)
make this one of the standard pretrain-corpus quality gates.

This module re-expresses the idea Spark-first with an **interpolated add-k
bigram LM** — no external LM runtime, every step a DataFrame op:

1. **Train** (:func:`train_bigram_lm`): one pass over the reference slice —
   explode per-document bigrams (array ops on a let-bound token array, no
   O(len²) higher-order-function trap), then a single ``groupBy(ctx, w)``
   shuffle. Context totals derive from the bigram counts (no second corpus
   scan); vocabulary size is one scalar.
2. **Score** (:func:`score_perplexity`): explode the target corpus's
   bigrams, join the (small) LM counts — broadcast by default, the LM is a
   reference-corpus artifact orders of magnitude smaller than the corpus
   being scored — and aggregate per-document mean negative log-probability.

100 TB scale notes: training shuffles only (ctx, w) pairs with map-side
partial aggregation (rows ∝ unique bigrams, not corpus size); scoring is
two joins against the LM — broadcast when it fits (the normal case for a
reference-trained LM), AQE-decided otherwise — plus one per-document
aggregation that reuses the corpus's natural partitioning. Nothing iterates
and no driver-side state beyond two scalars (vocab size, context count).

No reference-counterpart: sryza/spark-timeseries has no text pipeline; the
spec here is the published CCNet recipe.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from spark_timeseries_spark.pipeline.text import tokens

__all__ = [
    "NgramLM",
    "TrigramLM",
    "train_bigram_lm",
    "train_trigram_lm",
    "score_perplexity",
    "score_perplexity_trigram",
    "perplexity_buckets",
    "pmi_pairs",
]


def _clean_tokens(text_col):
    """Lowercased whitespace tokens with empties dropped (split("") -> [""])."""
    return F.filter(tokens(F.lower(text_col)), lambda t: t != F.lit(""))


def _bigrams(toks):
    """array<struct<ctx,w>> of adjacent token pairs from a *let-bound* token
    array column. ``arrays_zip(slice(t,1,n-1), slice(t,2,n-1))`` touches the
    array O(n) times total — no per-element lambda over the whole array."""
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.arrays_zip(
            F.slice(toks, 1, n - 1).alias("ctx"), F.slice(toks, 2, n - 1).alias("w")
        ),
    ).otherwise(F.array())


@dataclass
class NgramLM:
    """A trained bigram LM: ``counts`` is (ctx, w, c2), ``context_counts``
    is (ctx, c1 = Σ_w c2), ``vocab_size`` the reference vocabulary size.
    Both frames are unmaterialized plans unless the caller persists them;
    :func:`train_bigram_lm` leaves caching policy to the caller (train once,
    persist, score many — the expected production pattern)."""

    counts: DataFrame
    context_counts: DataFrame
    vocab_size: int


def bigram_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, ctx, w) — one row per adjacent token pair per document. The
    token array is ``let``-bound before :func:`_bigrams` references it
    five times (size + two slice lengths + two slice inputs) — unbound,
    the interpreted tokenize+filter would re-run per reference (the
    measured ~4× trap documented at ``text.winnowing_fingerprints``)."""
    from spark_timeseries_spark.functions import let

    bg = let(_clean_tokens(F.col(text_col)), _bigrams)
    return (
        df.select(F.col(id_col), bg.alias("_bg"))
        .select(id_col, F.explode("_bg").alias("_p"))
        .select(id_col, F.col("_p.ctx").alias("ctx"), F.col("_p.w").alias("w"))
    )


def train_bigram_lm(
    reference: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> NgramLM:
    """Fit bigram counts on the reference corpus.

    One shuffle (groupBy ctx,w with map-side combine); context totals are a
    second, much smaller aggregation over the bigram-count frame itself —
    the corpus text is scanned exactly once. ``vocab_size`` is the only
    driver-side value (a single count)."""
    pairs = bigram_pairs(reference, text_col, id_col)
    counts = pairs.groupBy("ctx", "w").agg(F.count("*").alias("c2"))
    ctx_counts = counts.groupBy("ctx").agg(F.sum("c2").alias("c1"))
    vocab = (
        reference.select(
            F.explode(_clean_tokens(F.col(text_col))).alias("t")
        )
        .agg(F.countDistinct("t"))
        .first()[0]
    )
    return NgramLM(counts=counts, context_counts=ctx_counts, vocab_size=int(vocab or 0))


def score_perplexity(
    df: DataFrame,
    lm: NgramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    broadcast_lm: bool = True,
) -> DataFrame:
    """Per-document cross-entropy and perplexity under ``lm``.

    P(w|ctx) = (c2 + k) / (c1 + k·V)  (add-k smoothing; unseen context →
    uniform 1/V at k=1). Returns (id, n_bigrams, cross_entropy, perplexity);
    documents with <2 tokens have no bigrams and are excluded (they carry
    no LM evidence — gate them with a length filter, not a perplexity one).

    ``broadcast_lm=True`` (default) hints both LM sides broadcast — correct
    whenever the LM fits in executor memory, which a reference-corpus LM
    does; set False to let AQE choose for corpus-scale LMs."""
    if lm.vocab_size <= 0:
        raise ValueError("LM has an empty vocabulary")
    counts, ctx_counts = lm.counts, lm.context_counts
    if broadcast_lm:
        counts, ctx_counts = F.broadcast(counts), F.broadcast(ctx_counts)
    pairs = bigram_pairs(df, text_col, id_col)
    kv = float(k) * float(lm.vocab_size)
    logp = F.log(
        (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(float(k)))
        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(kv))
    )
    return (
        pairs.join(counts, ["ctx", "w"], "left")
        .join(ctx_counts, ["ctx"], "left")
        .withColumn("_nll", -logp)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.avg("_nll").alias("cross_entropy"),
        )
        .withColumn("perplexity", F.exp("cross_entropy"))
    )


def perplexity_buckets(
    scored: DataFrame,
    boundaries: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    ppl_col: str = "perplexity",
) -> DataFrame:
    """CCNet's head/middle/tail split: bucket by perplexity quantile.
    Boundaries come from ``approx_percentile`` (sketch, scale-safe — the
    exact-percentile trap is documented in :func:`text.token_percentiles`);
    rows at or below the head boundary are 'head' (reference-like), above
    the tail boundary 'tail'."""
    lo, hi = boundaries
    q = scored.agg(
        F.percentile_approx(ppl_col, [lo, hi], 10_000).alias("q")
    ).first()["q"]
    if q is None:
        raise ValueError(
            "perplexity_buckets: no scored rows (every document shorter "
            "than 2 tokens?) — cannot derive quantile boundaries"
        )
    return scored.withColumn(
        "ppl_bucket",
        F.when(F.col(ppl_col) <= float(q[0]), "head")
        .when(F.col(ppl_col) <= float(q[1]), "middle")
        .otherwise("tail"),
    )


def _trigrams(toks):
    """array<struct<c2,c1,w>> of adjacent token triples (let-bound input)."""
    n = F.size(toks)
    return F.when(
        n >= 3,
        F.arrays_zip(
            F.slice(toks, 1, n - 2).alias("c2"),
            F.slice(toks, 2, n - 2).alias("c1"),
            F.slice(toks, 3, n - 2).alias("w"),
        ),
    ).otherwise(F.array())


def trigram_triples(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, c2, c1, w) — one row per adjacent token TRIPLE per document
    (c2 = w_{t-2}, c1 = w_{t-1}); same let-bound slice-zip shape as
    :func:`bigram_pairs`."""
    from spark_timeseries_spark.functions import let

    tg = let(_clean_tokens(F.col(text_col)), _trigrams)
    return (
        df.select(F.col(id_col), tg.alias("_tg"))
        .select(id_col, F.explode("_tg").alias("_t"))
        .select(
            id_col,
            F.col("_t.c2").alias("c2"),
            F.col("_t.c1").alias("c1"),
            F.col("_t.w").alias("w"),
        )
    )


@dataclass
class TrigramLM:
    """Interpolated trigram LM: trigram / bigram / unigram count frames
    with their context totals derived per layer (each layer's context
    total is the sum over its own continuations — no second corpus
    scan), plus the two driver scalars (vocab size, token total)."""

    tri: DataFrame        # (c2, c1, w, t3)
    tri_ctx: DataFrame    # (c2, c1, t2 = Σ_w t3)
    bi: DataFrame         # (ctx, w, b2)
    bi_ctx: DataFrame     # (ctx, b1 = Σ_w b2)
    uni: DataFrame        # (w, u1)
    n_tokens: int
    vocab_size: int


def train_trigram_lm(
    reference: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> TrigramLM:
    """Fit the three count layers on the reference corpus: one trigram
    explode + groupBy, one bigram explode + groupBy, one unigram explode
    + groupBy — each shuffle carries distinct n-grams only (map-side
    combine); the context totals re-aggregate the count frames, never
    the corpus. Two scalars cross to the driver."""
    tri = (
        trigram_triples(reference, text_col, id_col)
        .groupBy("c2", "c1", "w")
        .agg(F.count("*").alias("t3"))
    )
    tri_ctx = tri.groupBy("c2", "c1").agg(F.sum("t3").alias("t2"))
    bi = (
        bigram_pairs(reference, text_col, id_col)
        .groupBy("ctx", "w")
        .agg(F.count("*").alias("b2"))
    )
    bi_ctx = bi.groupBy("ctx").agg(F.sum("b2").alias("b1"))
    uni = (
        reference.select(F.explode(_clean_tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("u1"))
    )
    row = uni.agg(
        F.sum("u1").alias("n"), F.count("*").alias("v")
    ).first()
    return TrigramLM(
        tri=tri, tri_ctx=tri_ctx, bi=bi, bi_ctx=bi_ctx, uni=uni,
        n_tokens=int(row.n or 0), vocab_size=int(row.v or 0),
    )


def score_perplexity_trigram(
    df: DataFrame,
    lm: TrigramLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 1.0,
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
    broadcast_lm: bool = True,
) -> DataFrame:
    """Per-document perplexity under the INTERPOLATED trigram model
    (Jelinek-Mercer over add-k layers):

        p(w|u,v) = λ₃·(t3+k)/(t2+kV) + λ₂·(b2+k)/(b1+kV) + λ₁·(u1+k)/(N+kV)

    Returns (id, n_trigrams, cross_entropy, perplexity); documents with
    <3 tokens carry no trigram evidence and are excluded. Five joins
    against the LM frames — all broadcast by default (a reference LM is
    executor-small); the per-document aggregation is the only shuffle on
    the scored corpus."""
    l3, l2, l1 = (float(x) for x in lambdas)
    if abs(l3 + l2 + l1 - 1.0) > 1e-9:
        raise ValueError(f"lambdas must sum to 1, got {lambdas}")
    if lm.vocab_size <= 0:
        raise ValueError("LM has an empty vocabulary")
    bc = F.broadcast if broadcast_lm else (lambda x: x)
    kv = float(k) * float(lm.vocab_size)
    triples = trigram_triples(df, text_col, id_col)
    p3 = (F.coalesce("t3", F.lit(0)) + k) / (F.coalesce("t2", F.lit(0)) + kv)
    p2 = (F.coalesce("b2", F.lit(0)) + k) / (F.coalesce("b1", F.lit(0)) + kv)
    p1 = (F.coalesce("u1", F.lit(0)) + k) / (float(lm.n_tokens) + kv)
    nll = -F.log(l3 * p3 + l2 * p2 + l1 * p1)
    return (
        triples.join(bc(lm.tri), ["c2", "c1", "w"], "left")
        .join(bc(lm.tri_ctx), ["c2", "c1"], "left")
        .join(
            bc(lm.bi.withColumnsRenamed({"ctx": "c1"})), ["c1", "w"], "left"
        )
        .join(bc(lm.bi_ctx.withColumnsRenamed({"ctx": "c1"})), ["c1"], "left")
        .join(bc(lm.uni), ["w"], "left")
        .withColumn("_nll", nll)
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_trigrams"),
            F.avg("_nll").alias("cross_entropy"),
        )
        .withColumn("perplexity", F.exp("cross_entropy"))
    )


def pmi_pairs(
    df: DataFrame,
    min_count: int = 5,
    top_k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Adjacent-bigram pointwise mutual information → (left, right, cnt,
    pmi): the classic collocation detector (Church & Hanks 1990),

        pmi(a,b) = ln( c(a,b) · N / (c_left(a) · c_right(b)) )

    with marginals taken over the bigram table itself (left-slot and
    right-slot totals). High-PMI pairs are multiword units ("new york",
    "machine learning") — useful for tokenizer seeding and template
    detection. ``min_count`` suppresses the low-frequency PMI explosion
    (hapax pairs score arbitrarily high).

    Plan: one bigram groupBy (distinct-bigram-sized shuffle with map-side
    combine), two re-aggregations of that count frame for the marginals,
    one scalar total carried as a broadcast 1-row frame — the corpus is
    scanned once. ``top_k`` ranks by (pmi DESC, left, right) via
    orderBy+limit (TakeOrderedAndProject — per-partition top-k, no
    global sort)."""
    pairs = bigram_pairs(df, text_col, id_col).select("ctx", "w")
    c2 = pairs.groupBy(F.col("ctx").alias("left"), F.col("w").alias("right")).agg(
        F.count("*").alias("cnt")
    )
    tot = c2.agg(F.sum("cnt").alias("_n"))
    la = c2.groupBy("left").agg(F.sum("cnt").alias("_la"))
    rb = c2.groupBy("right").agg(F.sum("cnt").alias("_rb"))
    out = (
        c2.where(F.col("cnt") >= int(min_count))
        .join(la, "left")
        .join(rb, "right")
        .crossJoin(F.broadcast(tot))
        .withColumn(
            # marginals cast to double BEFORE multiplying: at the corpus
            # scales this module targets, a long*long marginal product can
            # exceed 2^63 and wrap negative under non-ANSI arithmetic,
            # silently NULLing the log for exactly the most frequent pairs
            "pmi",
            F.log(
                F.col("cnt").cast("double")
                * F.col("_n")
                / (F.col("_la").cast("double") * F.col("_rb"))
            ),
        )
        .select("left", "right", "cnt", "pmi")
    )
    if top_k is not None:
        out = out.orderBy(
            F.desc("pmi"), F.asc("left"), F.asc("right")
        ).limit(int(top_k))
    return out
