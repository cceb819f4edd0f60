"""Keyword search over the corpus: TF-IDF weights and BM25 ranking.

The retrieval side of a training-data pipeline: given query strings, rank
documents by Okapi BM25 (Robertson & Zaragoza 2009, "The Probabilistic
Relevance Framework: BM25 and Beyond") — used for corpus exploration,
benchmark-contamination triage, and quality-slice mining. Everything is
DataFrame ops; the idf variant is Lucene's non-negative
``ln(1 + (N - df + 0.5)/(df + 0.5))``.

100 TB scale notes: the exploded term stream is **filtered to query terms
before any shuffle** — a broadcast semi-join against the (tiny) query-term
set, so the inverted-index posting lists are the only thing aggregated;
corpus-wide scalars (N, avgdl) ride a broadcast 1-row frame, never a
driver collect; per-query top-k is a ``row_number`` window partitioned by
query id (k small, per-partition heaps); document length is computed
row-local before the explode so the corpus text is scanned once.

No reference counterpart: sryza/spark-timeseries has no text pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_timeseries_spark.pipeline.text import token_count, tokens

__all__ = ["doc_terms", "tf_idf", "bm25_search"]


def doc_terms(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, term, tf, dl) — one row per distinct term per document, with
    the document length (token count) carried along. One explode + one
    (id, term) aggregation; dl is computed before the explode (row-local)."""
    base = df.select(
        F.col(id_col),
        F.filter(tokens(F.lower(F.col(text_col))), lambda t: t != F.lit("")).alias(
            "_toks"
        ),
    ).withColumn("dl", F.size("_toks"))
    return (
        base.select(id_col, "dl", F.explode("_toks").alias("term"))
        .groupBy(id_col, "term", "dl")
        .agg(F.count("*").alias("tf"))
    )


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
) -> DataFrame:
    """(id, term, tf, df, tfidf) with tfidf = tf · ln(N/df). ``min_df``
    prunes the long hapax tail (at corpus scale most terms occur once —
    dropping them early shrinks the df-join input by ~half).

    The document-frequency frame aggregates the SAME (id, term) frame the
    weights come from (no second corpus scan); N rides a broadcast 1-row
    frame so nothing hits the driver."""
    terms = doc_terms(df, text_col, id_col)
    dfreq = (
        terms.groupBy("term")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= int(min_df))
    )
    n = df.agg(F.count("*").alias("_n"))
    return (
        terms.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("_n") / F.col("df")))
        .select(id_col, "term", "tf", "df", "tfidf")
    )


def bm25_search(
    df: DataFrame,
    queries: dict[str, str] | str,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int | None = None,
) -> DataFrame:
    """Top-``k`` documents per query by BM25.

    ``queries`` is {query_id: query_string} (a bare string becomes
    ``{"q": s}``). Returns (query_id, id, rank, score); ties break on the
    smaller document id so ranking is deterministic. ``round_digits``
    quantizes the score (boundary-nudged half-up) BEFORE ranking — scores
    are sums whose float addition order is engine/partition-dependent, so
    replayable rankings (e.g. vs a SQL oracle) need ranks derived from the
    quantized value, not the raw one.

    Plan shape (the part that matters at 100 TB): query terms form a
    broadcast frame; the corpus's exploded term stream inner-joins it
    immediately — everything not matching a query term is discarded before
    the first shuffle. df/idf aggregates only the surviving postings; the
    final top-k is a per-query-id window."""
    if isinstance(queries, str):
        queries = {"q": queries}
    spark = df.sparkSession
    qterms = [
        (qid, t)
        for qid, qs in sorted(queries.items())
        for t in sorted(set(qs.lower().split()))
        if t
    ]
    if not qterms:
        raise ValueError("no query terms")
    qdf = F.broadcast(
        spark.createDataFrame(qterms, "query_id string, term string")
    )

    # the exploded term stream joins the broadcast query-term set BEFORE
    # the tf aggregation — Catalyst will not push a join through a groupBy,
    # so building on doc_terms() would shuffle the FULL vocabulary; this
    # shape shuffles only query-term postings (plan-pinned in tests)
    base = df.select(
        F.col(id_col),
        F.filter(tokens(F.lower(F.col(text_col))), lambda t: t != F.lit("")).alias(
            "_toks"
        ),
    ).withColumn("dl", F.size("_toks"))
    hits = (
        base.select(id_col, "dl", F.explode("_toks").alias("term"))
        .join(qdf.select("term").distinct(), "term")
        .groupBy(id_col, "term", "dl")
        .agg(F.count("*").alias("tf"))
    )
    # corpus scalars on a broadcast 1-row frame — no driver action
    stats = df.agg(
        F.count("*").alias("_n"),
        F.avg(token_count(F.col(text_col))).alias("_avgdl"),
    )
    # df derives from the postings frame (identical subplan → the shuffle
    # is deduped by exchange reuse), never from a second vocabulary pass
    dfreq = hits.groupBy("term").agg(
        F.countDistinct(id_col).alias("df")
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("_n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("_avgdl"))
    )
    scored = (
        hits.join(qdf, "term")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("_s", idf * tf_part)
        .groupBy("query_id", id_col)
        .agg(F.sum("_s").alias("score"))
    )
    if round_digits is not None:
        s = float(10**round_digits)
        scored = scored.withColumn(
            "score", F.floor(F.col("score") * s + F.lit(0.500001)) / s
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col(id_col)
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("query_id", id_col, "rank", "score")
    )
