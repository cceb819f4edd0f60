"""Sequence packing and dataset splitting — the operators that sit between
a cleaned corpus and a training run.

``pack_sequences`` implements the standard concat-then-chunk pretraining
layout: documents are laid out in a DETERMINISTIC global order (stratum,
then id), each contributing its token count plus a separator, and the
concatenated stream is chunked into fixed-length training sequences. Each
document learns its byte offset in the stream and therefore which sequence
id it starts in. Reproducible across runs, engines, and cluster sizes —
the order is data-derived, never partition-derived.

Scale design: the global running sum is the distributed-rank pattern (cf.
``operators/align.py:union_index_df``) — cumsum within deterministic
value-derived buckets + per-bucket totals (tiny, broadcast) composed into
global offsets. No single-partition sort, no sampled boundaries; the plan
is identical on every re-execution. ``split_dataset`` is row-local hash
arithmetic — scales like a filter, exactly as ``pipeline.sampling`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_timeseries_spark.functions import hashed_with_seed

from .sampling import _MOD
from .text import token_count


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    sep_tokens: int = 1,
    bpe: bool = True,
    n_buckets: int | None = None,
    epoch_col: str = "epoch",
) -> DataFrame:
    """Concat-then-chunk packing plan: → (stratum, id, n_tokens, offset,
    seq_id, n_seqs_spanned).

    ``offset`` is the global token position where the document starts in
    the concatenated stream (order = ``stratum_col, id_col``; each doc is
    followed by ``sep_tokens`` separator tokens). ``seq_id = offset //
    seq_len`` is the fixed-length training sequence the document starts
    in; ``n_seqs_spanned`` how many sequences it crosses — downstream
    writers group by seq_id to materialize the training examples.

    Determinism needs a UNIQUE ordering key. When the input carries an
    ``epoch_col`` column (``mixture_epochs`` output, where the same id
    legitimately appears once per epoch copy) it joins the ordering and
    the output, so per-copy offsets are stable under any partitioning.
    Without it, duplicate ids would tie in the cumsum ordering and make
    row-level offset attribution partition-order dependent — so they are
    rejected loudly (checked lazily inside the plan, no extra action).
    """
    spark = df.sparkSession
    if n_buckets is None:
        n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # the value-derived bucketing is range arithmetic over the id — with a
    # non-numeric id the NULL coercion would silently collapse every row
    # into ONE bucket (the exact single-partition cumsum this design
    # exists to avoid), so fail eagerly instead
    id_type = dict(df.dtypes)[id_col]
    if id_type not in ("tinyint", "smallint", "int", "bigint"):
        raise ValueError(
            f"pack_sequences needs an integral {id_col!r} for value-derived "
            f"bucketing (got {id_type}); map ids to a surrogate long first"
        )
    has_epoch = epoch_col in df.columns
    n = (token_count(F.col(text_col), bpe=bpe) + F.lit(sep_tokens)).cast("long")
    base = df.select(
        F.col(stratum_col).alias("stratum"),
        F.col(id_col).alias("id"),
        *([F.col(epoch_col).alias("_epoch")] if has_epoch else []),
        n.alias("n_tokens"),
    )

    # deterministic value-derived bucket of the id (broadcast min/max span;
    # identical in every re-execution — see union_index_df for why sampled
    # range partitioning is NOT usable when two consumers share a subtree)
    span = base.agg(
        F.min("id").alias("_lo"), F.max("id").alias("_hi")
    )
    width = F.greatest(
        (F.col("_hi") - F.col("_lo") + F.lit(1)).cast("double")
        / F.lit(float(n_buckets)),
        F.lit(1.0),
    )
    bucketed = base.join(F.broadcast(span)).withColumn(
        "_b",
        F.least(
            F.floor((F.col("id") - F.col("_lo")) / width),
            F.lit(n_buckets - 1),
        ).cast("int"),
    )
    order_cols = ["id", "_epoch"] if has_epoch else ["id"]
    w_local = (
        Window.partitionBy("stratum", "_b")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = bucketed.withColumn(
        "_cum", F.coalesce(F.sum("n_tokens").over(w_local), F.lit(0))
    )
    # duplicate ordering keys make the cumsum ambiguous (row-level offset
    # attribution would be partition-order dependent) — fail at the first
    # duplicate (id) / (id, epoch). The lag shares w_local's partitioning
    # AND sort (same-key rows are adjacent in the bucket since _b derives
    # from the id value), so the check rides the exchange the cumsum
    # already pays.
    w_adj = Window.partitionBy("stratum", "_b").orderBy(*order_cols)
    dup_pred = F.lag("id").over(w_adj) == F.col("id")
    what = f"duplicate id without an {epoch_col!r} column: "
    if has_epoch:
        dup_pred = dup_pred & (
            F.lag("_epoch").over(w_adj) == F.col("_epoch")
        )
        what = f"duplicate (id, {epoch_col}): "
    local = local.withColumn(
        "_cum",
        F.when(
            dup_pred,
            F.raise_error(
                F.concat(
                    F.lit("pack_sequences: "),
                    F.lit(what),
                    F.col("id").cast("string"),
                )
            ).cast("long"),
        ).otherwise(F.col("_cum")),
    )
    # per-(stratum, bucket) totals: #strata × #buckets rows — tiny; the
    # running sum over them is the global composition, broadcast back
    totals = local.groupBy("stratum", "_b").agg(
        F.sum("n_tokens").alias("_tot")
    )
    w_off = Window.orderBy("stratum", "_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("stratum", "_b", "_off")
    packed = (
        local.join(F.broadcast(offsets), ["stratum", "_b"])
        .withColumn("offset", (F.col("_cum") + F.col("_off")).cast("long"))
        .withColumn("seq_id", (F.col("offset") / F.lit(seq_len)).cast("long"))
        .withColumn(
            # span of the document's OWN tokens (last own index = offset +
            # own - 1): counting the trailing separator spanned one extra
            # sequence for docs ending exactly on a boundary; 0-token docs
            # span 0 sequences
            "n_seqs_spanned",
            F.when(
                F.col("n_tokens") - F.lit(sep_tokens) > 0,
                (
                    (
                        (
                            F.col("offset")
                            + F.col("n_tokens")
                            - F.lit(sep_tokens)
                            - 1
                        )
                        / F.lit(seq_len)
                    ).cast("long")
                    - F.col("seq_id")
                    + 1
                ),
            )
            .otherwise(0)
            .cast("int"),
        )
    )
    return packed.select(
        F.col("stratum").alias(stratum_col),
        F.col("id").alias(id_col),
        *([F.col("_epoch").alias(epoch_col)] if has_epoch else []),
        (F.col("n_tokens") - F.lit(sep_tokens)).alias("n_tokens"),
        "offset",
        "seq_id",
        "n_seqs_spanned",
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks → (id,
    chunk_id, n_tokens, chunk_text) — the RAG-indexing / long-doc-training
    prep step. Chunk *k* covers whitespace tokens ``[k·stride, k·stride +
    chunk_tokens)`` with ``stride = chunk_tokens − overlap``; the last
    chunk is the remainder (never empty, never duplicated: a doc whose
    tail would start past the end emits no extra chunk).

    Entirely row-local — tokenize once (``let``-bound), explode a
    ``sequence`` of chunk starts, slice the token array per chunk. No
    shuffle at all: at 100 TB this is a map-side transform whose output
    is ~(1 + overlap/stride)× the input."""
    if overlap >= chunk_tokens:
        raise ValueError(f"overlap {overlap} must be < chunk_tokens {chunk_tokens}")
    stride = chunk_tokens - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.lit(0)
    ).otherwise(F.size(toks))
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        n.alias("_n"),
        # number of chunks: ceil(max(n - overlap, 1) / stride), min 1
        F.greatest(
            F.ceil(
                (F.greatest(n - F.lit(overlap), F.lit(1)))
                / F.lit(float(stride))
            ),
            F.lit(1),
        ).cast("int").alias("_nc"),
    )
    exploded = base.select(
        id_col,
        "_toks",
        "_n",
        F.explode(F.sequence(F.lit(0), F.col("_nc") - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride
    length = F.least(F.lit(chunk_tokens), F.col("_n") - start)
    chunk = F.slice("_toks", start + 1, F.greatest(length, F.lit(0)))
    return exploded.select(
        id_col,
        "chunk_id",
        F.greatest(length, F.lit(0)).cast("int").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


def split_dataset(
    df: DataFrame,
    fractions: dict[str, float] | None = None,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Deterministic train/val/test assignment: adds a ``split`` column.

    The id's seeded hash lands in [0, 1e6); cumulative fraction boundaries
    (in sorted split-name order, so the mapping is independent of dict
    ordering) carve that range. Row-local — no shuffle, no RNG stream, the
    same document lands in the same split on every run, engine, and
    cluster size. Fractions must sum to ≤ 1; any remainder is labeled
    ``None`` (dropped rows for mixture-style holdout)."""
    if fractions is None:
        fractions = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(fractions.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"fractions sum to {total} > 1")
    bucket = F.pmod(
        hashed_with_seed(F.col(id_col).cast("string"), seed, hash_fn), _MOD
    )
    expr = F.lit(None).cast("string")
    hi = 0
    # build the CASE chain from the TOP boundary down so earlier WHENs
    # don't shadow later ranges
    bounds = []
    for name, frac in sorted(fractions.items()):
        lo = hi
        hi = lo + int(round(frac * _MOD))
        bounds.append((name, lo, hi))
    if bounds and abs(total - 1.0) < 1e-9:
        # fractions that sum to exactly 1 must cover the whole range:
        # per-split rounding (e.g. three 1/3s → 999999) would otherwise
        # leave a deterministic sliver of ids with split=None
        name, lo, _ = bounds[-1]
        bounds[-1] = (name, lo, _MOD)
    for name, lo, hi in reversed(bounds):
        expr = F.when((bucket >= lo) & (bucket < hi), name).otherwise(expr)
    return df.withColumn("split", expr)
