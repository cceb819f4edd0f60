"""Structured Streaming extension for observations tables.

The reference has NO streaming surface (SURVEY §2.12 — verified absence);
its docs only call the observations layout "append friendly"
(``users.md:54-56``). This module is the documented extension point: the
same observations schema ``(ts, key, value)`` consumed as a stream with
watermarked windowed aggregation — i.e. streaming ``resample`` — plus
stateful per-key EWMA via ``applyInPandasWithState``.

Scale design: windowed aggregation is Spark's native streaming shuffle with
state store compaction; the watermark bounds state. The EWMA operator keeps
O(1) state per key (the running smoothed value).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_observations_stream(
    spark,
    path: str,
    schema: str = "ts timestamp, key string, value double",
    fmt: str = "parquet",
) -> DataFrame:
    """File-source stream of observations (one file batch = one micro-batch)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def streaming_resample(
    stream: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    aggr: str = "avg",
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling/sliding-window aggregation — the streaming form
    of ``resample`` (open-left/stamp-left regime). Late data beyond the
    watermark is dropped; state is bounded by watermark × keys."""
    agg_fn = getattr(F, aggr)
    win = (
        F.window(ts_col, window_duration, slide)
        if slide
        else F.window(ts_col, window_duration)
    )
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col, win.alias("win"))
        .agg(agg_fn(value_col).alias(value_col))
        .select(
            key_col,
            F.col("win.start").alias("ts"),
            value_col,
        )
    )


def streaming_ewma(
    stream: DataFrame,
    smoothing: float,
    watermark: str = "2 hours",
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Stateful streaming EWMA per key via ``applyInPandasWithState``:
    state = (last smoothed value, last folded timestamp); each micro-batch
    folds its (sorted) observations into the running smoothed value — the
    streaming analog of ``EWMAModel.addTimeDependentEffects``
    (``models/EWMA.scala:136-143``).

    EWMA is ORDER-SENSITIVE, and sorting only happens within a
    micro-batch: a late-but-within-watermark row arriving after newer
    data has already been folded cannot be inserted retroactively.
    Folding it anyway would silently corrupt every subsequent value, so
    such rows are DROPPED (the state carries the last folded timestamp) —
    in-order streams match the batch EWMA exactly; disordered streams
    degrade by omission, never by corruption. A key whose batch holds
    only null values keeps its state untouched (writing a 0.0 seed there
    biased the key's whole tail toward zero)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs)).sort_values(ts_col)
        if state.exists:
            s, last_us = state.get
        else:
            s, last_us = None, None
        out_ts, out_v = [], []
        for _, row in rows.iterrows():
            x = row[value_col]
            if x is None or pd.isna(x):
                continue
            ts_us = int(pd.Timestamp(row[ts_col]).value // 1000)
            if last_us is not None and ts_us < last_us:
                continue  # out-of-order: drop, never fold retroactively
            s = x if s is None else smoothing * x + (1 - smoothing) * s
            last_us = ts_us
            out_ts.append(row[ts_col])
            out_v.append(s)
        if s is not None:
            state.update((float(s), int(last_us)))
        yield pd.DataFrame({"key": key[0], "ts": out_ts, "smoothed": out_v})

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            update,
            outputStructType="key string, ts timestamp, smoothed double",
            stateStructType="s double, last_us long",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def read_documents_stream(
    spark,
    path: str,
    schema: str = "doc_id long, source string, lang string, text string",
    fmt: str = "parquet",
) -> DataFrame:
    """File-source stream of documents — the streaming ingest side of the
    training-data pipeline (new crawl shards land as files)."""
    return spark.readStream.format(fmt).schema(schema).load(path)


def streaming_dedup_exact(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    watermark: str = "24 hours",
    normalize: bool = True,
) -> DataFrame:
    """Streaming exact dedup: keep ONE document per content digest.

    Uses ``dropDuplicates`` on the md5 content digest — Spark's native
    streaming dedup operator with state-store backing. With a ``ts_col`` the
    watermark bounds state (duplicates arriving later than the watermark are
    NOT caught — the usual streaming trade-off, stated rather than hidden);
    without one, state grows with the number of distinct documents, which is
    the exact-dedup lower bound anyway (one digest per unique doc).

    Batch parity: on a static frame this keeps one row per digest like
    ``pipeline.dedup.dedup_exact``, but the representative differs: batch
    keeps the lowest id; streaming keeps whichever row its state store saw
    first (arbitrary WITHIN a micro-batch, earliest batch across batches)."""
    from spark_timeseries_spark.pipeline.dedup import content_digest

    out = stream.withColumn("_h", content_digest(F.col(text_col), normalize))
    if ts_col is not None:
        out = out.withWatermark(ts_col, watermark)
        out = out.dropDuplicatesWithinWatermark(["_h"])
    else:
        out = out.dropDuplicates(["_h"])
    return out.drop("_h")


def streaming_token_stats(
    stream: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    source_col: str = "source",
    text_col: str = "text",
    watermark: str = "2 hours",
) -> DataFrame:
    """Windowed per-source document/token/char throughput — the ingest
    monitoring aggregate of a streaming training-data pipeline (the
    streaming twin of the ``token_count_by_source`` batch query)."""
    from spark_timeseries_spark.pipeline.text import token_count

    n_tokens = token_count(F.col(text_col))  # blank-guard lives inside
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration), source_col)
        .agg(
            F.count("*").alias("docs"),
            F.sum(n_tokens).alias("total_tokens"),
            F.sum(F.length(text_col)).alias("total_chars"),
        )
        .select(
            F.col("window.start").alias("ts"), source_col,
            "docs", "total_tokens", "total_chars",
        )
    )


def streaming_incremental_dedup(
    stream: DataFrame,
    existing_digests: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Streaming incremental-ingest dedup: drop arriving documents whose
    content digest already exists in a STATIC corpus snapshot, then
    dedup the stream itself (the streaming counterpart of
    ``pipeline.dedup.dedup_exact_incremental``).

    The corpus side is a static frame of digests — Structured Streaming
    plans the stream-static LEFT ANTI join natively, re-reading (or
    caching) only the one-column digest table per micro-batch; the old
    corpus's text never moves. ``existing_digests`` may be either a
    frame already carrying a ``_dig`` column (e.g. a persisted digest
    table — the build-once artifact at corpus scale) or raw documents
    with ``text_col``, digested here with the same normalization. The
    in-stream dedup is the state-store-backed ``dropDuplicates`` on the
    digest, exactly as :func:`streaming_dedup_exact`."""
    from spark_timeseries_spark.pipeline.dedup import content_digest

    if existing_digests.isStreaming:
        raise ValueError("existing_digests must be a STATIC frame")
    if "_dig" not in existing_digests.columns:
        existing_digests = existing_digests.select(
            content_digest(F.col(text_col), normalize).alias("_dig")
        )
    old = existing_digests.select("_dig").distinct()
    out = (
        stream.withColumn("_dig", content_digest(F.col(text_col), normalize))
        .join(old, "_dig", "left_anti")
        .dropDuplicates(["_dig"])
    )
    return out.drop("_dig")


def streaming_outliers(
    stream: DataFrame,
    stats: DataFrame,
    threshold: float = 3.5,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Streaming outlier scoring against a STATIC per-key stats snapshot:
    arriving observations get ``score``/``is_outlier`` from a
    (key, center, scale) table fitted offline (batch
    ``operators.outliers`` output, a robust-fit artifact, or any SLA
    table) — the monitoring half of the batch operator, as a
    stream-static join + row-local arithmetic (no state store, no
    watermark needed; refresh the snapshot by replacing the table).

    ``stats`` must carry ``key_col``, ``center`` and ``scale`` columns;
    keys absent from the snapshot score NULL (no baseline — surface
    them, don't guess). Zero scale yields NULL, as in the batch twin."""
    if stats.isStreaming:
        raise ValueError("stats must be a STATIC frame")
    for c in ("center", "scale"):
        if c not in stats.columns:
            raise ValueError(f"stats is missing the {c!r} column")
    snap = F.broadcast(stats.select(key_col, "center", "scale"))
    score = F.try_divide(F.col(value_col) - F.col("center"), F.col("scale"))
    return (
        stream.join(snap, key_col, "left")
        .withColumn("score", score)
        .withColumn(
            "is_outlier",
            F.when(
                F.col("score").isNotNull(),
                F.abs(F.col("score")) > float(threshold),
            ),
        )
        .drop("center", "scale")
    )
