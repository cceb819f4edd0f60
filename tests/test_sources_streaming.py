"""Save/load round-trips (reference sidecar formats), Yahoo CSV parsing,
and Structured Streaming operators (file-source micro-batches)."""

import datetime
import os
import shutil
import tempfile
import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_timeseries_spark import DayFrequency, TimeSeriesDataFrame, uniform
from spark_timeseries_spark.sources import serde
from spark_timeseries_spark.streaming import streaming_ewma, streaming_resample


@pytest.fixture(scope="module")
def conformed(spark):
    rows = []
    start = pd.Timestamp("2015-04-09")
    for s, key in enumerate(["a", "b"]):
        for i in range(6):
            if (s, i) != (1, 2):
                rows.append(
                    ((start + pd.Timedelta(days=i)).to_pydatetime(), key, float(s * 10 + i))
                )
    df = spark.createDataFrame(rows, "ts timestamp, key string, value double")
    idx = uniform("2015-04-09", 6, DayFrequency(1))
    return TimeSeriesDataFrame.from_observations(df, idx)


def _roundtrip_equal(t1, df2):
    a = t1.df.orderBy("key", "loc").toPandas()
    b = df2.orderBy("key", "loc").toPandas()
    assert a.key.tolist() == b.key.tolist()
    assert a["loc"].tolist() == b["loc"].tolist()
    np.testing.assert_allclose(
        a.value.to_numpy(dtype=float), b.value.to_numpy(dtype=float)
    )


def test_parquet_roundtrip_with_idx_sidecar(spark, conformed, tmp_path):
    path = str(tmp_path / "ts_parquet")
    serde.save_parquet(conformed.df, conformed.index, path)
    assert os.path.exists(path + ".idx")
    df2, idx2 = serde.load_parquet(spark, path)
    assert idx2.to_string() == conformed.index.to_string()
    _roundtrip_equal(conformed, df2)


def test_csv_roundtrip_with_timeindex_sidecar(spark, conformed, tmp_path):
    path = str(tmp_path / "ts_csv")
    serde.save_csv(conformed.df, conformed.index, path)
    assert os.path.exists(os.path.join(path, "timeIndex"))
    df2, idx2 = serde.load_csv(spark, path)
    assert idx2.size == 6
    _roundtrip_equal(conformed, df2)


def test_yahoo_csv_parser(spark, tmp_path):
    csv = tmp_path / "GOOG.csv"
    csv.write_text(
        "Date,Open,High,Low,Close,Volume,Adj Close\n"
        "2014-10-24,544.36,545.0,537.65,539.78,1053200,539.78\n"
        "2014-10-23,548.28,549.62,541.75,543.98,1184500,543.98\n"
    )
    obs = serde.load_yahoo_csv(spark, str(csv), key_prefix="GOOG.")
    pdf = obs.toPandas()
    assert len(pdf) == 12  # 2 rows × 6 series
    keys = set(pdf.key)
    assert "GOOG.Close" in keys and "GOOG.AdjClose" in keys
    close = pdf[(pdf.key == "GOOG.Close")].sort_values("ts")
    assert close.value.tolist() == [543.98, 539.78]


def test_yahoo_directory_reader(spark, tmp_path):
    d = tmp_path / "yahoo"
    d.mkdir()
    (d / "GOOG.csv").write_text(
        "Date,Open,High,Low,Close,Volume,Adj Close\n"
        "2014-10-24,544.36,545.0,537.65,539.78,1053200,539.78\n"
        "2014-10-23,548.28,549.62,541.75,543.98,1184500,543.98\n"
    )
    (d / "AAPL.csv").write_text(
        "Date,Open,High,Low,Close,Volume,Adj Close\n"
        "2014-10-24,105.0,106.0,104.0,105.2,900000,105.2\n"
    )
    from spark_timeseries_spark.sources import read_yahoo_observations

    pdf = read_yahoo_observations(spark, str(d)).toPandas()
    assert len(pdf) == 18  # (2 + 1) rows × 6 fields
    keys = set(pdf.key)
    assert "GOOG.csvClose" in keys and "AAPL.csvClose" in keys
    # reference keying is keyPrefix + RAW header token — space preserved
    # ("GOOG.csvAdj Close", YahooParser.scala:29-37)
    assert "GOOG.csvAdj Close" in keys
    goog_close = pdf[pdf.key == "GOOG.csvClose"].sort_values("ts")
    assert goog_close.value.tolist() == [543.98, 539.78]


def test_streaming_resample_micro_batches(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    os.makedirs(src)
    rows = [
        (pd.Timestamp("2024-01-01 00:10").to_pydatetime(), "a", 1.0),
        (pd.Timestamp("2024-01-01 00:40").to_pydatetime(), "a", 3.0),
        (pd.Timestamp("2024-01-01 01:20").to_pydatetime(), "a", 5.0),
        (pd.Timestamp("2024-01-01 00:30").to_pydatetime(), "b", 10.0),
    ]
    spark.createDataFrame(rows, "ts timestamp, key string, value double").write.parquet(
        src + "/batch1"
    )
    stream = (
        spark.readStream.schema("ts timestamp, key string, value double")
        .parquet(src + "/*")
    )
    agg = streaming_resample(stream, "1 hour", watermark="4 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("resampled")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from resampled").toPandas()
    by = {(r.key, str(r.ts)): r.value for r in out.itertuples()}
    assert by[("a", "2024-01-01 00:00:00")] == 2.0
    assert by[("a", "2024-01-01 01:00:00")] == 5.0
    assert by[("b", "2024-01-01 00:00:00")] == 10.0


def test_streaming_ewma_state(spark, tmp_path):
    src = str(tmp_path / "ewma_src")
    os.makedirs(src)
    rows = [
        (pd.Timestamp("2024-01-01 00:00").to_pydatetime(), "a", 1.0),
        (pd.Timestamp("2024-01-01 01:00").to_pydatetime(), "a", 2.0),
        (pd.Timestamp("2024-01-01 02:00").to_pydatetime(), "a", 3.0),
    ]
    spark.createDataFrame(rows, "ts timestamp, key string, value double").write.parquet(
        src + "/b1"
    )
    stream = (
        spark.readStream.schema("ts timestamp, key string, value double")
        .parquet(src + "/*")
    )
    sm = streaming_ewma(stream, smoothing=0.5, watermark="1 minute")
    q = (
        sm.writeStream.format("memory")
        .queryName("ewma_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from ewma_out order by ts").toPandas()
    # S0=1, S1=.5*2+.5*1=1.5, S2=.5*3+.5*1.5=2.25
    np.testing.assert_allclose(out.smoothed.to_numpy(), [1.0, 1.5, 2.25])


def test_streaming_dedup_exact(spark, tmp_path):
    """Streaming exact dedup keeps the first document per content digest
    across micro-batches (state persists between batches)."""
    from spark_timeseries_spark.streaming import (
        read_documents_stream,
        streaming_dedup_exact,
    )

    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    schema = "doc_id long, source string, lang string, text string"
    b1 = [(1, "web", "en", "alpha beta"), (2, "web", "en", "gamma delta"),
          (3, "web", "en", "alpha  beta")]  # 3 = whitespace-variant dup of 1
    spark.createDataFrame(b1, schema).write.parquet(src + "/b1")

    stream = read_documents_stream(spark, src + "/*")
    deduped = streaming_dedup_exact(stream)
    q = (
        deduped.writeStream.format("memory").queryName("dd")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out1 = spark.sql("select doc_id from dd").toPandas()
    assert len(out1) == 2  # the normalized duplicate was dropped
    assert set(out1.doc_id) <= {1, 2, 3} and 2 in set(out1.doc_id)

    # second micro-batch: an exact repeat and one new doc
    b2 = [(4, "web", "en", "alpha beta"), (5, "web", "en", "epsilon")]
    spark.createDataFrame(b2, schema).write.parquet(src + "/b2")
    q2 = (
        deduped.writeStream.format("memory").queryName("dd2")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q2.awaitTermination(120)
    out2 = spark.sql("select doc_id from dd2").toPandas()
    # replaying all files still yields exactly one row per distinct digest
    # (3 digests); the representative within a batch is arbitrary
    assert len(out2) == 3 and len(set(out2.doc_id)) == 3


def test_streaming_token_stats(spark, tmp_path):
    from spark_timeseries_spark.streaming import streaming_token_stats

    src = str(tmp_path / "docs_ts_stream")
    os.makedirs(src)
    schema = "ts timestamp, doc_id long, source string, text string"
    rows = [
        (pd.Timestamp("2024-01-01 00:05").to_pydatetime(), 1, "web", "a b c"),
        (pd.Timestamp("2024-01-01 00:55").to_pydatetime(), 2, "web", "d e"),
        (pd.Timestamp("2024-01-01 01:10").to_pydatetime(), 3, "books", ""),
    ]
    spark.createDataFrame(rows, schema).write.parquet(src + "/b1")
    stream = (
        spark.readStream.schema(schema).parquet(src + "/*")
    )
    agg = streaming_token_stats(stream, "1 hour")
    q = (
        agg.writeStream.format("memory").queryName("tok")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from tok").toPandas()
    by = {(r.source, str(r.ts)): (r.docs, r.total_tokens) for r in out.itertuples()}
    assert by[("web", "2024-01-01 00:00:00")] == (2, 5)
    assert by[("books", "2024-01-01 01:00:00")] == (1, 0)  # empty doc -> 0 tokens


def test_streaming_session_stats(spark, tmp_path):
    """session_stats' native session_window expression works unchanged under
    Structured Streaming: watermark + session windows over a file stream."""
    from pyspark.sql import functions as F

    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    rows = [
        (pd.Timestamp("2024-01-01 00:00").to_pydatetime(), "a", 1.0),
        (pd.Timestamp("2024-01-01 00:05").to_pydatetime(), "a", 2.0),  # same session
        (pd.Timestamp("2024-01-01 01:00").to_pydatetime(), "a", 4.0),  # gap > 10min → new
        (pd.Timestamp("2024-01-01 00:02").to_pydatetime(), "b", 7.0),
    ]
    spark.createDataFrame(rows, "ts timestamp, key string, value double").write.parquet(
        src + "/batch1"
    )
    stream = (
        spark.readStream.schema("ts timestamp, key string, value double")
        .parquet(src + "/*")
        .withWatermark("ts", "2 hours")
    )
    agg = stream.groupBy(
        "key", F.session_window("ts", "600 seconds").alias("w")
    ).agg(F.count("*").alias("n_events"), F.sum("value").alias("value_sum"))
    q = (
        agg.select("key", F.col("w.start").alias("start"), "n_events", "value_sum")
        .writeStream.format("memory")
        .queryName("sess")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from sess").toPandas()
    by = {(r.key, str(r.start)): (r.n_events, r.value_sum) for r in out.itertuples()}
    assert by[("a", "2024-01-01 00:00:00")] == (2, 3.0)
    assert by[("a", "2024-01-01 01:00:00")] == (1, 4.0)
    assert by[("b", "2024-01-01 00:02:00")] == (1, 7.0)


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """r3 verdict follow-up: pin the late-data semantics of
    streaming_resample in APPEND mode — a window is emitted exactly once
    when the watermark passes its end, its state is then evicted, and a
    row arriving later than the watermark is DROPPED (never re-emits or
    mutates the closed window). Three runs over one checkpoint so the
    watermark genuinely advances across restarts."""
    src = str(tmp_path / "late_src")
    cp = str(tmp_path / "late_cp")
    sink = str(tmp_path / "late_out")
    os.makedirs(src)
    schema = "ts timestamp, key string, value double"

    def run(name):
        # memory sink can't recover a checkpoint — a durable file sink is
        # what carries the watermark across restarts
        stream = spark.readStream.schema(schema).parquet(src + "/*")
        agg = streaming_resample(stream, "1 hour", watermark="2 hours", aggr="sum")
        q = (
            agg.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", cp)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    def write(name, rows):
        spark.createDataFrame(rows, schema).write.parquet(f"{src}/{name}")

    # run 1: two on-time rows in the 00:00 window + a row at 10:00 that
    # advances the watermark to 08:00, finalizing (emitting) window 00:00
    write("b1", [
        (pd.Timestamp("2024-01-01 00:05").to_pydatetime(), "a", 1.0),
        (pd.Timestamp("2024-01-01 00:10").to_pydatetime(), "a", 2.0),
        (pd.Timestamp("2024-01-01 10:00").to_pydatetime(), "a", 5.0),
    ])
    run("late1")

    # run 2: a LATE row for the closed 00:00 window (behind the 08:00
    # watermark → must be dropped) + a fresh row at 11:30
    write("b2", [
        (pd.Timestamp("2024-01-01 00:20").to_pydatetime(), "a", 100.0),
        (pd.Timestamp("2024-01-01 11:30").to_pydatetime(), "a", 7.0),
    ])
    run("late2")

    # run 3: push the watermark past 12:30 so windows 10:00 and 11:00 close
    write("b3", [
        (pd.Timestamp("2024-01-01 15:00").to_pydatetime(), "a", 9.0),
    ])
    run("late3")

    emitted = spark.read.parquet(sink).toPandas()
    by_window = emitted.groupby(emitted.ts.astype(str)).value.agg(["sum", "count"])
    # window 00:00 emitted exactly once, sum 3.0 — the late 100.0 vanished
    assert by_window.loc["2024-01-01 00:00:00", "count"] == 1
    assert by_window.loc["2024-01-01 00:00:00", "sum"] == 3.0
    assert 100.0 not in set(emitted.value)
    # the later windows each closed exactly once with their on-time sums
    assert by_window.loc["2024-01-01 10:00:00"].tolist() == [5.0, 1]
    assert by_window.loc["2024-01-01 11:00:00"].tolist() == [7.0, 1]


def test_streaming_scrub_and_sample(spark, tmp_path):
    """Row-local pipeline gates (PII scrub, deterministic sampling) are
    streaming-compatible as-is: no state, no aggregation — the same
    expressions run under readStream unchanged."""
    from spark_timeseries_spark.pipeline.sampling import stratified_sample
    from spark_timeseries_spark.pipeline.text import scrub_pii

    src = str(tmp_path / "scrub_src")
    os.makedirs(src)
    rows = [
        (i, "srcA" if i % 2 == 0 else "srcB", f"doc {i} mail u{i}@ex.org end")
        for i in range(40)
    ]
    spark.createDataFrame(rows, "doc_id long, source string, text string").write.parquet(
        src + "/batch1"
    )
    stream = spark.readStream.schema("doc_id long, source string, text string").parquet(
        src + "/*"
    )
    cleaned = stratified_sample(
        scrub_pii(stream), {"srcA": 1.0, "srcB": 0.0}, seed=1
    )
    q = (
        cleaned.writeStream.format("memory").queryName("scrubbed")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select * from scrubbed").toPandas()
    assert set(out.source) == {"srcA"} and len(out) == 20
    assert all("[email]" in t and "@" not in t for t in out.text)


def test_streaming_mixture_epochs(spark, tmp_path):
    """Repeat-factor upsampling is row-local (CASE + hash + explode), so
    the same operator runs under readStream unchanged: a weight-2 stratum
    emits every arriving doc twice, weight-0 never, with epochs intact and
    identical copy decisions to the batch run (hash-determined, not
    partition/RNG-dependent)."""
    from spark_timeseries_spark.pipeline.sampling import mixture_epochs

    src = str(tmp_path / "mix_src")
    os.makedirs(src)
    rows = [(i, "keep2" if i % 2 == 0 else "drop0", f"d{i}") for i in range(30)]
    batch_df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    batch_df.write.parquet(src + "/batch1")

    stream = spark.readStream.schema("doc_id long, source string, text string").parquet(
        src + "/*"
    )
    weights = {"keep2": 2.0, "drop0": 0.0}
    q = (
        mixture_epochs(stream, weights, seed=5)
        .writeStream.format("memory").queryName("mixed")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select doc_id, source, epoch from mixed").toPandas()
    assert set(out.source) == {"keep2"} and len(out) == 30  # 15 docs × 2
    assert sorted(out.epoch.unique()) == [0, 1]

    batch = mixture_epochs(batch_df, weights, seed=5).select(
        "doc_id", "source", "epoch"
    ).toPandas()
    key = lambda d: sorted(map(tuple, d.itertuples(index=False)))  # noqa: E731
    assert key(out) == key(batch)


def test_streaming_blocklist_and_urls(spark, tmp_path):
    """The phrase-blocklist and domain-blocklist gates are row-local regex
    filters, so they run under readStream unchanged — the streaming
    corpus-hygiene front door."""
    from spark_timeseries_spark.pipeline.text import (
        domain_blocklist,
        phrase_blocklist,
    )

    src = str(tmp_path / "bl_src")
    os.makedirs(src)
    rows = [
        (0, "clean doc", "a"),
        (1, "has the badword inside", "a"),
        (2, "links https://spam.bad.site/x", "a"),
        (3, "links https://fine.org/y", "a"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string, source string") \
        .write.parquet(src + "/batch1")
    stream = spark.readStream.schema(
        "doc_id long, text string, source string"
    ).parquet(src + "/*")
    gated = domain_blocklist(
        phrase_blocklist(stream, ["badword"]), ["spam.bad.site"]
    )
    q = (
        gated.writeStream.format("memory").queryName("gated")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("select doc_id from gated").toPandas()
    assert sorted(out.doc_id) == [0, 3]


def test_streaming_ewma_order_guard_and_null_seed(spark, tmp_path):
    """Two review-pinned EWMA state behaviors: (a) an all-null first batch
    must NOT write a 0.0 seed (the key's first real value seeds the
    recursion), and (b) a late row older than the last folded timestamp is
    dropped, never folded retroactively."""
    import math

    from spark_timeseries_spark.streaming.observations import streaming_ewma

    src = str(tmp_path / "ewma_src")
    os.makedirs(src)
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def write_batch(name, rows):
        # one file per batch dir so maxFilesPerTrigger=1 replays them as
        # two ORDERED micro-batches inside a single availableNow run
        # (memory-sink queries cannot restart from a checkpoint)
        spark.createDataFrame(
            rows, "key string, ts timestamp, value double"
        ).coalesce(1).write.parquet(f"{src}/{name}")

    # batch 1: key a has ONLY a null — state must stay unseeded
    write_batch("b1", [("a", t0, None),
                       ("b", t0, 10.0)])
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    # batch 2: a's first real value; b gets a LATE row older than t0
    write_batch("b2", [("a", t0 + datetime.timedelta(minutes=1), 8.0),
                       ("b", t0 - datetime.timedelta(minutes=5), 99.0),
                       ("b", t0 + datetime.timedelta(minutes=2), 20.0)])

    stream = (
        spark.readStream.schema("key string, ts timestamp, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    (streaming_ewma(stream, smoothing=0.5, watermark="1 hour")
     .writeStream.format("memory").queryName("ewma_guard")
     .outputMode("append").trigger(availableNow=True).start()
     .awaitTermination(120))

    rows = {(r.key, r.ts): r.smoothed
            for r in spark.sql("select * from ewma_guard").collect()}
    # (a) a seeds with 8.0, not 0.5*8 + 0.5*0 = 4.0
    assert math.isclose(rows[("a", t0 + datetime.timedelta(minutes=1))], 8.0)
    # (b) b's late 99.0 is dropped; folding order is 10 -> 20
    assert ("b", t0 - datetime.timedelta(minutes=5)) not in rows
    assert math.isclose(
        rows[("b", t0 + datetime.timedelta(minutes=2))], 0.5 * 20 + 0.5 * 10
    )


def test_streaming_incremental_dedup(spark, tmp_path):
    """Stream-static incremental dedup: arriving docs whose digest exists
    in the static corpus snapshot are dropped (whitespace/case variants
    included), in-stream duplicates collapse via the state store across
    micro-batches, and genuinely new docs pass."""
    from spark_timeseries_spark.streaming import (
        read_documents_stream,
        streaming_incremental_dedup,
    )

    schema = "doc_id long, source string, lang string, text string"
    corpus = spark.createDataFrame(
        [(0, "web", "en", "alpha beta"), (1, "web", "en", "gamma delta")],
        schema,
    )
    src = str(tmp_path / "inc_stream")
    os.makedirs(src)
    b1 = [(10, "web", "en", "ALPHA  beta"),   # normalized dup of corpus 0
          (11, "web", "en", "epsilon zeta"),  # new
          (12, "web", "en", "epsilon  zeta")] # in-batch dup of 11
    spark.createDataFrame(b1, schema).write.parquet(src + "/b1")

    stream = read_documents_stream(spark, src + "/*")
    out = streaming_incremental_dedup(stream, corpus)
    q = (out.writeStream.format("memory").queryName("inc1")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("select doc_id from inc1").toPandas()
    assert len(got) == 1 and set(got.doc_id) <= {11, 12}

    # next micro-batch: a repeat of the stream's own earlier doc + one new
    b2 = [(13, "web", "en", "epsilon zeta"), (14, "web", "en", "eta theta")]
    spark.createDataFrame(b2, schema).write.parquet(src + "/b2")
    q2 = (out.writeStream.format("memory").queryName("inc2")
          .outputMode("append").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got2 = spark.sql("select doc_id from inc2").toPandas()
    # replay over both files: corpus dups gone, one row per novel digest
    assert len(got2) == 2

    import pytest as _pytest

    with _pytest.raises(ValueError, match="STATIC"):
        streaming_incremental_dedup(stream, stream)


def test_jsonl_roundtrip(spark, tmp_path):
    """JSONL save/load round-trips the documents table bit-exactly with
    an explicit schema (no inference scan) and gzip compression."""
    from spark_timeseries_spark.sources import (
        load_jsonl,
        load_table,
        save_jsonl,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    path = str(tmp_path / "docs_jsonl")
    save_jsonl(docs, path)
    back = load_jsonl(spark, path, schema=docs.schema)
    a = sorted((r.doc_id, r.text) for r in docs.collect())
    b = sorted((r.doc_id, r.text) for r in back.collect())
    assert a == b
    import glob
    assert glob.glob(path + "/*.gz")  # compressed parts


def test_streaming_outliers_against_snapshot(spark, tmp_path):
    """Stream-static outlier gate: arriving values score against the
    offline per-key (center, scale) snapshot; unknown keys and zero
    scale yield NULL; the spike flags."""
    import pandas as pd

    from spark_timeseries_spark.streaming import (
        read_observations_stream,
        streaming_outliers,
    )

    stats = spark.createDataFrame(
        [("a", 10.0, 2.0), ("z", 1.0, 0.0)],
        "key string, center double, scale double",
    )
    src = str(tmp_path / "obs_out")
    os.makedirs(src)
    t = pd.Timestamp("2024-01-01").to_pydatetime()
    rows = [(t, "a", 11.0), (t, "a", 30.0), (t, "z", 9.0), (t, "q", 5.0)]
    spark.createDataFrame(
        rows, "ts timestamp, key string, value double"
    ).write.parquet(src + "/b1")

    stream = read_observations_stream(spark, src + "/*")
    out = streaming_outliers(stream, stats, threshold=3.0)
    q = (out.writeStream.format("memory").queryName("so")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.key, r.value): r for r in spark.sql("select * from so").collect()}
    assert got[("a", 11.0)].is_outlier is False
    assert got[("a", 30.0)].is_outlier is True     # |30-10|/2 = 10 > 3
    assert got[("z", 9.0)].score is None           # zero scale
    assert got[("q", 5.0)].score is None           # no baseline

    import pytest as _pytest

    with _pytest.raises(ValueError, match="STATIC"):
        streaming_outliers(stream, stream)
    with _pytest.raises(ValueError, match="center"):
        streaming_outliers(stream, stats.select("key", "scale"))


def test_streaming_near_dedup_gate(spark, tmp_path):
    """foreachBatch near-dup gate: batch documents near-duplicating the
    static corpus are rejected, genuinely novel ones admitted, and
    within-batch near-pairs keep only the lowest id; the corpus shingle
    table is built once and reused across micro-batches."""
    from spark_timeseries_spark.streaming import (
        near_dedup_gate,
        read_documents_stream,
        streaming_near_dedup,
    )

    base = ("the quick brown fox jumps over the lazy dog again and again "
            "while the sly red fox watches from the tall dry grass nearby")
    novel = ("completely different subject matter entirely about maritime "
             "navigation charts and coastal lighthouse maintenance schedules")
    corpus = spark.createDataFrame(
        [(100, base)], "doc_id long, text string"
    )

    # direct gate call (batch mode): near-dup of corpus -> rejected;
    # novel kept; within-batch near-pair (2,3) keeps only 2
    batch = spark.createDataFrame(
        [
            (1, base + " tonight"),          # near-dup of corpus doc 100
            (2, novel),
            (3, novel + " today"),           # near-dup of batchmate 2
        ],
        "doc_id long, text string",
    )
    gate = near_dedup_gate(corpus, threshold=0.5)
    kept = sorted(r.doc_id for r in gate(batch).collect())
    assert kept == [2]

    # wired to a stream via foreachBatch
    src = str(tmp_path / "near_stream")
    os.makedirs(src)
    batch.write.parquet(src + "/b1")
    stream = read_documents_stream(
        spark, src + "/*", schema="doc_id long, text string"
    )
    admitted = []

    def sink(df, batch_id):
        admitted.extend(r.doc_id for r in df.collect())

    q = (
        streaming_near_dedup(stream, corpus, sink, threshold=0.5)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "near_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    assert sorted(admitted) == [2]

    # streaming input must be rejected as the corpus side
    import pytest as _pytest
    with _pytest.raises(ValueError, match="STATIC"):
        streaming_near_dedup(stream, stream, sink)


def test_streaming_cusum_detects_level_shift(spark, tmp_path):
    """Stateful streaming CUSUM: a planted level shift raises s_hi past h
    and fires alarm_hi (then resets); the pre-shift segment stays quiet;
    state carries across micro-batches (the running sum continues, not
    restarts, in batch 2); keys without a baseline emit nothing."""
    import datetime as dt

    from spark_timeseries_spark.streaming import (
        read_observations_stream,
        streaming_cusum,
    )

    src = str(tmp_path / "cusum_stream")
    os.makedirs(src)
    t0 = dt.datetime(2024, 1, 1)
    # baseline mu=0 sigma=1; shift of +2sigma from t=10
    b1 = [(t0 + dt.timedelta(minutes=i), "a", 0.0 if i < 10 else 2.0)
          for i in range(14)]
    b1 += [(t0, "nobase", 9.0)]
    schema = "ts timestamp, key string, value double"
    spark.createDataFrame(b1, schema).write.parquet(src + "/b1")

    stats = spark.createDataFrame(
        [("a", 0.0, 1.0)], "key string, center double, scale double"
    )
    stream = read_observations_stream(spark, src + "/*")
    out = streaming_cusum(stream, stats, k=0.5, h=5.0)
    # memory sink can't recover a checkpoint; a durable parquet sink is
    # required to prove state continuity across restarts
    sink_dir = str(tmp_path / "cs_out")
    ckpt = str(tmp_path / "cs_ckpt")

    def run_once():
        q = (
            out.writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)

    run_once()
    r1 = spark.read.parquet(sink_dir).toPandas().sort_values("ts")
    assert set(r1.key) == {"a"}          # nobase emits nothing
    assert len(r1) == 14
    # s_hi grows by z-k = 1.5/step after the shift; alarm at step 4 post-shift
    assert not r1.alarm_hi.iloc[:13].any()
    assert r1.alarm_hi.iloc[13] and abs(r1.s_hi.iloc[13] - 6.0) < 1e-9

    # batch 2: continuation — s_hi was reset by the alarm, climbs again
    b2 = [(t0 + dt.timedelta(minutes=14 + i), "a", 2.0) for i in range(4)]
    spark.createDataFrame(b2, schema).write.parquet(src + "/b2")
    run_once()
    r2 = spark.read.parquet(sink_dir).toPandas().sort_values("ts")
    assert len(r2) == 18                   # 14 + the new batch's 4
    assert abs(r2.s_hi.iloc[-1] - 6.0) < 1e-9 and r2.alarm_hi.iloc[-1]


def test_streaming_psi_windowed_drift(spark, tmp_path):
    """Windowed PSI against a static reference histogram: an in-
    distribution window scores ~0, a shifted window scores high, a
    too-small window reports NULL; the value matches the batch psi_bins
    fold on the same counts."""
    import numpy as np
    import pandas as pd

    from spark_timeseries_spark.streaming import (
        read_observations_stream,
        streaming_psi,
    )

    rng = np.random.RandomState(3)
    # reference: uniform over [0, 10), 5 bins -> fractions ~0.2 each
    ref = rng.uniform(0, 10, 1000)
    fr = [float(f) for f in np.bincount(
        np.clip(((ref - 0.0) // 2.0).astype(int), 0, 4), minlength=5
    ) / len(ref)]

    t0 = pd.Timestamp("2024-01-01 00:00:00")
    in_dist = [float(v) for v in rng.uniform(0, 10, 400)]
    shifted = [float(v) for v in rng.uniform(8, 14, 400)]
    rows = (
        [(t0.to_pydatetime(), "k", v) for v in in_dist]
        + [((t0 + pd.Timedelta(minutes=10)).to_pydatetime(), "k", v)
           for v in shifted]
        + [((t0 + pd.Timedelta(minutes=20)).to_pydatetime(), "k", 5.0)]
        # sentinel advances the watermark past every asserted window's
        # end so append mode flushes them (its own window never emits)
        + [((t0 + pd.Timedelta(minutes=45)).to_pydatetime(), "k", 5.0)]
    )
    src = str(tmp_path / "psi_src")
    os.makedirs(src)
    spark.createDataFrame(
        rows, "ts timestamp, key string, value double"
    ).write.parquet(src + "/b1")

    stream = read_observations_stream(spark, src + "/*")
    out = streaming_psi(
        stream, fr, lo=0.0, hi=10.0, window_duration="10 minutes",
        min_count=10,
    )
    q = (out.writeStream.format("memory").queryName("spsi")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.window_start.minute: r for r in
           spark.sql("select * from spsi").collect()}

    def psi_of(vals):
        b = np.clip(((np.array(vals) - 0.0) // 2.0).astype(int), 0, 4)
        qf = np.bincount(b, minlength=5) / len(vals)
        pe, qe = np.maximum(fr, 1e-4), np.maximum(qf, 1e-4)
        return float(np.sum((qe - pe) * np.log(qe / pe)))

    assert got[0].n == 400
    assert abs(got[0].psi - psi_of(in_dist)) < 1e-9
    assert got[0].psi < 0.1                      # stable
    assert abs(got[10].psi - psi_of(shifted)) < 1e-9
    assert got[10].psi > 0.25                    # drifted
    assert got[20].n == 1 and got[20].psi is None  # min_count gate

    import pytest as _pytest
    with _pytest.raises(ValueError, match="bins"):
        streaming_psi(stream, [1.0], 0.0, 10.0)
    with _pytest.raises(ValueError, match="hi > lo"):
        streaming_psi(stream, fr, 5.0, 5.0)


def test_streaming_asof_static_versions(spark, tmp_path):
    """SCD-2 stream-static as-of: each event matches the snapshot
    version current at ITS event time; pre-first-version events and
    unknown keys stay NULL; exact-stamp matches count."""
    import pandas as pd

    from spark_timeseries_spark.streaming import (
        read_observations_stream,
        streaming_asof_static,
    )

    t = lambda m: pd.Timestamp(f"2024-01-01 00:{m:02d}:00").to_pydatetime()
    snapshot = spark.createDataFrame(
        [("a", t(10), 1.0), ("a", t(30), 2.0), ("b", t(0), 9.0)],
        "key string, ts timestamp, quote double",
    )
    rows = [
        (t(5), "a", 100.0),   # before a's first version -> NULL
        (t(10), "a", 101.0),  # exact stamp -> v1
        (t(29), "a", 102.0),  # -> v1
        (t(30), "a", 103.0),  # -> v2
        (t(45), "a", 104.0),  # -> v2 (open interval)
        (t(5), "q", 105.0),   # unknown key -> NULL
    ]
    src = str(tmp_path / "asof_src")
    os.makedirs(src)
    spark.createDataFrame(
        rows, "ts timestamp, key string, value double"
    ).write.parquet(src + "/b1")

    stream = read_observations_stream(spark, src + "/*")
    out = streaming_asof_static(stream, snapshot)
    q = (out.writeStream.format("memory").queryName("sasof")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.key, r.value): (r.ts_snap, r.quote)
           for r in spark.sql("select * from sasof").collect()}

    assert got[("a", 100.0)] == (None, None)
    assert got[("a", 101.0)] == (t(10), 1.0)
    assert got[("a", 102.0)] == (t(10), 1.0)
    assert got[("a", 103.0)] == (t(30), 2.0)
    assert got[("a", 104.0)] == (t(30), 2.0)
    assert got[("q", 105.0)] == (None, None)
    assert len(got) == 6  # exactly one output row per event

    import pytest as _pytest
    with _pytest.raises(ValueError, match="STATIC"):
        streaming_asof_static(stream, stream)
    with _pytest.raises(ValueError, match="value_cols"):
        streaming_asof_static(stream, snapshot, value_cols=["nope"])
