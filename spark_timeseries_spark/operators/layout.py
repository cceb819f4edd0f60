"""Layout conversions: observations ⇄ conformed grid ⇄ instants ⇄ series.

The reference's conversion triangle (``src/site/markdown/docs/users.md:23-87``)
with these equivalents:

- ``to_observations`` — ``TimeSeriesRDD.toObservationsDataFrame``
  (``TimeSeriesRDD.scala:419-443``): long table, missing cells dropped.
- ``to_instants`` / ``to_instants_df`` — ``TimeSeriesRDD.toInstants(DataFrame)``
  (``TimeSeriesRDD.scala:276-413``): the reference hand-rolls a chunked
  transpose (≤20 series per map-side record, custom range partitioner +
  ``repartitionAndSortWithinPartitions``); ours is a single
  ``groupBy(ts).pivot(key)`` — one Catalyst-planned shuffle, same boundary.
  The reference collects all keys on the driver (``TimeSeriesRDD.scala:56``,
  a flagged anti-pattern); we pass explicit keys or compute them
  distributively, and offer a **map-column variant** for very wide key spaces
  where a 1M-column pivot schema would be nonsense.
- ``to_series`` / ``from_series`` — the (key, ARRAY<double>) layout of
  ``TimeSeriesRDD`` itself (``TimeSeriesRDD.scala:41-54``), used at pandas-UDF
  boundaries and for save/load parity.
- ``series_stats`` — ``TimeSeriesRDD.seriesStats`` (``:265-267``).
- ``to_row_matrix``-style exports are served by ``to_instants_df`` +
  ``pyspark.ml`` assemblers; we keep the instants DataFrame as the canonical
  matrix form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..index import DateTimeIndex


def to_observations(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Conformed grid → long observations table, dropping missing cells
    (``TimeSeriesRDD.scala:425-434`` skips NaNs)."""
    return df.where(F.col(value_col).isNotNull()).select(ts_col, key_col, value_col)


def to_instants_df(
    df: DataFrame,
    keys: list[str] | None = None,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
    max_pivot_keys: int | None = None,
) -> DataFrame:
    """Wide instants layout: one row per timestamp, one double column per key
    (``TimeSeriesRDD.scala:399-413``). Passing ``keys`` avoids the extra
    distinct-values job Spark otherwise runs before pivoting.

    Width guard: a pivot materializes one SCHEMA COLUMN per key — at
    corpus scale that is a driver-side distinct-keys job plus a schema no
    engine enjoys (the reference bounds its transpose width at 20 for the
    same reason, ``TimeSeriesRDD.scala:280``). Set ``max_pivot_keys`` to
    fall back to the :func:`to_instants_map` layout — ``(ts, MAP<key,
    double>)``, width-independent — whenever the key count (of ``keys``
    when given, else one cheap countDistinct) exceeds the bound. Spark's
    own ``spark.sql.pivotMaxValues`` (default 10k) still errors the
    unguarded path rather than silently planning a 10k-column schema."""
    if max_pivot_keys is not None:
        bound = int(max_pivot_keys)
        if keys is None:
            # one bounded job serves both the guard AND the pivot: collect
            # at most bound+1 distinct keys — if we stay under the bound,
            # pass them to pivot() so Spark skips its own distinct-values
            # pass (otherwise the guard + unguarded pivot double-scan)
            got = [
                r[0]
                for r in df.select(key_col)
                .distinct()
                .limit(bound + 1)
                .collect()
            ]
            if len(got) > bound:
                return to_instants_map(df, key_col, ts_col, value_col)
            keys = sorted(got)
        elif len(keys) > bound:
            # honor the caller's key selection in the fallback — the map
            # layout would otherwise silently contain EVERY key in df
            return to_instants_map(
                df.where(F.col(key_col).isin(list(keys))),
                key_col,
                ts_col,
                value_col,
            )
    g = df.groupBy(ts_col)
    p = g.pivot(key_col, keys) if keys else g.pivot(key_col)
    return p.agg(F.first(value_col)).orderBy(ts_col)


def to_instants_map(
    df: DataFrame,
    key_col: str = "key",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Wide-key-space instants variant: ``(ts, MAP<key,double>)`` — scales to
    millions of series where a pivot schema cannot (cf. the reference's
    chunked transpose bounding width at 20, ``TimeSeriesRDD.scala:280``)."""
    return df.where(F.col(value_col).isNotNull()).groupBy(ts_col).agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct(key_col, value_col)))
        ).alias("instant")
    )


def to_series(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Conformed grid → ``(key, series ARRAY<double>)`` ordered by location;
    missing cells become NaN inside the array (the reference's in-vector
    convention, ``TimeSeriesRDD.scala:41-54``)."""
    return df.groupBy(key_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(loc_col, value_col))),
            lambda s: F.coalesce(s[value_col], F.lit(float("nan"))),
        ).alias("series")
    )


def from_series(
    df: DataFrame,
    index: DateTimeIndex,
    key_col: str = "key",
    series_col: str = "series",
) -> DataFrame:
    """(key, ARRAY<double>) + index → conformed grid (inverse of
    ``to_series``; cf. ``timeSeriesRDD(targetIndex, seriesRDD)``
    ``TimeSeriesRDD.scala:657-666``). NaNs become NULL."""
    exploded = df.select(
        key_col, F.posexplode(series_col).alias("loc", "value")
    ).withColumn(
        "value", F.when(~F.isnan("value"), F.col("value"))
    )
    idx = index.to_df(df.sparkSession)
    return exploded.join(F.broadcast(idx), "loc").select(key_col, "loc", "ts", "value")


def series_stats(
    df: DataFrame, key_col: str = "key", value_col: str = "value"
) -> DataFrame:
    """Per-series StatCounter equivalent (``TimeSeriesRDD.scala:265-267``)."""
    v = F.col(value_col)
    return df.groupBy(key_col).agg(
        F.count(v).alias("count"),
        F.avg(v).alias("mean"),
        F.stddev(v).alias("stdev"),
        F.min(v).alias("min"),
        F.max(v).alias("max"),
    )


def _instant_vectors(
    df: DataFrame, key_col: str, loc_col: str, value_col: str
) -> DataFrame:
    """(loc, vals ARRAY<double>) — one dense row per instant, columns in
    sorted-key order, NULL cells as NaN. Requires the conformed grid (one row
    per key×loc) so every vector has the full width."""
    return df.groupBy(loc_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(key_col, value_col))),
            lambda s: F.coalesce(s[value_col], F.lit(float("nan"))),
        ).alias("vals")
    )


def to_indexed_row_matrix(
    df: DataFrame,
    index=None,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
):
    """Conformed grid → MLlib ``IndexedRowMatrix``
    (``TimeSeriesRDD.scala:456-476``): row index = the instant's location on
    the (uniform) index — the reference computes it as
    ``frequency.difference(start, ts)``, which is exactly our ``loc`` —
    columns = series in sorted-key order. The bridge to MLlib's distributed
    matrix statistics (PCA, SVD, column similarities).

    Scale envelope: the returned object is an MLlib type, and PySpark's
    MLlib bridge requires a Python RDD of ``Vector`` rows — acceptable
    here ONLY because the instants grid is bounded (index length × a
    width-guarded series count), unlike the corpus-sized embedding path
    (see ``pipeline/embeddings._moment_partials`` for the Arrow-batched
    pattern used when the input is unbounded)."""
    from pyspark.mllib.linalg.distributed import IndexedRow, IndexedRowMatrix

    from ..index import UniformDateTimeIndex

    if index is not None and not isinstance(index, UniformDateTimeIndex):
        raise ValueError("only supported for uniform indices")
    rows = _instant_vectors(df, key_col, loc_col, value_col)
    return IndexedRowMatrix(
        rows.rdd.map(lambda r: IndexedRow(r[0], r[1]))
    )


def to_row_matrix(
    df: DataFrame,
    key_col: str = "key",
    loc_col: str = "loc",
    value_col: str = "value",
):
    """Conformed grid → MLlib ``RowMatrix`` (``TimeSeriesRDD.scala:478-486``);
    row order is not significant in a RowMatrix, so any index type works."""
    from pyspark.mllib.linalg.distributed import RowMatrix

    rows = _instant_vectors(df, key_col, loc_col, value_col)
    return RowMatrix(rows.rdd.map(lambda r: r[1]))


def downsample_minmax(
    df: DataFrame,
    buckets: int,
    key_col: str = "key",
    order_col: str = "loc",
    value_col: str = "value",
) -> DataFrame:
    """Extrema-preserving downsample for plotting/preview: split each
    series' non-null run into ``buckets`` near-equal buckets (the same
    ``floor(i·b/n)`` carve as PAA) and keep each bucket's minimum and
    maximum observation → (key, bucket, loc, value), ≤ 2·buckets rows
    per series with every visual spike retained (the property a plain
    every-k-th-row sample destroys). Ties break to the EARLIEST
    location on both sides (deterministic); a bucket whose min and max
    are the same row emits it once.

    Plan: one rank window to form buckets + two row_numbers over the
    (key, bucket) partition (two sort orders inside one exchange) —
    no self-join, no Python, output is bounded by 2·K·buckets."""
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    v = F.col(value_col)
    wk = Window.partitionBy(key_col)
    ws = Window.partitionBy(key_col).orderBy(order_col)
    b = (
        df.where(v.isNotNull())
        .withColumn("_rk", F.row_number().over(ws) - 1)
        .withColumn("_n", F.count(v).over(wk))
        .withColumn(
            "bucket", F.floor(F.col("_rk") * buckets / F.col("_n"))
        )
    )
    w_min = Window.partitionBy(key_col, "bucket").orderBy(
        v.asc(), F.col(order_col).asc()
    )
    w_max = Window.partitionBy(key_col, "bucket").orderBy(
        v.desc(), F.col(order_col).asc()
    )
    return (
        b.withColumn("_rmin", F.row_number().over(w_min))
        .withColumn("_rmax", F.row_number().over(w_max))
        .where((F.col("_rmin") == 1) | (F.col("_rmax") == 1))
        .select(key_col, "bucket", order_col, value_col)
    )
