"""Local replica of the driver's DuckDB-oracle correctness harness.

Runs every ``queries()`` entry at a given sf dir through Spark AND its
``oracle_sql()`` through DuckDB, then compares row count, sorted-by-name
column sets, and values (rows sorted by all columns; floats compared with
tight tolerance). Usage::

    python -m tools.check_correctness [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pd.to_datetime(pdf[c]).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].astype(float)
        elif pd.api.types.is_integer_dtype(pdf[c]):
            pdf[c] = pdf[c].astype("Int64")
        elif pdf[c].dtype == object:
            # array columns (lists / ndarrays) are unhashable and break the
            # lexsort — canonicalize to tuples so they sort & compare
            pdf[c] = pdf[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    return pdf.sort_values(list(pdf.columns), na_position="first").reset_index(
        drop=True
    )


def compare(name: str, got: pd.DataFrame, want: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(want):
        problems.append(f"rowcount spark={len(got)} duckdb={len(want)}")
    g, w = _normalize(got), _normalize(want)
    if list(g.columns) != list(w.columns):
        problems.append(f"columns spark={list(g.columns)} duckdb={list(w.columns)}")
        return problems
    # Strict-dtype gate: the driver hashes value REPRESENTATIONS, so an
    # integer column on one side vs a float column on the other (the DuckDB
    # HUGEINT->float64 class: SUM(BIGINT) comes back 3.0 against Spark's 3)
    # hash-mismatches even when every value is bit-identical. The tolerant
    # float compare below would mask it — fail it here instead.
    for c in g.columns:
        gi = pd.api.types.is_integer_dtype(g[c])
        wi = pd.api.types.is_integer_dtype(w[c])
        gf = pd.api.types.is_float_dtype(g[c])
        wf = pd.api.types.is_float_dtype(w[c])
        if (gi and wf) or (gf and wi):
            problems.append(
                f"col {c}: dtype class mismatch spark={g[c].dtype} "
                f"duckdb={w[c].dtype} (int-vs-float hashes differently on "
                f"the driver even when values are equal)"
            )
    if len(g) != len(w):
        return problems
    for c in g.columns:
        gv, wv = g[c], w[c]
        if pd.api.types.is_float_dtype(gv) or pd.api.types.is_float_dtype(wv):
            a = gv.astype(float).to_numpy()
            b = wv.astype(float).to_numpy()
            ok = (np.isnan(a) & np.isnan(b)) | np.isclose(
                a, b, rtol=1e-9, atol=1e-9, equal_nan=True
            )
            if not ok.all():
                i = int(np.argmin(ok))
                problems.append(
                    f"col {c}: {int((~ok).sum())} mismatches, first at row {i}: "
                    f"spark={a[i]} duckdb={b[i]}"
                )
        else:
            eq = (gv == wv) | (gv.isna() & wv.isna())
            if not eq.all():
                i = int(np.argmin(eq.to_numpy()))
                problems.append(
                    f"col {c}: {int((~eq).sum())} mismatches, first at row {i}: "
                    f"spark={gv.iloc[i]!r} duckdb={wv.iloc[i]!r}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failed.append(name)
            continue
        if name not in oracles:
            print(f"weak  {name}: rows-only ({len(got)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failed.append(name)
            continue
        problems = compare(name, got, want)
        if problems:
            print(f"FAIL  {name} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            failed.append(name)
        else:
            print(f"ok    {name} ({len(got)} rows) [{time.time()-t0:.1f}s]")

    print()
    if failed:
        print(f"{len(failed)} FAILED: {failed}")
        sys.exit(1)
    print(f"all {len([q for q in qs if not only or q in only])} queries match")
    spark.stop()


if __name__ == "__main__":
    main()
