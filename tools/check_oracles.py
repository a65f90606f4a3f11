"""Local replica of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB at a given sf, compare row-count, column
names, and order-insensitive values."""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from incubator_sedona_spark.session import get_spark  # noqa: E402
import __spark_entry__ as E  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, only: list[str] | None = None):
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as ex:
            failures.append((name, f"SPARK ERROR {type(ex).__name__}: {str(ex)[:200]}"))
            print(f"[FAIL-spark] {name}: {str(ex)[:200]}")
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows-only] {name}: {len(got)} rows in {time.time()-t0:.1f}s")
            continue
        try:
            exp = con.execute(sql).df()
        except Exception as ex:
            failures.append((name, f"DUCKDB ERROR: {str(ex)[:200]}"))
            print(f"[FAIL-duckdb] {name}: {str(ex)[:200]}")
            continue
        g, e = normalize(got), normalize(exp)
        status = "OK"
        if list(g.columns) != list(e.columns):
            status = f"COLS {list(g.columns)} vs {list(e.columns)}"
        elif len(g) != len(e):
            status = f"ROWS {len(g)} vs {len(e)}"
        elif list(map(str, g.dtypes)) != list(map(str, e.dtypes)):
            # the driver's hash stringifies values, so int64 1 vs float64 1.0
            # FAILS there even though the values compare equal — replicate
            # that dtype sensitivity here (round-5 VERDICT item 2: the
            # locally-green/driver-red failure class must reproduce locally)
            status = (
                f"DTYPES {dict(zip(g.columns, map(str, g.dtypes)))} vs "
                f"{dict(zip(e.columns, map(str, e.dtypes)))}"
            )
        else:
            try:
                pd.testing.assert_frame_equal(g, e, check_dtype=False, rtol=0, atol=0)
            except AssertionError as ex:
                status = "VALUES differ: " + str(ex).splitlines()[-1][:200]
        flag = "ok" if status == "OK" else "FAIL"
        print(f"[{flag}] {name}: {len(g)} rows in {time.time()-t0:.1f}s  {status if status != 'OK' else ''}")
        if status != "OK":
            failures.append((name, status))
    print(f"\n{len(failures)} failures")
    for n, s in failures:
        print(" -", n, s)
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    sys.exit(main(sf, only))
