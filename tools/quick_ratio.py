"""Quick spark-vs-duckdb ratio probe for a few declared queries.

Usage: PYTHONPATH=/root/repo python tools/quick_ratio.py <sf_dir> key [key...]
Same min-of-5 + DuckDB-CTAS protocol as tools/bench_baseline.py
(CTAS, not fetchall: a fetch would bill DuckDB for Python-object
conversion on large outputs while Spark's noop sink pays none).
"""

import sys
import time

import duckdb

from database_importer_spark.plans import REGISTRY
from database_importer_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def mat(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    sf_dir = sys.argv[1]
    keys = sys.argv[2:]
    spark = get_spark("quick_ratio")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{tbl}.parquet')"
        )

    for key in keys:
        q = REGISTRY[key]
        mat(q.fn(spark, sf_dir))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            mat(q.fn(spark, sf_dir))
            ts.append(time.perf_counter() - t0)
        s = min(ts)
        if q.oracle:
            ds = []
            for _ in range(5):
                con.execute("DROP TABLE IF EXISTS __qr_out")
                t0 = time.perf_counter()
                con.execute(f"CREATE TEMP TABLE __qr_out AS ({q.oracle})")
                ds.append(time.perf_counter() - t0)
            con.execute("DROP TABLE IF EXISTS __qr_out")
            d = min(ds)
            print(f"{key:30s} spark {s:7.3f}s  duckdb {d:7.3f}s  ratio {s / d:6.2f}x")
        else:
            print(f"{key:30s} spark {s:7.3f}s  (rows-only, no oracle)")


if __name__ == "__main__":
    main()
