"""Measure the REFERENCE's own data plane on this repo's flagship
upsert workload — the mandate's actual baseline ("matches-or-beats its
single-node throughput"), which BASELINE.md's DuckDB numbers only
proxy.

The twin replays qpenko/database-importer's pipeline faithfully,
swapping pyodbc+MSSQL for stdlib sqlite3 (same shape, zero network
cost — this *flatters* the reference):

  1. pandas source frame in memory       (window.py:296 pd.read_excel)
  2. CREATE staging + executemany INSERT (importer.py:253-299,
     5,000-row batches, importer.py:14; fast_executemany's sqlite twin)
  3. one set-based UPDATE ... FROM join  (importer.py:321-356)
  4. INSERT via anti-join on staging     (the reference's declared-but-
     NotImplemented insert half, importer.py:361-362, completed the
     way its update half implies)
  5. DROP staging

Timed region = steps 2-5 (the reference's per-import work; the target
table already lives on the server). Source-frame prep and target load
are setup. min-of-N like tools/bench_baseline.py.

Workload = the same updates+inserts source as plans/part_a.py
`upsert_merge_full` (orders %% 10 == 0 updated, max-key-offset rows
inserted), so the wall-clock is directly comparable to the Spark
`upsert_merge_full` row in BASELINE.md at the same sf_dir.

Usage: python tools/bench_reference_twin.py [sf_dir] [runs]
"""

from __future__ import annotations

import sqlite3
import sys
import time

import duckdb

BATCH = 5_000  # importer.py:14 — the reference's staging batch size

ORDERS_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def load_frames(sf_dir: str):
    con = duckdb.connect()
    target = con.execute(
        f"SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, "
        f"CAST(o_orderdate AS VARCHAR) AS o_orderdate, o_orderpriority "
        f"FROM '{sf_dir}/orders.parquet'"
    ).fetch_df()
    # same source as plans/part_a.py _updates_df + _insert_source_df
    src = con.execute(
        f"""
        WITH orders AS (SELECT * FROM '{sf_dir}/orders.parquet'),
        mx AS (SELECT MAX(o_orderkey) + 1 AS base FROM orders)
        SELECT o_orderkey, o_totalprice + 10.0 AS o_totalprice,
               'U' AS o_orderstatus
        FROM orders WHERE o_orderkey % 10 = 0
        UNION ALL
        SELECT mx.base + c_custkey AS o_orderkey,
               c_acctbal AS o_totalprice, 'N' AS o_orderstatus
        FROM '{sf_dir}/customer.parquet', mx
        """
    ).fetch_df()
    return target, src


def run_once(target_rows, src_rows) -> float:
    db = sqlite3.connect(":memory:")
    db.execute(
        "CREATE TABLE orders (o_orderkey INTEGER PRIMARY KEY, o_custkey "
        "INTEGER, o_orderstatus TEXT, o_totalprice REAL, o_orderdate "
        "TEXT, o_orderpriority TEXT)"
    )
    db.executemany(
        "INSERT INTO orders VALUES (?,?,?,?,?,?)", target_rows
    )  # setup: the server-side table pre-exists
    db.commit()

    t0 = time.perf_counter()
    db.execute(
        "CREATE TABLE _stg (o_orderkey INTEGER, o_totalprice REAL, "
        "o_orderstatus TEXT)"
    )
    for i in range(0, len(src_rows), BATCH):
        db.executemany(
            "INSERT INTO _stg VALUES (?,?,?)", src_rows[i : i + BATCH]
        )
    db.execute(
        "UPDATE orders SET o_totalprice = _stg.o_totalprice, "
        "o_orderstatus = _stg.o_orderstatus FROM _stg "
        "WHERE orders.o_orderkey = _stg.o_orderkey"
    )
    db.execute(
        "INSERT INTO orders (o_orderkey, o_totalprice, o_orderstatus) "
        "SELECT s.o_orderkey, s.o_totalprice, s.o_orderstatus FROM _stg s "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o "
        "WHERE o.o_orderkey = s.o_orderkey)"
    )
    db.execute("DROP TABLE _stg")
    db.commit()
    wall = time.perf_counter() - t0

    n = db.execute("SELECT COUNT(*) FROM orders").fetchone()[0]
    db.close()
    return wall, n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    target, src = load_frames(sf_dir)
    # the reference moves rows through Python tuples (pandas →
    # cursor.executemany); itertuples is its fast path
    target_rows = list(target.itertuples(index=False, name=None))
    src_rows = list(src.itertuples(index=False, name=None))
    print(
        f"target={len(target_rows)} src={len(src_rows)} "
        f"(xlsx ceiling 1,048,576: "
        f"{'EXCEEDED — reference cannot ingest this' if len(src_rows) > 1_048_576 else 'ok'})"
    )
    times = []
    for _ in range(runs):
        wall, n = run_once(target_rows, src_rows)
        times.append(wall)
    print(f"rows_out={n} runs={[round(x, 3) for x in times]}")
    print(f"reference_twin_ms={min(times) * 1000:.0f}")


if __name__ == "__main__":
    main()
