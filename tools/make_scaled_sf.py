"""Generate a scaled-up bench dataset: replicate the fact tables of a
source sf dir xN with key-shifting (join consistency preserved), copy
the dimensions as-is. Produces a data-BOUND bench scale where Spark's
per-query orchestration floor stops dominating (BASELINE.md protocol).

Usage: python tools/make_scaled_sf.py SRC_DIR OUT_DIR FACTOR

Key shifts:
  * orders/lineitem share one orderkey offset (replica r shifts both
    by r*KO), so every join/merge query sees a consistent xN world;
    o_custkey / l_partkey / l_suppkey stay in the dim ranges.
  * events shift event_id (user_id/ts untouched: xN density per
    window — the streaming-heavy case).
  * documents/embeddings shift doc_id/vec_id; text/vectors repeat
    verbatim (exact-dup density scales with N — dedup's hard case).

Types are preserved by CASTing shifted keys back to the source
parquet types (events stays TIMESTAMP_NS etc.).
"""

from __future__ import annotations

import os
import sys

import duckdb

DIMS = ["region", "nation", "customer", "supplier", "part"]


def scale(src: str, out: str, factor: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{out}/{t}.parquet'"
        )

    ko = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""COPY (
            SELECT CAST(o_orderkey + r.rep * {ko} AS BIGINT) AS o_orderkey,
                   o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                   o_orderpriority
            FROM '{src}/orders.parquet', range({factor}) r(rep)
        ) TO '{out}/orders.parquet'"""
    )
    con.execute(
        f"""COPY (
            SELECT CAST(l_orderkey + r.rep * {ko} AS BIGINT) AS l_orderkey,
                   l_partkey, l_suppkey, l_linenumber, l_quantity,
                   l_extendedprice, l_discount, l_tax, l_returnflag,
                   l_linestatus, l_shipdate
            FROM '{src}/lineitem.parquet', range({factor}) r(rep)
        ) TO '{out}/lineitem.parquet'"""
    )

    ke = con.execute(
        f"SELECT MAX(event_id) + 1 FROM '{src}/events.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""COPY (
            SELECT CAST(event_id + r.rep * {ke} AS BIGINT) AS event_id,
                   ts, user_id, event_type, value, props
            FROM '{src}/events.parquet', range({factor}) r(rep)
        ) TO '{out}/events.parquet'"""
    )

    kd = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM '{src}/documents.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""COPY (
            SELECT CAST(doc_id + r.rep * {kd} AS BIGINT) AS doc_id,
                   text, lang, source, n_chars
            FROM '{src}/documents.parquet', range({factor}) r(rep)
        ) TO '{out}/documents.parquet'"""
    )

    kv = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM '{src}/embeddings.parquet'"
    ).fetchone()[0]
    con.execute(
        f"""COPY (
            SELECT CAST(vec_id + r.rep * {kv} AS BIGINT) AS vec_id,
                   embedding, label
            FROM '{src}/embeddings.parquet', range({factor}) r(rep)
        ) TO '{out}/embeddings.parquet'"""
    )


if __name__ == "__main__":
    src, out, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    scale(src, out, factor)
    print(f"scaled {src} x{factor} -> {out}")
