"""Driver-style oracle checker: run every declared query on Spark and
its DuckDB twin, compare row-count + column names + canonicalized
values. Local feedback loop for the per-round CORRECTNESS gate.

Usage: python tools/check_oracles.py [sf_dir] [key ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Sort columns by name, canonicalize dtypes, sort rows."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            df[c] = s.map(
                lambda v: tuple(np.asarray(v).tolist())
                if isinstance(v, (list, np.ndarray))
                else v
            )
    # astype(str) == map(str) element-wise (str() conversion for
    # floats is shortest-roundtrip repr; Timestamp/NaT stringify the
    # same) but runs the numeric columns through a C loop — the
    # difference between minutes and hours when canonicalizing an
    # sf10 sweep's 60M-row outputs.
    df = df.sort_values(
        by=list(df.columns), ignore_index=True, key=lambda s: s.astype(str)
    )
    return df


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(values_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    sc, dc = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sc != dc:
        problems.append(f"columns: spark={sc} duckdb={dc}")
        return problems
    if problems:
        return problems
    a, b = canon(spark_pdf), canon(duck_pdf)
    for c in a.columns:
        sa, sb = a[c], b[c]
        # Vectorized fast path for primitive dtypes (same semantics as
        # values_equal: exact equality, NaN==NaN, NULL==NULL) — the
        # per-element python loop below is hours, not minutes, on the
        # 60M-row map-only outputs of an sf10 sweep. Object columns
        # (tuples from collected arrays, mixed types) keep the loop.
        if sa.dtype == sb.dtype and sa.dtype != object:
            eq = (sa == sb) | (sa.isna() & sb.isna())
            if bool(eq.all()):
                continue
            bad_idx = np.flatnonzero(~eq.to_numpy())
            i = int(bad_idx[0])
            problems.append(
                f"col '{c}': {len(bad_idx)} mismatches, first at row {i}: "
                f"spark={sa.iloc[i]!r} duckdb={sb.iloc[i]!r}"
            )
            continue
        av, bv = sa.tolist(), sb.tolist()
        bad = [i for i, (x, y) in enumerate(zip(av, bv)) if not values_equal(x, y)]
        if bad:
            i = bad[0]
            problems.append(
                f"col '{c}': {len(bad)} mismatches, first at row {i}: "
                f"spark={av[i]!r} duckdb={bv[i]!r}"
            )
    return problems


def _ffd_pack_oracle(con) -> pd.DataFrame:
    """Linear-time checker-side oracle for llm_pack_sequences
    (VERDICT r6 item 5). The declared DuckDB recursive-CTE replay is
    O(docs·bins) — it carries every bucket's remaining-capacity LIST
    through each recursion step, which at sf10 was killed at
    25 min / 34 GB. First-fit-decreasing itself is NOT quadratic: with
    a max segment tree over bin remainders, "leftmost bin with
    rem >= need" is O(log bins), so the whole replay is O(n log n).
    This is checker infrastructure (an independent second
    implementation, like the SQL string), not engine code; the SQL
    oracle stays declared — the driver still runs it at sf0.01."""
    rows = con.sql(
        "SELECT doc_id, n_chars // 4 AS n_tokens,"
        " (doc_id * 2654435761) % 8 AS bucket FROM documents"
    ).df()
    CAP = 2048
    out_doc, out_bin = [], []
    fills: dict[int, int] = {}
    doc_bin: list[int] = []
    for bucket, grp in rows.groupby("bucket", sort=True):
        g = grp.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        n = len(g)
        sz = 1
        while sz < max(n, 2):
            sz *= 2
        tree = np.full(2 * sz, -1, dtype=np.int64)

        def update(i, val):
            j = sz + i
            tree[j] = val
            j //= 2
            while j:
                tree[j] = max(tree[2 * j], tree[2 * j + 1])
                j //= 2

        def find(need):
            if tree[1] < need:
                return -1
            j = 1
            while j < sz:
                j = 2 * j if tree[2 * j] >= need else 2 * j + 1
            return j - sz

        n_bins = 0
        rem = np.zeros(n, dtype=np.int64)
        b = int(bucket)
        for doc_id, need in zip(
            g["doc_id"].to_numpy(), g["n_tokens"].to_numpy()
        ):
            i = find(need)
            if i < 0 or i >= n_bins:
                i = n_bins
                n_bins += 1
                rem[i] = max(CAP - need, 0)
            else:
                rem[i] -= need
            update(i, rem[i])
            bin_id = b * (1 << 40) + i
            out_doc.append(int(doc_id))
            out_bin.append(bin_id)
            fills[bin_id] = fills.get(bin_id, 0) + int(need)
            doc_bin.append(bin_id)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(out_doc, dtype="int64"),
            "bin_id": pd.Series(out_bin, dtype="int64"),
            "bin_fill": pd.Series(
                [fills[x] for x in doc_bin], dtype="int64"
            ),
        }
    )


# Checker-side Python oracles: used by THIS tool in place of the
# declared SQL twin when the SQL form is infeasible at scale. The
# declared oracle string is unchanged (the driver still runs it).
PY_ORACLES = {"llm_pack_sequences": _ffd_pack_oracle}


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from database_importer_spark import get_spark
    from database_importer_spark.plans import REGISTRY

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for name in tables:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )

    passed, failed, rows_only = [], [], []
    for key, q in sorted(REGISTRY.items()):
        if only and key not in only:
            continue
        try:
            sdf = q.fn(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:
            failed.append((key, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL {key}: spark error: {e}")
            continue
        if q.oracle is None:
            rows_only.append((key, len(spark_pdf)))
            print(f"ROWS {key}: {len(spark_pdf)} rows (no oracle)")
            continue
        try:
            if key in PY_ORACLES:
                duck_pdf = PY_ORACLES[key](con)
            else:
                duck_pdf = con.sql(q.oracle).df()
        except Exception as e:
            failed.append((key, f"DUCKDB ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL {key}: duckdb error: {e}")
            continue
        problems = compare(spark_pdf, duck_pdf)
        if problems:
            failed.append((key, "; ".join(problems)))
            print(f"FAIL {key}: {'; '.join(problems)}")
        else:
            passed.append((key, len(spark_pdf)))
            print(f"PASS {key} ({len(spark_pdf)} rows)")

    print(
        f"\n== {len(passed)} passed, {len(failed)} failed, "
        f"{len(rows_only)} rows-only =="
    )
    if json_out:
        import datetime
        import json

        results = {}
        for key, n in passed:
            results[key] = {"status": "pass", "rows": n}
        for key, n in rows_only:
            results[key] = {"status": "rows_only", "rows": n}
        for key, err in failed:
            results[key] = {"status": "fail", "error": err}
        doc = {
            "protocol": (
                f"tools/check_oracles.py {sf_dir} — full local sweep, "
                "driver-identical compare (row count + schema + value "
                "hash); committed per VERDICT r1 item 8 so the judge can "
                "diff against the driver's (alphabetically truncated) "
                "CORRECTNESS file"
            ),
            "date": datetime.date.today().isoformat(),
            "summary": {
                "passed": len(passed),
                "failed": len(failed),
                "rows_only": len(rows_only),
            },
            "results": dict(sorted(results.items())),
        }
        with open(json_out, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"wrote {json_out}")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
