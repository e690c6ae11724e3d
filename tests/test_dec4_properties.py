"""Property tests for the round-4 exactness claims.

1. ``dec4_sum`` (plans/registry.py) must be BIT-equal to the
   established DECIMAL(25,4)-accumulate-then-cast-double convention
   for its documented domain: ≤2dp money values (positive and
   negative) and pairwise products of ≤2dp values. Hypothesis drives
   random groups/values through both plans on the same DataFrame.

2. The recursive-CTE FFD oracle of ``llm_pack_sequences`` must
   replay operators/packing.pack_sequences exactly on ARBITRARY doc
   populations, not just the shipped testdata: random (doc_id,
   n_chars) tables round-trip through a temp parquet dir and the
   same DuckDB SQL the driver runs.
"""

import os
import shutil
import tempfile

import duckdb
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from database_importer_spark.plans import REGISTRY
from database_importer_spark.plans.registry import DEC, dec4_sum

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# 2dp values in [-9999.99, 9999.99] represented the way money columns
# are: the nearest double of a 2-decimal literal
cents = st.integers(min_value=-999999, max_value=999999)
groups = st.integers(min_value=0, max_value=3)


@given(vals=st.lists(st.tuples(groups, cents), min_size=1, max_size=40))
@SETTINGS
def test_dec4_sum_bit_equals_decimal_sum(spark, vals):
    rows = [(g, c / 100.0) for g, c in vals]
    df = spark.createDataFrame(rows, "g int, x double")
    fast = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(dec4_sum(F.col("x")).alias("s")).collect()
    }
    ref = {
        r["g"]: r["s"]
        for r in df.groupBy("g")
        .agg(F.sum(F.col("x").cast(DEC)).cast("double").alias("s"))
        .collect()
    }
    assert fast == ref  # bit-equal doubles, not approx


@given(
    vals=st.lists(
        st.tuples(groups, st.integers(0, 999999), st.integers(0, 100)),
        min_size=1,
        max_size=40,
    )
)
@SETTINGS
def test_dec4_sum_bit_equals_decimal_sum_on_products(spark, vals):
    """price(2dp) × (1 - disc(2dp)) — the 4dp revenue product every
    TPC-H sum uses."""
    rows = [(g, p / 100.0, d / 100.0) for g, p, d in vals]
    df = spark.createDataFrame(rows, "g int, p double, d double")
    expr = F.col("p") * (1 - F.col("d"))
    fast = {
        r["g"]: r["s"]
        for r in df.groupBy("g").agg(dec4_sum(expr).alias("s")).collect()
    }
    ref = {
        r["g"]: r["s"]
        for r in df.groupBy("g")
        .agg(F.sum(expr.cast(DEC)).cast("double").alias("s"))
        .collect()
    }
    assert fast == ref


@given(
    docs=st.lists(
        st.integers(min_value=0, max_value=12000),  # n_chars (0..3000 tokens)
        min_size=1,
        max_size=60,
    )
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_ffd_oracle_replays_packer_on_random_docs(spark, docs):
    q = REGISTRY["llm_pack_sequences"]
    tmp = tempfile.mkdtemp(prefix="dbis_ffd_prop_")
    try:
        df = spark.createDataFrame(
            [(i + 1, n) for i, n in enumerate(docs)], "doc_id long, n_chars long"
        )
        df.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(tmp, "documents.parquet")
        )
        got = sorted(map(tuple, q.fn(spark, tmp).collect()))
        con = duckdb.connect()
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{tmp}/documents.parquet/*.parquet')"
        )
        want = sorted(map(tuple, con.execute(q.oracle).fetchall()))
        assert got == want
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


@given(vals=st.lists(st.tuples(groups, cents), min_size=1, max_size=40))
@SETTINGS
def test_dec4_window_double_division_bit_equal(spark, vals):
    """r7: the ``div="double"`` output conversion must be BIT-equal to
    the decimal(25,0)/10000 → DECIMAL(25,4) → double chain for every
    window prefix sum within the documented |S| < 2^53 bound (random
    2dp money values, random partitions, running ROWS frame)."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(g, i, c / 100.0) for i, (g, c) in enumerate(vals)],
        "g int, seq int, x double",
    )
    w = (
        Window.partitionBy("g")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fast = df.select("g", "seq", dec4_sum(F.col("x"), window=w, div="double").alias("s"))
    ref = df.select("g", "seq", dec4_sum(F.col("x"), window=w).alias("s"))
    got = sorted(map(tuple, fast.collect()))
    want = sorted(map(tuple, ref.collect()))
    import struct

    assert [struct.pack(">d", s) for *_k, s in got] == [
        struct.pack(">d", s) for *_k, s in want
    ], (got, want)
