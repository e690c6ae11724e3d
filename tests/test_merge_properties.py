"""Property-based merge invariants (SURVEY.md §5.2 item 5) —
hypothesis-generated key/null/duplicate patterns into the Merger:

  * update never changes cardinality;
  * update+insert cardinality = |target| + |unmatched source keys|;
  * NULL-key source rows never touch the target;
  * a key is never multiplied;
  * non-subset columns are bit-for-bit unchanged.
"""

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from database_importer_spark.operators.merge import Merger, MergerError

KEYS = st.integers(min_value=0, max_value=20)
VALS = st.one_of(st.none(), st.integers(min_value=-100, max_value=100))

target_rows = st.lists(
    st.tuples(KEYS, VALS, VALS), min_size=1, max_size=15, unique_by=lambda r: r[0]
)
source_rows = st.lists(
    st.tuples(st.one_of(st.none(), KEYS), VALS),
    min_size=1,
    max_size=15,
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(tgt=target_rows, src=source_rows)
@SETTINGS
def test_merge_invariants(spark, tgt, src):
    target = spark.createDataFrame(tgt, "k int, a int, b int")
    source = spark.createDataFrame(src, "k int, a int")

    # dedupe source keys (duplicates are a *validated error*, asserted
    # separately below) — keep first occurrence
    seen, src_unique = set(), []
    for k, a in src:
        if k not in seen:
            seen.add(k)
            src_unique.append((k, a))
    source_u = spark.createDataFrame(src_unique, "k int, a int")

    m = Merger(target, source_u, join_on=["k"], subset=["a"])

    updated = m.merged(update=True)
    assert updated.count() == len(tgt)

    tgt_keys = {r[0] for r in tgt}
    src_keys = {k for k, _ in src_unique if k is not None}
    unmatched = src_keys - tgt_keys

    both = m.merged(update=True, insert=True)
    assert both.count() == len(tgt) + len(unmatched)

    # no key ever multiplied
    assert (
        both.groupBy("k").count().filter(F.col("count") > 1).count() == 0
    )

    # NULL-key and unmatched-key target rows unchanged; matched rows
    # take source 'a' (even when NULL); 'b' never changes
    expect_a = {k: a for k, a in src_unique if k is not None}
    tgt_map = {r[0]: r for r in tgt}
    for row in updated.collect():
        orig = tgt_map[row["k"]]
        assert row["b"] == orig[2]
        if row["k"] in expect_a:
            assert row["a"] == expect_a[row["k"]]
        else:
            assert row["a"] == orig[1]

    # duplicate source keys are rejected, never silently merged
    dup_keys = [k for k, _ in src if k is not None]
    if len(dup_keys) != len(set(dup_keys)):
        m_dup = Merger(target, source, join_on=["k"], subset=["a"])
        with pytest.raises(MergerError, match="duplicate values"):
            m_dup.merged(update=True)


# --- distributed rank invariants -----------------------------------

rank_rows = st.lists(
    st.tuples(
        st.integers(min_value=-1000, max_value=1000),
        st.integers(min_value=0, max_value=10_000),
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[1],
)


@given(rows=rank_rows, desc=st.booleans())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_distributed_rank_equals_single_window(spark, rows, desc):
    """The two-phase bucketized rank must agree EXACTLY with the
    textbook single-partition window row_number on arbitrary data —
    including duplicate keys (tiebreak column makes the order total)
    and tiny inputs where some buckets are empty."""
    from pyspark.sql.window import Window

    from database_importer_spark.operators.ranking import with_global_row_number

    df = spark.createDataFrame(rows, "v int, tb int").repartition(7)
    order = [("v", desc), ("tb", False)]
    got = {
        (r["v"], r["tb"]): r["rank"]
        for r in with_global_row_number(df, order, num_buckets=5).collect()
    }
    cols = [F.col("v").desc() if desc else F.col("v").asc(), F.col("tb").asc()]
    w = Window.orderBy(*cols)
    want = {
        (r["v"], r["tb"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == want
