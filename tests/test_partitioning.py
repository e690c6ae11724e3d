"""Scale-strategy tests: salted join correctness on skewed data,
bucketed join shuffle elimination.
"""

import pytest
from pyspark.sql import functions as F

from database_importer_spark.operators.partitioning import (
    bucketed_join,
    salted_join,
    write_bucketed,
)


def test_salted_join_equals_plain_join(spark):
    # heavily skewed: 90% of big rows share key 0
    big = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(0, "hot"), (10, "a"), (20, "b"), (999999, "miss")], "k long, label string"
    )
    plain = big.join(small, "k", "inner")
    salted = salted_join(big, small, ["k"], "inner", salt_buckets=8)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.range(0, 100).select((F.col("id") % 7).alias("k"), "id")
    small = spark.createDataFrame([(0, "x")], "k long, label string")
    plain = big.join(small, "k", "left")
    salted = salted_join(big, small, ["k"], "left", salt_buckets=4)
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_rejects_unsupported_how(spark):
    df = spark.range(1).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, ["k"], how="full_outer")


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Same-bucketed tables join without any shuffle: the catalog's
    bucketing metadata satisfies the join's distribution requirement."""
    from database_importer_spark.sources.loader import load_table

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "dbis_orders_b", ["o_orderkey"], buckets=4)
    write_bucketed(lineitem, "dbis_lineitem_b", ["o_orderkey"], buckets=4)

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "dbis_orders_b", "dbis_lineitem_b", ["o_orderkey"])
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        assert "Exchange" not in plan  # the whole point of bucketing
        assert "SortMergeJoin" in plan
        # and the result is still correct
        assert j.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS dbis_orders_b")
        spark.sql("DROP TABLE IF EXISTS dbis_lineitem_b")
