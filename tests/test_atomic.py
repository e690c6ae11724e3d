"""Write-then-swap publication: readers see old or new, never a mix;
rollback restores a prior version."""

from pyspark.sql import functions as F

from database_importer_spark.sources.atomic import (
    atomic_overwrite,
    list_versions,
    read_current,
    rollback,
)


def test_atomic_overwrite_and_rollback(spark, tmp_path):
    root = str(tmp_path / "tbl")
    import os

    os.makedirs(root)

    v1 = spark.range(0, 100).withColumn("v", F.lit("one"))
    atomic_overwrite(v1, root, "v1")
    assert read_current(spark, root).count() == 100

    # merge-style full rewrite to v2
    v2 = spark.range(0, 150).withColumn("v", F.lit("two"))
    atomic_overwrite(v2, root, "v2")
    cur = read_current(spark, root)
    assert cur.count() == 150
    assert cur.select("v").distinct().collect()[0][0] == "two"

    assert list_versions(root) == ["v1", "v2"]

    # instant rollback — old version still materialized
    rollback(root, "v1")
    assert read_current(spark, root).count() == 100

    # idempotent retry of a version then republish
    atomic_overwrite(v2, root, "v2")
    assert read_current(spark, root).count() == 150
