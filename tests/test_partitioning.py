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


def test_ensure_bucketed_layout_recovers_stale_dir(spark, sf_dir):
    """The cross-session scenario: the in-memory catalog forgets a
    layout table but its warehouse directory survives. A fresh
    ensure_bucketed_layout call must clear the leftover and rebuild
    rather than fail on the existing path — and a widened column set
    must produce a DIFFERENT table name (never silently reuse a
    narrower layout)."""
    import os
    import shutil

    from database_importer_spark.operators.partitioning import (
        ensure_bucketed_layout,
    )
    from database_importer_spark.sources.loader import load_table

    narrow = load_table(spark, sf_dir, "orders").select("o_orderkey")
    t1 = ensure_bucketed_layout(
        spark, sf_dir, "orders", narrow, ["o_orderkey"], buckets=4
    )
    assert spark.catalog.tableExists(t1)
    loc = (
        spark.sql(f"DESCRIBE TABLE EXTENDED {t1}")
        .filter("col_name = 'Location'")
        .collect()[0][1]
    ).removeprefix("file:")
    # simulate the next session: catalog forgets, directory survives
    spark.sql(f"DROP TABLE {t1}")
    os.makedirs(loc, exist_ok=True)
    with open(os.path.join(loc, "leftover"), "w") as f:
        f.write("stale")
    t1b = ensure_bucketed_layout(
        spark, sf_dir, "orders", narrow, ["o_orderkey"], buckets=4
    )
    assert t1b == t1 and spark.catalog.tableExists(t1b)
    assert spark.table(t1b).count() == narrow.count()
    # widened columns -> new table name
    wide = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    t2 = ensure_bucketed_layout(
        spark, sf_dir, "orders", wide, ["o_orderkey"], buckets=4
    )
    assert t2 != t1
    for table in (t1b, t2):
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        shutil.rmtree(
            os.path.join(os.path.dirname(loc), table), ignore_errors=True
        )


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


def test_layout_identity_includes_derivation(spark, sf_dir):
    """ADVICE r4 (medium): two same-named, same-column projections
    with DIFFERENT derivations (one filtered) must map to different
    layout tables — the cache key hashes the canonicalized analyzed
    plan, not just column names."""
    from database_importer_spark.operators.partitioning import (
        ensure_bucketed_layout,
    )
    from database_importer_spark.sources.loader import load_table

    full = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    filtered = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_totalprice")
    )
    t_full = ensure_bucketed_layout(
        spark, sf_dir, "orders", full, ["o_orderkey"], buckets=4
    )
    t_filt = ensure_bucketed_layout(
        spark, sf_dir, "orders", filtered, ["o_orderkey"], buckets=4
    )
    assert t_full != t_filt
    assert spark.table(t_full).count() != spark.table(t_filt).count()
    # and sort_cols is part of the identity too
    t_sorted = ensure_bucketed_layout(
        spark, sf_dir, "orders", full, ["o_orderkey"], buckets=4,
        sort_cols=["o_orderkey", "o_totalprice"],
    )
    assert t_sorted != t_full


def test_partitioned_layout_rebuild_and_reuse(spark, sf_dir):
    """ensure_partitioned_layout: same derivation → same path (cache
    hit, no rewrite); a half-written layout (no _SUCCESS) is
    discarded and rebuilt."""
    import os
    import shutil

    from database_importer_spark.operators.partitioning import (
        ensure_partitioned_layout,
    )
    from database_importer_spark.sources.loader import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    p1 = ensure_partitioned_layout(spark, sf_dir, "events", ev, "day")
    mtime = os.path.getmtime(os.path.join(p1, "_SUCCESS"))
    p2 = ensure_partitioned_layout(spark, sf_dir, "events", ev, "day")
    assert p1 == p2
    assert os.path.getmtime(os.path.join(p2, "_SUCCESS")) == mtime  # no rewrite
    # simulate a torn write: drop the marker → next call rebuilds
    os.remove(os.path.join(p1, "_SUCCESS"))
    p3 = ensure_partitioned_layout(spark, sf_dir, "events", ev, "day")
    assert p3 == p1 and os.path.exists(os.path.join(p3, "_SUCCESS"))


def test_static_plan_session_shares_context_and_confs(spark):
    """static_plan_session: cached child (one per parent), adaptive
    off, builder-level confs inherited, same SparkContext and
    catalog; idempotent when handed the child itself."""
    from database_importer_spark.session import static_plan_session

    child = static_plan_session(spark)
    assert static_plan_session(spark) is child          # cached
    assert static_plan_session(child) is child          # idempotent
    assert child.sparkContext is spark.sparkContext
    assert child.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    # builder-level confs (SparkContext conf) are inherited
    assert child.conf.get("spark.sql.session.timeZone") == "UTC"
    assert (
        child.conf.get("spark.sql.legacy.bucketedTableScan.outputOrdering")
        == "true"
    )


def test_ensure_layout_factory_not_invoked_on_memo_hit(spark, sf_dir):
    """With a memo_token, the warm path returns the memoized layout
    WITHOUT building the source DataFrame (the factory is invoked only
    on a memo miss) — the ~30-70 ms py4j construction cost is paid
    once per process, not per query."""
    from database_importer_spark.operators.partitioning import (
        ensure_bucketed_layout,
        ensure_partitioned_layout,
    )
    from database_importer_spark.sources.loader import load_table

    calls = {"bkt": 0, "part": 0}

    def bkt_df():
        calls["bkt"] += 1
        return load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_totalprice"
        )

    t1 = ensure_bucketed_layout(
        spark, sf_dir, "orders", bkt_df, ["o_orderkey"], buckets=4,
        memo_token="test_factory_bkt",
    )
    t2 = ensure_bucketed_layout(
        spark, sf_dir, "orders", bkt_df, ["o_orderkey"], buckets=4,
        memo_token="test_factory_bkt",
    )
    assert t1 == t2
    assert calls["bkt"] == 1  # warm call never touched the factory

    def part_df():
        calls["part"] += 1
        return load_table(spark, sf_dir, "events").withColumn(
            "day", F.date_trunc("day", "ts").cast("date")
        )

    p1 = ensure_partitioned_layout(
        spark, sf_dir, "events", part_df, "day",
        memo_token="test_factory_part",
    )
    p2 = ensure_partitioned_layout(
        spark, sf_dir, "events", part_df, "day",
        memo_token="test_factory_part",
    )
    assert p1 == p2
    assert calls["part"] == 1


def test_read_partitioned_layout_caches_leaf_per_session(spark, sf_dir):
    """read_partitioned_layout returns the cached leaf scan for the
    same (session, loc) — partition discovery runs once — and a
    different session gets its OWN DataFrame (a df is bound to the
    session that created it)."""
    from database_importer_spark.operators.partitioning import (
        ensure_partitioned_layout,
        read_partitioned_layout,
    )
    from database_importer_spark.session import static_plan_session
    from database_importer_spark.sources.loader import load_table

    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts").cast("date")
    )
    loc = ensure_partitioned_layout(spark, sf_dir, "events", ev, "day")
    d1 = read_partitioned_layout(spark, loc, ev.schema)
    d2 = read_partitioned_layout(spark, loc, ev.schema)
    assert d1 is d2
    child = static_plan_session(spark)
    d3 = read_partitioned_layout(child, loc, ev.schema)
    assert d3 is not d1
    assert d1.count() == d3.count() == ev.count()

def test_layout_lock_creates_missing_warehouse_dir(tmp_path):
    """Regression (r6 driver red row): _layout_lock opens {loc}.lock
    where loc's parent is the warehouse dir — which is gitignored, so
    a fresh checkout has no spark-warehouse/ and the first layout key
    died with FileNotFoundError. The lock must create the parent."""
    from database_importer_spark.operators.partitioning import _layout_lock

    loc = str(tmp_path / "fresh_warehouse" / "dbis_part_events_x")
    assert not (tmp_path / "fresh_warehouse").exists()
    with _layout_lock(loc):
        pass
    assert (tmp_path / "fresh_warehouse").exists()


def test_fresh_checkout_smoke_layout_keys(tmp_path):
    """Driver-world smoke (VERDICT r6 item 6): a subprocess with an
    EMPTY cwd and a plain SparkSession (no session.py confs → warehouse
    defaults to cwd/spark-warehouse, which does not exist) must run the
    layout-building keys that bit the driver. Catches the class of
    works-only-in-a-dirty-tree portability bug before the driver does."""
    import subprocess
    import sys

    script = r"""
import sys
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .appName("fresh-checkout-smoke")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
import __spark_entry__ as e

qs = e.queries()
for key in ("agg_events_rollup_partitioned", "join_bucketed_colocated",
            "tpch_q6_partitioned", "upsert_merge_partitioned",
            "agg_count_distinct_bucketed", "upsert_merge_snapshot",
            "table_time_travel", "table_delete_where", "table_delete_mor",
            "join_skew_aqe", "stream_tumbling_window",
            "profile_numeric_stats_pushdown"):
    n = qs[key](spark, "/root/testdata/sf0.001").count()
    print(f"{key}: {n} rows")
print("SMOKE_OK")
"""
    r = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),
        capture_output=True,
        text=True,
        timeout=600,
        env={
            k: v
            for k, v in __import__("os").environ.items()
            if k not in ("SPARK_GRAFT_SF_DIR",)
        },
    )
    assert "SMOKE_OK" in r.stdout, r.stdout + r.stderr
