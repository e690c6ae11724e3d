"""Staged-merge SQL generation tests (no server needed) — statement
shapes mirror the reference's dialect branches
(/root/reference/dbimport/importer.py:41-51, :312-356) and validate
the completed insert half.
"""

import sqlite3

import pytest

from database_importer_spark.sources.jdbc_sink import MergePlan, build_merge_plan


def test_mssql_plan_shapes():
    p = build_merge_plan(
        "groceries", ["id"], ["quantity", "price"], dialect="mssql", run_id="t1"
    )
    assert p.create_staging.startswith("SELECT TOP 0 [id], [quantity], [price] INTO")
    assert "UPDATE a SET a.[quantity] = b.[quantity], a.[price] = b.[price]" in p.update
    assert "INNER JOIN" in p.update and "a.[id] = b.[id]" in p.update
    assert p.insert.startswith("INSERT INTO [dbo].[groceries]")
    assert "NOT EXISTS" in p.insert
    assert "OBJECT_ID" in p.drop_staging


def test_sqlite_plan_is_correlated_subquery():
    p = build_merge_plan(
        "groceries", ["id"], ["price"], dialect="sqlite", run_id="t2"
    )
    assert 'CREATE TEMP TABLE "temp_dbis_staging_t2"' in p.create_staging
    assert "LIMIT 0" in p.create_staging
    assert "WHERE EXISTS" in p.update
    assert p.update.count("SELECT") >= 2  # correlated scalar subquery form


def test_multi_key_conjunction():
    p = build_merge_plan("t", ["k1", "k2"], ["v"], dialect="mssql")
    assert "a.[k1] = b.[k1] AND a.[k2] = b.[k2]" in p.update


def test_validation_errors():
    with pytest.raises(ValueError, match="unsupported dialect"):
        build_merge_plan("t", ["k"], ["v"], dialect="mysql")
    with pytest.raises(ValueError, match="at least one action"):
        build_merge_plan("t", ["k"], ["v"], update=False, insert=False)


def test_derby_plan_shapes():
    p = build_merge_plan(
        "GROCERIES", ["id"], ["quantity", "price"], dialect="derby", run_id="t3"
    )
    assert p.create_staging.endswith("WITH NO DATA")
    assert "IF EXISTS" not in p.drop_staging  # Derby has no IF EXISTS
    assert "WHERE EXISTS" in p.update  # correlated-subquery form
    assert "NOT EXISTS" in p.insert


def test_live_jdbc_stage_and_merge_derby(spark, tmp_path):
    """The REAL data plane, end-to-end in-container: Spark executors
    array-bind batches into a Derby staging table via df.write.jdbc,
    the generated merge statements run server-side over one driver
    connection, and the post-merge table read back via spark.read.jdbc
    matches the reference's groceries golden rows
    (reference tests/test_importer.py:146-164)."""
    from database_importer_spark.sources.jdbc_sink import (
        derby_shutdown,
        derby_url,
        execute_statements,
        stage_dataframe,
    )

    db = str(tmp_path / "db")
    url = derby_url(db, create=True)
    target = spark.createDataFrame(
        [
            ("ID000001", "Apple", 5, 10.0),
            ("ID000002", "Pear", 4, 9.0),
            ("ID000003", "Orange", 3, 8.0),
            ("ID000004", "Lemon", 6, 7.0),
        ],
        "id string, item string, quantity int, price double",
    )
    # Spark's DerbyDialect maps StringType→CLOB, which Derby cannot
    # compare in the merge join — pin key/text columns to VARCHAR.
    (
        target.write.mode("overwrite")
        .option("createTableColumnTypes", "id VARCHAR(64), item VARCHAR(64)")
        .jdbc(url, "GROCERIES")
    )

    p = build_merge_plan(
        "GROCERIES", ["id"], ["quantity", "price"], dialect="derby", run_id="live"
    )
    execute_statements(spark, url, [p.drop_staging, p.create_staging])
    updates = spark.createDataFrame(
        [("ID000001", 15, 20.0), ("ID000009", 42, 1.0)],
        "id string, quantity int, price double",
    ).repartition(3)  # several executor connections, like a real cluster
    stage_dataframe(updates, url, p.staging)
    execute_statements(
        spark, url, [p.update, p.insert, p.drop_staging_after]
    )

    got = sorted(
        (r["id"], r["quantity"], r["price"])
        for r in spark.read.jdbc(url, "GROCERIES")
        .select("id", "quantity", "price")
        .collect()
    )
    derby_shutdown(spark, db)
    assert got == [
        ("ID000001", 15, 20.0),
        ("ID000002", 4, 9.0),
        ("ID000003", 3, 8.0),
        ("ID000004", 6, 7.0),
        ("ID000009", 42, 1.0),
    ]


def test_live_derby_repeated_merge_same_run_id(spark, tmp_path):
    """Regression (ADVICE r5): a second merge into the same database
    under a reused run_id (the API default) must not abort on CREATE
    INDEX already-exists, and the transient target index must be
    dropped in cleanup so indexes don't accumulate across runs."""
    from database_importer_spark.sources.jdbc_sink import (
        derby_shutdown,
        derby_url,
        execute_statements,
        stage_dataframe,
    )

    db = str(tmp_path / "db")
    url = derby_url(db, create=True)
    target = spark.createDataFrame(
        [("ID000001", 5, 10.0), ("ID000002", 4, 9.0)],
        "id string, quantity int, price double",
    )
    (
        target.write.mode("overwrite")
        .option("createTableColumnTypes", "id VARCHAR(64)")
        .jdbc(url, "GROCERIES")
    )
    for qty in (15, 25):  # two merges, SAME run_id
        p = build_merge_plan(
            "GROCERIES", ["id"], ["quantity", "price"], dialect="derby"
        )
        execute_statements(spark, url, [p.drop_staging, p.create_staging])
        stage_dataframe(
            spark.createDataFrame(
                [("ID000001", qty, 20.0)], "id string, quantity int, price double"
            ),
            url,
            p.staging,
        )
        execute_statements(
            spark,
            url,
            [
                p.index_staging,
                p.index_target,
                p.update,
                p.insert,
                p.drop_staging_after,
                p.drop_index_target,
            ],
        )
    got = sorted(
        (r["id"], r["quantity"])
        for r in spark.read.jdbc(url, "GROCERIES").select("id", "quantity").collect()
    )
    # no leftover transient index on the target after cleanup
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    rs = conn.createStatement().executeQuery(
        "SELECT COUNT(*) FROM SYS.SYSCONGLOMERATES WHERE ISINDEX = true "
        "AND CONGLOMERATENAME LIKE 'idx_tgt_%'"
    )
    rs.next()
    leftover = rs.getInt(1)
    conn.close()
    derby_shutdown(spark, db)
    assert got == [("ID000001", 25), ("ID000002", 4)]
    assert leftover == 0


def test_sqlite_statements_execute_end_to_end():
    """Golden-row check: run the generated sqlite statements against a
    real in-memory SQLite with the reference's groceries fixture —
    the same seed rows and expected outcome as the reference suite
    (tests/test_importer.py:146-164), via our generated SQL."""
    conn = sqlite3.connect(":memory:")
    conn.execute(
        "CREATE TABLE groceries (id TEXT NOT NULL PRIMARY KEY, item TEXT, "
        "quantity INT, price REAL)"
    )
    conn.executemany(
        "INSERT INTO groceries VALUES (?, ?, ?, ?)",
        [
            ("ID000001", "Apple", 5, 10.0),
            ("ID000002", "Pear", 4, 9.0),
            ("ID000003", "Orange", 3, 8.0),
            ("ID000004", "Lemon", 6, 7.0),
        ],
    )
    p = build_merge_plan(
        "groceries",
        ["id"],
        ["quantity", "price"],
        dialect="sqlite",
        update=True,
        insert=True,
        run_id="e2e",
    )
    conn.execute(p.drop_staging)
    conn.execute(p.create_staging)
    conn.executemany(
        f"INSERT INTO {p.staging} VALUES (?, ?, ?)",
        [
            ("ID000001", 15, 20.0),  # update
            ("ID000009", 42, 1.0),  # insert (new key)
        ],
    )
    conn.execute(p.update)
    conn.execute(p.insert)
    conn.execute(p.drop_staging_after)
    rows = sorted(conn.execute("SELECT id, quantity, price FROM groceries"))
    assert rows == [
        ("ID000001", 15, 20.0),
        ("ID000002", 4, 9.0),
        ("ID000003", 3, 8.0),
        ("ID000004", 6, 7.0),
        ("ID000009", 42, 1.0),
    ]
