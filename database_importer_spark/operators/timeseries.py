"""Time-series operators: regular-grid gap filling with forward fill,
and multi-resolution time-bucket rollups — the engine's analogue of
hypertable/continuous-aggregate functionality.

Scale design: the grid is generated per key with sequence()+explode
(rows proportional to key-span/step, never a cross join); forward
fill is one sort-window pass per key (same single-shuffle shape as
the as-of join); rollups compute every resolution in one scan via
GROUPING SETS (Expand), not one scan per resolution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def gap_fill_ffill(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    step_seconds: int = 3600,
) -> DataFrame:
    """Per-key regular grid from floor(min ts) to max ts at
    ``step_seconds``, each grid point carrying the last observed value
    at-or-before it (forward fill; NULL before the first observation).

    Implementation: per-key bounds → sequence() of grid instants →
    explode → union with observations → one window pass
    (last(value, ignorenulls) over ts order, observations sorting
    before grid points at equal ts) → keep grid rows. Union+window,
    not a range join."""
    b = events.groupBy(key).agg(
        F.date_trunc("hour", F.min(ts)).alias("t0"), F.max(ts).alias("t1")
    )
    grid = b.select(
        key,
        F.explode(
            F.sequence(
                "t0", "t1", F.expr(f"INTERVAL {step_seconds} SECONDS")
            )
        ).alias("grid_ts"),
    )
    obs = events.select(
        key,
        F.col(ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(value).alias("__v"),
    )
    g = grid.select(
        key,
        F.col("grid_ts").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(events.schema[value].dataType).alias("__v"),
    )
    # "__v" as the final orderBy key: deterministic tiebreak when a key
    # has duplicate observation timestamps (same pattern as
    # asof_join's right_tiebreak) — without it the carried value would
    # depend on partition order.
    w = (
        Window.partitionBy(key)
        .orderBy("__t", "__side", "__v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = obs.unionByName(g).withColumn(
        "filled_value", F.last("__v", ignorenulls=True).over(w)
    )
    return (
        filled.filter(F.col("__side") == 1)
        .select(key, F.col("__t").alias("grid_ts"), "filled_value")
    )


def time_bucket_rollup(
    spark: SparkSession,
    events: DataFrame,
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Hour/day/month rollups in ONE scan via GROUPING SETS — the
    continuous-aggregate shape. Output: (resolution, bucket_start,
    n_events, sum_value)."""
    events.createOrReplaceTempView("__dbis_ts_rollup_src")
    return spark.sql(
        f"""
        SELECT CASE WHEN h0 IS NOT NULL THEN 'hour'
                    WHEN d0 IS NOT NULL THEN 'day'
                    ELSE 'month' END AS resolution,
               COALESCE(h0, d0, m0) AS bucket_start,
               COUNT(*) AS n_events,
               CAST(SUM(CAST({value} AS DECIMAL(25,4))) AS DOUBLE) AS sum_value
        FROM (
            SELECT date_trunc('hour', {ts}) AS h0,
                   date_trunc('day', {ts}) AS d0,
                   date_trunc('month', {ts}) AS m0,
                   {value}
            FROM __dbis_ts_rollup_src
        )
        GROUP BY GROUPING SETS ((h0), (d0), (m0))
        """
    )
