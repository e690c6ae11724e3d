"""Distributed global ranking — the scale-safe replacement for
``Window.orderBy`` with no partitionBy (which funnels the entire
input through ONE task: the classic Spark global-rank scale killer).

Two-phase plan, all lazy, no driver-side actions:

1. **Bucketize** on the primary sort key: approx-percentile cutpoints
   are computed as a 1-row aggregate (mergeable sketch, map-side
   partial) and broadcast-crossJoined; each row's bucket id = number
   of cutpoints strictly before its key in sort order. Rows that tie
   with a cutpoint all land in the same bucket, so bucket boundaries
   never split a tie group.
2. **Rank within buckets, then offset**: a *partitioned* window
   (partitionBy bucket) computes local row numbers in parallel;
   per-bucket counts (tiny: one row per bucket) are turned into
   prefix offsets with a triangular self-join (no unpartitioned
   window anywhere in the plan), broadcast, and added to the local
   rank.

Cost at scale: one full-data hash shuffle on bucket id (a global
sort needs a comparable range shuffle) + one sketch scan; every sort
runs on ~1/num_buckets of the data. Skew bound: approx-percentile
cutpoints equalize bucket row counts up to sketch error + tie mass.

The reference has no analogue (single-process pandas sorts its whole
frame in memory); this is the 1000-executor equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType
from pyspark.sql.window import Window

_BUCKET = "__rk_bucket"
_CUTS = "__rk_cuts"
_LOCAL = "__rk_local_rn"
_CNT = "__rk_cnt"
_OFF = "__rk_offset"


def _order_columns(order: list[tuple[str, bool]]) -> list[Column]:
    return [
        F.col(name).desc() if descending else F.col(name).asc()
        for name, descending in order
    ]


def with_global_row_number(
    df: DataFrame,
    order: list[tuple[str, bool]],
    rank_col: str = "rank",
    num_buckets: int = 64,
    total_col: str | None = None,
) -> DataFrame:
    """Append a 1-based global ``row_number`` over ``order`` —
    ``[(column, descending), ...]`` — without a single-partition
    window. The first order column is the bucketing key and must be
    numeric (percentile sketch domain); the full order list must be a
    total order (include a unique tiebreak) for a deterministic rank.

    ``total_col``: also append the global row count (needed by ntile
    / percent_rank / cume_dist arithmetic) — derived from the same
    per-bucket counts, no extra scan of ``df``.

    String keys are supported through an ORDER-PRESERVING numeric
    surrogate: the first 8 UTF-8 bytes, zero-right-padded, packed
    big-endian into a DECIMAL(38,0). Byte-wise order of padded UTF-8
    equals string order, so bucket boundaries never invert the true
    order; strings sharing an 8-byte prefix merely land in the same
    bucket (ties are resolved by the real columns inside the
    partitioned window). Keys must be non-null (filter or coalesce
    first) — a NULL key would bucket first regardless of sort
    direction.
    """
    key, key_desc = order[0]
    if isinstance(df.schema[key].dataType, StringType):
        bucket_key = _BUCKET + "_skey"
        df = df.withColumn(
            bucket_key,
            F.expr(
                f"cast(conv(hex(rpad(encode({key}, 'UTF-8'), 8, x'00')), 16, 10)"
                " as decimal(38,0))"
            ),
        )
        out = with_global_row_number(
            df,
            [(bucket_key, key_desc)] + order,
            rank_col=rank_col,
            num_buckets=num_buckets,
            total_col=total_col,
        )
        return out.drop(bucket_key)
    fractions = [i / num_buckets for i in range(1, num_buckets)]
    cuts = df.agg(
        F.percentile_approx(key, fractions, 10_000).alias(_CUTS)
    )

    # bucket id = cutpoints strictly before this key in sort order;
    # ties with a cutpoint stay on the earlier side (deterministic).
    def _past_cut(acc: Column, c: Column) -> Column:
        past = F.col(key) < c if key_desc else F.col(key) > c
        return acc + F.when(past, 1).otherwise(0)

    bucketed = (
        df.crossJoin(F.broadcast(cuts))
        .withColumn(_BUCKET, F.aggregate(_CUTS, F.lit(0), _past_cut))
        .drop(_CUTS)
    )

    w_local = Window.partitionBy(_BUCKET).orderBy(*_order_columns(order))
    local = bucketed.withColumn(_LOCAL, F.row_number().over(w_local))

    counts = bucketed.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias(_CNT))
    # prefix offsets via triangular self-join over the (tiny) counts —
    # deliberately NOT an unpartitioned window, so no plan in this
    # module ever contains a single-partition WindowExec.
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(b, F.col(f"b.{_BUCKET}") < F.col(f"a.{_BUCKET}"), "left")
        .groupBy(F.col(f"a.{_BUCKET}").alias(_BUCKET))
        .agg(F.coalesce(F.sum(f"b.{_CNT}"), F.lit(0)).alias(_OFF))
    )
    if total_col is not None:
        offsets = offsets.crossJoin(
            F.broadcast(counts.agg(F.sum(_CNT).alias(total_col)))
        )

    out = (
        local.join(F.broadcast(offsets), _BUCKET)
        .withColumn(rank_col, (F.col(_LOCAL) + F.col(_OFF)).cast("bigint"))
        .drop(_BUCKET, _LOCAL, _OFF)
    )
    return out


def ntile_expr(rank_col: str, total_col: str, n: int) -> Column:
    """SQL NTILE(n) from a global row number + total count: the first
    ``total mod n`` tiles get ``ceil(total/n)`` rows, the rest get
    ``floor(total/n)`` — exactly the ANSI tile-size rule."""
    rn, total = F.col(rank_col), F.col(total_col)
    q = F.floor(total / n)
    r = total % n
    big = r * (q + 1)  # rows covered by the (q+1)-sized tiles
    return (
        F.when(rn <= big, F.ceil(rn / (q + 1)))
        .otherwise(r + F.ceil((rn - big) / q))
        .cast("int")
    )
