"""Query registry: one declared query per SURVEY.md §2 key.

Each entry pairs a Spark plan builder ``fn(spark, sf_dir) →
DataFrame`` with an optional DuckDB oracle SQL string (None for
genuinely non-SQL-expressible ops — the driver then records a
rows-only check).

Determinism discipline (SURVEY.md §7.4) applied throughout:
  * every computed column aliased identically on both sides;
  * double aggregates accumulate in DECIMAL(25,4) (exact, order-
    independent) then cast to DOUBLE — both engines produce the
    identical IEEE value, so value-hashes match without rounding
    games;
  * every window/limit ORDER BY carries a full tiebreak key;
  * arrays canonicalized with sort_array / list_sort;
  * counts cast to BIGINT on both sides.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class DeclaredQuery:
    key: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None


REGISTRY: dict[str, DeclaredQuery] = {}


def declare(key: str, oracle: str | None = None):
    """Register ``fn`` as the Spark plan for ``key`` with its oracle."""

    def deco(fn):
        REGISTRY[key] = DeclaredQuery(key, fn, oracle)
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table (parquet scan → pushdown-capable),
    ns-timestamp columns normalized to µs (see sources.loader)."""
    from database_importer_spark.sources.loader import load_table

    return load_table(spark, sf_dir, name)


# Exact-decimal accumulation type for double aggregates: wide enough
# that no testdata sum can overflow, scale 4 covers every source
# column's printed precision. At 100 TB you would widen to (38,4).
DEC = "decimal(25,4)"


def dec4_sum(col, window=None):
    """DECIMAL(25,4)-exact SUM at native-long speed (round 4).

    Produces the bit-identical double that
    ``SUM(CAST(col AS DECIMAL(25,4)))::DOUBLE`` produces — the
    established oracle convention — while accumulating plain LONGs:

      1. quantize per row: ``floor(col*10000 + 0.5)`` recovers the
         EXACT 4-decimal integer, guaranteed (not probabilistic),
         because the input is an exact ≤4-decimal quantity whose
         double representation is within a few ulps (~1e-6 of a unit
         at the $1e5 scale) of the true value — never within 0.5;
      2. SUM the longs — exact to 2^63 (≈ $9e14 per group at 4dp:
         decades of 100 TB headroom, vs 2^53 if summed as doubles),
         order- and partitioning-independent, fastest agg path
         (measured: Q1 shape at sf10 5.76 s decimal → 0.88 s);
      3. one decimal conversion per OUTPUT group:
         long → decimal / 10000 → DECIMAL(25,4) → double walks the
         same decimal→double cast both engines already hash-match on.

    APPLICABILITY — use ONLY when ``col`` is exactly representable in
    ≤4 decimals: a ≤2dp money/qty column, or a product/sum of two of
    them (2dp×2dp = 4dp). An expression needing REAL rounding (e.g. a
    6dp triple product like price*(1-disc)*(1+tax)) must keep the
    DECIMAL cast: there HALF_UP on the decimal string and
    floor(+0.5) on the binary value can disagree at a .00005 tie.
    Verified bit-equal to the DuckDB oracle at sf0.01/0.1/1/10.
    """
    from pyspark.sql import functions as F

    q = F.floor(col * 10000 + F.lit(0.5))
    s = F.sum(q).over(window) if window is not None else F.sum(q)
    return (s.cast("decimal(25,0)") / 10000).cast(DEC).cast("double")
