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
