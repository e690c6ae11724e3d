"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the engine's Merger doing a
full upsert — the reference's raison d'être, completed) on sf0.001.
``queries()`` / ``oracle_sql()`` expose every declared SURVEY.md §2
operator with its DuckDB twin from the plan registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from database_importer_spark.plans import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return REGISTRY["upsert_merge_full"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {key: q.fn for key, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible declared query."""
    return {
        key: q.oracle for key, q in sorted(REGISTRY.items()) if q.oracle is not None
    }
