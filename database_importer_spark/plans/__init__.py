"""Declared queries: every SURVEY.md §2 key → (Spark plan, DuckDB oracle).

Importing this package populates the registry from all query modules.
"""

from database_importer_spark.plans.registry import REGISTRY, DeclaredQuery, declare

# populate
from database_importer_spark.plans import part_a  # noqa: F401
from database_importer_spark.plans import relational  # noqa: F401
from database_importer_spark.plans import windows_sets  # noqa: F401
from database_importer_spark.plans import llm  # noqa: F401
from database_importer_spark.plans import streaming_queries  # noqa: F401
from database_importer_spark.plans import udf_queries  # noqa: F401
from database_importer_spark.plans import tpch  # noqa: F401
from database_importer_spark.plans import extras  # noqa: F401
from database_importer_spark.plans import pipeline_ops  # noqa: F401

__all__ = ["REGISTRY", "DeclaredQuery", "declare"]
