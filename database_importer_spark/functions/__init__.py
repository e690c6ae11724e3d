from database_importer_spark.functions.typesys import (
    CANONICAL_TO_SPARK,
    canonical_dtype,
    cast_needs_warning,
    lint_cast_plan,
    spark_type_for,
)
from database_importer_spark.functions.identifiers import (
    quote_identifier,
    quote_spark_identifier,
    qualify_name,
)

__all__ = [
    "CANONICAL_TO_SPARK",
    "canonical_dtype",
    "cast_needs_warning",
    "lint_cast_plan",
    "spark_type_for",
    "quote_identifier",
    "quote_spark_identifier",
    "qualify_name",
]
