"""Identifier quoting / name qualification (SURVEY.md §2 A.5).

Behavior parity with the reference (dbimport/util.py:79-84 and
:135-143, truth tables tests/test_util.py:12-15,:69-87), plus the
Spark-SQL backtick variant the engine itself uses.
"""

from __future__ import annotations

MAX_IDENTIFIER_LEN = 128


def quote_identifier(name: str) -> str | None:
    """SQL Server delimited identifier: ``[name]`` with ``]`` doubled.

    Returns None when the raw name exceeds 128 characters (SQL
    Server's sysname limit — kept as a lint even though Spark has no
    such cap).
    """
    if len(name) > MAX_IDENTIFIER_LEN:
        return None
    return "[" + name.replace("]", "]]") + "]"


def quote_spark_identifier(name: str) -> str:
    """Spark SQL delimited identifier: backticks, with ` doubled."""
    return "`" + name.replace("`", "``") + "`"


def qualify_name(schema: str | None, table: str) -> str:
    """``(schema, table) → "schema.table"``; schema optional/empty."""
    return f"{schema}.{table}" if schema else table
