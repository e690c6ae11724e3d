"""Table-driven scalar-layer tests — the reference's full truth tables
(/root/reference/tests/test_util.py) plus the Spark-type extension.
No Spark session needed.
"""

import pytest
from pyspark.sql import types as T

from database_importer_spark.functions import (
    canonical_dtype,
    cast_needs_warning,
    lint_cast_plan,
    qualify_name,
    quote_identifier,
    quote_spark_identifier,
    spark_type_for,
)

DTYPE_CASES = {
    "object": "text",
    "str": "text",
    "string": "text",
    "int64": "number",
    "longlong": "number",
    "uint64": "number",
    "ulonglong": "number",
    "float64": "decimal",
    "datetime64[ns]": "datetime",
    "bool": "bool",
}


@pytest.mark.parametrize("name,expected", DTYPE_CASES.items())
def test_canonical_dtype(name, expected):
    assert canonical_dtype(name) == expected


CAST_CASES = {
    ("text", "char"): False,
    ("text", "char(10)"): False,
    ("text", "nvarchar(10)"): False,
    ("text", "number"): True,
    ("number", "int"): False,
    ("number", "decimal"): False,
    ("number", "decimal(10)"): False,
    ("number", "decimal(10, 5)"): False,
    ("number", "numeric"): False,
    ("number", "numeric(10)"): False,
    ("number", "numeric(10, 5)"): False,
    ("number", "nvarchar(10)"): True,
    ("decimal", "float"): False,
    ("decimal", "decimal"): True,
    ("decimal", "decimal(10)"): True,
    ("decimal", "decimal(10, 0)"): True,
    ("decimal", "decimal(10, 1)"): False,
    ("decimal", "numeric"): True,
    ("decimal", "numeric(10)"): True,
    ("decimal", "numeric(10, 0)"): True,
    ("decimal", "numeric(10, 1)"): False,
    ("decimal", "nvarchar(10)"): True,
    ("datetime", "datetime"): False,
    ("datetime", "datetime2"): False,
    ("datetime", "datetimeoffset"): False,
    ("datetime", "smalldatetime"): False,
    ("datetime", "date"): True,
    ("datetime", "time"): True,
}


@pytest.mark.parametrize("pair,expected", CAST_CASES.items())
def test_cast_needs_warning(pair, expected):
    assert cast_needs_warning(*pair) is expected


QUOTE_CASES = {
    "": "[]",
    "]": "[]]]",
    "[": "[[]",
    "][][": "[]][]][]",
    "a": "[a]",
    "[a]": "[[a]]]",
    "a" * 128: "[" + "a" * 128 + "]",
    "a" * 129: None,
}


@pytest.mark.parametrize("s,expected", QUOTE_CASES.items())
def test_quote_identifier(s, expected):
    assert quote_identifier(s) == expected


def test_quote_spark_identifier():
    assert quote_spark_identifier("a") == "`a`"
    assert quote_spark_identifier("a`b") == "`a``b`"


def test_qualify_name():
    assert qualify_name("Schema", "Table") == "Schema.Table"
    assert qualify_name("", "Table") == "Table"
    assert qualify_name(None, "Table") == "Table"


def test_spark_type_for():
    assert spark_type_for("object") == T.StringType()
    assert spark_type_for("int64") == T.LongType()
    assert spark_type_for("float32") == T.DoubleType()
    assert spark_type_for("datetime64[ns]") == T.TimestampType()
    assert spark_type_for("bool") == T.BooleanType()
    assert spark_type_for("weird") == T.StringType()


def test_lint_cast_plan():
    warnings = lint_cast_plan(
        {"a": "float64", "b": "int64", "c": "datetime64[ns]"},
        {"a": "decimal(10,0)", "b": "int", "c": "date"},
    )
    assert ("a", "decimal", "decimal(10,0)") in warnings
    assert ("c", "datetime", "date") in warnings
    assert all(w[0] != "b" for w in warnings)
