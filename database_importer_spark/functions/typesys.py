"""Type translation and cast-compatibility lint (SURVEY.md §2 A.5).

Behavior parity with the reference's scalar type layer
(reference: dbimport/util.py:87-132, truth tables in
tests/test_util.py:17-67), re-expressed as data-driven tables and
extended with the canonical→Spark type mapping (SURVEY.md §1.4).

The reference collapses pandas/NumPy dtype names into four canonical
source types and checks each against a destination DBMS type string,
flagging (not blocking) lossy mappings. Spark's ANSI cast rules are
stricter at runtime; this layer stays a *pre-flight warning* pass
over ``(source schema, target schema)`` pairs, exactly as the GUI
highlighted lossy cells yellow (reference: window.py:410-415).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# --- canonical dtype translation (util.py:87-104 parity) ------------

# prefix → canonical name; checked in order, first match wins.
_PREFIX_CANON: list[tuple[tuple[str, ...], str]] = [
    (("object", "str"), "text"),
    (("int", "uint", "longlong", "ulonglong"), "number"),
    (("float",), "decimal"),
    (("datetime",), "datetime"),
]


def canonical_dtype(name: str) -> str:
    """Collapse a pandas/NumPy dtype name to {text,number,decimal,
    datetime} or pass it through unchanged (e.g. ``bool``)."""
    low = name.lower()
    if low == "object":
        return "text"
    for prefixes, canon in _PREFIX_CANON:
        if any(low.startswith(p) for p in prefixes if p != "object"):
            return canon
    return name


# --- canonical → Spark type mapping (SURVEY.md §1.4) ----------------

CANONICAL_TO_SPARK: dict[str, T.DataType] = {
    "text": T.StringType(),
    "number": T.LongType(),
    "decimal": T.DoubleType(),
    "datetime": T.TimestampType(),
    "bool": T.BooleanType(),
}


def spark_type_for(dtype_name: str) -> T.DataType:
    """pandas/NumPy dtype name → Spark type via the canonical layer."""
    canon = canonical_dtype(dtype_name)
    return CANONICAL_TO_SPARK.get(canon, T.StringType())


# --- cast-compatibility matrix (util.py:107-132 parity) -------------

_DEC_SCALE_RE = re.compile(r"^(?:decimal|numeric)\((\d+)\s*,\s*(\d+)\)$")


def cast_needs_warning(src: str, dst: str) -> bool:
    """True when mapping canonical source type ``src`` onto DBMS type
    string ``dst`` is potentially lossy and should be flagged.

    False (implicit-safe) cases mirror the reference matrix:
      text → any char*/[n]text type
      number → int / decimal* / numeric*
      decimal → float, or decimal/numeric with explicit scale > 0
      datetime → any type containing 'datetime'
    Everything else — including datetime→date/time and
    decimal→decimal(p,0) — warns.
    """
    if src == "text":
        return not ("char" in dst or "text" in dst)
    if src == "number":
        return not (
            dst == "int" or dst.startswith("decimal") or dst.startswith("numeric")
        )
    if src == "decimal":
        if dst == "float":
            return False
        m = _DEC_SCALE_RE.match(dst)
        return not (m and int(m.group(2)) > 0)
    if src == "datetime":
        return "datetime" not in dst
    return True


def lint_cast_plan(
    source_dtypes: dict[str, str], target_types: dict[str, str]
) -> list[tuple[str, str, str]]:
    """Pre-flight lint over a column mapping.

    ``source_dtypes``: column → pandas/Spark dtype name (inferred).
    ``target_types``: column → DBMS type string (catalog-discovered).
    Returns [(column, canonical_src, dst)] for every lossy mapping —
    the engine's version of the GUI's yellow-cell warnings
    (reference: window.py:413-414). Warnings, never errors.
    """
    warnings = []
    for col, dtype_name in source_dtypes.items():
        if col not in target_types:
            continue
        canon = canonical_dtype(dtype_name)
        dst = target_types[col].lower()
        if cast_needs_warning(canon, dst):
            warnings.append((col, canon, dst))
    return warnings
