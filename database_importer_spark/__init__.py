"""database_importer_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of
``qpenko/database-importer`` (reference at /root/reference, v0.2.0) on
Apache Spark. The reference is a pandas+ODBC upsert tool whose data
plane is a set-based UPDATE..JOIN pushed to the target DBMS
(reference: dbimport/importer.py:312-359). This engine keeps those
semantics — validated column mapping, NULL-key filtering, key
uniqueness, set-based merge — but declares them as Catalyst logical
plans so Spark picks the physical strategy, and extends the surface
with the relational / streaming / LLM-data-pipeline operators a
100 TB training-data pipeline needs (SURVEY.md §2 Part B).

Public API:
    get_spark()            — tuned SparkSession factory
    load_tables()          — testdata loader / view registrar
    Merger                 — the upsert core (reference importer parity)
    functions.*            — type translation / cast lint / identifiers
"""

__version__ = "0.1.0"

from database_importer_spark.session import get_spark
from database_importer_spark.sources.loader import TABLES, load_tables, register_views
from database_importer_spark.operators.merge import Merger, MergerError

__all__ = [
    "get_spark",
    "load_tables",
    "register_views",
    "TABLES",
    "Merger",
    "MergerError",
    "__version__",
]
