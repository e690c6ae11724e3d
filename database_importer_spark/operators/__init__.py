from database_importer_spark.operators.merge import Merger, MergerError

__all__ = ["Merger", "MergerError"]
