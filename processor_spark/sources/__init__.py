from processor_spark.sources.fixtures import TABLES, load, load_all, register_views, schema_for
from processor_spark.sources.lakehouse import CommitConflict, LakeCatalog, LakeTable

__all__ = [
    "TABLES",
    "load",
    "load_all",
    "register_views",
    "schema_for",
    "LakeTable",
    "LakeCatalog",
    "CommitConflict",
]
