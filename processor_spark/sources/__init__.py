from processor_spark.sources.fixtures import TABLES, load, load_all, register_views, schema_for

__all__ = ["TABLES", "load", "load_all", "register_views", "schema_for"]
