from vector_db_core_spark.sources.loaders import TABLES, load_table, load_all, register_views

__all__ = ["TABLES", "load_table", "load_all", "register_views"]
