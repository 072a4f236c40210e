from impala_cut_spark.sources.catalog import TABLES, load_tables, register_views

__all__ = ["TABLES", "load_tables", "register_views"]
