from qaapi_spark.sources.tables import TABLES, read_table, register_temp_views

__all__ = ["TABLES", "read_table", "register_temp_views"]
