from ballista_spark.sources.registry import load_table, register_tables, TABLES

__all__ = ["load_table", "register_tables", "TABLES"]
