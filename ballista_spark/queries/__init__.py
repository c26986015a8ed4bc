from ballista_spark.queries.tpch import TPCH_QUERIES

__all__ = ["TPCH_QUERIES"]
