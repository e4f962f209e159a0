from wpvectordb_spark.plans.query_builder import Filter, QueryBuilder, Sort

__all__ = ["Filter", "QueryBuilder", "Sort"]
