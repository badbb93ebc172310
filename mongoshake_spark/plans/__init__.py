from mongoshake_spark.plans.queries import QUERIES, spark_queries, oracle_queries  # noqa: F401
