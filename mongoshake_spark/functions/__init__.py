from mongoshake_spark.functions import texthash, text, dedup, similarity  # noqa: F401
