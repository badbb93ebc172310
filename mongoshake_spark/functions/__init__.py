from mongoshake_spark.functions import texthash, text, dedup, similarity, packing  # noqa: F401
