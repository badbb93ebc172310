from mongoshake_spark.functions import texthash, text, dedup, similarity, packing, curation  # noqa: F401
