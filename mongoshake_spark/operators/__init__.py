from mongoshake_spark.operators import filters, transforms, partitioners, combiner, merge, temporal  # noqa: F401
