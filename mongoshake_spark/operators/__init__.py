from mongoshake_spark.operators import filters, transforms, partitioners, combiner, merge  # noqa: F401
