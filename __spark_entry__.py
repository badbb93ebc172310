"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship CDC-materialization query (Q13 — the
reference's final-state-equivalence contract, SURVEY.md §2.9) at sf0.001.
``queries()`` / ``oracle_sql()`` expose the declared-query registry
(mongoshake_spark/plans/queries.py): every implemented operator from
SURVEY.md §2 plus the training-data pipeline queries, each paired with a
DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# importable regardless of the caller's working directory
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mongoshake_spark.plans import oracle_queries, spark_queries  # noqa: E402

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return spark_queries()["q13_cdc_materialize"](spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() key (omitted for the few
    non-SQL-expressible ops — driver records a rows-only check there)."""
    return oracle_queries()
