from mongoshake_spark.sources.tables import TABLES, load_table, register_views  # noqa: F401
from mongoshake_spark.sources.oplog import oplog_view, chunks_view  # noqa: F401
