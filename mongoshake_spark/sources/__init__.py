from mongoshake_spark.sources.tables import TABLES, load_table, register_views  # noqa: F401
from mongoshake_spark.sources.oplog import oplog_view, chunks_view  # noqa: F401
from mongoshake_spark.sources.live import (  # noqa: F401
    read_change_stream,
    read_kafka_tunnel,
    source_available,
    write_kafka_tunnel,
)
