from mongoshake_spark.streaming.replay import write_replay_feed, read_oplog_stream  # noqa: F401
from mongoshake_spark.streaming.apply import ApplyKernel, run_incr_sync  # noqa: F401
from mongoshake_spark.streaming.txn import (  # noqa: F401
    reassemble_in_batch,
    reassemble_transactions,
)
from mongoshake_spark.streaming.windows import windowed_counts  # noqa: F401
from mongoshake_spark.streaming import metrics  # noqa: F401
