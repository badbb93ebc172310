from mongoshake_spark.streaming.replay import write_replay_feed, read_oplog_stream  # noqa: F401
from mongoshake_spark.streaming.apply import ApplyKernel, run_incr_sync  # noqa: F401
