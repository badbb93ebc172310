"""mongoshake_spark — a PySpark-native analytics engine with the
capability surface of alibaba/MongoShake (reference: /root/reference).

MongoShake is a streaming CDC dataflow engine (oplog tail -> filter ->
transform -> hash-partition -> idempotent apply) plus a parallel bulk-copy
engine. This package re-expresses that operator surface Spark-first:

- ``sources``   : snapshot readers, CDC view derivation, replayable streams
                  (reference: collector/reader/, collector/docsyncer/doc_reader.go)
- ``operators`` : filter chain, normalizers, partitioners, combiner, batcher,
                  merge/apply kernels (reference: collector/filter/, oplog/,
                  executor/)
- ``functions`` : scalar-function surface — text analysis, hashing,
                  fingerprinting used by dedup/similarity
- ``plans``     : declared-query registry (SURVEY.md §2.9 Q0-Q24 + training-
                  data pipeline queries), each paired with a DuckDB oracle
- ``streaming`` : Structured Streaming incr-sync pipeline — micro-batch
                  apply kernel with DDL barriers, txn reassembly
                  (reference: collector/batcher.go, collector/syncer.go)

Everything is DataFrame/SQL-first: Catalyst handles pushdown, pruning and
join planning; Python/pandas UDFs appear only where built-ins genuinely
cannot express the semantics (recursive JSON rewrites, multimodal decode).
"""

__version__ = "0.1.0"

from mongoshake_spark.session import get_spark  # noqa: F401
