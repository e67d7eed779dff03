"""dca_manager_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference pipeline (kiran94/dca-manager): JSON/parquet
ingestion with canonical schema coercion, keyed upsert/merge tables with
Hudi-parity precombine semantics, the full relational analytics surface the
reference exposes through its lake table, a Structured-Streaming variant of
its queue stage, plus large-scale training-data operators (dedup families,
similarity search, text analysis, multimodal column plumbing).

Layers
------
- ``session``   : tuned SparkSession builders (AQE, Arrow, partition sizing)
- ``schemas``   : canonical StructTypes for the reference's 4 data abstractions
- ``io``        : sources/sinks incl. partitioned JSON and the merge table
- ``operators`` : relational + as-of/range joins + dedup/similarity/text ops
- ``pipeline``  : execute-orders / process-orders / load-transactions jobs
- ``streaming`` : queue source emulation, windowed/stateful streaming ops
- ``plans``     : query catalog + explain/inspection helpers
"""

__version__ = "0.1.0"
