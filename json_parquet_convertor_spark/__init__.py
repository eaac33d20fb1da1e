"""json_parquet_convertor_spark — a PySpark-native analytics engine.

A brand-new, Spark-first engine carrying the capabilities of the reference
``gajendarp05/JSON-Parquet-Convertor`` (an SQS-driven JSON→Parquet converter,
see ``/root/reference/convertor/convertor.go``) generalized to a full
relational + LLM-data-pipeline operator surface, per SURVEY.md §2.

Layout
------
- ``session``    — SparkSession factory (AQE on, Arrow on, snappy parquet)
- ``registry``   — query/oracle registry backing ``__spark_entry__.py``
- ``sources``    — readers/writers (parquet, JSON, CSV, partitioned sinks)
- ``convert``    — reference-parity JSON→Parquet conversion semantics
- ``operators``  — relational queries (filters, joins, aggs, windows, ...)
- ``functions``  — scalar function families + text/multimodal helpers
- ``streaming``  — Structured Streaming harnesses + batch-mode equivalents
- ``plans``      — plan inspection utilities (explain capture, checks)
"""

__version__ = "0.1.0"
