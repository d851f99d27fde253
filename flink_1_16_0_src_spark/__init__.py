"""flink_1_16_0_src_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of the reference Flink 1.16.0
source tree (tanbingshi666/flink-1.16.0-src), re-expressed Spark-first.

Architecture (SURVEY.md §7.0):

- ``session``    — SparkSession factory + a ``TableEnvironment``-style
  wrapper (reference: flink-table/flink-table-api-java/.../TableEnvironmentImpl.java).
- ``tables``     — parquet fixture loading / temp-view registration.
- ``registry``   — the query inventory: every operator family from
  SURVEY.md §2 registers a named (spark_fn, oracle_sql) pair here; the
  driver contract (``__spark_entry__.py``) and the pytest oracle
  harness both iterate it.
- ``operators``  — custom relational operators Spark lacks natively
  (as-of/temporal join, CUMULATE window TVF, session windows batch
  helper, top-n, dedup, CEP/MATCH_RECOGNIZE NFA).
- ``functions``  — scalar/aggregate function shims for Flink built-ins
  without a 1:1 Spark equivalent (SPLIT_INDEX, SINGLE_VALUE, ...).
- ``streaming``  — Structured Streaming wrappers: watermarks, window
  aggs, stateful top-n / keep-last dedup / streaming OVER via
  applyInPandasWithState, changelog normalize via foreachBatch.
- ``pipeline``   — LLM-training-data operators designed for 100 TB:
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  similarity search, text analysis, multimodal column plumbing.

Everything batch-relational delegates to Spark SQL / Catalyst; custom
code concentrates where Flink semantics have no Spark builtin.
"""

__version__ = "0.1.0"
