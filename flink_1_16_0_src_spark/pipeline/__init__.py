"""LLM-training-data pipeline operators (north-star extras, BASELINE.json).

Designed for 100 TB from the start:
- every transform is a DataFrame→DataFrame composition of JVM-side
  functions (explode/groupBy/join) — no driver-side collection, no
  row-at-a-time Python;
- near-dup detection goes through MinHash-LSH banding (shuffle on
  band hash) or SimHash buckets — never an O(n²) cross join;
- similarity search has a brute-force baseline (small/medium corpora,
  broadcast query side) and an LSH-bucketed scale path;
- hashes are md5-derived (not Spark's hash()) so results are
  deterministic across engines and runs — required by the DuckDB
  oracle and good practice for reproducible data pipelines.
"""
