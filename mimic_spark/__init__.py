"""mimic_spark — a PySpark-native CDC / incremental-ingest analytics engine.

A from-scratch re-expression of the capabilities of the reference ETL engine
(na399/MIMIC, surveyed in SURVEY.md) as an idiomatic Spark stack:

- ``mimic_spark.lakehouse``  — snapshot-isolated Parquet table format with
  atomic commits, schema evolution and copy-on-write MERGE (the role Iceberg
  plays on a real cluster; the sandbox image ships no Iceberg jar, so the
  commit protocol is implemented here with identical semantics).
- ``mimic_spark.sources``    — deterministic synthetic changelog generator
  (binlog/WAL of multi-turn transcript rows) + DDL-driven CSV ingest.
- ``mimic_spark.streaming``  — Structured Streaming CDC apply loop:
  per-micro-batch window dedup over LSN, salted repartition, MERGE upsert,
  exactly-once batch markers, per-partition lineage metrics, audit gate.
- ``mimic_spark.operators``  — the relational operator inventory from
  SURVEY.md §2 (joins incl. as-of/range, windows, eras, set ops, top-k)
  plus training-data ops (dedup families, ANN, text analysis, multimodal).
- ``mimic_spark.functions``  — deterministic hashing/ids, Arrow-vectorized
  text normalization (no per-row Python anywhere in the engine).
"""

__version__ = "0.1.0"
