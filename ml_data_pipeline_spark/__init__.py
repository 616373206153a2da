"""ml_data_pipeline_spark — a PySpark-native analytics + CDC-ingest engine.

A from-scratch re-expression of the capabilities of the
``aslitaser/ml-data-pipeline`` reference (a Rust columnar
source→transform→sink batch pipeline; see SURVEY.md) as an idiomatic
PySpark engine, extended per the north rule into a CDC / incremental-
ingest engine: change-log tail → exactly-once MERGE upserts into a
lake table of pre-tokenized training sequences, with schema evolution,
checkpointed resume, skew handling, and per-batch lineage/metrics.

Layout:
    session      — tuned SparkSession builder (AQE, Arrow, shuffle parts)
    lake         — LakeTable: snapshot-based merge-on-read table format
                   (stand-in for Iceberg; same commit/evolution contract)
    cdc          — change-event model, batch apply, streaming runner, oracle
    operators    — relational / dedup / similarity / text operators
    sources      — readers (csv, text, tfrecord framing, parquet helpers)
    functions    — column-level helpers (token-array transforms, hashing)
    streaming    — structured-streaming utilities
"""

__version__ = "0.1.0"
