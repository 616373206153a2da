"""Shared-testdata table loading (TESTDATA.md contract).

Reference analog: the source factory + format autodetection
(/root/reference/ml-data/ml-data-readers/src/factory.rs:52-136,
 common.rs:70-148). Here formats are explicit Parquet and Spark's
datasource handles split planning; loading stays declarative so
Catalyst can push filters/projections into the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def spread_partitions(spark: SparkSession) -> int:
    """Round-robin fan-out width for CPU-heavy per-row pipelines:
    3 waves per core (mirrors session.py's minPartitionNum rationale —
    fine-grained tasks absorb stragglers under host CPU steal).
    Derived from the session's parallelism, never a constant."""
    return spark.sparkContext.defaultParallelism * 3


def load_table_spread(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load + round-robin repartition: the input-skew remedy for
    row-group-bound scans feeding expensive per-row work.

    The shared testdata writes each table as ONE parquet file with ONE
    row group (sf1 documents = 50k rows / 1 row group); Parquet splits
    at row-group granularity, so regardless of maxPartitionBytes /
    minPartitionNum the scan yields ONE non-empty task and every
    downstream map-side expression (md5 shingles, cosine folds, Python
    codec encodes) runs on a single core. Repartitioning right after
    the read (optimization-guide §2.5, "input skew ... otherwise
    repartition immediately after the read") moves only the scanned
    bytes once and unlocks the whole cluster for the per-row work.

    Use for pipelines whose pre-shuffle compute dominates (dedup
    shingling/hashing, vector math, Python-codec sinks). Plain
    aggregation/join queries keep `load_table`: their first exchange
    already redistributes, and an extra repartition would be a second
    shuffle for no new parallelism. Safe for results: every registry
    aggregate is order-independent by the oracle rules (exact decimal /
    integer sums, min/max of strings), so row-to-partition assignment
    cannot change any value.
    """
    return load_table(spark, sf_dir, name).repartition(
        spread_partitions(spark)
    )
