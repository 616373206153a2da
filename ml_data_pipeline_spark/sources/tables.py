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
