"""Per-micro-batch CDC apply: resolve → merge → commit → observe.

This is the engine's ``foreachBatch`` body — the analog of the
reference's pipeline loop body (source.next_batch → transform →
sink.consume, /root/reference/ml-data/ml-data-core/src/
schedule.rs:159-215) with the sink's ``flush`` becoming the lake
table's atomic snapshot commit, and the reference's ``PipelineStats``
(schedule.rs:46-67) becoming the ``_metrics`` / ``_lineage`` tables.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ml_data_pipeline_spark.cdc.events import DOC_SCHEMA
from ml_data_pipeline_spark.lake.table import LakeTable

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), True),
        T.StructField("snapshot_id", T.LongType(), True),
        T.StructField("skipped", T.BooleanType(), False),
        T.StructField("upsert_rows", T.LongType(), True),
        T.StructField("n_buckets_touched", T.IntegerType(), True),
        T.StructField("schema_evolved", T.BooleanType(), True),
        T.StructField("wall_ms", T.DoubleType(), False),
        T.StructField("committed_at", T.TimestampType(), False),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("stream_id", T.StringType(), False),
        T.StructField("batch_id", T.LongType(), True),
        T.StructField("snapshot_id", T.LongType(), True),
        T.StructField("input_file", T.StringType(), True),
        T.StructField("bucket", T.IntegerType(), True),
        T.StructField("output_file", T.StringType(), True),
        T.StructField("rows", T.LongType(), True),
    ]
)


def create_docs_table(
    spark: SparkSession, root: str, n_buckets: int = 16
) -> LakeTable:
    """Create the tokenized-sequence lake table (input_hint shape)."""
    return LakeTable.create(
        spark, root, DOC_SCHEMA, key_col="doc_id", n_buckets=n_buckets
    )


def apply_batch(
    table: LakeTable,
    batch_df: DataFrame,
    batch_id: int | None = None,
    *,
    stream_id: str = "cdc",
    salt: int | None = None,
    compact_touched: bool = False,
    write_metrics: bool = True,
    collect_input_lineage: bool = False,
) -> dict:
    """Apply one micro-batch of change events; record metrics + lineage.

    Idempotent: a replayed ``batch_id`` (streaming restart re-delivers
    the last uncommitted batch) is skipped via the snapshot's per-stream
    watermark, so the sink is exactly-once end-to-end.

    ``collect_input_lineage`` opts into the fallback that recovers
    input file names with an extra ``input_file_name()`` scan when the
    metadata-only ``inputFiles()`` call comes back empty (foreachBatch
    DataFrames often report none). It is OFF by default because that
    fallback re-reads the whole micro-batch input — roughly doubling
    input IO per batch — for advisory lineage rows only.
    """
    t0 = time.monotonic()
    try:
        input_files = list(batch_df.inputFiles())
        if not input_files and write_metrics and collect_input_lineage:
            input_files = [
                r[0]
                for r in batch_df.select(F.input_file_name()).distinct().collect()
                if r[0]
            ]
    except Exception:
        input_files = []
    res = table.merge_batch(
        batch_df,
        batch_id=batch_id,
        stream_id=stream_id,
        salt=salt,
        compact_touched=compact_touched,
    )
    wall_ms = (time.monotonic() - t0) * 1000.0
    res["wall_ms"] = wall_ms
    res["input_files"] = input_files
    if write_metrics:
        _record(table, res)
    return res


def _record(table: LakeTable, res: dict) -> None:
    """Append metrics + per-partition lineage rows (advisory tables).

    Written *after* the snapshot commit: a crash in between loses one
    metrics row, never a data commit — metrics must not gate
    exactly-once.
    """
    spark = table.spark
    import datetime

    now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
    mrow = [
        (
            res["stream_id"],
            res.get("batch_id"),
            res.get("snapshot_id"),
            bool(res.get("skipped")),
            res.get("upsert_rows"),
            len(res.get("touched_buckets") or []),
            bool(res.get("schema_evolved")),
            float(res.get("wall_ms", 0.0)),
            now,
        )
    ]
    spark.createDataFrame(mrow, METRICS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(table.root, "metrics"))

    if res.get("skipped"):
        return
    # Files created by this commit, reported by the merge itself (no
    # snapshot-history scan — that would be O(batches) per batch).
    created = res.get("new_files") or []
    lrows = []
    inputs = res.get("input_files") or [None]
    for f in created:
        for inp in inputs:
            lrows.append(
                (
                    res["stream_id"],
                    res.get("batch_id"),
                    res.get("snapshot_id"),
                    inp,
                    f["bucket"],
                    f["path"],
                    f["rows"],
                )
            )
    if lrows:
        spark.createDataFrame(lrows, LINEAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(os.path.join(table.root, "lineage"))


def read_metrics(table: LakeTable) -> DataFrame:
    return table.spark.read.schema(METRICS_SCHEMA).parquet(
        os.path.join(table.root, "metrics")
    )


def read_lineage(table: LakeTable) -> DataFrame:
    return table.spark.read.schema(LINEAGE_SCHEMA).parquet(
        os.path.join(table.root, "lineage")
    )
