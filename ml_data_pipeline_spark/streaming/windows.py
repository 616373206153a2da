"""Event-time windowed streaming aggregations with watermarks.

The Structured Streaming windowed-agg surface of the engine (SURVEY.md
§2.11 "watermark / late data"): tumbling event-time windows over the
change stream, with a watermark bounding how late events may arrive
before their window is finalized. In the MERGE apply path late events
are safe regardless (max-seq comparison); windowed *aggregations*
(ingest-rate dashboards, per-source event counts) are where watermarks
actually govern state eviction — unbounded lateness would mean
unbounded state at 10^10-event scale.

Reference analog: the pipeline stats loop (ml-data-core/src/
schedule.rs:46-67 PipelineStats) — generalized from whole-run counters
to per-event-time-window aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ml_data_pipeline_spark.cdc.events import CHANGE_SCHEMA


def windowed_event_counts_stream(
    spark: SparkSession,
    events_dir: str,
    *,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    schema=None,
    max_files_per_trigger: int = 16,
) -> DataFrame:
    """Streaming DataFrame: per (event-time window, op) counts.

    Watermark = how long to keep a window's state open for late
    events; beyond it, late events are dropped from the aggregation
    (state is evicted — bounded memory under unbounded streams).
    """
    src = (
        spark.readStream.schema(schema or CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(events_dir)
    )
    return (
        src.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), "op")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            "op",
            "n_events",
        )
    )


def run_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    sink_table: str = "windowed_event_counts",
    timeout_sec: float = 300.0,
) -> DataFrame:
    """Replay the stream through the windowed agg into a memory sink;
    returns the final result DataFrame (batch-queryable)."""
    agg = windowed_event_counts_stream(
        spark, events_dir, window=window, watermark=watermark
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink_table)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout_sec)
    finally:
        if q.isActive:
            q.stop()
    return spark.table(sink_table)
