"""Streaming windowed aggregation: result parity with the batch
equivalent over the same replayed input."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.cdc.events import generate_change_stream
from ml_data_pipeline_spark.streaming.windows import run_windowed_counts


def test_windowed_counts_match_batch(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    generate_change_stream(spark, ev_dir, 100, 2000, n_chunks=4, seed=42)
    out = run_windowed_counts(
        spark,
        ev_dir,
        str(tmp_path / "ckpt"),
        window="1 minute",
        watermark="2 minutes",
        sink_table="win_test",
    )
    got = {
        (r["window_start"], r["op"]): r["n_events"] for r in out.collect()
    }
    batch = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(ev_dir)
        .groupBy(F.window("ts", "1 minute").alias("win"), "op")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("win.start").alias("s"), "op", "n")
    )
    want = {(r["s"], r["op"]): r["n"] for r in batch.collect()}
    assert got == want
    assert sum(got.values()) == 2000
