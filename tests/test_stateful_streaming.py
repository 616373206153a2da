"""applyInPandasWithState running-latest operator vs the batch reduce."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.cdc.events import generate_change_stream
from ml_data_pipeline_spark.streaming.stateful import run_running_latest


def test_running_latest_matches_batch_reduce(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    generate_change_stream(
        spark, ev_dir, 80, 1200, n_chunks=3, seed=42, shuffle_window=100
    )
    out = run_running_latest(
        spark, ev_dir, str(tmp_path / "ckpt"), sink_table="rl_test"
    )
    # final emission per doc = max-seq emission (update mode re-emits
    # on every improvement; take the last)
    final = (
        out.groupBy("doc_id")
        .agg(F.max(F.struct("seq", "op", "n_tok")).alias("p"))
        .select("doc_id", "p.seq", "p.op", "p.n_tok")
    )
    got = {r["doc_id"]: (r["seq"], r["op"], r["n_tok"]) for r in final.collect()}
    ev = spark.read.option("recursiveFileLookup", "true").parquet(ev_dir)
    batch = (
        ev.groupBy("doc_id")
        .agg(F.max(F.struct("seq", "op", "n_tok")).alias("p"))
        .select("doc_id", "p.seq", "p.op", "p.n_tok")
    )
    want = {
        r["doc_id"]: (
            r["seq"],
            "D" if r["op"] == "D" else "U",
            r["n_tok"],
        )
        for r in batch.collect()
    }
    assert got == want
