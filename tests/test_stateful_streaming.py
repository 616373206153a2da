"""applyInPandasWithState running-latest operator vs the batch reduce."""

from __future__ import annotations

from pyspark.sql import functions as F

from ml_data_pipeline_spark.cdc.events import generate_change_stream
from ml_data_pipeline_spark.streaming.stateful import (
    ROCKSDB_PROVIDER,
    run_running_latest,
)


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


def test_running_latest_rocksdb_state_store(spark, tmp_path):
    """Same operator on the RocksDB state store (the 10^9-live-keys
    sizing: state on local disk, not executor heap) at a key count
    large enough to exercise real store traffic — result must be
    identical to the batch max-seq reduce."""
    ev_dir = str(tmp_path / "events")
    generate_change_stream(
        spark, ev_dir, 5000, 20000, n_chunks=4, seed=11, shuffle_window=500
    )
    out = run_running_latest(
        spark,
        ev_dir,
        str(tmp_path / "ckpt-rocks"),
        sink_table="rl_rocks",
        state_store_provider=ROCKSDB_PROVIDER,
    )
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
        r["doc_id"]: (r["seq"], "D" if r["op"] == "D" else "U", r["n_tok"])
        for r in batch.collect()
    }
    assert got == want


def test_update_has_no_per_row_python_loop():
    """_update must reduce each Arrow batch vectorized (idxmax), not
    iterate event rows — pin that no for-loop targets zipped/iterated
    row values (the batch-level `for pdf in pdfs` is fine)."""
    import ast
    import inspect
    import textwrap

    from ml_data_pipeline_spark.streaming import stateful

    tree = ast.parse(textwrap.dedent(inspect.getsource(stateful._update)))
    for node in ast.walk(tree):
        if isinstance(node, ast.For):
            it = node.iter
            assert not (
                isinstance(it, ast.Call)
                and isinstance(it.func, ast.Name)
                and it.func.id == "zip"
            ), "per-row zip loop reintroduced in stateful._update"
