"""End-to-end CDC replay correctness vs the single-threaded oracle.

The north-rule correctness gate (SURVEY.md §5.2): synthesize a change
stream, replay it through the engine (batch and Structured Streaming
paths), and assert exact token-array equality per doc_id against an
independent pandas reducer — including out-of-order delivery,
duplicate (at-least-once) delivery, kill-and-resume from checkpoint,
and hot-key skew.
"""

from __future__ import annotations

import os

import pytest

from ml_data_pipeline_spark.cdc.apply import (
    apply_batch,
    create_docs_table,
    read_lineage,
    read_metrics,
)
from ml_data_pipeline_spark.cdc.events import generate_change_stream
from ml_data_pipeline_spark.cdc.oracle import (
    assert_state_equal,
    expected_state,
    load_events_pandas,
)
from ml_data_pipeline_spark.cdc.stream import run_replay
from ml_data_pipeline_spark.lake.table import LakeTable

N_DOCS, N_EVENTS = 300, 3000


def _gen(spark, tmp_path, **kw):
    ev_dir = str(tmp_path / "events")
    generate_change_stream(
        spark, ev_dir, N_DOCS, N_EVENTS, n_chunks=4, seed=42, **kw
    )
    return ev_dir


def _check(table, ev_dir):
    actual = table.read().toPandas()
    expected = expected_state(load_events_pandas(ev_dir))
    assert_state_equal(actual, expected)


def test_batch_replay_matches_oracle(spark, tmp_path):
    ev_dir = _gen(spark, tmp_path)
    t = create_docs_table(spark, str(tmp_path / "tbl"), n_buckets=8)
    ev = spark.read.parquet(ev_dir)
    apply_batch(t, ev, batch_id=0)
    _check(t, ev_dir)


def test_streaming_replay_matches_oracle(spark, tmp_path):
    ev_dir = _gen(spark, tmp_path, shuffle_window=200, dup_fraction=0.05)
    t = create_docs_table(spark, str(tmp_path / "tbl"), n_buckets=8)
    stats = run_replay(
        spark,
        t.root,
        ev_dir,
        str(tmp_path / "ckpt"),
        max_files_per_trigger=3,
        # opt into the input_file_name() fallback scan: this test
        # asserts lineage rows carry input file names
        collect_input_lineage=True,
    )
    assert stats["batches"] >= 2  # really micro-batched
    _check(t, ev_dir)
    # metrics + lineage tables populated, one metrics row per batch
    m = read_metrics(t).toPandas()
    assert len(m) == stats["batches"] + stats["skipped"]
    li = read_lineage(t).toPandas()
    assert li["rows"].sum() > 0 and li["input_file"].notna().any()


def test_kill_and_resume_from_checkpoint(spark, tmp_path):
    ev_dir = _gen(spark, tmp_path, dup_fraction=0.03)
    t = create_docs_table(spark, str(tmp_path / "tbl"), n_buckets=8)
    ckpt = str(tmp_path / "ckpt")
    # Crash after 2 batches…
    run_replay(
        spark, t.root, ev_dir, ckpt, max_files_per_trigger=2, stop_after_batches=2
    )
    partial = LakeTable.load(spark, t.root).read().count()
    # …then resume with the same checkpoint. The killed batch is
    # re-delivered with the same batch_id → watermark no-op or clean
    # re-apply; final state must equal a clean single run.
    stats = run_replay(spark, t.root, ev_dir, ckpt, max_files_per_trigger=2)
    assert partial >= 0 and (stats["batches"] + stats["skipped"]) >= 1
    _check(t, ev_dir)


def test_hot_key_skew_with_salt(spark, tmp_path):
    ev_dir = _gen(spark, tmp_path, hot_key_fraction=0.10)
    t = create_docs_table(spark, str(tmp_path / "tbl"), n_buckets=8)
    run_replay(
        spark, t.root, ev_dir, str(tmp_path / "ckpt"), salt=16,
        max_files_per_trigger=4,
    )
    _check(t, ev_dir)


def test_replay_with_periodic_compaction(spark, tmp_path):
    ev_dir = _gen(spark, tmp_path)
    t = create_docs_table(spark, str(tmp_path / "tbl"), n_buckets=8)
    run_replay(
        spark, t.root, ev_dir, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, compact_every=8,
    )
    _check(t, ev_dir)


def test_double_apply_batch_is_idempotent(spark, tmp_path):
    ev_dir = _gen(spark, tmp_path)
    t = create_docs_table(spark, str(tmp_path / "tbl"), n_buckets=8)
    ev = spark.read.parquet(ev_dir)
    apply_batch(t, ev, batch_id=0)
    snap_before = t.snapshot.snapshot_id
    res = apply_batch(t, ev, batch_id=0)
    assert res["skipped"] and t.snapshot.snapshot_id == snap_before
    _check(t, ev_dir)


def test_advisory_tables_bounded_files_over_many_batches(spark, tmp_path):
    """50 micro-batches must NOT leave 50 one-row parquet files in the
    advisory metrics/lineage tables: the driver-side append folds them
    at ADVISORY_FOLD_AT, keeping the file count bounded no matter the
    replay length, with no rows lost."""
    from ml_data_pipeline_spark.cdc.apply import ADVISORY_FOLD_AT
    from ml_data_pipeline_spark.cdc.events import CHANGE_SCHEMA

    t = create_docs_table(spark, str(tmp_path / "tbl"), n_buckets=2)
    for b in range(50):
        rows = [(b * 10 + i, "I", f"d{b}_{i}", [b, i], 2, "web", None)
                for i in range(3)]
        apply_batch(t, spark.createDataFrame(rows, CHANGE_SCHEMA), batch_id=b)
    for sub in ("metrics", "lineage"):
        files = [
            f
            for f in os.listdir(os.path.join(t.root, sub))
            if f.endswith(".parquet")
        ]
        assert len(files) < ADVISORY_FOLD_AT, (sub, len(files))
    m = read_metrics(t)
    assert m.count() == 50
    assert m.where("skipped").count() == 0
    assert read_lineage(t).select("batch_id").distinct().count() == 50


def test_advisory_fold_race_never_raises(tmp_path, monkeypatch):
    """Two processes sharing an advisory dir can race the fold; the
    loser hitting a file its rival already claimed (removed) must
    swallow the error — advisory work must never abort a streaming
    query after the data commit succeeded — and must not publish a
    double-counting fold."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ml_data_pipeline_spark.cdc.apply import (
        ADVISORY_FOLD_AT,
        _advisory_append,
    )

    d = str(tmp_path / "metrics")
    os.makedirs(d)
    batch = pa.table({"x": [1]})
    for i in range(ADVISORY_FOLD_AT - 1):
        pq.write_table(batch, os.path.join(d, f"part-{i:04d}.parquet"))

    real_read = pq.read_table
    calls = {"n": 0}

    def flaky_read(path, **kw):
        calls["n"] += 1
        if calls["n"] == 3:  # rival claimed this part mid-fold
            raise FileNotFoundError(path)
        return real_read(path, **kw)

    monkeypatch.setattr(pq, "read_table", flaky_read)
    _advisory_append(d, batch)  # triggers the fold; must not raise
    files = os.listdir(d)
    assert not any(f.endswith(".tmp") for f in files)  # tmp cleaned up
    assert not any(f.startswith("fold-") for f in files)  # no fold published
    # parts survive minus none (abort happened before any removal)
    assert sum(f.endswith(".parquet") for f in files) == ADVISORY_FOLD_AT

    # and the same failure during REMOVAL also aborts unpublished
    monkeypatch.setattr(pq, "read_table", real_read)
    removed = {"n": 0}
    real_remove = os.remove

    def flaky_remove(path):
        removed["n"] += 1
        if removed["n"] == 2:
            raise FileNotFoundError(path)
        return real_remove(path)

    monkeypatch.setattr(os, "remove", flaky_remove)
    _advisory_append(d, batch)
    monkeypatch.setattr(os, "remove", real_remove)
    files = os.listdir(d)
    assert not any(f.startswith("fold-") for f in files)
    assert not any(f.endswith(".tmp") for f in files)


def test_replay_with_byte_denominated_batches(spark, tmp_path):
    """maxBytesPerTrigger (the memory-budget knob): batch admission by
    input bytes instead of file count — final state identical, and the
    tiny budget forces a multi-batch replay."""
    ev_dir = _gen(spark, tmp_path, shuffle_window=200)
    t = create_docs_table(spark, str(tmp_path / "tbl"), n_buckets=4)
    stats = run_replay(
        spark,
        t.root,
        ev_dir,
        str(tmp_path / "ckpt"),
        max_bytes_per_trigger=30_000,
    )
    assert stats["batches"] > 1
    _check(t, ev_dir)
