"""Two OS processes replay into the SAME table concurrently.

The real multi-writer proof for the optimistic commit protocol: each
writer is its own Spark driver (own JVM, own checkpoint, own
stream_id) tailing a disjoint half of one global change stream into
one table. Commit races are resolved by the atomic snapshot-file
claim; losers rebase. The final state must equal the independent
pandas oracle over the FULL stream — nothing lost, nothing doubled.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

from ml_data_pipeline_spark.cdc.events import generate_change_stream
from ml_data_pipeline_spark.cdc.oracle import (
    assert_state_equal,
    expected_state,
    load_events_pandas,
)
from ml_data_pipeline_spark.lake.table import LakeTable

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CLI = os.path.join(REPO, "ml_data_pipeline_spark", "cdc", "__main__.py")


def _replay_proc(table, events, ckpt, stream_id):
    return subprocess.Popen(
        [
            sys.executable, CLI, "--cores", "4", "replay",
            "--table", table, "--events", events,
            "--checkpoint", ckpt, "--stream-id", stream_id,
            "--max-files-per-trigger", "2",
        ],
        stdout=subprocess.PIPE,
        stderr=subprocess.DEVNULL,
        text=True,
        cwd=REPO,
    )


def test_two_process_writers_converge(spark, tmp_path):
    ev_dir = str(tmp_path / "events")
    generate_change_stream(
        spark, ev_dir, 150, 1600, n_chunks=4, seed=21, shuffle_window=200
    )
    # split the stream's chunks into two disjoint halves
    half_a = str(tmp_path / "ev_a")
    half_b = str(tmp_path / "ev_b")
    os.makedirs(half_a)
    os.makedirs(half_b)
    chunks = sorted(
        d for d in os.listdir(ev_dir) if d.startswith("chunk=")
    )
    assert len(chunks) == 4
    for i, c in enumerate(chunks):
        shutil.copytree(
            os.path.join(ev_dir, c),
            os.path.join(half_a if i % 2 == 0 else half_b, c),
        )

    table_root = str(tmp_path / "tbl")
    LakeTable.create(
        spark,
        table_root,
        spark.read.option("recursiveFileLookup", "true")
        .parquet(ev_dir)
        .select("doc_id", "tokens", "n_tok", "source")
        .schema,
        key_col="doc_id",
        n_buckets=4,
    )

    p_a = _replay_proc(table_root, half_a, str(tmp_path / "ck_a"), "writer-a")
    p_b = _replay_proc(table_root, half_b, str(tmp_path / "ck_b"), "writer-b")
    out_a, _ = p_a.communicate(timeout=600)
    out_b, _ = p_b.communicate(timeout=600)
    assert p_a.returncode == 0, out_a
    assert p_b.returncode == 0, out_b

    t = LakeTable.load(spark, table_root)
    # both streams' watermarks committed
    assert "writer-a" in t.snapshot.watermarks
    assert "writer-b" in t.snapshot.watermarks
    # final state == oracle over the FULL stream (max-seq is global,
    # so the interleaving of writers cannot change the winner per key)
    actual = t.read().toPandas()
    want = expected_state(load_events_pandas(ev_dir))
    assert_state_equal(actual, want)
