"""LakeTable unit tests: create/merge/read/compact/idempotence/evolution."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ml_data_pipeline_spark.cdc.events import CHANGE_SCHEMA, DOC_SCHEMA
from ml_data_pipeline_spark.lake.table import LakeTable
from ml_data_pipeline_spark.lake.schema_evolution import (
    SchemaMismatch,
    compatible_with,
    merge_schemas,
    merge_types,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


E = [
    # seq, op, doc_id, tokens, n_tok, source, ts
    (1, "I", "d1", [1, 2, 3], 3, "web", None),
    (2, "I", "d2", [4, 5], 2, "books", None),
    (3, "U", "d1", [7, 8, 9, 10], 4, "web", None),
    (4, "D", "d2", None, None, None, None),
    (5, "I", "d3", [11], 1, "code", None),
]


def _mk_table(spark, tmp_path, n_buckets=4):
    return LakeTable.create(
        spark, str(tmp_path / "tbl"), DOC_SCHEMA, key_col="doc_id", n_buckets=n_buckets
    )


def test_merge_and_read(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.merge_batch(_events(spark, E), batch_id=0)
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert set(rows) == {"d1", "d3"}
    assert rows["d1"]["tokens"] == [7, 8, 9, 10]
    assert rows["d1"]["n_tok"] == 4
    assert rows["d3"]["tokens"] == [11]


def test_merge_across_batches_out_of_order(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    # Later batch carries an *older* seq for d1 — must lose.
    t.merge_batch(_events(spark, E), batch_id=0)
    late = [(2, "U", "d1", [99], 1, "web", None)]
    t.merge_batch(_events(spark, late), batch_id=1)
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["d1"]["tokens"] == [7, 8, 9, 10]
    # And a late update for a deleted doc must stay deleted (tombstone).
    late2 = [(3, "U", "d2", [42], 1, "web", None)]
    t.merge_batch(_events(spark, late2), batch_id=2)
    assert "d2" not in {r["doc_id"] for r in t.read().collect()}
    # But a *newer* update resurrects it.
    res = [(10, "U", "d2", [42], 1, "web", None)]
    t.merge_batch(_events(spark, res), batch_id=3)
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["d2"]["tokens"] == [42]


def test_idempotent_replay(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    r1 = t.merge_batch(_events(spark, E), batch_id=0)
    before = sorted(map(tuple, t.read().collect()))
    r2 = t.merge_batch(_events(spark, E), batch_id=0)  # replay
    assert not r1["skipped"] and r2["skipped"]
    after = sorted(map(tuple, t.read().collect()))
    assert before == after
    assert t.snapshot.snapshot_id == r1["snapshot_id"]


def test_compaction_preserves_state_and_tombstones(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.merge_batch(_events(spark, E), batch_id=0)
    before = sorted(map(tuple, t.read().collect()))
    assert t.delta_file_count() > 0
    t.compact()
    assert t.delta_file_count() == 0
    assert sorted(map(tuple, t.read().collect())) == before
    # Tombstone for d2 must have survived compaction: an older update
    # arriving after compaction still loses.
    t.merge_batch(_events(spark, [(3, "U", "d2", [1], 1, "web", None)]), batch_id=1)
    assert "d2" not in {r["doc_id"] for r in t.read().collect()}
    # GC the tombstone once the replay watermark passed it.
    t.compact(gc_before_seq=100)
    raw = t.scan_files()
    assert raw.where(F.col("_deleted")).count() == 0


def test_cow_mode_merges_eagerly(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.merge_batch(_events(spark, E), batch_id=0, compact_touched=True)
    assert t.delta_file_count() == 0
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["d1"]["tokens"] == [7, 8, 9, 10]


def test_salted_reduce_matches_plain(spark, tmp_path):
    t1 = _mk_table(spark, tmp_path / "a")
    t2 = _mk_table(spark, tmp_path / "b")
    hot = [(i, "U", "hot", [i], 1, "web", None) for i in range(200)] + list(E)
    t1.merge_batch(_events(spark, hot), batch_id=0)
    t2.merge_batch(_events(spark, hot), batch_id=0, salt=8)
    a = sorted(map(tuple, t1.read().collect()))
    b = sorted(map(tuple, t2.read().collect()))
    assert a == b
    hot_row = {r["doc_id"]: r for r in t1.read().collect()}["hot"]
    assert hot_row["tokens"] == [199]


def test_bucket_pruned_read(spark, tmp_path):
    t = _mk_table(spark, tmp_path, n_buckets=8)
    t.merge_batch(_events(spark, E), batch_id=0)
    full = t.read().collect()
    got = []
    for b in range(8):
        got.extend(t.read(buckets=[b]).collect())
    assert sorted(map(tuple, got)) == sorted(map(tuple, full))


# ---------------------------------------------------------------- evolution


def test_schema_evolution_add_column(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.merge_batch(_events(spark, E), batch_id=0)
    v2 = T.StructType(CHANGE_SCHEMA.fields + [T.StructField("lang", T.StringType())])
    ev = spark.createDataFrame(
        [(10, "U", "d1", [1], 1, "web", None, "en")], v2
    )
    res = t.merge_batch(ev, batch_id=1)
    assert res["schema_evolved"]
    assert "lang" in t.schema.fieldNames()
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["d1"]["lang"] == "en"
    assert rows["d3"]["lang"] is None  # pre-evolution rows read as null


def test_schema_evolution_widen_n_tok(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.merge_batch(_events(spark, E), batch_id=0)
    v3 = T.StructType(
        [
            T.StructField("seq", T.LongType()),
            T.StructField("op", T.StringType()),
            T.StructField("doc_id", T.StringType()),
            T.StructField("tokens", T.ArrayType(T.IntegerType())),
            T.StructField("n_tok", T.LongType()),  # widened int32→int64
            T.StructField("source", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    ev = spark.createDataFrame([(11, "U", "d3", [9, 9], 2, "code", None)], v3)
    res = t.merge_batch(ev, batch_id=1)
    assert res["schema_evolved"]
    assert isinstance(t.schema["n_tok"].dataType, T.LongType)
    rows = {r["doc_id"]: r for r in t.read().collect()}
    assert rows["d3"]["n_tok"] == 2 and rows["d1"]["n_tok"] == 4


def test_lattice():
    assert compatible_with(T.IntegerType(), T.LongType())
    assert compatible_with(T.LongType(), T.IntegerType())  # numeric↔numeric
    assert compatible_with(T.NullType(), T.StringType())
    assert compatible_with(
        T.ArrayType(T.IntegerType()), T.ArrayType(T.DoubleType())
    )
    assert not compatible_with(T.StringType(), T.IntegerType())
    assert merge_types(T.IntegerType(), T.LongType()) == T.LongType()
    assert merge_types(T.LongType(), T.IntegerType()) == T.LongType()  # no narrow
    assert merge_types(T.IntegerType(), T.FloatType()) == T.DoubleType()
    with pytest.raises(SchemaMismatch):
        merge_types(T.StringType(), T.ArrayType(T.IntegerType()))
    m = merge_schemas(
        T.StructType([T.StructField("a", T.IntegerType())]),
        T.StructType(
            [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
        ),
    )
    assert [f.name for f in m.fields] == ["a", "b"]
    assert isinstance(m["a"].dataType, T.LongType) and m["b"].nullable


def test_time_travel_and_vacuum(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    t.merge_batch(_events(spark, E), batch_id=0)
    snap1 = t.snapshot.snapshot_id
    t.merge_batch(_events(spark, [(10, "U", "d1", [42], 1, "web", None)]), batch_id=1)
    # time travel: snapshot 1 still shows the pre-update tokens
    old = {r["doc_id"]: r for r in t.read(as_of_snapshot=snap1).collect()}
    new = {r["doc_id"]: r for r in t.read().collect()}
    assert old["d1"]["tokens"] == [7, 8, 9, 10]
    assert new["d1"]["tokens"] == [42]
    # compact then vacuum: old files gone, old snapshots expired,
    # current state intact
    t.compact()
    res = t.vacuum(keep_snapshots=1)
    assert res["removed_files"] > 0 and res["removed_snapshots"] > 0
    after = {r["doc_id"]: r for r in t.read().collect()}
    assert after == new
    with pytest.raises(FileNotFoundError):
        t.read(as_of_snapshot=snap1).collect()
    # bloom sidecars are GC'd with their data files: none orphaned
    live_parquet = set()
    for dirpath, _dirs, files in os.walk(t.data_dir):
        for name in files:
            full = os.path.join(dirpath, name)
            if name.endswith(".parquet"):
                live_parquet.add(full)
            elif name.endswith(".bloom"):
                assert full[: -len(".bloom")] in live_parquet or os.path.exists(
                    full[: -len(".bloom")]
                ), f"orphaned bloom sidecar {full}"


def test_quarantine_bad_records(spark, tmp_path):
    t = _mk_table(spark, tmp_path)
    bad = [
        (100, "I", "ok1", [1, 2], 2, "web", None),
        (101, "X", "badop", [1], 1, "web", None),        # bad op
        (102, "I", None, [1], 1, "web", None),           # null key
        (103, "I", "mismatch", [1, 2, 3], 99, "web", None),  # n_tok wrong
        (104, "I", "ok2", [5], 1, "web", None),
    ]
    loose = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in CHANGE_SCHEMA.fields]
    )
    res = t.merge_batch(spark.createDataFrame(bad, loose), batch_id=0)
    assert res["events_in"] == 5 and res["events_invalid"] == 3
    live = {r["doc_id"] for r in t.read().collect()}
    assert live == {"ok1", "ok2"}
    q = spark.read.parquet(str(tmp_path / "tbl" / "quarantine"))
    reasons = {r["_reason"] for r in q.collect()}
    assert reasons == {"bad_op", "null_key", "n_tok_mismatch"}
    assert q.count() == 3
    # clean batch: no quarantine write, counters still observed
    res2 = t.merge_batch(
        _events(spark, [(200, "U", "ok1", [9], 1, "web", None)]), batch_id=1
    )
    assert res2["events_in"] == 1 and res2["events_invalid"] == 0


def test_driver_side_bucket_parity(spark):
    """bloom.bucket_of / spark_xxhash64 must be bit-identical to
    F.xxhash64 + pmod for string AND bigint keys (1k random each) —
    the precondition for lookup() computing the bucket driver-side."""
    import random
    import string as _string

    from ml_data_pipeline_spark.lake.bloom import bucket_of, spark_xxhash64

    rng = random.Random(123)
    strs = [
        "".join(
            rng.choices(_string.ascii_letters + _string.digits + "é漢_-", k=rng.randint(0, 64))
        )
        for _ in range(1000)
    ]
    got = spark.createDataFrame([(s,) for s in strs], "k string").select(
        "k",
        F.xxhash64("k").alias("h"),
        F.pmod(F.xxhash64("k"), F.lit(16)).cast("int").alias("b"),
    ).collect()
    for r in got:
        assert spark_xxhash64(r["k"]) == r["h"], r["k"]
        assert bucket_of(r["k"], 16) == r["b"], r["k"]
    longs = [rng.randint(-(2**62), 2**62) for _ in range(1000)]
    got = spark.createDataFrame([(v,) for v in longs], "k long").select(
        "k", F.xxhash64("k").alias("h")
    ).collect()
    for r in got:
        assert spark_xxhash64(r["k"]) == r["h"], r["k"]


def test_lookup_correct_without_blooms(spark, tmp_path, monkeypatch):
    """LAKE_SKIP_BLOOM (the bench A/B switch) must only widen the
    lookup's file set, never change its answer."""
    monkeypatch.setenv("LAKE_SKIP_BLOOM", "1")
    t = LakeTable.create(
        spark, str(tmp_path / "tbl"), DOC_SCHEMA, key_col="doc_id", n_buckets=2
    )
    rows = [(i, "I", f"d{i}", [i], 1, "web", None) for i in range(10)]
    t.merge_batch(_events(spark, rows), batch_id=0)
    snap = t.refresh()
    assert all(not f.bloom_sidecar and not f.key_bloom for f in snap.files)
    got = t.lookup("d3").collect()
    assert len(got) == 1 and got[0]["tokens"] == [3]
    assert t.lookup("absent").count() == 0
    # lookup_files falls back to the whole bucket (no pruning, sound)
    from ml_data_pipeline_spark.lake.bloom import bucket_of

    b = bucket_of("d3", 2)
    assert {f.path for f in t.lookup_files("d3")} == {
        f.path for f in snap.files if f.bucket == b
    }


def test_point_lookup_bloom_prunes_files(spark, tmp_path):
    """On a bucket holding many delta files, a point lookup must read
    only the file(s) that can contain the key (bloom pruning), and the
    pruned result must still be exact."""
    t = LakeTable.create(
        spark, str(tmp_path / "tbl"), DOC_SCHEMA, key_col="doc_id", n_buckets=1
    )
    # 8 batches of disjoint keys → 8 delta files in the single bucket
    for b in range(8):
        rows = [
            (b * 100 + i, "I", f"d{b}_{i}", [b, i], 2, "web", None)
            for i in range(20)
        ]
        t.merge_batch(_events(spark, rows), batch_id=b)
    snap = t.refresh()
    assert len(snap.files) == 8
    # blooms live in sidecars (snapshot JSON stays O(files)): every
    # file is flagged, its sidecar exists, and the handle can read it
    assert all(f.bloom_sidecar and not f.key_bloom for f in snap.files)
    assert all(
        os.path.exists(os.path.join(t.root, f.path + ".bloom"))
        for f in snap.files
    )
    assert all(t._file_bloom(f) for f in snap.files)
    cand = t.lookup_files("d3_7")
    assert len(cand) <= 2, [f.path for f in cand]  # ~1 + rare false positives
    got = t.lookup("d3_7").collect()
    assert len(got) == 1 and got[0]["tokens"] == [3, 7]
    # absent key: bloom usually prunes everything; result always empty
    assert t.lookup("nope").count() == 0
    # update + delete land in later files; lookup must still resolve
    t.merge_batch(_events(spark, [(900, "U", "d3_7", [9, 9], 2, "web", None)]), batch_id=8)
    assert t.lookup("d3_7").collect()[0]["tokens"] == [9, 9]
    t.merge_batch(_events(spark, [(901, "D", "d3_7", None, None, None, None)]), batch_id=9)
    assert t.lookup("d3_7").count() == 0
