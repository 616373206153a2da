"""LakeTable — a Spark-native snapshot-isolated upsert table.

This is the engine's sink: the role Iceberg plays in the north rule,
implemented from scratch on plain Parquet + JSON snapshot metadata
because no lake-format jar ships in this sandbox. The commit contract
is the same as Iceberg's:

* **Atomic snapshot commit** — a snapshot JSON lists the exact data
  files that make up the table version; the current version pointer is
  swapped with an atomic ``os.replace``. Readers resolve the pointer
  once and see a consistent file set. (Reference analog: the
  ``Sink::flush`` finalization contract, /root/reference/ml-data/
  ml-data-core/src/sink.rs:18 — flush = commit.)
* **Merge-on-read CDC upserts** — ``merge_batch`` appends the batch's
  per-key-resolved rows as *delta* files (append-only: this is what a
  high-throughput CDC sink must do at 10^10-event scale; copy-on-write
  per batch would rewrite the table continuously). The read path
  reduces base+delta by max ``_seq`` per key; ``compact()`` folds
  deltas into base files.
* **Exactly-once** — each snapshot records a per-stream batch-id high
  watermark; re-delivered micro-batches (streaming restart replays the
  last uncommitted batch) are detected and skipped, so apply+commit is
  idempotent. (Reference analog: resumable sources via ``reset``/
  ``seek``, ml-data-core/src/source.rs:43, ml-data-readers/src/
  data_source.rs:17-29.)
* **Schema evolution** — incoming batches may add columns or widen
  types; ``merge_schemas`` (the reference's compatibility lattice,
  ml-data-core/src/schema.rs:206-253) evolves the snapshot schema;
  old files are *not* rewritten — the scan casts every file group to
  the current schema (Iceberg-style lazy evolution).

Scale design: rows are hash-bucketed by the key column
(``pmod(xxhash64(key), n_buckets)``); every file belongs to exactly
one bucket. Merges only touch the buckets present in the batch;
compaction is per-bucket and embarrassingly parallel; a point lookup
prunes to one bucket. At 100 TB you raise ``n_buckets`` (e.g. 4096)
so per-bucket compactions stay executor-sized; nothing else changes.

Tombstones: deletes are stored as ``_deleted=true`` rows carrying
their ``_seq``. They must survive compaction (a late lower-seq update
must still lose to the delete); ``compact(gc_before_seq=...)`` drops
tombstones older than a replay watermark.

Concurrency: commits use optimistic concurrency (Iceberg-style). The
commit point is the EXCLUSIVE creation (``open(…, 'x')``) of
``snapshot-<id>.json`` — two writers racing to commit the same next
id produce exactly one winner; the loser gets ``CommitConflict``,
refreshes, REBASES its already-written delta files onto the winner's
snapshot (files are immutable and schema-fingerprinted, so a rebase
is a metadata-only retry) and commits again. The version-hint file
is an advisory fast-path cache; ``refresh()`` probes past it for
snapshots whose hint update didn't land (creation is the commit, the
hint is not). On an object store, swap the exclusive create for a
catalog CAS — the protocol is unchanged.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass, field
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from ml_data_pipeline_spark.lake.schema_evolution import (
    SchemaMismatch,
    assert_lake_payload_type,
    merge_schemas,
)

SEQ_COL = "_seq"
DELETED_COL = "_deleted"
HIDDEN_COLS = (SEQ_COL, DELETED_COL)
PS_PREFIX = "_ps_"  # per-column patch-seq columns (patch-enabled tables)
PATCH_PROP = "patch.enabled"
CARRIER_SEQ = -(2**62)  # _seq of patch-carrier rows: loses to any full event


class CommitConflict(Exception):
    """Another writer committed this snapshot id first (optimistic
    concurrency): refresh, rebase, retry."""


@dataclass
class FileEntry:
    path: str  # relative to table root
    bucket: int
    kind: str  # "base" | "delta"
    rows: int
    schema_fp: str  # fingerprint key into Snapshot.schemas
    bytes: int = 0  # on-disk size (drives size-tiered compaction)
    # Key-membership bloom (lake.bloom) built executor-side at write
    # time; lets a point lookup skip files that provably lack the key.
    # Since round 4 the bloom lives in a SIDECAR file next to the data
    # file (``<path>.bloom``, flagged by ``bloom_sidecar``): inlining
    # it in snapshot JSON made every commit rewrite — and every
    # refresh parse — O(files × bloom_bytes) of base64 (at 4096
    # buckets that is a 100s-of-MB snapshot, a real 100 TB cliff),
    # where only point lookups ever need bloom bytes, and only for
    # one bucket's files. ``key_bloom`` (inline) is still read for
    # pre-round-4 snapshots. Absent both → never pruned (sound).
    key_bloom: str | None = None
    bloom_sidecar: bool = False

    def to_json(self) -> dict:
        d = {
            "path": self.path,
            "bucket": self.bucket,
            "kind": self.kind,
            "rows": self.rows,
            "schema_fp": self.schema_fp,
            "bytes": self.bytes,
        }
        if self.key_bloom:
            d["key_bloom"] = self.key_bloom
        if self.bloom_sidecar:
            d["bloom_sidecar"] = True
        return d

    @staticmethod
    def from_json(d: dict) -> "FileEntry":
        return FileEntry(
            d["path"],
            d["bucket"],
            d["kind"],
            d["rows"],
            d["schema_fp"],
            d.get("bytes", 0),
            d.get("key_bloom"),
            d.get("bloom_sidecar", False),
        )


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    schema_json: dict  # current USER schema (no hidden columns)
    key_col: str
    n_buckets: int
    files: list[FileEntry] = field(default_factory=list)
    schemas: dict[str, dict] = field(default_factory=dict)  # fp -> storage schema json
    watermarks: dict[str, int] = field(default_factory=dict)  # stream_id -> batch_id
    summary: dict = field(default_factory=dict)
    # Table properties: parquet writer knobs applied to every data-file
    # write — e.g. "parquet.block.size" (row-group size),
    # "parquet.bloom.filter.enabled#<col>", "parquet.enable.dictionary"
    # (reference analog: the parquet writer's properties,
    # ml-data-readers/src/parquet/writer.rs:37-56).
    properties: dict = field(default_factory=dict)

    @property
    def schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schema_json)

    @property
    def patch_enabled(self) -> bool:
        return self.properties.get(PATCH_PROP) == "true"

    def payload_cols(self) -> list[str]:
        return [f.name for f in self.schema.fields if f.name != self.key_col]

    def storage_schema(self) -> T.StructType:
        fields = list(self.schema.fields) + [
            T.StructField(SEQ_COL, T.LongType(), False),
            T.StructField(DELETED_COL, T.BooleanType(), False),
        ]
        if self.patch_enabled:
            # One patch-seq per payload column: the LSN of the patch
            # event whose value currently overlays the base row's
            # (null = the column comes from the base full event).
            fields += [
                T.StructField(PS_PREFIX + c, T.LongType(), True)
                for c in self.payload_cols()
            ]
        return T.StructType(fields)

    def to_json(self) -> dict:
        return {
            "snapshot_id": self.snapshot_id,
            "parent_id": self.parent_id,
            "schema": self.schema_json,
            "key_col": self.key_col,
            "n_buckets": self.n_buckets,
            "files": [f.to_json() for f in self.files],
            "schemas": self.schemas,
            "watermarks": self.watermarks,
            "summary": self.summary,
            "properties": self.properties,
        }

    @staticmethod
    def from_json(d: dict) -> "Snapshot":
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d.get("parent_id"),
            schema_json=d["schema"],
            key_col=d["key_col"],
            n_buckets=d["n_buckets"],
            files=[FileEntry.from_json(f) for f in d.get("files", [])],
            schemas=d.get("schemas", {}),
            watermarks=d.get("watermarks", {}),
            summary=d.get("summary", {}),
            properties=d.get("properties", {}),
        )


def _schema_fp(schema: T.StructType) -> str:
    import hashlib

    return hashlib.sha1(
        json.dumps(schema.jsonValue(), sort_keys=True).encode()
    ).hexdigest()[:12]


class LakeTable:
    """Snapshot-isolated, bucketed, merge-on-read upsert table."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = os.path.abspath(root)
        self._snapshot: Snapshot | None = None
        # Lazily-read sidecar blooms, keyed by relative data-file path.
        # Data files are immutable, so entries never invalidate; the
        # cache holds only buckets this handle actually probed.
        self._bloom_cache: dict[str, str | None] = {}

    # ------------------------------------------------------------- lifecycle

    @property
    def meta_dir(self) -> str:
        return os.path.join(self.root, "_meta")

    @property
    def data_dir(self) -> str:
        return os.path.join(self.root, "data")

    @staticmethod
    def exists(root: str) -> bool:
        return os.path.exists(os.path.join(root, "_meta", "version-hint.txt"))

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_col: str,
        n_buckets: int = 16,
        properties: dict | None = None,
    ) -> "LakeTable":
        if cls.exists(root):
            raise ValueError(f"table already exists at {root}")
        if key_col not in schema.fieldNames():
            raise SchemaMismatch(f"key column {key_col!r} not in schema")
        assert_lake_payload_type(schema)
        t = cls(spark, root)
        os.makedirs(t.meta_dir, exist_ok=True)
        os.makedirs(t.data_dir, exist_ok=True)
        snap = Snapshot(
            snapshot_id=0,
            parent_id=None,
            schema_json=schema.jsonValue(),
            key_col=key_col,
            n_buckets=n_buckets,
            properties=dict(properties or {}),
        )
        t._write_snapshot(snap)
        return t

    @classmethod
    def load(cls, spark: SparkSession, root: str) -> "LakeTable":
        t = cls(spark, root)
        t.refresh()
        return t

    def refresh(self) -> Snapshot:
        hint = os.path.join(self.meta_dir, "version-hint.txt")
        with open(hint) as f:
            sid = int(f.read().strip())
        # The hint is advisory: snapshot CREATION is the commit point,
        # so probe past the hint for commits whose hint update didn't
        # land (writer crashed between create and hint swap).
        while os.path.exists(
            os.path.join(self.meta_dir, f"snapshot-{sid + 1}.json")
        ):
            sid += 1
        try:
            with open(
                os.path.join(self.meta_dir, f"snapshot-{sid}.json")
            ) as f:
                self._snapshot = Snapshot.from_json(json.load(f))
        except FileNotFoundError:
            # A writer stalled between snapshot create and hint swap
            # can regress the hint to an id vacuum has since expired;
            # the forward probe then stops at the retention gap. Fall
            # back to the max existing snapshot file and repair the
            # hint so subsequent refreshes take the fast path again.
            live = [
                int(n[len("snapshot-") : -len(".json")])
                for n in os.listdir(self.meta_dir)
                if n.startswith("snapshot-") and n.endswith(".json")
            ]
            if not live:
                raise
            sid = max(live)
            with open(
                os.path.join(self.meta_dir, f"snapshot-{sid}.json")
            ) as f:
                self._snapshot = Snapshot.from_json(json.load(f))
            self._write_hint(sid)
        return self._snapshot

    def _write_hint(self, snapshot_id: int) -> None:
        hint_tmp = os.path.join(self.meta_dir, f".hint-{uuid.uuid4().hex}.tmp")
        with open(hint_tmp, "w") as f:
            f.write(str(snapshot_id))
            f.flush()
            os.fsync(f.fileno())
        os.replace(hint_tmp, os.path.join(self.meta_dir, "version-hint.txt"))

    @property
    def snapshot(self) -> Snapshot:
        if self._snapshot is None:
            self.refresh()
        return self._snapshot

    @property
    def schema(self) -> T.StructType:
        return self.snapshot.schema

    @property
    def key_col(self) -> str:
        return self.snapshot.key_col

    def history(self) -> list[Snapshot]:
        out = []
        for name in sorted(os.listdir(self.meta_dir)):
            if name.startswith("snapshot-") and name.endswith(".json"):
                with open(os.path.join(self.meta_dir, name)) as f:
                    out.append(Snapshot.from_json(json.load(f)))
        return sorted(out, key=lambda s: s.snapshot_id)

    # --------------------------------------------------------------- commit

    def _write_snapshot(self, snap: Snapshot) -> None:
        """Commit ``snap``. The exclusive create of the snapshot file
        is THE commit point (optimistic concurrency: exactly one
        writer can create ``snapshot-<id>.json``); the version-hint
        swap after it is an advisory fast-path for ``refresh``.
        Raises ``CommitConflict`` if another writer committed this id.
        """
        path = os.path.join(self.meta_dir, f"snapshot-{snap.snapshot_id}.json")
        tmp = os.path.join(self.meta_dir, f".snap-{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            json.dump(snap.to_json(), f)
            f.flush()
            os.fsync(f.fileno())
        try:
            # Atomic claim of the id with content already complete: a
            # crash can orphan the .tmp (harmless, ignored by readers)
            # but can never publish a torn snapshot.
            os.link(tmp, path)
        except FileExistsError:
            os.unlink(tmp)
            raise CommitConflict(
                f"snapshot {snap.snapshot_id} already committed by another "
                f"writer"
            ) from None
        os.unlink(tmp)
        # Best-effort guard against REGRESSING the hint (a stalled
        # writer publishing late): skip the swap when the hint already
        # points at or past this commit. Still racy by design — the
        # hint is advisory and refresh() self-heals a bad hint.
        try:
            with open(os.path.join(self.meta_dir, "version-hint.txt")) as f:
                if int(f.read().strip()) >= snap.snapshot_id:
                    self._snapshot = snap
                    return
        except (OSError, ValueError):
            pass
        self._write_hint(snap.snapshot_id)
        self._snapshot = snap

    # ---------------------------------------------------------------- write

    def bucket_expr(self, key=None, snap: Snapshot | None = None):
        snap = snap or self.snapshot
        key = F.col(snap.key_col) if key is None else key
        return F.pmod(F.xxhash64(key), F.lit(snap.n_buckets)).cast("int")

    def _write_files(
        self, df: DataFrame, kind: str, snap: Snapshot | None = None
    ) -> list[FileEntry]:
        """Write rows (storage schema) as bucket-partitioned parquet files.

        The bucket is recomputable from the key, so it is stored only in
        metadata (directory name), not as a data column. ``snap`` is the
        (possibly uncommitted, in-flight) snapshot whose schema and
        properties govern the write — passed explicitly so a failed
        write never leaves ``self._snapshot`` pointing at phantom state.
        """
        snap = snap or self.snapshot
        storage = snap.storage_schema()
        df = df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in storage.fields]
        )
        fp = _schema_fp(storage)
        write_id = uuid.uuid4().hex
        out_dir = os.path.join(self.data_dir, write_id)
        key_col = snap.key_col
        props = snap.properties
        # Parquet writer knobs (reference analog: writer.rs:37-56).
        # parquet.bloom.filter.* is intentionally not forwarded: the
        # lake's own per-file key blooms (built below, stored as
        # <file>.bloom sidecars) are what serve point lookups, and the
        # pyarrow in this environment cannot write parquet-level
        # blooms.
        # SUPPORTED property whitelist — the Arrow writer honors
        # exactly these three (the pre-round-4 Spark-datasource path
        # forwarded every property as a writer .option; that implicit
        # contract is gone). Unrecognized parquet.* properties warn
        # once per write so the narrowing is visible, not silent.
        block_size = int(props.get("parquet.block.size", 128 * 1024 * 1024))
        use_dict = props.get("parquet.enable.dictionary", "true").lower() != "false"
        compression = props.get("parquet.compression", "snappy")
        _supported = {
            "parquet.block.size",
            "parquet.enable.dictionary",
            "parquet.compression",
        }
        unknown = [
            k for k in props if k.startswith("parquet.") and k not in _supported
        ]
        if unknown:
            import warnings

            warnings.warn(
                f"table properties {sorted(unknown)} are not honored by "
                f"the lake's Arrow parquet writer (supported: "
                f"{sorted(_supported)})",
                stacklevel=2,
            )
        # Captured DRIVER-side so the switch works regardless of how
        # executor worker processes inherit their environment.
        skip_bloom = bool(os.environ.get("LAKE_SKIP_BLOOM"))

        # SINGLE-PASS write + manifest: one job hash-partitions by
        # bucket, sorts each partition by bucket, and streams the Arrow
        # batches straight into parquet ON THE EXECUTORS — one bucket
        # (= one file) open at a time — emitting the manifest (path,
        # bucket, rows, bytes, key-bloom) as the job's result. The key
        # bloom is built from the batches already in memory — the
        # round-3 design (Spark writer + a second job re-reading every
        # new file's key column) paid a full extra key-column decode
        # per commit, which at 10^10 events is real per-event cost and
        # on an object store a read-after-write round-trip per file.
        # Memory is bounded exactly like Spark's own sort-based
        # dynamic-partition writer: the in-partition sort means ONE
        # open writer whose buffer flushes as a row group at
        # ~parquet.block.size of Arrow bytes, plus the current file's
        # key column for the bloom. Task retries are safe: the final
        # file name is deterministic per (write_id, partition, bucket)
        # and published by atomic rename, so a re-run attempt
        # overwrites identical content; orphaned .tmp files of failed
        # attempts are swept by vacuum. One assumption worth naming:
        # with speculative execution a duplicate attempt can re-publish
        # a bucket's file AFTER the winner's manifest row was
        # collected, and shuffle-order nondeterminism means the
        # re-published file may compress to a slightly different size
        # — so FileEntry.bytes is advisory for the on-disk file. Row
        # content and blooms are equivalent either way (same rows, set
        # semantics), and the only consumer of `bytes`
        # (SizeTieredPolicy) tolerates drift: tier thresholds are
        # ratios over sums, not exact-match checks.
        def _write(batches):
            import numpy as np
            import pyarrow as pa
            import pyarrow.parquet as pq
            from pyspark import TaskContext

            from ml_data_pipeline_spark.lake.bloom import bloom_build

            pid = TaskContext.get().partitionId()
            out = {"path": [], "bucket": [], "rows": [], "bytes": [], "sidecar": []}
            cur: dict | None = None

            def flush(st):
                if st["buf"]:
                    tbl = pa.Table.from_batches(st["buf"])
                    # Row groups of ~parquet.block.size buffered Arrow
                    # bytes (translated to a row count — pyarrow sizes
                    # groups by rows, parquet-mr by bytes).
                    if tbl.nbytes > block_size and tbl.num_rows > 1:
                        rg_rows = max(
                            1, int(tbl.num_rows * block_size / tbl.nbytes)
                        )
                    else:
                        rg_rows = 1 << 30
                    st["writer"].write_table(tbl, row_group_size=rg_rows)
                    st["buf"] = []
                    st["buf_bytes"] = 0

            def finalize(st):
                flush(st)
                st["writer"].close()
                os.replace(st["tmp"], st["final"])
                out["path"].append(st["final"])
                out["bucket"].append(st["bucket"])
                out["rows"].append(st["rows"])
                out["bytes"].append(os.path.getsize(st["final"]))
                # Bloom goes to a SIDECAR file (<data>.bloom, same
                # tmp+rename protocol) instead of riding through the
                # manifest into snapshot JSON: snapshot stays
                # O(files), bloom bytes are read only by point
                # lookups, only for the probed bucket's files, and
                # are GC'd with their data file by vacuum.
                # LAKE_SKIP_BLOOM: bench A/B switch isolating the
                # bloom-build cost (lookups degrade to bucket-pruned
                # only — blooms are optional in FileEntry).
                if skip_bloom:
                    out["sidecar"].append(False)
                else:
                    b = bloom_build(
                        pa.chunked_array(st["keys"]).combine_chunks()
                    )
                    btmp = st["final"] + f".{uuid.uuid4().hex}.tmp"
                    with open(btmp, "w") as bf:
                        bf.write(b)
                    os.replace(btmp, st["final"] + ".bloom")
                    out["sidecar"].append(True)

            for batch in batches:
                names = batch.schema.names
                data_cols = [n for n in names if n != "_bucket"]
                key_idx = data_cols.index(key_col)
                bvals = batch.column(names.index("_bucket")).to_numpy(
                    zero_copy_only=False
                )
                # contiguous runs of equal bucket (input sorted by it)
                edges = [0] + list(
                    (np.nonzero(np.diff(bvals))[0] + 1).tolist()
                ) + [len(bvals)]
                for s, t in zip(edges, edges[1:]):
                    if s == t:
                        continue
                    b = int(bvals[s])
                    sub = batch.slice(s, t - s).select(data_cols)
                    if cur is not None and cur["bucket"] != b:
                        finalize(cur)
                        cur = None
                    if cur is None:
                        bdir = os.path.join(out_dir, f"_bucket={b}")
                        os.makedirs(bdir, exist_ok=True)
                        tmp = os.path.join(
                            bdir, f".part-{pid:05d}-{uuid.uuid4().hex}.tmp"
                        )
                        cur = {
                            "bucket": b,
                            "writer": pq.ParquetWriter(
                                tmp,
                                sub.schema,
                                use_dictionary=use_dict,
                                compression=compression,
                            ),
                            "tmp": tmp,
                            "final": os.path.join(
                                bdir, f"part-{pid:05d}.parquet"
                            ),
                            "buf": [],
                            "buf_bytes": 0,
                            "rows": 0,
                            "keys": [],
                        }
                    cur["buf"].append(sub)
                    cur["buf_bytes"] += sub.nbytes
                    cur["rows"] += sub.num_rows
                    cur["keys"].append(sub.column(key_idx))
                    if cur["buf_bytes"] >= block_size:
                        flush(cur)
            if cur is not None:
                finalize(cur)
            if out["path"]:
                yield pa.RecordBatch.from_pydict(
                    out,
                    schema=pa.schema(
                        [
                            ("path", pa.string()),
                            ("bucket", pa.int32()),
                            ("rows", pa.int64()),
                            ("bytes", pa.int64()),
                            ("sidecar", pa.bool_()),
                        ]
                    ),
                )

        manifest = (
            df.withColumn("_bucket", self.bucket_expr(snap=snap))
            # One shuffle, hash-partitioned then sorted by bucket →
            # one file per bucket per write, one open writer at a time.
            .repartition(F.col("_bucket"))
            .sortWithinPartitions("_bucket")
            .mapInArrow(
                _write,
                "path string, bucket int, rows long, bytes long, sidecar boolean",
            )
            .collect()
        )
        return [
            FileEntry(
                path=os.path.relpath(r["path"], self.root),
                bucket=int(r["bucket"]),
                kind=kind,
                rows=int(r["rows"]),
                schema_fp=fp,
                bytes=int(r["bytes"]),
                bloom_sidecar=bool(r["sidecar"]),
            )
            for r in manifest
        ]

    # ----------------------------------------------------------------- read

    def scan_files(
        self,
        buckets: Iterable[int] | None = None,
        files: Sequence[FileEntry] | None = None,
        snap: Snapshot | None = None,
    ) -> DataFrame:
        """Raw storage-schema rows from the selected snapshot files.

        Files are grouped by their written schema fingerprint; each
        group is read with its exact schema and cast/aligned to the
        snapshot's *current* storage schema (lazy schema evolution —
        old files are never rewritten).
        """
        snap = snap or self.snapshot
        storage = snap.storage_schema()
        sel = list(snap.files if files is None else files)
        if buckets is not None:
            bset = set(buckets)
            sel = [f for f in sel if f.bucket in bset]
        if not sel:
            return self.spark.createDataFrame([], storage)
        by_fp: dict[str, list[str]] = {}
        for fe in sel:
            by_fp.setdefault(fe.schema_fp, []).append(
                os.path.join(self.root, fe.path)
            )
        parts: list[DataFrame] = []
        for fp, paths in by_fp.items():
            fschema = T.StructType.fromJson(snap.schemas[fp])
            df = self.spark.read.schema(fschema).parquet(*paths)
            cols = []
            have = set(fschema.fieldNames())
            for f_ in storage.fields:
                if f_.name in have:
                    cols.append(F.col(f_.name).cast(f_.dataType).alias(f_.name))
                else:
                    # Field added after this file was written → null.
                    cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
            parts.append(df.select(*cols))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    @staticmethod
    def _reduce_latest(df: DataFrame, key_col: str) -> DataFrame:
        """Per-key last-write-wins by max ``_seq``.

        Uses ``groupBy + max(struct(_seq, ...))`` rather than a window
        ``row_number``: struct-max is partially aggregable, so Spark
        combines map-side before the shuffle — a hot key collapses to
        one row per map task instead of shipping every version to a
        single reducer. This is the skew-proof reduction primitive.
        """
        other = [c for c in df.columns if c not in (key_col, SEQ_COL)]
        packed = df.groupBy(key_col).agg(
            F.max(F.struct(SEQ_COL, *other)).alias("_p")
        )
        return packed.select(
            key_col,
            *[F.col(f"_p.{c}").alias(c) for c in other],
            F.col(f"_p.{SEQ_COL}").alias(SEQ_COL),
        )

    @staticmethod
    def _reduce_latest_patch(
        df: DataFrame,
        key_col: str,
        payload: Sequence[str],
        salt_col: str | None = None,
    ) -> DataFrame:
        """LWW-per-column reduce for patch-enabled tables.

        Semantics (exactly ordered-replay): per key, the max-``_seq``
        FULL event is the base row (patch-carrier rows sit at
        ``CARRIER_SEQ`` and lose to any full event); per payload
        column, the max patch-seq overlay applies iff its seq beats the
        base's. Deletes win as base (a patch never resurrects a row),
        but surviving overlays are RETAINED on tombstones so an
        out-of-order full event arriving later is still patched.

        Everything is a max — partially aggregable and a semilattice
        (the reduce's output rows are valid inputs), so map-side
        combine, salting, and cross-batch/compaction merging all
        compose exactly.
        """
        base = F.max(F.struct(SEQ_COL, *payload, DELETED_COL)).alias("_b")
        overlays = [
            F.max(
                F.when(
                    F.col(PS_PREFIX + c).isNotNull(),
                    F.struct(
                        F.col(PS_PREFIX + c).alias("ps"), F.col(c).alias("v")
                    ),
                )
            ).alias(f"_o_{c}")
            for c in payload
        ]
        group = [key_col] if salt_col is None else [key_col, salt_col]
        packed = df.groupBy(*group).agg(base, *overlays)
        fseq = F.col(f"_b.{SEQ_COL}")
        deleted = F.col(f"_b.{DELETED_COL}")
        out_vals, out_ps = [], []
        for c in payload:
            o = F.col(f"_o_{c}")
            applied = o.isNotNull() & (o["ps"] > fseq)
            out_vals.append(
                F.when(applied, o["v"])
                .otherwise(
                    F.when(deleted, F.lit(None)).otherwise(F.col(f"_b.{c}"))
                )
                .alias(c)
            )
            out_ps.append(F.when(applied, o["ps"]).alias(PS_PREFIX + c))
        return packed.select(
            key_col,
            *out_vals,
            fseq.alias(SEQ_COL),
            deleted.alias(DELETED_COL),
            *out_ps,
        )

    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        path = os.path.join(self.meta_dir, f"snapshot-{snapshot_id}.json")
        with open(path) as f:
            return Snapshot.from_json(json.load(f))

    def read(
        self,
        include_hidden: bool = False,
        buckets: Iterable[int] | None = None,
        as_of_snapshot: int | None = None,
    ) -> DataFrame:
        """Table state: reduce base+delta, drop tombstones.

        Re-resolves the version pointer first, so a reader always sees
        the latest committed snapshot (snapshot isolation: the file
        list is fixed once resolved). ``as_of_snapshot`` time-travels
        to an earlier committed snapshot (files are immutable; old
        snapshots remain readable until ``vacuum`` expires them).
        """
        if as_of_snapshot is not None:
            snap = self.snapshot_by_id(as_of_snapshot)
        else:
            snap = self.refresh()
        raw = self.scan_files(buckets=buckets, snap=snap)
        # Buckets whose files are all base files and carry no deltas are
        # already reduced; only delta-bearing buckets need the groupBy.
        delta_buckets = {f.bucket for f in snap.files if f.kind == "delta"}
        if buckets is not None:
            delta_buckets &= set(buckets)
        if delta_buckets:
            bexpr = self.bucket_expr(snap=snap)
            need = raw.where(bexpr.isin([int(b) for b in delta_buckets]))
            done = raw.where(~bexpr.isin([int(b) for b in delta_buckets]))
            if snap.patch_enabled:
                red = self._reduce_latest_patch(
                    need,
                    snap.key_col,
                    [f.name for f in snap.schema.fields if f.name != snap.key_col],
                )
            else:
                red = self._reduce_latest(need, snap.key_col)
            reduced = red.unionByName(done)
        else:
            reduced = raw
        live = reduced.where(~F.col(DELETED_COL))
        if include_hidden:
            return live
        return live.select(*snap.schema.fieldNames())

    def _file_bloom(self, f: FileEntry) -> str | None:
        """The file's serialized key bloom: inline (pre-round-4
        snapshots) or lazily read from its ``<path>.bloom`` sidecar,
        cached per handle (data files are immutable). Missing/
        unreadable sidecar → None → never pruned (sound)."""
        if f.key_bloom:
            return f.key_bloom
        if not f.bloom_sidecar:
            return None
        if f.path not in self._bloom_cache:
            try:
                with open(os.path.join(self.root, f.path + ".bloom")) as bf:
                    self._bloom_cache[f.path] = bf.read()
            except FileNotFoundError:
                # genuinely absent (e.g. written with LAKE_SKIP_BLOOM)
                # — cache the miss, it will never appear for an
                # immutable file
                self._bloom_cache[f.path] = None
            except OSError:
                # transient read failure (EMFILE, EIO, NFS blip): skip
                # pruning for THIS call only — caching None here would
                # silently degrade the point-lookup fast path for the
                # handle's lifetime
                return None
        return self._bloom_cache[f.path]

    def lookup_files(self, key_value, snap: Snapshot | None = None) -> list[FileEntry]:
        """The files a point lookup must read: the key's bucket
        (computed DRIVER-SIDE via the ported XXH64 — no Spark job
        before the read), bloom-pruned to the files that might contain
        the key. Sound: blooms have no false negatives, so the
        max-seq reduce over the surviving files is exact. Bloom bytes
        are touched only here, only for this one bucket's files (tiny
        sidecar reads, cached) — never on the commit/refresh path."""
        from ml_data_pipeline_spark.lake.bloom import (
            bloom_might_contain,
            bucket_of,
        )

        snap = snap or self.snapshot
        bucket = bucket_of(key_value, snap.n_buckets)
        out = []
        for f in snap.files:
            if f.bucket != bucket:
                continue
            b = self._file_bloom(f)
            if not b or bloom_might_contain(b, key_value):
                out.append(f)
        return out

    def lookup(self, key_value) -> DataFrame:
        """Point lookup: scan ONLY the bloom-surviving files of the
        key's bucket (~1 file after compaction), then filter + reduce.
        The bucket is recomputable from the key (driver-side XXH64,
        parity-pinned against F.xxhash64) so no index structure and no
        pre-read Spark job is needed — this is the bucketed-layout
        payoff (reference analog: the dictionary's keyed access,
        string_cache.rs; bloom analog: parquet/writer.rs:37-41)."""
        snap = self.refresh()
        cand = self.lookup_files(key_value, snap=snap)
        raw = self.scan_files(files=cand, snap=snap).where(
            F.col(snap.key_col) == F.lit(key_value)
        )
        if snap.patch_enabled:
            red = self._reduce_latest_patch(
                raw, snap.key_col, snap.payload_cols()
            )
        else:
            red = self._reduce_latest(raw, snap.key_col)
        return red.where(~F.col(DELETED_COL)).select(*snap.schema.fieldNames())

    def _version_expr(self, snap: Snapshot):
        """Per-row change version: the highest event seq that shaped
        this row's state — monotone under applied events, constant
        under losing/no-op events (patch overlays count via _ps)."""
        if not snap.patch_enabled:
            return F.col(SEQ_COL)
        parts = [F.col(SEQ_COL)] + [
            F.coalesce(F.col(PS_PREFIX + c), F.lit(CARRIER_SEQ))
            for c in snap.schema.fieldNames()
            if c != snap.key_col
        ]
        return F.greatest(*parts) if len(parts) > 1 else parts[0]

    def changes(
        self,
        since_snapshot_id: int,
        include_old: bool = False,
        until_snap: "Snapshot | None" = None,
    ) -> DataFrame:
        """Incremental changes feed (Iceberg incremental-read analog):
        the net per-key change between ``since_snapshot_id`` and the
        current snapshot, as a changelog of (op 'U'|'D', key, payload,
        _seq, …) rows carrying each changed key's NEW full state.

        Cost is O(new data + touched buckets of the base state), never
        O(table): only files added since the base snapshot are scanned
        for the window, and the base state is read bucket-pruned to the
        buckets those files touch (compaction output files are included
        in the window scan but produce no false changes — a key's
        change *version*, the max event seq shaping its state incl.
        patch overlays, only moves when a new event wins). Downstream
        training pipelines consume this instead of re-reading the
        table.

        Correctness precondition: no ``compact(gc_before_seq=...)``
        inside the window may have GC'd a tombstone this feed hasn't
        delivered yet (see ``compact``'s contract) — otherwise the net
        delete is unobservable from the file diff.

        ``include_old=True`` additionally attaches the key's PREVIOUS
        payload as ``_old_<col>`` columns (null for newly-inserted
        keys) — free here (the base state is already joined for the
        version comparison) and required by derived views that must
        retract old contributions, e.g. the inverted token index
        (postings for tokens REMOVED by an update).

        ``until_snap`` pins the window's upper bound to an explicit
        snapshot (default: refresh to the current head). Consumers
        that report a target snapshot id alongside the window — e.g.
        ``ChangesFeed.poll`` — MUST pass the snapshot they report, or
        a commit landing between their refresh and this call silently
        widens the delivered window past the recorded cursor.
        """
        snap = until_snap or self.refresh()
        try:
            base = self.snapshot_by_id(since_snapshot_id)
        except FileNotFoundError:
            raise ValueError(
                f"base snapshot {since_snapshot_id} has been expired by "
                f"vacuum — this consumer's cursor predates the retention "
                f"window; re-bootstrap it (full read + current snapshot "
                f"as the new cursor) or raise vacuum keep_snapshots to "
                f"cover the slowest consumer's lag"
            ) from None
        base_paths = {f.path for f in base.files}
        added = [f for f in snap.files if f.path not in base_paths]
        payload = [f.name for f in snap.schema.fields if f.name != snap.key_col]
        out_schema = T.StructType(
            [T.StructField("op", T.StringType())]
            + list(snap.storage_schema().fields)
            + (
                [
                    T.StructField(f"_old_{f.name}", f.dataType)
                    for f in snap.schema.fields
                    if f.name != snap.key_col
                ]
                if include_old
                else []
            )
        )
        if not added:
            return self.spark.createDataFrame([], out_schema)

        def _reduce(df: DataFrame) -> DataFrame:
            if snap.patch_enabled:
                return self._reduce_latest_patch(df, snap.key_col, payload)
            return self._reduce_latest(df, snap.key_col)

        touched = set()
        for f in added:
            touched.add(f.bucket)
        # Base state, bucket-pruned + reduced (tombstones kept — a
        # delete followed by re-insert must read as a change). The base
        # FILES are scanned under the CURRENT snapshot's storage schema
        # (snap.schemas keeps every historical fingerprint), so both
        # sides align even across mid-window schema evolution.
        base_files = [f for f in base.files if f.bucket in touched]
        base_state = _reduce(self.scan_files(files=base_files, snap=snap))
        win = self.scan_files(files=added, snap=snap)
        new_state = _reduce(base_state.unionByName(win))
        ver = self._version_expr(snap)
        old_cols = []
        if include_old:
            old_cols = [
                F.when(~F.col("_base_del"), F.col(f"_old_{c}")).alias(
                    f"_old_{c}"
                )
                for c in payload
            ]
        base_vers = base_state.select(
            F.col(snap.key_col),
            ver.alias("_base_ver"),
            F.col(DELETED_COL).alias("_base_del"),
            *[F.col(c).alias(f"_old_{c}") for c in (payload if include_old else [])],
        )
        base_absent = F.col("_base_ver").isNull() | F.col("_base_del")
        changed = (
            new_state.join(base_vers, snap.key_col, "left")
            .where(
                F.col("_base_ver").isNull() | (ver > F.col("_base_ver"))
            )
            # a key absent at the base (never existed, or tombstoned)
            # that is still/again deleted now is not a net change
            .where(~(F.col(DELETED_COL) & base_absent))
        )
        out = changed.select(
            F.when(F.col(DELETED_COL), F.lit("D"))
            .otherwise(F.lit("U"))
            .alias("op"),
            *[F.col(c) for c in win.columns],
            *old_cols,
        )
        return out

    # ---------------------------------------------------------------- merge

    def already_applied(self, stream_id: str, batch_id: int) -> bool:
        wm = self.snapshot.watermarks.get(stream_id)
        return wm is not None and batch_id <= wm

    def merge_batch(
        self,
        events: DataFrame,
        *,
        seq_col: str = "seq",
        op_col: str = "op",
        batch_id: int | None = None,
        stream_id: str = "default",
        exclude_cols: Sequence[str] = ("ts", "chunk"),
        compact_touched: bool = False,
        salt: int | None = None,
        quarantine: bool = True,
        summary_extra: dict | None = None,
    ) -> dict:
        """Apply one micro-batch of change events. Returns metrics dict.

        ``events`` columns: ``op`` ('I'|'U'|'D'), ``seq`` (long, the
        LSN), the key column, payload columns. Semantics: per key the
        max-``seq`` event wins, globally, across batches and replays —
        enforced within the batch here and across batches by the
        read/compaction reduce over stored ``_seq``.

        Patch-enabled tables (created with properties
        ``{"patch.enabled": "true"}``) additionally accept op 'P' —
        a partial-column update that sets only its non-null payload
        columns. Semantics are exact ordered-replay last-writer-wins
        per column: a full event replaces every column; a patch
        overlays the columns it sets until a higher-seq full event; a
        delete kills the row (patches never resurrect); out-of-order
        arrival across batches resolves identically (the reduce is a
        semilattice over per-column seqs).

        Exactly-once: if ``batch_id`` is at-or-below the stream's
        committed watermark the call is a no-op (replay after restart).
        """
        # Re-resolve the committed pointer: another handle to the same
        # table (CLI, streaming runner) may have committed since this
        # instance last looked — building on a stale snapshot would
        # fork history and clobber those commits.
        snap = self.refresh()
        patch_mode = snap.properties.get(PATCH_PROP) == "true"
        allowed_ops = ("I", "U", "D", "P") if patch_mode else ("I", "U", "D")
        if batch_id is not None and self.already_applied(stream_id, batch_id):
            return {
                "skipped": True,
                "stream_id": stream_id,
                "batch_id": batch_id,
                "snapshot_id": snap.snapshot_id,
            }

        # --- schema evolution -------------------------------------------
        drop = {seq_col, op_col, *exclude_cols}
        payload_fields = [f for f in events.schema.fields if f.name not in drop]
        incoming = T.StructType(payload_fields)
        assert_lake_payload_type(incoming)
        merged = merge_schemas(snap.schema, incoming)
        evolved = merged != snap.schema
        schema_after = merged if evolved else snap.schema

        # --- bad-record quarantine (reference C1: corrupt-record
        # detection, ml-data-readers/src/binary.rs:238-270) -------------
        # Invalid events must not poison the table NOR abort the batch.
        # The reason column is observed during the main write (no extra
        # pass); the quarantine write itself runs only when any invalid
        # rows actually exist.
        obs = None
        events_orig = events
        if quarantine:
            reason = (
                F.when(F.col(snap.key_col).isNull(), "null_key")
                .when(F.col(seq_col).isNull(), "null_seq")
                # NULL op must be its own branch: ~isin(...) is NULL
                # (not true) for NULL, which would let the row through
                # with _deleted=NULL and silently vanish from reads.
                .when(F.col(op_col).isNull(), "null_op")
                .when(~F.col(op_col).isin(*allowed_ops), "bad_op")
            )
            if "tokens" in events.columns and "n_tok" in events.columns:
                reason = reason.when(
                    (F.col(op_col) != "D")
                    & F.col("tokens").isNotNull()
                    & F.col("n_tok").isNotNull()
                    & (F.col("n_tok") != F.size("tokens")),
                    "n_tok_mismatch",
                )
            from pyspark.sql import Observation

            obs = Observation()
            events = events_orig.withColumn("_reason", reason).observe(
                obs,
                F.count(F.lit(1)).alias("events_in"),
                F.count("_reason").alias("events_invalid"),
            )
            events = events.where(F.col("_reason").isNull()).drop("_reason")

        # --- per-batch resolution (max-seq wins inside the batch) -------
        have = {f.name for f in payload_fields}

        def _cast_cols(src_has: set) -> list:
            cols = []
            for f_ in schema_after.fields:
                if f_.name in src_has:
                    cols.append(F.col(f_.name).cast(f_.dataType).alias(f_.name))
                else:
                    cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
            return cols

        payload_names = [
            f.name for f in schema_after.fields if f.name != snap.key_col
        ]
        if patch_mode:
            # Full events (I/U/D): ordinary rows, no overlays.
            fulls = (
                events.where(F.col(op_col) != "P")
                .withColumn(SEQ_COL, F.col(seq_col).cast("long"))
                .withColumn(DELETED_COL, F.col(op_col) == F.lit("D"))
                .select(*_cast_cols(have), SEQ_COL, DELETED_COL)
            )
            nulled = []
            for f_ in schema_after.fields:
                if f_.name == snap.key_col:
                    nulled.append(F.col(f_.name))
                else:
                    nulled.append(
                        F.when(F.col(DELETED_COL), F.lit(None).cast(f_.dataType))
                        .otherwise(F.col(f_.name))
                        .alias(f_.name)
                    )
            fulls = fulls.select(
                *nulled,
                SEQ_COL,
                DELETED_COL,
                *[
                    F.lit(None).cast("long").alias(PS_PREFIX + c)
                    for c in payload_names
                ],
            )
            # Patch events: carrier rows at CARRIER_SEQ (lose to any
            # full event as base; _deleted=true so an all-patch history
            # materializes no row) carrying per-column overlay seqs.
            psrc = events.where(F.col(op_col) == "P")
            pseq = F.col(seq_col).cast("long")
            ps_cols = [
                F.when(F.col(c).isNotNull(), pseq).alias(PS_PREFIX + c)
                if c in have
                else F.lit(None).cast("long").alias(PS_PREFIX + c)
                for c in payload_names
            ]
            patches = psrc.select(
                *_cast_cols(have),
                F.lit(CARRIER_SEQ).cast("long").alias(SEQ_COL),
                F.lit(True).alias(DELETED_COL),
                *ps_cols,
            )
            ev = fulls.unionByName(patches)
            if salt:
                # The patch reduce is a semilattice: reduce (key, salt)
                # then reduce key — exact split.
                salted = ev.withColumn(
                    "_salt",
                    F.pmod(
                        F.xxhash64(
                            F.col(SEQ_COL),
                            *[F.col(PS_PREFIX + c) for c in payload_names],
                        ),
                        F.lit(salt),
                    ),
                )
                phase1 = self._reduce_latest_patch(
                    salted, snap.key_col, payload_names, salt_col="_salt"
                )
                resolved = self._reduce_latest_patch(
                    phase1, snap.key_col, payload_names
                )
            else:
                resolved = self._reduce_latest_patch(
                    ev, snap.key_col, payload_names
                )
        else:
            ev = events.withColumn(
                SEQ_COL, F.col(seq_col).cast("long")
            ).withColumn(DELETED_COL, F.col(op_col) == F.lit("D"))
            ev = ev.select(*_cast_cols(have), SEQ_COL, DELETED_COL)
            # Null out payload on deletes so tombstones carry no stale data.
            payload_cols = []
            for f_ in schema_after.fields:
                if f_.name == snap.key_col:
                    payload_cols.append(F.col(f_.name))
                else:
                    payload_cols.append(
                        F.when(F.col(DELETED_COL), F.lit(None).cast(f_.dataType))
                        .otherwise(F.col(f_.name))
                        .alias(f_.name)
                    )
            ev = ev.select(*payload_cols, SEQ_COL, DELETED_COL)
            if salt:
                # Two-phase salted reduce for pathologically hot keys: the
                # salt spreads one key over `salt` reducers, then a second
                # tiny reduce finishes. max-by-seq is associative, so the
                # split is exact.
                salted = ev.withColumn(
                    "_salt", F.pmod(F.xxhash64(F.col(SEQ_COL)), F.lit(salt))
                )
                other = [c for c in ev.columns if c not in (snap.key_col, SEQ_COL)]
                phase1 = salted.groupBy(snap.key_col, "_salt").agg(
                    F.max(F.struct(SEQ_COL, *other)).alias("_p")
                )
                resolved = (
                    phase1.groupBy(snap.key_col)
                    .agg(F.max("_p").alias("_p"))
                    .select(
                        snap.key_col,
                        *[F.col(f"_p.{c}").alias(c) for c in other],
                        F.col(f"_p.{SEQ_COL}").alias(SEQ_COL),
                    )
                )
            else:
                resolved = self._reduce_latest(ev, snap.key_col)

        # --- evolve schema on the in-flight snapshot ---------------------
        # NOTE: self._snapshot is NOT touched until _write_snapshot's
        # atomic pointer swap succeeds — if the delta write, compaction,
        # or snapshot write fails, the in-memory table still points at
        # the last committed snapshot and a retry builds on real state.
        new_snap = Snapshot(
            snapshot_id=snap.snapshot_id + 1,
            parent_id=snap.snapshot_id,
            schema_json=schema_after.jsonValue(),
            key_col=snap.key_col,
            n_buckets=snap.n_buckets,
            files=list(snap.files),
            schemas=dict(snap.schemas),
            watermarks=dict(snap.watermarks),
            properties=dict(snap.properties),
        )

        # --- append delta files ------------------------------------------
        # Single action: resolved flows straight into the delta write
        # (no cache — nothing re-reads the logical plan).
        new_files = self._write_files(resolved, kind="delta", snap=new_snap)
        n_rows = sum(f.rows for f in new_files)
        touched = sorted({f.bucket for f in new_files})
        # fp describes the files AS WRITTEN — it must survive rebases
        # unchanged even if the rebased snapshot's schema moves on.
        fp = _schema_fp(new_snap.storage_schema())
        written_schema_json = new_snap.storage_schema().jsonValue()

        # --- optimistic commit (+ rebase on conflict) --------------------
        # The delta files are immutable and schema-fingerprinted, so a
        # losing writer rebases METADATA only: rebuild the snapshot on
        # the winner's head (files, watermarks, schemas), re-merge the
        # schema through the lattice, and retry. Compaction output from
        # a losing attempt is orphaned (vacuum reclaims it) and re-run
        # against the rebased file set, so no winner file is ever
        # dropped from a compacted bucket.
        base_snap = snap
        committed = False
        for _attempt in range(5):
            new_snap.schemas[fp] = written_schema_json
            new_snap.files = list(base_snap.files) + new_files
            if compact_touched and touched:
                self._compact_into(new_snap, touched, gc_before_seq=None)
            if batch_id is not None:
                new_snap.watermarks[stream_id] = batch_id
            new_snap.summary = {
                "operation": "merge",
                "stream_id": stream_id,
                "batch_id": batch_id,
                "upsert_rows": n_rows,
                "touched_buckets": touched,
                "evolved": evolved,
                **(summary_extra or {}),
            }
            try:
                self._write_snapshot(new_snap)
                committed = True
                break
            except CommitConflict:
                head = self.refresh()
                if batch_id is not None and self.already_applied(
                    stream_id, batch_id
                ):
                    # The winner (or an earlier replay) applied this
                    # very batch — exactly-once still holds; our delta
                    # files stay unreferenced until vacuum.
                    return {
                        "skipped": True,
                        "stream_id": stream_id,
                        "batch_id": batch_id,
                        "snapshot_id": head.snapshot_id,
                    }
                schema_after = merge_schemas(head.schema, schema_after)
                evolved = schema_after != head.schema or evolved
                base_snap = head
                new_snap = Snapshot(
                    snapshot_id=head.snapshot_id + 1,
                    parent_id=head.snapshot_id,
                    schema_json=schema_after.jsonValue(),
                    key_col=head.key_col,
                    n_buckets=head.n_buckets,
                    files=[],
                    schemas=dict(head.schemas),
                    watermarks=dict(head.watermarks),
                    properties=dict(head.properties),
                )
        if not committed:
            raise CommitConflict(
                "merge_batch lost 5 consecutive commit races — check for a "
                "runaway writer storm on this table"
            )
        parent_paths = {p.path for p in base_snap.files}

        # --- quarantine write (post-commit, advisory) --------------------
        events_in = events_invalid = None
        if obs is not None:
            got = obs.get  # populated by the delta-write action above
            events_in = int(got.get("events_in") or 0)
            events_invalid = int(got.get("events_invalid") or 0)
            if events_invalid > 0:
                reason2 = (
                    F.when(F.col(snap.key_col).isNull(), "null_key")
                    .when(F.col(seq_col).isNull(), "null_seq")
                    .when(F.col(op_col).isNull(), "null_op")
                    .when(~F.col(op_col).isin(*allowed_ops), "bad_op")
                )
                if (
                    "tokens" in events_orig.columns
                    and "n_tok" in events_orig.columns
                ):
                    reason2 = reason2.when(
                        (F.col(op_col) != "D")
                        & F.col("tokens").isNotNull()
                        & F.col("n_tok").isNotNull()
                        & (F.col("n_tok") != F.size("tokens")),
                        "n_tok_mismatch",
                    )
                (
                    events_orig.withColumn("_reason", reason2)
                    .where(F.col("_reason").isNotNull())
                    .withColumn("_batch_id", F.lit(batch_id).cast("long"))
                    .withColumn("_stream_id", F.lit(stream_id))
                    .write.mode("append")
                    .parquet(os.path.join(self.root, "quarantine"))
                )
        return {
            "skipped": False,
            "stream_id": stream_id,
            "batch_id": batch_id,
            "snapshot_id": new_snap.snapshot_id,
            "upsert_rows": n_rows,
            "touched_buckets": touched,
            "schema_evolved": evolved,
            "events_in": events_in,
            "events_invalid": events_invalid,
            # files created by this commit (compaction may have folded
            # the deltas into base files already — report what survived)
            "new_files": [
                f.to_json() for f in new_snap.files if f.path not in parent_paths
            ],
        }

    # ------------------------------------------------------------- compact

    def _compact_into(
        self,
        snap: Snapshot,
        buckets: Sequence[int],
        gc_before_seq: int | None,
    ) -> None:
        """Rewrite the given buckets of ``snap`` as reduced base files.

        Mutates ``snap.files``/``snap.schemas`` in place; caller commits.
        """
        bset = set(buckets)
        victims = [f for f in snap.files if f.bucket in bset]
        if not victims:
            return
        raw = self.scan_files(files=victims, snap=snap)
        if snap.patch_enabled:
            payload = [
                f.name for f in snap.schema.fields if f.name != snap.key_col
            ]
            reduced = self._reduce_latest_patch(raw, snap.key_col, payload)
            if gc_before_seq is not None:
                # Keep tombstones whose base OR any overlay is at/after
                # the watermark (a patch-carrier tombstone still guards
                # its overlays for a late full event).
                ps_vals = [
                    F.coalesce(F.col(PS_PREFIX + c), F.lit(CARRIER_SEQ))
                    for c in payload
                ]
                live_ps = (
                    F.greatest(*ps_vals) if len(ps_vals) > 1 else ps_vals[0]
                )
                reduced = reduced.where(
                    (~F.col(DELETED_COL))
                    | (F.col(SEQ_COL) >= F.lit(gc_before_seq))
                    | (live_ps >= F.lit(gc_before_seq))
                )
        else:
            reduced = self._reduce_latest(raw, snap.key_col)
            if gc_before_seq is not None:
                reduced = reduced.where(
                    (~F.col(DELETED_COL))
                    | (F.col(SEQ_COL) >= F.lit(gc_before_seq))
                )
        new_files = self._write_files(reduced, kind="base", snap=snap)
        fp = _schema_fp(snap.storage_schema())
        snap.schemas[fp] = snap.storage_schema().jsonValue()
        keep = [f for f in snap.files if f.bucket not in bset]
        snap.files = keep + new_files

    def compact(
        self,
        buckets: Sequence[int] | None = None,
        gc_before_seq: int | None = None,
    ) -> dict:
        """Fold delta files into base files (optionally GC old tombstones).

        ``gc_before_seq`` CONTRACT: it must stay at-or-below the
        oldest snapshot any ``changes()`` consumer still reads from.
        A tombstone GC'd inside a consumer's unread window makes the
        net delete invisible to that consumer (the key silently
        vanishes instead of emitting a 'D' row). The built-in replay
        path never passes ``gc_before_seq``; if you wire it up, gate
        it on the minimum consumer cursor exactly like Iceberg gates
        snapshot expiry on incremental-read consumers.
        """
        for _attempt in range(5):
            snap = self.refresh()  # never compact from a stale snapshot
            bs = (
                sorted({f.bucket for f in snap.files if f.kind == "delta"})
                if buckets is None
                else list(buckets)
            )
            new_snap = Snapshot(
                snapshot_id=snap.snapshot_id + 1,
                parent_id=snap.snapshot_id,
                schema_json=snap.schema_json,
                key_col=snap.key_col,
                n_buckets=snap.n_buckets,
                files=list(snap.files),
                schemas=dict(snap.schemas),
                watermarks=dict(snap.watermarks),
                properties=dict(snap.properties),
            )
            self._compact_into(new_snap, bs, gc_before_seq)
            new_snap.summary = {
                "operation": "compact",
                "buckets": list(map(int, bs)),
            }
            try:
                self._write_snapshot(new_snap)
            except CommitConflict:
                # A concurrent merge won the id: the fold is stale (it
                # must include the winner's files) — redo from the new
                # head; losing attempts' output files await vacuum.
                continue
            return {
                "snapshot_id": new_snap.snapshot_id,
                "buckets": list(map(int, bs)),
            }
        raise CommitConflict("compact lost 5 consecutive commit races")

    def delta_file_count(self) -> int:
        return sum(1 for f in self.snapshot.files if f.kind == "delta")

    # -------------------------------------------------------------- vacuum

    def vacuum(
        self, keep_snapshots: int = 1, orphan_grace_sec: float = 3600.0
    ) -> dict:
        """Delete data files unreachable from the ``keep_snapshots``
        most recent snapshots, and expire older snapshot metadata.

        Compaction/merge never delete files (snapshot isolation +
        time travel need them); vacuum is the explicit GC boundary —
        after it, ``as_of_snapshot`` works only for kept snapshots,
        and any ``changes()``/``ChangesFeed`` consumer whose cursor
        predates the kept window must re-bootstrap — size
        ``keep_snapshots`` to cover the slowest consumer's lag,
        exactly like Iceberg gates ``expire_snapshots``.

        Multi-writer safety: files referenced by NO snapshot at all
        fall into two indistinguishable classes — losers of commit
        races (garbage) and the in-flight, not-yet-committed write of
        a CONCURRENT merge (deleting those would corrupt the commit
        that is about to reference them). Never-referenced files are
        therefore only deleted once older than ``orphan_grace_sec``
        (no sane in-flight write outlives an hour); files referenced
        by an EXPIRED snapshot were durably committed and superseded,
        so they delete immediately.
        """
        import time as _time

        current = self.refresh()
        snaps = self.history()
        kept = [
            s
            for s in snaps
            if s.snapshot_id > current.snapshot_id - max(1, keep_snapshots)
        ]
        referenced = {
            os.path.join(self.root, f.path) for s in kept for f in s.files
        }
        ever_committed = {
            os.path.join(self.root, f.path) for s in snaps for f in s.files
        }
        now = _time.time()
        removed_files = 0
        for dirpath, _dirs, files in os.walk(self.data_dir):
            for name in files:
                full = os.path.join(dirpath, name)
                if name.endswith(".tmp"):
                    # Orphaned temp file of a failed/retried write
                    # attempt (the single-pass writer publishes via
                    # atomic rename); sweep once past the grace window.
                    try:
                        if now - os.path.getmtime(full) >= orphan_grace_sec:
                            os.remove(full)
                            removed_files += 1
                    except OSError:
                        pass
                    continue
                if name.endswith(".bloom"):
                    # Bloom sidecars live and die with their data file:
                    # orphaned (parquet already gone) → sweep.
                    if not os.path.exists(full[: -len(".bloom")]):
                        try:
                            os.remove(full)
                            removed_files += 1
                        except OSError:
                            pass
                    continue
                if not name.endswith(".parquet") or full in referenced:
                    continue
                if full not in ever_committed:
                    try:
                        age = now - os.path.getmtime(full)
                    except OSError:
                        continue
                    if age < orphan_grace_sec:
                        continue  # possibly an in-flight concurrent write
                os.remove(full)
                removed_files += 1
                try:
                    os.remove(full + ".bloom")
                    removed_files += 1
                except OSError:
                    pass
        # prune now-empty write directories
        for dirpath, dirs, files in os.walk(self.data_dir, topdown=False):
            if dirpath != self.data_dir and not dirs and not files:
                os.rmdir(dirpath)
        removed_snaps = 0
        kept_ids = {s.snapshot_id for s in kept}
        for s in snaps:
            if s.snapshot_id not in kept_ids:
                os.remove(
                    os.path.join(self.meta_dir, f"snapshot-{s.snapshot_id}.json")
                )
                removed_snaps += 1
        return {
            "removed_files": removed_files,
            "removed_snapshots": removed_snaps,
            "kept_snapshots": sorted(kept_ids),
        }
