"""Avro Object Container File reader/writer — from scratch, pure
Python, per the public Avro 1.x spec (reference S14: the declared-but-
unshipped Avro feature, ml-data-readers/Cargo.toml:12-18).

No spark-avro datasource jar ships in this sandbox, so the wire format
is implemented directly (magic ``Obj\\x01`` → file-metadata map with
``avro.schema``/``avro.codec`` → sync marker → blocks of
(count, byte-size, records, sync)), with the binary encoding's
zigzag-varint primitives. Supported schema subset: a record of
``null``-unioned primitives (boolean, int, long, float, double,
string, bytes) and arrays of int/long — exactly the shapes this
engine's tables use.

Distributed shape mirrors sources/arrow_ipc.py: the writer emits one
``.avro`` file per non-empty Spark partition via ``mapInPandas``; the
reader is ``binaryFile`` → ``mapInPandas`` parse (container files are
only block-splittable with sync-seeking, which a per-file reader at
many-files sharding doesn't need).
"""

from __future__ import annotations

import json
import os
import struct
import uuid
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MAGIC = b"Obj\x01"

# ---------------------------------------------------------------- primitives


def _zigzag_encode(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _zigzag_decode(n: int) -> int:
    return (n >> 1) ^ -(n & 1)


def write_long(buf: bytearray, n: int) -> None:
    z = _zigzag_encode(n) & 0xFFFFFFFFFFFFFFFF
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            buf.append(b | 0x80)
        else:
            buf.append(b)
            return


def read_long(mv: memoryview, pos: int) -> tuple[int, int]:
    shift = 0
    acc = 0
    while True:
        b = mv[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            return _zigzag_decode(acc), pos
        shift += 7


def _write_bytes(buf: bytearray, b: bytes) -> None:
    write_long(buf, len(b))
    buf += b


def _read_bytes(mv: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = read_long(mv, pos)
    return bytes(mv[pos : pos + n]), pos + n


# ------------------------------------------------------------ schema mapping

_SPARK_TO_AVRO = {
    T.BooleanType: "boolean",
    T.IntegerType: "int",
    T.LongType: "long",
    T.FloatType: "float",
    T.DoubleType: "double",
    T.StringType: "string",
    T.BinaryType: "bytes",
}


def avro_schema_json(schema: T.StructType, name: str = "row") -> str:
    """Spark StructType → Avro record schema (nullable = union with null)."""
    fields = []
    for f in schema.fields:
        if isinstance(f.dataType, T.ArrayType):
            el = _SPARK_TO_AVRO[type(f.dataType.elementType)]
            t: object = {"type": "array", "items": el}
        else:
            t = _SPARK_TO_AVRO[type(f.dataType)]
        fields.append({"name": f.name, "type": ["null", t]})
    return json.dumps({"type": "record", "name": name, "fields": fields})


def _encode_value(buf: bytearray, v, dt: T.DataType) -> None:
    # nullable union: branch index 0 = null, 1 = value
    if v is None or (isinstance(v, float) and v != v):
        write_long(buf, 0)
        return
    write_long(buf, 1)
    if isinstance(dt, T.BooleanType):
        buf.append(1 if v else 0)
    elif isinstance(dt, (T.IntegerType, T.LongType)):
        write_long(buf, int(v))
    elif isinstance(dt, T.FloatType):
        buf += struct.pack("<f", float(v))
    elif isinstance(dt, T.DoubleType):
        buf += struct.pack("<d", float(v))
    elif isinstance(dt, T.StringType):
        _write_bytes(buf, str(v).encode("utf-8"))
    elif isinstance(dt, T.BinaryType):
        _write_bytes(buf, bytes(v))
    elif isinstance(dt, T.ArrayType):
        items = list(v)
        if items:
            write_long(buf, len(items))
            for x in items:
                write_long(buf, int(x))
        write_long(buf, 0)
    else:  # pragma: no cover
        raise TypeError(f"unsupported avro type {dt}")


def _decode_value(mv: memoryview, pos: int, dt: T.DataType):
    branch, pos = read_long(mv, pos)
    if branch == 0:
        return None, pos
    if isinstance(dt, T.BooleanType):
        return bool(mv[pos]), pos + 1
    if isinstance(dt, (T.IntegerType, T.LongType)):
        n, pos = read_long(mv, pos)
        return n, pos
    if isinstance(dt, T.FloatType):
        return struct.unpack_from("<f", mv, pos)[0], pos + 4
    if isinstance(dt, T.DoubleType):
        return struct.unpack_from("<d", mv, pos)[0], pos + 8
    if isinstance(dt, T.StringType):
        b, pos = _read_bytes(mv, pos)
        return b.decode("utf-8"), pos
    if isinstance(dt, T.BinaryType):
        return _read_bytes(mv, pos)
    if isinstance(dt, T.ArrayType):
        out: list[int] = []
        while True:
            n, pos = read_long(mv, pos)
            if n == 0:
                return out, pos
            if n < 0:  # block with byte-size prefix
                n = -n
                _, pos = read_long(mv, pos)
            for _ in range(n):
                x, pos = read_long(mv, pos)
                out.append(x)
    raise TypeError(f"unsupported avro type {dt}")  # pragma: no cover


# ------------------------------------------------------------ container file


def write_avro_bytes(
    rows: list[tuple], schema: T.StructType, sync: bytes | None = None
) -> bytes:
    """Encode rows as one Avro Object Container File (null codec)."""
    sync = sync or uuid.uuid4().bytes
    assert len(sync) == 16
    buf = bytearray()
    buf += MAGIC
    meta = {
        "avro.schema": avro_schema_json(schema).encode(),
        "avro.codec": b"null",
    }
    write_long(buf, len(meta))
    for k, v in meta.items():
        _write_bytes(buf, k.encode())
        _write_bytes(buf, v)
    write_long(buf, 0)  # end of metadata map
    buf += sync
    if rows:
        block = bytearray()
        for row in rows:
            for v, f in zip(row, schema.fields):
                _encode_value(block, v, f.dataType)
        write_long(buf, len(rows))
        write_long(buf, len(block))
        buf += block
        buf += sync
    return bytes(buf)


def read_avro_bytes(blob: bytes, schema: T.StructType) -> list[tuple]:
    """Decode one Avro Object Container File (null codec)."""
    mv = memoryview(blob)
    if bytes(mv[:4]) != MAGIC:
        raise ValueError("not an avro container file")
    pos = 4
    meta: dict[str, bytes] = {}
    while True:
        n, pos = read_long(mv, pos)
        if n == 0:
            break
        if n < 0:
            n = -n
            _, pos = read_long(mv, pos)
        for _ in range(n):
            k, pos = _read_bytes(mv, pos)
            v, pos = _read_bytes(mv, pos)
            meta[k.decode()] = v
    codec = meta.get("avro.codec", b"null")
    if codec not in (b"null", b"deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    sync = bytes(mv[pos : pos + 16])
    pos += 16
    out: list[tuple] = []
    n_total = len(blob)
    while pos < n_total:
        count, pos = read_long(mv, pos)
        size, pos = read_long(mv, pos)
        block = mv[pos : pos + size]
        pos += size
        if codec == b"deflate":
            import zlib

            block = memoryview(zlib.decompress(bytes(block), -15))
        bp = 0
        for _ in range(count):
            row = []
            for f in schema.fields:
                v, bp = _decode_value(block, bp, f.dataType)
                row.append(v)
            out.append(tuple(row))
        if bytes(mv[pos : pos + 16]) != sync:
            raise ValueError("sync marker mismatch (corrupt block)")
        pos += 16
    return out


# ------------------------------------------------------------- Spark surface


def write_avro(df: DataFrame, out_dir: str) -> None:
    """One .avro container file per non-empty partition (executor-side)."""
    os.makedirs(out_dir, exist_ok=True)
    schema = df.schema

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        rows: list[tuple] = []
        for pdf in batches:
            rows.extend(pdf.itertuples(index=False, name=None))
        if not rows:
            return
        # Deterministic final name + temp-write + atomic rename: a
        # retried/speculative attempt republishes the same file rather
        # than adding a duplicate (see arrow_ipc.write_ipc).
        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}.avro")
        tmp = os.path.join(out_dir, f".part-{pid:05d}-{uuid.uuid4().hex}.tmp")
        blob = write_avro_bytes(rows, schema)
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
        yield pd.DataFrame({"path": [path], "rows": [len(rows)]})

    df.mapInPandas(_write, "path string, rows long").collect()


def read_avro(
    spark: SparkSession, path_glob: str, schema: T.StructType
) -> DataFrame:
    """Distributed Avro container scan: binaryFile + pure-Python decode."""
    files = spark.read.format("binaryFile").load(path_glob)
    names = [f.name for f in schema.fields]

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                rows = read_avro_bytes(bytes(content), schema)
                yield pd.DataFrame(rows, columns=names)

    return files.select("content").mapInPandas(_parse, schema)


def avro_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-contract query: events → distributed Avro write →
    distributed Avro read → aggregate; lossless roundtrip ⇒ the oracle
    aggregates the original parquet."""
    import tempfile
    import shutil

    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.sources.tables import load_table_spread

    # Spread: the write is a per-partition Python encode — on the
    # single-row-group testdata the whole 1M-row container would
    # otherwise be encoded (and later decoded, one file) on one core.
    e = load_table_spread(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    out = os.path.join(
        tempfile.gettempdir(), f"avro-roundtrip-{os.path.basename(sf_dir)}"
    )
    shutil.rmtree(out, ignore_errors=True)
    write_avro(e, out)
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    back = read_avro(spark, os.path.join(out, "*.avro"), schema)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("event_id").alias("sum_id"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias(
                "sum_value"
            ),
        )
        .orderBy("event_type")
    )
