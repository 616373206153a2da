"""TFRecord framing reader/writer (reference S8 parity).

Wire format (reference: /root/reference/ml-data/ml-data-readers/src/
binary.rs:212-217): each record is
    8B little-endian length
    4B masked CRC32C of the length bytes
    payload
    4B masked CRC32C of the payload
with mask(c) = ((c >> 15) | (c << 17)) + 0xa282ead8 (binary.rs:392-395).

The reader is Spark-side: `binaryFile` datasource → `mapInPandas`
frame parser (one Python pass per file, vectorized CRC via a numpy
table-driven CRC32C). Corrupt frames raise — the reference's
corrupt-record contract (binary.rs:238-270). Each output row carries
(path, offset, length, data), the reference's BinaryRecord shape
(binary.rs:99-106).

Scale note: TFRecord files are not block-splittable (no sync markers),
so parallelism is per-file — same as the reference's one-reader-per-
file model; shard your corpora into many files.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_MASK_DELTA = 0xA282EAD8
_POLY = 0x82F63B78  # reflected CRC32C (Castagnoli)


def _crc32c_table() -> np.ndarray:
    tbl = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (_POLY if c & 1 else 0)
        tbl[i] = c
    return tbl


_TABLE = _crc32c_table()


def crc32c(data: bytes) -> int:
    crc = 0xFFFFFFFF
    tbl = _TABLE
    for b in np.frombuffer(data, dtype=np.uint8):
        crc = (crc >> 8) ^ int(tbl[(crc ^ int(b)) & 0xFF])
    return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & 0xFFFFFFFF


class CorruptRecord(ValueError):
    """Frame checksum/length validation failed (binary.rs:238-270)."""


def write_tfrecords(path: str, payloads: list[bytes]) -> None:
    """Write a TFRecord file (test/fixture helper, driver-side)."""
    with open(path, "wb") as f:
        for p in payloads:
            ln = struct.pack("<Q", len(p))
            f.write(ln)
            f.write(struct.pack("<I", masked_crc(ln)))
            f.write(p)
            f.write(struct.pack("<I", masked_crc(p)))


def parse_tfrecord_bytes(
    blob: bytes, path: str = "", verify: bool = True
) -> list[tuple[str, int, int, bytes]]:
    """Parse one file's bytes → [(path, offset, length, data)]."""
    out = []
    pos = 0
    n = len(blob)
    while pos < n:
        if pos + 12 > n:
            raise CorruptRecord(f"{path}: truncated header at {pos}")
        (ln,) = struct.unpack_from("<Q", blob, pos)
        (lcrc,) = struct.unpack_from("<I", blob, pos + 8)
        if verify and masked_crc(blob[pos : pos + 8]) != lcrc:
            raise CorruptRecord(f"{path}: bad length crc at {pos}")
        start = pos + 12
        end = start + ln
        if end + 4 > n:
            raise CorruptRecord(f"{path}: truncated payload at {pos}")
        data = blob[start:end]
        (dcrc,) = struct.unpack_from("<I", blob, end)
        if verify and masked_crc(data) != dcrc:
            raise CorruptRecord(f"{path}: bad data crc at {pos}")
        out.append((path, start, ln, data))
        pos = end + 4
    return out


RECORD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("offset", T.LongType()),
        T.StructField("length", T.IntegerType()),
        T.StructField("data", T.BinaryType()),
    ]
)


def read_tfrecords(
    spark: SparkSession, path_glob: str, verify: bool = True
) -> DataFrame:
    """Distributed TFRecord scan: binaryFile source + frame parsing."""
    files = spark.read.format("binaryFile").load(path_glob)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_tfrecord_bytes(bytes(content), p, verify))
            yield pd.DataFrame(
                rows, columns=["path", "offset", "length", "data"]
            )

    return files.select("path", "content").mapInPandas(parse, RECORD_SCHEMA)
