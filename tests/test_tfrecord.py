"""TFRecord framing source tests (reference S8/C1 parity)."""

from __future__ import annotations

import struct

import pytest

from ml_data_pipeline_spark.sources.tfrecord import (
    CorruptRecord,
    crc32c,
    masked_crc,
    parse_tfrecord_bytes,
    read_tfrecords,
    write_tfrecords,
)


def test_crc32c_known_vectors():
    # RFC 3720 test vector: 32 bytes of zeros → 0x8a9136aa
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_crc32c_vectorized_kernel_matches_and_is_fast():
    """The bulk kernel (numpy interleaved chunks + GF(2) zero-advance
    fold) must agree with the byte-at-a-time Sarwate loop at every
    boundary length, and be decisively faster than per-byte Python at
    a 1 MB payload (the round-1 implementation was a per-byte loop)."""
    import os
    import random
    import time

    from ml_data_pipeline_spark.sources.tfrecord import _T0

    def bytewise(data: bytes) -> int:
        crc = 0xFFFFFFFF
        for b in data:
            crc = (crc >> 8) ^ _T0[(crc ^ b) & 0xFF]
        return crc ^ 0xFFFFFFFF

    random.seed(7)
    for n in [0, 1, 7, 8, 9, 511, 512, 513, 1023, 1024, 1025, 5000]:
        d = bytes(random.randrange(256) for _ in range(n))
        assert crc32c(d) == bytewise(d), n

    payload = os.urandom(1 << 20)
    t0 = time.perf_counter()
    got = crc32c(payload)
    fast = time.perf_counter() - t0
    assert got == bytewise(payload)
    # per-byte Python runs ~1 MB in >0.1 s even on a fast machine; the
    # vectorized kernel does >50 MB/s — assert a conservative 20 MB/s
    # so a noisy-neighbor CPU can't flake the test.
    assert fast < 0.05, f"1 MB crc took {fast:.3f}s — not vectorized?"


def test_roundtrip_local(tmp_path):
    payloads = [b"hello", b"", b"x" * 1000, bytes(range(256))]
    p = str(tmp_path / "a.tfrecord")
    write_tfrecords(p, payloads)
    recs = parse_tfrecord_bytes(open(p, "rb").read(), p)
    assert [r[3] for r in recs] == payloads
    assert [r[2] for r in recs] == [len(x) for x in payloads]
    # offsets point at payload start: 12B header before each
    assert recs[0][1] == 12


def test_corrupt_record_detected(tmp_path):
    p = str(tmp_path / "bad.tfrecord")
    write_tfrecords(p, [b"good payload"])
    blob = bytearray(open(p, "rb").read())
    blob[14] ^= 0xFF  # flip a payload byte
    with pytest.raises(CorruptRecord):
        parse_tfrecord_bytes(bytes(blob), p)
    # truncated file
    with pytest.raises(CorruptRecord):
        parse_tfrecord_bytes(bytes(blob[:-2]), p)


def test_distributed_read(spark, tmp_path):
    for i in range(3):
        write_tfrecords(
            str(tmp_path / f"part-{i}.tfrecord"),
            [f"doc-{i}-{j}".encode() for j in range(5)],
        )
    df = read_tfrecords(spark, str(tmp_path / "*.tfrecord"))
    rows = df.collect()
    assert len(rows) == 15
    texts = sorted(bytes(r["data"]).decode() for r in rows)
    assert texts[0] == "doc-0-0" and len(set(texts)) == 15
    # length-prefix framing preserved
    assert all(r["length"] == len(bytes(r["data"])) for r in rows)


def test_distributed_writer_roundtrip(spark, sf_dir, tmp_path):
    """Executor-side TFRecord write (one file per partition) → the
    distributed reader recovers every payload byte-exactly."""
    from pyspark.sql import functions as F

    from ml_data_pipeline_spark.sources.tables import load_table
    from ml_data_pipeline_spark.sources.tfrecord import (
        write_tfrecords_distributed,
    )

    d = (
        load_table(spark, sf_dir, "documents")
        .select(F.encode("text", "UTF-8").alias("data"))
        .repartition(4)
    )
    out = str(tmp_path / "tfr")
    write_tfrecords_distributed(d, out)
    import glob

    files = glob.glob(out + "/*.tfrecord")
    assert len(files) >= 2  # really sharded
    back = read_tfrecords(spark, out + "/*.tfrecord")
    want = sorted(
        r[0] for r in load_table(spark, sf_dir, "documents").select("text").collect()
    )
    got = sorted(bytes(r["data"]).decode() for r in back.collect())
    assert got == want


def test_mask_matches_reference_formula():
    # mask(c) = rot15(c) + 0xa282ead8 (binary.rs:392-395)
    for data in (b"abc", b"", b"\x01\x02"):
        c = crc32c(data)
        expected = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert masked_crc(data) == expected
        assert struct.pack("<I", expected)  # fits u32
