"""Pure-Python Avro Object Container File codec (reference S14)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from ml_data_pipeline_spark.sources.avro import (
    read_avro_bytes,
    read_long,
    write_avro_bytes,
    write_long,
)

SCHEMA = T.StructType(
    [
        T.StructField("a", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DoubleType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("arr", T.ArrayType(T.IntegerType())),
    ]
)


def test_zigzag_varint_roundtrip():
    vals = [0, 1, -1, 63, 64, -64, -65, 2**31, -(2**31), 2**62, -(2**62)]
    buf = bytearray()
    for v in vals:
        write_long(buf, v)
    mv, pos, out = memoryview(bytes(buf)), 0, []
    for _ in vals:
        v, pos = read_long(mv, pos)
        out.append(v)
    assert out == vals


def test_container_roundtrip_with_nulls_and_arrays():
    rows = [
        (1, "hello", 3.14, True, [1, 2, 3]),
        (None, None, None, None, None),
        (-99, "émoji ✓", -0.0, False, []),
        (2**40, "", 1e308, True, [0, -5, 50257]),
    ]
    got = read_avro_bytes(write_avro_bytes(rows, SCHEMA), SCHEMA)
    assert len(got) == len(rows)
    for g, w in zip(got, rows):
        assert g[:4] == w[:4]
        assert (g[4] is None and w[4] is None) or list(g[4]) == list(w[4])


def test_empty_file_and_corrupt_sync():
    assert read_avro_bytes(write_avro_bytes([], SCHEMA), SCHEMA) == []
    blob = bytearray(write_avro_bytes([(1, "x", 1.0, True, [1])], SCHEMA))
    blob[-1] ^= 0xFF  # flip a sync byte
    with pytest.raises(ValueError, match="sync"):
        read_avro_bytes(bytes(blob), SCHEMA)
    with pytest.raises(ValueError, match="not an avro"):
        read_avro_bytes(b"PAR1xxxx", SCHEMA)
