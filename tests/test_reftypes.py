"""Time32/Time64 + unsigned-widening mapping (SURVEY §1.3 rows that
previously existed only as prose — VERDICT r4 'Missing #4')."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from ml_data_pipeline_spark.functions.reftypes import (
    micros_to_time_str,
    time_field,
    time_to_micros,
    widen_unsigned,
)


def test_time_field_metadata_and_unit_constraints():
    f32 = time_field("t", bits=32, unit="ms")
    assert f32.dataType == T.LongType()
    assert f32.metadata == {"ref_type": "time32", "unit": "ms"}
    f64 = time_field("t", bits=64, unit="ns")
    assert f64.metadata == {"ref_type": "time64", "unit": "ns"}
    with pytest.raises(ValueError):
        time_field("t", bits=32, unit="us")  # Time32 is s/ms only
    with pytest.raises(ValueError):
        time_field("t", bits=64, unit="ms")  # Time64 is us/ns only


def test_time_roundtrip_through_spark(spark):
    # 13:45:30.123456 in each carrier unit
    us = ((13 * 60 + 45) * 60 + 30) * 1_000_000 + 123_456
    schema = T.StructType(
        [
            time_field("t_s", 32, "s"),
            time_field("t_ms", 32, "ms"),
            time_field("t_us", 64, "us"),
            time_field("t_ns", 64, "ns"),
        ]
    )
    df = spark.createDataFrame(
        [(us // 1_000_000, us // 1_000, us, us * 1_000 + 789)], schema
    )
    # metadata survives the DataFrame round trip
    assert df.schema["t_us"].metadata["ref_type"] == "time64"
    row = df.select(
        *[
            micros_to_time_str(
                time_to_micros(F.col(c), df.schema[c].metadata["unit"])
            ).alias(c)
            for c in df.columns
        ]
    ).collect()[0]
    assert row["t_s"] == "13:45:30.000000"
    assert row["t_ms"] == "13:45:30.123000"
    assert row["t_us"] == "13:45:30.123456"
    assert row["t_ns"] == "13:45:30.123456"  # ns truncates to µs


def test_widen_unsigned_lossless():
    assert widen_unsigned(8) == T.ShortType()
    assert widen_unsigned(16) == T.IntegerType()
    assert widen_unsigned(32) == T.LongType()
    assert widen_unsigned(64) == T.DecimalType(20, 0)
    # the widening target holds the max value of each unsigned width
    import decimal

    assert decimal.Decimal(2**64 - 1) < decimal.Decimal(10**20)
