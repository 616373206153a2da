"""Reference type-system → Spark mapping helpers (SURVEY §1.3).

Most rows of the mapping table are structural (Spark has the type);
this module carries the two that need convention rather than types,
so they are CODE instead of prose:

* **Time32/Time64** (reference schema.rs:69-72): Spark SQL has no
  time-of-day type. The mapping is ``LongType`` + field metadata
  ``{"ref_type": "time32"|"time64", "unit": ...}`` holding the value
  as an integer count of ``unit`` since midnight. :func:`time_field`
  builds the field; :func:`time_to_micros` / :func:`micros_to_time_str`
  are the expression-level codecs (pure JVM arithmetic).
* **unsigned ints** (schema.rs:30-39): Spark has no unsigned types —
  :func:`widen_unsigned` returns the lossless widening target
  (u8→short, u16→int, u32→long, u64→decimal(20,0)).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

_TIME_UNITS = {"s": 1_000_000, "ms": 1_000, "us": 1, "ns": None}
REF_TYPE_KEY = "ref_type"
UNIT_KEY = "unit"


def time_field(
    name: str, bits: int = 64, unit: str = "us", nullable: bool = True
) -> T.StructField:
    """StructField for a reference ``Time32``/``Time64`` column:
    LongType carrying integer ``unit``-since-midnight, with the
    reference type recorded in field metadata so readers can recover
    the intent. Time32 admits s/ms, Time64 us/ns (the reference's own
    constraint)."""
    if bits == 32 and unit not in ("s", "ms"):
        raise ValueError("Time32 carries s or ms")
    if bits == 64 and unit not in ("us", "ns"):
        raise ValueError("Time64 carries us or ns")
    return T.StructField(
        name,
        T.LongType(),
        nullable,
        metadata={REF_TYPE_KEY: f"time{bits}", UNIT_KEY: unit},
    )


def time_to_micros(col: Column, unit: str) -> Column:
    """Normalize a time-of-day integer column to microseconds since
    midnight (ns truncates toward zero — the reference's cast rule for
    narrowing time units)."""
    if unit == "ns":
        return (col / 1000).cast("long")
    factor = _TIME_UNITS[unit]
    return (col * factor).cast("long")


def micros_to_time_str(micros: Column) -> Column:
    """Render µs-since-midnight as ``HH:MM:SS.ffffff`` — pure JVM
    expression (lpad + concat), no UDF."""
    h = F.floor(micros / 3_600_000_000)
    m = F.floor((micros % 3_600_000_000) / 60_000_000)
    s = F.floor((micros % 60_000_000) / 1_000_000)
    frac = (micros % 1_000_000).cast("long")

    def pad(c: Column, n: int) -> Column:
        return F.lpad(c.cast("string"), n, "0")

    return F.concat_ws(
        ":", pad(h, 2), pad(m, 2), F.concat(pad(s, 2), F.lit("."), pad(frac, 6))
    )


def widen_unsigned(bits: int) -> T.DataType:
    """Lossless Spark target for a reference unsigned int
    (schema.rs:30-39): the next-wider signed type; u64 → decimal(20,0)
    because no signed 64-bit type holds 2^64-1."""
    return {
        8: T.ShortType(),
        16: T.IntegerType(),
        32: T.LongType(),
        64: T.DecimalType(20, 0),
    }[bits]
