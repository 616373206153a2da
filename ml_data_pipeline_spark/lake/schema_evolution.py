"""Schema compatibility + widening lattice for the lake table.

Re-expresses (from scratch, in Spark's type system) the compatibility
contract of the reference's ``DataType::compatible_with`` /
``Field::compatible_with`` (/root/reference/ml-data/ml-data-core/src/
schema.rs:206-253, :421-424):

* any numeric type is compatible with any numeric type,
* List/Struct/Map/Array compare element-wise,
* Null is compatible with anything,
* a non-nullable target requires a non-nullable source.

On top of that we add the *widening* direction needed for CDC schema
evolution (Iceberg's rule set): int8→int16→int32→int64,
float→double, int→double, plus "add nullable column". Narrowing or
incompatible changes raise :class:`SchemaMismatch` — the analog of the
reference's ``Error::SchemaMismatch`` (ml-data-core/src/error.rs:33-35).
"""

from __future__ import annotations

from pyspark.sql import types as T


class SchemaMismatch(Exception):
    """Incoming schema cannot be merged into the table schema."""


def assert_lake_payload_type(schema: T.StructType) -> None:
    """Reject schemas the lake's LWW reduce cannot order — loudly.

    The merge reduce is ``max(struct(_seq, payload...))`` and Spark
    cannot ORDER maps (DATATYPE_MISMATCH.INVALID_ORDERING_TYPE), so a
    MapType payload column would fail deep inside the first merge with
    an analyzer error far from the cause. Reject it at ``create()`` /
    schema-evolution time instead, pointing at the canonical encoding
    (reference analog: DataType::Map, ml-data-core/src/schema.rs:87 —
    carried there as a value type because the Rust engine never orders
    rows by payload).
    """

    def walk(dt: T.DataType, path: str) -> None:
        if isinstance(dt, T.MapType):
            raise SchemaMismatch(
                f"MapType at {path!r} is not a lake payload type: the "
                "LWW reduce (max over struct(_seq, payload)) cannot "
                "order maps. Store the canonical sorted-entries "
                "encoding instead - lake.schema_evolution.map_to_entries"
                " (array<struct<key,value>>, key-sorted) on write, "
                "entries_to_map on read."
            )
        if isinstance(dt, T.ArrayType):
            walk(dt.elementType, path + "[]")
        elif isinstance(dt, T.StructType):
            for f in dt.fields:
                walk(f.dataType, f"{path}.{f.name}" if path else f.name)

    walk(schema, "")


def map_to_entries(col):
    """Canonical lake encoding of a map column: key-sorted
    ``array<struct<key,value>>``. Deterministic (map iteration order is
    not) and orderable, so it flows through the max-struct LWW reduce;
    equal maps encode byte-identically regardless of insertion order.
    """
    from pyspark.sql import functions as F

    return F.array_sort(F.map_entries(col))


def entries_to_map(col):
    """Inverse of :func:`map_to_entries` (read-side projection)."""
    from pyspark.sql import functions as F

    return F.map_from_entries(col)


_NUMERIC = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
)

# Widening order among integral / fractional types.
_INT_ORDER = [T.ByteType, T.ShortType, T.IntegerType, T.LongType]
_FLOAT_ORDER = [T.FloatType, T.DoubleType]


def _is_numeric(dt: T.DataType) -> bool:
    return isinstance(dt, _NUMERIC)


def compatible_with(source: T.DataType, target: T.DataType) -> bool:
    """True if values of ``source`` can flow into a column of ``target``.

    Mirrors the reference lattice: numeric↔numeric, element-wise for
    nested types, Null↔anything, exact match otherwise.
    """
    if isinstance(source, T.NullType) or isinstance(target, T.NullType):
        return True
    if _is_numeric(source) and _is_numeric(target):
        return True
    if isinstance(source, T.ArrayType) and isinstance(target, T.ArrayType):
        return compatible_with(source.elementType, target.elementType)
    if isinstance(source, T.MapType) and isinstance(target, T.MapType):
        return compatible_with(source.keyType, target.keyType) and compatible_with(
            source.valueType, target.valueType
        )
    if isinstance(source, T.StructType) and isinstance(target, T.StructType):
        if len(source.fields) != len(target.fields):
            return False
        return all(
            compatible_with(s.dataType, t.dataType)
            for s, t in zip(source.fields, target.fields)
        )
    return source == target


def merge_types(old: T.DataType, new: T.DataType) -> T.DataType:
    """Widen ``old`` to accommodate ``new`` (Iceberg-style evolution).

    Returns the (possibly widened) type, or raises SchemaMismatch.
    Widening only — an int64 column never narrows back to int32.
    """
    if old == new:
        return old
    if isinstance(new, T.NullType):
        return old
    if isinstance(old, T.NullType):
        return new
    for order in (_INT_ORDER, _FLOAT_ORDER):
        if type(old) in order and type(new) in order:
            return (
                old if order.index(type(old)) >= order.index(type(new)) else new
            )
    # int → float family: widen to double (safe superset at our scale).
    if type(old) in _INT_ORDER and type(new) in _FLOAT_ORDER:
        return T.DoubleType()
    if type(old) in _FLOAT_ORDER and type(new) in _INT_ORDER:
        return old if isinstance(old, T.DoubleType) else T.DoubleType()
    if isinstance(old, T.ArrayType) and isinstance(new, T.ArrayType):
        return T.ArrayType(
            merge_types(old.elementType, new.elementType),
            old.containsNull or new.containsNull,
        )
    if isinstance(old, T.MapType) and isinstance(new, T.MapType):
        return T.MapType(
            merge_types(old.keyType, new.keyType),
            merge_types(old.valueType, new.valueType),
            old.valueContainsNull or new.valueContainsNull,
        )
    if isinstance(old, T.StructType) and isinstance(new, T.StructType):
        return merge_schemas(old, new)
    raise SchemaMismatch(f"cannot widen {old.simpleString()} to {new.simpleString()}")


def merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Merge an incoming batch schema into the table schema.

    Supported evolutions: add column (appended, nullable), widen type
    per :func:`merge_types`. Column drops are NOT applied (missing
    columns in the batch simply arrive as null) — same as Iceberg's
    default MERGE behavior. Field order of ``old`` is preserved; new
    fields append in ``new``'s order.
    """
    by_name = {f.name: f for f in new.fields}
    out: list[T.StructField] = []
    for f in old.fields:
        if f.name in by_name:
            nf = by_name.pop(f.name)
            merged = merge_types(f.dataType, nf.dataType)
            out.append(T.StructField(f.name, merged, f.nullable or nf.nullable))
        else:
            out.append(f)
    for f in new.fields:  # preserves new-schema ordering of additions
        if f.name in by_name:
            # Added columns are always nullable: rows written before the
            # evolution have no value for them.
            out.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(out)
