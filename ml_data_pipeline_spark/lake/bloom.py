"""Per-file key-membership blooms + a driver-side XXH64 port.

Two pieces of the point-lookup fast path (reference analog: the
parquet writer's per-column bloom filter knobs,
/root/reference/ml-data/ml-data-readers/src/parquet/writer.rs:37-41):

* **XXH64** — a pure-Python implementation of the public XXH64
  algorithm (Yann Collet's xxHash, public spec), bit-identical to
  Spark's ``F.xxhash64`` for string and bigint columns at Spark's
  fixed seed 42 (pinned by tests/test_lake_table.py bucket-parity
  over random keys). This lets ``LakeTable.lookup`` compute the
  key's bucket on the driver — a point lookup must not launch a
  Spark job before the read.
* **KeyBloom** — a tiny per-data-file bloom over the key column,
  built executor-side during the post-write manifest job and stored
  (base64) in the snapshot's ``FileEntry``. ``lookup`` consults it to
  skip delta files that cannot contain the key: on a multi-delta
  bucket the scan drops from O(files-in-bucket) to ~O(1 file). No
  false negatives (a pruned file provably lacks the key), so the
  reduce over surviving files is exact.

Double hashing (h1 + i·h2, Kirsch–Mitzenmacher) over the two halves
of one XXH64 per key keeps the build vectorizable and the driver-side
membership check dependency-free.
"""

from __future__ import annotations

import base64
import struct

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42  # Spark's fixed xxhash64 seed (catalyst XxHash64)


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    return (_rotl(acc, 31) * _P1) & _M


def _merge_round(acc: int, val: int) -> int:
    acc ^= _round(0, val)
    return (acc * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte string (public xxHash spec)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            (a, b, c, d) = struct.unpack_from("<QQQQ", data, i)
            v1, v2, v3, v4 = (
                _round(v1, a),
                _round(v2, b),
                _round(v3, c),
                _round(v4, d),
            )
            i += 32
        h = (
            _rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)
        ) & _M
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        (k,) = struct.unpack_from("<Q", data, i)
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        (k,) = struct.unpack_from("<I", data, i)
        h ^= (k * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """Spark ``xxhash64`` of a BIGINT column value: XXH64 over the
    value's 8 little-endian bytes (catalyst hashes longs via
    hashLong = the 8-byte block path)."""
    return xxh64(struct.pack("<q", int(value)), seed)


def spark_xxhash64(value, seed: int = SPARK_SEED) -> int:
    """Spark-compatible xxhash64 of a string or integer key, as a
    SIGNED 64-bit value (Spark returns LongType)."""
    if isinstance(value, (int, np.integer)):
        h = xxh64_long(int(value), seed)
    elif isinstance(value, str):
        h = xxh64(value.encode("utf-8"), seed)
    elif isinstance(value, (bytes, bytearray)):
        h = xxh64(bytes(value), seed)
    else:
        raise TypeError(f"unsupported key type {type(value)!r}")
    return h - (1 << 64) if h >= (1 << 63) else h


def bucket_of(value, n_buckets: int) -> int:
    """Driver-side mirror of ``LakeTable.bucket_expr``:
    ``pmod(xxhash64(key), n_buckets)``."""
    return spark_xxhash64(value) % n_buckets


# ------------------------------------------------------------------ bloom

_BLOOM_VERSION = 1
_BITS_PER_KEY = 10
_N_HASHES = 5
_MAX_BITS = 1 << 20  # 128 KiB of bits — caps snapshot-JSON growth


def _hash_pair(key) -> tuple[int, int]:
    """(h1, h2) for double hashing: the two halves of one XXH64 plus a
    re-mix so h2 is odd (never collapses the probe sequence)."""
    if isinstance(key, (int, np.integer)):
        h = xxh64_long(int(key))
    else:
        h = xxh64(str(key).encode("utf-8"))
    h1 = h & 0xFFFFFFFF
    h2 = ((h >> 32) | 1) & 0xFFFFFFFF
    return h1, h2


def _n_bits(n_keys: int) -> int:
    bits = max(256, n_keys * _BITS_PER_KEY)
    p = 1 << (bits - 1).bit_length()  # next pow2 → cheap masking
    return min(p, _MAX_BITS)


def bloom_build(keys) -> str:
    """Build a serialized bloom over an iterable/array of keys.

    Vectorized per-probe via numpy; sized at ~10 bits/key (≈1% FPR at
    5 probes), capped — an oversized file degrades to more false
    positives, never false negatives.
    """
    keys = list(keys)
    bits = _n_bits(len(keys))
    mask = bits - 1
    arr = np.zeros(bits // 8, dtype=np.uint8)
    if keys:
        pairs = np.array([_hash_pair(k) for k in keys], dtype=np.uint64)
        h1, h2 = pairs[:, 0], pairs[:, 1]
        for i in range(_N_HASHES):
            idx = (h1 + np.uint64(i) * h2) & np.uint64(mask)
            np.bitwise_or.at(arr, (idx >> np.uint64(3)).astype(np.int64),
                             np.left_shift(np.uint8(1),
                                           (idx & np.uint64(7)).astype(np.uint8)))
    payload = struct.pack("<BBI", _BLOOM_VERSION, _N_HASHES, bits) + arr.tobytes()
    return base64.b64encode(payload).decode("ascii")


def bloom_might_contain(serialized: str, key) -> bool:
    """Membership test; True on any parse surprise (never prune on
    doubt — pruning must be sound, not clever)."""
    try:
        payload = base64.b64decode(serialized)
        version, k, bits = struct.unpack_from("<BBI", payload, 0)
        if version != _BLOOM_VERSION:
            return True
        arr = payload[6:]
        mask = bits - 1
        h1, h2 = _hash_pair(key)
        for i in range(k):
            idx = (h1 + i * h2) & mask
            if not (arr[idx >> 3] >> (idx & 7)) & 1:
                return False
        return True
    except Exception:
        return True
