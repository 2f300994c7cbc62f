"""Driver-side Murmur3 x86_32 — bit-identical to Spark's ``F.hash()``.

Why this exists: the table's bucket id is ``pmod(hash(bucket_col), n)``
(``LakeTable.bucket_expr``).  A point lookup (``where repo = X``) can
therefore be served from 1/n of the table's files — but only if the
DRIVER can compute the bucket id without launching a Spark job.  This
module reimplements the public Murmur3 x86_32 algorithm (Austin Appleby,
public domain; the same variant Spark/Guava use, seed 42) for the column
types buckets are keyed on in practice: int, bigint, and string.

Parity with Spark is pinned by tests/test_bucket_pruning.py against
``F.hash`` over adversarial values (multi-byte UTF-8, negative numbers,
empty string).  Unsupported types return None and callers skip pruning —
correctness never depends on this fast path.

Spark semantics mirrored exactly (spark Murmur3Hash expression):
- int / smallint / tinyint / date → hashInt(value)
- bigint / timestamp            → hashLong(value)
- string                        → hashUnsafeBytes(utf8, tail bytes SIGNED)
- NULL                          → hash is the seed unchanged (42)
"""

from __future__ import annotations

_MASK = 0xFFFFFFFF
C1 = 0xCC9E2D51
C2 = 0x1B873593
SPARK_SEED = 42


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _MASK


def _mix_k1(k1: int) -> int:
    k1 = (k1 * C1) & _MASK
    k1 = _rotl32(k1, 15)
    return (k1 * C2) & _MASK


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK


def _fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK
    h1 ^= h1 >> 16
    return h1


def _to_signed32(x: int) -> int:
    x &= _MASK
    return x - (1 << 32) if x >= (1 << 31) else x


def hash_int(value: int, seed: int = SPARK_SEED) -> int:
    """Murmur3 of a 32-bit int (Spark hashInt). Returns signed int32."""
    h1 = _mix_h1(seed & _MASK, _mix_k1(value & _MASK))
    return _to_signed32(_fmix(h1, 4))


def hash_long(value: int, seed: int = SPARK_SEED) -> int:
    """Murmur3 of a 64-bit long (Spark hashLong): low word then high word."""
    v = value & 0xFFFFFFFFFFFFFFFF
    low, high = v & _MASK, (v >> 32) & _MASK
    h1 = _mix_h1(seed & _MASK, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    return _to_signed32(_fmix(h1, 8))


def hash_string(value: str, seed: int = SPARK_SEED) -> int:
    """Murmur3 of a string's UTF-8 bytes (Spark hashUnsafeBytes): 4-byte
    little-endian words, then the tail one SIGNED byte at a time."""
    data = value.encode("utf-8")
    n = len(data)
    aligned = n - n % 4
    h1 = seed & _MASK
    for i in range(0, aligned, 4):
        word = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(word))
    for i in range(aligned, n):
        b = data[i]
        if b >= 128:  # Java bytes are signed
            b -= 256
        h1 = _mix_h1(h1, _mix_k1(b & _MASK))
    return _to_signed32(_fmix(h1, n))


def spark_hash(value, dtype_name: str, seed: int = SPARK_SEED) -> int | None:
    """``F.hash(col)`` for a scalar of Spark type ``dtype_name``
    (``DataType.simpleString()``), or None when the type isn't mirrored
    here (callers must then skip driver-side pruning)."""
    if value is None:
        # Murmur3Hash folds nothing for a NULL child: result is the seed
        return _to_signed32(seed)
    if dtype_name in ("int", "integer", "smallint", "tinyint", "date"):
        if dtype_name == "date":
            import datetime

            # Spark hashes DateType as its physical int: days since epoch
            if isinstance(value, datetime.datetime):
                value = value.date()
            if isinstance(value, datetime.date):
                value = (value - datetime.date(1970, 1, 1)).days
        return hash_int(int(value), seed)
    if dtype_name in ("bigint", "long"):
        return hash_long(int(value), seed)
    if dtype_name == "string":
        return hash_string(str(value), seed)
    return None


def bucket_of(value, dtype_name: str, num_buckets: int) -> int | None:
    """The table bucket id ``pmod(hash(value), num_buckets)`` computed
    driver-side, or None when the type isn't supported."""
    h = spark_hash(value, dtype_name)
    if h is None:
        return None
    return h % num_buckets  # Python % is already non-negative, like pmod
