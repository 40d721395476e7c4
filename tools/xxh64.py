"""Pure-Python XXH64 compatible with Spark's ``xxhash64`` expression.

Implements the public xxHash64 algorithm (Yann Collet's XXH64,
https://github.com/Cyan4973/xxHash — the spec is public domain) plus
the two Spark entry points our oracles need:

* ``spark_xxhash64_str(s)`` — Spark's ``xxhash64(string_col)``:
  XXH64 over the UTF-8 bytes, seed 42, returned as *signed* int64.
* ``spark_xxhash64_longs(*ls)`` — Spark's multi-argument
  ``xxhash64(c1, c2, ...)`` over LongType columns: each long is
  hashed as one 8-byte block with the previous result as seed
  (chain starts at 42).

Used by tools/udf_oracles.py to give the xxhash-based dedup queries
real DuckDB oracles (they were rows-only in r1/r2 because DuckDB has
no xxhash64).  This module deliberately shares NO code with the
engine: the engine uses the JVM primitive, this is an independent
reimplementation from the public spec, verified against the JVM in
tests/test_xxh64.py.
"""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) & _MASK) | (x >> (64 - r))


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _MASK, 31) * _P1) & _MASK


def xxh64(data: bytes, seed: int) -> int:
    """Reference XXH64 of ``data`` with ``seed`` (unsigned 64-bit)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i : i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8 : i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16 : i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24 : i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * _P1 + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        k = int.from_bytes(data[i : i + 8], "little")
        h ^= _round(0, k)
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i : i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    return _fmix(h)


def _signed(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def _hash_long(value: int, seed: int) -> int:
    """One 8-byte block (Spark's XXH64.hashLong): unsigned result."""
    h = (seed + _P5 + 8) & _MASK
    h ^= _round(0, value & _MASK)
    h = (_rotl(h, 27) * _P1 + _P4) & _MASK
    return _fmix(h)


def spark_xxhash64_str(s: str, seed: int = 42) -> int:
    """Spark ``xxhash64(string)``: signed int64 of the UTF-8 bytes."""
    return _signed(xxh64(s.encode("utf-8"), seed))


def spark_xxhash64_longs(*values: int, seed: int = 42) -> int:
    """Spark ``xxhash64(long, long, ...)``: seed-chained, signed int64."""
    h = seed
    for v in values:
        h = _hash_long(v, h)
    return _signed(h)
