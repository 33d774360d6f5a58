"""Pure-Python replica of Spark's ``xxhash64`` expression.

Why it exists: the manifest layer prunes FILES on the driver from
collected manifest rows (sources.read_corpus) — launching a Spark job
to test one key against a few thousand bloom bitmaps would cost more
than the scan it saves. The driver-side probe therefore needs the SAME
hash Spark computed when the bitmaps were BUILT executor-side
(bloom.py builds with ``F.xxhash64``). xxHash64 is a public algorithm
(Yann Collet's xxHash, BSD); Spark's expression applies it per child
value with the running hash as the next seed (seed 42 at the start)
and type-specific fast paths for fixed-width values — replicated here
and pinned bit-for-bit against ``F.xxhash64`` by
tests/test_xxh64_parity.py over random longs, ints, strings, and
multi-child chains.

Everything is plain integer math masked to 64 bits; no dependencies.
"""

from __future__ import annotations

_MASK = 0xFFFFFFFFFFFFFFFF
_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64_long(value: int, seed: int) -> int:
    """Spark XXH64.hashLong: the 8-byte fixed-width fast path."""
    value &= _MASK
    h = (seed + _P5 + 8) & _MASK
    h ^= (_rotl((value * _P2) & _MASK, 31) * _P1) & _MASK
    h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
    return _fmix(h)


def xxh64_int(value: int, seed: int) -> int:
    """Spark XXH64.hashInt: the 4-byte fixed-width fast path."""
    h = (seed + _P5 + 4) & _MASK
    h ^= ((value & 0xFFFFFFFF) * _P1) & _MASK
    h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
    return _fmix(h)


def xxh64_bytes(data: bytes, seed: int) -> int:
    """Generic XXH64 over a byte string (Spark hashUnsafeBytes, which
    is canonical little-endian xxHash64)."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i <= n - 32:
            for off, v in ((0, 1), (8, 2), (16, 3), (24, 4)):
                lane = int.from_bytes(data[i + off:i + off + 8], "little")
                acc = {1: v1, 2: v2, 3: v3, 4: v4}[v]
                acc = (acc + lane * _P2) & _MASK
                acc = (_rotl(acc, 31) * _P1) & _MASK
                if v == 1:
                    v1 = acc
                elif v == 2:
                    v2 = acc
                elif v == 3:
                    v3 = acc
                else:
                    v4 = acc
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12)
             + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _MASK, 31) * _P1) & _MASK
            h = ((h * _P1) + _P4) & _MASK
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i <= n - 8:
        lane = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((lane * _P2) & _MASK, 31) * _P1) & _MASK
        h = ((_rotl(h, 27) * _P1) + _P4) & _MASK
        i += 8
    if i <= n - 4:
        lane = int.from_bytes(data[i:i + 4], "little")
        h ^= (lane * _P1) & _MASK
        h = ((_rotl(h, 23) * _P2) + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    return _fmix(h)


def spark_xxhash64(*values, seed: int = 42) -> int:
    """Replicates ``F.xxhash64(*cols)`` for driver-side probing: each
    value hashes with the running hash as seed, starting at 42; Python
    ints are treated as Spark LongType (pass ``("int", v)`` for a true
    IntegerType child), str as StringType (UTF-8 bytes), bytes as
    BinaryType. Returns Spark's SIGNED long."""
    h = seed
    for v in values:
        if isinstance(v, tuple) and len(v) == 2 and v[0] == "int":
            h = xxh64_int(v[1], h)
        elif isinstance(v, bool):
            raise TypeError("BooleanType children are not replicated")
        elif isinstance(v, int):
            h = xxh64_long(v, h)
        elif isinstance(v, str):
            h = xxh64_bytes(v.encode("utf-8"), h)
        elif isinstance(v, (bytes, bytearray)):
            h = xxh64_bytes(bytes(v), h)
        else:
            raise TypeError(f"unsupported xxhash64 child type: {type(v)}")
    return h - (1 << 64) if h >= (1 << 63) else h
