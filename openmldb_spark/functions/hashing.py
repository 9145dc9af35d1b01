"""FarmHash Fingerprint64 — exact parity for the reference's ``hash64``
/ ``farm_fingerprint`` scalar (udf.h:301-310 ``Hash64`` calls
``FarmFingerprint`` = ``farmhash::Fingerprint64`` over the value's raw
little-endian bytes, udf.cc:1418-1420).

The hash input is ``CCallDataTypeTrait::to_bytes_ref``
(literal_traits.h:463-527): ``sizeof(T)`` LE bytes for numerics/bool,
the int64 epoch-ms for timestamps, the packed int32
``(y-1900)<<16 | (m-1)<<8 | d`` for dates (include/base/type.h:81-98),
raw bytes for strings.

Fingerprint64 is the platform-independent ``farmhashna::Hash64`` from
the public FarmHash algorithm (github.com/google/farmhash,
farmhash.cc), re-derived here in pure Python over arbitrary-precision
ints masked to 64 bits. It is exposed to SQL as a vectorized pandas
UDF ``__omls_hash64(value_str, typeof)`` — value arrives as its Spark
string cast plus the static type name, and is re-packed to the
reference's byte layout per row. This is a parity/feature function,
not a hot-path kernel: Arrow moves the batches, Python hashes them.
"""

from __future__ import annotations

import datetime
import struct

import numpy as np
import pandas as pd

_M = (1 << 64) - 1
_K0 = 0xC3A5C85C97CB3127
_K1 = 0xB492B66FBE98F273
_K2 = 0x9AE16A3B2F90404F


def _rot(v: int, s: int) -> int:
    return v if s == 0 else ((v >> s) | (v << (64 - s))) & _M


def _smix(v: int) -> int:
    return (v ^ (v >> 47)) & _M


def _f64(s: bytes, i: int = 0) -> int:
    return int.from_bytes(s[i:i + 8], "little")


def _f32(s: bytes, i: int = 0) -> int:
    return int.from_bytes(s[i:i + 4], "little")


def _h16(u: int, v: int, mul: int) -> int:
    a = ((u ^ v) * mul) & _M
    a ^= a >> 47
    b = ((v ^ a) * mul) & _M
    b ^= b >> 47
    return (b * mul) & _M


def _len_0_16(s: bytes) -> int:
    n = len(s)
    if n >= 8:
        mul = (_K2 + n * 2) & _M
        a = (_f64(s) + _K2) & _M
        b = _f64(s, n - 8)
        c = (_rot(b, 37) * mul + a) & _M
        d = ((_rot(a, 25) + b) * mul) & _M
        return _h16(c, d, mul)
    if n >= 4:
        mul = (_K2 + n * 2) & _M
        a = _f32(s)
        return _h16((n + (a << 3)) & _M, _f32(s, n - 4), mul)
    if n > 0:
        a, b, c = s[0], s[n >> 1], s[n - 1]
        y = (a + (b << 8)) & 0xFFFFFFFF
        z = (n + (c << 2)) & 0xFFFFFFFF
        return (_smix(((y * _K2) ^ (z * _K0)) & _M) * _K2) & _M
    return _K2


def _len_17_32(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & _M
    a = (_f64(s) * _K1) & _M
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & _M
    d = (_f64(s, n - 16) * _K2) & _M
    return _h16((_rot((a + b) & _M, 43) + _rot(c, 30) + d) & _M,
                (a + _rot((b + _K2) & _M, 18) + c) & _M, mul)


def _len_33_64(s: bytes) -> int:
    n = len(s)
    mul = (_K2 + n * 2) & _M
    a = (_f64(s) * _K2) & _M
    b = _f64(s, 8)
    c = (_f64(s, n - 8) * mul) & _M
    d = (_f64(s, n - 16) * _K2) & _M
    y = (_rot((a + b) & _M, 43) + _rot(c, 30) + d) & _M
    z = _h16(y, (a + _rot((b + a) & _M, 18) + c) & _M, mul)
    e = (_f64(s, 16) * mul) & _M
    f = _f64(s, 24)
    g = ((y + _f64(s, n - 32)) * mul) & _M
    h = ((z + _f64(s, n - 24)) * mul) & _M
    return _h16((_rot((e + f) & _M, 43) + _rot(g, 30) + h) & _M,
                (e + _rot((f + a) & _M, 18) + g) & _M, mul)


def _weak32(w: int, x: int, y: int, z: int, a: int, b: int):
    a = (a + w) & _M
    b = _rot((b + a + z) & _M, 21)
    c = a
    a = (a + x + y) & _M
    b = (b + _rot(a, 44)) & _M
    return (a + z) & _M, (b + c) & _M


def _weak32_at(s: bytes, i: int, a: int, b: int):
    return _weak32(_f64(s, i), _f64(s, i + 8), _f64(s, i + 16),
                   _f64(s, i + 24), a, b)


def fingerprint64(s: bytes) -> int:
    """farmhashna::Hash64 (unsigned 64-bit)."""
    n = len(s)
    if n <= 16:
        return _len_0_16(s)
    if n <= 32:
        return _len_17_32(s)
    if n <= 64:
        return _len_33_64(s)
    seed = 81
    x = seed
    y = (seed * _K1 + 113) & _M
    z = (_smix((y * _K2 + 113) & _M) * _K2) & _M
    v0 = v1 = w0 = w1 = 0
    x = (x * _K2 + _f64(s)) & _M
    end = ((n - 1) // 64) * 64
    last64 = end + ((n - 1) & 63) - 63
    i = 0
    while True:
        x = (_rot((x + y + v0 + _f64(s, i + 8)) & _M, 37) * _K1) & _M
        y = (_rot((y + v1 + _f64(s, i + 48)) & _M, 42) * _K1) & _M
        x ^= w1
        y = (y + v0 + _f64(s, i + 40)) & _M
        z = (_rot((z + w0) & _M, 33) * _K1) & _M
        v0, v1 = _weak32_at(s, i, (v1 * _K1) & _M, (x + w0) & _M)
        w0, w1 = _weak32_at(s, i + 32, (z + w1) & _M,
                            (y + _f64(s, i + 16)) & _M)
        z, x = x, z
        i += 64
        if i == end:
            break
    mul = (_K1 + ((z & 0xFF) << 1)) & _M
    i = last64
    w0 = (w0 + ((n - 1) & 63)) & _M
    v0 = (v0 + w0) & _M
    w0 = (w0 + v0) & _M
    x = (_rot((x + y + v0 + _f64(s, i + 8)) & _M, 37) * _K1) & _M
    y = (_rot((y + v1 + _f64(s, i + 48)) & _M, 42) * _K1) & _M
    x ^= (w1 * 9) & _M
    y = (y + v0 * 9 + _f64(s, i + 40)) & _M
    z = (_rot((z + w0) & _M, 33) * mul) & _M
    v0, v1 = _weak32_at(s, i, (v1 * mul) & _M, (x + w0) & _M)
    w0, w1 = _weak32_at(s, i + 32, (z + w1) & _M,
                        (y + _f64(s, i + 16)) & _M)
    z, x = x, z
    return _h16((_h16(v0, w0, mul) + _smix(y) * _K0 + z) & _M,
                (_h16(v1, w1, mul) + x) & _M, mul)


def farm_fingerprint_signed(s: bytes) -> int:
    """Fingerprint64 bit-cast to int64 (udf.cc:1419 absl::bit_cast)."""
    u = fingerprint64(s)
    return u - (1 << 64) if u >= (1 << 63) else u


def _pack(val_str: str, ty: str) -> bytes | None:
    """Re-pack a Spark string cast into the reference's to_bytes_ref
    layout. Spark's numeric->string casts are shortest-round-trip, so
    parsing them back is exact."""
    t = ty.lower()
    if t in ("smallint", "short"):
        return struct.pack("<h", int(val_str))
    if t in ("int", "integer"):
        return struct.pack("<i", int(val_str))
    if t in ("bigint", "long"):
        return struct.pack("<q", int(val_str))
    if t == "float":
        return struct.pack("<f", np.float32(val_str))
    if t == "double":
        return struct.pack("<d", float(val_str))
    if t == "boolean":
        return struct.pack("<b", 1 if val_str == "true" else 0)
    if t.startswith("timestamp"):
        dt = pd.Timestamp(val_str).to_pydatetime().replace(
            tzinfo=datetime.timezone.utc)
        return struct.pack("<q", int(dt.timestamp() * 1000))
    if t == "date":
        y, m, d = (int(p) for p in val_str.split("-"))
        packed = ((y - 1900) << 16) | ((m - 1) << 8) | d
        return struct.pack("<i", packed)
    return val_str.encode("utf-8")     # string: raw bytes


def register_hash_udfs(spark) -> None:
    """Register ``__omls_hash64(value_str, type_str) -> bigint`` once
    per session; idempotent."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.LongType())
    def __omls_hash64(vals: pd.Series, tys: pd.Series) -> pd.Series:
        out = []
        for v, t in zip(vals, tys):
            if v is None or (isinstance(v, float) and v != v):
                out.append(None)
            else:
                out.append(farm_fingerprint_signed(_pack(v, t)))
        return pd.Series(out, dtype="Int64")

    spark.udf.register("__omls_hash64", __omls_hash64)
