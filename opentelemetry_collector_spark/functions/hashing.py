"""Hash parity helpers.

1. SHA-1 over typed canonical bytes — byte layout per the reference
   (``processor/processorhelper/hasher.go:37-77``): int64 LITTLE-endian 8B,
   float64 IEEE-754 bits little-endian 8B (binary.LittleEndian.PutUint64,
   hasher.go:53-57), bool one byte 0/1, string raw UTF-8. Golden digests:
   attributes_log_test.go:311-351.
   For strings plain ``F.sha1`` matches; for numerics we build the byte
   encoding JVM-side so no Python runs in the hot path.

2. murmur3_x86_32 — vectorized numpy implementation (public algorithm,
   Austin Appleby's MurmurHash3) over fixed 16-byte ids, used by the
   probabilistic sampler (``processor/probabilisticsamplerprocessor/
   probabilisticsampler.go:155-207`` implements the same function in Go).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def sha1_typed(col: Column, dtype: str) -> Column:
    """SHA-1 hex of the reference's canonical byte layout for `dtype`.

    dtype in {'string','int','double','bool'}.
    """
    if dtype == "string":
        return F.sha1(col.cast("string"))
    if dtype == "int":
        # int64 little-endian 8 bytes (hasher.go:52-54)
        return F.sha1(_int64_le_bytes(col.cast("long")))
    if dtype == "double":
        # IEEE-754 bits little-endian (hasher.go:55-57)
        return F.sha1(_int64_le_bytes(_double_bits(col.cast("double"))))
    if dtype == "bool":
        # single byte 1/0 (hasher.go:68-74); NULL propagates like every
        # other dtype — a bare otherwise() would hash NULL as false,
        # conflating absent and false attributes under dedup/matching
        b = col.cast("boolean")
        return F.sha1(
            F.when(b, F.lit(bytearray(b"\x01"))).when(~b, F.lit(bytearray(b"\x00")))
        )
    raise ValueError(f"unsupported dtype {dtype}")


def _int64_le_bytes(col: Column) -> Column:
    """long -> 8-byte little-endian binary, JVM-side.

    Spark lacks a to-binary-from-long builtin; build via hex + unhex
    (hex(long) is the big-endian hex of the two's-complement value) and
    swap the 8 hex pairs to match Go's binary.LittleEndian layout.
    (NOT F.reverse on the binary — that round-trips through string and
    mangles non-UTF-8 bytes.)
    """
    h = F.lpad(F.hex(col), 16, "0")
    return F.unhex(F.concat(*[F.substring(h, i * 2 + 1, 2) for i in range(7, -1, -1)]))


def _double_bits(col: Column) -> Column:
    """IEEE-754 bit pattern of a double as a long.

    Decompose double into sign/exponent/mantissa with pure SQL arithmetic.
    Handles normal/subnormal/zero/inf/nan the way java.lang.Double.
    doubleToLongBits does for the value range used in attribute payloads.
    """
    # No JVM builtin reinterprets double bits, so use a tiny Arrow-vectorized
    # UDF (batch-level numpy view, not per-row Python).
    @pandas_udf("long")
    def _bits(s: pd.Series) -> pd.Series:
        # to_numpy(float64) silently turns NULL into NaN — mask first so
        # NULL propagates (the string/int paths return NULL); also collapse
        # every NaN payload to the canonical quiet NaN, which is what
        # java.lang.Double.doubleToLongBits does (a raw .view would keep
        # payload bits and diverge)
        mask = s.notna().to_numpy()
        # copy: Arrow-backed to_numpy can hand back a read-only view
        a = np.array(s.to_numpy(dtype=np.float64, na_value=np.nan))
        a[np.isnan(a)] = np.float64(np.nan)  # canonical quiet NaN bits
        bits = a.view(np.int64)
        out = pd.Series(bits, dtype="Int64")
        out[~mask] = None
        return out

    return _bits(col)


# ---------------------------------------------------------------------------
# murmur3_x86_32 over fixed-length 16-byte keys, fully vectorized in numpy
# ---------------------------------------------------------------------------

_C1 = np.uint32(0xCC9E2D51)
_C2 = np.uint32(0x1B873593)


def _rotl32(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint32(r)) | (x >> np.uint32(32 - r))


def murmur3_32_x4(blocks: np.ndarray, seed: int) -> np.ndarray:
    """murmur3_x86_32 of N 16-byte keys given as uint32 array shape (N, 4)
    (little-endian words), no tail bytes (len % 4 == 0)."""
    with np.errstate(over="ignore"):
        h = np.full(blocks.shape[0], seed, dtype=np.uint32)
        for i in range(4):
            k = blocks[:, i].astype(np.uint32)
            k = k * _C1
            k = _rotl32(k, 15)
            k = k * _C2
            h ^= k
            h = _rotl32(h, 13)
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h ^= np.uint32(16)  # total length
        h ^= h >> np.uint32(16)
        h = h * np.uint32(0x85EBCA6B)
        h ^= h >> np.uint32(13)
        h = h * np.uint32(0xC2B2AE35)
        h ^= h >> np.uint32(16)
    return h


def hex16_to_u32x4(hexes: "np.ndarray") -> np.ndarray:
    """Vectorized 32-hex-char strings -> (N,4) little-endian uint32 words."""
    joined = "".join(hexes.tolist())
    chars = np.frombuffer(joined.encode("ascii"), dtype=np.uint8).reshape(-1, 32)
    # a-f (97+), A-F (65+), 0-9 — uppercase hex (F.hex() output, Go-style
    # trace ids) must decode too, not silently corrupt
    nib = np.where(
        chars >= 97, chars - 87, np.where(chars >= 65, chars - 55, chars - 48)
    ).astype(np.uint8)
    byts = (nib[:, 0::2] << 4 | nib[:, 1::2]).astype(np.uint8)  # (N,16)
    return byts.view("<u4").reshape(-1, 4)


def murmur3_32_pure(data: bytes, seed: int) -> int:
    """Scalar reference implementation (tests only) — full algorithm incl.
    tail handling; mirrors probabilisticsampler.go:155-207."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = int.from_bytes(data[i * 4 : i * 4 + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = data[nblocks * 4 :]
    k = 0
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h
