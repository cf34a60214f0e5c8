"""Sampler + hash parity tests.

- murmur3_x86_32: vectorized numpy implementation vs a scalar reference
  implementation (the algorithm the reference embeds at
  processor/probabilisticsamplerprocessor/probabilisticsampler.go:155-207),
  plus public known-answer vectors.
- SHA-1 typed-byte layout per processor/processorhelper/hasher.go:37-77.
- sampler semantics: deterministic per id, priority override paths
  (probabilisticsampler.go:72-153).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.functions.hashing import (
    hex16_to_u32x4,
    murmur3_32_pure,
    murmur3_32_x4,
    sha1_typed,
)
from opentelemetry_collector_spark.operators.sample import probabilistic_sample, scaled_threshold


def test_murmur3_known_vectors():
    # public known-answer tests for murmur3_x86_32
    assert murmur3_32_pure(b"", 0) == 0
    assert murmur3_32_pure(b"", 1) == 0x514E28B7
    assert murmur3_32_pure(b"abc", 0) == 0xB3DD93FA
    assert murmur3_32_pure(b"Hello, world!", 0x9747B28C) == 0x24884CBA


@pytest.mark.parametrize("seed", [0, 1, 22, 0x9747B28C])
def test_vectorized_matches_scalar(seed):
    rng = np.random.default_rng(7)
    raw = rng.integers(0, 256, size=(64, 16), dtype=np.uint8)
    hexes = np.array([bytes(r).hex() for r in raw], dtype=object)
    got = murmur3_32_x4(hex16_to_u32x4(hexes), seed)
    want = np.array([murmur3_32_pure(bytes(r), seed) for r in raw], dtype=np.uint32)
    assert (got == want).all()


def test_scaled_threshold():
    # probabilisticsampler.go:46-49: numHashBuckets=0x4000
    assert scaled_threshold(100.0) == 0x4000
    assert scaled_threshold(0.0) == 0
    assert scaled_threshold(50.0) == 0x2000
    assert scaled_threshold(150.0) == 0x4000  # clamped


def test_sampler_deterministic_and_conv_atomic(spark, small):
    out1 = probabilistic_sample(small, percentage=40.0)
    out2 = probabilistic_sample(small, percentage=40.0)
    assert out1.count() == out2.count()
    # all-or-nothing per conv_id (the trace-coherence property)
    per_conv = (
        small.withColumn("kept", F.lit(1))
        .join(out1.select("conv_id", "turn_idx").withColumn("k", F.lit(1)), ["conv_id", "turn_idx"], "left")
        .groupBy("conv_id")
        .agg(F.count("*").alias("n"), F.count("k").alias("nk"))
    )
    bad = per_conv.filter((F.col("nk") != 0) & (F.col("nk") != F.col("n"))).count()
    assert bad == 0


def test_sampler_extremes(spark, small):
    assert probabilistic_sample(small, percentage=0.0).count() == 0
    assert probabilistic_sample(small, percentage=100.0).count() == small.count()


def test_sampler_rate_plausible(spark):
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    df = synthesize(spark, n_convs=2000, mean_turns=2, seed=1)
    kept = probabilistic_sample(df.select("conv_id").distinct(), percentage=25.0).count()
    assert 0.18 < kept / 2000 < 0.32  # 14-bit bucket sampling, +/- noise


def test_sampler_priority_paths(spark):
    df = spark.createDataFrame(
        [("a", 0), ("b", 2), ("c", None)], "conv_id string, priority int"
    )
    out = probabilistic_sample(df, percentage=100.0, priority_col="priority")
    got = {r.conv_id for r in out.collect()}
    assert "a" not in got  # priority 0 => drop (probabilisticsampler.go:104-153)
    assert "b" in got  # priority > 0 => keep
    assert "c" in got  # NULL => hash path, 100% keeps


def test_sha1_typed_bytes_layout(spark):
    # hasher.go:37-77: int64 LE 8B, float64 IEEE-bits LE 8B, bool 1B, string utf8
    df = spark.createDataFrame(
        [(-123456789, 3.14159, True, "héllo")], "i long, d double, b boolean, s string"
    )
    row = df.select(
        sha1_typed(F.col("i"), "int").alias("hi"),
        sha1_typed(F.col("d"), "double").alias("hd"),
        sha1_typed(F.col("b"), "bool").alias("hb"),
        sha1_typed(F.col("s"), "string").alias("hs"),
    ).collect()[0]
    assert row.hi == hashlib.sha1(struct.pack("<q", -123456789)).hexdigest()
    assert row.hd == hashlib.sha1(struct.pack("<d", 3.14159)).hexdigest()
    assert row.hb == hashlib.sha1(b"\x01").hexdigest()
    assert row.hs == hashlib.sha1("héllo".encode()).hexdigest()


def test_sampler_string_priority_parse_and_defer(spark):
    """String priorities follow strconv.ParseFloat semantics
    (probabilisticsampler.go:141-148): parseable strings act like numbers,
    UNPARSEABLE strings defer to the hash decision — they must neither
    drop the row nor crash the job (ANSI cast would throw)."""
    from opentelemetry_collector_spark.operators.sample import probabilistic_sample

    df = spark.createDataFrame(
        [("a", "0"), ("b", "1.5"), ("c", "not-a-number"), ("d", ""), ("e", None)],
        "conv_id string, priority string",
    )
    got = {r.conv_id for r in probabilistic_sample(df, 100.0, priority_col="priority").collect()}
    assert "a" not in got          # "0" parses -> drop
    assert "b" in got              # "1.5" parses -> keep
    assert {"c", "d", "e"} <= got  # unparseable/empty/null -> defer; 100% hash keeps
    got0 = {r.conv_id for r in probabilistic_sample(df, 0.0, priority_col="priority").collect()}
    assert got0 == {"b"}           # at 0% only the explicit keep survives


def test_sha1_typed_null_propagates_for_every_dtype(spark):
    """NULL must hash to NULL for all dtypes — the bool path used to hash
    NULL as false (0x00) and the double path as the NaN bit pattern,
    conflating absent with real values."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.functions.hashing import sha1_typed

    df = spark.createDataFrame(
        [(None, None, None, None)], "s string, i long, d double, b boolean"
    )
    (r,) = df.select(
        sha1_typed(F.col("s"), "string").alias("hs"),
        sha1_typed(F.col("i"), "int").alias("hi"),
        sha1_typed(F.col("d"), "double").alias("hd"),
        sha1_typed(F.col("b"), "bool").alias("hb"),
    ).collect()
    assert (r.hs, r.hi, r.hd, r.hb) == (None, None, None, None)


def test_hex16_decodes_uppercase_hex():
    import numpy as np

    from opentelemetry_collector_spark.functions.hashing import hex16_to_u32x4

    lo = hex16_to_u32x4(np.array(["00112233445566778899aabbccddeeff"], dtype=object))
    up = hex16_to_u32x4(np.array(["00112233445566778899AABBCCDDEEFF"], dtype=object))
    assert (lo == up).all()
