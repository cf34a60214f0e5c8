"""Bloom filter + Count-Min sketches (operators/sketches.py).

Reference relative: the Prometheus accumulator's full per-series map
(``exporter/prometheusexporter/accumulator.go:65-132``) — the state these
sketches bound to a fixed size at scale. Properties pinned here: no false
negatives (bloom), one-sided error (CM), bit_or/sum mergeability equal to
whole-corpus builds, and zero-shuffle projection-only probe plans.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.sketches import (
    bloom_build,
    bloom_merge,
    bloom_probe,
    cm_build,
    cm_estimate,
    cm_merge,
)

M, K = 1 << 12, 3
D, W = 4, 64


def _keys(spark, ids):
    return spark.createDataFrame([(f"key-{i}",) for i in ids], "k string")


def test_bloom_never_false_negative(spark):
    inserted = _keys(spark, range(50))
    bloom = bloom_build(inserted, "k", m_bits=M, k=K)
    probed = bloom_probe(inserted, bloom, "k", m_bits=M, k=K)
    assert all(r["maybe_seen"] for r in probed.collect())


def test_bloom_merge_equals_whole_build(spark):
    whole = _keys(spark, range(60))
    p1, p2 = _keys(spark, range(30)), _keys(spark, range(30, 60))
    merged = bloom_merge(bloom_build(p1, "k", M, K), bloom_build(p2, "k", M, K))
    want = {(r["word"], r["bits"]) for r in bloom_build(whole, "k", M, K).collect()}
    got = {(r["word"], r["bits"]) for r in merged.collect()}
    assert got == want


def test_bloom_nonmember_probes_false_at_generous_m(spark):
    # 10 keys in 2^16 bits: the specific non-member probe keys below were
    # verified collision-free once and are pinned (all-deterministic md5)
    big_m = 1 << 16
    bloom = bloom_build(_keys(spark, range(10)), "k", m_bits=big_m, k=K)
    out = bloom_probe(_keys(spark, range(1000, 1100)), bloom, "k", big_m, K)
    assert not any(r["maybe_seen"] for r in out.collect())


def test_bloom_null_key_probes_false(spark):
    bloom = bloom_build(_keys(spark, range(5)), "k", M, K)
    df = spark.createDataFrame([(None,), ("key-1",)], "k string")
    rows = {r["k"]: r["maybe_seen"] for r in bloom_probe(df, bloom, "k", M, K).collect()}
    assert rows[None] is False and rows["key-1"] is True


def test_bloom_probe_is_projection_only(spark):
    bloom = bloom_build(_keys(spark, range(20)), "k", M, K)
    probed = bloom_probe(_keys(spark, range(40)), bloom, "k", M, K)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Join", "Generate", "Python"):
        assert bad not in plan, f"{bad} in probe plan"


def test_bloom_rejects_bad_shape(spark):
    import pytest

    with pytest.raises(ValueError):
        bloom_build(_keys(spark, [1]), "k", m_bits=100, k=K)
    with pytest.raises(ValueError):
        bloom_build(_keys(spark, [1]), "k", m_bits=M, k=0)


def test_cm_one_sided_and_exact_at_generous_width(spark):
    # skewed multiset: key-i appears i+1 times
    rows = [(f"key-{i}",) for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k string")
    exact = {r["k"]: r["c"] for r in df.groupBy("k").agg(F.count("*").alias("c")).collect()}

    tight = cm_build(df, "k", depth=D, width=W)
    est = cm_estimate(_keys(spark, range(20)), tight, "k", D, W)
    for r in est.collect():
        assert r["cm_est"] >= exact[r["k"]]

    wide = cm_build(df, "k", depth=D, width=1 << 14)
    est = cm_estimate(_keys(spark, range(20)), wide, "k", D, 1 << 14)
    for r in est.collect():
        assert r["cm_est"] == exact[r["k"]]


def test_cm_merge_equals_whole_build(spark):
    whole = spark.createDataFrame([(f"key-{i % 7}",) for i in range(40)], "k string")
    p1 = spark.createDataFrame([(f"key-{i % 7}",) for i in range(25)], "k string")
    p2 = spark.createDataFrame([(f"key-{i % 7}",) for i in range(25, 40)], "k string")
    merged = cm_merge(cm_build(p1, "k", D, W), cm_build(p2, "k", D, W))
    want = {(r["row"], r["col"], r["cnt"]) for r in cm_build(whole, "k", D, W).collect()}
    got = {(r["row"], r["col"], r["cnt"]) for r in merged.collect()}
    assert got == want


def test_cm_weighted_build(spark):
    df = spark.createDataFrame([("a", 5), ("a", 7), ("b", 1)], "k string, w int")
    cm = cm_build(df, "k", depth=D, width=1 << 14, weight=F.col("w"))
    est = {
        r["k"]: r["cm_est"]
        for r in cm_estimate(
            spark.createDataFrame([("a",), ("b",)], "k string"), cm, "k", D, 1 << 14
        ).collect()
    }
    assert est == {"a": 12, "b": 1}


def test_cm_estimate_is_projection_only(spark):
    cm = cm_build(_keys(spark, range(10)), "k", D, W)
    est = cm_estimate(_keys(spark, range(10)), cm, "k", D, W)
    plan = est._jdf.queryExecution().executedPlan().toString()
    for bad in ("Exchange", "Join", "Generate", "Python"):
        assert bad not in plan, f"{bad} in estimate plan"
