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
    hq_build,
    hq_merge,
    hq_quantiles,
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

# histogram-quantile sketch (hq_build / hq_merge / hq_quantiles)

BOUNDS = [10, 100, 1000, 10000]


def _vals(spark, vals):
    return spark.createDataFrame([("t", v) for v in vals], "tenant string, v long")


def test_hq_bucket_containment_vs_exact(spark):
    # 1..500: exact p50 = 250 (bucket (100,1000] -> est 1000),
    # exact p95 = 475 (same bucket), exact p99 = 495
    df = _vals(spark, range(1, 501))
    sk = hq_build(df, "v", keys=["tenant"], bounds=BOUNDS)
    out = hq_quantiles(
        sk, keys=["tenant"], bounds=BOUNDS, quantiles={"p50": 500, "p95": 950, "p99": 990}
    ).collect()[0]
    assert out["n"] == 500
    # one-sided containment: the ceiling order statistic is <= the estimate
    # and > the previous bound
    vals = sorted(range(1, 501))
    for name, q in [("p50", 500), ("p95", 950), ("p99", 990)]:
        rank = (q * 500 + 999) // 1000
        exact = vals[rank - 1]
        assert exact <= out[name]
        prev = max((b for b in BOUNDS if b < out[name]), default=0)
        assert exact > prev


def test_hq_merge_equals_whole_build(spark):
    whole = _vals(spark, range(200))
    p1, p2 = _vals(spark, range(120)), _vals(spark, range(120, 200))
    merged = hq_merge(
        hq_build(p1, "v", ["tenant"], BOUNDS),
        hq_build(p2, "v", ["tenant"], BOUNDS),
        keys=["tenant"],
    )
    want = {tuple(r) for r in hq_build(whole, "v", ["tenant"], BOUNDS).collect()}
    assert {tuple(r) for r in merged.collect()} == want


def test_hq_overflow_bucket_estimates_null(spark):
    df = _vals(spark, [50_000, 60_000, 70_000])  # all > bounds[-1]
    sk = hq_build(df, "v", ["tenant"], BOUNDS)
    out = hq_quantiles(sk, ["tenant"], BOUNDS, {"p50": 500}).collect()[0]
    assert out["n"] == 3 and out["p50"] is None


def test_hq_exact_boundary_value_lands_in_its_bucket(spark):
    # OTLP rule: bucket i holds (bounds[i-1], bounds[i]] — v == 100 belongs
    # to bucket 1 (upper bound 100), not bucket 2
    sk = hq_build(_vals(spark, [100]), "v", ["tenant"], BOUNDS)
    assert sk.collect()[0]["bucket"] == 1
    out = hq_quantiles(sk, ["tenant"], BOUNDS, {"p50": 500}).collect()[0]
    assert out["p50"] == 100


def test_hq_sketch_is_bounded_and_null_skipped(spark):
    df = spark.createDataFrame(
        [("t", i % 77) for i in range(5_000)] + [("t", None)], "tenant string, v long"
    )
    sk = hq_build(df, "v", ["tenant"], BOUNDS).collect()
    assert len(sk) <= len(BOUNDS) + 1
    assert sum(r["cnt"] for r in sk) == 5_000  # NULL carried no measurement


def test_hq_rejects_bad_shape(spark):
    import pytest

    with pytest.raises(ValueError):
        hq_build(_vals(spark, [1]), "v", ["tenant"], [10, 10, 20])
    with pytest.raises(ValueError):
        hq_quantiles(
            hq_build(_vals(spark, [1]), "v", ["tenant"], BOUNDS),
            ["tenant"], BOUNDS, {"p0": 0},
        )


# bloom_probe_big (broadcast-bitset Arrow probe — the large-m scale form)


def test_bloom_probe_big_matches_literal_probe(spark):
    from opentelemetry_collector_spark.operators.sketches import bloom_probe_big

    bloom = bloom_build(_keys(spark, range(50)), "k", m_bits=M, k=K)
    probe_keys = _keys(spark, range(0, 200))
    lit = {r["k"]: r["maybe_seen"] for r in bloom_probe(probe_keys, bloom, "k", M, K).collect()}
    big = {r["k"]: r["maybe_seen"] for r in bloom_probe_big(probe_keys, bloom, "k", M, K).collect()}
    assert big == lit
    assert all(big[f"key-{i}"] for i in range(50))  # no false negatives


def test_bloom_probe_big_null_key_probes_false(spark):
    from opentelemetry_collector_spark.operators.sketches import bloom_probe_big

    bloom = bloom_build(_keys(spark, range(5)), "k", M, K)
    df = spark.createDataFrame([(None,), ("key-1",)], "k string")
    rows = {r["k"]: r["maybe_seen"] for r in bloom_probe_big(df, bloom, "k", M, K).collect()}
    assert rows[None] is False and rows["key-1"] is True


def test_bloom_probe_big_is_arrow_not_row_python(spark):
    from opentelemetry_collector_spark.operators.sketches import bloom_probe_big

    bloom = bloom_build(_keys(spark, range(10)), "k", M, K)
    plan = (
        bloom_probe_big(_keys(spark, range(20)), bloom, "k", M, K)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan and "BatchEvalPython" not in plan
    assert "Exchange" not in plan and "Join" not in plan


def test_xxhash64_hasher_properties(spark):
    """hasher="xxhash64" (the production fast path) keeps the contracts:
    no false negatives, probe/probe_big verdict equality, NULL probes
    False, CM one-sided."""
    from opentelemetry_collector_spark.operators.sketches import bloom_probe_big

    inserted = _keys(spark, range(50))
    bloom = bloom_build(inserted, "k", m_bits=M, k=K, hasher="xxhash64")
    probe_df = spark.createDataFrame(
        [(f"key-{i}",) for i in range(100)] + [(None,)], "k string"
    )
    lit = {r["k"]: r["maybe_seen"]
           for r in bloom_probe(probe_df, bloom, "k", M, K, hasher="xxhash64").collect()}
    big = {r["k"]: r["maybe_seen"]
           for r in bloom_probe_big(probe_df, bloom, "k", M, K, hasher="xxhash64").collect()}
    assert big == lit
    assert all(lit[f"key-{i}"] for i in range(50))  # no false negatives
    assert lit[None] is False

    rows = [(f"key-{i}",) for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k string")
    cm = cm_build(df, "k", depth=D, width=W, hasher="xxhash64")
    for r in cm_estimate(_keys(spark, range(20)), cm, "k", D, W, hasher="xxhash64").collect():
        assert r["cm_est"] >= int(r["k"].split("-")[1]) + 1


def test_unknown_hasher_rejected(spark):
    import pytest

    with pytest.raises(ValueError):
        bloom_build(_keys(spark, [1]), "k", m_bits=M, k=K, hasher="sha1")


def test_cm_estimate_big_matches_literal_estimate(spark):
    from opentelemetry_collector_spark.operators.sketches import cm_estimate_big

    rows = [(f"key-{i}",) for i in range(20) for _ in range(i + 1)]
    df = spark.createDataFrame(rows, "k string")
    cm = cm_build(df, "k", depth=D, width=W)
    keys = spark.createDataFrame([(f"key-{i}",) for i in range(25)] + [(None,)], "k string")
    lit = {r["k"]: r["cm_est"] for r in cm_estimate(keys, cm, "k", D, W).collect()}
    big = {r["k"]: r["cm_est"] for r in cm_estimate_big(keys, cm, "k", D, W).collect()}
    # literal form estimates NULL keys via NULL positions -> NULL; big form
    # pins the same
    assert big == lit and big[None] is None


def test_hll_register_rollup_matches_python_and_merges(spark):
    """Portable HLL registers: rho/register values equal a from-scratch
    Python md5 replay, and max-merging per-day fine registers equals
    sketching the whole input directly (the HLL union identity)."""
    import hashlib

    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.sketches import hll_register_rollup

    rows = [(f"g{i % 2}", f"d{i % 3}", f"conv-{i % 17}") for i in range(100)] + [
        ("g0", "d0", None)
    ]
    df = spark.createDataFrame(rows, "g string, day string, v string")
    fine, coarse = hll_register_rollup(df, ["g"], "day", "v", p=9)

    def py_regs(values):
        regs = {}
        for v in values:
            h = hashlib.md5(v.encode()).hexdigest()
            h1, h2 = int(h[:13], 16), int(h[13:26], 16)
            rho = 53 if h2 == 0 else (h2 & -h2).bit_length()
            reg = h1 % 512
            regs[reg] = max(regs.get(reg, 0), rho)
        return regs

    want = {}
    for g in ("g0", "g1"):
        vals = {v for gg, _, v in rows if gg == g and v is not None}
        for reg, rho in py_regs(vals).items():
            want[(g, reg)] = rho
    got = {(r.g, r.reg): r.rho for r in coarse.collect()}
    assert got == want
    # merge invariance: bucketing by hash instead of day gives identical coarse
    _f2, coarse2 = hll_register_rollup(
        df, ["g"], F.abs(F.xxhash64("v")) % 7, "v", p=9
    )
    assert {(r.g, r.reg): r.rho for r in coarse2.collect()} == got
