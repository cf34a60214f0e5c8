"""Mergeable HLL sketch rollup (operators/aggregate.sketch_rollup).

The scale contract is the MERGE, not the estimate: a rollup table of
per-bucket sketches must answer coarser levels by register-union alone,
and the answer must not depend on how the rows were bucketed — union over
day buckets == union over any other partitioning of the same rows
(registers max-merge, so the merged register state is partition-invariant).
Note estimate(union(partials)) is NOT asserted equal to estimate(direct
sketch): DataSketches intentionally answers a never-unioned sketch with
the HIP estimator and a union result with the composite estimator, so the
two can differ by ±1 count on identical registers. (The reference
recomputes every aggregation level from raw points per scrape,
exporter/prometheusexporter/accumulator.go:65-132 — affordable only in
one process's memory.)
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.aggregate import sketch_rollup


def _frame(spark, n_convs=400, turns=6):
    # conv c{i} appears `turns` times across 3 roles / 4 days — plenty of
    # duplication for distinct-counting to matter
    return (
        spark.range(n_convs * turns)
        .select(
            F.concat(F.lit("c"), (F.col("id") % n_convs).cast("string")).alias("conv_id"),
            F.element_at(
                F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
                ((F.col("id") % 3) + 1).cast("int"),
            ).alias("role"),
            F.to_date(
                F.concat(F.lit("2026-08-0"), ((F.col("id") % 4) + 1).cast("string"))
            ).alias("day"),
        )
    )


def test_merge_is_partition_invariant_dense(spark):
    """Rolling up day-bucketed sketches and rolling up an arbitrary 7-way
    hash bucketing of the SAME rows gives identical estimates in the dense
    regime (distinct count >> 2^lg_k registers): the register state is a
    pure max-merge, independent of partitioning. This is what lets a
    1000-executor job sketch per input split and merge in any grouping.
    (In the SPARSE regime the promotion point to dense differs per merge
    path, so estimates there agree only to ±1 — checked below.)"""
    df = _frame(spark, n_convs=50_000, turns=3)
    _f1, by_day = sketch_rollup(df, ["role"], "day", "conv_id")
    _f2, by_hash = sketch_rollup(df, ["role"], F.abs(F.xxhash64("conv_id")) % 7, "conv_id")
    day_est = {r["role"]: r["approx_distinct"] for r in by_day.collect()}
    hash_est = {r["role"]: r["approx_distinct"] for r in by_hash.collect()}
    assert len(day_est) == 3
    assert day_est == hash_est


def test_sparse_regime_estimates_agree_within_one(spark):
    df = _frame(spark)  # 400 distinct convs << 4096 registers
    _f1, by_day = sketch_rollup(df, ["role"], "day", "conv_id")
    _f2, by_hash = sketch_rollup(df, ["role"], F.abs(F.xxhash64("conv_id")) % 7, "conv_id")
    day_est = {r["role"]: r["approx_distinct"] for r in by_day.collect()}
    hash_est = {r["role"]: r["approx_distinct"] for r in by_hash.collect()}
    for role in day_est:
        assert abs(day_est[role] - hash_est[role]) <= 1


def test_estimates_within_5pct_of_exact(spark):
    df = _frame(spark)
    fine, coarse = sketch_rollup(df, ["role"], "day", "conv_id")
    exact_coarse = {
        r["role"]: r["n"]
        for r in df.groupBy("role").agg(F.countDistinct("conv_id").alias("n")).collect()
    }
    for r in coarse.collect():
        exact = exact_coarse[r["role"]]
        assert abs(r["approx_distinct"] - exact) / exact < 0.05
    # fine level too: per (role, day)
    exact_fine = {
        (r["role"], r["bucket"]): r["n"]
        for r in df.groupBy("role", F.col("day").alias("bucket"))
        .agg(F.countDistinct("conv_id").alias("n"))
        .collect()
    }
    for r in fine.collect():
        exact = exact_fine[(r["role"], r["bucket"])]
        assert abs(r["approx_distinct"] - exact) / exact < 0.05


def test_sketch_column_survives_parquet_roundtrip(spark, tmp_path):
    """The rollup-table pattern: persist fine sketches, merge LATER from
    disk — the continuous-aggregate / hypertable shape."""
    df = _frame(spark)
    fine, coarse = sketch_rollup(df, ["role"], "day", "conv_id")
    path = str(tmp_path / "rollup")
    fine.write.mode("overwrite").parquet(path)
    merged_from_disk = (
        spark.read.parquet(path)
        .groupBy("role")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est"))
    )
    want = {r["role"]: r["approx_distinct"] for r in coarse.collect()}
    got = {r["role"]: r["est"] for r in merged_from_disk.collect()}
    assert got == want
