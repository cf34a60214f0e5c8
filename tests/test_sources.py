"""Transcripts sources: generator invariants + events-derivation vs DuckDB."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.transcripts import (
    CONV_META_SQL,
    TRANSCRIPTS_SQL,
    conv_meta,
    from_events,
    synthesize_pandas,
)

SF = "/root/testdata/sf0.001"


def test_generator_deterministic():
    a = synthesize_pandas(n_convs=50, mean_turns=5, seed=42)
    b = synthesize_pandas(n_convs=50, mean_turns=5, seed=42)
    pd.testing.assert_frame_equal(a, b)


def test_generator_turn_idx_contiguous():
    pdf = synthesize_pandas(n_convs=30, mean_turns=6, seed=1)
    for _, g in pdf.groupby("conv_id"):
        assert list(g.turn_idx) == list(range(len(g)))


def test_generator_skew_block():
    pdf = synthesize_pandas(n_convs=500, mean_turns=10, seed=42, hot_frac=0.2)
    counts = pdf.conv_id.value_counts()
    hot2 = counts.iloc[:2].sum()
    assert hot2 / len(pdf) > 0.15  # hot block holds ~20% of rows


def test_generator_roles_and_patterns():
    pdf = synthesize_pandas(n_convs=300, mean_turns=10, seed=42)
    assert set(pdf.role.unique()) <= {"user", "assistant", "tool", "system"}
    assert pdf.text.str.contains(r"tool_call: \w+\(", regex=True).any()
    assert pdf.text.str.contains(r"error code=\d+", regex=True).any()
    assert (pdf.text == "").any()  # empty strings present
    assert pdf[pdf.role != "tool"].tool.isna().all()


def test_from_events_matches_duckdb(spark):
    got = from_events(spark, SF).orderBy("conv_id", "turn_idx").toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
    want = con.sql(TRANSCRIPTS_SQL + " ORDER BY conv_id, turn_idx").df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=False)


def test_conv_meta_matches_duckdb(spark):
    got = conv_meta(spark, SF).orderBy("conv_id").toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{SF}/customer.parquet'")
    want = con.sql(CONV_META_SQL + " ORDER BY conv_id").df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want, check_dtype=False)


def test_turn_idx_stable_ordering_invariant(spark):
    t = from_events(spark, SF)
    dup = t.groupBy("conv_id", "turn_idx").count().filter(F.col("count") > 1).count()
    assert dup == 0


def test_schema_evolution_old_files_backfill_null(spark, tmp_path):
    """Schema drift across landing history (the at-scale reality of a
    100 TB table written over years): files written before the `tool`
    column existed merge with current files under mergeSchema — old rows
    read `tool` as NULL (exactly how the reference reads an absent
    attribute as unset, not as an error), row counts and per-turn text
    survive, and the receiver fan-in union (allowMissingColumns) pins the
    same semantics for multi-receiver pipelines."""
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    t = synthesize(spark, n_convs=4, mean_turns=4, seed=7)
    old_dir, new_dir = str(tmp_path / "v0"), str(tmp_path / "v1")
    t.filter(F.col("conv_id") < "conv-000002").drop("tool").write.parquet(old_dir)
    t.filter(F.col("conv_id") >= "conv-000002").write.parquet(new_dir)

    merged = spark.read.option("mergeSchema", "true").parquet(old_dir, new_dir)
    assert merged.count() == t.count()
    assert set(merged.columns) == set(t.columns)
    old_rows = merged.filter(F.col("conv_id") < "conv-000002")
    assert old_rows.filter(F.col("tool").isNotNull()).count() == 0
    # per-turn text equality survives the merge (the north-rule invariant)
    a = {(r.conv_id, r.turn_idx, r.text) for r in t.collect()}
    b = {(r.conv_id, r.turn_idx, r.text) for r in merged.collect()}
    assert a == b

    # the receiver fan-in path gives identical NULL-backfill semantics
    u = spark.read.parquet(new_dir).unionByName(
        spark.read.parquet(old_dir), allowMissingColumns=True
    )
    assert u.count() == t.count()
    assert u.filter(F.col("tool").isNull()).count() == old_rows.count() + t.filter(
        F.col("tool").isNull() & (F.col("conv_id") >= "conv-000002")
    ).count()
