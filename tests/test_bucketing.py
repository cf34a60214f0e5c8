"""Bucketed sink layout (SinkSpec.bucket_by): the pre-partitioning that lets
every downstream groupBy/join on the bucket key skip its Exchange — the
parquet-native form of the Iceberg bucket(N, conv_id) transform and the
SURVEY §7 'bucketing for co-located joins' scale machinery."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.pipeline import (
    SinkSpec,
    register_bucketed,
    write_sink,
)

SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp_ntz"
)


@pytest.fixture(scope="module")
def bucketed(spark, small, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("bucketed") / "turns")
    spec = SinkSpec(
        name="bucketed_turns",
        predicate=F.lit(True),
        path=path,
        bucket_by=(4, "conv_id"),
        bucket_sort=["conv_id", "turn_idx"],
    )
    write_sink(small, spec)
    return spark.table("bucketed_turns"), path


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_write_roundtrips_rows(spark, small, bucketed):
    tbl, _ = bucketed
    assert tbl.count() == small.count()
    a = {tuple(r) for r in tbl.select("conv_id", "turn_idx", "text").collect()}
    b = {tuple(r) for r in small.select("conv_id", "turn_idx", "text").collect()}
    assert a == b


def test_groupby_on_bucket_key_has_no_exchange(spark, small, bucketed):
    tbl, _ = bucketed
    agg = lambda df: df.groupBy("conv_id", "role").agg(F.count(F.lit(1)).alias("n"))  # noqa: E731
    # bucketed scan satisfies the clustering requirement (conv_id is a
    # subset of the grouping keys) -> zero shuffles
    assert "Exchange" not in _plan(agg(tbl))
    # ...whereas the identical aggregate over a plain scan must shuffle
    assert "Exchange" in _plan(agg(small))


def test_join_of_two_bucketed_tables_has_no_exchange(spark, small, bucketed):
    tbl, path = bucketed
    per_conv = small.groupBy("conv_id").agg(F.max("turn_idx").alias("last_idx"))
    spec = SinkSpec(
        name="bucketed_conv_agg",
        predicate=F.lit(True),
        path=path + "_agg",
        bucket_by=(4, "conv_id"),
        bucket_sort=["conv_id"],
    )
    write_sink(per_conv, spec)
    agg_tbl = spark.table("bucketed_conv_agg")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = _plan(tbl.join(agg_tbl, "conv_id"))
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # both sides pre-bucketed on the key
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_register_bucketed_reattaches_existing_location(spark, bucketed):
    tbl, path = bucketed
    n = tbl.count()
    spark.sql("DROP TABLE bucketed_turns")
    re = register_bucketed(
        spark, "bucketed_turns", path, SCHEMA_DDL, buckets=4, key="conv_id",
        sort_cols=["conv_id", "turn_idx"],
    )
    assert re.count() == n
    agg = re.groupBy("conv_id").agg(F.count(F.lit(1)).alias("n"))
    assert "Exchange" not in _plan(agg)  # bucket spec survived re-attachment
