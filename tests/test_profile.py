"""Table profiling (plans/profile.py): exact per-column null/distinct
counts in one pass."""

from __future__ import annotations

import pytest

from opentelemetry_collector_spark.plans.profile import table_profile


def test_profile_counts_and_null_semantics(spark):
    df = spark.createDataFrame(
        [("a", 1, None), ("b", 1, 2.0), ("a", None, 2.0), (None, 3, None)],
        "s string, i int, d double",
    )
    got = {
        r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
        for r in table_profile(df).collect()
    }
    assert got == {
        "s": (4, 1, 2),   # NULL is not a distinct value
        "i": (4, 1, 2),
        "d": (4, 2, 1),
    }


def test_profile_subset_validation_and_empty_table(spark):
    df = spark.createDataFrame([("a", 1)], "s string, i int")
    assert {r["column"] for r in table_profile(df, ["i"]).collect()} == {"i"}
    with pytest.raises(ValueError, match="unknown"):
        table_profile(df, ["nope"])
    with pytest.raises(ValueError, match="no columns"):
        table_profile(df, [])
    empty = df.limit(0)
    got = {r["column"]: (r["n_rows"], r["n_nulls"], r["n_distinct"])
           for r in table_profile(empty).collect()}
    assert got == {"s": (0, 0, 0), "i": (0, 0, 0)}


def test_profile_single_pass_plan(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], "s string, i int")
    plan = table_profile(df)._jdf.queryExecution().executedPlan().toString()
    # one Expand for the multi-distinct, one scan of the input
    assert plan.count("Scan ExistingRDD") == 1
    assert "Expand" in plan


def test_referential_audit_orphans_and_null_keys(spark):
    from opentelemetry_collector_spark.plans.profile import referential_audit

    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (9, "orphan"), (None, "nullkey")], "fk int, x string"
    )
    got = {
        r["relation"]: (r["n_child"], r["n_orphans"], r["n_null_keys"])
        for r in referential_audit([("c->p", child, "fk", parent, "pk")]).collect()
    }
    assert got == {"c->p": (4, 1, 1)}

    with pytest.raises(ValueError, match="no relations"):
        referential_audit([])
