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


def test_join_size_estimate_equals_actual_join(spark):
    from opentelemetry_collector_spark.plans.profile import join_size_estimate

    left = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("c", 4), (None, 5)], "k string, x int"
    )
    right = spark.createDataFrame(
        [("a", 10), ("a", 11), ("a", 12), ("b", 13), ("d", 14), (None, 15)],
        "k string, y int",
    )
    r = join_size_estimate(left, right, ["k"]).collect()[0]
    actual = left.join(right, on="k").count()
    assert r["est_rows"] == actual == 7          # a:2x3 + b:1x1
    assert r["max_key_rows"] == 6                # key 'a' owns the blowup
    assert r["n_matching_keys"] == 2             # 'c' and 'd' don't match
    assert (r["n_left_rows"], r["n_right_rows"]) == (5, 6)
    assert (r["n_left_keys"], r["n_right_keys"]) == (3, 3)
    # NULL keys excluded from matching (equi-join semantics) but reported
    assert (r["n_left_null_keys"], r["n_right_null_keys"]) == (1, 1)

    import pytest as _pytest
    with _pytest.raises(ValueError, match="join key"):
        join_size_estimate(left, right, [])


def test_join_size_estimate_no_overlap_is_zero(spark):
    from opentelemetry_collector_spark.plans.profile import join_size_estimate

    left = spark.createDataFrame([("a", 1)], "k string, x int")
    right = spark.createDataFrame([("z", 2)], "k string, y int")
    r = join_size_estimate(left, right, ["k"]).collect()[0]
    assert (r["n_matching_keys"], r["est_rows"], r["max_key_rows"]) == (0, 0, 0)


def test_join_size_estimate_never_joins_fact_tables(spark):
    """Only the two COUNT frames may join — the plan must contain no join
    wider than the key-counts join plus the scalar cross joins (i.e. the
    fact tables appear only under aggregates)."""
    from opentelemetry_collector_spark.plans.profile import join_size_estimate

    left = spark.createDataFrame([("a", 1)], "k string, x int")
    right = spark.createDataFrame([("z", 2)], "k string, y int")
    plan = (join_size_estimate(left, right, ["k"])
            ._jdf.queryExecution().optimizedPlan().toString())
    # every scan feeds an Aggregate before any Join sees it
    assert "SortMergeJoin" not in plan or "Aggregate" in plan.split("Join", 1)[1]


def test_profile_approx_mode_bounds_error_and_drops_expand(spark):
    """approx_rsd switches n_distinct to HyperLogLog++ (the production
    switch at 10^12 rows): counts/nulls stay EXACT, distinct estimates
    land within a few rsd of truth, and the plan loses the Expand the
    exact multi-count-distinct needs (sketch state is fixed-size per
    column, never row-scaled)."""
    from opentelemetry_collector_spark.plans.profile import table_profile

    rows = [(i, f"v{i % 97}", None if i % 5 == 0 else i % 13) for i in range(2000)]
    df = spark.createDataFrame(rows, "a bigint, b string, c bigint")
    exact = {r["column"]: r.asDict() for r in table_profile(df).collect()}
    approx_df = table_profile(df, approx_rsd=0.02)
    approx = {r["column"]: r.asDict() for r in approx_df.collect()}
    for col in ("a", "b", "c"):
        assert approx[col]["n_rows"] == exact[col]["n_rows"] == 2000
        assert approx[col]["n_nulls"] == exact[col]["n_nulls"]
        want = exact[col]["n_distinct"]
        got = approx[col]["n_distinct"]
        assert abs(got - want) <= max(3, 0.1 * want), (col, got, want)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    exact_plan = table_profile(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan and "Expand" not in plan
    import pytest as _pytest

    with _pytest.raises(ValueError):
        table_profile(df, approx_rsd=1.5)
