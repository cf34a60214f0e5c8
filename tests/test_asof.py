"""As-of join operator (operators/asof.py) — tie semantics, null payloads,
left-join behavior, and the no-range-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("c1", 1), ("c1", 4), ("c1", 6), ("c2", 2)], "k string, t int"
    )
    right = spark.createDataFrame(
        [("c1", 1, "a", 10), ("c1", 4, "b", None), ("c1", 5, "c", 30)],
        "k string, t int, v string, extra int",
    )
    return left, right


def _run(spark, strict):
    left, right = _frames(spark)
    out = asof_join(
        left, right, keys=["k"], order_col="t", payload_cols=["v", "extra"], strict=strict
    )
    return {(r["k"], r["t"]): (r["v"], r["extra"]) for r in out.collect()}


def test_strict_excludes_equal_order_rows(spark):
    got = _run(spark, strict=True)
    assert got[("c1", 1)] == (None, None)  # nothing strictly before t=1
    assert got[("c1", 4)] == ("a", 10)  # t=4 right row invisible under <
    assert got[("c1", 6)] == ("c", 30)
    assert got[("c2", 2)] == (None, None)  # key with no right rows at all


def test_non_strict_includes_equal_order_rows(spark):
    got = _run(spark, strict=False)
    assert got[("c1", 1)] == ("a", 10)
    assert got[("c1", 4)] == ("b", None)  # matched row's NULL payload survives
    assert got[("c1", 6)] == ("c", 30)


def test_payload_columns_come_from_the_same_right_row(spark):
    # the t=4 right row has extra=NULL: a per-column last(ignorenulls) would
    # leak extra=10 from the t=1 row next to v='b' — the struct transport
    # must keep (v, extra) paired
    got = _run(spark, strict=False)
    assert got[("c1", 4)] == ("b", None)


def test_plan_has_no_join_and_one_key_exchange(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, keys=["k"], order_col="t", payload_cols=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union+window, never a range join
    assert "Window" in plan
    assert plan.count("Exchange") == 1  # one hashpartitioning(k) shuffle
