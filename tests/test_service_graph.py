"""Service dependency graph (operators/aggregate.service_graph).

Golden edge semantics on a hand-built span frame (root spans parent no
edge, dangling parents drop, errors counted on the CHILD side, dyadic-exact
p50) plus the plan property: the self-join is an equi-join (never a
BroadcastNestedLoopJoin) feeding one partial-aggregated groupBy.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.aggregate import service_graph

SPAN_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string,"
    " service_name string, status_code int, duration_us bigint"
)


def _spans(spark):
    rows = [
        # trace A: gw -> api (ok, 100), api -> db (err, 300), api -> db (ok, 100)
        ("A", "s1", None, "gw", 0, 10),
        ("A", "s2", "s1", "api", 0, 100),
        ("A", "s3", "s2", "db", 2, 300),
        ("A", "s4", "s2", "db", 0, 100),
        # trace B: gw -> api (err, 200); dangling parent x9 drops
        ("B", "b1", None, "gw", 0, 10),
        ("B", "b2", "b1", "api", 2, 200),
        ("B", "b3", "x9", "db", 0, 999),
        # same span ids in a DIFFERENT trace must not cross-link
        ("C", "s1", None, "gw", 0, 10),
        ("C", "s2", "s1", "api", 0, 400),
    ]
    return spark.createDataFrame(rows, SPAN_SCHEMA)


def test_edges_counts_errors_and_exact_p50(spark):
    got = {
        (r["parent_service"], r["child_service"]): (
            r["n_calls"],
            r["n_errors"],
            r["p50_duration_us"],
        )
        for r in service_graph(_spans(spark)).collect()
    }
    # gw->api durations 100,200,400 -> p50 = 200; one error (trace B)
    # api->db durations 100,300 -> interpolated p50 = 200 (dyadic halving)
    assert got == {
        ("gw", "api"): (3, 1, 200),
        ("api", "db"): (2, 1, 200),
    }


def test_roots_and_dangling_parents_produce_no_edge(spark):
    out = service_graph(_spans(spark))
    # 9 spans, 3 roots, 1 dangling parent -> 5 edges total
    assert out.agg(F.sum("n_calls")).first()[0] == 5


def test_plan_is_equi_join_with_partial_agg(spark):
    plan = service_graph(_spans(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )
    assert "partial_count" in plan or "HashAggregate" in plan
