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


# ---------------------------------------------------------------------------
# span_selftime (flame-graph exclusive-time profile)
# ---------------------------------------------------------------------------

SELF_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string,"
    " service_name string, name string, duration_us bigint"
)


def _self_spans(spark):
    rows = [
        # trace A: root 1000us with two children summing 600 -> self 400
        ("A", "s1", None, "gw", "root", 1000),
        ("A", "s2", "s1", "api", "get", 500),
        ("A", "s3", "s1", "api", "get", 100),
        #   s2's child exceeds the parent: self clamps to 0 (async overlap)
        ("A", "s4", "s2", "db", "query", 900),
        # trace B: NULL duration counts as a zero-time span
        ("B", "b1", None, "gw", "root", None),
        # orphan child (parent never seen): full duration is self
        ("B", "b2", "x9", "db", "query", 50),
    ]
    return spark.createDataFrame(rows, SELF_SCHEMA)


def test_selftime_golden_clamp_null_and_share(spark):
    from opentelemetry_collector_spark.operators.aggregate import span_selftime

    got = {(r["service"], r["op"]): r.asDict() for r in span_selftime(_self_spans(spark)).collect()}
    # gw/root: A self 400 (1000-600), B NULL->0 self 0 -> total 1000, self 400
    assert got[("gw", "root")]["n_spans"] == 2
    assert got[("gw", "root")]["total_us"] == 1000
    assert got[("gw", "root")]["self_us"] == 400
    assert got[("gw", "root")]["n_clamped"] == 0
    # api/get: s2 self = 500-900 -> clamped 0; s3 self 100
    assert got[("api", "get")]["self_us"] == 100
    assert got[("api", "get")]["n_clamped"] == 1
    # db/query: s4 900 (leaf), b2 50 (orphan keeps full duration)
    assert got[("db", "query")]["self_us"] == 950
    # shares: corpus self = 400+100+950 = 1450
    assert got[("gw", "root")]["self_share_pm"] == 400 * 1000 // 1450
    assert got[("api", "get")]["self_share_pm"] == 100 * 1000 // 1450
    assert got[("db", "query")]["self_share_pm"] == 950 * 1000 // 1450


def test_selftime_all_zero_durations_zero_share(spark):
    from opentelemetry_collector_spark.operators.aggregate import span_selftime

    df = spark.createDataFrame(
        [("A", "s1", None, "gw", "root", 0)], SELF_SCHEMA
    )
    r = span_selftime(df).collect()[0]
    assert r["self_us"] == 0 and r["self_share_pm"] == 0


def test_selftime_plan_partial_agg_equi_join(spark):
    from opentelemetry_collector_spark.operators.aggregate import span_selftime

    plan = span_selftime(_self_spans(spark))._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # child sums aggregate partially before their exchange
    assert "partial_sum" in plan.split("Exchange")[1] or "partial_sum" in plan
