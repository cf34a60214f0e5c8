"""Graph + relational-shape batch (q122-q128): integer-exact PageRank
(operators/graph.py), navigation-edge derivation, grouping sets, set ops,
and the TPC-H Q4/Q10/Q13/Q18 join shapes.

The PageRank goldens are checked against an in-test pure-Python reference
using the SAME integer micro-unit arithmetic, so any drift in the Spark
plan (join order, partitioning) that broke exactness would show up here
before the oracle gate."""

from __future__ import annotations

import datetime as dt

import pytest

from opentelemetry_collector_spark.operators.graph import (
    UNIT,
    navigation_edges,
    pagerank,
)

SF = "/root/testdata/sf0.001"


def _py_pagerank(edges, iterations=3, damping_pct=85):
    """Plain-Python reference: identical integer arithmetic, no Spark."""
    nodes = {s for s, _, _ in edges} | {d for _, d, _ in edges}
    out_w = {}
    for s, _, w in edges:
        out_w[s] = out_w.get(s, 0) + w
    base = (100 - damping_pct) * UNIT // 100
    rank = {n: UNIT for n in nodes}
    for _ in range(iterations):
        recv = {}
        for s, d, w in edges:
            recv[d] = recv.get(d, 0) + rank[s] * w // out_w[s]
        rank = {n: base + damping_pct * recv.get(n, 0) // 100 for n in nodes}
    return rank


def test_pagerank_matches_python_reference(spark):
    edges = [("a", "b", 2), ("a", "c", 1), ("b", "c", 1), ("c", "a", 1), ("d", "a", 5)]
    df = spark.createDataFrame(edges, "src string, dst string, weight bigint")
    got = {r["node"]: r["rank_micros"] for r in pagerank(df, iterations=3).collect()}
    assert got == _py_pagerank(edges, 3)
    # d is dangling-in only (no in-edges): pure base mass after iteration 1
    assert got["d"] == 150_000


def test_pagerank_partition_invariant(spark):
    """Bit-identical ranks no matter how the edge list is partitioned —
    the property float PageRank does NOT have."""
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}", (i % 5) + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src string, dst string, weight bigint")
    a = {r["node"]: r["rank_micros"] for r in pagerank(df.coalesce(1), 2).collect()}
    b = {r["node"]: r["rank_micros"] for r in pagerank(df.repartition(16, "dst"), 2).collect()}
    assert a == b


def test_pagerank_rejects_bad_damping(spark):
    df = spark.createDataFrame([("a", "b", 1)], "src string, dst string, weight bigint")
    with pytest.raises(ValueError, match="damping_pct"):
        pagerank(df, damping_pct=100)


def test_pagerank_withholds_broadcast_above_node_threshold(spark):
    """The rank-side broadcast hint must be size-gated: with the probe
    forced over threshold the physical plan may not contain a broadcast
    exchange of the rank frame (an explicit hint would be honored at ANY
    size and OOM the driver at web scale), and the ranks stay identical."""
    edges = [(f"n{i}", f"n{(i * 7 + 3) % 40}", (i % 5) + 1) for i in range(200)]
    df = spark.createDataFrame(edges, "src string, dst string, weight bigint")
    gated = pagerank(df, iterations=2, broadcast_node_threshold=5)
    plan = gated._jdf.queryExecution().analyzed().toString()
    # no explicit hint — AQE may still broadcast a provably-small side at
    # runtime, which is exactly the "degrade by size" behavior we want
    assert "ResolvedHint" not in plan, plan
    hinted = pagerank(df, iterations=2)
    assert "ResolvedHint" in hinted._jdf.queryExecution().analyzed().toString()
    small = {r["node"]: r["rank_micros"] for r in hinted.collect()}
    assert {r["node"]: r["rank_micros"] for r in gated.collect()} == small


def test_navigation_edges_golden(spark):
    t0 = dt.datetime(2026, 1, 5)
    rows = [
        # u1: view page(id%50) -> click item(id%100) -> view — two edges
        (100, t0, 1, "view"),
        (151, t0 + dt.timedelta(minutes=1), 1, "click"),
        (52, t0 + dt.timedelta(minutes=2), 1, "view"),
        # interleaved non-nav event must NOT break adjacency
        (999, t0 + dt.timedelta(seconds=90), 1, "purchase"),
        # u2: single view — no edge
        (7, t0, 2, "view"),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {(r["src"], r["dst"]): r["weight"] for r in navigation_edges(df).collect()}
    assert got == {("page:0", "item:51"): 1, ("item:51", "page:2"): 1}


def test_rollup_grouping_flags(spark):
    from opentelemetry_collector_spark.plans.queries import q126_rollup_totals

    rows = q126_rollup_totals(spark, SF).collect()
    by_flags = {}
    for r in rows:
        by_flags.setdefault((r["g_role"], r["g_tool"]), []).append(r)
    # three rollup levels present: leaf, per-role subtotal, grand total
    assert set(by_flags) == {(0, 0), (0, 1), (1, 1)}
    grand = by_flags[(1, 1)]
    assert len(grand) == 1 and grand[0]["role"] is None
    # the levels are consistent: leaves sum to the grand total
    assert sum(r["n_turns"] for r in by_flags[(0, 0)]) == grand[0]["n_turns"]
    assert sum(r["n_turns"] for r in by_flags[(0, 1)]) == grand[0]["n_turns"]
    # g_tool=0 rows include the data's OWN null tool, distinguished by flag
    leaf_null_tool = [r for r in by_flags[(0, 0)] if r["tool"] is None]
    assert leaf_null_tool, "natural NULL tool must survive as a leaf group"


def test_audience_overlap_partition_of_union(spark):
    """view_and_purchase + view_only == all distinct viewers; the three
    segments partition the viewer∪purchaser universe."""
    from opentelemetry_collector_spark.plans.queries import q128_audience_overlap

    seg = {r["segment"]: r["n_users"] for r in q128_audience_overlap(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    viewers = ev.filter("event_type = 'view'").select("user_id").distinct().count()
    buyers = ev.filter("event_type = 'purchase'").select("user_id").distinct().count()
    assert seg["view_and_purchase"] + seg["view_only"] == viewers
    assert seg["view_and_purchase"] + seg["purchase_only"] == buyers


def test_q122_semi_join_never_multiplies(spark):
    """Q4 shape: per-priority counts can never exceed the window's order
    count (a plain inner join WOULD multiply by matching lineitems), and
    the physical plan contains the semi join."""
    from opentelemetry_collector_spark.plans.queries import q122_order_priority

    df = q122_order_priority(spark, SF)
    import pyspark.sql.functions as F

    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .groupBy("o_orderpriority")
        .count()
    )
    window_counts = {r["o_orderpriority"]: r["count"] for r in orders.collect()}
    for r in df.collect():
        assert 0 < r["order_count"] <= window_counts[r["o_orderpriority"]]
    assert "LeftSemi" in df._jdf.queryExecution().executedPlan().toString()


def test_q124_histogram_mass_equals_customers(spark):
    """Q13 shape: the histogram partitions the customer set — its mass is
    exactly the customer count (an inner-join histogram would undercount)."""
    from opentelemetry_collector_spark.plans.queries import q124_customer_orders_dist

    rows = q124_customer_orders_dist(spark, SF).collect()
    n_cust = spark.read.parquet(f"{SF}/customer.parquet").count()
    assert sum(r["custdist"] for r in rows) == n_cust


def test_q124_outer_join_keeps_zero_bucket(spark, tmp_path):
    """The c_count=0 bucket: customers with no qualifying orders (none at
    all, or only filtered-out 5-LOW ones) survive the OUTER join."""
    from opentelemetry_collector_spark.plans.queries import q124_customer_orders_dist

    spark.createDataFrame(
        [(1,), (2,), (3,)], "c_custkey long"
    ).write.parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        [(10, 1, "1-URGENT"), (11, 1, "2-HIGH"), (12, 2, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    ).write.parquet(f"{tmp_path}/orders.parquet")
    got = {
        r["c_count"]: r["custdist"]
        for r in q124_customer_orders_dist(spark, str(tmp_path)).collect()
    }
    # cust 1 -> 2 qualifying, cust 2 -> only LOW (0), cust 3 -> none (0)
    assert got == {2: 1, 0: 2}


def test_q125_having_threshold_exact(spark):
    from opentelemetry_collector_spark.plans.queries import q125_large_volume_orders

    rows = q125_large_volume_orders(spark, SF).collect()
    assert rows and all(r["total_qty"] > 250 for r in rows)


def test_q123_broadcasts_dimensions(spark):
    from opentelemetry_collector_spark.plans.queries import q123_returned_items

    df = q123_returned_items(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan  # top-20 without a global sort
    assert df.count() == 20


def test_k_hop_reachability_golden(spark):
    from opentelemetry_collector_spark.operators.graph import k_hop_reachability

    # chain a->b->c->d->e plus a cycle x<->y
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y"), ("y", "x")]
    df = spark.createDataFrame([(s, d, 1) for s, d in edges], "src string, dst string, weight bigint")
    got = {r["node"]: r["n_reachable"] for r in k_hop_reachability(df, hops=3).collect()}
    # a reaches b,c,d in 3 hops (not e); x reaches y and ITSELF via the cycle
    assert got == {"a": 3, "b": 3, "c": 2, "d": 1, "x": 2, "y": 2}

    with pytest.raises(ValueError, match="hops"):
        k_hop_reachability(df, hops=0)


def test_activity_streaks_golden(spark):
    from opentelemetry_collector_spark.operators.aggregate import activity_streaks

    d0 = dt.datetime(2026, 3, 1, 12)

    def day(n, h=0):
        return d0 + dt.timedelta(days=n, hours=h)

    rows = [
        # u1: days 0,1,2 then 5,6 -> longest 3, active 5; dup events same day
        ("u1", day(0)), ("u1", day(0, 3)), ("u1", day(1)), ("u1", day(2)),
        ("u1", day(5)), ("u1", day(6)),
        # u2: single day
        ("u2", day(9)),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp")
    got = {
        r["user_id"]: (r["n_active_days"], r["longest_streak"])
        for r in activity_streaks(df, "user_id", "ts").collect()
    }
    assert got == {"u1": (5, 3), "u2": (1, 1)}


def test_corr_moments_exact_and_r2(spark):
    import pyspark.sql.functions as SF

    from opentelemetry_collector_spark.operators.aggregate import corr_moments

    # key k1: y = 2x exactly -> r^2 == 1.0 (1_000_000 ppm, floor-exact)
    # key k2: constant y -> zero variance -> r2_ppm NULL
    rows = [("k1", 1, 2), ("k1", 2, 4), ("k1", 3, 6), ("k2", 1, 7), ("k2", 5, 7)]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    got = {r["k"]: r.asDict() for r in corr_moments(df, "k", SF.col("x"), SF.col("y")).collect()}
    k1 = got["k1"]
    assert (k1["n"], k1["sum_x"], k1["sum_y"], k1["sum_xy"], k1["sum_x2"], k1["sum_y2"]) == (
        3, 6, 12, 28, 14, 56,
    )
    assert k1["r2_ppm"] == 1_000_000
    assert got["k2"]["r2_ppm"] is None


def test_corr_moments_merge_by_addition(spark):
    """The moments are mergeable: computing them over two halves and adding
    equals computing over the whole — the distributability contract."""
    import pyspark.sql.functions as SF

    from opentelemetry_collector_spark.operators.aggregate import corr_moments

    rows = [("k", i, (i * 3 + 1) % 11) for i in range(100)]
    df = spark.createDataFrame(rows, "k string, x long, y long")
    whole = corr_moments(df, "k", SF.col("x"), SF.col("y")).collect()[0]
    h1 = corr_moments(df.filter("x < 50"), "k", SF.col("x"), SF.col("y")).collect()[0]
    h2 = corr_moments(df.filter("x >= 50"), "k", SF.col("x"), SF.col("y")).collect()[0]
    for m in ["n", "sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"]:
        assert h1[m] + h2[m] == whole[m], m


def test_fuzzy_prefix_pairs_golden(spark):
    from opentelemetry_collector_spark.operators.similarity import fuzzy_prefix_pairs

    rows = [
        (1, "hello world this is doc"),
        (2, "hello world this is dox"),   # dist 1 from doc 1
        (3, "hello There completely different tail"),  # same block, far tail
        (4, "zzzzzz other block entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in fuzzy_prefix_pairs(df, "doc_id", "text", 6, 23, 3).collect()
    }
    assert got == {(1, 2): 1}
    # blocking is one-sided: doc 4 can never pair outside its block
    all_pairs = fuzzy_prefix_pairs(df, "doc_id", "text", 6, 23, 100).collect()
    assert all(4 not in (r["id_a"], r["id_b"]) for r in all_pairs)

    with pytest.raises(ValueError, match="key_len"):
        fuzzy_prefix_pairs(df, "doc_id", "text", 6, 2, 3)


def test_fuzzy_pairs_equi_join_plan(spark):
    """The blocked self-join must plan as a hash/SMJ equi join on the block
    key — never BroadcastNestedLoopJoin (the quadratic disaster)."""
    from opentelemetry_collector_spark.operators.similarity import fuzzy_prefix_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = (
        fuzzy_prefix_pairs(docs, "doc_id", "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan


def _py_triangles(und_edges):
    """Brute-force per-node triangle counts over an undirected edge set."""
    adj = {}
    for a, b in und_edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    tri = dict.fromkeys(nodes, 0)
    for i, u in enumerate(nodes):
        for v in nodes[i + 1:]:
            if v not in adj[u]:
                continue
            for w in nodes:
                if w > v and w in adj[u] and w in adj[v]:
                    tri[u] += 1
                    tri[v] += 1
                    tri[w] += 1
    return {n: (len(adj[n]), tri[n]) for n in nodes}


def test_triangle_counts_k4_plus_path(spark):
    from opentelemetry_collector_spark.operators.graph import triangle_counts

    # K4 on a..d (4 triangles, 3 per node, clustering 1.0) + pendant edge e-f
    und = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
           ("c", "d"), ("e", "f")]
    df = spark.createDataFrame(
        [(s, d, 1) for s, d in und], "src string, dst string, weight bigint"
    )
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_ppm"])
        for r in triangle_counts(df).collect()
    }
    for n in "abcd":
        assert got[n] == (3, 3, 1_000_000)
    assert got["e"] == (1, 0, 0) and got["f"] == (1, 0, 0)


def test_triangle_counts_matches_python_reference(spark):
    from opentelemetry_collector_spark.operators.graph import triangle_counts

    # deterministic pseudo-random digraph with duplicates, reversals, loops
    raw = [(f"n{(i * 13) % 23}", f"n{(i * 7 + 5) % 23}") for i in range(160)]
    df = spark.createDataFrame(
        [(s, d, (i % 3) + 1) for i, (s, d) in enumerate(raw)],
        "src string, dst string, weight bigint",
    )
    got = {
        r["node"]: (r["degree"], r["n_triangles"])
        for r in triangle_counts(df).collect()
    }
    und = {(min(s, d), max(s, d)) for s, d in raw if s != d}
    assert got == _py_triangles(und)
    # total triangle identity: each triangle attributed to exactly 3 nodes
    assert sum(t for _, t in got.values()) % 3 == 0


def test_triangle_counts_orientation_invariance(spark):
    """Edge direction, duplication, weight, and self-loops must not change
    the undirected triangle statistics."""
    from opentelemetry_collector_spark.operators.graph import triangle_counts

    base = [("a", "b"), ("b", "c"), ("c", "a")]
    noisy = base + [(d, s) for s, d in base] + base + [("a", "a")]
    df_base = spark.createDataFrame(
        [(s, d, 1) for s, d in base], "src string, dst string, weight bigint"
    )
    df_noisy = spark.createDataFrame(
        [(s, d, 9) for s, d in noisy], "src string, dst string, weight bigint"
    )
    a = {tuple(r) for r in triangle_counts(df_base).collect()}
    b = {tuple(r) for r in triangle_counts(df_noisy).collect()}
    assert a == b == {("a", 2, 1, 1_000_000), ("b", 2, 1, 1_000_000),
                      ("c", 2, 1, 1_000_000)}


def test_triangle_counts_equi_join_plan(spark):
    """The wedge self-join must be an equi hash/SMJ join on the pivot node
    with the rank comparison as a residual filter — never a nested-loop
    cross product."""
    from opentelemetry_collector_spark.operators.graph import (
        navigation_edges,
        triangle_counts,
    )

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = (
        triangle_counts(navigation_edges(ev))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_covisitation_golden_and_cap(spark):
    from opentelemetry_collector_spark.operators.graph import covisitation_pairs

    # u1 views pages 1,2 and clicks item 3; u2 views pages 1,2; u3 views page 1
    # (repeat visits collapse: u1 views page 1 twice)
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "view", 0.0),
        (1, dt.datetime(2024, 1, 1, 0, 0, 1), 51, "view", 0.0),   # page:1 again
        (1, dt.datetime(2024, 1, 1, 0, 0, 2), 2, "view", 0.0),
        (1, dt.datetime(2024, 1, 1, 0, 0, 3), 3, "click", 0.0),
        (2, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "view", 0.0),
        (2, dt.datetime(2024, 1, 1, 0, 0, 1), 2, "view", 0.0),
        (3, dt.datetime(2024, 1, 1, 0, 0, 0), 1, "view", 0.0),
        (3, dt.datetime(2024, 1, 1, 0, 0, 1), 4, "purchase", 0.0),  # not a visit
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string, value double"
    )
    got = {
        (r["node_a"], r["node_b"]): (r["n_a"], r["n_b"], r["n_both"], r["jaccard_ppm"])
        for r in covisitation_pairs(df).collect()
    }
    # page:1 seen by 3 users, page:2 by 2, item:3 by 1
    assert got[("page:1", "page:2")] == (3, 2, 2, 1_000_000 * 2 // 3)
    assert got[("item:3", "page:1")] == (1, 3, 1, 1_000_000 * 1 // 3)
    assert got[("item:3", "page:2")] == (1, 2, 1, 1_000_000 * 1 // 2)
    assert len(got) == 3

    # min_count filters singleton co-occurrences
    only = covisitation_pairs(df, min_count=2).collect()
    assert {(r["node_a"], r["node_b"]) for r in only} == {("page:1", "page:2")}

    with pytest.raises(ValueError, match="min_count"):
        covisitation_pairs(df, min_count=0)
    with pytest.raises(ValueError, match="max_per_user"):
        covisitation_pairs(df, max_per_user=1)


def test_covisitation_cap_is_deterministic_md5_rank(spark):
    """With a cap of 2, each user keeps the 2 nodes lowest in md5 order —
    reproducible across engines/partitionings, and n_users shrinks with it."""
    from opentelemetry_collector_spark.operators.graph import covisitation_pairs
    import hashlib

    # one user visits pages 0..5 (ids 0..5 -> page:0..page:5)
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, i), i, "view", 0.0) for i in range(6)
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_id bigint, event_type string, value double"
    )
    keep = sorted(
        (hashlib.md5(f"page:{i}".encode()).hexdigest(), f"page:{i}") for i in range(6)
    )[:2]
    a, b = sorted(n for _, n in keep)
    got = covisitation_pairs(df, max_per_user=2).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["node_a"], r["node_b"]) == (a, b)
    assert (r["n_a"], r["n_b"], r["n_both"], r["jaccard_ppm"]) == (1, 1, 1, 1_000_000)


def test_covisitation_equi_join_plan(spark):
    """Pair generation must be an equi join on the user key (hash or SMJ),
    with the cap planned as a WindowGroupLimit — never a nested loop."""
    from opentelemetry_collector_spark.operators.graph import covisitation_pairs

    ev = spark.read.parquet(f"{SF}/events.parquet")
    plan = (
        covisitation_pairs(ev, min_count=2, max_per_user=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan
