"""Connected-components cluster resolution (pairs -> clusters -> survivors).

The alternating large-star/small-star operator is checked against a plain
union-find oracle on seeded random graphs, plus shape cases the rounds-based
algorithm must get right (long paths, stars, singletons, empty edge sets).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.dedup import (
    connected_components,
    dedup_clusters,
    dedup_survivors,
)


def _pairs_df(spark, edges):
    if not edges:
        return spark.createDataFrame([], "a_id bigint, b_id bigint")
    return spark.createDataFrame([(int(a), int(b)) for a, b in edges], "a_id bigint, b_id bigint")


class _UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)

    def components(self):
        return {x: self.find(x) for x in list(self.p)}


def _cc_map(spark, edges, **kw):
    out = connected_components(_pairs_df(spark, edges), **kw).collect()
    return {r.id: r.component_id for r in out}


def test_two_clusters_and_chain(spark):
    # {0,1,2} via a chain, {10,11} direct
    got = _cc_map(spark, [(0, 1), (1, 2), (10, 11)])
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


def test_long_path_converges_in_bounded_rounds(spark):
    # 200-node path: diameter 199 — naive min-propagation needs ~200
    # rounds; large-star/small-star must finish well inside max_iter=15.
    edges = [(i, i + 1) for i in range(199)]
    got = _cc_map(spark, edges, max_iter=15, driver_edge_threshold=0)
    assert set(got.values()) == {0} and len(got) == 200


def test_star_and_duplicate_reversed_edges(spark):
    edges = [(5, 1), (1, 7), (7, 1), (1, 5), (1, 9)]
    got = _cc_map(spark, edges)
    assert got == {1: 1, 5: 1, 7: 1, 9: 1}


def test_empty_and_self_edges(spark):
    assert _cc_map(spark, []) == {}
    assert _cc_map(spark, [(3, 3)]) == {}  # self-edges carry no information


@pytest.mark.parametrize("seed", [0, 1, 2])
# threshold 0 = distributed large-star/small-star, default = driver
# union-find fast path: both must match the reference union-find exactly
@pytest.mark.parametrize("threshold", [0, 2_000_000])
def test_random_graph_matches_union_find(spark, seed, threshold):
    rng = random.Random(seed)
    nodes = list(range(120))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    assert _cc_map(spark, edges, driver_edge_threshold=threshold) == uf.components()


def test_driver_path_matches_distributed_on_string_ids(spark):
    # UTF-8 byte order == code-point order: the driver fast path's Python
    # min() must pick the same component roots as Spark's least()
    edges = [("doc-b", "doc-a"), ("doc-a", "Zeta"), ("é2", "é1"), ("x", "x")]
    df = spark.createDataFrame(edges, "a_id string, b_id string")
    fast = {r.id: r.component_id for r in connected_components(df).collect()}
    dist = {
        r.id: r.component_id
        for r in connected_components(df, driver_edge_threshold=0).collect()
    }
    assert fast == dist == {"doc-b": "Zeta", "doc-a": "Zeta", "Zeta": "Zeta", "é2": "é1", "é1": "é1"}


def test_driver_threshold_boundary_falls_back_to_distributed(spark):
    # 3 distinct edges with threshold 2: the probe collects 3 rows (> 2)
    # and must discard them — the distributed loop still gets it right
    edges = [(0, 1), (1, 2), (10, 11)]
    got = _cc_map(spark, edges, driver_edge_threshold=2)
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10}


def test_dedup_clusters_includes_singletons(spark):
    docs = spark.createDataFrame([(i, f"doc {i}") for i in range(6)], "doc_id bigint, text string")
    out = dedup_clusters(docs, _pairs_df(spark, [(0, 1), (1, 4)]), "doc_id")
    got = {r.doc_id: (r.component_id, r.n_members) for r in out.collect()}
    assert got == {0: (0, 3), 1: (0, 3), 4: (0, 3), 2: (2, 1), 3: (3, 1), 5: (5, 1)}


def test_survivors_min_id_and_quality_policy(spark):
    docs = spark.createDataFrame(
        [(0, 10.0), (1, 99.0), (2, 5.0), (7, 1.0)], "doc_id bigint, quality double"
    )
    pairs = _pairs_df(spark, [(0, 1), (1, 2)])
    by_min = dedup_survivors(docs, pairs, "doc_id")
    assert {r.doc_id for r in by_min.collect()} == {0, 7}
    by_q = dedup_survivors(docs, pairs, "doc_id", order_col=F.col("quality"))
    assert {r.doc_id for r in by_q.collect()} == {1, 7}


def test_exact_dedup_null_texts_are_singletons(spark):
    """NULL text has no fingerprint: each junk row is its own singleton,
    never one giant 'duplicate' cluster (matching exact_dedup_against's
    NULL-equi-join semantics)."""
    from opentelemetry_collector_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [(1, "same text"), (2, "same text"), (3, None), (4, None)],
        "doc_id long, text string",
    )
    rows = exact_dedup(df, "doc_id").collect()
    real = [r for r in rows if r.fp is not None]
    nulls = sorted(r.survivor_id for r in rows if r.fp is None)
    assert len(real) == 1 and real[0].survivor_id == 1 and real[0].n_copies == 2
    assert nulls == [3, 4] and all(r.n_copies == 1 for r in rows if r.fp is None)


def test_dedup_clusters_handles_id_named_id_and_preserves_other_id(spark):
    from opentelemetry_collector_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    # id_col literally named 'id' must not be ambiguous
    docs = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    got = {r.id: r.component_id for r in dedup_clusters(docs, pairs, "id").collect()}
    assert got == {1: 1, 2: 1, 3: 3}
    # an unrelated column named 'id' must survive the join
    docs2 = spark.createDataFrame([(1, 100), (2, 200)], "doc_id long, id long")
    out = dedup_clusters(docs2, pairs, "doc_id")
    assert "id" in out.columns
    assert {r.doc_id: r.id for r in out.collect()} == {1: 100, 2: 200}


def test_simhash_max_hamming_zero_is_exact_signature_match(spark):
    from opentelemetry_collector_spark.operators.dedup import simhash_neardup_pairs

    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon"), (2, "alpha beta gamma delta epsilon"),
         (3, "totally different words here now")],
        "doc_id long, text string",
    )
    pairs = simhash_neardup_pairs(df, "doc_id", max_hamming=0)
    got = {(r.a_id, r.b_id) for r in pairs.collect()}
    assert (1, 2) in got and all(p == (1, 2) for p in got)


def test_dedup_survivors_quality_windows_only_multimember_clusters(spark):
    from opentelemetry_collector_spark.operators.dedup import dedup_survivors

    pairs = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    docs = spark.createDataFrame(
        [(1, 5.0), (2, 9.0), (3, 1.0)], "doc_id long, quality double"
    )
    out = dedup_survivors(docs, pairs, "doc_id", order_col=F.col("quality"))
    assert {r.doc_id for r in out.collect()} == {2, 3}  # best of cluster + singleton
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the window only sees the multi-member slice; singletons bypass it
    assert "Window" in plan


def test_grok_pack_row_level_first_match_wins(spark):
    """A row claimed by pattern 1 keeps pattern 1's groups ONLY — an empty
    optional group must stay NULL, not be backfilled by a later pattern
    (the per-column fill bug)."""
    from opentelemetry_collector_spark.operators.parse import grok_pack

    df = spark.createDataFrame([(1, "x"), (2, "abc")], "id long, text string")
    out = {r.id: (r.a, r.b) for r in grok_pack(
        df, "text", [r"(?P<a>\d+)?(?P<b>x)", r"(?P<a>[a-z]+)"]
    ).collect()}
    assert out[1] == (None, "x")    # pattern 1 matched; its optional a stays NULL
    assert out[2] == ("abc", None)  # pattern 2 handles the row pattern 1 missed


def test_grok_pack_validates_patterns(spark):
    import pytest

    from opentelemetry_collector_spark.operators.parse import grok_pack

    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        grok_pack(df, "text", [])
    with pytest.raises(ValueError, match="named groups"):
        grok_pack(df, "text", [r"\d+"])
