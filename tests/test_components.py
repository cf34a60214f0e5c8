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
    got = _cc_map(spark, edges, max_iter=15)
    assert set(got.values()) == {0} and len(got) == 200


def test_star_and_duplicate_reversed_edges(spark):
    edges = [(5, 1), (1, 7), (7, 1), (1, 5), (1, 9)]
    got = _cc_map(spark, edges)
    assert got == {1: 1, 5: 1, 7: 1, 9: 1}


def test_empty_and_self_edges(spark):
    assert _cc_map(spark, []) == {}
    assert _cc_map(spark, [(3, 3)]) == {}  # self-edges carry no information


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_graph_matches_union_find(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(120))
    edges = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    uf = _UnionFind()
    for a, b in edges:
        uf.union(a, b)
    assert _cc_map(spark, edges) == uf.components()


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
