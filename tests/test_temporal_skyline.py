"""q133-q137 batch: SCD2 state intervals, exact weighted median,
bucket-pruned Pareto skyline (vs brute force), navigation n-grams, and
JSON payload extraction refusal semantics."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.aggregate import (
    pareto_frontier,
    state_intervals,
    weighted_median,
)
from opentelemetry_collector_spark.operators.graph import navigation_edges, path_ngrams

T0 = dt.datetime(2026, 2, 1)


def _ts(m):
    return T0 + dt.timedelta(minutes=m)


def test_state_intervals_golden(spark):
    rows = [
        ("u1", _ts(0), "signup"),
        ("u1", _ts(5), "view"),
        ("u1", _ts(9), "purchase"),
        ("u2", _ts(1), "view"),
        # simultaneous events: state tiebreak orders deterministically
        ("u3", _ts(2), "b_state"), ("u3", _ts(2), "a_state"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    got = {
        (r["user_id"], r["state"]): (r["valid_from"], r["valid_to"])
        for r in state_intervals(df, "user_id", "ts", "event_type").collect()
    }
    assert got[("u1", "signup")] == (_ts(0), _ts(5))
    assert got[("u1", "view")] == (_ts(5), _ts(9))
    assert got[("u1", "purchase")] == (_ts(9), None)  # still current
    assert got[("u2", "view")] == (_ts(1), None)
    # tie: a_state sorts first, closed by b_state at the same instant
    assert got[("u3", "a_state")] == (_ts(2), _ts(2))
    assert got[("u3", "b_state")] == (_ts(2), None)


def test_weighted_median_golden(spark):
    rows = [
        # g1: values 1,2,3 weights 1,1,2 -> total 4, cum at 2 is 2 -> 2*2>=4 hits at v=2
        ("g1", 1, 1), ("g1", 2, 1), ("g1", 3, 2),
        # g2: one heavy row dominates
        ("g2", 10, 100), ("g2", 99, 1),
    ]
    df = spark.createDataFrame(rows, "g string, v long, w long")
    got = {
        r["g"]: (r["weighted_median"], r["total_weight"])
        for r in weighted_median(df, "g", "v", "w").collect()
    }
    assert got == {"g1": (2, 4), "g2": (10, 101)}


def _brute_skyline(pts):
    out = []
    for i, (pid, x, y) in enumerate(pts):
        dominated = any(
            (qx >= x and qy >= y and (qx > x or qy > y))
            for j, (qid, qx, qy) in enumerate(pts)
            if j != i
        )
        if not dominated:
            out.append((pid, x, y))
    return sorted(out)


def test_pareto_frontier_vs_brute_force(spark):
    # pseudo-random integer points incl. duplicates and x-ties, spanning
    # multiple 1024-wide prune buckets
    pts = [(i, (i * 2654435761) % 5000, (i * 40503) % 3000) for i in range(300)]
    pts += [(900, 4999, 1), (901, 4999, 1)]  # duplicate pair: both survive
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = sorted(
        (r["id"], r["x"], r["y"]) for r in pareto_frontier(df, "id", "x", "y").collect()
    )
    assert got == _brute_skyline(pts)


def test_pareto_duplicate_max_pair_both_survive(spark):
    df = spark.createDataFrame(
        [(1, 10, 10), (2, 10, 10), (3, 5, 5)], "id long, x long, y long"
    )
    got = sorted(r["id"] for r in pareto_frontier(df, "id", "x", "y").collect())
    assert got == [1, 2]


def test_path_ngrams_bigram_equals_edges(spark):
    """n=2 path n-grams must equal the navigation edge weights — two
    independent derivations of the same transition counts."""
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    edges = {
        (r["src"], r["dst"]): r["weight"] for r in navigation_edges(ev).collect()
    }
    bigrams = {
        (r["step_0"], r["step_1"]): r["n_paths"]
        for r in path_ngrams(ev, n=2).collect()
    }
    assert bigrams == edges

    with pytest.raises(ValueError, match="n must be"):
        path_ngrams(ev, n=1)


def test_path_trigram_golden(spark):
    rows = [
        (100, _ts(0), 1, "view"),    # page:0
        (151, _ts(1), 1, "click"),   # item:51
        (52, _ts(2), 1, "view"),     # page:2
        (53, _ts(3), 1, "view"),     # page:3
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, event_type string")
    got = {
        (r["step_0"], r["step_1"], r["step_2"]): r["n_paths"]
        for r in path_ngrams(df, n=3).collect()
    }
    assert got == {
        ("page:0", "item:51", "page:2"): 1,
        ("item:51", "page:2", "page:3"): 1,
    }


def test_json_extraction_refuses_junk_per_row(spark):
    """get_json_object degrades malformed payloads to NULL per row (the
    codec refusal discipline) — junk never poisons the aggregate."""
    rows = [("a", '{"k": 5}'), ("a", "not json"), ("a", None), ("a", '{"x": 1}')]
    df = spark.createDataFrame(rows, "event_type string, props string")
    k = F.get_json_object("props", "$.k").cast("bigint")
    r = df.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"), F.sum(k).alias("sum_k")
    ).collect()[0]
    assert (r["n_with_k"], r["sum_k"]) == (1, 5)
