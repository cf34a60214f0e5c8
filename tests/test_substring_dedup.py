"""Exact-substring duplication marking goldens (operators/substring.py)."""

from __future__ import annotations

from opentelemetry_collector_spark.operators.substring import duplicated_spans


def _run(spark, rows, min_len):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in duplicated_spans(df, "doc_id", min_len=min_len).collect()}


def test_cross_doc_shared_substring(spark):
    rows = [
        (1, "xxxxxABCDEFGHIJyyyyy"),  # shared 10-gram at pos 6..15
        (2, "zzABCDEFGHIJqq"),        # shared 10-gram at pos 3..12
        (3, "totally unique text."),
    ]
    got = _run(spark, rows, min_len=10)
    assert (got[1]["dup_chars"], got[1]["n_spans"]) == (10, 1)
    assert (got[2]["dup_chars"], got[2]["n_spans"]) == (10, 1)
    assert (got[3]["dup_chars"], got[3]["n_spans"]) == (0, 0)
    assert got[1]["dup_pm"] == 500  # 10 of 20 chars
    assert got[1]["n_chars"] == 20


def test_same_doc_repeat_counts(spark):
    """'occurs more than once in the corpus' includes same-doc repeats:
    both copies are marked, separated by the gap."""
    got = _run(spark, [(1, "ABCDEFGHIJ--ABCDEFGHIJ")], min_len=10)
    assert got[1]["dup_chars"] == 20
    assert got[1]["n_spans"] == 2


def test_overlapping_windows_merge_to_one_span(spark):
    """A long shared region yields many overlapping L-gram windows that
    must union to ONE maximal span covering the whole region."""
    shared = "0123456789abcdefghij"  # 20 chars, L=10 -> 11 windows
    got = _run(spark, [(1, f"AA{shared}BB"), (2, f"CC{shared}DD")], min_len=10)
    assert (got[1]["dup_chars"], got[1]["n_spans"]) == (20, 1)
    assert (got[2]["dup_chars"], got[2]["n_spans"]) == (20, 1)


def test_short_docs_and_exact_length(spark):
    got = _run(spark, [(1, "short"), (2, "ABCDEFGHIJ"), (3, "ABCDEFGHIJ")], min_len=10)
    assert (got[1]["dup_chars"], got[1]["n_spans"]) == (0, 0)  # < L: no grams
    assert (got[2]["dup_chars"], got[2]["n_spans"]) == (10, 1)  # doc == gram
    assert got[2]["dup_pm"] == 1000


def test_plan_shape_single_kernel_and_windows(spark):
    df = spark.createDataFrame([(1, "x" * 60), (2, "y" * 60)], "doc_id bigint, text string")
    plan = duplicated_spans(df, "doc_id", min_len=10)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan  # no per-row Python anywhere
    assert plan.count("MapInPandas") == 1  # the anchor kernel runs ONCE
    assert "Window" in plan  # the gram-count pass and the per-doc islands pass
    assert plan.count("HashAggregate") >= 2  # span/doc rollups (partial+final)
