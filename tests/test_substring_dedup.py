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


# ---------------------------------------------------------------------------
# destructive removal (remove_duplicated_spans, ExactSubstr policy)
# ---------------------------------------------------------------------------

from opentelemetry_collector_spark.operators.substring import (  # noqa: E402
    remove_duplicated_spans,
)


def _cut(spark, rows, min_len):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {
        r["doc_id"]: r
        for r in remove_duplicated_spans(df, "doc_id", min_len=min_len).collect()
    }


def test_removal_keeps_first_corpus_occurrence(spark):
    rows = [
        (1, "xxxxxABCDEFGHIJyyyyy"),  # first occurrence (doc 1 < doc 2)
        (2, "zzABCDEFGHIJqq"),
        (3, "totally unique text."),
    ]
    got = _cut(spark, rows, min_len=10)
    # doc 1 holds the min-(id,pos) occurrence -> untouched
    assert got[1]["cleaned"] == "xxxxxABCDEFGHIJyyyyy"
    assert (got[1]["removed_chars"], got[1]["n_cuts"]) == (0, 0)
    # doc 2's copy is excised, text spliced around it
    assert got[2]["cleaned"] == "zzqq"
    assert (got[2]["removed_chars"], got[2]["n_cuts"]) == (10, 1)
    assert got[3]["cleaned"] == "totally unique text."


def test_removal_same_doc_repeat_keeps_one_copy(spark):
    got = _cut(spark, [(1, "ABCDEFGHIJ--ABCDEFGHIJ")], min_len=10)
    # the pos-13 copy is the non-first occurrence
    assert got[1]["cleaned"] == "ABCDEFGHIJ--"
    assert (got[1]["removed_chars"], got[1]["n_cuts"]) == (10, 1)


def test_removal_whole_doc_duplicate_becomes_empty(spark):
    got = _cut(spark, [(1, "ABCDEFGHIJ"), (2, "ABCDEFGHIJ")], min_len=10)
    assert got[1]["cleaned"] == "ABCDEFGHIJ"
    assert got[2]["cleaned"] == ""
    assert (got[2]["removed_chars"], got[2]["n_cuts"]) == (10, 1)


def test_removal_multiple_cuts_splice_correctly(spark):
    shared1 = "0123456789"
    shared2 = "abcdefghij"
    rows = [
        (1, f"{shared1}--{shared2}"),      # holds both first occurrences
        (2, f"LL{shared1}MM{shared2}RR"),  # loses both, keeps the seams
    ]
    got = _cut(spark, rows, min_len=10)
    assert got[1]["cleaned"] == f"{shared1}--{shared2}"
    assert got[2]["cleaned"] == "LLMMRR"
    assert (got[2]["removed_chars"], got[2]["n_cuts"]) == (20, 2)


def test_removal_null_and_short_docs_pass_through(spark):
    got = _cut(spark, [(1, None), (2, "tiny")], min_len=10)
    assert got[1]["cleaned"] is None and got[1]["n_chars"] == 0
    assert got[2]["cleaned"] == "tiny" and got[2]["removed_chars"] == 0
    assert len(got) == 2
