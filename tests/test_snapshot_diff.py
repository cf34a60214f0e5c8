"""Snapshot diff (plans/diff.py): keyed added/removed/changed classification
with a NULL-safe, boundary-safe row digest; unchanged rows never surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.diff import row_digest, snapshot_diff


def _pair(spark):
    old = spark.createDataFrame(
        [
            ("k1", "a", 1),
            ("k2", "b", 2),
            ("k3", "c", 3),
            ("k4", None, 4),
        ],
        "id string, s string, n int",
    )
    new = spark.createDataFrame(
        [
            ("k1", "a", 1),      # unchanged
            ("k2", "B", 2),      # changed
            ("k4", "", 4),       # NULL -> empty string IS a change
            ("k5", "e", 5),      # added
        ],
        "id string, s string, n int",
    )
    return old, new


def test_classification_and_unchanged_suppression(spark):
    old, new = _pair(spark)
    got = {(r["id"], r["status"]) for r in snapshot_diff(old, new, ["id"]).collect()}
    assert got == {("k2", "changed"), ("k3", "removed"), ("k4", "changed"), ("k5", "added")}


def test_digest_boundary_and_null_safety(spark):
    # ('ab','c') vs ('a','bc') must differ; NULL vs '' must differ
    df = spark.createDataFrame(
        [("ab", "c"), ("a", "bc"), (None, ""), ("", None)], "x string, y string"
    )
    digests = [r[0] for r in df.select(row_digest(["x", "y"])).collect()]
    assert len(set(digests)) == 4


def test_compare_cols_validation(spark):
    old, new = _pair(spark)
    with pytest.raises(ValueError, match="missing"):
        snapshot_diff(old, new, ["id"], compare_cols=["nope"])
    with pytest.raises(ValueError, match="keys cover"):
        snapshot_diff(old.select("id"), new.select("id"), ["id"])


def test_diff_plan_is_single_equi_join(spark):
    old, new = _pair(spark)
    plan = (
        snapshot_diff(old, new, ["id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "FullOuter" in plan and "BroadcastNestedLoopJoin" not in plan
