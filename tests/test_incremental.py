"""Incremental batch ingest (sources/incremental.py): the scheduled
scraper-trigger analog — new epochs only, at-least-once replay, static
partition pruning."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.incremental import (
    EpochCursor,
    list_epochs,
    read_new_epochs,
)


def _land(spark, path, epoch, n=10):
    df = spark.range(n).select(
        F.col("id"), F.lit(f"e{epoch}").alias("text"), F.lit(epoch).alias("_epoch")
    )
    df.write.mode("append").partitionBy("_epoch").parquet(path)


@pytest.fixture()
def zone(spark, tmp_path):
    path = str(tmp_path / "landing")
    _land(spark, path, "0001")
    _land(spark, path, "0002")
    return path


def test_first_run_reads_everything_then_only_new(spark, zone, tmp_path):
    cur = EpochCursor(str(tmp_path / "state.json"))
    df, new = read_new_epochs(spark, zone, "_epoch", cur)
    assert new == ["0001", "0002"] and df.count() == 20
    cur.commit(max(new))

    # nothing new -> no scan at all
    df2, new2 = read_new_epochs(spark, zone, "_epoch", cur)
    assert df2 is None and new2 == []

    _land(spark, zone, "0003")
    df3, new3 = read_new_epochs(spark, zone, "_epoch", cur)
    assert new3 == ["0003"] and df3.count() == 10
    assert set(r["text"] for r in df3.collect()) == {"e0003"}


def test_crash_before_commit_replays_same_epochs(spark, zone, tmp_path):
    cur = EpochCursor(str(tmp_path / "state.json"))
    _, new = read_new_epochs(spark, zone, "_epoch", cur)
    # crash: no commit — the next run sees the identical epoch set
    _, again = read_new_epochs(spark, zone, "_epoch", cur)
    assert again == new


def test_commit_never_moves_backwards(tmp_path):
    cur = EpochCursor(str(tmp_path / "state.json"))
    cur.commit("0005")
    cur.commit("0003")  # replay of an older batch
    assert cur.read() == "0005"


def test_incremental_scan_is_statically_pruned(spark, zone, tmp_path):
    """The epoch IN-list must reach the scan as a partition filter — the
    read touches new epochs only, not table history."""
    cur = EpochCursor(str(tmp_path / "state.json"))
    cur.commit("0001")
    df, new = read_new_epochs(spark, zone, "_epoch", cur)
    assert new == ["0002"]
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # directory inference typed the epoch as int: the probe must reach the
    # scan as a PARTITION filter on the typed value (2, not '0002')
    assert "PartitionFilters" in plan and "_epoch" in plan
    assert "= 2" in plan


def test_empty_zone(spark, tmp_path):
    cur = EpochCursor(str(tmp_path / "state.json"))
    df, new = read_new_epochs(spark, str(tmp_path / "nothing"), "_epoch", cur)
    assert df is None and new == []
    assert list_epochs(str(tmp_path / "nothing"), "_epoch") == []


def test_e2e_incremental_merge_pipeline(spark, tmp_path):
    """The full CDC loop: land epochs -> incremental read -> keyed
    aggregate -> merge_upsert into a serving table -> commit cursor.
    A crash-replay of the SAME epoch converges to identical serving rows
    (at-least-once delivery x idempotent merge = effective exactly-once)."""
    from opentelemetry_collector_spark.plans.maintenance import merge_upsert

    land = str(tmp_path / "landing")
    serve = str(tmp_path / "serving")
    state = str(tmp_path / "cursor.json")

    def land_epoch(epoch, rows):
        df = spark.createDataFrame(rows, "user string, n long").select(
            F.col("user"), F.col("n"), F.lit(epoch).alias("_epoch")
        )
        df.write.mode("append").partitionBy("_epoch").parquet(land)

    def process_once(commit=True):
        cur = EpochCursor(state)
        df, new = read_new_epochs(spark, land, "_epoch", cur)
        if df is None:
            return []
        agg = df.groupBy("user").agg(F.sum("n").alias("total")).select(
            F.lit("all").alias("part"),
            F.col("user"),
            F.lit(max(new)).cast("long").alias("ts"),
            F.col("total"),
        )
        merge_upsert(spark, serve, agg, "part", ["user"], "ts")
        if commit:
            cur.commit(max(new))
        return new

    land_epoch("0001", [("alice", 1), ("bob", 2)])
    assert process_once() == ["0001"]

    land_epoch("0002", [("alice", 10)])
    # crash BEFORE commit: serving already updated, cursor not moved
    assert process_once(commit=False) == ["0002"]
    snap_after_crash = sorted(
        (r["user"], r["total"]) for r in spark.read.parquet(serve).collect()
    )
    # replay processes 0002 again; the merge converges to the same rows
    assert process_once() == ["0002"]
    snap_after_replay = sorted(
        (r["user"], r["total"]) for r in spark.read.parquet(serve).collect()
    )
    assert snap_after_replay == snap_after_crash == [("alice", 10), ("bob", 2)]

    # nothing new after commit
    assert process_once() == []
