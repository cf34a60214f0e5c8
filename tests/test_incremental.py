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
