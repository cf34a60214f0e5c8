"""Sink maintenance (plans/maintenance.py): compaction rewrites only
fragmented partitions idempotently; retention drops old partitions."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.plans.maintenance import (
    _list_partitions,
    compact_partitions,
    expire_partitions,
)


def _write_epochs(spark, path, epochs, files_per_epoch):
    for e in epochs:
        df = spark.range(100).select(
            F.col("id"), F.lit(f"payload-{e}").alias("text"), F.lit(e).alias("_epoch")
        )
        (
            df.repartition(files_per_epoch)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_epoch")
            .parquet(path)
        )


@pytest.fixture()
def sink(spark, tmp_path):
    path = str(tmp_path / "sink")
    _write_epochs(spark, path, epochs=[0, 1, 2], files_per_epoch=4)
    return path


def test_compaction_preserves_rows_and_hits_file_budget(spark, sink):
    before = spark.read.parquet(sink)
    rows_before = {tuple(r) for r in before.collect()}
    res = compact_partitions(spark, sink, "_epoch", max_files_per_partition=1)
    assert res["partitions_compacted"] == 3
    assert res["files_before"] == 12
    assert res["files_after"] == 3
    after = spark.read.parquet(sink)
    assert {tuple(r) for r in after.collect()} == rows_before


def test_compaction_skips_healthy_partitions_and_is_idempotent(spark, sink):
    compact_partitions(spark, sink, "_epoch", max_files_per_partition=1)
    # record the compacted file identities, then append one more epoch
    healthy_files = {
        f for f in os.listdir(os.path.join(sink, "_epoch=0")) if f.endswith(".parquet")
    }
    _write_epochs(spark, sink, epochs=[3], files_per_epoch=4)
    res = compact_partitions(spark, sink, "_epoch", max_files_per_partition=1)
    assert res["partitions_compacted"] == 1  # only the new fragmented epoch
    assert healthy_files == {
        f for f in os.listdir(os.path.join(sink, "_epoch=0")) if f.endswith(".parquet")
    }  # untouched partitions keep byte-identical files
    res2 = compact_partitions(spark, sink, "_epoch", max_files_per_partition=1)
    assert res2["partitions_compacted"] == 0  # converged


def test_compaction_respects_max_records_per_file(spark, sink):
    res = compact_partitions(
        spark, sink, "_epoch", max_files_per_partition=1, max_records_per_file=50
    )
    assert res["partitions_compacted"] == 3
    stats = {s.value: s for s in _list_partitions(sink, "_epoch")}
    assert all(s.n_files == 2 for s in stats.values())  # 100 rows / 50 per file


def test_expire_drops_only_old_partitions(spark, sink):
    dropped = expire_partitions(sink, "_epoch", keep_from="1")
    assert dropped == ["0"]
    left = spark.read.parquet(sink)
    assert set(r["_epoch"] for r in left.select("_epoch").distinct().collect()) == {1, 2}
