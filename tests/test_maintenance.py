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


def _file_sig(path, partition_col, value):
    d = os.path.join(path, f"{partition_col}={value}")
    return sorted(
        (f, os.path.getsize(os.path.join(d, f)), os.path.getmtime(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def test_purge_rewrites_only_hit_partitions_and_drops_empty(spark, tmp_path):
    from opentelemetry_collector_spark.plans.maintenance import purge_keys

    path = str(tmp_path / "purge")
    rows = [
        # day=a: mixed; day=b: untouched; day=c: fully purged
        ("k1", "a"), ("k2", "a"), ("k3", "a"),
        ("k4", "b"), ("k5", "b"),
        ("k6", "c"), ("k7", "c"),
    ]
    spark.createDataFrame(rows, "k string, day string").write.partitionBy(
        "day"
    ).parquet(path)
    before_b = _file_sig(path, "day", "b")

    got = purge_keys(spark, path, "day", "k", ["k1", "k3", "k6", "k7", "k_absent"])
    assert got == {
        "partitions_rewritten": 1,
        "partitions_dropped": 1,
        "rows_purged": 4,
        "rows_remaining": 3,
    }
    left = {r["k"] for r in spark.read.parquet(path).collect()}
    assert left == {"k2", "k4", "k5"}
    # untouched partition is byte-identical (same files, sizes, mtimes)
    assert _file_sig(path, "day", "b") == before_b
    assert not os.path.isdir(os.path.join(path, "day=c"))

    # idempotence: deletion requests repeat; a second purge finds nothing
    again = purge_keys(spark, path, "day", "k", ["k1", "k6"])
    assert again["partitions_rewritten"] == 0 and again["partitions_dropped"] == 0
    assert again["rows_purged"] == 0 and again["rows_remaining"] == -1


def test_purge_accepts_key_dataframe_and_empty_list(spark, tmp_path):
    from opentelemetry_collector_spark.plans.maintenance import purge_keys

    path = str(tmp_path / "purge2")
    spark.createDataFrame(
        [("k1", "a"), ("k2", "a")], "k string, day string"
    ).write.partitionBy("day").parquet(path)

    assert purge_keys(spark, path, "day", "k", [])["rows_purged"] == 0

    kdf = spark.createDataFrame([("k2",), ("k2",)], ["victim"])  # dup keys collapse
    got = purge_keys(spark, path, "day", "k", kdf)
    assert got["rows_purged"] == 1 and got["rows_remaining"] == 1


def test_purge_everything_leaves_empty_table(spark, tmp_path):
    from opentelemetry_collector_spark.plans.maintenance import purge_keys

    path = str(tmp_path / "purge3")
    spark.createDataFrame(
        [("k1", "a"), ("k2", "b")], "k string, day string"
    ).write.partitionBy("day").parquet(path)
    got = purge_keys(spark, path, "day", "k", ["k1", "k2"])
    assert got["partitions_dropped"] == 2 and got["rows_remaining"] == 0


def _merge_sink(spark, tmp_path):
    """Keyed sink: 2 partitions x 3 keys at ts=100."""
    path = str(tmp_path / "merge_sink")
    rows = [(p, k, 100, f"v0-{p}-{k}") for p in ("a", "b") for k in (1, 2, 3)]
    df = spark.createDataFrame(rows, "part string, key long, ts long, val string")
    df.write.mode("overwrite").partitionBy("part").parquet(path)
    return path


def test_merge_upsert_latest_wins_and_tombstones(spark, tmp_path):
    from opentelemetry_collector_spark.plans.maintenance import merge_upsert

    path = _merge_sink(spark, tmp_path)
    # untouched partition b: files must stay byte-identical
    bdir = os.path.join(path, "part=b")
    before_b = sorted(
        (f, os.path.getsize(os.path.join(bdir, f)))
        for f in os.listdir(bdir) if f.endswith(".parquet")
    )
    updates = spark.createDataFrame(
        [
            ("a", 1, 200, "v1-new", False),     # newer: wins
            ("a", 2, 50, "v1-stale", False),    # older: loses
            ("a", 3, 300, None, True),          # tombstone: key deleted
            ("a", 9, 150, "v1-insert", False),  # brand-new key
        ],
        "part string, key long, ts long, val string, deleted boolean",
    )
    stats = merge_upsert(
        spark, path, updates, "part", ["key"], "ts", tombstone_col="deleted"
    )
    assert stats["partitions_rewritten"] == 1 and stats["rows_in_batch"] == 4
    got = {
        (r["part"], r["key"]): (r["ts"], r["val"])
        for r in spark.read.parquet(path).collect()
    }
    assert got[("a", 1)] == (200, "v1-new")       # update applied
    assert got[("a", 2)] == (100, "v0-a-2")       # stale change ignored
    assert ("a", 3) not in got                     # tombstoned
    assert got[("a", 9)] == (150, "v1-insert")    # insert
    for k in (1, 2, 3):
        assert got[("b", k)] == (100, f"v0-b-{k}")  # untouched partition
    after_b = sorted(
        (f, os.path.getsize(os.path.join(bdir, f)))
        for f in os.listdir(bdir) if f.endswith(".parquet")
    )
    assert after_b == before_b


def test_merge_upsert_tie_prefers_update_and_is_idempotent(spark, tmp_path):
    from opentelemetry_collector_spark.plans.maintenance import merge_upsert

    path = _merge_sink(spark, tmp_path)
    updates = spark.createDataFrame(
        [("a", 1, 100, "tie-update")], "part string, key long, ts long, val string"
    )
    def snapshot():
        return sorted(
            (r["part"], r["key"], r["ts"], r["val"])
            for r in spark.read.parquet(path).collect()
        )

    merge_upsert(spark, path, updates, "part", ["key"], "ts")
    first = snapshot()
    assert ("a", 1, 100, "tie-update") in first  # equal ts: the update wins
    # re-applying the identical batch converges (idempotence by value)
    merge_upsert(spark, path, updates, "part", ["key"], "ts")
    assert snapshot() == first


def test_merge_upsert_all_tombstones_drops_partition(spark, tmp_path):
    from opentelemetry_collector_spark.plans.maintenance import merge_upsert

    path = _merge_sink(spark, tmp_path)
    updates = spark.createDataFrame(
        [("a", k, 999, None, True) for k in (1, 2, 3)],
        "part string, key long, ts long, val string, deleted boolean",
    )
    stats = merge_upsert(
        spark, path, updates, "part", ["key"], "ts", tombstone_col="deleted"
    )
    assert stats["rows_after"] == 0
    assert not os.path.isdir(os.path.join(path, "part=a"))
    assert spark.read.parquet(path).count() == 3  # partition b intact


def test_merge_upsert_bootstraps_empty_sink(spark, tmp_path):
    from opentelemetry_collector_spark.plans.maintenance import merge_upsert

    path = str(tmp_path / "fresh_sink")
    updates = spark.createDataFrame(
        [("a", 1, 10, "first")], "part string, key long, ts long, val string"
    )
    stats = merge_upsert(spark, path, updates, "part", ["key"], "ts")
    assert stats == {"partitions_rewritten": 1, "rows_in_batch": 1, "rows_after": 1}
