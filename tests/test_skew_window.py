"""bucketed_row_number: exact two-phase sequence numbering that spreads a
hot key's window sort over its buckets (SURVEY §7 risk 3 — the turn-index
derivation is this window)."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.aggregate import bucketed_row_number


def _df(spark, n=4000, hot_frac=0.5, seed=2):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = "hot" if rng.random() < hot_frac else f"k{rng.randint(0, 5)}"
        rows.append((k, rng.randint(0, 999), i))
    return spark.createDataFrame(rows, "k string, t int, uid int")


def _plain(df):
    w = Window.partitionBy("k").orderBy("t", "uid")
    return df.withColumn("rn", F.row_number().over(w))


def test_matches_plain_window_exactly_with_hot_key_and_ties(spark):
    df = _df(spark)  # t collides heavily (1000 values, 4000 rows)
    got = bucketed_row_number(df, ["k"], ["t", "uid"], (F.col("t") / 50).cast("int"))
    a = {(r.k, r.uid): r.rn for r in _plain(df).collect()}
    b = {(r.k, r.uid): r.rn for r in got.collect()}
    assert a == b


def test_constant_bucket_degenerates_to_plain(spark):
    df = _df(spark, n=500)
    got = bucketed_row_number(df, ["k"], ["t", "uid"], F.lit(0))
    a = {(r.k, r.uid): r.rn for r in _plain(df).collect()}
    b = {(r.k, r.uid): r.rn for r in got.collect()}
    assert a == b


def test_local_sort_partitioned_by_key_and_bucket(spark):
    df = _df(spark, n=500)
    got = bucketed_row_number(df, ["k"], ["t", "uid"], (F.col("t") / 50).cast("int"))
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the corpus-carrying exchange keys on (k, bucket) — the hot key splits
    assert "hashpartitioning(k#" in plan and "_bk" in plan
    # the offset frame is broadcast back, never a corpus-wide join shuffle
    assert "BroadcastHashJoin" in plan
