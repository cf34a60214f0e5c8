"""Routing: predicate-driven fan-out to sinks.

Reference: the fan-out consumer hands the same batch to every pipeline
exporter (``service/internal/fanoutconsumer/consumer.go:31-112``); per-sink
selection comes from each pipeline's filter chain. Spark-side a route is a
named predicate; a row lands in EVERY sink whose predicate matches (cloning
fan-out semantics, ``cloningconsumer.go:44-90``, free under immutability).

Two physical strategies:
- :func:`fan_out` — one filtered DataFrame per sink (N passes over the scan;
  fine when Catalyst prunes columns/partitions per sink).
- :func:`route_tagged` — single-pass: build an array of matching sink names,
  explode once, then partition the write by `sink` (one shuffle, one pass —
  the choice at 100 TB where re-scanning is the bottleneck).

Both produce identical per-sink row sets (the cloning-vs-original
equivalence gate, FIXTURES.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Route:
    name: str
    predicate: Column  # a boolean Column expression


def fan_out(df: DataFrame, routes: list[Route]) -> dict[str, DataFrame]:
    return {r.name: df.filter(r.predicate) for r in routes}


def route_tagged(df: DataFrame, routes: list[Route]) -> DataFrame:
    """Adds a `sink` column; rows matching k routes appear k times (k>=0).

    filter(size>0) drops unrouted rows — the reference drops data for which
    no pipeline matches (there is no default route unless configured).
    """
    sinks = F.filter(
        F.array(*[F.when(r.predicate, F.lit(r.name)) for r in routes]),
        lambda x: x.isNotNull(),
    )
    return (
        df.withColumn("_sinks", sinks)
        .filter(F.size("_sinks") > 0)
        .withColumn("sink", F.explode("_sinks"))
        .drop("_sinks")
    )


def route_counts(df: DataFrame, routes: list[Route]) -> DataFrame:
    """Per-sink accepted-record counts in ONE aggregation pass (the
    obsreport `sent_log_records` per exporter, obs_exporter.go:24-95)."""
    tagged = route_tagged(df, routes)
    return tagged.groupBy("sink").agg(F.count(F.lit(1)).alias("sent_records"))
