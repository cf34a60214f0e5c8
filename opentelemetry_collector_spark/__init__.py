"""PySpark-native reimplementation of the OpenTelemetry Collector pipeline.

A from-scratch batch **parse -> enrich -> route -> aggregate** engine over
tables of multi-turn conversation/agent transcripts
(``conv_id, turn_idx, role, text, tool, ts``), re-expressing the semantics of
the reference Collector's receiver -> processor -> exporter dataflow
(reference: /root/reference, ``service/defaultcomponents/defaults.go:59-115``)
as idiomatic Spark DataFrame operations.

Design principles (see SURVEY.md):
- DataFrames only; no RDDs, no per-row Python UDFs (pandas/Arrow UDFs where
  Spark builtins can't express the semantics, e.g. murmur3 sampler parity).
- Processors are pure ``DataFrame -> DataFrame`` functions compiled once from
  a config spec (the reference compiles regex/actions at build time,
  ``processor/processorhelper/attraction.go:139-212``).
- Fan-out/fan-in are unions and predicate-filtered writes; the reference's
  clone-capability machinery disappears under immutability.
"""

__version__ = "0.1.0"
