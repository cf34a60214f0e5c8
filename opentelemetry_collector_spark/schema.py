"""Schemas: the fixed envelope / dynamic payload split of the reference.

The reference's pdata LogRecord carries a fixed protobuf envelope plus a
schemaless ``AttributeMap`` payload (``model/pdata/generated_log.go:523-618``,
``model/pdata/common.go:367-624``). Spark-side that becomes a StructType
envelope (the transcripts columns) plus a ``MapType(string,string)`` ``attrs``
column — variant payloads stringified exactly as the reference does when
matching (``internal/processor/filtermatcher/attributematcher.go:116-129``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Authoritative input shape (BASELINE.json input_hint).
TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Dynamic payload column (LogRecord.Attributes analog).
ATTRS_FIELD = T.StructField("attrs", T.MapType(T.StringType(), T.StringType()), True)

TRANSCRIPTS_WITH_ATTRS_SCHEMA = T.StructType(list(TRANSCRIPTS_SCHEMA.fields) + [ATTRS_FIELD])

# Resource-level dimension (Resource attributes analog; FIXTURES.md §2).
CONV_META_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("tenant", T.StringType(), True),
        T.StructField("channel", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), True),
    ]
)

# obsreport counter taxonomy (internal/obsreportconfig/obsmetrics/*.go).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("component", T.StringType(), False),
        T.StructField("sink", T.StringType(), True),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.LongType(), False),
    ]
)

# Per-partition checkpoint manifest (FIXTURES.md §5).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("input_snapshot", T.StringType(), True),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows", T.LongType(), False),
    ]
)
