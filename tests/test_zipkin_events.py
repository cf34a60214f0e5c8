"""Span events <-> Zipkin annotations (the spanEventDataFormat wire).

Reference: ``translator/trace/zipkinv2/from_translator.go:37,193-218``
(compose ``name|{json}|dropped``, bare name fast path, json.Marshal sorted
keys) and ``to_translator.go:266-301`` (split on ``|``, rejoin the middle
when the json itself carried pipes, dropped count from the last part).
"""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from opentelemetry_collector_spark.sources.zipkin import (
    parse_zipkin_json,
    spans_from_transcripts,
    to_zipkin_json,
    with_transcript_events,
)

TS = dt.datetime(2024, 1, 2, 3, 4, 5)

SPAN_SCHEMA = (
    "trace_id string, span_id string, parent_span_id string, name string, kind int,"
    " status_code int, status_message string, service_name string, ts timestamp,"
    " duration_us long, attrs map<string,string>,"
    " events array<struct<ts timestamp, name string, attrs map<string,string>, dropped long>>"
)


def _roundtrip(spark, events):
    df = spark.createDataFrame(
        [("aa" * 16, "bb" * 8, None, "n", 2, 0, "", "svc", TS, 10, {}, events)],
        SPAN_SCHEMA,
    )
    wire = to_zipkin_json(df, with_events=True)
    back = parse_zipkin_json(wire, with_events=True)
    return wire.collect()[0]["value"], back.collect()[0]["events"]


def test_bare_name_fast_path(spark):
    # no attrs + dropped 0 -> annotation value IS the name (:199-203)
    wire, back = _roundtrip(spark, [(TS, "turn.start", {}, 0)])
    anno = json.loads(wire)["annotations"][0]
    assert anno == {"timestamp": 1704164645000000, "value": "turn.start"}
    assert back == [(TS, "turn.start", {}, 0)]


def test_json_with_pipes_rejoins_on_parse(spark):
    wire, back = _roundtrip(spark, [(TS, "ev", {"tool": "calc", "arg": "a|b"}, 2)])
    value = json.loads(wire)["annotations"][0]["value"]
    # json.Marshal sorts keys: arg before tool
    assert value == 'ev|{"arg":"a|b","tool":"calc"}|2'
    assert back[0]["attrs"] == {"tool": "calc", "arg": "a|b"}
    assert back[0]["dropped"] == 2


def test_empty_attrs_nonzero_dropped_still_formats(spark):
    wire, back = _roundtrip(spark, [(TS, "ev", {}, 3)])
    assert json.loads(wire)["annotations"][0]["value"] == "ev|{}|3"
    assert back == [(TS, "ev", {}, 3)]


def test_two_part_value_keeps_first_as_name(spark):
    # partCnt < 3: name is parts[0], no attrs, no dropped (to_translator.go:272-277)
    df = spark.createDataFrame(
        [('{"id":"bb","traceId":"aa","annotations":[{"timestamp":1,"value":"a|b"}]}',)],
        "value string",
    )
    ev = parse_zipkin_json(df, with_events=True).collect()[0]["events"][0]
    assert (ev["name"], ev["attrs"], ev["dropped"]) == ("a", {}, 0)


def test_junk_dropped_count_degrades_to_null(spark):
    # Go strconv error fails the batch; per-row analog: NULL dropped
    df = spark.createDataFrame(
        [('{"id":"bb","traceId":"aa","annotations":[{"timestamp":1,"value":"e|{}|zz"}]}',)],
        "value string",
    )
    ev = parse_zipkin_json(df, with_events=True).collect()[0]["events"][0]
    assert ev["name"] == "e" and ev["dropped"] is None


def test_empty_events_omit_annotations_member(spark):
    wire, back = _roundtrip(spark, [])
    assert "annotations" not in json.loads(wire)
    assert back == []


def test_wire_unchanged_without_flag(spark, tiny):
    spans = spans_from_transcripts(tiny)
    plain = to_zipkin_json(spans).collect()
    assert all("annotations" not in r["value"] for r in plain)
    # and the flagless parse output schema is unchanged (no events column)
    assert "events" not in parse_zipkin_json(to_zipkin_json(spans)).columns


def test_transcript_events_roundtrip_set_equality(spark, tiny):
    spans = with_transcript_events(spans_from_transcripts(tiny))
    back = parse_zipkin_json(to_zipkin_json(spans, with_events=True), with_events=True)
    src = spans.select("span_id", F.explode("events").alias("e")).select(
        "span_id", "e.name", "e.ts", "e.attrs", "e.dropped"
    )
    got = back.select("span_id", F.explode("events").alias("e")).select(
        "span_id", "e.name", "e.ts", "e.attrs", "e.dropped"
    )
    def key(rows):
        return sorted(
            (r["span_id"], r["name"], r["ts"], tuple(sorted(r["attrs"].items())), r["dropped"])
            for r in rows
        )
    assert key(got.collect()) == key(src.collect())


# ---------------------------------------------------------------------------
# span links (otlp.link.N tags, spanLinkDataFormat %s|%s|%s|%s|%d)
# ---------------------------------------------------------------------------

LINKS_SPAN_SCHEMA = SPAN_SCHEMA.replace(
    " events array<struct<ts timestamp, name string, attrs map<string,string>, dropped long>>",
    " links array<struct<trace_id string, span_id string, trace_state string,"
    " attrs map<string,string>, dropped long>>",
)


def _link_roundtrip(spark, links):
    df = spark.createDataFrame(
        [("aa" * 16, "bb" * 8, None, "n", 2, 0, "", "svc", TS, 10, {"k": "v"}, links)],
        LINKS_SPAN_SCHEMA,
    )
    wire = to_zipkin_json(df, with_links=True)
    back = parse_zipkin_json(wire, with_links=True)
    return wire.collect()[0]["value"], back.collect()[0]


def test_link_tags_roundtrip_and_attrs_stay_clean(spark):
    wire, back = _link_roundtrip(
        spark,
        [
            ("ff" * 16, "ee" * 8, "st", {"rel": "a|b"}, 1),
            ("dd" * 16, "cc" * 8, "", {}, 0),
        ],
    )
    tags = json.loads(wire)["tags"]
    assert tags["otlp.link.0"] == "f" * 32 + "|" + "e" * 16 + '|st|{"rel":"a|b"}|1'
    assert tags["otlp.link.1"] == "d" * 32 + "|" + "c" * 16 + "||{}|0"
    assert back["attrs"] == {"k": "v"}  # link tags fully consumed
    assert [tuple(l) for l in back["links"]] == [
        ("f" * 32, "e" * 16, "st", {"rel": "a|b"}, 1),
        ("d" * 32, "c" * 16, "", {}, 0),
    ]


def _parse_raw(spark, tags_json):
    df = spark.createDataFrame(
        [('{"id":"bb","traceId":"aa","tags":' + tags_json + "}",)], "value string"
    )
    return parse_zipkin_json(df, with_links=True).collect()[0]


def test_link_gap_stops_consumption(spark):
    # zTagsToSpanLinks returns at the first missing index (:209-213):
    # otlp.link.2 stays behind as an ordinary attribute
    r = _parse_raw(
        spark, '{"otlp.link.0":"t|s|x|{}|0","otlp.link.2":"t2|s2|y|{}|0","k":"v"}'
    )
    assert [l["trace_id"] for l in r["links"]] == ["t"]
    assert r["attrs"] == {"otlp.link.2": "t2|s2|y|{}|0", "k": "v"}


def test_link_under_five_parts_consumed_but_skipped(spark):
    r = _parse_raw(spark, '{"otlp.link.0":"short|val"}')
    assert r["links"] == [] and r["attrs"] == {}


def test_link_junk_dropped_degrades_to_null(spark):
    r = _parse_raw(spark, '{"otlp.link.0":"t|s||{\\"q\\":\\"p|q\\"}|zz"}')
    assert r["links"][0]["attrs"] == {"q": "p|q"}
    assert r["links"][0]["dropped"] is None


def test_transcript_links_roundtrip(spark, tiny):
    from opentelemetry_collector_spark.sources.zipkin import with_transcript_links

    spans = with_transcript_links(spans_from_transcripts(tiny))
    back = parse_zipkin_json(to_zipkin_json(spans, with_links=True), with_links=True)
    src = spans.select("span_id", F.explode("links").alias("l")).collect()
    got = back.select("span_id", F.explode("links").alias("l")).collect()
    def key(rows):
        return sorted((r["span_id"], tuple(r["l"])[:3], tuple(sorted(r["l"]["attrs"].items())), r["l"]["dropped"]) for r in rows)
    assert key(got) == key(src)
    # non-root spans only
    n_nonroot = spans.filter(F.col("parent_span_id").isNotNull()).count()
    assert len(got) == n_nonroot
