"""The reference's OWN testdata configs load and run on this engine.

Fixtures used (public reference repo, read-only):
- ``processor/attributesprocessor/testdata/config.yaml`` — every processor
  block compiles to Action/MatchProperties objects; the expected-span
  behavior asserted below is transcribed from that file's OWN comments
  (Span1..Span4 examples for ``attributes/excludemulti`` and
  ``attributes/selectiveprocessing``).
- ``processor/filterprocessor/testdata/config_strict.yaml`` /
  ``config_regexp.yaml`` — filter blocks incl. the per-signal nesting and
  the regexp cache knobs (accepted, ignored).

The one block the reference itself rejects at build time
(``attributes/regex_insert`` — its extract pattern has an unnamed group,
``attraction.go:193-199``) must fail here too, for the same reason.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.config_compat import load_reference_processors

REF = "/root/reference"
ATTR_CFG = f"{REF}/processor/attributesprocessor/testdata/config.yaml"
FILT_STRICT = f"{REF}/processor/filterprocessor/testdata/config_strict.yaml"
FILT_REGEXP = f"{REF}/processor/filterprocessor/testdata/config_regexp.yaml"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference repo not mounted"
)


def _spans(spark, rows):
    """(service, attrs-dict) rows -> a spans-shaped frame with a resource map.

    Attr values are canonically stringified (bool -> "true"/"false", the
    strconv forms of coerce.canonical_str) — the frame shape our
    unmarshalers produce."""
    from opentelemetry_collector_spark.functions.coerce import canonical_str

    data = [
        (
            f"span{i}",
            svc,
            {k: canonical_str(v) for k, v in attrs.items()},
            resource or {},
        )
        for i, (svc, attrs, resource) in enumerate(rows, start=1)
    ]
    return spark.createDataFrame(
        data, "name string, service_name string, attrs map<string,string>, resource map<string,string>"
    )


def test_every_attributes_block_compiles_except_the_invalid_one():
    procs = load_reference_processors(ATTR_CFG)
    errors = {n: c["error"] for n, c in procs.items() if "error" in c}
    # the reference's NewAttrProc rejects exactly this block (unnamed group)
    assert set(errors) == {"attributes/regex_insert"}
    assert "named" in errors["attributes/regex_insert"]
    # and builds all the others
    assert {"attributes/insert", "attributes/update", "attributes/upsert",
            "attributes/delete", "attributes/hash", "attributes/excludemulti",
            "attributes/excluderesources", "attributes/excludelibrary",
            "attributes/includeservices", "attributes/selectiveprocessing"} <= set(procs)


def test_excludemulti_runs_the_files_own_span_examples(spark):
    """config.yaml's comments define Span1..4 and say 1+2 are excluded,
    3+4 processed (credit_card/duplicate_key deleted)."""
    from opentelemetry_collector_spark.operators.attributes import apply_actions

    p = load_reference_processors(ATTR_CFG)["attributes/excludemulti"]
    df = _spans(
        spark,
        [
            ("svcB", {"env": "dev", "test_request": 123, "credit_card": 1234}, None),
            ("svcA", {"env": "dev", "test_request": False}, None),
            ("svcB", {"env": 1, "test_request": "dev", "credit_card": 1234}, None),
            ("svcC", {"env": "dev", "test_request": False}, None),
        ],
    )
    out = apply_actions(df, p["actions"], include=p["include"], exclude=p["exclude"])
    got = {r["name"]: r["attrs"] for r in out.collect()}
    assert "credit_card" in got["span1"]  # excluded -> untouched
    assert "test_request" in got["span2"]
    assert "credit_card" not in got["span3"]  # processed -> deleted
    assert got["span4"] == {"env": "dev"} or "credit_card" not in got["span4"]


def test_selectiveprocessing_include_then_exclude(spark):
    """The file's Span2 (svcA, redact_trace=true) is processed; Span3
    (svcB, redact_trace=false) is excluded; Span4 (svcC) misses include.

    Known, documented deviation: the file's Span1 carries redact_trace as
    the STRING "false" and the reference's typed strict matcher therefore
    does NOT exclude it — our attrs map is map<string,string> (SURVEY
    §1.3: variant payloads canonically stringified, the same coercion the
    reference applies for regexp matching, attributematcher.go:116-129),
    so the bool/string distinction is flattened and Span1 would be
    excluded here. Configs relying on cross-type strict mismatch must
    encode the type in the value instead.
    """
    from opentelemetry_collector_spark.operators.attributes import apply_actions

    p = load_reference_processors(ATTR_CFG)["attributes/selectiveprocessing"]
    df = _spans(
        spark,
        [
            ("svcA", {"env": "staging", "test_request": False, "credit_card": 7,
                      "redact_trace": True}, None),
            ("svcB", {"env": "production", "test_request": True, "credit_card": 1234,
                      "redact_trace": False}, None),
            ("svcC", {"env": "dev", "test_request": False, "credit_card": 9}, None),
        ],
    )
    out = apply_actions(df, p["actions"], include=p["include"], exclude=p["exclude"])
    got = {r["service_name"]: r["attrs"] for r in out.collect()}
    assert "credit_card" not in got["svcA"]  # Span2: include hit, exclude miss
    assert "credit_card" in got["svcB"]  # Span3: exclude hit -> untouched
    assert "credit_card" in got["svcC"]  # Span4: include miss -> untouched


def test_excluderesources_matches_resource_map(spark):
    from opentelemetry_collector_spark.operators.attributes import apply_actions

    p = load_reference_processors(ATTR_CFG)["attributes/excluderesources"]
    df = _spans(
        spark,
        [
            ("svcA", {"credit_card": 1}, {"host.type": "n1-standard-1"}),
            ("svcA", {"credit_card": 1}, {"host.type": "e2-small"}),
        ],
    )
    out = apply_actions(df, p["actions"], include=p["include"], exclude=p["exclude"])
    got = [r["attrs"] for r in out.orderBy("name").collect()]
    assert "credit_card" in got[0]  # resource matched exclude -> untouched
    assert "credit_card" not in got[1]


def test_excludelibrary_matches_flattened_library_attrs(spark):
    from opentelemetry_collector_spark.config_compat import (
        LIBRARY_NAME_KEY,
        LIBRARY_VERSION_KEY,
    )
    from opentelemetry_collector_spark.operators.attributes import apply_actions

    p = load_reference_processors(ATTR_CFG)["attributes/excludelibrary"]
    assert p["exclude"].attributes[LIBRARY_NAME_KEY] == "mongo-java-driver"
    assert p["exclude"].attributes[LIBRARY_VERSION_KEY] == "3.8.0"
    df = _spans(
        spark,
        [
            ("s", {"credit_card": 1, LIBRARY_NAME_KEY: "mongo-java-driver",
                   LIBRARY_VERSION_KEY: "3.8.0"}, None),
            ("s", {"credit_card": 1, LIBRARY_NAME_KEY: "mongo-java-driver",
                   LIBRARY_VERSION_KEY: "3.9.0"}, None),
        ],
    )
    out = apply_actions(df, p["actions"], include=p["include"], exclude=p["exclude"])
    got = [r["attrs"] for r in out.orderBy("name").collect()]
    assert "credit_card" in got[0]  # exact library match -> excluded
    assert "credit_card" not in got[1]


def test_filter_strict_includeexclude_passes_only_hello_world_slash(spark):
    """config_strict.yaml's own comment: 'would only allow metrics named
    hello/world to pass through'."""
    from opentelemetry_collector_spark.operators.filters import filter_records

    p = load_reference_processors(FILT_STRICT)["filter/includeexclude"]
    df = spark.createDataFrame(
        [("hello_world",), ("hello/world",), ("other",)], "metric string"
    ).withColumn("attrs", F.create_map().cast("map<string,string>"))
    out = filter_records(df, include=p["include"], exclude=p["exclude"])
    assert [r["metric"] for r in out.collect()] == ["hello/world"]


def test_filter_regexp_blocks_compile_and_find_anywhere(spark):
    """config_regexp.yaml: cache knobs accepted-and-ignored; unanchored
    matching per the golden table (filter_processor_test.go:111-127)."""
    from opentelemetry_collector_spark.operators.filters import filter_records

    procs = load_reference_processors(FILT_REGEXP)
    assert not any("error" in c for c in procs.values()), procs
    p = procs["filter/unlimitedcache"]
    df = spark.createDataFrame(
        [("prefix/test/match",), ("prefixprefix/test/match",), ("no-match",)],
        "metric string",
    ).withColumn("attrs", F.create_map().cast("map<string,string>"))
    out = filter_records(df, include=p["include"], exclude=p["exclude"])
    assert sorted(r["metric"] for r in out.collect()) == [
        "prefix/test/match",
        "prefixprefix/test/match",  # find-anywhere, NOT anchored
    ]


# ---------------------------------------------------------------------------
# config_expr.yaml — the expr match type (filtermetric/expr_matcher.go)
# ---------------------------------------------------------------------------

FILT_EXPR = f"{REF}/processor/filterprocessor/testdata/config_expr.yaml"
FILT_INVALID = f"{REF}/processor/filterprocessor/testdata/config_invalid.yaml"


def _metrics(spark, rows):
    return spark.createDataFrame(rows, "metric string, attrs map<string,string>")


def test_expr_empty_include_matches_nothing(spark):
    """filter/empty: an expr matcher with no expressions has no matchers,
    so MatchMetric is always false (expr_matcher.go:38-48) — the include
    mismatch drops the whole stream."""
    from opentelemetry_collector_spark.operators.filters import filter_records

    p = load_reference_processors(FILT_EXPR)["filter/empty"]
    assert p["include"].match_type == "expr" and p["include"].expressions == []
    df = _metrics(spark, [("m1", {"foo": "bar"}), ("m2", {})])
    assert filter_records(df, include=p["include"]).count() == 0


def test_expr_include_ors_expressions(spark):
    """filter/include: Label("foo") == "bar" OR HasLabel("baz") — the
    exprMatcher loops until first match."""
    from opentelemetry_collector_spark.operators.filters import filter_records

    p = load_reference_processors(FILT_EXPR)["filter/include"]
    df = _metrics(
        spark,
        [
            ("a", {"foo": "bar"}),          # first expression
            ("b", {"baz": "anything"}),     # second expression
            ("c", {"foo": "nope"}),         # neither
            ("d", {}),                      # empty labels
        ],
    )
    out = sorted(r["metric"] for r in filter_records(df, include=p["include"]).collect())
    assert out == ["a", "b"]


def test_expr_exclude_and_includeexclude(spark):
    from opentelemetry_collector_spark.operators.filters import filter_records

    procs = load_reference_processors(FILT_EXPR)
    df = _metrics(
        spark,
        [
            ("a", {"foo": "bar"}),
            ("b", {"baz": "x"}),
            ("c", {"other": "1"}),
            ("d", {"foo": "1", "bar": "1"}),
        ],
    )
    out = sorted(
        r["metric"]
        for r in filter_records(df, exclude=procs["filter/exclude"]["exclude"]).collect()
    )
    assert out == ["c", "d"]  # a matches expr 1, b matches expr 2
    p = procs["filter/includeexclude"]
    out = sorted(
        r["metric"]
        for r in filter_records(df, include=p["include"], exclude=p["exclude"]).collect()
    )
    assert out == ["a"]  # HasLabel(foo) minus HasLabel(bar)


def test_invalid_regexp_config_rejected_at_load(spark):
    """config_invalid.yaml's broken pattern ((\\W|^)stock\\stips(\\W|$ —
    unclosed group) must fail at LOAD time like the Go re2 compile."""
    procs = load_reference_processors(FILT_INVALID)
    assert "error" in procs["filter/include"]
    assert "invalid regexp" in procs["filter/include"]["error"]


# ---------------------------------------------------------------------------
# the remaining processor testdata configs: resource, span, sampler, batch,
# memory_limiter — every processor fixture in the reference now loads
# ---------------------------------------------------------------------------

RES_CFG = f"{REF}/processor/resourceprocessor/testdata/config.yaml"
SPAN_CFG = f"{REF}/processor/spanprocessor/testdata/config.yaml"
SAMP_CFG = f"{REF}/processor/probabilisticsamplerprocessor/testdata/config.yaml"
BATCH_CFG = f"{REF}/processor/batchprocessor/testdata/config.yaml"
MEM_CFG = f"{REF}/processor/memorylimiter/testdata/config.yaml"


def test_resource_config_runs_documented_actions(spark):
    """config.yaml's own comment: upsert zone-1, copy k8s-cluster ->
    k8s.cluster.name only if found, delete redundant-attribute; the empty
    resource/invalid block must fail with the factory's reason."""
    from opentelemetry_collector_spark.operators.attributes import apply_actions

    procs = load_reference_processors(RES_CFG)
    assert "missing required field" in procs["resource/invalid"]["error"]
    p = procs["resource"]
    assert p["kind"] == "resource"
    df = spark.createDataFrame(
        [
            ("a", {"k8s-cluster": "c1", "redundant-attribute": "x"}),
            ("b", {"cloud.availability_zone": "old"}),
        ],
        "name string, resource map<string,string>",
    )
    out = {
        r["name"]: r["resource"]
        for r in apply_actions(df, p["actions"], attrs_col="resource").collect()
    }
    assert out["a"] == {"k8s-cluster": "c1", "cloud.availability_zone": "zone-1",
                        "k8s.cluster.name": "c1"}
    # upsert overwrites; insert without source key does nothing
    assert out["b"] == {"cloud.availability_zone": "zone-1"}


def test_span_config_custom_and_no_separator(spark):
    """config.yaml examples 1+2: all keys present -> location::get::1234;
    missing key -> name untouched; no-separator variant concatenates."""
    from opentelemetry_collector_spark.operators.span import from_attributes

    procs = load_reference_processors(SPAN_CFG)
    df = spark.createDataFrame(
        [
            ("serviceA", {"db.svc": "location", "operation": "get", "id": "1234"}),
            ("serviceB", {"db.svc": "location", "id": "1234"}),
        ],
        "name string, attrs map<string,string>",
    )
    p = procs["span/custom"]
    out = sorted(r["name"] for r in from_attributes(
        df, p["from_attributes"], p["separator"]).collect())
    assert out == ["location::get::1234", "serviceB"]
    p2 = procs["span/no-separator"]
    out2 = sorted(r["name"] for r in from_attributes(
        df, p2["from_attributes"], p2["separator"]).collect())
    assert out2 == ["locationget1234", "serviceB"]


def test_span_config_to_attributes_documented_example(spark):
    """config.yaml: /api/v1/document/12345678/update ->
    /api/v1/document/{documentId}/update with documentId=12345678."""
    from opentelemetry_collector_spark.operators.span import to_attributes

    p = load_reference_processors(SPAN_CFG)["span/to_attributes"]
    df = spark.createDataFrame(
        [("/api/v1/document/12345678/update", None)],
        "name string, attrs map<string,string>",
    )
    r = to_attributes(df, p["to_attributes_rules"]).collect()[0]
    assert r["name"] == "/api/v1/document/{documentId}/update"
    assert r["attrs"]["documentId"] == "12345678"


def test_span_config_includeexclude_gating(spark):
    """span/includeexclude: banks-service spans with a '/' in the name,
    except the literal donot/change."""
    from opentelemetry_collector_spark.operators.filters import match_predicate

    p = load_reference_processors(SPAN_CFG)["span/includeexclude"]
    df = spark.createDataFrame(
        [
            ("bankss", "api/v1", None),
            ("bankss", "donot/change", None),
            ("other", "api/v1", None),
            ("bankss", "noslash", None),
        ],
        "service_name string, name string, attrs map<string,string>",
    )
    got = sorted(
        (r["service_name"], r["name"])
        for r in df.filter(match_predicate(p["include"], p["exclude"])).collect()
    )
    # regexp "banks" is find-anywhere (matches bankss); strict exclude wins
    assert got == [("bankss", "api/v1")]


def test_sampler_config_percentage_and_seed(spark):
    from opentelemetry_collector_spark.operators.sample import probabilistic_sample

    p = load_reference_processors(SAMP_CFG)["probabilistic_sampler"]
    assert (p["sampling_percentage"], p["hash_seed"]) == (15.3, 22)
    df = spark.createDataFrame([(str(i),) for i in range(2000)], "conv_id string")
    kept = probabilistic_sample(df, p["sampling_percentage"], p["hash_seed"]).count()
    assert 0 < kept < 2000  # ~15% with hash determinism
    kept2 = probabilistic_sample(df, p["sampling_percentage"], p["hash_seed"]).count()
    assert kept == kept2


def test_batch_config_defaults_and_overrides(spark):
    from opentelemetry_collector_spark.operators.batch import writer_options

    procs = load_reference_processors(BATCH_CFG)
    assert procs["batch"]["send_batch_size"] == 8192  # Go default
    assert procs["batch"]["send_batch_max_size"] is None
    p = procs["batch/2"]
    assert (p["send_batch_size"], p["send_batch_max_size"]) == (10000, 11000)
    assert writer_options(p["send_batch_max_size"]) == {"maxRecordsPerFile": "11000"}


def test_memory_limiter_config_parity():
    procs = load_reference_processors(MEM_CFG)
    # the empty block fails in the reference's order: checkInterval first
    assert procs["memory_limiter"]["error"] == "checkInterval must be greater than zero"
    p = procs["memory_limiter/with-settings"]
    cfg = p["config"]
    assert cfg.limit_mib == 4000 and cfg.spike_limit_mib == 500
    assert cfg.soft_limit_bytes == (4000 - 500) * 1024 * 1024


# ---------------------------------------------------------------------------
# service.pipelines bridge: the FULL reference configs run end-to-end
# ---------------------------------------------------------------------------


def test_service_expr_pipeline_end_to_end(spark):
    """config_expr.yaml's own service pipeline wires filter/empty — an
    include with no expressions — so the whole stream drops."""
    from opentelemetry_collector_spark.config_compat import (
        load_reference_service,
        run_reference_pipeline,
    )

    svc = load_reference_service(FILT_EXPR)
    assert svc["pipelines"] == {"metrics": ["filter/empty"]}
    df = _metrics(spark, [("m1", {"foo": "bar"}), ("m2", {})])
    assert run_reference_pipeline(df, svc, "metrics").count() == 0


def test_service_span_pipeline_renames(spark):
    from opentelemetry_collector_spark.config_compat import (
        load_reference_service,
        run_reference_pipeline,
    )

    svc = load_reference_service(SPAN_CFG)
    assert svc["pipelines"]["traces"] == ["span/custom"]
    df = spark.createDataFrame(
        [("serviceA", {"db.svc": "location", "operation": "get", "id": "1234"})],
        "name string, attrs map<string,string>",
    )
    out = run_reference_pipeline(df, svc, "traces").collect()
    assert out[0]["name"] == "location::get::1234"


def test_service_attributes_pipeline_inserts(spark):
    from opentelemetry_collector_spark.config_compat import (
        load_reference_service,
        run_reference_pipeline,
    )

    svc = load_reference_service(ATTR_CFG)
    assert svc["pipelines"]["traces"] == ["attributes/insert"]
    df = spark.createDataFrame([("s", None)], "name string, attrs map<string,string>")
    out = run_reference_pipeline(df, svc, "traces").collect()
    assert out[0]["attrs"]["attribute1"] == "123"  # the fixture's insert action


def test_service_batch_and_memory_limiter_pipelines(spark):
    from opentelemetry_collector_spark.config_compat import (
        load_reference_service,
        run_reference_pipeline,
    )

    svc = load_reference_service(BATCH_CFG)
    df = spark.createDataFrame(
        [("c1", "hello", None)], "conv_id string, text string, tool string"
    )
    # batch is transport-only: row set unchanged
    assert run_reference_pipeline(df, svc, "traces").count() == 1
    svc2 = load_reference_service(MEM_CFG)
    # 4000 MiB limit admits this one-row batch
    assert run_reference_pipeline(df, svc2, "traces").count() == 1


def test_service_invalid_config_fails_at_load():
    """config_invalid.yaml's pipelines reference the filter whose regexp
    failed to compile — service load must fail like LoadConfigAndValidate."""
    import pytest as _pytest

    from opentelemetry_collector_spark.config_compat import load_reference_service

    with _pytest.raises(ValueError, match="failed to build"):
        load_reference_service(FILT_INVALID)


# ---------------------------------------------------------------------------
# load-time validation hardening (review findings)
# ---------------------------------------------------------------------------


def test_expr_grammar_errors_fail_at_load(tmp_path):
    """A syntactically broken expression must fail at LOAD (the Go
    filterexpr.NewMatcher compile point), not mid-pipeline."""
    cfg = tmp_path / "c.yaml"
    cfg.write_text(
        "processors:\n"
        "  filter/bad:\n"
        "    metrics:\n"
        "      include:\n"
        "        match_type: expr\n"
        "        expressions: ['MetricName ==']\n"
        "  filter/unbalanced:\n"
        "    metrics:\n"
        "      include:\n"
        "        match_type: expr\n"
        "        expressions: ['(MetricName == \"a\"']\n"
    )
    procs = load_reference_processors(str(cfg))
    assert "error" in procs["filter/bad"]
    assert "error" in procs["filter/unbalanced"]


def test_duration_parsing_rejects_junk_and_keeps_sign():
    import pytest as _pytest

    from opentelemetry_collector_spark.config_compat import _duration_seconds

    assert _duration_seconds("5s") == 5.0
    assert _duration_seconds("1m30s") == 90.0
    assert _duration_seconds("-1s") == -1.0  # Go ParseDuration shape
    assert _duration_seconds(None) == 0.0
    for junk in ("bogus1s", "1h??3s", "1x", ""):
        with _pytest.raises(ValueError):
            _duration_seconds(junk)


def test_negative_check_interval_rejected_like_go(tmp_path):
    cfg = tmp_path / "m.yaml"
    cfg.write_text(
        "processors:\n"
        "  memory_limiter/neg:\n"
        "    check_interval: -1s\n"
        "    limit_mib: 100\n"
    )
    procs = load_reference_processors(str(cfg))
    assert procs["memory_limiter/neg"]["error"] == "checkInterval must be greater than zero"


def test_dialect_divergent_regexp_classes_pass_load(tmp_path):
    r"""\p{L} is invalid in Python re but valid in RE2 and Java rlike —
    the engines that actually run it — so load must NOT reject it."""
    cfg = tmp_path / "r.yaml"
    cfg.write_text(
        "processors:\n"
        "  filter/unicode:\n"
        "    metrics:\n"
        "      include:\n"
        "        match_type: regexp\n"
        "        metric_names: ['\\p{L}+']\n"
    )
    procs = load_reference_processors(str(cfg))
    assert "error" not in procs["filter/unicode"]


def test_pipeline_signal_support_validated(tmp_path):
    """This reference version's factories are signal-typed: filter is
    metrics-only (its factory registers only WithMetrics), span and the
    sampler traces-only. A pipeline wiring a processor into an unsupported
    signal must fail with the builder's wording
    (pipelines_builder.go:186-188)."""
    import pytest as _pytest

    from opentelemetry_collector_spark.config_compat import load_reference_service

    cfg = tmp_path / "sig.yaml"
    cfg.write_text(
        "receivers:\n  nop:\nexporters:\n  nop:\n"
        "processors:\n"
        "  filter/f:\n"
        "    metrics:\n"
        "      include: {match_type: strict, metric_names: [a]}\n"
        "service:\n"
        "  pipelines:\n"
        "    traces:\n"
        "      receivers: [nop]\n"
        "      processors: [filter/f]\n"
        "      exporters: [nop]\n"
    )
    with _pytest.raises(ValueError, match="data type traces is not supported"):
        load_reference_service(str(cfg))
    # the same processor in a METRICS pipeline is fine
    cfg2 = tmp_path / "sig2.yaml"
    cfg2.write_text(cfg.read_text().replace("    traces:", "    metrics:"))
    svc = load_reference_service(str(cfg2))
    assert svc["pipelines"] == {"metrics": ["filter/f"]}
