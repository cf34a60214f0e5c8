"""Config-surface tests: YAML -> compiled pipelines -> run.

Mirrors the reference's configloader tests (config/configloader/config_test.go
patterns): valid config round-trips into a runnable service; invalid configs
fail validation with the same classes of errors as config.go:31-150
(missing receivers/exporters, dangling references, unknown component types).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.config import (
    ConfigError,
    compile_config,
    component_type,
    load_config,
    run_config,
)

YAML_TEMPLATE = """
receivers:
  synthetic:
    n_convs: 60
    mean_turns: 6
    seed: 42

processors:
  attributes/stage:
    actions:
      - {{key: stage, action: upsert, value: e2e}}
      - {{key: text_hash, action: insert, from_attribute: stage}}
  filter/keep-dialog:
    include:
      match_type: strict
      columns:
        role: [user, assistant]
  probabilistic_sampler/half:
    sampling_percentage: 100
  batch:
    send_batch_max_size: 1000

exporters:
  parquet/sink_user:
    path: "{base}/sink_user"
    predicate:
      columns:
        role: [user]
  parquet/sink_assistant:
    path: "{base}/sink_assistant"
    predicate:
      columns:
        role: [assistant]

service:
  pipelines:
    logs:
      receivers: [synthetic]
      processors: [attributes/stage, filter/keep-dialog, probabilistic_sampler/half, batch]
      exporters: [parquet/sink_user, parquet/sink_assistant]
"""


def test_component_type_parsing():
    assert component_type("attributes/stage") == "attributes"
    assert component_type("batch") == "batch"


def test_load_config_yaml_string():
    cfg = load_config("receivers:\n  synthetic: {n_convs: 3}\n")
    assert cfg["receivers"]["synthetic"]["n_convs"] == 3


def test_compile_and_run_yaml(spark, tmp_path):
    base = str(tmp_path / "cfg_run")
    results = run_config(spark, YAML_TEMPLATE.format(base=base), base)
    res = results["logs"]
    user_rows = spark.read.parquet(f"{base}/sink_user").collect()
    asst_rows = spark.read.parquet(f"{base}/sink_assistant").collect()
    assert res.sink_rows["parquet_sink_user"] == len(user_rows) > 0
    assert res.sink_rows["parquet_sink_assistant"] == len(asst_rows) > 0
    # filter processor dropped everything but user/assistant, and each sink
    # predicate selects exactly its role (routed-row set equality gate)
    assert {r.role for r in user_rows} == {"user"}
    assert {r.role for r in asst_rows} == {"assistant"}
    # attributes processor ran before the fan-out: stage present everywhere,
    # insert-from-attribute saw the just-upserted key (ordered actions)
    assert all(r.attrs["stage"] == "e2e" for r in user_rows)
    assert all(r.attrs["text_hash"] == "e2e" for r in user_rows)
    # obsreport metrics emitted per sink
    sent = {
        (r.sink): r.value
        for r in res.metrics.filter(F.col("metric") == "sent_log_records").collect()
    }
    assert sent["parquet_sink_user"] == len(user_rows)


def test_receiver_fan_in_union(spark, tmp_path):
    base = str(tmp_path / "fanin")
    cfg = {
        "receivers": {
            "synthetic/a": {"n_convs": 10, "mean_turns": 4, "seed": 1},
            "synthetic/b": {"n_convs": 10, "mean_turns": 4, "seed": 2},
        },
        "exporters": {"parquet/all": {"path": f"{base}/all"}},
        "service": {
            "pipelines": {
                "logs": {"receivers": ["synthetic/a", "synthetic/b"], "exporters": ["parquet/all"]}
            }
        },
    }
    svc = compile_config(spark, cfg)
    df = svc.pipelines["logs"].source(spark)
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    expected = synthesize(spark, 10, 4, 1).count() + synthesize(spark, 10, 4, 2).count()
    assert df.count() == expected


@pytest.mark.parametrize(
    "mutate, err_frag",
    [
        (lambda c: c["service"]["pipelines"]["logs"].update(receivers=[]), "receiver"),
        (lambda c: c["service"]["pipelines"]["logs"].update(exporters=[]), "exporter"),
        (lambda c: c["service"]["pipelines"]["logs"].update(processors=["nope"]), "unknown processor"),
        (lambda c: c["receivers"].update({"bogus/x": {}}) or c["service"]["pipelines"]["logs"].update(receivers=["bogus/x"]), "unknown type"),
        (lambda c: c.pop("service"), "pipelines"),
    ],
)
def test_validation_errors(spark, mutate, err_frag):
    cfg = {
        "receivers": {"synthetic": {"n_convs": 5}},
        "processors": {"batch": {}},
        "exporters": {"parquet/out": {"path": "/tmp/x"}},
        "service": {
            "pipelines": {
                "logs": {"receivers": ["synthetic"], "processors": ["batch"], "exporters": ["parquet/out"]}
            }
        },
    }
    mutate(cfg)
    with pytest.raises(ConfigError, match=err_frag):
        compile_config(spark, cfg)


def test_processor_config_validation(spark):
    base_cfg = {
        "receivers": {"synthetic": {"n_convs": 5}},
        "exporters": {"parquet/out": {"path": "/tmp/x"}},
        "service": {
            "pipelines": {
                "logs": {"receivers": ["synthetic"], "processors": ["filter/f"], "exporters": ["parquet/out"]}
            }
        },
    }
    # filter with neither include nor exclude is invalid (filterconfig config.go:70-136)
    base_cfg["processors"] = {"filter/f": {}}
    with pytest.raises(ConfigError, match="include or exclude"):
        compile_config(spark, base_cfg)
    # attributes without actions is invalid (attraction.go:139)
    base_cfg["service"]["pipelines"]["logs"]["processors"] = ["attributes/a"]
    base_cfg["processors"] = {"attributes/a": {}}
    with pytest.raises(ConfigError, match="actions required"):
        compile_config(spark, base_cfg)


def test_resource_enrich_processor(spark, tmp_path):
    dim_path = str(tmp_path / "dim")
    spark.createDataFrame(
        [("conv-000000", "t0"), ("conv-000001", "t1")], ["conv_id", "tenant"]
    ).write.parquet(dim_path)
    cfg = {
        "receivers": {"synthetic": {"n_convs": 4, "mean_turns": 3}},
        "processors": {"resource/enrich": {"lookup_path": dim_path, "join_key": "conv_id"}},
        "exporters": {"parquet/out": {"path": str(tmp_path / "out")}},
        "service": {
            "pipelines": {
                "logs": {
                    "receivers": ["synthetic"],
                    "processors": ["resource/enrich"],
                    "exporters": ["parquet/out"],
                }
            }
        },
    }
    svc = compile_config(spark, cfg)
    spec = svc.pipelines["logs"]
    df = spec.source(spark)
    for p in spec.processors:
        df = p(df)
    rows = df.collect()
    assert "tenant" in df.columns
    by_conv = {r.conv_id: r.tenant for r in rows}
    assert by_conv["conv-000000"] == "t0"
    assert by_conv["conv-000003"] is None  # left-join null path


def test_batch_max_records_propagates_to_sinks(spark, tmp_path):
    cfg = {
        "receivers": {"synthetic": {"n_convs": 5}},
        "processors": {"batch": {"send_batch_max_size": 7}},
        "exporters": {"parquet/out": {"path": str(tmp_path / "out")}},
        "service": {
            "pipelines": {
                "logs": {"receivers": ["synthetic"], "processors": ["batch"], "exporters": ["parquet/out"]}
            }
        },
    }
    svc = compile_config(spark, cfg)
    assert svc.pipelines["logs"].sinks[0].max_records_per_file == 7


def test_job_cli_main(spark, tmp_path):
    """spark-submit entry point (job.py): config in, sinks + summary out.

    Runs in a subprocess: job.main owns (and stops) its own SparkSession,
    which must not tear down the shared test session's JVM."""
    import json
    import os
    import subprocess
    import sys

    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        f"""
receivers:
  synthetic: {{n_convs: 12, mean_turns: 4, seed: 7}}
exporters:
  parquet/all:
    path: {tmp_path}/out_all
service:
  pipelines:
    logs:
      receivers: [synthetic]
      exporters: [parquet/all]
"""
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable,
            "-m",
            "opentelemetry_collector_spark.job",
            "--config",
            str(cfg),
            "--base-path",
            str(tmp_path / "run"),
            "--master",
            "local[2]",
            # the reference's --set flag: overrides layer over the file
            "--set",
            f"exporters.parquet/all.path={tmp_path}/out_override",
        ],
        cwd=repo,
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    expected = synthesize(spark, 12, 4, 7).count()
    assert summary["logs"]["sink_rows"]["parquet_all"] == expected
    assert spark.read.parquet(str(tmp_path / "out_override")).count() == expected
    import os.path

    assert not os.path.exists(str(tmp_path / "out_all"))  # file value was overridden


def test_spark_submit_py_files(spark, tmp_path):
    """Real `spark-submit --py-files` deployment (the north_rule's run mode):
    the package must import from the zip ALONE (no repo on sys.path, cwd is
    an empty dir), the master must come from the submit line — build_session
    must not clobber it with local[SPARK_GRAFT_CPUS] — and the job must
    commit its sinks and print the summary line."""
    import json
    import os
    import shutil
    import subprocess
    import zipfile

    spark_submit = shutil.which("spark-submit") or (
        os.path.join(os.environ["SPARK_HOME"], "bin", "spark-submit")
        if os.environ.get("SPARK_HOME")
        else None
    )
    if not spark_submit or not os.path.exists(spark_submit):
        import pytest

        pytest.skip("no spark-submit on PATH")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pkg = os.path.join(repo, "opentelemetry_collector_spark")
    zpath = str(tmp_path / "otelcol_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    shutil.copy(os.path.join(repo, "submit_job.py"), str(tmp_path / "submit_job.py"))

    cfg = tmp_path / "p.yaml"
    cfg.write_text(
        f"""
receivers:
  synthetic: {{n_convs: 12, mean_turns: 4, seed: 7}}
exporters:
  parquet/all:
    path: {tmp_path}/out_all
service:
  pipelines:
    logs:
      receivers: [synthetic]
      exporters: [parquet/all]
"""
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [
            spark_submit,
            "--master",
            "local[2]",
            "--conf",
            "spark.ui.enabled=false",
            "--py-files",
            zpath,
            str(tmp_path / "submit_job.py"),
            "--config",
            str(cfg),
            "--base-path",
            str(tmp_path / "run"),
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-3000:])
    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    from opentelemetry_collector_spark.sources.transcripts import synthesize

    expected = synthesize(spark, 12, 4, 7).count()
    assert summary["logs"]["sink_rows"]["parquet_all"] == expected
    assert spark.read.parquet(f"{tmp_path}/out_all").count() == expected


def test_multi_pipeline_service(spark, tmp_path):
    """service.pipelines with two pipelines sharing one receiver (the
    receiver fan-in to N pipelines shape, receivers_builder.go:161-233)."""
    cfg = {
        "receivers": {"synthetic": {"n_convs": 20, "mean_turns": 5, "seed": 3}},
        "processors": {
            "filter/users": {"include": {"columns": {"role": ["user"]}}},
            "filter/asst": {"include": {"columns": {"role": ["assistant"]}}},
        },
        "exporters": {
            "parquet/u": {"path": str(tmp_path / "u")},
            "parquet/a": {"path": str(tmp_path / "a")},
        },
        "service": {
            "pipelines": {
                "logs/users": {"receivers": ["synthetic"], "processors": ["filter/users"], "exporters": ["parquet/u"]},
                "logs/asst": {"receivers": ["synthetic"], "processors": ["filter/asst"], "exporters": ["parquet/a"]},
            }
        },
    }
    from opentelemetry_collector_spark.config import run_config

    results = run_config(spark, cfg, str(tmp_path / "runs"))
    assert set(results) == {"logs/users", "logs/asst"}
    u = spark.read.parquet(str(tmp_path / "u"))
    a = spark.read.parquet(str(tmp_path / "a"))
    assert {r.role for r in u.collect()} == {"user"}
    assert {r.role for r in a.collect()} == {"assistant"}


def test_public_api_surface(spark):
    import opentelemetry_collector_spark as pkg

    assert callable(pkg.build_session)
    assert callable(pkg.run_config) and callable(pkg.compile_config)
    assert pkg.PipelineSpec and pkg.SinkSpec and callable(pkg.run_pipeline)
    assert pkg.__version__


def test_iceberg_exporter_compiles_from_config(spark):
    """Config-declared iceberg exporter compiles to an iceberg SinkSpec
    addressed by catalog table (execution gated on the runtime jar)."""
    from opentelemetry_collector_spark.config import compile_config

    spec = {
        "receivers": {"synthetic/a": {"n_convs": 2}},
        "exporters": {"iceberg/out": {"table": "local.db.sink_a", "partition_by": ["days(ts)"]}},
        "service": {
            "pipelines": {
                "logs": {"receivers": ["synthetic/a"], "exporters": ["iceberg/out"]}
            }
        },
    }
    svc = compile_config(spark, spec)
    sink = svc.pipelines["logs"].sinks[0]
    assert sink.format == "iceberg" and sink.path == "local.db.sink_a"
    assert sink.partition_by == ["days(ts)"]


def test_resource_enrich_composite_key(spark, tmp_path):
    """Broadcast enrichment keyed on (conv_id, role) — the north-star
    composite-key form."""
    from opentelemetry_collector_spark.config import run_config

    src = str(tmp_path / "in")
    spark.createDataFrame(
        [("c1", 0, "user", "hi", None), ("c1", 1, "assistant", "yo", None)],
        "conv_id string, turn_idx int, role string, text string, tool string",
    ).write.parquet(src)
    dim = str(tmp_path / "dim")
    spark.createDataFrame(
        [("c1", "user", 3), ("c1", "assistant", 7)],
        "conv_id string, role string, weight int",
    ).write.parquet(dim)
    out = str(tmp_path / "out")
    spec = {
        "receivers": {"transcripts/in": {"path": src}},
        "processors": {
            "resource": {"lookup_path": dim, "join_key": ["conv_id", "role"]}
        },
        "exporters": {"parquet/out": {"path": out}},
        "service": {
            "pipelines": {
                "logs": {
                    "receivers": ["transcripts/in"],
                    "processors": ["resource"],
                    "exporters": ["parquet/out"],
                }
            }
        },
    }
    run_config(spark, spec, base_path=str(tmp_path / "base"))
    got = {(r.conv_id, r.role): r.weight for r in spark.read.parquet(out).collect()}
    assert got == {("c1", "user"): 3, ("c1", "assistant"): 7}


def test_env_expansion_matches_reference_escape_table():
    """The configloader's $/$$ table (config_test.go:305-320): $FOO
    substitutes, $$FOO escapes to a literal $FOO, $$$FOO is an escaped $
    followed by the substituted var, $$$$ is two escaped dollars."""
    from opentelemetry_collector_spark.config import expand_env

    env = {"FOO": "bar", "RECV": "v3"}
    assert expand_env("$FOO", env) == "bar"
    assert expand_env("${FOO}", env) == "bar"
    assert expand_env("$$FOO", env) == "$FOO"
    assert expand_env("$$$FOO", env) == "$bar"
    assert expand_env("$$$$", env) == "$$"
    assert expand_env("some$FOO/path", env) == "somebar/path"
    assert expand_env("$MISSING", env) == ""  # unset -> empty, like os.Getenv
    assert expand_env("$$RECV", env) == "$RECV"


def test_load_config_expands_nested_string_values(tmp_path):
    import os

    from opentelemetry_collector_spark.config import load_config

    os.environ["OTELCOL_SPARK_TEST_PATH"] = str(tmp_path / "sink")
    try:
        cfg = load_config(
            {
                "receivers": {"transcripts": {"sf_dir": "$OTELCOL_SPARK_TEST_PATH"}},
                "exporters": {
                    "parquet": {"path": "${OTELCOL_SPARK_TEST_PATH}/out", "opts": ["$$keep"]}
                },
                "service": {"pipelines": {}},
            }
        )
    finally:
        del os.environ["OTELCOL_SPARK_TEST_PATH"]
    assert cfg["receivers"]["transcripts"]["sf_dir"] == str(tmp_path / "sink")
    assert cfg["exporters"]["parquet"]["path"] == str(tmp_path / "sink") + "/out"
    assert cfg["exporters"]["parquet"]["opts"] == ["$keep"]  # $$ escape survives lists


def test_set_overrides_layer_over_config():
    """setflag semantics: dotted-path properties merged into the loaded map,
    YAML-scalar value coercion, later flags win, input not mutated."""
    import pytest

    from opentelemetry_collector_spark.config import ConfigError, apply_set_overrides

    base = {"processors": {"batch": {"send_batch_max_size": 10}}, "service": {}}
    out = apply_set_overrides(
        base,
        [
            "processors.batch.send_batch_max_size=250",
            "processors.probabilistic_sampler.sampling_percentage=12.5",
            "exporters.parquet.path=/tmp/x",
            "processors.batch.send_batch_max_size=300",  # last one wins
        ],
    )
    assert out["processors"]["batch"]["send_batch_max_size"] == 300
    assert out["processors"]["probabilistic_sampler"]["sampling_percentage"] == 12.5
    assert out["exporters"]["parquet"]["path"] == "/tmp/x"
    assert base["processors"]["batch"]["send_batch_max_size"] == 10  # untouched
    with pytest.raises(ConfigError):
        apply_set_overrides(base, ["no-equals-sign"])


def test_env_expansion_happens_exactly_once_through_the_cli_path(monkeypatch):
    """The CLI composition (raw load -> --set merge -> run-time load) must
    expand ONCE: a second pass would re-interpret $$ escapes ("$$FOO" ->
    "$FOO" -> value of FOO) and mangle values that legitimately contain $."""
    import pytest

    from opentelemetry_collector_spark.config import (
        ConfigError,
        apply_set_overrides,
        load_config,
    )

    monkeypatch.setenv("OTELCOL_SET_TEST", "expanded")
    raw = load_config("a:\n  keep: $$OTELCOL_SET_TEST\n", expand=False)
    assert raw["a"]["keep"] == "$$OTELCOL_SET_TEST"  # raw load leaves escapes
    merged = apply_set_overrides(raw, ["a.b=$OTELCOL_SET_TEST", "a.c=$$literal"])
    assert merged["a"]["b"] == "$OTELCOL_SET_TEST"  # --set values stay raw too
    final = load_config(merged)  # the single expansion pass (run_config's)
    assert final["a"]["b"] == "expanded"
    assert final["a"]["c"] == "$literal"
    assert final["a"]["keep"] == "$OTELCOL_SET_TEST"  # escape survives intact
    with pytest.raises(ConfigError):  # junk YAML -> the clean error contract
        apply_set_overrides({}, ["a.b=[unclosed"])


def _ext_spec(tmp_path, extensions=None, service_ext=None):
    spec = {
        "receivers": {"synthetic/in": {"n_convs": 3}},
        "exporters": {"parquet/out": {"path": str(tmp_path / "out")}},
        "service": {
            "pipelines": {
                "logs": {"receivers": ["synthetic/in"], "exporters": ["parquet/out"]}
            }
        },
    }
    if extensions is not None:
        spec["extensions"] = extensions
    if service_ext is not None:
        spec["service"]["extensions"] = service_ext
    return spec


def test_service_extension_reference_must_exist(spark, tmp_path):
    """config.go:100-103 validateServiceExtensions: a service.extensions
    entry with no top-level extensions block is the reference's exact
    error."""
    import pytest

    from opentelemetry_collector_spark.config import ConfigError, compile_config

    with pytest.raises(ConfigError, match='references extension "zpages" which does not exist'):
        compile_config(spark, _ext_spec(tmp_path, extensions={}, service_ext=["zpages"]))


def test_unknown_extension_type_rejected(spark, tmp_path):
    import pytest

    from opentelemetry_collector_spark.config import ConfigError, compile_config

    with pytest.raises(ConfigError, match="unknown extensions type 'flamegraph'"):
        compile_config(spark, _ext_spec(tmp_path, extensions={"flamegraph/x": {}}))


def test_enabled_extensions_compile_and_serve(spark, tmp_path):
    """health_check + zpages enabled: zpages renders the compiled graph;
    health flips Ready once the pipeline's sinks commit (the healthcheck
    extension's Ready/Unavailable contract)."""
    from opentelemetry_collector_spark.config import compile_config, run_config

    spec = _ext_spec(
        tmp_path,
        extensions={"health_check": {}, "zpages": {}, "pprof": {}},
        service_ext=["health_check", "zpages", "pprof"],
    )
    svc = compile_config(spark, spec)
    assert svc.extensions == {"health_check": "health_check", "zpages": "zpages", "pprof": "pprof"}
    assert "pipeline logs:" in svc.zpages()

    base = str(tmp_path / "run")
    before = svc.health(base, snapshot="snap-1")
    assert before["logs"].status == "unavailable"
    run_config(spark, spec, base)


def test_extension_helpers_require_enablement(spark, tmp_path):
    import pytest

    from opentelemetry_collector_spark.config import ConfigError, compile_config

    svc = compile_config(spark, _ext_spec(tmp_path))
    with pytest.raises(ConfigError, match="no zpages extension"):
        svc.zpages()
    with pytest.raises(ConfigError, match="no health_check extension"):
        svc.health(str(tmp_path), "s")


def test_pipeline_key_must_be_signal_typed(spark, tmp_path):
    """configloader/config.go:399-406: pipeline keys parse as type[/name]
    and the type must be one of traces/metrics/logs."""
    import pytest

    from opentelemetry_collector_spark.config import ConfigError, compile_config

    spec = _ext_spec(tmp_path)
    spec["service"]["pipelines"]["events/x"] = spec["service"]["pipelines"]["logs"]
    with pytest.raises(ConfigError, match="unknown pipelines type 'events'"):
        compile_config(spark, spec)
    ok = _ext_spec(tmp_path)
    ok["service"]["pipelines"]["traces/alt"] = ok["service"]["pipelines"].pop("logs")
    assert "traces/alt" in compile_config(spark, ok).pipelines


def test_traces_pipeline_end_to_end_over_span_receiver(spark, tmp_path):
    """A `traces/...` pipeline is real end-to-end: the spans receiver
    derives the transcripts-as-traces frame (conv == trace, turn == span),
    an attributes processor acts on the span attrs map, and the exporter
    fan-out routes on span columns — same machinery as logs pipelines,
    signal-typed like the reference's per-signal builders."""
    from opentelemetry_collector_spark.config import compile_config, run_config
    from opentelemetry_collector_spark.sources.transcripts import synthesize
    from opentelemetry_collector_spark.sources.zipkin import spans_from_transcripts

    t = synthesize(spark, n_convs=4, mean_turns=5, seed=13)
    landing = str(tmp_path / "landing")
    t.write.parquet(landing)

    spec = {
        "receivers": {"spans/in": {"path": landing}},
        "processors": {
            "attributes/tag": {
                "actions": [{"key": "env", "action": "insert", "value": "prod"}]
            }
        },
        "exporters": {
            "parquet/errors": {
                "path": str(tmp_path / "errors"),
                "predicate": {"columns": {"status_code": [2]}},
            },
            "parquet/all": {"path": str(tmp_path / "all")},
        },
        "service": {
            "pipelines": {
                "traces": {
                    "receivers": ["spans/in"],
                    "processors": ["attributes/tag"],
                    "exporters": ["parquet/errors", "parquet/all"],
                }
            }
        },
    }
    run_config(spark, spec, str(tmp_path / "run"))

    want = spans_from_transcripts(t)
    got_all = spark.read.parquet(str(tmp_path / "all"))
    assert got_all.count() == want.count()
    assert {r["env"] for r in got_all.select(F.col("attrs")["env"].alias("env")).collect()} == {
        "prod"
    }
    got_err = spark.read.parquet(str(tmp_path / "errors"))
    assert got_err.count() == want.filter(F.col("status_code") == 2).count()
    assert set(got_err.select("span_id").toPandas()["span_id"]) == set(
        want.filter(F.col("status_code") == 2).toPandas()["span_id"]
    )


def test_metrics_pipeline_end_to_end_over_metrics_receiver(spark, tmp_path):
    """A `metrics/...` pipeline is real end-to-end: the metrics receiver
    derives the per-turn datapoint frame, a filter processor keeps one
    metric family (the filtermetric name matcher), and the sink receives
    exactly the gauge rows — completing per-signal symmetry with logs and
    traces pipelines."""
    from opentelemetry_collector_spark.config import run_config
    from opentelemetry_collector_spark.sources.transcripts import (
        metrics_from_transcripts,
        synthesize,
    )

    t = synthesize(spark, n_convs=4, mean_turns=5, seed=13)
    landing = str(tmp_path / "landing")
    t.write.parquet(landing)

    spec = {
        "receivers": {"metrics/in": {"path": landing}},
        "processors": {
            "filter/gauges": {"include": {"columns": {"metric": ["turn_chars"]}}}
        },
        "exporters": {"parquet/out": {"path": str(tmp_path / "out")}},
        "service": {
            "pipelines": {
                "metrics": {
                    "receivers": ["metrics/in"],
                    "processors": ["filter/gauges"],
                    "exporters": ["parquet/out"],
                }
            }
        },
    }
    run_config(spark, spec, str(tmp_path / "run"))

    want = metrics_from_transcripts(t).filter(F.col("metric") == "turn_chars")
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == want.count() == t.count()
    assert set(got.select("metric").toPandas()["metric"]) == {"turn_chars"}
    a = {(r["labels"]["conv"], r["labels"]["role"], r["value"]) for r in want.collect()}
    b = {(r["labels"]["conv"], r["labels"]["role"], r["value"]) for r in got.collect()}
    assert a == b


def test_contrib_hygiene_processors_in_yaml(spark, tmp_path):
    """The contrib-style logdedup and rate_limit processors compile from
    YAML and run in a pipeline: dedup collapses repeated lines (count
    kept), quota caps rows per (key, window)."""
    base = str(tmp_path / "hygiene_cfg")
    cfg = {
        "receivers": {"synthetic": {"n_convs": 6, "mean_turns": 8, "seed": 7}},
        "processors": {
            "logdedup": {"keys": ["conv_id"]},
            "rate_limit": {"keys": ["conv_id"], "max_per_window": 2, "window": "day"},
        },
        "exporters": {"parquet/all": {"path": f"{base}/sink_all"}},
        "service": {
            "pipelines": {
                "logs": {
                    "receivers": ["synthetic"],
                    "processors": ["logdedup", "rate_limit"],
                    "exporters": ["parquet/all"],
                }
            }
        },
    }
    run_config(spark, cfg, base)
    out = spark.read.parquet(f"{base}/sink_all")
    rows = out.collect()
    assert len(rows) > 0
    # dedup happened upstream: no (conv, text) appears twice...
    pairs = [(r["conv_id"], r["text"]) for r in rows]
    assert len(pairs) == len(set(pairs))
    assert all(r["n_occurrences"] >= 1 for r in rows)
    # ...and the quota bounded each (conv, day) bucket
    from collections import Counter
    per_bucket = Counter((r["conv_id"], r["window_start"]) for r in rows)
    assert max(per_bucket.values()) <= 2


def test_rate_limit_processor_rejects_zero_quota(spark):
    cfg = {
        "receivers": {"synthetic": {"n_convs": 1}},
        "processors": {"rate_limit": {}},
        "exporters": {"parquet/x": {"path": "/tmp/never"}},
        "service": {
            "pipelines": {
                "logs": {
                    "receivers": ["synthetic"],
                    "processors": ["rate_limit"],
                    "exporters": ["parquet/x"],
                }
            }
        },
    }
    with pytest.raises(ConfigError, match="max_per_window"):
        compile_config(spark, cfg)


def test_relabel_processor_from_yaml(spark):
    """relabel_configs as a YAML processor block: rules compile at load
    (bad actions fail like Prometheus config load) and the compiled
    transform applies the chain in order."""
    from opentelemetry_collector_spark.config import ConfigError, _compile_processor

    fn = _compile_processor(
        spark,
        "relabel/r",
        {
            "configs": [
                {"action": "keep", "source_labels": ["role"], "regex": "user"},
                {
                    "action": "replace", "source_labels": ["role"],
                    "target_label": "who", "replacement": "the-$1", "regex": "(user)",
                },
                {"action": "labeldrop", "regex": "role"},
            ]
        },
    )
    df = spark.createDataFrame(
        [("m", {"role": "user"}, 1.0), ("m", {"role": "tool"}, 2.0)],
        "metric string, labels map<string,string>, value double",
    )
    out = [dict(r.labels) for r in fn(df).collect()]
    assert out == [{"who": "the-user"}]

    with pytest.raises(ConfigError, match="configs required"):
        _compile_processor(spark, "relabel/r", {})
    with pytest.raises(ConfigError, match="unknown action"):
        _compile_processor(spark, "relabel/r", {"configs": [{"action": "nope"}]})
    with pytest.raises(ConfigError, match="modulus"):
        _compile_processor(spark, "relabel/r", {"configs": [{"action": "hashmod"}]})


def test_jsonl_receiver_nested_attrs_knob(spark, tmp_path):
    """Per-receiver nested_attrs opt-in: an OTLP-JSON landing file whose
    producer ships a kvlist tool attribute parses with the composite
    preserved as canonical JSON; without the knob the same file parses
    flat (tool NULL); the knob rejects non-otlp_json encodings."""
    import json

    import pytest

    from opentelemetry_collector_spark.config import ConfigError, load_config, run_config

    env = {
        "resourceLogs": [
            {
                "resource": {"attributes": [{"key": "conv.id", "value": {"stringValue": "c-1"}}]},
                "instrumentationLibraryLogs": [
                    {
                        "instrumentationLibrary": {"name": "x"},
                        "logRecords": [
                            {
                                "timeUnixNano": "1700000000000000000",
                                "body": {"stringValue": "hello"},
                                "attributes": [
                                    {"key": "role", "value": {"stringValue": "user"}},
                                    {"key": "turn.idx", "value": {"intValue": "0"}},
                                    {
                                        "key": "tool",
                                        "value": {
                                            "kvlistValue": {
                                                "values": [
                                                    {"key": "name", "value": {"stringValue": "calc"}}
                                                ]
                                            }
                                        },
                                    },
                                ],
                            }
                        ],
                    }
                ],
            }
        ]
    }
    landing = tmp_path / "landing.jsonl"
    landing.write_text(json.dumps(env) + "\n")

    yaml_tpl = """
receivers:
  jsonl/in:
    path: {path}
    encoding: otlp_json
{knob}
exporters:
  parquet/out:
    path: {base}/out
service:
  pipelines:
    logs:
      receivers: [jsonl/in]
      processors: []
      exporters: [parquet/out]
"""
    base = str(tmp_path / "nested")
    run_config(
        spark,
        yaml_tpl.format(path=landing, base=base, knob="    nested_attrs: true"),
        base,
    )
    (row,) = spark.read.parquet(f"{base}/out").collect()
    assert row.tool == '{"name":"calc"}'
    assert row.role == "user" and row.turn_idx == 0

    base2 = str(tmp_path / "flat")
    run_config(spark, yaml_tpl.format(path=landing, base=base2, knob=""), base2)
    (row2,) = spark.read.parquet(f"{base2}/out").collect()
    assert row2.tool is None and row2.role == "user"

    with pytest.raises(ConfigError, match="nested_attrs requires"):
        run_config(
            spark,
            yaml_tpl.format(path=landing, base=base, knob="    nested_attrs: true").replace(
                "encoding: otlp_json", "encoding: turn_json"
            ),
            str(tmp_path / "bad"),
        )
