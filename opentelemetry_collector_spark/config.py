"""Collector-shaped config surface: YAML/dict -> compiled pipeline.

The reference wires pipelines from a YAML config with top-level sections
``receivers / processors / exporters / service.pipelines`` where component
ids are ``type`` or ``type/name`` (``config/configloader/config.go:96-140``,
id parsing :142-168). Validation mirrors ``config/config.go:31-150``: every
pipeline references >=1 receiver and >=1 exporter, and every reference must
resolve to a declared component of the right section.

A user of the reference keeps the same mental model here: the same four
sections, the same ``type/name`` ids, processor configs whose fields mirror
the Go processor configs (actions, include/exclude, sampling_percentage,
send_batch_max_size, ...). The compiler turns the spec into a
:class:`~opentelemetry_collector_spark.plans.pipeline.PipelineSpec` — a chain
of pure DataFrame transforms plus predicate-routed sinks — and
``run_config`` executes it with obsreport metrics and checkpoint/resume.

Supported component types:

receivers:
  ``transcripts``  {events_path | path | sf_dir} — parquet scan (the scan IS
                   the receiver); ``events_path``/``sf_dir`` derive the
                   transcripts shape from an events table.
  ``synthetic``    {n_convs, mean_turns, seed} — goldendataset analog.
processors:
  ``attributes``   {actions: [...], include?, exclude?}   (attraction.go)
  ``resource``     {lookup_path | lookup_sql?, join_key, actions?} —
                   broadcast-join enrich (resource_processor.go:29-53
                   generalized to a dimension lookup per SURVEY §2.3)
  ``filter``       {include?, exclude?}                   (filter_processor.go)
  ``probabilistic_sampler`` {sampling_percentage, hash_seed?, id_column?,
                   priority_column?}                      (probabilisticsampler.go)
  ``span``         {from_attributes? | to_attributes?}    (span.go)
  ``batch``        {send_batch_max_size?} — sets per-sink maxRecordsPerFile
                   (batch_processor.go; batching-for-transport == file sizing)
exporters:
  ``parquet`` / ``json`` {path, predicate?: match-properties spec}
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.attributes import Action, apply_actions
from opentelemetry_collector_spark.operators.filters import (
    MatchProperties,
    filter_records,
    match_predicate,
)
from opentelemetry_collector_spark.operators.sample import probabilistic_sample
from opentelemetry_collector_spark.operators.span import from_attributes, to_attributes
from opentelemetry_collector_spark.plans.pipeline import PipelineSpec, SinkSpec, run_pipeline

Transform = Callable[[DataFrame], DataFrame]


class ConfigError(ValueError):
    """Invalid pipeline config (the configloader/validation error analog)."""


# Go os.Expand name grammar (configloader/config.go:521-533): ${name},
# $$ -> literal $, $IDENT (letter/underscore then word chars), a single
# shell-special char ($1, $?, ... -> looked up as a 1-char name, normally
# unset -> ""), or an UNTERMINATED "${" (bad syntax: os.Expand eats the
# two characters and emits nothing — the trailing alternative below)
_ENV_RE = re.compile(r"\$(?:(\$)|\{([^}]*)\}|([A-Za-z_]\w*)|([*#@!?\-0-9])|(\{))")


def expand_env(s: str, env=None) -> str:
    """Environment-variable substitution with the reference's exact escape
    rules (``configloader/config.go:521-533``): ``$FOO``/``${FOO}`` replace
    with the env value (unset -> empty string), ``$$FOO`` -> literal
    ``$FOO``, ``$$$FOO`` -> ``$`` + substituted FOO; an unterminated
    ``${`` is consumed silently (os.Expand's bad-syntax rule)."""
    env = os.environ if env is None else env

    def sub(m):
        if m.group(1):
            return "$"
        if m.group(5) is not None:  # unterminated "${"
            return ""
        name = next(g for g in m.groups()[1:4] if g is not None)
        return env.get(name, "")

    return _ENV_RE.sub(sub, s)


def _expand_config(obj, env=None):
    """Recursive expansion over every string VALUE in the loaded config map
    (the expandStringValues walk, ``configloader/config.go:455-474``)."""
    if isinstance(obj, str):
        return expand_env(obj, env)
    if isinstance(obj, list):
        return [_expand_config(v, env) for v in obj]
    if isinstance(obj, dict):
        return {k: _expand_config(v, env) for k, v in obj.items()}
    return obj


def load_config(source: dict | str, env=None, expand: bool = True) -> dict:
    """Accept a dict, a YAML string, or a path to a YAML file. String values
    get env-var expansion exactly like the reference's config loader (which
    expands the loaded map ONCE regardless of which parser provider produced
    it); pass ``env={}`` to disable lookups, or ``expand=False`` to parse
    without expanding (the CLI does this so --set overrides can merge in
    BEFORE the single expansion pass — expanding twice would re-interpret
    the $$ escapes and mangle values that legitimately contain ``$``)."""
    if isinstance(source, dict):
        return _expand_config(source, env) if expand else source
    text = source
    if isinstance(source, str) and os.path.exists(source):
        with open(source) as f:
            text = f.read()
    try:
        import yaml

        cfg = yaml.safe_load(text)
    except ImportError:  # pragma: no cover - yaml is present in this env
        import json

        cfg = json.loads(text)
    if not isinstance(cfg, dict):
        raise ConfigError("config must be a mapping")
    return _expand_config(cfg, env) if expand else cfg


def apply_set_overrides(cfg: dict, sets: list[str]) -> dict:
    """``--set a.b.c=value`` command-line overrides layered over the loaded
    config (the setflag parser provider, ``service/parserprovider/
    setflag.go:25-60``: properties-format pairs merged into the map at the
    "."-delimited path). Values parse as YAML scalars — the analog of
    viper's weak typing that turns ``=100`` into an int. Overrides merge
    into the RAW (pre-expansion) map; env-var expansion happens exactly
    once, at load time, for file values and --set values alike. Returns a
    new dict; the input is not mutated."""
    import copy

    out = copy.deepcopy(cfg)
    for prop in sets:
        prop = prop.strip()
        key, sep, raw = prop.partition("=")
        if not sep or not key.strip():
            raise ConfigError(f"--set must be key=value, got {prop!r} (setflag.go)")
        try:
            import yaml

            try:
                value = yaml.safe_load(raw.strip()) if raw.strip() else ""
            except yaml.YAMLError as e:
                raise ConfigError(f"--set {key.strip()}: unparseable value {raw!r}: {e}") from e
        except ImportError:  # pragma: no cover
            value = raw.strip()
        node = out
        parts = [p for p in key.strip().split(".") if p]
        for p in parts[:-1]:
            nxt = node.get(p)
            if not isinstance(nxt, dict):
                nxt = {}
                node[p] = nxt
            node = nxt
        node[parts[-1]] = value
    return out


def component_type(component_id: str) -> str:
    """``type[/name]`` -> ``type`` (config.go:142-168 id parsing)."""
    return component_id.split("/", 1)[0].strip()


# ---------------------------------------------------------------------------
# section compilers
# ---------------------------------------------------------------------------


def _match_props(spec: dict | None) -> MatchProperties | None:
    if spec is None:
        return None
    known = {"match_type", "columns", "attributes", "attrs_col"}
    unknown = set(spec) - known
    if unknown:
        raise ConfigError(f"unknown match-properties fields: {sorted(unknown)}")
    return MatchProperties(
        match_type=spec.get("match_type", "strict"),
        columns={k: list(v) for k, v in (spec.get("columns") or {}).items()},
        attributes=dict(spec.get("attributes") or {}),
        attrs_col=spec.get("attrs_col", "attrs"),
    )


def _compile_receiver(cid: str, cfg: dict) -> Callable[[SparkSession], DataFrame]:
    ctype = component_type(cid)
    if ctype == "transcripts":
        from opentelemetry_collector_spark.sources.transcripts import from_events

        if "sf_dir" in cfg:
            sf_dir = cfg["sf_dir"]
            return lambda spark: from_events(spark, sf_dir)
        if "events_path" in cfg:
            events_path = cfg["events_path"]

            def _scan_events(spark: SparkSession) -> DataFrame:
                sf_dir = os.path.dirname(events_path)
                return from_events(spark, sf_dir)

            return _scan_events
        if "path" in cfg:
            path = cfg["path"]
            return lambda spark: spark.read.parquet(path)
        raise ConfigError(f"receiver {cid}: needs one of sf_dir/events_path/path")
    if ctype == "jsonl":
        # file receiver over a JSON-lines landing zone (the fileexporter wire
        # format read back, or a Kafka-topic dump): scan text -> unmarshal
        from opentelemetry_collector_spark.sources.codecs import unmarshal

        if "path" not in cfg:
            raise ConfigError(f"receiver {cid}: path required")
        path = cfg["path"]
        encoding = cfg.get("encoding", "turn_json")
        if cfg.get("nested_attrs"):
            # per-receiver opt-in for the composite-AnyValue contract
            # (SURVEY §1.3) — the same per-receiver config choice the
            # reference makes; only meaningful on the OTLP-JSON envelope
            if encoding != "otlp_json":
                raise ConfigError(
                    f"receiver {cid}: nested_attrs requires encoding otlp_json"
                )
            encoding = "otlp_json_nested"

        def _scan_jsonl(spark: SparkSession) -> DataFrame:
            raw = spark.read.text(path).withColumnRenamed("value", "value")
            return unmarshal(raw, encoding, col="value")

        return _scan_jsonl
    if ctype == "synthetic":
        from opentelemetry_collector_spark.sources.transcripts import synthesize

        n_convs = int(cfg.get("n_convs", 100))
        mean_turns = int(cfg.get("mean_turns", 20))
        seed = int(cfg.get("seed", 42))
        return lambda spark: synthesize(spark, n_convs=n_convs, mean_turns=mean_turns, seed=seed)
    if ctype == "metrics":
        # metric-signal receiver: the per-turn scalar datapoint frame, so
        # `metrics/...` pipelines are end-to-end real (same scan, one
        # projection + Generate — transcripts.metrics_from_transcripts)
        from opentelemetry_collector_spark.sources.transcripts import metrics_from_transcripts

        inner_fn = _compile_receiver(f"transcripts/{cid}", dict(cfg))
        return lambda spark: metrics_from_transcripts(inner_fn(spark))
    if ctype == "spans":
        # trace-signal receiver: the transcripts-as-traces span frame
        # (conv == trace, turn == span — SURVEY §1.3), so `traces/...`
        # pipelines are end-to-end real; same underlying scan, one extra
        # shuffle-free projection (zipkin.spans_from_transcripts)
        from opentelemetry_collector_spark.sources.zipkin import spans_from_transcripts

        inner_fn = _compile_receiver(f"transcripts/{cid}", dict(cfg))
        return lambda spark: spans_from_transcripts(inner_fn(spark))
    raise ConfigError(f"receiver {cid}: unknown type '{ctype}'")


def _compile_processor(spark: SparkSession, cid: str, cfg: dict) -> Transform:
    ctype = component_type(cid)
    if ctype == "attributes":
        actions = [Action(**a) for a in cfg.get("actions", [])]
        if not actions:
            raise ConfigError(f"processor {cid}: actions required (attraction.go:139)")
        include = _match_props(cfg.get("include"))
        exclude = _match_props(cfg.get("exclude"))
        return lambda df: apply_actions(df, actions, include=include, exclude=exclude)
    if ctype == "resource":
        lookup_path = cfg.get("lookup_path")
        if not lookup_path:
            raise ConfigError(f"processor {cid}: lookup_path required")
        join_key = cfg.get("join_key", "conv_id")
        # north_star: enrichment keyed on conv_id AND role — composite keys
        # are a list; both forms broadcast the same way
        join_keys = [join_key] if isinstance(join_key, str) else list(join_key)
        how = cfg.get("join_type", "left")

        def _enrich(df: DataFrame) -> DataFrame:
            dim = df.sparkSession.read.parquet(lookup_path)
            return df.join(F.broadcast(dim), on=join_keys, how=how)

        return _enrich
    if ctype == "filter":
        include = _match_props(cfg.get("include"))
        exclude = _match_props(cfg.get("exclude"))
        if include is None and exclude is None:
            raise ConfigError(f"processor {cid}: include or exclude required (config.go:70)")
        return lambda df: filter_records(df, include=include, exclude=exclude)
    if ctype == "relabel":
        # the scrape manager's relabel_configs as a pipeline processor
        # (sources/prometheus.py); config mistakes (unknown action, zero
        # hashmod modulus) fail HERE at load, like Prometheus config load
        from opentelemetry_collector_spark.sources.prometheus import (
            RelabelConfig,
            apply_relabel_configs,
        )

        raw = cfg.get("configs", [])
        if not raw:
            raise ConfigError(f"processor {cid}: configs required (a relabel rule list)")
        try:
            rules = [RelabelConfig(**r) for r in raw]
        except (TypeError, ValueError) as e:
            raise ConfigError(f"processor {cid}: {e}") from e
        labels_col = cfg.get("labels_col", "labels")
        metric_col = cfg.get("metric_col", "metric")
        return lambda df: apply_relabel_configs(
            df, rules, labels_col=labels_col, metric_col=metric_col
        )
    if ctype == "probabilistic_sampler":
        pct = float(cfg.get("sampling_percentage", 100.0))
        seed = int(cfg.get("hash_seed", 0))
        id_col = cfg.get("id_column", "conv_id")
        prio = cfg.get("priority_column")
        return lambda df: probabilistic_sample(
            df, pct, hash_seed=seed, id_col=id_col, priority_col=prio
        )
    if ctype == "span":
        if "from_attributes" in cfg:
            fa = cfg["from_attributes"]
            return lambda df: from_attributes(
                df,
                keys=list(fa["keys"]),
                separator=fa.get("separator", ""),
                name_col=fa.get("name_col", "text"),
            )
        if "to_attributes" in cfg:
            ta = cfg["to_attributes"]
            return lambda df: to_attributes(
                df,
                patterns=list(ta["patterns"]),
                name_col=ta.get("name_col", "text"),
                break_after_match=bool(ta.get("break_after_match", False)),
            )
        raise ConfigError(f"processor {cid}: from_attributes or to_attributes required")
    if ctype == "batch":
        # record-count invariance is the contract; physical effect is applied
        # at the sinks (max_records_per_file), so the transform is identity
        return lambda df: df
    if ctype == "memory_limiter":
        from opentelemetry_collector_spark.operators.memory_limiter import (
            MemoryLimiterConfig,
            memory_limit,
        )

        if "limit_mib" not in cfg:
            raise ConfigError(
                f"processor {cid}: memAllocLimit or memoryLimitPercentage "
                "must be greater than zero (memorylimiter.go:47-48)"
            )
        ml_cfg = MemoryLimiterConfig(
            limit_mib=float(cfg["limit_mib"]),
            spike_limit_mib=float(cfg.get("spike_limit_mib", 0.0)),
        )
        batch_key = cfg.get("batch_key", "conv_id")
        return lambda df: memory_limit(df, ml_cfg, batch_key=batch_key)
    # contrib-collector-style processors (not in defaultcomponents; the
    # contrib distribution ships a logdedup processor with exactly this
    # contract, and per-key quotas are its rate-limiting counterpart) —
    # YAML-exposed because a pipeline config wanting hygiene between parse
    # and route shouldn't need Python
    if ctype == "logdedup":
        from opentelemetry_collector_spark.operators.hygiene import log_dedup

        keys = cfg.get("keys", ["conv_id"])
        text_col = cfg.get("text_column", "text")
        return lambda df: log_dedup(df, keys=list(keys), text_col=text_col)
    if ctype == "rate_limit":
        from opentelemetry_collector_spark.operators.hygiene import rate_limit

        if int(cfg.get("max_per_window", 0)) < 1:
            raise ConfigError(f"processor {cid}: max_per_window >= 1 required")
        keys = cfg.get("keys", ["conv_id"])
        return lambda df: rate_limit(
            df,
            keys=list(keys),
            max_per_window=int(cfg["max_per_window"]),
            window=cfg.get("window", "hour"),
        )
    raise ConfigError(f"processor {cid}: unknown type '{ctype}'")


def _compile_exporter(cid: str, cfg: dict, batch_max: int | None) -> SinkSpec:
    ctype = component_type(cid)
    if ctype not in ("parquet", "json", "iceberg"):
        raise ConfigError(f"exporter {cid}: unknown type '{ctype}'")
    if "path" not in cfg and "table" not in cfg:
        raise ConfigError(f"exporter {cid}: path (or table, for iceberg) required")
    if ctype == "iceberg" and "table" in cfg:
        # iceberg sinks address a catalog table, not a filesystem path
        cfg = {**cfg, "path": cfg["table"]}
    pred_spec = cfg.get("predicate")
    if pred_spec is None:
        predicate = F.lit(True)
    else:
        # either {include: {...}, exclude: {...}} or a bare match-properties
        # spec (treated as include) — same shorthand the filter processor allows
        if "include" in pred_spec or "exclude" in pred_spec:
            inc, exc = pred_spec.get("include"), pred_spec.get("exclude")
        else:
            inc, exc = pred_spec, None
        predicate = match_predicate(include=_match_props(inc), exclude=_match_props(exc))
    return SinkSpec(
        name=cid.replace("/", "_"),
        predicate=predicate,
        path=cfg["path"],
        format=ctype,
        max_records_per_file=cfg.get("max_records_per_file", batch_max),
        repartition_key=cfg.get("repartition_key"),
        partition_by=list(cfg["partition_by"]) if cfg.get("partition_by") else None,
    )


# ---------------------------------------------------------------------------
# top-level compile + run
# ---------------------------------------------------------------------------


# The reference's five default extensions (defaultcomponents/defaults.go:59-70).
# health_check / zpages compile to plans/status.py; the rest are platform
# concerns under Spark (JVM profilers, executor memory, cluster auth) —
# accepted so a reference user's YAML loads, but carry no behavior.
_EXTENSION_TYPES = {"health_check", "zpages", "pprof", "memory_ballast", "bearertokenauth"}


@dataclass
class CompiledService:
    """All pipelines of a config, compiled (service.pipelines analog), plus
    the service's enabled extensions (id -> type, service order preserved —
    config.go:156)."""

    pipelines: dict[str, PipelineSpec] = field(default_factory=dict)
    extensions: dict[str, str] = field(default_factory=dict)

    def zpages(self) -> str:
        """/debug rendering — only when a zpages extension is enabled."""
        from opentelemetry_collector_spark.plans.status import zpages_text

        if "zpages" not in self.extensions.values():
            raise ConfigError("no zpages extension enabled in service.extensions")
        return zpages_text(self.pipelines)

    def health(self, base_path: str, snapshot: str) -> dict:
        """healthcheck extension: per-pipeline Ready/Unavailable over the
        commit manifest — only when a health_check extension is enabled."""
        from opentelemetry_collector_spark.plans.status import pipeline_health

        if "health_check" not in self.extensions.values():
            raise ConfigError("no health_check extension enabled in service.extensions")
        return {
            name: pipeline_health(spec, os.path.join(base_path, name), snapshot)
            for name, spec in self.pipelines.items()
        }


def compile_config(spark: SparkSession, source: dict | str) -> CompiledService:
    cfg = load_config(source)
    receivers: dict[str, dict] = cfg.get("receivers") or {}
    processors: dict[str, dict] = cfg.get("processors") or {}
    exporters: dict[str, dict] = cfg.get("exporters") or {}
    extensions: dict[str, dict] = cfg.get("extensions") or {}
    service = cfg.get("service") or {}
    pipelines_cfg: dict[str, dict] = service.get("pipelines") or {}
    if not pipelines_cfg:
        raise ConfigError("service.pipelines must define at least one pipeline (config.go:31)")
    for pname in pipelines_cfg:
        # configloader/config.go:399-406: pipeline keys are signal-typed ids
        if component_type(pname) not in ("traces", "metrics", "logs"):
            raise ConfigError(
                f"unknown pipelines type '{component_type(pname)}' for {pname}"
            )

    for eid in extensions:
        if component_type(eid) not in _EXTENSION_TYPES:
            raise ConfigError(f"unknown extensions type '{component_type(eid)}' for {eid}")
    service_ext: list[str] = service.get("extensions") or []
    for ref in service_ext:
        # config.go:100-103 validateServiceExtensions
        if ref not in extensions:
            raise ConfigError(f'service references extension "{ref}" which does not exist')

    out = CompiledService(extensions={ref: component_type(ref) for ref in service_ext})
    for pname, pcfg in pipelines_cfg.items():
        r_ids = pcfg.get("receivers") or []
        p_ids = pcfg.get("processors") or []
        e_ids = pcfg.get("exporters") or []
        if not r_ids:
            raise ConfigError(f"pipeline {pname}: must have at least one receiver (config.go:106)")
        if not e_ids:
            raise ConfigError(f"pipeline {pname}: must have at least one exporter (config.go:112)")
        for rid in r_ids:
            if rid not in receivers:
                raise ConfigError(f"pipeline {pname}: references unknown receiver '{rid}'")
        for pid in p_ids:
            if pid not in processors:
                raise ConfigError(f"pipeline {pname}: references unknown processor '{pid}'")
        for eid in e_ids:
            if eid not in exporters:
                raise ConfigError(f"pipeline {pname}: references unknown exporter '{eid}'")

        sources = [_compile_receiver(rid, receivers[rid]) for rid in r_ids]
        if len(sources) == 1:
            source_fn = sources[0]
        else:
            # receiver fan-in: one pipeline fed by several receivers =>
            # union of scans (receivers_builder.go:161-233)
            def source_fn(spark: SparkSession, _sources=tuple(sources)) -> DataFrame:
                dfs = [s(spark) for s in _sources]
                df = dfs[0]
                for other in dfs[1:]:
                    df = df.unionByName(other, allowMissingColumns=True)
                return df

        transforms = [_compile_processor(spark, pid, processors[pid]) for pid in p_ids]
        batch_max = None
        for pid in p_ids:
            if component_type(pid) == "batch":
                batch_max = processors[pid].get("send_batch_max_size")
        sinks = [_compile_exporter(eid, exporters[eid], batch_max) for eid in e_ids]
        out.pipelines[pname] = PipelineSpec(
            name=pname, source=source_fn, processors=transforms, sinks=sinks
        )
    return out


def run_config(
    spark: SparkSession, source: dict | str, base_path: str, run_id: str | None = None
) -> dict[str, Any]:
    """Compile and execute every pipeline; returns {pipeline: RunResult}."""
    svc = compile_config(spark, source)
    results: dict[str, Any] = {}
    for pname, spec in svc.pipelines.items():
        results[pname] = run_pipeline(spark, spec, os.path.join(base_path, pname), run_id=run_id)
    return results
