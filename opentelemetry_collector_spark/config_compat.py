"""Load the reference Collector's OWN processor configs.

The reference wires processors from YAML (``config/configloader/config.go``);
its per-processor testdata fixtures (e.g.
``processor/attributesprocessor/testdata/config.yaml``,
``processor/filterprocessor/testdata/config_strict.yaml``) are the public
contract for what a user's config looks like. This module translates those
exact shapes onto our engine so a Collector user's attributes/filter blocks
run unchanged:

- action lists (``key``/``action``/``value``/``from_attribute``/``pattern``,
  ``processor/processorhelper/attraction.go:87-112``) map 1:1 onto
  :class:`~opentelemetry_collector_spark.operators.attributes.Action` — the
  field names are identical, including the validation failures (an extract
  pattern with an unnamed group is rejected here exactly as
  ``attraction.go:193-199`` rejects it);
- ``include``/``exclude`` match-properties
  (``internal/processor/filterconfig/config.go:70-136``) map onto
  :class:`~opentelemetry_collector_spark.operators.filters.MatchProperties`:

  ========================  =============================================
  reference field           our flattened-frame equivalent
  ========================  =============================================
  ``services``              filterset over the ``service_name`` column
                            (the resource service-name analog our span
                            frames carry, ``sources/zipkin.py``)
  ``span_names`` /          filterset over the record-name column
  ``log_names``             (``name`` by default)
  ``metric_names``          filterset over the ``metric`` column
  ``attributes``            entry list -> attrs-map matchers (absent
                            ``value`` = key-must-exist,
                            ``attributematcher.go:96-100``)
  ``resources``             entry list -> matchers over the resource map
                            column (``filterspan.go:107-116``)
  ``libraries``             matchers over the ``otel.library.name`` /
                            ``otel.library.version`` attr keys — the same
                            flattening the reference's own zipkin
                            translator applies to the instrumentation
                            library (``zipkinv2/to_translator.go``); an
                            absent version matches any version
                            (``filtermatcher.go`` library rules), a
                            present one (incl. blank) must equal the
                            stored value
  ========================  =============================================
"""

from __future__ import annotations

from typing import Any

from opentelemetry_collector_spark.operators.attributes import Action
from opentelemetry_collector_spark.operators.filters import MatchProperties

LIBRARY_NAME_KEY = "otel.library.name"
LIBRARY_VERSION_KEY = "otel.library.version"

_MATCH_FIELDS = {
    "match_type",
    "services",
    "span_names",
    "log_names",
    "metric_names",
    "attributes",
    "resources",
    "libraries",
    # expr match type (filtermetric/config.go:50-52)
    "expressions",
    # accepted-and-ignored knobs of the Go regexp filterset (an LRU result
    # cache — Catalyst evaluates rlike vectorized, nothing to cache)
    "regexp",
}


def actions_from_reference(raw: list[dict[str, Any]]) -> list[Action]:
    """A reference ``actions:`` list -> validated Action objects."""
    out = []
    for i, a in enumerate(raw):
        if "key" not in a or not a["key"]:
            raise ValueError(f'missing required field "key" at the {i}-th action')
        act = Action(
            key=a["key"],
            action=str(a.get("action", "")).lower(),
            value=a.get("value"),
            from_attribute=a.get("from_attribute"),
            pattern=a.get("pattern"),
        )
        act.validate()
        out.append(act)
    return out


def _entry_list_to_dict(entries: list[dict[str, Any]]) -> dict[str, Any]:
    """[{key: k, value: v?}, ...] -> {k: v-or-None} (None = must exist)."""
    return {e["key"]: e.get("value") for e in entries}


def _validate_regexp(pat: str) -> None:
    """Load-time pattern check via Python `re` as a structural proxy for
    the RE2 (Go) and Java (rlike) dialects: reject on errors every dialect
    shares (unbalanced parens — config_invalid.yaml's case), tolerate
    "bad escape" (dialect-divergent but often valid in RE2/Java)."""
    import re as _re

    try:
        _re.compile(pat)
    except _re.error as exc:
        if str(exc).startswith("bad escape"):
            return
        raise ValueError(f"invalid regexp pattern {pat!r}: {exc}") from exc


def match_properties_from_reference(
    spec: dict[str, Any],
    *,
    service_col: str = "service_name",
    name_col: str = "name",
    metric_col: str = "metric",
    attrs_col: str = "attrs",
    resource_col: str = "resource",
) -> MatchProperties:
    """A reference include/exclude block -> MatchProperties."""
    unknown = set(spec) - _MATCH_FIELDS
    if unknown:
        raise ValueError(f"unknown match-properties fields: {sorted(unknown)}")

    if spec.get("match_type") == "expr":
        # expr mode ignores every other criterion (filtermetric.NewMatcher
        # returns an exprMatcher built ONLY from expressions); FULLY parse
        # eagerly (grammar, not just lexing) so a bad expression fails at
        # load time like the Go filterexpr.NewMatcher compile
        from opentelemetry_collector_spark.operators.filters import validate_expr

        exprs = list(spec.get("expressions") or [])
        for e in exprs:
            validate_expr(e)
        return MatchProperties(
            match_type="expr",
            expressions=exprs,
            expr_name_col=metric_col,
            attrs_col=attrs_col,
        )

    if spec.get("match_type") == "regexp":
        # the Go regexp filterset compiles every pattern at build time
        # (regexpfilterset.go:37-55) and a malformed one rejects the whole
        # config (testdata/config_invalid.yaml) — compile eagerly for the
        # same failure point. Python `re` is a PROXY for the RE2/Java
        # dialects the pattern actually runs in, so only STRUCTURAL errors
        # (unbalanced groups/brackets, bad repeats) reject; "bad escape"
        # covers dialect-divergent classes like \p{L} that RE2 and Java
        # both accept — those pass through to the engine's own compile
        for fname in ("services", "span_names", "log_names", "metric_names"):
            for pat in spec.get(fname) or []:
                _validate_regexp(pat)

    columns: dict[str, list[str]] = {}
    if spec.get("services"):
        columns[service_col] = list(spec["services"])
    names = list(spec.get("span_names") or []) + list(spec.get("log_names") or [])
    if names:
        columns[name_col] = names
    if spec.get("metric_names"):
        columns[metric_col] = list(spec["metric_names"])

    attributes = _entry_list_to_dict(spec.get("attributes") or [])
    for lib in spec.get("libraries") or []:
        attributes[LIBRARY_NAME_KEY] = lib["name"]
        if lib.get("version") is not None:
            attributes[LIBRARY_VERSION_KEY] = lib["version"]

    return MatchProperties(
        match_type=spec.get("match_type", "strict"),
        columns=columns,
        attributes=attributes,
        attrs_col=attrs_col,
        resources=_entry_list_to_dict(spec.get("resources") or []),
        resource_col=resource_col,
    )


def compile_reference_processor(name: str, cfg: dict[str, Any], **cols: str) -> dict[str, Any]:
    """One ``attributes/x`` or ``filter/x`` block -> engine objects.

    Returns ``{"kind": "attributes"|"filter", "actions": [...] | None,
    "include": MatchProperties | None, "exclude": ...}`` ready for
    :func:`operators.attributes.apply_actions` /
    :func:`operators.filters.filter_records`. The filter processor's
    per-signal nesting (``metrics:``/``logs:``/``spans:``) is unwrapped.
    """
    kind = name.split("/", 1)[0]
    if kind == "attributes":
        return {
            "kind": kind,
            "actions": actions_from_reference(cfg.get("actions") or []),
            "include": (
                match_properties_from_reference(cfg["include"], **cols) if "include" in cfg else None
            ),
            "exclude": (
                match_properties_from_reference(cfg["exclude"], **cols) if "exclude" in cfg else None
            ),
        }
    if kind == "filter":
        # filter processor nests specs per signal (filterprocessor/config.go)
        inner = next((cfg[s] for s in ("metrics", "logs", "spans", "traces") if s in cfg), cfg)
        return {
            "kind": kind,
            "actions": None,
            "include": (
                match_properties_from_reference(inner["include"], **cols)
                if "include" in inner
                else None
            ),
            "exclude": (
                match_properties_from_reference(inner["exclude"], **cols)
                if "exclude" in inner
                else None
            ),
        }
    if kind == "resource":
        # resourceprocessor factory.go:101 — attributes actions are required
        if not (cfg or {}).get("attributes"):
            raise ValueError('missing required field "attributes"')
        return {
            "kind": kind,
            "actions": actions_from_reference(cfg["attributes"]),
            "include": None,
            "exclude": None,
        }
    if kind == "span":
        name_cfg = (cfg or {}).get("name") or {}
        from_attrs = list(name_cfg.get("from_attributes") or [])
        to_attrs = name_cfg.get("to_attributes") or {}
        rules = list(to_attrs.get("rules") or [])
        if not from_attrs and not rules:
            # spanprocessor factory validation: name needs one of the two
            raise ValueError('missing required field "name"')
        return {
            "kind": kind,
            "from_attributes": from_attrs,
            "separator": name_cfg.get("separator") or "",
            "to_attributes_rules": rules,
            "break_after_match": bool(to_attrs.get("break_after_match", False)),
            "include": (
                match_properties_from_reference(cfg["include"], **cols) if "include" in cfg else None
            ),
            "exclude": (
                match_properties_from_reference(cfg["exclude"], **cols) if "exclude" in cfg else None
            ),
        }
    if kind == "probabilistic_sampler":
        return {
            "kind": kind,
            "sampling_percentage": float((cfg or {}).get("sampling_percentage") or 0.0),
            "hash_seed": int((cfg or {}).get("hash_seed") or 0),
        }
    if kind == "batch":
        return {
            "kind": kind,
            "timeout": (cfg or {}).get("timeout"),
            "send_batch_size": int((cfg or {}).get("send_batch_size") or 8192),
            "send_batch_max_size": int((cfg or {}).get("send_batch_max_size") or 0) or None,
        }
    if kind == "memory_limiter":
        from opentelemetry_collector_spark.operators.memory_limiter import MemoryLimiterConfig

        c = cfg or {}
        # construction-error parity, in the reference's order
        # (memorylimiter.go:90-98): checkInterval first, then the limit —
        # the empty testdata block fails exactly like newMemoryLimiter
        if _duration_seconds(c.get("check_interval")) <= 0:
            raise ValueError("checkInterval must be greater than zero")
        limiter = MemoryLimiterConfig(
            limit_mib=float(c.get("limit_mib") or 0.0),
            spike_limit_mib=float(c.get("spike_limit_mib") or 0.0),
        )
        return {"kind": kind, "config": limiter, "check_interval": c.get("check_interval")}
    raise ValueError(f"unsupported reference processor type: {kind}")


def _duration_seconds(v: Any) -> float:
    """Go duration string ("5s", "100ms", "1m30s", "-1s") or number ->
    seconds; None/empty -> 0 (the Go zero value). Matches
    time.ParseDuration's shape: optional sign, then CONTIGUOUS
    number+unit groups covering the whole string — junk anywhere rejects."""
    if v is None:
        return 0.0
    if isinstance(v, (int, float)):
        return float(v)
    import re as _re

    s = str(v).strip()
    sign, body = 1.0, s
    if body.startswith(("-", "+")):
        sign, body = (-1.0 if body[0] == "-" else 1.0), body[1:]
    units = {"h": 3600.0, "m": 60.0, "s": 1.0, "ms": 1e-3, "us": 1e-6, "ns": 1e-9}
    total, pos = 0.0, 0
    for m in _re.finditer(r"(\d+(?:\.\d+)?)(h|ms|us|ns|m|s)", body):
        if m.start() != pos:  # gap = junk between (or before) groups
            raise ValueError(f"invalid duration: {v!r}")
        total += float(m.group(1)) * units[m.group(2)]
        pos = m.end()
    if pos != len(body) or pos == 0:
        raise ValueError(f"invalid duration: {v!r}")
    return sign * total


def load_reference_processors(path: str, **cols: str) -> dict[str, dict[str, Any]]:
    """Parse a reference config YAML; compile every processors: block.

    Returns name -> compiled dict for blocks that build, name ->
    ``{"error": str}`` for blocks the reference itself would reject at
    NewAttrProc time (its testdata deliberately includes such examples —
    parity means rejecting them too).
    """
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    return _compile_processors_doc(doc, **cols)


def _compile_processors_doc(doc: dict, **cols: str) -> dict[str, dict[str, Any]]:
    out: dict[str, dict[str, Any]] = {}
    for name, cfg in ((doc or {}).get("processors") or {}).items():
        try:
            out[name] = compile_reference_processor(name, cfg or {}, **cols)
        except (ValueError, KeyError, TypeError) as e:  # mirror Go build errors
            out[name] = {"error": str(e)}
    return out


# per-signal factory support in THIS reference version (each processor's
# factory.go processorhelper.With{Traces,Metrics,Logs} registrations):
# attributes traces+logs, filter metrics-only, span traces-only, sampler
# traces-only, resource/batch/memory_limiter all three
_SIGNAL_SUPPORT: dict[str, set[str]] = {
    "attributes": {"traces", "logs"},
    "filter": {"metrics"},
    "span": {"traces"},
    "probabilistic_sampler": {"traces"},
    "resource": {"traces", "metrics", "logs"},
    "batch": {"traces", "metrics", "logs"},
    "memory_limiter": {"traces", "metrics", "logs"},
}


# --- service.pipelines bridge -----------------------------------------------
#
# The reference testdata configs are FULL collector configs (nop receivers,
# nop exporters, a service.pipelines section). This bridge validates the
# service graph with configloader's rules (config/config.go:96-150: every
# pipeline needs >=1 receiver and >=1 exporter, references must resolve)
# and runs a pipeline's processor chain over a caller-supplied DataFrame —
# the nop receiver is "whatever frame you hand in", the nop exporter is
# "the returned frame" (the reference's nop components are exactly these
# identity endpoints, service/defaultcomponents + componenttest).


def load_reference_service(path: str, **cols: str) -> dict[str, Any]:
    """Parse a full reference config: processors compiled per
    :func:`load_reference_processors`, service.pipelines validated with the
    reference's own rules. Returns ``{"processors": {...}, "pipelines":
    {name: [processor ids in order]}}``; raises ValueError on a dangling
    reference or an empty receiver/exporter list."""
    import yaml

    with open(path) as f:
        doc = yaml.safe_load(f)
    procs = _compile_processors_doc(doc, **cols)
    receivers = set((doc.get("receivers") or {}).keys())
    exporters = set((doc.get("exporters") or {}).keys())
    pipelines: dict[str, list[str]] = {}
    for pname, pcfg in ((doc.get("service") or {}).get("pipelines") or {}).items():
        pcfg = pcfg or {}
        if pname.split("/", 1)[0] not in ("traces", "metrics", "logs"):
            # configloader/config.go:399-406 errorUnknownType
            raise ValueError(f"unknown pipelines type {pname!r}")
        if not pcfg.get("receivers"):
            raise ValueError(f"pipeline {pname}: must have at least one receiver")
        if not pcfg.get("exporters"):
            raise ValueError(f"pipeline {pname}: must have at least one exporter")
        for rid in pcfg["receivers"]:
            if rid not in receivers:
                raise ValueError(f"pipeline {pname}: references unknown receiver {rid!r}")
        for eid in pcfg["exporters"]:
            if eid not in exporters:
                raise ValueError(f"pipeline {pname}: references unknown exporter {eid!r}")
        signal = pname.split("/", 1)[0]
        for pid in pcfg.get("processors") or []:
            if pid not in procs:
                raise ValueError(f"pipeline {pname}: references unknown processor {pid!r}")
            if "error" in procs[pid]:
                raise ValueError(
                    f"pipeline {pname}: processor {pid!r} failed to build: "
                    f"{procs[pid]['error']}"
                )
            supported = _SIGNAL_SUPPORT.get(procs[pid]["kind"])
            if supported is not None and signal in ("traces", "metrics", "logs") \
                    and signal not in supported:
                # pipelines_builder.go:186-188 wording
                raise ValueError(
                    f"error creating processor {pid!r} in pipeline {pname!r}, "
                    f"data type {signal} is not supported"
                )
        pipelines[pname] = list(pcfg.get("processors") or [])
    return {"processors": procs, "pipelines": pipelines}


def run_reference_pipeline(
    df: Any,
    service: dict[str, Any],
    pipeline: str,
    id_col: str = "conv_id",
    attrs_col: str = "attrs",
    name_col: str = "name",
    resource_col: str = "resource",
) -> Any:
    """Apply one validated pipeline's processor chain to ``df`` in config
    order (processors compose front-to-back on an immutable frame — the
    back-to-front consumer wiring of pipelines_builder.go:117-216 exists
    only because the reference mutates in place).

    batch blocks are transport concerns (their send_batch_max_size maps to
    writer options at the sink, operators/batch.writer_options) and pass
    the frame through unchanged; every other kind transforms rows. Include/
    exclude-gated span rules transform only the matched subset and union
    the rest back untouched (attributes_log.go:66-86 pass-through).
    """
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.attributes import apply_actions
    from opentelemetry_collector_spark.operators.filters import (
        filter_records,
        match_predicate,
    )
    from opentelemetry_collector_spark.operators.memory_limiter import memory_limit
    from opentelemetry_collector_spark.operators.sample import probabilistic_sample
    from opentelemetry_collector_spark.operators.span import from_attributes, to_attributes

    for pid in service["pipelines"][pipeline]:
        p = service["processors"][pid]
        kind = p["kind"]
        if kind == "attributes":
            df = apply_actions(
                df, p["actions"], include=p["include"], exclude=p["exclude"],
                attrs_col=attrs_col,
            )
        elif kind == "resource":
            df = apply_actions(df, p["actions"], attrs_col=resource_col)
        elif kind == "filter":
            df = filter_records(df, include=p["include"], exclude=p["exclude"])
        elif kind == "span":
            gated = p["include"] is not None or p["exclude"] is not None
            if gated:
                pred = match_predicate(p["include"], p["exclude"])
                matched, rest = df.filter(pred), df.filter(
                    ~F.coalesce(pred, F.lit(False))
                )
            else:
                matched, rest = df, None
            if p["from_attributes"]:
                matched = from_attributes(
                    matched, p["from_attributes"], p["separator"],
                    name_col=name_col, attrs_col=attrs_col,
                )
            if p["to_attributes_rules"]:
                matched = to_attributes(
                    matched,
                    p["to_attributes_rules"],
                    name_col=name_col,
                    attrs_col=attrs_col,
                    break_after_match=p["break_after_match"],
                )
            df = matched if rest is None else matched.unionByName(rest)
        elif kind == "probabilistic_sampler":
            df = probabilistic_sample(
                df, p["sampling_percentage"], p["hash_seed"], id_col=id_col
            )
        elif kind == "memory_limiter":
            df = memory_limit(df, p["config"], batch_key=id_col)
        elif kind == "batch":
            pass  # transport-only: maps to writer options at the sink
        else:  # pragma: no cover - load_reference_processors rejects others
            raise ValueError(f"unsupported kind {kind!r}")
    return df
