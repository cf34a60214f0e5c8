"""Service health + pipeline introspection (extension analogs).

Reference:
- healthcheckextension — an HTTP endpoint flipping Ready/Unavailable around
  pipeline lifecycle (``extension/healthcheckextension/healthcheckextension.go:
  83-88``). Batch analog: a run is *ready* when every sink of every pipeline
  has a committed manifest entry for the current input snapshot — the same
  signal the resume path trusts.
- zpagesextension — /debug pages rendering the running pipeline graph
  (``extension/zpagesextension/zpagesextension.go``). Batch analog: a
  deterministic text rendering of the compiled service for logs/debugging.
"""

from __future__ import annotations

from dataclasses import dataclass

from opentelemetry_collector_spark.plans.checkpoint import CheckpointManifest
from opentelemetry_collector_spark.plans.pipeline import PipelineSpec

READY = "ready"
UNAVAILABLE = "unavailable"


@dataclass
class PipelineHealth:
    pipeline: str
    status: str  # READY | UNAVAILABLE
    committed_sinks: list[str]
    pending_sinks: list[str]


def pipeline_health(spec: PipelineSpec, base_path: str, snapshot: str) -> PipelineHealth:
    """Ready iff every sink committed for this input snapshot."""
    manifest = CheckpointManifest(base_path)
    committed = [s.name for s in spec.sinks if manifest.committed(s.name, snapshot)]
    pending = [s.name for s in spec.sinks if s.name not in committed]
    return PipelineHealth(
        pipeline=spec.name,
        status=READY if not pending else UNAVAILABLE,
        committed_sinks=committed,
        pending_sinks=pending,
    )


def zpages_text(pipelines: dict[str, PipelineSpec]) -> str:
    """Deterministic /debug/pipelinez-style rendering of the compiled graph."""
    lines = ["service pipelines:"]
    for name in sorted(pipelines):
        spec = pipelines[name]
        lines.append(f"  pipeline {name}:")
        lines.append(f"    receivers: 1 source fn ({spec.source.__name__})")
        lines.append(f"    processors: {len(spec.processors)}")
        for s in spec.sinks:
            extra = []
            if s.repartition_key:
                extra.append(f"keyed={s.repartition_key}")
            if s.partition_by:
                extra.append(f"partitioned={','.join(s.partition_by)}")
            suffix = f" [{' '.join(extra)}]" if extra else ""
            lines.append(f"    exporter {s.name}: format={s.format} path={s.path}{suffix}")
    return "\n".join(lines)
