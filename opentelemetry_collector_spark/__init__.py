"""otelcol-spark: a PySpark-native parse -> enrich -> route -> aggregate
pipeline engine with the operator semantics of the OpenTelemetry Collector
(reference: open-o11y/opentelemetry-collector), built Spark-first.

Public API — the stable surface a Collector user migrates onto:

    from opentelemetry_collector_spark import (
        build_session, run_config, compile_config,   # config-driven pipelines
        PipelineSpec, SinkSpec, run_pipeline,        # programmatic pipelines
    )

Operator modules (importable individually, all pure DataFrame->DataFrame):
``operators.parse`` ``operators.attributes`` ``operators.filters``
``operators.sample`` ``operators.span`` ``operators.batch``
``operators.memory_limiter`` ``operators.aggregate`` ``operators.dedup``
``operators.similarity`` ``operators.text`` ``operators.multimodal``;
``streaming`` for the Structured Streaming path; ``sources.codecs`` for wire
codecs; ``sources.hostmetrics`` for the scraper receivers; ``plans.status``
for healthcheck/zpages; ``functions.shingle_hash`` for the vectorized
dedup kernels.
"""

from opentelemetry_collector_spark.session import build_session

__version__ = "0.1.0"

__all__ = [
    "build_session",
    "compile_config",
    "run_config",
    "PipelineSpec",
    "SinkSpec",
    "run_pipeline",
    "__version__",
]


def __getattr__(name):
    # lazy imports keep `import opentelemetry_collector_spark` light
    if name in ("compile_config", "run_config"):
        from opentelemetry_collector_spark import config as _c

        return getattr(_c, name)
    if name in ("PipelineSpec", "SinkSpec", "run_pipeline"):
        from opentelemetry_collector_spark.plans import pipeline as _p

        return getattr(_p, name)
    raise AttributeError(name)
