"""``python -m opentelemetry_collector_spark`` — alias for :mod:`.job`.

The reference ships one binary (`otelcol --config config.yaml`,
``service/collector.go:134-139``); making the package itself executable
keeps that one-command surface: the module path in the spark-submit line
and the local invocation are the same name.
"""

from __future__ import annotations

import sys

from opentelemetry_collector_spark.job import main

if __name__ == "__main__":
    sys.exit(main())
