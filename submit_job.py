"""spark-submit launcher for :mod:`opentelemetry_collector_spark.job`.

``spark-submit`` takes a script *file*, not a ``-m`` module path, so this
one-liner is the file you submit; the package itself ships as the
``--py-files`` zip (nothing else from the repo checkout is needed):

    zip -r otelcol_spark.zip opentelemetry_collector_spark
    spark-submit --master <cluster> --py-files otelcol_spark.zip submit_job.py \
        --config pipeline.yaml --base-path s3://bucket/runs/<date>

The reference's one-binary surface is ``otelcol --config config.yaml``
(``service/collector.go:134-139``); this file plus the zip is ours.
Exercised end-to-end (real spark-submit, zip-only import path) in
``tests/test_config.py::test_spark_submit_py_files``.
"""

from __future__ import annotations

import sys

from opentelemetry_collector_spark.job import main

if __name__ == "__main__":
    sys.exit(main())
