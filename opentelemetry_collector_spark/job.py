"""spark-submit entry point: run a Collector-shaped config end-to-end.

The reference's binary is `otelcol --config config.yaml`
(``service/collector.go:134-139`` cobra CLI); ours is

    zip -r otelcol_spark.zip opentelemetry_collector_spark
    spark-submit --master <cluster> --py-files otelcol_spark.zip submit_job.py \
        --config pipeline.yaml --base-path s3://bucket/runs/2026-08-17 \
        [--run-id RUN]

(spark-submit takes a script file, not ``-m`` — ``submit_job.py`` at the
repo root is that file) or locally:
``python -m opentelemetry_collector_spark.job --config ... --master local[8]``.

On a cluster, omit --master and let spark-submit supply the session; the
same config then runs unchanged at N or 4N executors (the two-cluster-size
criterion) because every stage is expressed as partition-parallel DataFrame
ops. Exit code 0 iff every pipeline committed every sink; per-sink counts
and the metrics table land under --base-path (see plans/pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="otelcol-spark", description=__doc__)
    ap.add_argument("--config", required=True, help="YAML pipeline config (see config.py)")
    ap.add_argument("--base-path", required=True, help="output root: sinks, metrics, manifest")
    ap.add_argument("--run-id", default=None)
    ap.add_argument("--master", default=None, help="override master (local runs); omit under spark-submit")
    ap.add_argument(
        "--set",
        dest="sets",
        action="append",
        default=[],
        metavar="KEY=VALUE",
        help="dotted-path config override, repeatable (the reference's --set flag)",
    )
    args = ap.parse_args(argv)

    from opentelemetry_collector_spark.config import apply_set_overrides, load_config, run_config
    from opentelemetry_collector_spark.session import build_session

    # load RAW (expand=False): run_config's own load applies the single
    # env-expansion pass over file values and --set values together —
    # expanding here too would re-interpret $$ escapes (double expansion)
    cfg = load_config(args.config, expand=False)
    if args.sets:
        cfg = apply_set_overrides(cfg, args.sets)

    spark = build_session(master=args.master) if args.master else build_session(master=None)
    try:
        results = run_config(spark, cfg, args.base_path, run_id=args.run_id)
        summary = {
            p: {"run_id": r.run_id, "sink_rows": r.sink_rows, "resumed": r.resumed_sinks}
            for p, r in results.items()
        }
        print(json.dumps(summary), flush=True)
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
