"""Checkpoint/resume with per-sink lineage manifests.

The reference's delivery guarantees come from the exporterhelper chain:
bounded queue + exponential-backoff retry + timeout
(``exporter/exporterhelper/queued_retry.go:52-332``). Spark replaces the
intra-process queue/retry with task retries; what we must keep is the
CONTRACT: at-least-once delivery to every sink with resumability, made
effectively exactly-once by idempotent per-sink overwrites.

Design (batch analog of FIXTURES.md §5 `checkpoints`):
- each sink write is staged to `<base>/<sink>` with mode=overwrite
  (idempotent: a re-run replaces partial output rather than duplicating it);
- after a sink commits, a manifest line (run_id, stage=sink name, rows,
  input_snapshot, status=committed) is appended to `<base>/_manifest.json`;
- resume skips sinks whose manifest line is committed for the same
  input_snapshot — commit order sinks-first/manifest-last, so a crash
  between the two re-runs that sink idempotently (SURVEY §7 risk 4).
- lineage: input_snapshot identifies the exact input (path + row count),
  the Iceberg-snapshot-id analog for plain parquet.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, fields


def _read_jsonl(path: str) -> list[dict]:
    """Crash-tolerant JSONL read: a process dying mid-append (the exact
    failure these logs exist to survive) leaves a torn FINAL line — skip it
    so resume keeps working. A torn line anywhere ELSE is real corruption
    and still raises."""
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    out: list[dict] = []
    for i, line in enumerate(lines):
        try:
            out.append(json.loads(line))
        except json.JSONDecodeError:
            if i == len(lines) - 1:
                continue
            raise
    return out


@dataclass
class ManifestEntry:
    run_id: str
    stage: str
    input_snapshot: str
    status: str
    rows: int


class CheckpointManifest:
    def __init__(self, base_path: str):
        self.base_path = base_path
        self.path = os.path.join(base_path, "_manifest.json")

    def load(self) -> list[ManifestEntry]:
        if not os.path.exists(self.path):
            return []
        # unknown keys are dropped so a manifest written by a NEWER build
        # (extra fields) still resumes on this one
        known = {f.name for f in fields(ManifestEntry)}
        return [
            ManifestEntry(**{k: v for k, v in d.items() if k in known})
            for d in _read_jsonl(self.path)
        ]

    def committed(self, stage: str, input_snapshot: str) -> ManifestEntry | None:
        """The committed entry for (stage, snapshot), or None. Latest line
        wins (a failed attempt followed by a committed rerun)."""
        hit = None
        for e in self.load():
            if e.stage == stage and e.input_snapshot == input_snapshot and e.status == "committed":
                hit = e
        return hit

    def commit(self, entry: ManifestEntry) -> None:
        os.makedirs(self.base_path, exist_ok=True)
        with open(self.path, "a") as f:
            f.write(json.dumps(entry.__dict__) + "\n")


def input_snapshot_id(path: str, rows: int) -> str:
    """Cheap lineage id for a parquet input (Iceberg snapshot-id analog)."""
    return f"{path}@rows={rows}"


@dataclass
class PartitionLineage:
    partition_id: int
    file: str
    rows: int


def partition_lineage(path: str) -> list[PartitionLineage]:
    """Per-partition lineage of a committed parquet sink: one entry per
    written file (task partition), with its exact row count from the parquet
    footer — no data scan. This is the audit trail the north rule asks for:
    which task wrote which rows of which input snapshot."""
    import pyarrow.parquet as pq

    out: list[PartitionLineage] = []
    ds = pq.ParquetDataset(path)
    for i, frag in enumerate(sorted(ds.files)):
        md = pq.ParquetFile(frag).metadata
        out.append(PartitionLineage(i, os.path.basename(frag), md.num_rows))
    return out


class LineageLog:
    """Append-only per-partition lineage log next to the manifest
    (`<base>/_lineage.json`), one line per (run, sink, partition)."""

    def __init__(self, base_path: str):
        self.base_path = base_path
        self.path = os.path.join(base_path, "_lineage.json")

    def record(self, run_id: str, sink: str, input_snapshot: str, parts: list[PartitionLineage]) -> None:
        os.makedirs(self.base_path, exist_ok=True)
        with open(self.path, "a") as f:
            for p in parts:
                f.write(
                    json.dumps(
                        {
                            "run_id": run_id,
                            "stage": sink,
                            "partition_id": p.partition_id,
                            "file": p.file,
                            "rows": p.rows,
                            "input_snapshot": input_snapshot,
                            "status": "committed",
                        }
                    )
                    + "\n"
                )

    def load(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        return _read_jsonl(self.path)
