"""COVERAGE.md is the judge-facing parity map — its per-row query claims
must never drift from the actual driver registry. Each "qNN (oracle...)"
claim requires the query to exist AND carry a DuckDB oracle; "rows-only"
claims must exist WITHOUT an oracle entry."""

from __future__ import annotations

import os
import re

from opentelemetry_collector_spark.plans.queries import ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _claims():
    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    # the Query column cites q-ids as qNN optionally followed by a
    # parenthetical kind: "q51 (oracle: ...)", "q19 (rows-only; ...)"
    for m in re.finditer(r"\bq(\d{2,3})\s*(?:\(([^)]*)\))?", text):
        yield int(m.group(1)), (m.group(2) or "").lower()


def test_every_cited_query_exists():
    known = {int(name[1:].split("_")[0]) for name in QUERIES}
    cited = {num for num, _ in _claims()}
    missing = cited - known
    assert not missing, f"COVERAGE.md cites unknown queries: {sorted(missing)}"


def test_oracle_claims_match_registry():
    with_oracle = {int(name[1:].split("_")[0]) for name in ORACLES}
    for num, kind in _claims():
        if kind.startswith("oracle"):
            assert num in with_oracle, f"q{num} claimed oracle-checked but has no oracle SQL"
        if kind.startswith("rows-only"):
            assert num not in with_oracle, f"q{num} claimed rows-only but HAS an oracle"


def test_every_query_is_documented_in_coverage():
    cited = {num for num, _ in _claims()}
    for name in QUERIES:
        assert int(name[1:].split("_")[0]) in cited, f"{name} missing from COVERAGE.md"
