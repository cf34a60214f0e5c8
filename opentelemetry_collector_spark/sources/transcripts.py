"""Transcripts sources (the "receiver" side of the pipeline).

The reference's receivers accept pushed OTLP batches
(``receiver/otlpreceiver/otlp.go:44-120``); in batch Spark the scan IS the
receiver. Two sources here:

1. :func:`synthesize` — deterministic seeded generator (FIXTURES.md §1; the
   goldendataset analog, ``internal/goldendataset/``), used by tests & bench.
   Includes a hot-conversation skew block to exercise salting/AQE.
2. :func:`from_events` — a pure, deterministic derivation of the transcripts
   shape from the driver's ``events`` table, with a matching DuckDB SQL CTE
   (:data:`TRANSCRIPTS_SQL`) so every pipeline query gets an independent
   SQL oracle over identical input rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from opentelemetry_collector_spark.schema import TRANSCRIPTS_SCHEMA

# ---------------------------------------------------------------------------
# Derivation from the driver's `events` table (deterministic, oracle-checkable)
# ---------------------------------------------------------------------------

# DuckDB CTE body — MUST stay semantically identical to `from_events` below.
# Cross-engine safety rules: floor() before int casts (DuckDB rounds on
# double→int casts, Spark truncates), row_number ordered by a unique tiebreak
# (ts NULLS FIRST, event_id — Spark's ASC default is NULLS FIRST, DuckDB's is
# NULLS LAST; a NULL-ts row would shift every turn_idx in its conversation
# without the explicit pin — found by the differential fuzz), explicit
# INTEGER cast for turn_idx.
TRANSCRIPTS_SQL = """
SELECT
  'conv-' || lpad(cast(user_id AS varchar), 6, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id) - 1 AS INTEGER) AS turn_idx,
  CASE event_type WHEN 'click' THEN 'user' WHEN 'view' THEN 'user'
                  WHEN 'signup' THEN 'system' WHEN 'purchase' THEN 'assistant'
                  ELSE 'tool' END AS role,
  -- `||`, never concat(): DuckDB's concat SKIPS NULL arguments where
  -- Spark's propagates, so a NULL-value purchase must be NULL text in
  -- both engines, not 'tool_call: calc()' (found by the differential fuzz)
  CASE event_type
    WHEN 'error'    THEN 'error code=' || cast(cast(floor(value) AS bigint) AS varchar)
    WHEN 'purchase' THEN 'tool_call: calc(' || cast(cast(floor(value) AS bigint) AS varchar) || ')'
    WHEN 'click'    THEN 'clicked item ' || cast(event_id % 100 AS varchar)
    WHEN 'view'     THEN 'viewed page ' || cast(event_id % 50 AS varchar)
    ELSE 'user signup'
  END AS text,
  CASE WHEN event_type = 'error' THEN
    CASE cast(event_id % 4 AS integer) WHEN 0 THEN 'search' WHEN 1 THEN 'python'
                                       WHEN 2 THEN 'browser' ELSE 'calc' END
  END AS tool,
  ts
FROM events
"""

# Broadcast-enrichment dimension derived from `customer` (resource attributes
# analog, FIXTURES.md §2). conv_ids with c_custkey % 7 == 0 are intentionally
# absent → exercises the left-join null path (`update` action no-op path).
CONV_META_SQL = """
SELECT
  concat('conv-', lpad(cast(c_custkey AS varchar), 6, '0')) AS conv_id,
  c_mktsegment AS tenant,
  CASE cast(c_custkey % 3 AS integer) WHEN 0 THEN 'web' WHEN 1 THEN 'api' ELSE 'mobile' END AS channel,
  CAST(c_custkey % 3 AS INTEGER) AS priority
FROM customer
WHERE c_custkey % 7 <> 0
"""


def from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive the transcripts table from ``{sf_dir}/events.parquet``.

    Mirrors :data:`TRANSCRIPTS_SQL` exactly (DataFrame API, not spark.sql, so
    the Spark side is an independent implementation from the oracle text).
    """
    from pyspark.sql import Window as W

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ival = F.floor("value").cast("bigint").cast("string")
    return ev.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 6, "0")).alias("conv_id"),
        (F.row_number().over(w) - F.lit(1)).cast("int").alias("turn_idx"),
        F.when(F.col("event_type").isin("click", "view"), F.lit("user"))
        .when(F.col("event_type") == "signup", F.lit("system"))
        .when(F.col("event_type") == "purchase", F.lit("assistant"))
        .otherwise(F.lit("tool"))
        .alias("role"),
        F.when(F.col("event_type") == "error", F.concat(F.lit("error code="), ival))
        .when(F.col("event_type") == "purchase", F.concat(F.lit("tool_call: calc("), ival, F.lit(")")))
        .when(F.col("event_type") == "click", F.concat(F.lit("clicked item "), (F.col("event_id") % 100).cast("string")))
        .when(F.col("event_type") == "view", F.concat(F.lit("viewed page "), (F.col("event_id") % 50).cast("string")))
        .otherwise(F.lit("user signup"))
        .alias("text"),
        F.when(
            F.col("event_type") == "error",
            F.element_at(
                F.array(F.lit("search"), F.lit("python"), F.lit("browser"), F.lit("calc")),
                (F.col("event_id") % 4).cast("int") + 1,
            ),
        ).alias("tool"),
        F.col("ts"),
    )


def conv_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension table mirroring :data:`CONV_META_SQL`."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    return c.filter(F.col("c_custkey") % 7 != 0).select(
        F.concat(F.lit("conv-"), F.lpad(F.col("c_custkey").cast("string"), 6, "0")).alias("conv_id"),
        F.col("c_mktsegment").alias("tenant"),
        F.when(F.col("c_custkey") % 3 == 0, "web")
        .when(F.col("c_custkey") % 3 == 1, "api")
        .otherwise("mobile")
        .alias("channel"),
        (F.col("c_custkey") % 3).cast("int").alias("priority"),
    )


# ---------------------------------------------------------------------------
# Deterministic synthetic generator (goldendataset analog)
# ---------------------------------------------------------------------------

_ROLES = np.array(["user", "assistant", "tool", "system"])
_ROLE_W = np.array([0.50, 0.35, 0.10, 0.05])
_TOOLS = np.array(["search", "python", "browser", "calc"])


def synthesize_pandas(
    n_convs: int = 1000,
    mean_turns: int = 20,
    seed: int = 42,
    hot_frac: float = 0.2,
) -> pd.DataFrame:
    """Seed-stable transcripts per FIXTURES.md §1.

    ``hot_frac`` of all rows concentrate in 2 hot conv_ids (skew block for
    salting/AQE tests). ~30% of assistant turns embed ``tool_call: name(arg)``;
    ~5% of all turns embed ``error code=<int>``; a few empty strings, unicode
    and regex metacharacters; ts monotonic per conv with small cross-conv
    disorder.
    """
    rng = np.random.default_rng(seed)
    turns = rng.poisson(mean_turns, n_convs).clip(1)
    base_total = int(turns.sum())
    hot_rows = int(base_total * hot_frac / (1 - hot_frac))
    if n_convs >= 2 and hot_rows > 2:
        turns[0] = hot_rows // 2
        turns[1] = hot_rows - turns[0]

    conv_idx = np.repeat(np.arange(n_convs), turns)
    total = conv_idx.size
    turn_idx = np.concatenate([np.arange(t) for t in turns]).astype(np.int32)

    role = _ROLES[rng.choice(4, total, p=_ROLE_W)]
    # role-dependent text
    u = rng.random(total)
    tool_pick = _TOOLS[rng.integers(0, 4, total)]
    arg = rng.integers(0, 10_000, total)
    text = np.where(
        (role == "assistant") & (u < 0.30),
        np.char.add(
            np.char.add(np.char.add("calling tool_call: ", tool_pick), "("),
            np.char.add(arg.astype(str), ")"),
        ),
        np.char.add("turn text #", arg.astype(str)),
    )
    err = rng.random(total) < 0.05
    text = np.where(err, np.char.add("error code=", rng.integers(400, 600, total).astype(str)), text)
    text = text.astype(object)
    # sprinkle empties / unicode / regex metacharacters deterministically
    text[::97] = ""
    text[5::131] = "héllo wörld ∑ (.*+?) [a-z]"

    tool = np.where(role == "tool", tool_pick, None)
    # a few malformed tool values for negative parse tests
    mal = (role == "tool") & (np.arange(total) % 53 == 0)
    tool = np.where(mal, "???bad", tool)

    base = np.datetime64("2025-01-01T00:00:00", "us")
    conv_offset = rng.integers(0, 86_400, n_convs)  # small cross-conv disorder
    ts = base + (conv_offset[conv_idx] * 1_000_000 + turn_idx.astype(np.int64) * 1_000_000).astype(
        "timedelta64[us]"
    )

    return pd.DataFrame(
        {
            "conv_id": np.char.add("conv-", np.char.zfill(conv_idx.astype(str), 6)),
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": ts,
        }
    )


def synthesize(spark: SparkSession, n_convs: int = 1000, mean_turns: int = 20, seed: int = 42) -> DataFrame:
    pdf = synthesize_pandas(n_convs=n_convs, mean_turns=mean_turns, seed=seed)
    return spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)


def synthesize_distributed(
    spark: SparkSession,
    n_rows: int,
    turns_per_conv: int = 400,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """Executor-side deterministic transcripts generator (goldendataset analog
    at scale, ``internal/goldendataset/``).

    Built entirely from ``spark.range`` + hash-derived column expressions, so
    generation parallelizes across executors with zero driver-side data — this
    is how a 10^12-turn fixture would be laid down on a real cluster. Same
    text grammar as :func:`synthesize_pandas` (tool_call/error/filler lines),
    fully deterministic in (n_rows, turns_per_conv, seed).
    """
    base = spark.range(0, n_rows, numPartitions=num_partitions)
    conv = (F.col("id") / turns_per_conv).cast("bigint")
    turn = (F.col("id") % turns_per_conv).cast("int")

    def h(salt: int, mod: int):
        # xxhash64 is deterministic and executor-side; pmod keeps it positive
        return F.pmod(F.xxhash64(F.col("id"), F.lit(seed + salt)), F.lit(mod))

    role = (
        F.when(h(1, 100) < 50, "user")
        .when(h(1, 100) < 85, "assistant")
        .when(h(1, 100) < 95, "tool")
        .otherwise("system")
    )
    tool_pick = F.element_at(
        F.array(F.lit("search"), F.lit("python"), F.lit("browser"), F.lit("calc")),
        (h(2, 4) + 1).cast("int"),
    )
    arg = h(3, 10_000).cast("string")
    text = (
        F.when(
            (role == "assistant") & (h(4, 100) < 30),
            F.concat(F.lit("calling tool_call: "), tool_pick, F.lit("("), arg, F.lit(")")),
        )
        .when(h(5, 100) < 5, F.concat(F.lit("error code="), (h(6, 200) + 400).cast("string")))
        .otherwise(F.concat(F.lit("turn text #"), arg))
    )
    ts = F.timestamp_seconds(F.lit(1735689600) + F.pmod(F.xxhash64(conv, F.lit(seed)), F.lit(86_400)) + turn)
    return base.select(
        F.concat(F.lit("conv-"), F.lpad(conv.cast("string"), 9, "0")).alias("conv_id"),
        turn.alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        F.when(role == "tool", tool_pick).alias("tool"),
        ts.alias("ts"),
    )


def synthesize_conv_meta(spark: SparkSession, n_convs: int, seed: int = 42) -> DataFrame:
    """Dimension table matching :func:`synthesize_distributed` conv_ids
    (resource-attributes analog; broadcast side of the enrich join)."""
    base = spark.range(0, n_convs)
    seg = F.element_at(
        F.array(*[F.lit(s) for s in ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")]),
        (F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(5)) + 1).cast("int"),
    )
    return base.select(
        F.concat(F.lit("conv-"), F.lpad(F.col("id").cast("string"), 9, "0")).alias("conv_id"),
        seg.alias("tenant"),
        F.element_at(
            F.array(F.lit("web"), F.lit("api"), F.lit("mobile")),
            ((F.col("id") % 3) + 1).cast("int"),
        ).alias("channel"),
        (F.col("id") % 3).cast("int").alias("priority"),
    )


def metrics_from_transcripts(df: DataFrame) -> DataFrame:
    """Scalar datapoint frame from transcript turns — the metrics-signal
    twin of ``zipkin.spans_from_transcripts`` (SURVEY §1.3: one signal
    family, three projections of the same table). One gauge datapoint per
    turn: ``metric`` = turn_chars, label set = {role, conv}, value =
    text length, plus a cumulative-monotonic ``turns_total`` counter row
    per turn (value 1). Pure shuffle-free projection + one Generate; the
    frame shape matches what the OC/OTLP metrics codecs marshal
    (metric, labels map, double value, ts, kind)."""
    rows = F.array(
        F.struct(
            F.lit("turn_chars").alias("metric"),
            F.lit("gauge").alias("kind"),
            F.coalesce(F.length("text"), F.lit(0)).cast("double").alias("value"),
        ),
        F.struct(
            F.lit("turns_total").alias("metric"),
            F.lit("sum_cumulative_monotonic").alias("kind"),
            F.lit(1.0).alias("value"),
        ),
    )
    return df.select(
        F.explode(rows).alias("_m"),
        F.create_map(
            F.lit("role"), F.col("role"), F.lit("conv"), F.col("conv_id")
        ).alias("labels"),
        F.col("ts").cast("timestamp").alias("ts"),
    ).select(
        F.col("_m.metric").alias("metric"),
        F.col("_m.kind").alias("kind"),
        "labels",
        F.col("_m.value").alias("value"),
        "ts",
    )


def pairwise_cases(axes: dict[str, list]) -> list[dict]:
    """Deterministic greedy all-pairs case generation — the PICT analog
    behind the reference's golden dataset (``internal/goldendataset/
    pict_tracing_input_defs.go`` / pict_input_traces.txt axes): every
    VALUE PAIR across any two axes appears in at least one generated
    case, in O(max |axis_i| * |axis_j|) cases instead of the full cross
    product.

    Algorithm: while uncovered pairs remain, seed a case with the first
    uncovered pair (insertion order — fully deterministic, no RNG), then
    fill the remaining axes greedily by newly-covered-pair count (ties ->
    first value in the axis list). Guaranteed to terminate: every
    iteration covers at least the seeded pair.
    """
    names = list(axes)
    for n, vals in axes.items():
        if not vals:
            raise ValueError(f"pairwise: axis {n!r} has no values")

    def key(n1, v1, n2, v2):
        return (n1, v1, n2, v2) if names.index(n1) < names.index(n2) else (n2, v2, n1, v1)

    import itertools

    uncovered: dict = dict.fromkeys(
        key(a, va, b, vb)
        for a, b in itertools.combinations(names, 2)
        for va in axes[a]
        for vb in axes[b]
    )
    cases: list[dict] = []
    while uncovered:
        a, va, b, vb = next(iter(uncovered))
        case = {a: va, b: vb}
        for n in names:
            if n in case:
                continue
            best_v, best_c = axes[n][0], -1
            for v in axes[n]:
                c = sum(1 for o, ov in case.items() if key(o, ov, n, v) in uncovered)
                if c > best_c:
                    best_v, best_c = v, c
            case[n] = best_v
        for o1, o2 in itertools.combinations(names, 2):
            uncovered.pop(key(o1, case[o1], o2, case[o2]), None)
        cases.append({n: case[n] for n in names})
    return cases
