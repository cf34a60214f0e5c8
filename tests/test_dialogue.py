"""Turn-pairing operator (operators/dialogue.pair_turns): prompt→response
extraction and tool-call round-trips, with hand-written goldens covering
answered / unanswered / orphan / NULL-ts / NULL-text paths and a plan
assertion pinning the single-exchange no-join shape."""

from __future__ import annotations

import datetime as dt

import pandas as pd

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from opentelemetry_collector_spark.operators.dialogue import pair_turns

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampNTZType()),
    ]
)


def _ts(sec: int) -> dt.datetime:
    return dt.datetime(2026, 1, 1, 0, 0, sec)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        # c1: the canonical exchange — user answered by the next assistant,
        # a second user turn answered after an intervening system turn.
        ("c1", 0, "user", "hello there", None, _ts(0)),
        ("c1", 1, "assistant", "hi", None, _ts(3)),
        ("c1", 2, "user", "run the job", None, _ts(5)),
        ("c1", 3, "system", "notice", None, _ts(6)),
        ("c1", 4, "assistant", "done now ok", None, _ts(9)),
        # c2: UNANSWERED first prompt (next user turn arrives before any
        # assistant), then an answered one whose response has NULL text.
        ("c2", 0, "user", "first ask", None, _ts(0)),
        ("c2", 1, "user", "second ask", None, _ts(1)),
        ("c2", 2, "assistant", None, None, _ts(4)),
        # c3: trailing orphan prompt (no assistant ever) + NULL prompt ts.
        ("c3", 0, "user", "lost ask", None, None),
        # c4: assistant tool-call answered by a tool turn; a second call
        # orphaned by the next assistant turn arriving first.
        ("c4", 0, "assistant", "tool_call: calc(1)", None, _ts(0)),
        ("c4", 1, "tool", "result 1", "calc", _ts(2)),
        ("c4", 2, "assistant", "tool_call: calc(2)", None, _ts(3)),
        ("c4", 3, "assistant", "giving up", None, _ts(4)),
        ("c4", 4, "tool", "late result", "calc", _ts(9)),
    ]
    return spark.createDataFrame(rows, SCHEMA).cache()


def _by_prompt(df):
    return {(r["conv_id"], r["prompt_idx"]): r.asDict() for r in df.collect()}


def test_prompt_response_golden(frame):
    got = _by_prompt(pair_turns(frame, "user", "assistant"))
    assert set(got) == {("c1", 0), ("c1", 2), ("c2", 0), ("c2", 1), ("c3", 0)}

    a = got[("c1", 0)]
    assert a["answered"] and a["resp_idx"] == 1 and a["resp_text"] == "hi"
    assert a["prompt_tokens"] == 2 and a["resp_tokens"] == 1
    assert a["latency_us"] == 3_000_000

    # intervening system turn does not break the pairing
    b = got[("c1", 2)]
    assert b["answered"] and b["resp_idx"] == 4 and b["resp_tokens"] == 3
    assert b["latency_us"] == 4_000_000

    # next user turn fences the causal window: c2/0 is unanswered even
    # though an assistant turn exists later in the conversation
    u = got[("c2", 0)]
    assert not u["answered"]
    assert u["resp_idx"] is None and u["resp_text"] is None
    assert u["resp_tokens"] is None and u["latency_us"] is None

    # answered with NULL response text: pair kept, token count NULL
    n = got[("c2", 1)]
    assert n["answered"] and n["resp_idx"] == 2
    assert n["resp_text"] is None and n["resp_tokens"] is None

    # orphan prompt at end of conversation
    assert not got[("c3", 0)]["answered"]


def test_tool_roundtrip_golden(frame):
    got = _by_prompt(pair_turns(frame, "assistant", "tool"))
    # every assistant turn is a candidate call
    assert set(got) == {("c1", 1), ("c1", 4), ("c2", 2), ("c4", 0), ("c4", 2), ("c4", 3)}

    ok = got[("c4", 0)]
    assert ok["answered"] and ok["resp_idx"] == 1 and ok["resp_tool"] == "calc"
    assert ok["latency_us"] == 2_000_000

    # the next assistant turn fences the call window: c4/2's would-be
    # result (turn 4) arrives after c4/3, so c4/2 is an orphan and the
    # late result is attributed to c4/3
    assert not got[("c4", 2)]["answered"]
    late = got[("c4", 3)]
    assert late["answered"] and late["resp_idx"] == 4 and late["latency_us"] == 5_000_000


def test_null_ts_latency_null(frame):
    got = _by_prompt(pair_turns(frame, "user", "assistant"))
    # c3/0 has NULL prompt ts and no response at all
    assert got[("c3", 0)]["latency_us"] is None


def test_plan_single_pairing_exchange_no_join(frame):
    plan = pair_turns(frame, "user", "assistant")._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(conv_id" in plan


def test_sft_pack_golden(spark, frame):
    from opentelemetry_collector_spark.operators.dialogue import sft_pack

    # answered user→assistant pairs: c1/0 (2+1=3 tok), c1/2 (3+3=6 tok),
    # c2/1 (2+NULL→0=2 tok). budget=5 splits c1 into two chunks.
    rows = {(r["conv_id"], r["prompt_idx"]): r.asDict() for r in sft_pack(frame, budget=5).collect()}
    assert set(rows) == {("c1", 0), ("c1", 2), ("c2", 1)}

    a = rows[("c1", 0)]
    assert a["chunk_id"] == 0 and a["ex_start"] == 0
    assert a["resp_start"] == 2 and a["resp_end"] == 3
    assert a["chunk_tokens"] == 3 and a["supervised_tokens"] == 1
    assert a["mask_ratio_pm"] == 333

    # 3+6 > 5 → new chunk; the oversized 6-token example gets its own chunk
    b = rows[("c1", 2)]
    assert b["chunk_id"] == 1 and b["ex_start"] == 0
    assert b["resp_start"] == 3 and b["resp_end"] == 6
    assert b["chunk_tokens"] == 6 and b["supervised_tokens"] == 3
    assert b["mask_ratio_pm"] == 500

    # NULL response text supervises nothing: span is empty at the prompt end
    c = rows[("c2", 1)]
    assert c["chunk_id"] == 0 and c["resp_start"] == 2 and c["resp_end"] == 2
    assert c["supervised_tokens"] == 0 and c["mask_ratio_pm"] == 0


def test_sft_pack_single_shuffle(spark, frame):
    from opentelemetry_collector_spark.operators.dialogue import sft_pack

    plan = sft_pack(frame, budget=5)._jdf.queryExecution().executedPlan().toString()
    # the pairing window and the pack kernel share one conv_id exchange
    assert plan.count("Exchange") == 1
    assert "Join" not in plan


def test_sft_pack_rejects_bad_budget(frame):
    from opentelemetry_collector_spark.operators.dialogue import sft_pack

    with pytest.raises(ValueError):
        sft_pack(frame, budget=0)


def test_sft_pack_bucketed_matches_per_conv(spark, frame):
    from opentelemetry_collector_spark.operators.dialogue import sft_pack

    base = sft_pack(frame, budget=5)
    for k in (1, 2, 7):
        b = sft_pack(frame, budget=5, n_buckets=k)
        assert base.exceptAll(b).union(b.exceptAll(base)).count() == 0, k
    with pytest.raises(ValueError):
        sft_pack(frame, budget=5, n_buckets=0)


def test_pair_turns_stream_parity(spark, frame, tmp_path):
    """Streaming twin (applyInPandasWithState): on an in-order multi-batch
    stream the emitted pairs equal batch pair_turns row-for-row, except
    prompts still pending at stream end (no fence, no answer, no timeout)."""
    from opentelemetry_collector_spark.streaming.stream import (
        pair_turns_stream,
        read_transcript_stream,
    )

    landing = str(tmp_path / "landing")
    # split each conversation across two files at turn 2 — state (the
    # pending prompt) must carry across micro-batches
    frame.filter(F.col("turn_idx") < 2).coalesce(1).write.mode("append").parquet(landing)
    frame.filter(F.col("turn_idx") >= 2).coalesce(1).write.mode("append").parquet(landing)

    stream = pair_turns_stream(
        read_transcript_stream(spark, landing, max_files_per_trigger=1), "user", "assistant"
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("pairs_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["conv_id"], r["prompt_idx"]): r.asDict()
        for r in spark.sql("select * from pairs_out").collect()
    }
    batch = _by_prompt(pair_turns(frame, "user", "assistant"))
    # c3/0 is the only prompt with no later turn at all: still pending
    pending = {("c3", 0)}
    assert set(got) == set(batch) - pending
    for k, b in batch.items():
        if k in pending:
            continue
        s = got[k]
        for col in ("prompt_text", "prompt_tokens", "answered", "resp_idx",
                    "resp_text", "resp_tokens", "latency_us"):
            assert s[col] == b[col], (k, col, s[col], b[col])


def test_pair_stream_timeout_emits_pending_unanswered():
    """The expiry invocation emits the pending prompt as unanswered and
    DROPS the conversation's state (no resurrection)."""
    from opentelemetry_collector_spark.streaming.stream import _pair_state_fn

    class FakeState:
        hasTimedOut = True
        exists = True
        get = (5, 1_000_000, "still waiting", 9)

        def __init__(self):
            self.removed = False

        def remove(self):
            self.removed = True

    st = FakeState()
    out = list(_pair_state_fn("user", "assistant", 60)(("c9",), iter([]), st))
    assert st.removed
    assert len(out) == 1 and len(out[0]) == 1
    row = out[0].iloc[0]
    assert row["prompt_idx"] == 5 and not row["answered"]
    assert row["prompt_tokens"] == 2 and row["resp_idx"] is None or row["resp_idx"] is pd.NA


# ---------------------------------------------------------------------------
# property-based: Spark operators vs pure-Python reference models
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_HSETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_turn_st = st.lists(
    st.tuples(
        st.integers(0, 30),  # turn_idx (unique per conv)
        st.sampled_from(["user", "assistant", "tool", "system"]),
        st.one_of(st.none(), st.sampled_from(["", "a", "one two", "  x  y "])),
    ),
    min_size=1,
    max_size=14,
    unique_by=lambda r: r[0],
)


def _ref_pairs(turns, from_role="user", to_role="assistant"):
    """Pure-Python model of pair_turns for one conversation."""
    turns = sorted(turns)
    out = []
    for i, (idx, role, text) in enumerate(turns):
        if role != from_role:
            continue
        fence = next((j for j, r, _ in turns[i + 1:] if r == from_role), None)
        resp = next((t for t in turns[i + 1:] if t[1] == to_role), None)
        answered = resp is not None and (fence is None or resp[0] < fence)
        out.append((idx, text, answered, resp[0] if answered else None,
                    resp[2] if answered else None))
    return out


def _ref_tok(text):
    if text is None:
        return None
    s = text.strip()
    return len(s.split()) if s else 0


@given(convs=st.lists(_turn_st, min_size=1, max_size=3))
@settings(**_HSETTINGS)
def test_pair_turns_matches_python_model(spark, convs):
    import datetime as dt

    rows = [
        (f"h{c}", idx, role, text, None, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=idx))
        for c, turns in enumerate(convs)
        for idx, role, text in turns
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {
        (r["conv_id"], r["prompt_idx"]): r
        for r in pair_turns(df, "user", "assistant").collect()
    }
    expect = {}
    for c, turns in enumerate(convs):
        for idx, text, answered, r_idx, r_text in _ref_pairs(turns):
            expect[(f"h{c}", idx)] = (text, answered, r_idx, r_text)
    assert set(got) == set(expect)
    for k, (text, answered, r_idx, r_text) in expect.items():
        g = got[k]
        assert g["prompt_text"] == text and g["answered"] == answered
        assert g["resp_idx"] == r_idx and g["resp_text"] == r_text
        assert g["prompt_tokens"] == _ref_tok(text)
        assert g["resp_tokens"] == (_ref_tok(r_text) if answered else None)
        # answered responses are exclusive and ordered: each belongs to
        # exactly one prompt (the fence guarantees it)
    resp_ids = [
        (k[0], g["resp_idx"]) for k, g in got.items() if g["answered"]
    ]
    assert len(resp_ids) == len(set(resp_ids))


@given(convs=st.lists(_turn_st, min_size=1, max_size=3), budget=st.integers(1, 8))
@settings(**_HSETTINGS)
def test_sft_pack_invariants(spark, convs, budget):
    import datetime as dt

    from opentelemetry_collector_spark.operators.dialogue import sft_pack

    rows = [
        (f"h{c}", idx, role, text, None, dt.datetime(2026, 1, 1) + dt.timedelta(seconds=idx))
        for c, turns in enumerate(convs)
        for idx, role, text in turns
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    packed = sft_pack(df, budget=budget).collect()
    by_chunk = {}
    for r in packed:
        by_chunk.setdefault((r["conv_id"], r["chunk_id"]), []).append(r)
    for (_, _), rs in by_chunk.items():
        rs = sorted(rs, key=lambda r: r["prompt_idx"])
        total = sum(r["resp_end"] - r["ex_start"] for r in rs)
        # chunk accounting is internally consistent
        assert all(r["chunk_tokens"] == total for r in rs)
        assert all(0 <= r["supervised_tokens"] <= r["chunk_tokens"] for r in rs)
        # budget respected unless a single oversized example owns the chunk
        if total > budget:
            assert len(rs) == 1
        # offsets are contiguous: each example starts where the previous ended
        pos = 0
        for r in rs:
            assert r["ex_start"] == pos
            assert r["ex_start"] <= r["resp_start"] <= r["resp_end"]
            pos = r["resp_end"]


# ---------------------------------------------------------------------------
# chat-template rendering + loss-mask spans
# ---------------------------------------------------------------------------


def test_render_conversations_golden(spark):
    from opentelemetry_collector_spark.operators.dialogue import render_conversations

    rows = [
        # out-of-order arrival: rendering must sort by turn_idx
        ("r1", 1, "assistant", "héllo wörld", None, _ts(1)),
        ("r1", 0, "user", "hi", None, _ts(0)),
        # NULL text and NULL role render as '' but keep their slots
        ("r2", 0, "user", None, None, _ts(0)),
        ("r2", 1, None, "orphan", None, _ts(1)),
        # single-turn conversation: no separator
        ("r3", 0, "system", "", None, None),
    ]
    out = {
        r["conv_id"]: r.asDict()
        for r in render_conversations(spark.createDataFrame(rows, SCHEMA)).collect()
    }
    assert out["r1"]["rendered"] == "<|user|>hi<|end|>\n<|assistant|>héllo wörld<|end|>"
    assert out["r1"]["n_turns"] == 2
    # length counts code points (matches DuckDB length over ö/é)
    assert out["r1"]["n_chars"] == len(out["r1"]["rendered"])
    assert out["r2"]["rendered"] == "<|user|><|end|>\n<||>orphan<|end|>"
    assert out["r3"]["rendered"] == "<|system|><|end|>"
    assert out["r3"]["n_turns"] == 1


def test_render_spans_substring_invariant(spark):
    """The operators' shared contract: for every selected turn,
    rendered[span_start:span_end] == its text — across NULLs, unicode,
    empty texts, and multi-conversation frames."""
    from opentelemetry_collector_spark.operators.dialogue import (
        render_conversations,
        render_spans,
    )

    rows = [
        ("c1", 0, "user", "hello there", None, _ts(0)),
        ("c1", 1, "assistant", "hi", None, _ts(3)),
        ("c1", 2, "user", "run the job", None, _ts(5)),
        ("c1", 3, "assistant", "done — ok ✓", None, _ts(9)),
        ("c2", 0, "assistant", "", None, _ts(0)),
        ("c2", 1, "assistant", None, None, _ts(1)),
        ("c2", 2, "assistant", "tail", None, _ts(2)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    rendered = {r["conv_id"]: r["rendered"] for r in render_conversations(df).collect()}
    spans = render_spans(df, roles=("assistant",)).collect()
    texts = {(r[0], r[1]): r[3] for r in rows}
    assert len(spans) == 5
    for r in spans:
        want = texts[(r["conv_id"], r["turn_idx"])] or ""
        got = rendered[r["conv_id"]][r["span_start"] : r["span_end"]]
        assert got == want, (r, got, want)
    # roles filter + validation
    from opentelemetry_collector_spark.operators.dialogue import render_spans as rs

    assert rs(df, roles=("user",)).count() == 2
    with pytest.raises(ValueError):
        rs(df, roles=())


def test_render_plans_single_exchange_no_python(spark):
    from opentelemetry_collector_spark.operators.dialogue import (
        render_conversations,
        render_spans,
    )

    df = spark.createDataFrame([("c1", 0, "user", "x", None, _ts(0))], SCHEMA)
    for frame in (render_conversations(df), render_spans(df)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 1, plan
        assert "Python" not in plan and "BroadcastNestedLoop" not in plan, plan


def test_context_trim_invariants_vs_render(spark):
    """kept_chars must equal render_conversations' n_chars over EXACTLY
    the kept suffix, the suffix must be maximal (one more turn would
    exceed the budget), and a conversation whose last turn alone exceeds
    the budget reports kept_turns=0 with NULL kept_from_idx."""
    from opentelemetry_collector_spark.operators.dialogue import (
        context_trim,
        render_conversations,
    )

    rows = [
        # c1: all turns fit comfortably
        ("c1", 0, "user", "hi", None, _ts(0)),
        ("c1", 1, "assistant", "hello", None, _ts(1)),
        # c2: long early turns, short tail — only a suffix fits
        ("c2", 0, "user", "x" * 80, None, _ts(0)),
        ("c2", 1, "assistant", "y" * 80, None, _ts(1)),
        ("c2", 2, "user", "short", None, _ts(2)),
        ("c2", 3, "assistant", "tail", None, _ts(3)),
        # c3: even the last turn alone exceeds the budget
        ("c3", 0, "user", "z" * 200, None, _ts(0)),
        # c4: NULL text turn costs only the template overhead
        ("c4", 0, None, None, None, _ts(0)),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    budget = 100
    out = {r["conv_id"]: r.asDict() for r in context_trim(df, budget).collect()}

    assert out["c1"] == {
        "conv_id": "c1", "n_turns": 2, "kept_turns": 2,
        "kept_from_idx": 0, "kept_chars": len("<|user|>hi<|end|>\n<|assistant|>hello<|end|>"),
    }
    assert out["c3"]["kept_turns"] == 0
    assert out["c3"]["kept_from_idx"] is None and out["c3"]["kept_chars"] == 0
    assert out["c4"]["kept_turns"] == 1 and out["c4"]["kept_chars"] == len("<||><|end|>")

    # cross-operator invariant + maximality on every conversation
    for conv, row in out.items():
        if row["kept_turns"] == 0:
            continue
        kept = df.filter(
            (F.col("conv_id") == conv) & (F.col("turn_idx") >= row["kept_from_idx"])
        )
        n_chars = render_conversations(kept).collect()[0]["n_chars"]
        assert n_chars == row["kept_chars"] <= budget, (conv, n_chars, row)
        if row["kept_turns"] < row["n_turns"]:
            wider = df.filter(
                (F.col("conv_id") == conv)
                & (F.col("turn_idx") >= row["kept_from_idx"] - 1)
            )
            assert render_conversations(wider).collect()[0]["n_chars"] > budget

    with pytest.raises(ValueError):
        context_trim(df, 0)


def test_context_trim_single_exchange(spark):
    from opentelemetry_collector_spark.operators.dialogue import context_trim

    df = spark.createDataFrame([("c1", 0, "user", "x", None, _ts(0))], SCHEMA)
    plan = context_trim(df, 100)._jdf.queryExecution().executedPlan().toString()
    # the groupBy reuses the window's conv_id partitioning: ONE exchange
    assert plan.count("Exchange") == 1, plan
    assert "Python" not in plan and "Join" not in plan


def test_render_stats_stream_parity(spark, tmp_path):
    """Streaming render accounting: after the stream drains across
    micro-batches that split conversations mid-stream AND deliver turns
    out of order, the latest (n_turns, n_chars) snapshot per conversation
    equals batch render_conversations exactly (the order-independent
    decomposition: sum of turn template lengths + separators)."""
    from opentelemetry_collector_spark.operators.dialogue import render_conversations
    from opentelemetry_collector_spark.streaming.stream import render_stats_stream

    rows = [
        ("c1", 1, "assistant", "héllo wörld", None, _ts(1)),   # out of order
        ("c1", 0, "user", "hi", None, _ts(0)),
        ("c2", 0, "user", None, None, _ts(0)),                 # NULL text
        ("c2", 1, None, "orphan", None, _ts(1)),               # NULL role
        ("c3", 0, "system", "", None, None),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    landing = str(tmp_path / "landing")
    # split c1 across two files so its state must carry between batches
    df.filter(F.col("turn_idx") == 1).coalesce(1).write.mode("append").parquet(landing)
    df.filter(F.col("turn_idx") != 1).coalesce(1).write.mode("append").parquet(landing)
    q = (
        render_stats_stream(
            spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(landing)
        )
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("render_stats_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    snaps = spark.sql("select * from render_stats_out").collect()
    latest = {}
    for r in snaps:
        if r["conv_id"] not in latest or r["n_turns"] > latest[r["conv_id"]]["n_turns"]:
            latest[r["conv_id"]] = r.asDict()
    batch = {r["conv_id"]: r.asDict() for r in render_conversations(df).collect()}
    assert set(latest) == set(batch)
    for conv, want in batch.items():
        assert latest[conv]["n_turns"] == want["n_turns"], conv
        assert latest[conv]["n_chars"] == want["n_chars"], conv
    # c1 was emitted twice (split batches) with monotone n_turns
    c1 = sorted(r["n_turns"] for r in snaps if r["conv_id"] == "c1")
    assert c1 == [1, 2]
