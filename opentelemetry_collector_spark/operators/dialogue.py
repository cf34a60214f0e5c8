"""Turn-pairing operators over conversation transcripts.

The reference collector's closest structural relative is the parent→child
span edge it derives when translating traces (the CHILD_OF reference of
``translator/trace/jaeger/traces_to_jaegerproto.go:274-332``): a causal
"who answered whom" link inside one trace. Over multi-turn agent
transcripts the same link is the unit of *training-data* construction:

- :func:`pair_turns` — for every ``from_role`` turn, attach the first
  ``to_role`` turn that follows it *before the next* ``from_role`` turn.
  With ``("user", "assistant")`` this is prompt→response extraction (the
  SFT pair shape); with ``("assistant", "tool")`` it is tool-call→result
  round-trip matching, including orphan calls and call latency.
- :func:`sft_pack` — the packed-sequence composition: answered pairs
  greedily packed into token-budget sequences with loss-mask offsets.

Scale notes:

- ONE shuffle, on the conversation key — the same
  ``hashpartitioning(conv_id)`` the aggregate/sessionize stages use, so a
  pipeline composing them reuses one partitioning. Both "next matching
  turn" lookups are conditional ``min`` aggregates in a single Window
  node (one sort, no self-join, no per-turn explode); the response's
  payload rides the same window in a struct ordered by its unique leading
  ``turn_idx``.
- The window formulation is deliberate over the join alternative (the
  oracle's shape: candidate join + fence self-join + payload join-back).
  Measured interleaved best-of-3 at 40M turns the window already edges it
  on uniform 40-turn conversations, and on 2000-turn conversations it
  wins ~11x: the join's candidate fan-out is quadratic in conversation
  length (every prompt meets every later to_role turn before the min
  collapses), while the window is one sorted linear pass
  (BENCH/DIALOGUE.md). Hot long conversations are this repo's documented
  skew reality, so the linear formulation is the scale-safe one.
- The per-conversation state is bounded by the conversation's own turn
  count; nothing is corpus-global. A hot conversation costs one window
  partition, never a reducer-wide skew (the frames are running scans,
  not cross products).

Junk policy (repo-wide per-row degradation): NULL ``ts`` on either side
yields NULL ``latency_us`` for that pair only; a NULL response ``text``
keeps the pair (``answered`` is a structural fact) with NULL token count.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.text import token_count

__all__ = ["pair_turns", "sft_pack", "render_conversations", "render_spans", "context_trim"]


def _epoch_us(ts):
    # unix_micros rejects TIMESTAMP_NTZ; cast through the session-UTC zone
    # (the timeseries.py convention — DuckDB's epoch_us agrees exactly).
    return F.unix_micros(F.to_utc_timestamp(ts, "UTC"))


def pair_turns(
    df: DataFrame,
    from_role: str,
    to_role: str,
    keys: Sequence[str] = ("conv_id",),
) -> DataFrame:
    """Pair each ``from_role`` turn with its answering ``to_role`` turn.

    A pair is ``answered`` when a ``to_role`` turn exists after the prompt
    and strictly before the next ``from_role`` turn — the causal window in
    which a response can still be attributed to this prompt. Later
    ``to_role`` turns belong to later prompts and never leak backwards.

    Returns one row per ``from_role`` turn: ``keys..., prompt_idx,
    prompt_text, prompt_tokens, answered, resp_idx, resp_text,
    resp_tokens, resp_tool, latency_us``. Unanswered prompts keep NULL
    response columns (the orphan-call / unanswered-prompt accounting a
    corpus build needs — dropping them would silently bias the yield).
    """
    # "strictly after this turn" expressed as an unbounded-PRECEDING frame
    # over the REVERSED order: Spark keeps a running buffer for preceding
    # frames (O(n) per partition) but recomputes following frames from
    # scratch per row (O(n²) per conversation).
    nxt = (
        Window.partitionBy(*keys)
        .orderBy(F.col("turn_idx").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # struct min orders by the unique leading turn_idx, so this IS "the
    # first following to_role turn" with its payload attached — no join.
    resp = F.min(
        F.when(
            F.col("role") == to_role,
            F.struct(F.col("turn_idx"), F.col("ts"), F.col("text"), F.col("tool")),
        )
    ).over(nxt)
    nxt_from = F.min(F.when(F.col("role") == from_role, F.col("turn_idx"))).over(nxt)

    # one select, not chained withColumn: both mins share the window spec,
    # so CollapseWindow keeps them in a single Window node (one pass).
    paired = df.select("*", resp.alias("_resp"), nxt_from.alias("_nxt_from")).filter(
        F.col("role") == from_role
    )
    answered = F.col("_resp").isNotNull() & (
        F.col("_nxt_from").isNull() | (F.col("_resp.turn_idx") < F.col("_nxt_from"))
    )
    keep = F.when(answered, F.col("_resp"))
    return paired.select(
        *keys,
        F.col("turn_idx").alias("prompt_idx"),
        F.col("text").alias("prompt_text"),
        token_count(F.col("text")).alias("prompt_tokens"),
        answered.alias("answered"),
        keep.getField("turn_idx").alias("resp_idx"),
        keep.getField("text").alias("resp_text"),
        token_count(keep.getField("text")).alias("resp_tokens"),
        keep.getField("tool").alias("resp_tool"),
        (_epoch_us(keep.getField("ts")) - _epoch_us(F.col("ts")))
        .cast("bigint")
        .alias("latency_us"),
    )


def sft_pack(df: DataFrame, budget: int, n_buckets: int | None = None) -> DataFrame:
    """Pack answered prompt→response pairs into token-budget training
    sequences with loss-mask offsets (the SFT packing shape: prompt tokens
    are context-only, response tokens are supervised).

    Composes :func:`pair_turns` ("user", "assistant"), keeps answered
    pairs, and greedily packs them in ``prompt_idx`` order under the
    packing rule of ``operators/packing.pack_sequences`` (new chunk when
    the budget would overflow; an oversized single example still gets its
    own chunk). Per example this emits the offsets a trainer needs to
    mask the prompt span: ``ex_start`` (example's first token in the
    chunk), ``resp_start``/``resp_end`` (the supervised half-open span),
    plus per-chunk ``chunk_tokens`` / ``supervised_tokens`` /
    ``mask_ratio_pm`` accounting.

    The greedy walk, offsets, and per-chunk sums all happen in ONE
    ``applyInPandas`` pass; NULL response token counts pack at zero cost
    (supervising nothing) per the repo's per-row junk policy.

    Grouping granularity — an explicit memory/overhead dial:

    - ``n_buckets=None`` (default): one Arrow group per conversation.
      Memory-safe unconditionally (a group is bounded by the
      conversation's own pair count) but pays per-group Arrow overhead —
      at 1M 16-row conversations that overhead IS the job (measured ~18x
      the compute, BENCH/DIALOGUE.md).
    - ``n_buckets=k``: conversations hash into ``k`` buckets
      (``xxhash64``), one Arrow group per bucket, conversations processed
      back-to-back inside the kernel with identical per-conv resets —
      results are bucketing-invariant. Choose ``k`` so a bucket
      (≈ pairs/k rows) fits executor memory; at 10^12 turns a FIXED k
      does not — size it from the corpus, e.g. rows/256k.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if n_buckets is not None and n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    pairs = (
        pair_turns(df, "user", "assistant")
        .filter(F.col("answered"))
        .select(
            "conv_id",
            "prompt_idx",
            "resp_idx",
            F.coalesce(F.col("prompt_tokens"), F.lit(0)).cast("long").alias("p_tok"),
            F.coalesce(F.col("resp_tokens"), F.lit(0)).cast("long").alias("r_tok"),
        )
    )
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("chunk_id", T.IntegerType()),
            T.StructField("prompt_idx", T.IntegerType()),
            T.StructField("resp_idx", T.IntegerType()),
            T.StructField("ex_start", T.LongType()),
            T.StructField("resp_start", T.LongType()),
            T.StructField("resp_end", T.LongType()),
            T.StructField("chunk_tokens", T.LongType()),
            T.StructField("supervised_tokens", T.LongType()),
            T.StructField("mask_ratio_pm", T.LongType()),
        ]
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # sort by (conv, prompt) so conversations are contiguous; with
        # per-conversation groups the conv key is constant and this is
        # the plain prompt_idx sort
        pdf = pdf.sort_values(["conv_id", "prompt_idx"], kind="mergesort")
        conv = pdf["conv_id"].to_numpy()
        p = pd.to_numeric(pdf["p_tok"], errors="coerce").fillna(0).to_numpy(np.int64)
        r = pd.to_numeric(pdf["r_tok"], errors="coerce").fillna(0).to_numpy(np.int64)
        ex = p + r
        n = len(ex)
        chunks = np.empty(n, dtype=np.int32)
        starts = np.empty(n, dtype=np.int64)
        acc, chunk = 0, 0
        for i in range(n):
            if i > 0 and conv[i] != conv[i - 1]:
                acc, chunk = 0, 0
            t = int(ex[i])
            if acc > 0 and acc + t > budget:
                chunk += 1
                acc = 0
            starts[i] = acc
            acc += t
            chunks[i] = chunk
        # per-(conv, chunk) sums: conversations are contiguous, so a dense
        # group id is the running count of (conv change | chunk change)
        if n:
            new_grp = np.empty(n, dtype=bool)
            new_grp[0] = True
            new_grp[1:] = (conv[1:] != conv[:-1]) | (chunks[1:] != chunks[:-1])
            gid = np.cumsum(new_grp) - 1
            n_grp = int(gid[-1]) + 1
            chunk_tok = np.bincount(gid, weights=ex, minlength=n_grp).astype(np.int64)
            sup_tok = np.bincount(gid, weights=r, minlength=n_grp).astype(np.int64)
            ratio = np.where(chunk_tok > 0, 1000 * sup_tok // np.maximum(chunk_tok, 1), 0)
        else:
            gid = np.empty(0, dtype=np.int64)
            chunk_tok = sup_tok = ratio = np.empty(0, dtype=np.int64)
        return pd.DataFrame(
            {
                "conv_id": conv,
                "chunk_id": chunks,
                "prompt_idx": pdf["prompt_idx"].to_numpy(np.int32),
                "resp_idx": pd.to_numeric(pdf["resp_idx"]).to_numpy(np.int32),
                "ex_start": starts,
                "resp_start": starts + p,
                "resp_end": starts + ex,
                "chunk_tokens": chunk_tok[gid],
                "supervised_tokens": sup_tok[gid],
                "mask_ratio_pm": ratio[gid].astype(np.int64),
            }
        )

    if n_buckets is None:
        return pairs.groupBy("conv_id").applyInPandas(_pack, schema=schema)
    bucketed = pairs.withColumn(
        "_bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets))
    )
    out_schema = T.StructType([T.StructField("_bucket", T.LongType())] + list(schema.fields))

    def _pack_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        out = _pack(pdf.drop(columns=["_bucket"]))
        out.insert(0, "_bucket", pdf["_bucket"].iloc[0] if len(pdf) else 0)
        return out

    return bucketed.groupBy("_bucket").applyInPandas(_pack_bucket, schema=out_schema).drop(
        "_bucket"
    )


# ---------------------------------------------------------------------------
# chat-template rendering (the apply_chat_template step of SFT data prep)
# ---------------------------------------------------------------------------

# One turn renders as  <|role|>text<|end|>  and turns join with "\n".
# Deliberately minimal and delimiter-collision-free against the transcript
# corpus; the shape (role header + payload + end sentinel) is the common
# denominator of published chat templates. NULL role/text render as ''
# (per-row junk degradation — the turn keeps its slot so offsets stay
# aligned with the conversation's true turn count).
_ROLE_OPEN = "<|"
_ROLE_CLOSE = "|>"
_TURN_END = "<|end|>"
_TURN_SEP = "\n"


def _rendered_turn(role, text):
    return F.concat(
        F.lit(_ROLE_OPEN),
        F.coalesce(role, F.lit("")),
        F.lit(_ROLE_CLOSE),
        F.coalesce(text, F.lit("")),
        F.lit(_TURN_END),
    )


def render_conversations(df: DataFrame) -> DataFrame:
    """Render each conversation into ONE training text under the chat
    template — the ``apply_chat_template`` stage every SFT pipeline runs
    between pair/turn mining and tokenization.

    Output: (conv_id, n_turns, rendered, n_chars), one row per
    conversation, turns in ``turn_idx`` order.

    Physical shape: one shuffle on ``conv_id`` (the same partitioning the
    pairing/aggregate stages use); per group the turns are gathered with
    ``collect_list(struct(turn_idx, ...))`` + ``array_sort`` (struct
    comparison leads on the unique ``turn_idx``, so the order is total)
    and the template is applied via ``transform`` + ``array_join`` — all
    JVM expression work, no Python. A conversation's rendered text lives
    on one executor row, so memory is bounded by the longest conversation
    (the same bound the window-based pairing already carries); at
    10^12-turn scale hot conversations cost one group each, never a
    reducer-wide skew."""
    turn = F.struct(F.col("turn_idx"), F.col("role"), F.col("text"))
    rendered = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(turn)),
            lambda t: _rendered_turn(t.role, t.text),
        ),
        _TURN_SEP,
    )
    return (
        df.groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            rendered.alias("rendered"),
        )
        .withColumn("n_chars", F.length("rendered").cast("bigint"))
    )


def render_spans(df: DataFrame, roles: Sequence[str] = ("assistant",)) -> DataFrame:
    """Character-offset loss-mask spans into :func:`render_conversations`'
    text — for every turn whose role is in ``roles``, the half-open
    ``[span_start, span_end)`` 0-based character range its PAYLOAD (the
    text between the role header and the end sentinel) occupies in the
    conversation's rendered string. A trainer masks everything outside
    these spans; ``substring(rendered, span_start+1, span_end-span_start)
    == text`` is the pinned invariant tying the two operators together.

    Closed form, never materializing the rendered string: each turn's
    rendered length is ``len('<|') + len(role) + len('|>') + len(text) +
    len('<|end|>')``, so a turn's start offset is the window prefix-sum of
    the lengths before it plus one separator per preceding turn. ONE
    window over the same ``conv_id`` shuffle — no collect_list, no join
    back to the rendered frame, exact integers throughout (the reason a
    100 TB corpus can compute spans without ever holding a conversation's
    full text in one place)."""
    if not roles:
        raise ValueError("roles must be non-empty")
    role_len = F.length(F.coalesce(F.col("role"), F.lit(""))).cast("bigint")
    text_len = F.length(F.coalesce(F.col("text"), F.lit(""))).cast("bigint")
    head_len = len(_ROLE_OPEN) + len(_ROLE_CLOSE)
    turn_len = role_len + text_len + F.lit(head_len + len(_TURN_END)).cast("bigint")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prior = w.rowsBetween(Window.unboundedPreceding, -1)
    turn_start = (
        F.coalesce(F.sum(turn_len).over(prior), F.lit(0).cast("bigint"))
        + (F.row_number().over(w) - 1) * len(_TURN_SEP)
    )
    span_start = turn_start + F.lit(len(_ROLE_OPEN)).cast("bigint") + role_len + len(
        _ROLE_CLOSE
    )
    return (
        df.select(
            "conv_id",
            "turn_idx",
            "role",
            span_start.alias("span_start"),
            (span_start + text_len).alias("span_end"),
        )
        .filter(F.col("role").isin(*roles))
        .select("conv_id", "turn_idx", "span_start", "span_end")
    )


def context_trim(df: DataFrame, budget: int) -> DataFrame:
    """Context-window truncation: per conversation, keep the LONGEST
    SUFFIX of turns (the most recent ones) whose total rendered length —
    in exactly :func:`render_conversations`' character units, template
    overhead and separators included — fits ``budget``. The trimming
    stage that runs before rendering when conversations exceed the model
    context; truncation is at TURN boundaries (cutting inside a turn is
    the tokenizer's problem, not the corpus builder's).

    Output per conversation: ``n_turns`` (total), ``kept_turns``,
    ``kept_from_idx`` (first kept turn, NULL when nothing fits — even a
    lone last turn can exceed the budget; yield accounting sees it),
    ``kept_chars`` (== ``render_conversations`` n_chars over exactly the
    kept turns — the pinned cross-operator invariant).

    Closed form: suffix sums over a descending-``turn_idx`` window.
    Because every turn costs ≥ the template overhead, suffix totals
    strictly increase walking backwards, so "longest fitting suffix" is
    exactly the rows whose running total ≤ budget — one filterable flag,
    no iteration. ONE ``conv_id`` exchange shared by the window AND the
    final groupBy (same key, Spark reuses the partitioning); nothing is
    rendered, nothing corpus-global."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    role_len = F.length(F.coalesce(F.col("role"), F.lit("")))
    text_len = F.length(F.coalesce(F.col("text"), F.lit("")))
    overhead = len(_ROLE_OPEN) + len(_ROLE_CLOSE) + len(_TURN_END)
    rlen = (role_len + text_len + F.lit(overhead)).cast("bigint")
    w = Window.partitionBy("conv_id").orderBy(F.desc("turn_idx"))
    sfx = F.sum(rlen).over(w.rowsBetween(Window.unboundedPreceding, 0)) + (
        F.row_number().over(w) - 1
    ) * len(_TURN_SEP)
    kept = sfx <= budget
    return (
        df.select(
            "conv_id", "turn_idx", sfx.alias("_sfx"), kept.alias("_kept")
        )
        .groupBy("conv_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_turns"),
            F.coalesce(F.sum(F.col("_kept").cast("bigint")), F.lit(0))
            .cast("bigint")
            .alias("kept_turns"),
            F.min(F.when(F.col("_kept"), F.col("turn_idx"))).alias("kept_from_idx"),
            F.coalesce(F.max(F.when(F.col("_kept"), F.col("_sfx"))), F.lit(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
    )
