"""Preference-learning data preparation over paired transcripts.

The fourth training-data shape over conversation transcripts, completing
the family started by :mod:`.dialogue` (SFT pairs / packing) and
:mod:`.similarity` (contrastive negatives): *preference* construction for
reward-model / DPO-style training. The reference collector has no direct
analog — its nearest structural relative is the probabilistic sampler's
deterministic keep/drop verdict per item
(``processor/samplingprocessor/probabilisticsampler.go:69-79``): here the
verdict is comparative (which of two responses to the same prompt is
better) instead of absolute, and the "sampler key" is the prompt text.

Three operators:

- :func:`preference_pairs` — implicit preference mining: among all
  answered responses to the *same prompt text* across conversations, emit
  one (chosen, rejected) pair per prompt — the best- and worst-scoring
  responses under a deterministic integer reward. Prompts with a single
  candidate or an all-equal reward field are uninformative and dropped
  (``margin > 0`` is part of the contract: a zero-margin pair would teach
  a preference model nothing and bias DPO loss toward ties).
- :func:`best_of_n` — rejection-sampling distillation: per prompt,
  deterministically "sample" at most ``n`` candidates (md5 order — the
  repo-wide portable shuffle key, same idiom as ``sample.py``), then keep
  the best-rewarded one. The two-stage shape (bounded sample THEN argmax)
  is the batch form of best-of-n inference distillation.
- :func:`win_rates` — the pairwise-outcome ladder: fold (chosen,
  rejected) pairs into per-competitor win/loss totals and an exact
  integer win-rate (the input a Bradley–Terry / Elo fit consumes; the
  exact win-rate ranking IS the one-iteration BT estimate under a flat
  prior). Competitors come from a broadcast dimension lookup keyed on
  conv_id (channel/tenant — the resource-attributes analog).

Scale notes:

- ``preference_pairs`` is ONE partial-aggregated groupBy on the prompt
  key: chosen and rejected travel as ``max(struct)`` / ``min(struct)``
  with the unique ``(conv_id, prompt_idx)`` tiebreak embedded, so a hot
  prompt (the same question asked 10^9 times) collapses map-side to one
  struct per task — never a reducer-wide skew, never a self-join.
- ``best_of_n``'s rank filter is a WindowGroupLimit (per-task local
  top-n before the shuffle); the follow-up argmax groupBy reuses the
  window's ``hashpartitioning(prompt)`` — the whole operator is one
  exchange.
- ``win_rates`` joins the pair frame to a broadcast dimension twice and
  reduces to a competitor-sized frame; the final rank window sorts only
  that tiny frame (3-10 rows at any real cardinality), never the pairs.

Junk policy (repo-wide per-row degradation): NULL prompt text or NULL
response text disqualifies the CANDIDATE, not the job (an untrainable
example); a conv_id absent from the dimension disqualifies that side's
PAIR in ``win_rates`` (no competitor to credit), mirroring the q05
broadcast-enrich null path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.text import _per_mille, token_count

__all__ = [
    "response_reward",
    "preference_pairs",
    "preference_state",
    "merge_preference_states",
    "pairs_from_state",
    "best_of_n",
    "win_rates",
]


def response_reward(text: Column) -> Column:
    """Default deterministic integer reward for a response text.

    ``1000 * whitespace_tokens + alpha_per_mille`` — the naive
    "longer and more alphabetic is better" heuristic every preference
    pipeline starts from before a learned reward model exists. Exact
    bigint in both engines (the per-mille arithmetic is the proven
    ``quality_metrics`` form); any scoring Column — including a
    model-based one — plugs into the operators in its place.
    """
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return (
        token_count(text) * F.lit(1000) + _per_mille(alpha, F.length(text))
    ).cast("bigint")


def _candidates(pairs: DataFrame, prompt_col: str, reward: Column | None) -> DataFrame:
    """Answered pairs with non-null prompt and response, reward attached."""
    r = reward if reward is not None else response_reward(F.col("resp_text"))
    return pairs.filter(
        F.col("answered")
        & F.col("resp_text").isNotNull()
        & F.col(prompt_col).isNotNull()
    ).select(
        F.col(prompt_col).alias("prompt_text"),
        "conv_id",
        "prompt_idx",
        "resp_idx",
        "resp_text",
        r.cast("bigint").alias("reward"),
    )


# struct field order IS the comparison order: reward first, then the unique
# (conv_id, prompt_idx) tiebreak — payload fields after it can never
# influence min/max (the repo's min(struct) transport idiom).
def _ranked_struct() -> Column:
    return F.struct(
        F.col("reward"),
        F.col("conv_id"),
        F.col("prompt_idx"),
        F.col("resp_idx"),
        F.col("resp_text"),
    )


def preference_pairs(
    pairs: DataFrame,
    prompt_col: str = "prompt_text",
    reward: Column | None = None,
) -> DataFrame:
    """Mine (chosen, rejected) preference pairs from answered prompt pairs.

    ``pairs`` is :func:`.dialogue.pair_turns` output (or any frame with
    ``conv_id, prompt_idx, answered, resp_idx, resp_text`` and the prompt
    column). Returns one row per informative prompt: ``prompt_text,
    n_cands, chosen_conv, chosen_idx, chosen_resp_idx, chosen_text,
    chosen_reward, rejected_conv, rejected_idx, rejected_resp_idx,
    rejected_text, rejected_reward, margin`` with ``margin > 0``
    guaranteed. Ties on reward break by (conv_id, prompt_idx) — larger
    wins the chosen side, smaller the rejected side — so the output is
    deterministic under any partitioning.
    """
    return pairs_from_state(preference_state(pairs, prompt_col, reward))


def best_of_n(
    pairs: DataFrame,
    n: int,
    prompt_col: str = "prompt_text",
    reward: Column | None = None,
) -> DataFrame:
    """Best-of-n rejection sampling per prompt.

    Stage 1 bounds each prompt's candidate pool to ``n`` in deterministic
    md5 order (portable across engines and partitionings — NOT reward
    order: sampling must be blind to the score or the "n candidates"
    framing is a lie and every pool becomes the global argmax). Stage 2
    keeps the best-rewarded sampled candidate. Returns ``prompt_text,
    n_sampled, best_conv, best_idx, best_resp_idx, best_text,
    best_reward, reward_sum`` (``reward_sum`` over the sampled pool — the
    denominator a distillation-yield report needs).
    """
    if n < 1:
        raise ValueError(f"best_of_n requires n >= 1, got {n}")
    cand = _candidates(pairs, prompt_col, reward)
    # md5 over the unique candidate identity; trailing (conv_id, prompt_idx)
    # pins the order even under a (theoretical) digest collision.
    order = F.md5(
        F.concat(
            F.col("prompt_text"),
            F.lit(":"),
            F.col("conv_id"),
            F.lit(":"),
            F.col("prompt_idx").cast("string"),
        )
    )
    w = Window.partitionBy("prompt_text").orderBy(order, "conv_id", "prompt_idx")
    sampled = (
        cand.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n)
        .drop("_rk")
    )
    return (
        sampled.select("prompt_text", _ranked_struct().alias("_s"), "reward")
        .groupBy("prompt_text")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
            F.max("_s").alias("_b"),
            F.sum("reward").cast("bigint").alias("reward_sum"),
        )
        .select(
            "prompt_text",
            "n_sampled",
            F.col("_b.conv_id").alias("best_conv"),
            F.col("_b.prompt_idx").alias("best_idx"),
            F.col("_b.resp_idx").alias("best_resp_idx"),
            F.col("_b.resp_text").alias("best_text"),
            F.col("_b.reward").alias("best_reward"),
            "reward_sum",
        )
    )


def preference_state(
    pairs: DataFrame,
    prompt_col: str = "prompt_text",
    reward: Column | None = None,
) -> DataFrame:
    """The MERGEABLE form of :func:`preference_pairs`: one row per prompt
    (including zero-margin and single-candidate prompts) holding the
    running aggregate — candidate count plus the chosen/rejected structs.
    This is the artifact an INCREMENTAL corpus build persists: the
    aggregate algebra is (sum, max, min), so yesterday's state merges
    with today's increment via :func:`merge_preference_states` without
    rescanning yesterday's corpus, and the merged state is
    bit-identical to a full rebuild (the q207 contract).
    """
    return (
        _candidates(pairs, prompt_col, reward)
        .select("prompt_text", _ranked_struct().alias("_s"))
        .groupBy("prompt_text")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_cands"),
            F.max("_s").alias("_ch"),
            F.min("_s").alias("_rj"),
        )
    )


def merge_preference_states(*states: DataFrame) -> DataFrame:
    """Fold any number of :func:`preference_state` frames into one — the
    same (sum, max, min) algebra over the union, so merge order and
    partitioning are irrelevant. One partial-aggregated groupBy over
    state-sized frames (prompt cardinality, never candidate cardinality:
    the increment pattern a 10^12-turn daily build needs)."""
    if not states:
        raise ValueError("merge_preference_states needs at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.unionByName(s)
    return u.groupBy("prompt_text").agg(
        F.sum("n_cands").cast("bigint").alias("n_cands"),
        F.max("_ch").alias("_ch"),
        F.min("_rj").alias("_rj"),
    )


def pairs_from_state(state: DataFrame) -> DataFrame:
    """Finalize a (possibly merged) state into the :func:`preference_pairs`
    output contract: informative prompts only (margin > 0), flattened."""
    margin = (F.col("_ch.reward") - F.col("_rj.reward")).cast("bigint")
    return state.filter(margin > 0).select(
        "prompt_text",
        "n_cands",
        F.col("_ch.conv_id").alias("chosen_conv"),
        F.col("_ch.prompt_idx").alias("chosen_idx"),
        F.col("_ch.resp_idx").alias("chosen_resp_idx"),
        F.col("_ch.resp_text").alias("chosen_text"),
        F.col("_ch.reward").alias("chosen_reward"),
        F.col("_rj.conv_id").alias("rejected_conv"),
        F.col("_rj.prompt_idx").alias("rejected_idx"),
        F.col("_rj.resp_idx").alias("rejected_resp_idx"),
        F.col("_rj.resp_text").alias("rejected_text"),
        F.col("_rj.reward").alias("rejected_reward"),
        margin.alias("margin"),
    )


def win_rates(
    prefs: DataFrame,
    dim: DataFrame,
    dim_key: str = "conv_id",
    dim_col: str = "channel",
) -> DataFrame:
    """Pairwise win/loss ladder over a conversation dimension.

    Each preference pair credits the chosen conversation's ``dim_col``
    value with a win over the rejected conversation's — when both sides
    resolve in ``dim`` and the values differ (same-competitor pairs carry
    no between-competitor information). Returns one row per competitor:
    ``competitor, wins, losses, bouts, win_rate_ppm, rank`` — exact
    integer ppm (truncating div), rank by (win_rate_ppm DESC, competitor)
    over the competitor-sized frame only.

    Precondition: ``dim`` is unique per ``dim_key`` (the broadcast
    enrichment-dimension contract, same as the q05 join) — a duplicate
    key would multiply that conversation's bouts.
    """
    d_win = F.broadcast(
        dim.select(F.col(dim_key).alias("_wk"), F.col(dim_col).alias("_win"))
    )
    d_lose = F.broadcast(
        dim.select(F.col(dim_key).alias("_lk"), F.col(dim_col).alias("_lose"))
    )
    m = (
        prefs.select("chosen_conv", "rejected_conv")
        .join(d_win, F.col("chosen_conv") == F.col("_wk"), "inner")
        .join(d_lose, F.col("rejected_conv") == F.col("_lk"), "inner")
        .filter(F.col("_win") != F.col("_lose"))
        .select("_win", "_lose")
    )
    wins = m.groupBy(F.col("_win").alias("competitor")).agg(
        F.count(F.lit(1)).cast("bigint").alias("wins")
    )
    losses = m.groupBy(F.col("_lose").alias("competitor")).agg(
        F.count(F.lit(1)).cast("bigint").alias("losses")
    )
    lad = (
        wins.join(losses, "competitor", "full_outer")
        .select(
            "competitor",
            F.coalesce("wins", F.lit(0)).cast("bigint").alias("wins"),
            F.coalesce("losses", F.lit(0)).cast("bigint").alias("losses"),
        )
        .withColumn("bouts", (F.col("wins") + F.col("losses")).cast("bigint"))
        .withColumn(
            "win_rate_ppm",
            F.expr("wins * 1000000 div (wins + losses)").cast("bigint"),
        )
    )
    rk = Window.orderBy(F.col("win_rate_ppm").desc(), "competitor")
    return lad.withColumn("rank", F.row_number().over(rk).cast("int"))
