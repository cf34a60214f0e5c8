"""Distributed BPE-merge tokenizer training (Sennrich et al. 2016).

The tokenizer-fitting piece of the training-data suite: learn the top-N
byte-pair merges from a corpus, then segment text with them. The reference
relative is the precompiled-pattern discipline of the grok engine
(``processor/processorhelper/attraction.go:139-212`` compiles once, applies
everywhere) — here the *learned* artifact (the merge list) is the thing
compiled once and applied corpus-wide.

Scale shape (the part that matters at 100 TB):

- The corpus is scanned ONCE, into a (word, freq) table — the standard
  scalable BPE trainer operates on word counts, never on raw text again.
  That table is vocab-sized (millions of rows, not billions), so the
  per-merge iteration cost is independent of corpus size.
- Each merge round is one partial-aggregated pair-count over the cached
  word table plus a driver-side top-1 (the learned parameter — same
  driver-collect shape as `similarity.train_centroids`' per-iteration
  partial sums).
- Merge application is a chain of JVM ``replace`` calls over a delimited
  symbol string — whole-stage codegen, no Python anywhere.

Symbol representation: every symbol is wrapped in ``<`` ``>`` sentinels
(``low`` -> ``<l><o><w><_>`` with ``_`` as the end-of-word marker; words are
``[a-z]+`` tokens so the sentinels can't collide). A merge of (l, r) is then
``replace(sym, '<l><r>', '<lr>')`` — left-to-right non-overlapping
replacement, which is exactly BPE's merge-application rule, and behaves
identically in Spark's ``replace``, DuckDB's ``replace`` and Python's
``str.replace`` (the property the oracle and the pandas parity test pin).
"""

from __future__ import annotations

import pandas as pd  # module-level so pandas-UDF type hints resolve

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

WORD_PAT = "[a-z]+"
END_MARK = "_"


def _wrap_word(word: Column) -> Column:
    """``low`` -> ``<l><o><w><_>``."""
    chars = F.regexp_extract_all(word, F.lit("."), 0)
    return F.concat(
        F.lit("<"),
        F.array_join(F.concat(chars, F.array(F.lit(END_MARK))), "><"),
        F.lit(">"),
    )


def _symbols(sym: Column) -> Column:
    """Unwrap ``<a><b>`` back to ``[a, b]``."""
    return F.split(F.regexp_replace(sym, "^<|>$", ""), "><")


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus scan -> (word, freq). Everything after this is vocab-sized."""
    words = df.select(
        F.explode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(WORD_PAT), 0)).alias(
            "word"
        )
    )
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def bpe_train(
    df: DataFrame, text_col: str = "text", n_merges: int = 8
) -> list[tuple[int, str, str, int]]:
    """Learn ``n_merges`` merges; returns [(rank, lhs, rhs, pair_count), ...].

    Tie-break is total and engine-portable: (count DESC, lhs ASC, rhs ASC)
    over ASCII ``[a-z_]`` strings. Stops early if the corpus runs dry
    (fewer distinct pairs than requested merges). The word table is cached;
    round k's plan carries k codegen'd replaces over that cache — linear
    per-round work on a vocab-sized frame, zero further corpus scans.
    """
    base = (
        word_freqs(df, text_col)
        .select(_wrap_word(F.col("word")).alias("sym"), "freq")
        .persist()
    )
    wf = base
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, n_merges + 1):
        arr = _symbols(F.col("sym"))
        pair = F.zip_with(
            F.slice(arr, 1, F.size(arr) - 1),
            F.slice(arr, 2, F.size(arr) - 1),
            lambda left, right: F.struct(left.alias("lhs"), right.alias("rhs")),
        )
        best = (
            wf.select(F.explode(pair).alias("p"), "freq")
            .groupBy("p.lhs", "p.rhs")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        lhs, rhs, cnt = best[0]["lhs"], best[0]["rhs"], int(best[0]["cnt"])
        merges.append((rank, lhs, rhs, cnt))
        wf = wf.withColumn(
            "sym",
            F.replace(F.col("sym"), F.lit(f"<{lhs}><{rhs}>"), F.lit(f"<{lhs}{rhs}>")),
        )
    base.unpersist()
    return merges


def merges_df(spark: SparkSession, merges: list[tuple[int, str, str, int]]) -> DataFrame:
    return spark.createDataFrame(merges, "merge_rank int, lhs string, rhs string, cnt bigint")


# Above this merge count the compiled replace chain is refused: each merge
# adds a nested StringReplace node, so a production 30k–50k-merge vocabulary
# would build a pathological Catalyst expression tree (codegen blowup /
# 64KB method limits), while the Arrow kernel's cost per merge is a plain
# str.replace in a memoized per-word loop. 100 is far above any merge count
# the JVM chain was measured at (BENCH/BPE_APPLY.md: 16) and far below
# where tree construction itself gets slow.
MAX_JVM_MERGES = 100


def _guard_merge_count(merges, fn_name: str) -> None:
    if len(merges) > MAX_JVM_MERGES:
        raise ValueError(
            f"{fn_name}: {len(merges)} merges would compile into a "
            f"{len(merges)}-deep nested replace chain (Catalyst expression-"
            f"tree blowup). Above {MAX_JVM_MERGES} merges use the Arrow "
            "kernel bpe_token_counts_kernel / bpe_token_counts (measured "
            "4.26x faster even at 16 merges, BENCH/BPE_APPLY.md) — its "
            "per-merge cost is a memoized str.replace, independent of "
            "expression-tree size."
        )


def _apply_merges(sym: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Chain the learned replaces in rank order — the compiled artifact."""
    for _, lhs, rhs, _cnt in merges:
        sym = F.replace(sym, F.lit(f"<{lhs}><{rhs}>"), F.lit(f"<{lhs}{rhs}>"))
    return sym


def bpe_segment(col: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Segment text into trained-BPE tokens: array<string> of merged symbols
    (end-of-word marker attached, e.g. ``lo``, ``w_``). Pure JVM: tokenize,
    wrap, replay the merge chain, unwrap — one codegen projection.
    Refuses merge lists beyond MAX_JVM_MERGES (see _guard_merge_count)."""
    _guard_merge_count(merges, "bpe_segment")
    words = F.regexp_extract_all(F.lower(col), F.lit(WORD_PAT), 0)
    segmented = F.transform(words, lambda w: _symbols(_apply_merges(_wrap_word(w), merges)))
    return F.flatten(segmented)


def bpe_token_count_trained(col: Column, merges: list[tuple[int, str, str, int]]) -> Column:
    """Token count under the trained merges — the budget currency a packing
    stage (`packing.pack_sequences`) would consume after tokenizer fitting.

    Counting path runs the replace chain over ONE string per document
    (wrapped words joined by ``|`` — a character that can never appear in
    a symbol, so merges cannot fire across word boundaries), then counts
    ``<`` markers. Measured 9.63 s vs 11.686 s per-word ``transform``
    (1.21x) at 4M docs / 16 merges (BENCH/BPE_APPLY.md, bpe_scale.json)
    and byte-identical; :func:`bpe_segment` keeps the per-word form
    because it must return per-word arrays. Refuses merge lists beyond
    MAX_JVM_MERGES — use :func:`bpe_token_counts` /
    :func:`bpe_token_counts_kernel` for production-size vocabularies."""
    _guard_merge_count(merges, "bpe_token_count_trained")
    words = F.regexp_extract_all(F.lower(col), F.lit(WORD_PAT), 0)
    doc = F.array_join(F.transform(words, _wrap_word), "|")
    doc = _apply_merges(doc, merges)
    return (F.length(doc) - F.length(F.replace(doc, F.lit("<"), F.lit("")))).cast(
        "bigint"
    )


def bpe_token_counts_kernel(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Arrow-kernel alternative to :func:`bpe_token_count_trained` with
    per-batch WORD MEMOIZATION — the Zipf-shaped win the JVM expression
    cannot express (Catalyst evaluates the replace chain per word
    instance; natural text repeats its hot words constantly, so a
    per-batch dict collapses most instances to a lookup).

    Measured interleaved best-of-3 at 4M x 12-word docs over a 4096-word
    Zipf vocabulary, 16 merges (BENCH/BPE_APPLY.md, bpe_scale.json):
    kernel 2.26 s vs 9.63 s whole-doc JVM chain (4.26x) — the repo's
    measured-and-justified bar for an Arrow kernel (the minhash-verify
    precedent). The JVM column stays the default at SMALL merge counts:
    it composes as an expression, costs no Python workers, and wins
    whenever counts feed further codegen. Use the kernel when
    tokenization IS the job — and always above MAX_JVM_MERGES, where the
    JVM chain is refused outright (:func:`bpe_token_counts` routes
    automatically). Identical results (row-for-row pytest + in-study
    assertion)."""
    import re

    from pyspark.sql.functions import pandas_udf

    reps = [(f"<{l}><{r}>", f"<{l}{r}>") for _, l, r, _ in merges]
    word_re = re.compile(WORD_PAT)

    @pandas_udf("bigint")
    def _count(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def wtok(w: str) -> int:
            v = cache.get(w)
            if v is None:
                sym = "<" + "><".join(list(w) + [END_MARK]) + ">"
                for a, b in reps:
                    sym = sym.replace(a, b)
                v = sym.count("><") + 1
                cache[w] = v
            return v

        out = []
        for t in texts:
            if t is None:
                out.append(None)
            else:
                out.append(sum(wtok(w) for w in word_re.findall(t.lower())))
        return pd.Series(out, dtype="object")

    return df.withColumn(out_col, _count(F.col(text_col)))


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Merge-count-aware front door for trained-BPE token counting.

    At small merge counts (≤ MAX_JVM_MERGES) this compiles the pure-JVM
    replace-chain column (:func:`bpe_token_count_trained`) — no Python
    workers, codegen-fusable with surrounding projections. Beyond that,
    the chain's nested-expression tree would blow up Catalyst (a real
    vocabulary carries 30k–50k merges), so the call routes to the
    memoized Arrow kernel (:func:`bpe_token_counts_kernel`), whose
    per-merge cost is a flat ``str.replace`` and which measured 4.26x
    faster even at 16 merges (BENCH/BPE_APPLY.md). Both paths are
    row-for-row identical (pytest-pinned)."""
    if len(merges) > MAX_JVM_MERGES:
        return bpe_token_counts_kernel(df, merges, text_col=text_col, out_col=out_col)
    return df.withColumn(out_col, bpe_token_count_trained(F.col(text_col), merges))
