"""Text analysis operators for training-data pipelines.

All hot-path expressions are JVM builtins (WholeStageCodegen) — no Python.
Ratio metrics are emitted as integer per-mille (floor(ratio*1000)) so DuckDB
oracles compare exactly (no float-sum order sensitivity).

Dialect notes (tested in Java regex + RE2 + Python re):
- token split: `\\s+` on trimmed text, empty -> 0 tokens
- "BPE-ish" token count: occurrences of `\\w+|[^\\w\\s]` (word runs +
  isolated punctuation), the classic pre-tokenizer shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

EN_STOPWORDS = ["the", "a", "an", "and", "of", "to", "in", "is", "it", "for"]

_PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}]"
_BPE_PAT = r"\w+|[^\w\s]"


def tokens(col: Column) -> Column:
    return F.when(F.length(F.trim(col)) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.trim(col), r"\s+")
    )


def stopword_hits(toks: Column) -> Column:
    """Count of tokens whose lowercase form is an EN_STOPWORDS member —
    the shared building block for quality_metrics / gopher_filter (and the
    semantics the Q13/Q67 oracles hardcode)."""
    arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("bigint")


def bpe_token_count(col: Column) -> Column:
    return F.regexp_count(col, F.lit(_BPE_PAT)).cast("bigint")


def _per_mille(num: Column, den: Column) -> Column:
    return F.when(den > 0, F.floor(num * 1000.0 / den)).otherwise(F.lit(0)).cast("bigint")


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / alpha ratios — the standard cheap
    quality signals for corpus filtering (C4/Gopher-style heuristics)."""
    c = F.col(text_col)
    toks = tokens(c)
    n_chars = F.length(c).cast("bigint")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    punct = F.length(c) - F.length(F.regexp_replace(c, _PUNCT_CLASS, ""))
    stop_hits = stopword_hits(toks)
    n_toks = F.size(toks)
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_tokens": n_toks.cast("bigint"),
            "alpha_pm": _per_mille(alpha, n_chars),
            "punct_pm": _per_mille(punct, n_chars),
            "stopword_pm": _per_mille(stop_hits, n_toks),
            "mean_token_len_pm": _per_mille(F.length(F.regexp_replace(c, r"\s+", "")), n_toks),
        }
    )


def lang_guess(col: Column) -> Column:
    """N-gram/stopword heuristic language id.

    Deterministic scoring over marker-token hits per language; 'und' when no
    marker hits. (A real model is out of scope; the operator contract is a
    per-row deterministic classification usable in filters/routes.)
    """
    markers = {
        "en": ["the", "and", "of", "is"],
        "es": ["el", "la", "los", "que", "y"],
        "de": ["der", "die", "das", "und", "ist"],
        "fr": ["le", "la", "les", "et", "est"],
    }
    toks = tokens(F.lower(col))
    scores = []
    for lang, ms in markers.items():
        arr = F.array(*[F.lit(m) for m in ms])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    # max by (hits, lang) — deterministic tiebreak on lang name; struct
    # comparison is lexicographic by field order
    best = F.array_max(F.array(*scores))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercased text
    (the cheap rolling-hash analog; exact-dup key)."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))


def word_bigrams(words: Column) -> Column:
    """Adjacent word pairs as "a b" strings from an array<string>.

    zip_with pads the shorter side with null and concat propagates it, so
    the trailing (last-word, null) slot filters away — no length guard
    needed, and a 0/1-word doc yields an empty array.
    """
    rest = F.slice(words, 2, F.greatest(F.size(words), F.lit(1)))
    pairs = F.zip_with(words, rest, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(pairs, lambda p: p.isNotNull())


def repetition_metrics(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction, duplicate-
    bigram fraction, and the share of bigram mass taken by the single most
    frequent bigram (per-mille ints for cross-engine hash safety).

    Scale shape: word-level stats are per-row array ops (no shuffle); the
    top-bigram count is explode -> two grouped aggregates, both with
    map-side partials keyed by (doc, gram) then (doc) — the same plan at
    10^9 docs, no per-doc quadratic work (an ``array_max(transform(...))``
    formulation would be O(len^2) per doc).
    """
    words = tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(words).alias("_nw"),
        F.size(F.array_distinct(words)).alias("_ndw"),
        word_bigrams(words).alias("_bg"),
    )
    # explode_outer keeps 0/1-word docs (null gram row, zeroed in the aggs)
    ex = base.select(id_col, "_nw", "_ndw", F.explode_outer("_bg").alias("_g"))
    per_gram = ex.groupBy(id_col, "_nw", "_ndw", "_g").agg(F.count(F.lit(1)).alias("_c"))
    st = per_gram.groupBy(id_col, "_nw", "_ndw").agg(
        F.max(F.when(F.col("_g").isNotNull(), F.col("_c")).otherwise(0)).alias("_maxc"),
        F.sum(F.when(F.col("_g").isNotNull(), F.col("_c")).otherwise(0)).alias("_nbg"),
        F.sum(F.when(F.col("_g").isNotNull(), 1).otherwise(0)).alias("_ndbg"),
    )
    return st.select(
        F.col(id_col),
        F.col("_nw").cast("bigint").alias("n_words"),
        _per_mille(F.col("_nw") - F.col("_ndw"), F.col("_nw")).alias("dup_word_pm"),
        _per_mille(F.col("_maxc"), F.col("_nbg")).alias("top_bigram_pm"),
        _per_mille(F.col("_nbg") - F.col("_ndbg"), F.col("_nbg")).alias("dup_bigram_pm"),
    )


# reason bits for gopher_filter (a doc can fail several rules at once; the
# bitmask keeps the full diagnosis in one bigint instead of N boolean columns)
GOPHER_REASONS = {
    "word_count": 1,        # n_words outside [min_words, max_words]
    "mean_word_len": 2,     # mean token length outside the pm band
    "stopwords": 4,         # fewer than min_stopword_hits stopword tokens
    "alpha": 8,             # alphabetic-char share below min_alpha_pm
    "dup_words": 16,        # duplicate-word share above max_dup_word_pm
}


def gopher_filter(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len_pm: int = 3000,
    max_mean_word_len_pm: int = 10_000,
    min_stopword_hits: int = 2,
    min_alpha_pm: int = 600,
    max_dup_word_pm: int = 700,
    keep_input: bool = False,
) -> DataFrame:
    """Gopher-style keep/drop decision: rule bounds composed over per-row
    word statistics, emitting ``keep`` plus a ``reasons`` bitmask
    (GOPHER_REASONS) naming every violated rule.

    Defaults follow Rae et al. 2021 §A1.1 where our signals map directly —
    word count in [50, 100k], mean word length in [3, 10] chars, >= 2
    stopword hits; the alpha-share and dup-word bounds are looser analogs
    of the paper's per-WORD alpha-character and dup-line rules (we measure
    per-char alpha share and word-level repetition), so callers targeting a
    specific corpus should tune those two per corpus (q67 passes
    fixture-ranged thresholds explicitly).

    Every signal is a per-row array/regex expression — the whole filter is
    one map stage (no shuffle, no Python), so at 10^12 docs it rides the
    scan for free and Catalyst pushes any downstream ``keep = 1`` predicate
    into this projection. Thresholds are per-mille ints (floor semantics)
    so the DuckDB oracle agrees bit-for-bit.
    """
    c = F.col(text_col)
    toks = tokens(c)
    nw = F.size(toks)
    ndw = F.size(F.array_distinct(toks))
    mtl_pm = _per_mille(F.length(F.regexp_replace(c, r"\s+", "")), nw)
    stop_hits = stopword_hits(toks)
    alpha_pm = _per_mille(F.length(F.regexp_replace(c, r"[^A-Za-z]", "")), F.length(c))
    dup_pm = _per_mille(nw - ndw, nw)
    reasons = (
        F.when((nw < min_words) | (nw > max_words), GOPHER_REASONS["word_count"]).otherwise(0)
        + F.when(
            (mtl_pm < min_mean_word_len_pm) | (mtl_pm > max_mean_word_len_pm),
            GOPHER_REASONS["mean_word_len"],
        ).otherwise(0)
        + F.when(stop_hits < min_stopword_hits, GOPHER_REASONS["stopwords"]).otherwise(0)
        + F.when(alpha_pm < min_alpha_pm, GOPHER_REASONS["alpha"]).otherwise(0)
        + F.when(dup_pm > max_dup_word_pm, GOPHER_REASONS["dup_words"]).otherwise(0)
    )
    out = [
        nw.cast("bigint").alias("n_words"),
        reasons.cast("bigint").alias("reasons"),
        F.when(reasons == 0, 1).otherwise(0).cast("bigint").alias("keep"),
    ]
    if keep_input:
        # carry the input columns so a downstream keep-filter stays in THIS
        # projection (no self-join of the corpus against its own decision
        # frame — the composition shape q85 depends on)
        return df.select("*", *out)
    return df.select(F.col(id_col), *out)


def tfidf_top_terms(
    df: DataFrame,
    group_col: str,
    id_col: str,
    text_col: str = "text",
    top_k: int = 5,
    n_docs: int | None = None,
) -> DataFrame:
    """Top-``top_k`` terms per group by tf-idf — the standard "what
    characterizes this domain" feature for corpus mixing/selection reports.

    Integer-exact scoring so cross-engine hashes match: idf is
    ``floor(N * 1000 / doc_freq)`` (corpus-global document frequency) and
    ``score = tf_in_group * idf_pm`` — a float ``log`` idf would drift
    between engines; the per-mille reciprocal orders terms the same way for
    ranking purposes. Ties break on term text ascending. The multiply is
    ``try_multiply``: a singleton term in a huge corpus can push
    tf * idf_pm past int64, and under ANSI mode a plain ``*`` would kill
    the job on that one row — overflowed scores become NULL and sort last
    (the repo-wide per-row-junk policy; exactness holds for every score
    that fits int64, which is the entire ranking regime that matters).

    Scale shape: ONE corpus scan+explode feeding a persisted
    (term, doc, group) postings aggregate; tf and doc_freq are then two
    grouped aggs over that vocabulary-x-docs-bounded intermediate (never
    the corpus again), a shuffle join on term, and the per-group top-k via
    row_number over hashpartitioning(group) with partial rank-limit
    pushdown. ``n_docs`` defaults to a ``df.count()`` Spark job executed
    eagerly at plan-build time — pass it explicitly to avoid that action
    (e.g. from parquet footer metadata).
    """
    from pyspark.sql import Window

    if n_docs is None:
        n_docs = df.count()
    toks = df.select(F.col(group_col), F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    # one corpus pass: per-(term, doc) occurrence counts (doc identity kept
    # for doc_freq, counts kept for tf). Persist + eager count: tf and
    # doc_freq are sibling ROOT branches of the final job, and a lazy cache
    # would let both recompute the corpus explode before it fills.
    postings = toks.groupBy("term", id_col, group_col).agg(F.count(F.lit(1)).alias("_c")).persist()
    postings.count()
    tf = postings.groupBy(group_col, "term").agg(F.sum("_c").alias("tf"))
    docfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    scored = tf.join(docfreq, "term").select(
        F.col(group_col),
        "term",
        F.col("tf").cast("bigint").alias("tf"),
        F.col("doc_freq").cast("bigint").alias("doc_freq"),
        F.try_multiply(
            F.col("tf").cast("bigint"),
            F.floor(F.lit(n_docs) * 1000.0 / F.col("doc_freq")).cast("bigint"),
        ).alias("score"),
    )
    w = Window.partitionBy(group_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= top_k)
    )


def vocab_coverage(
    df: DataFrame, id_col: str, text_col: str = "text", top_k: int = 100
) -> DataFrame:
    """Unigram-LM quality proxy, integer-exact: the share of a doc's tokens
    drawn from the corpus's ``top_k`` most frequent tokens (ties broken by
    token text, so the vocabulary is deterministic across engines).

    Two passes over the token postings: (1) global frequency -> top-k via
    TakeOrderedAndProject (no full sort materialized), (2) broadcast
    semi-join of the tiny vocab against the postings + per-doc agg. A real
    log-prob score would float-drift across engines; coverage per-mille is
    hash-stable and orders docs the same way.
    """
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    vocab = (
        toks.groupBy("_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .orderBy(F.desc("_c"), F.asc("_t"))
        .limit(top_k)
        .select("_t")
    )
    hits = (
        toks.join(F.broadcast(vocab), "_t")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_in"))
    )
    totals = df.select(F.col(id_col), token_count(F.col(text_col)).alias("n_tokens"))
    out = totals.join(hits, id_col, "left").na.fill({"_in": 0})
    return out.select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("_in").cast("bigint").alias("in_vocab"),
        _per_mille(F.col("_in"), F.col("n_tokens")).alias("coverage_pm"),
    )


def c4_clean(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    blocklist: tuple[str, ...] = ("lorem ipsum",),
) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2020 §2.2), the classic
    line-level corpus filter:

    - keep only lines that end in terminal punctuation ``[.!?"]``, carry at
      least ``min_words_per_line`` words, and do not mention "javascript";
    - drop the whole page when it contains ``{`` or any (lowercased)
      ``blocklist`` phrase, or when fewer than ``min_sentences`` sentence
      terminals survive in the cleaned text.

    Emits ``n_lines / n_kept_lines / n_sentences / keep / clean_text`` so
    callers can either filter on ``keep`` or audit the rule pressure.

    Scale shape: every signal is a per-row array/regex expression — one
    codegen'd map stage, no shuffle, no Python — so at 10^12 docs the
    filter rides the scan and a downstream ``keep = 1`` predicate is
    pushed into this projection by Catalyst. A NULL page degrades to
    NULL stats with ``keep = 0``, never an error (per-row junk policy).

    Reference relative: the filterprocessor's include/exclude gating
    (processor/filterprocessor/filter_processor.go) decides per-RECORD;
    this is the same decision extended inside the record to per-LINE, the
    shape web-corpus prep needs. Dialect note: the terminal-punct class,
    ``contains`` and ``translate`` behave identically in Java regex /
    DuckDB RE2 on this ASCII surface (oracle q74).
    """
    c = F.col(text_col)
    lines = F.split(c, "\n")
    kept = F.filter(
        lines,
        lambda l: F.rtrim(l).rlike('[.!?"]$')
        & (F.size(tokens(l)) >= min_words_per_line)
        & ~F.contains(F.lower(l), F.lit("javascript")),
    )
    clean = F.array_join(kept, "\n")
    n_sent = (F.length(clean) - F.length(F.translate(clean, ".!?", ""))).cast("bigint")
    page_bad = c.contains("{")
    for phrase in blocklist:
        page_bad = page_bad | F.lower(c).contains(phrase.lower())
    return df.select(
        F.col(id_col),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.size(kept).cast("bigint").alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        F.when(~page_bad & (n_sent >= min_sentences), 1).otherwise(0).cast("bigint").alias("keep"),
        clean.alias("clean_text"),
    )


def remove_boilerplate_lines(
    df: DataFrame, id_col: str, text_col: str = "text", min_docs: int = 2
) -> DataFrame:
    """Cross-corpus boilerplate line removal (the CCNet / RefinedWeb
    pattern): a line whose normalized form appears in at least ``min_docs``
    DISTINCT documents (headers, footers, cookie banners) is deleted from
    every document; remaining lines are reassembled in original order.

    Scale shape: line identity is ``md5(lower(trim(line)))`` so only
    16-byte keys ride the counting shuffle, never text. The boilerplate
    set (count-distinct >= min_docs) is tiny relative to the corpus —
    repeated lines only — so the LEFT ANTI join back onto the exploded
    lines is AQE-broadcastable; reassembly is ONE groupBy with
    ``array_sort(collect_list(struct(pos, line)))`` (bounded by document
    size, no window over the corpus). Documents whose every line was
    boilerplate drop out of the anti-join and are restored with empty
    clean_text by the final left join against the doc spine (which also
    carries NULL-text junk rows through as ``n_lines`` NULL / 0 kept).

    Reference relative: the logdedup/suppression analog of
    operators/hygiene.log_dedup, but CROSS-document and destructive —
    dedup keyed on content across the corpus instead of within a
    conversation. Oracle q75.
    """
    lines = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line")
    )
    keyed = lines.withColumn("_k", F.md5(F.lower(F.trim("_line"))))
    boiler = (
        keyed.groupBy("_k")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("_k")
    )
    rebuilt = (
        keyed.join(boiler, "_k", "left_anti")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("_pos", "_line"))).alias("_ls"))
        .select(
            F.col(id_col),
            F.size("_ls").cast("bigint").alias("n_kept_lines"),
            F.array_join(F.transform("_ls", lambda s: s["_line"]), "\n").alias("clean_text"),
        )
    )
    spine = df.select(
        F.col(id_col), F.size(F.split(F.col(text_col), "\n")).cast("bigint").alias("n_lines")
    )
    out = spine.join(rebuilt, id_col, "left")
    return out.select(
        F.col(id_col),
        F.col("n_lines"),
        F.coalesce("n_kept_lines", F.lit(0)).cast("bigint").alias("n_kept_lines"),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )


def unicode_normalize(col: Column, form: str = "NFC") -> Column:
    """Unicode-normalize a string column (NFC by default) — the encoding
    cleanup every multilingual corpus pipeline runs before hashing or
    deduplicating text: visually-identical strings with different
    codepoint sequences (e + COMBINING ACUTE vs precomposed é) must
    fingerprint identically, or every dedup/boilerplate op upstream
    under-merges.

    There is no JVM builtin for this, so it is the sanctioned slow path:
    a scalar pandas_udf over Arrow batches, `pd.Series.str.normalize`
    (ICU-equivalent NFC/NFD/NFKC/NFKD from Python's unicodedata) — never
    per-row Python. NULLs pass through. DuckDB's nfc_normalize() is the
    NFC oracle twin, so the whole path stays value-checkable cross-engine.
    """
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form: {form!r}")
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):  # pragma: no cover - executes on workers
        return s.str.normalize(form)

    return _norm(col)


def encoding_metrics(col: Column) -> Column:
    """Mojibake/encoding-damage evidence as a pure-JVM struct:
    ``repl_chars`` counts U+FFFD REPLACEMENT CHARACTER occurrences (the
    scar a lossy decode leaves), ``mojibake_marks`` counts the classic
    UTF-8-read-as-Latin-1 lead sequences ("Ã", "â€", "Â"), and ``ctrl``
    counts C0 control characters other than tab/newline/CR. All integers,
    so thresholding composes with gopher_filter/c4_clean and oracles
    compare exactly."""
    return F.struct(
        F.regexp_count(col, F.lit("�")).cast("bigint").alias("repl_chars"),
        F.regexp_count(col, F.lit("Ã|â€|Â")).cast("bigint").alias(
            "mojibake_marks"
        ),
        F.regexp_count(col, F.lit(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")).cast("bigint").alias("ctrl"),
    )


def surprisal_bits(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    reference: DataFrame | None = None,
    ref_text_col: str | None = None,
    vocab_limit: int = 65536,
) -> DataFrame:
    """Unigram-LM surprisal scoring at WHOLE-BIT resolution (the CCNet-style
    perplexity bucket signal, Wenzek et al. 2020, reduced to integers so two
    engines agree bit-for-bit): a token that occurs ``cnt`` times in a
    reference corpus of ``N`` tokens carries
    ``floor(log2(N)) - floor(log2(cnt))`` bits of surprise — computed as
    ``length(bin(N)) - length(bin(cnt))``, pure integer, no libm. A real
    log-prob drifts across engines' float logs; whole bits cost ~1 bit of
    resolution and keep the score hash-stable, the same trade
    :func:`vocab_coverage` makes for coverage.

    ``reference`` is the training corpus (defaults to ``df`` itself — the
    self-trained form); its token frequencies above ``vocab_limit`` ranks
    are dropped (deterministic (count desc, token) order) and out-of-vocab
    tokens score the maximum ``length(bin(N))`` bits. An EMPTY reference
    carries zero information: every token scores 0 bits. Output per doc:
    ``n_tokens``, ``bits_total`` and ``mbits_per_token`` (milli-bits, exact
    integer division; empty docs score 0).

    Physical shape: one groupBy over the reference postings for the vocab
    (TakeOrderedAndProject caps driver transfer at ``vocab_limit``), a
    single-row total aggregate, then one broadcast probe join + per-doc
    partial agg over the scored postings. The corpus is never sorted and
    never crosses a shuffle wider than its posting counts.
    """
    ref = reference if reference is not None else df
    rcol = ref_text_col or text_col
    posts = ref.select(F.explode(tokens(F.col(rcol))).alias("_t"))
    counts = posts.groupBy("_t").agg(F.count(F.lit(1)).alias("_c"))
    n_total = posts.count()
    # empty reference: zero information, zero surprise — every token scores
    # 0 bits (max_bits = 0 zeroes both the vocab and the OOV path), and the
    # empty-corpus self-trained case degrades to an empty all-zero frame
    max_bits = len(bin(n_total)) - 2 if n_total else 0  # length(bin(N)) in SQL
    vocab = (
        counts.orderBy(F.desc("_c"), F.asc("_t"))
        .limit(vocab_limit)
        .select("_t", (F.lit(max_bits) - F.length(F.bin("_c"))).alias("_bits"))
    )
    doc_posts = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_t"))
    scored = (
        doc_posts.join(F.broadcast(vocab), "_t", "left")
        .withColumn("_bits", F.coalesce(F.col("_bits"), F.lit(max_bits)))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_bits").alias("bits_total"),
        )
    )
    spine = df.select(id_col)
    return (
        spine.join(scored, id_col, "left")
        .na.fill({"n_tokens": 0, "bits_total": 0})
        .select(
            F.col(id_col),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.col("bits_total").cast("bigint").alias("bits_total"),
            F.expr("bits_total * 1000 div greatest(n_tokens, 1)")
            .cast("bigint")
            .alias("mbits_per_token"),
        )
    )


def vocab_growth(
    df: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    granularity: str = "day",
) -> DataFrame:
    """Vocabulary growth curve (Heaps' law empirics): per time bucket, how
    many whitespace tokens appear for the FIRST time corpus-wide, plus the
    running vocabulary size — the corpus-health trend a training-data
    pipeline tracks across crawls (a flat curve means the new crawl adds
    volume but no lexical novelty; a spike means a domain/language shift —
    the corpus-level cousin of the per-template drift alarms).

    Physical shape: one explode + partial-aggregated groupBy on the token
    (min bucket per token — first occurrence; duplicate tokens collapse
    map-side, so the shuffle is bounded by distinct tokens per task, never
    token instances). The running sum is a window over the BUCKET-sized
    frame (dozens of rows), explicitly single-partition — harmless because
    corpus size stopped mattering two steps earlier.

    NULL ts and empty/NULL text isolate per-row. Returns
    (bucket, n_new_terms, vocab_size), bucket ascending-dense only where
    new terms exist.
    """
    b = F.date_trunc(granularity, F.col(ts_col))
    tok = (
        df.filter(F.col(ts_col).isNotNull() & (F.length(F.trim(F.col(text_col))) > 0))
        .select(b.alias("bucket"), F.explode(tokens(F.col(text_col))).alias("token"))
    )
    first = tok.groupBy("token").agg(F.min("bucket").alias("bucket"))
    daily = first.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_new_terms")
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "bucket",
        "n_new_terms",
        F.sum("n_new_terms").over(w).cast("bigint").alias("vocab_size"),
    )
