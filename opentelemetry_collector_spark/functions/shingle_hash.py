"""Arrow-vectorized shingle hashing + MinHash signatures.

Why this exists: char-k-gram shingling expressed with Catalyst higher-order
functions (``transform``/``array_distinct``/``aggregate``) is NOT whole-stage
codegen'd — HOF lambdas evaluate interpreted, per element. Measured on the
sf0.1 documents corpus (5k docs, ~300 chars): 7.1 s to shingle + 4 s to
minhash via HOFs, vs <1 s for this numpy path. The hot loop here is a
polynomial rolling hash over one concatenated byte buffer for the whole
Arrow batch — every step is a C kernel, no per-row Python.

Semantics match :func:`operators.dedup.shingles_of_normalized` (lower/
whitespace-collapse/trim, distinct char k-grams, short docs contribute one
shingle = the whole text, ``greatest(n-k+1, 1)``) — but shingles are
represented by 63-bit mixed hashes instead of strings:

- verify/intersect space: 63-bit => for a ~300x300-shingle pair the
  spurious-intersection probability is ~1e-13; exact-Jaccard counts are
  indistinguishable from string-shingle counts (the q25 oracle parity
  argument).
- signature space: bases reduced mod M = 2^31-1 only inside the universal
  hash h_i = (a_i*b + c_i) mod M so products stay in int64 — identical
  construction to operators/dedup.minhash_signature (same seed => same
  (a_i, c_i) params).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FNV_PRIME = np.uint64(1099511628211)
_MERSENNE_U = np.uint64((1 << 31) - 1)


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — de-linearizes the polynomial hash so byte
    permutations/sums don't collide structurally."""
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _normalize(texts: pd.Series) -> pd.Series:
    """Mirror dedup.normalize_text EXACTLY: Spark evaluates
    regexp_replace(lower(trim(col)), '\\s+', ' ') — trim strips only the
    SPACE char, applies before lower, and Java's default \\s is ASCII-only.
    (Python .strip()/\\s are Unicode-wide — using them here diverged on
    unicode inputs; pinned by the hypothesis parity test.)"""
    return (
        texts.astype("string")
        .fillna("")
        .str.strip(" ")
        .str.lower()
        .str.replace(r"[ \t\n\x0b\f\r]+", " ", regex=True)
    )


def _batch_shingle_hashes(
    texts: pd.Series, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All docs of one Arrow batch at once.

    Returns (doc_idx, hashes) sorted by doc then hash, deduped per doc,
    plus per-doc distinct counts. hashes are uint64 (full width, pre-shift).
    """
    norm = _normalize(texts)
    # UTF-32 code units => k-grams are CHAR k-grams exactly like Spark
    # substr / DuckDB substr (byte k-grams would diverge on non-ASCII)
    blobs = [s.encode("utf-32-le") for s in norm.tolist()]
    lengths = np.array([len(b) // 4 for b in blobs], dtype=np.int64)
    n_docs = len(blobs)
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint32).astype(np.uint64)
    doc_starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))

    long_mask = lengths >= k
    counts = np.where(long_mask, lengths - k + 1, 0)
    total_w = int(counts.sum())

    # window start byte positions for all long docs, batch-vectorized
    if total_w:
        rep_doc = np.repeat(np.arange(n_docs), counts)
        csum = np.cumsum(counts) - counts
        intra = np.arange(total_w) - np.repeat(csum, counts)
        pos = np.repeat(doc_starts, counts) + intra
        h = np.zeros(total_w, dtype=np.uint64)
        for j in range(k):
            h = h * _FNV_PRIME + buf[pos + j]
    else:
        rep_doc = np.empty(0, dtype=np.int64)
        h = np.empty(0, dtype=np.uint64)

    # short docs: one shingle = the whole text (greatest(n-k+1,1) fallback)
    short_ids = np.nonzero(~long_mask)[0]
    if short_ids.size:
        sh_h = np.empty(short_ids.size, dtype=np.uint64)
        for out_i, d in enumerate(short_ids):
            hv = np.uint64(0)
            for byte in buf[doc_starts[d] : doc_starts[d] + lengths[d]]:
                hv = hv * _FNV_PRIME + byte
            sh_h[out_i] = hv
        rep_doc = np.concatenate([rep_doc, short_ids])
        h = np.concatenate([h, sh_h])

    h = _mix64(h)
    # per-doc distinct: stable order by (doc, hash), drop equal neighbors
    order = np.lexsort((h, rep_doc))
    rep_doc, h = rep_doc[order], h[order]
    if h.size:
        keep = np.ones(h.size, dtype=bool)
        keep[1:] = (rep_doc[1:] != rep_doc[:-1]) | (h[1:] != h[:-1])
        rep_doc, h = rep_doc[keep], h[keep]
    distinct_counts = np.bincount(rep_doc, minlength=n_docs)
    return rep_doc, h, distinct_counts


def _signatures(
    h: np.ndarray, group_offsets: np.ndarray, params: list[tuple[int, int]]
) -> np.ndarray:
    """(n_docs, H) MinHash matrix via per-hash vector passes + segment mins."""
    bases = h % _MERSENNE_U  # into the universal-hash field
    out = np.empty((len(group_offsets), len(params)), dtype=np.int64)
    for i, (a, c) in enumerate(params):
        v = (np.uint64(a) * bases + np.uint64(c)) % _MERSENNE_U
        out[:, i] = np.minimum.reduceat(v, group_offsets).astype(np.int64)
    return out


def token_fnv_hashes(text_col):
    """Arrow-vectorized per-token FNV-poly + splitmix64 hashes.

    Drop-in alternative to ``dedup.token_hashes`` (JVM xxhash64) whose
    values an external SQL engine can REPLAY — the hash is the same
    code-point polynomial + splitmix64 finalizer as the shingle kernel
    above, which plans/oracle_gen.py emits as DuckDB integer arithmetic
    (mod-2^64 wrap emulated in HUGEINT). Tokenization contract: SQL trim
    (spaces only), NULL text -> NULL array, empty-after-trim -> empty
    array, then Java ``split("\\s+")`` (limit 0) semantics — a leading
    separator yields a leading "" token, trailing empties ARE DISCARDED.
    NOTE this deliberately DIFFERS from ``operators.text.tokens`` (Spark
    ``split`` limit -1, which KEEPS trailing empties: tokens('abc\\n') ==
    ['abc','']); the q20 simhash oracle replays THIS contract, and
    classify.train_linear_gd filters empties on both sides instead.

    Vectorization: all tokens of the batch flatten into one UTF-32
    code-point buffer; the fold runs max_token_len masked vector steps
    over a (token, step) index — no per-character Python.
    """
    import re

    split_re = re.compile(r"[ \t\n\x0b\f\r]+")

    def _impl(series: pd.Series) -> pd.Series:
        out = []
        for s in series:
            if s is None or (isinstance(s, float) and pd.isna(s)):
                out.append(None)
                continue
            t = str(s).strip(" ")
            if not t:
                out.append([])
                continue
            toks = split_re.split(t)
            while toks and toks[-1] == "":
                toks.pop()
            if not toks:
                out.append([])
                continue
            lens = np.array([len(x) for x in toks], dtype=np.int64)
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            flat = np.frombuffer("".join(toks).encode("utf-32-le"), dtype=np.uint32).astype(
                np.uint64
            )
            h = np.zeros(len(toks), dtype=np.uint64)
            for j in range(int(lens.max())):
                alive = lens > j
                h[alive] = h[alive] * _FNV_PRIME + flat[starts[alive] + j]
            out.append([int(x) for x in _mix64(h).astype(np.int64)])
        return pd.Series(out, dtype=object)

    return F.pandas_udf(_impl, "array<bigint>")(text_col)


def simhash_votes(hashes_col):
    """Vectorized SimHash from a MATERIALIZED array<bigint> token-hash column.

    Value-identical to operators.dedup.simhash_from_token_hashes (same
    xxhash64 inputs, same vote>0 rule, same sign-bit wrap for bit 63) but
    the 64 per-bit vote passes run as numpy reduceat over the whole Arrow
    batch instead of 64 interpreted Catalyst ``aggregate`` walks — measured
    ~10x on the sf0.1 corpus."""
    from pyspark.sql import functions as F

    def _impl(series: pd.Series) -> pd.Series:
        n = len(series)
        if n == 0:
            return pd.Series(np.empty(0, dtype=np.int64))
        # null token arrays hash to 0 in the Catalyst reference (the fold
        # starts at lit(0) and a null vote never sets a bit) — treat null
        # exactly like an empty doc
        arrs, lens = [], []
        for v in series:
            a = np.empty(0, dtype=np.int64) if v is None else np.asarray(v, dtype=np.int64)
            arrs.append(a)
            lens.append(a.size)
        lens_a = np.array(lens, dtype=np.int64)
        starts = np.concatenate(([0], np.cumsum(lens_a)[:-1]))
        allh = (np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)).astype(np.uint64)
        # (total_tokens, 64) vote matrix: +1 where bit set, -1 where not;
        # a sentinel all-zero row makes every reduceat start index valid —
        # clipping starts instead would corrupt the PREVIOUS segment's
        # boundary whenever a trailing doc is empty (pinned by
        # test_simhash_votes_matches_catalyst_reference)
        bits = ((allh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int32)
        votes_all = np.vstack([2 * bits - 1, np.zeros((1, 64), dtype=np.int32)])
        votes = np.add.reduceat(votes_all, starts, axis=0)
        # zero-length mid segments: reduceat returns the row AT the index —
        # mask them to 0 votes
        votes[lens_a == 0] = 0
        packed = (
            (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        ).sum(axis=1, dtype=np.uint64)
        return pd.Series(packed.astype(np.int64))

    return F.pandas_udf(_impl, "bigint")(hashes_col)


def shingle_hash_table(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 32,
    seed: int = 42,
    with_sig: bool = True,
) -> DataFrame:
    """(_id, _sh array<bigint>[, _sig array<bigint>]) — one mapInPandas pass.

    ``_sh``: per-doc distinct 63-bit shingle hashes (sorted).
    ``_sig``: MinHash signature, same params as dedup.minhash_signature.
    """
    from opentelemetry_collector_spark.operators.dedup import _hash_params

    params = _hash_params(num_hashes, seed) if with_sig else []
    id_type = dict(zip(df.columns, [f.dataType.simpleString() for f in df.schema.fields]))[id_col]
    schema = f"_id {id_type}, _sh array<bigint>" + (", _sig array<bigint>" if with_sig else "")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            doc_idx, h, n_per_doc = _batch_shingle_hashes(pdf[text_col], k)
            offsets = np.concatenate(([0], np.cumsum(n_per_doc)[:-1]))
            signed = (h >> np.uint64(1)).astype(np.int64)  # 63-bit, non-negative
            sh_lists = np.split(signed, np.cumsum(n_per_doc)[:-1])
            # NULL text has NULL shingles (the Catalyst reference path:
            # shingles_of_normalized(normalize_text(NULL)) is NULL, so the
            # row never pairs) — the fillna('') in _normalize would
            # otherwise make every NULL doc an exact dup of every '' doc
            null_mask = pdf[text_col].isna().to_numpy()
            shs = [None if null_mask[i] else a.tolist() for i, a in enumerate(sh_lists)]
            out = {"_id": pdf[id_col].to_numpy(), "_sh": shs}
            if with_sig:
                sig = _signatures(h, offsets, params)
                out["_sig"] = [
                    None if null_mask[i] else row.tolist() for i, row in enumerate(sig)
                ]
            yield pd.DataFrame(out)

    out_df = df.select(id_col, text_col).mapInPandas(gen, schema=schema)
    # drop NULL-shingle rows HERE so every consumer (banding, verify,
    # inverted-index join) sees only real documents
    return out_df.filter(F.col("_sh").isNotNull())
