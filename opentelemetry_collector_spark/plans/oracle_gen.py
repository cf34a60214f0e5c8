"""Generated DuckDB oracle SQL for the hash-heavy operators.

The MinHash/SimHash kernels (functions/shingle_hash.py) hash with an
FNV-style code-point polynomial + splitmix64 finalizer — pure mod-2^64
integer arithmetic, so an independent SQL engine can REPLAY every hash
bit-for-bit and the driver's oracle gate can value-check the LSH pair
operators instead of falling back to rows-only checks. DuckDB has no
wrapping 64-bit multiply (integer overflow errors), so the generators
below emit the standard split-multiply emulation in HUGEINT:

    (a * k) mod 2^64
      = ((a mod 2^32) * k  +  (((a div 2^32) * k) mod 2^32) * 2^32) mod 2^64

with every intermediate < 2^97, comfortably inside HUGEINT. xor/shift
steps run in UBIGINT (DuckDB's xor()/>> are 64-bit clean), multiplies in
HUGEINT, and the chain is laid out as one list_transform CTE per mix step
so the quadratic-looking expressions stay linear in SQL size.

The Python constants inlined into the SQL (_hash_params minhash planes,
band layout, chunk offsets) come from the SAME functions the Spark
operators call — a seed change regenerates both sides in lockstep.

These strings are driver-contract oracles (plans/queries.py ORACLES);
tools/check_oracles.py and the round driver execute them verbatim.
"""

from __future__ import annotations

M64 = 1 << 64
M32 = 1 << 32
MERSENNE = (1 << 31) - 1
FNV_PRIME = 1099511628211
MIX_C1 = 0xFF51AFD7ED558CCD
MIX_C2 = 0xC4CEB9FE1A85EC53

#: one splitmix64 xor-shift step over a UBIGINT-castable element named h
_XORSHIFT = "xor(CAST(h AS UBIGINT), CAST(h AS UBIGINT) >> 33)"


def _wrapmul(expr: str, k: int) -> str:
    """(expr * k) mod 2^64, expr a HUGEINT in [0, 2^64)."""
    return (
        f"((({expr}) % {M32}) * {k} + "
        f"(((({expr}) // {M32}) * {k}) % {M32}) * {M32}) % {M64}"
    )


def _mix_chain(src_cte: str, extra_cols: str = "") -> str:
    """CTE chain applying splitmix64 to a HUGEINT list column ``hs`` of
    ``src_cte``; the final CTE is named ``mx`` with UBIGINT ``hs``.
    ``extra_cols`` rides along unchanged (e.g. ``doc_id, ``)."""
    return f"""
x1 AS (SELECT {extra_cols}list_transform(hs, h -> {_XORSHIFT}) AS hs FROM {src_cte}),
x2 AS (SELECT {extra_cols}list_transform(hs, h -> {_wrapmul('CAST(h AS HUGEINT)', MIX_C1)}) AS hs FROM x1),
x3 AS (SELECT {extra_cols}list_transform(hs, h -> {_XORSHIFT}) AS hs FROM x2),
x4 AS (SELECT {extra_cols}list_transform(hs, h -> {_wrapmul('CAST(h AS HUGEINT)', MIX_C2)}) AS hs FROM x3),
mx AS (SELECT {extra_cols}list_transform(hs, h -> {_XORSHIFT}) AS hs FROM x4)"""


def gen_q19_minhash_sql(
    threshold: float = 0.5, k: int = 5, num_hashes: int = 32, bands: int = 8, seed: int = 42
) -> str:
    """Replay of dedup.minhash_lsh_pairs over the documents table.

    Banding note: Spark buckets on xxhash64 of each signature slice purely
    to compress the join key; bucket equality == slice equality except for
    2^-64 hash collisions (whose spurious candidates the exact-Jaccard
    verify then discards), so the replay bands on the slice VALUES.
    """
    from opentelemetry_collector_spark.operators.dedup import _hash_params

    params = _hash_params(num_hashes, seed)
    r = num_hashes // bands
    sig_exprs = ",\n    ".join(
        f"list_min(list_transform(bases, b -> ({a} * b + {c}) % {MERSENNE}))" for a, c in params
    )
    band_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, {b} AS band, "
        + ", ".join(f"sig[{b * r + j + 1}] AS s{j}" for j in range(r))
        + " FROM sig"
        for b in range(bands)
    )
    band_eq = " AND ".join(f"a.s{j} = b.s{j}" for j in range(r))
    return rf"""
WITH d AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS s
           FROM documents WHERE text IS NOT NULL),
g AS (SELECT doc_id,
        list_distinct([substr(s, i, {k}) for i in range(1, greatest(length(s) - {k - 1}, 1) + 1)]) AS gs
      FROM d),
p0 AS (SELECT doc_id, list_transform(gs, t -> list_reduce(
         list_prepend(CAST(0 AS HUGEINT),
           [CAST(unicode(t[i]) AS HUGEINT) for i in range(1, length(t) + 1)]),
         (acc, c) -> ({_wrapmul('acc', FNV_PRIME)} + c) % {M64})) AS hs FROM g),{_mix_chain('p0', 'doc_id, ')},
tbl AS (SELECT doc_id, list_distinct(hs) AS hs FROM mx),
sh AS (SELECT doc_id,
         list_transform(hs, h -> CAST(h >> 1 AS BIGINT)) AS sh,
         list_transform(hs, h -> CAST(h % {MERSENNE} AS BIGINT)) AS bases
       FROM tbl),
sig AS (SELECT doc_id, [
    {sig_exprs}
  ] AS sig FROM sh),
bnd AS ({band_selects}),
cand AS (SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         FROM bnd a JOIN bnd b
           ON a.band = b.band AND {band_eq} AND a.doc_id < b.doc_id),
v AS (SELECT a_id, b_id,
        len(list_intersect(sa.sh, sb.sh)) AS i,
        len(sa.sh) AS na, len(sb.sh) AS nb
      FROM cand JOIN sh sa ON sa.doc_id = a_id
                JOIN sh sb ON sb.doc_id = b_id)
SELECT a_id, b_id, CAST(floor((i / (na + nb - i)) * 1000) AS BIGINT) AS jaccard_milli
FROM v WHERE i / (na + nb - i) >= {threshold}
"""


def gen_q20_simhash_sql(max_hamming: int = 8, bits: int = 64) -> str:
    """Replay of dedup.simhash_neardup_pairs(hasher="fnv").

    Tokenization mirrors operators.text.tokens / shingle_hash.
    token_fnv_hashes: SQL trim (spaces only), empty -> no tokens, Java
    split("\\s+") keeps a leading "" and drops the (single, because the
    separator regex is greedy) trailing "". Votes, chunk blocking, and the
    bit_count verify replay the exact integer rules.
    """
    n_chunks = max_hamming + 1
    base_w, extra = divmod(bits, n_chunks)
    offsets, widths, off = [], [], 0
    for i in range(n_chunks):
        w_i = base_w + (1 if i < extra else 0)
        offsets.append(off)
        widths.append(w_i)
        off += w_i
    # bit weights as precomputed literals: DuckDB's << evaluates in BIGINT
    # and errors on 1 << 63 regardless of the operand's declared type
    vote_terms = " +\n      ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {i}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN CAST({1 << i} AS UBIGINT) ELSE CAST(0 AS UBIGINT) END)"
        for i in range(bits)
    )
    chunk_selects = "\n  UNION ALL ".join(
        f"SELECT doc_id, hu, {i} AS chunk, "
        f"(hu >> {offsets[i]}) & {(1 << widths[i]) - 1} AS key FROM sim"
        for i in range(n_chunks)
    )
    return rf"""
WITH d AS (SELECT doc_id,
             CASE WHEN text IS NULL OR length(trim(text)) = 0
                  THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
           FROM documents),
tk AS (SELECT doc_id,
         CASE WHEN len(ts) > 0 AND ts[-1] = '' THEN ts[1:len(ts) - 1] ELSE ts END AS ts
       FROM d),
p0 AS (SELECT doc_id, list_transform(ts, t -> list_reduce(
         list_prepend(CAST(0 AS HUGEINT),
           [CAST(unicode(t[i]) AS HUGEINT) for i in range(1, length(t) + 1)]),
         (acc, c) -> ({_wrapmul('acc', FNV_PRIME)} + c) % {M64})) AS hs FROM tk),{_mix_chain('p0', 'doc_id, ')},
sim AS (SELECT doc_id,
      {vote_terms}
    AS hu FROM mx),
chunks AS ({chunk_selects}),
pairs AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
            bit_count(xor(a.hu, b.hu)) AS hamming
          FROM chunks a JOIN chunks b
            ON a.chunk = b.chunk AND a.key = b.key AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.hu, b.hu)) <= {max_hamming})
SELECT DISTINCT a_id, b_id, CAST(hamming AS INTEGER) AS hamming FROM pairs
"""


def gen_q21_lsh_sql(
    dim: int = 64,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 8,
    seed: int = 42,
    query_pred: str = "vec_id < 5",
) -> str:
    """Replay of similarity.lsh_topk: the integer hyperplane matrices are
    inlined as VALUES rows (the SAME hyperplane_planes() output the Spark
    kernel multiplies with), buckets rebuilt from exact integer plane
    dots, candidates re-ranked with the float cosine whose cross-engine
    parity q16 already established (sequential fold in both engines).
    Zero-norm vectors never score (cosine NULL contract) and NULL
    embeddings never bucket, so both drop from e up front."""
    from opentelemetry_collector_spark.operators.similarity import (
        _PLANE_VEC_SCALE,
        hyperplane_planes,
    )

    rows = []
    for t in range(n_tables):
        P = hyperplane_planes(dim, n_planes, seed + t)
        for p in range(n_planes):
            w = ", ".join(str(int(x)) for x in P[:, p])
            rows.append(f"({t}, {p}, [{w}])")
    values = ",\n    ".join(rows)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * {_PLANE_VEC_SCALE}.0) AS BIGINT)) AS vq
           FROM embeddings
           WHERE embedding IS NOT NULL
             AND list_dot_product(CAST(embedding AS DOUBLE[]),
                                  CAST(embedding AS DOUBLE[])) > 0),
planes AS (SELECT * FROM (VALUES
    {values}
  ) AS pl(t, p, w)),
dots AS (SELECT e.vec_id, planes.t, planes.p,
           list_sum([e.vq[i] * planes.w[i] for i in range(1, {dim} + 1)]) AS d
         FROM e CROSS JOIN planes),
sig AS (SELECT vec_id, t,
          sum(CASE WHEN d > 0 THEN CAST(1 AS BIGINT) << p ELSE 0 END) AS bucket
        FROM dots GROUP BY vec_id, t),
q AS (SELECT * FROM sig WHERE {query_pred}),
cand AS (SELECT DISTINCT q.vec_id AS qid, c.vec_id AS nid
         FROM q JOIN sig c ON c.t = q.t AND c.bucket = q.bucket AND c.vec_id <> q.vec_id),
s AS (SELECT cand.qid, cand.nid, list_cosine_similarity(eq.v, ec.v) AS c
      FROM cand JOIN e eq ON eq.vec_id = cand.qid
                JOIN e ec ON ec.vec_id = cand.nid),
r AS (SELECT qid, nid, c,
        row_number() OVER (PARTITION BY qid ORDER BY c DESC, nid) AS rk
      FROM s)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rk AS INTEGER) AS rank,
       CAST(floor(c * 1000) AS BIGINT) AS cos_milli
FROM r WHERE rk <= {k}
"""


def _pq_common(books_path: str, scale: str, dsub: int, query_pred: str) -> str:
    """Shared CTE prefix for the PQ oracles: quantized non-degenerate
    vectors, the persisted codebook, integer encode scores and per-subspace
    argmax codes (argmax tie -> lowest code, numpy argmin/argmax's
    first-hit rule), and the query LUT."""
    return f"""e AS (SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * {scale}) AS BIGINT)) AS vq
           FROM embeddings WHERE embedding IS NOT NULL),
nz AS (SELECT vec_id, vq FROM e WHERE list_sum([x * x for x in vq]) > 0),
bk AS (SELECT m, code, j, w FROM read_parquet('{books_path}')),
es AS (SELECT nz.vec_id, bk.m, bk.code,
         sum(nz.vq[bk.m * {dsub} + bk.j + 1] * bk.w) - 0.5 * sum(bk.w * bk.w) AS sc
       FROM nz CROSS JOIN bk
       GROUP BY nz.vec_id, bk.m, bk.code),
en AS (SELECT vec_id, m, code FROM (
         SELECT vec_id, m, code,
                row_number() OVER (PARTITION BY vec_id, m ORDER BY sc DESC, code) AS rk
         FROM es) WHERE rk = 1),
qv AS (SELECT vec_id, vq FROM nz WHERE {query_pred}),
qlut AS (SELECT qv.vec_id AS qid, bk.m, bk.code,
           sum(qv.vq[bk.m * {dsub} + bk.j + 1] * bk.w) AS lut
         FROM qv CROSS JOIN bk
         GROUP BY qv.vec_id, bk.m, bk.code)"""


def gen_q63_pq_sql(
    books_path: str = "/tmp/otelcol_oracle/q63_books.parquet",
    k: int = 10,
    dsub: int = 8,
    scale: str = "65536.0",
    query_pred: str = "vec_id < 5",
) -> str:
    """Replay of similarity.pq_topk(normalize=False) over quantized
    vectors: encode (argmax of dot - ||codeword||^2/2), LUT scoring, and
    the (score DESC, nid) top-k merge are all exact-integer arithmetic over
    the PERSISTED codebook, so the oracle re-derives codes and scores from
    the same matrix the Spark kernels multiplied with. Training (float
    k-means) shapes that matrix but stays outside the checked contract."""
    return f"""
WITH {_pq_common(books_path, scale, dsub, query_pred)},
s AS (SELECT ql.qid, en.vec_id AS nid, sum(ql.lut) AS score
      FROM en JOIN qlut ql ON ql.m = en.m AND ql.code = en.code
      WHERE en.vec_id <> ql.qid
      GROUP BY ql.qid, en.vec_id),
r AS (SELECT qid, nid, score,
        row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rk
      FROM s)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rk AS INTEGER) AS rank,
       CAST(score * 1000 AS BIGINT) AS approx_milli
FROM r WHERE rk <= {k}
"""


def gen_q64_ivfpq_sql(
    books_path: str = "/tmp/otelcol_oracle/q64_books.parquet",
    cents_path: str = "/tmp/otelcol_oracle/q64_cents.parquet",
    k: int = 10,
    nprobe: int = 2,
    dsub: int = 8,
    scale: str = "65536.0",
    query_pred: str = "vec_id < 5",
) -> str:
    """Replay of similarity.ivf_pq_topk(normalize=False): corpus list
    assignment and query probing rank centroids by exact integer inner
    product (ties -> lowest cid, numpy's stable argsort), then q63's PQ
    encode/LUT scoring runs only where the neighbor's list is probed."""
    return f"""
WITH {_pq_common(books_path, scale, dsub, query_pred)},
ct AS (SELECT cid, j, w FROM read_parquet('{cents_path}')),
asn AS (SELECT nz.vec_id, ct.cid, sum(nz.vq[ct.j + 1] * ct.w) AS d
        FROM nz CROSS JOIN ct GROUP BY nz.vec_id, ct.cid),
ranked AS (SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY d DESC, cid) AS rk
           FROM asn),
lists AS (SELECT vec_id, cid FROM ranked WHERE rk = 1),
probes AS (SELECT ranked.vec_id AS qid, cid FROM ranked
           JOIN qv ON qv.vec_id = ranked.vec_id WHERE rk <= {nprobe}),
s AS (SELECT ql.qid, en.vec_id AS nid, sum(ql.lut) AS score
      FROM en JOIN qlut ql ON ql.m = en.m AND ql.code = en.code
      JOIN lists ON lists.vec_id = en.vec_id
      JOIN probes ON probes.qid = ql.qid AND probes.cid = lists.cid
      WHERE en.vec_id <> ql.qid
      GROUP BY ql.qid, en.vec_id),
r AS (SELECT qid, nid, score,
        row_number() OVER (PARTITION BY qid ORDER BY score DESC, nid) AS rk
      FROM s)
SELECT qid AS query_id, nid AS neighbor_id, CAST(rk AS INTEGER) AS rank,
       CAST(score * 1000 AS BIGINT) AS approx_milli
FROM r WHERE rk <= {k}
"""


def gen_q84_gd_sql(
    vocab_size: int = 32,
    min_doc_freq: int = 2,
    iters: int = 3,
    lr_div: int = 64,
    scale: int = 1_000_000,
    plant_token: str = "spark",
) -> str:
    """Replay of classify.train_linear_gd on the documents table: the
    fixed-iteration integer GD unrolls into one CTE chain per iteration
    (pred -> err -> grad -> update), with the learning-rate division
    truncated toward zero via a sign CASE (DuckDB's ``//`` floors; the
    trainer and Spark's ``div`` truncate)."""
    D = f"((SELECT count(*) FROM docs) * {lr_div})"

    def trunc(x: str) -> str:
        return f"CASE WHEN ({x}) >= 0 THEN ({x}) // {D} ELSE -((-({x})) // {D}) END"

    its = []
    for i in range(iters):
        its.append(f"""
pred{i} AS (SELECT p.doc_id, sum(p.cnt * w.w) AS s
            FROM posts p JOIN w{i} w USING (term) GROUP BY p.doc_id),
err{i} AS (SELECT d.doc_id, coalesce(pr.s, 0) + (SELECT b FROM b{i}) - d.y * {scale} AS e
           FROM docs d LEFT JOIN pred{i} pr USING (doc_id)),
g{i} AS (SELECT p.term, sum(p.cnt * e.e) AS g
         FROM posts p JOIN err{i} e USING (doc_id) GROUP BY p.term),
w{i + 1} AS (SELECT w.term, w.w - ({trunc('coalesce(g.g, 0)')}) AS w
             FROM w{i} w LEFT JOIN g{i} g USING (term)),
b{i + 1} AS (SELECT (SELECT b FROM b{i}) - ({trunc(f'(SELECT coalesce(sum(e), 0) FROM err{i})')}) AS b)""")
    chain = ",".join(its)
    return rf"""
WITH tok AS (SELECT doc_id,
               CASE WHEN length(trim(text)) = 0 THEN CAST([] AS VARCHAR[])
                    ELSE regexp_split_to_array(trim(text), '\s+') END AS ts0
             FROM documents WHERE text IS NOT NULL),
tk AS (SELECT doc_id, list_filter(ts0, x -> x <> '') AS ts FROM tok),
docs AS (SELECT doc_id,
           CASE WHEN list_contains(ts, '{plant_token}') THEN 1 ELSE 0 END AS y
         FROM tk),
posts0 AS (SELECT doc_id, unnest(ts) AS term FROM tk),
posts_all AS (SELECT doc_id, term, count(*) AS cnt FROM posts0 GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM posts_all GROUP BY term),
vocab AS (SELECT term FROM (
            SELECT term, row_number() OVER (ORDER BY df DESC, term ASC) AS rk
            FROM dfreq WHERE df >= {min_doc_freq}) WHERE rk <= {vocab_size}),
posts AS (SELECT p.doc_id, p.term, p.cnt FROM posts_all p JOIN vocab USING (term)),
w0 AS (SELECT term, CAST(0 AS BIGINT) AS w FROM vocab),
b0 AS (SELECT CAST(0 AS BIGINT) AS b),{chain}
SELECT term, CAST(w AS BIGINT) AS weight_micro FROM w{iters}
UNION ALL SELECT '__bias__', CAST((SELECT b FROM b{iters}) AS BIGINT)
"""


# ---------------------------------------------------------------------------
# OTLP protobuf wire replay (q186)
# ---------------------------------------------------------------------------
#
# The strongest check the driver can run on a binary codec: DuckDB
# RECONSTRUCTS every conversation's ExportLogsServiceRequest envelope
# field-by-field — varint length prefixes, fixed64 little-endian
# timestamps, tag bytes, UTF-8 payload hex — and compares md5(hex) with
# the engine's marshalled bytes. A wrong tag, wrong wire type, wrong
# emission order, or off-by-one length on EITHER side flips the digest.
# Field numbers are the reference's generated pb.go
# (model/internal/data/protogen/logs/v1/logs.pb.go:158-305,
# common/v1/common.pb.go:85-273); the tag/varint helpers here are written
# independently of sources/otlp_proto.py so the two sides cannot share a
# bug by construction.


def _pv_hex(n: int) -> str:
    """Python-side varint hex for CONSTANT lengths baked into the SQL."""
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out).hex()


def _sql_varint_hex(e: str, max_groups: int = 5) -> str:
    """SQL expression: varint hex of a NON-NEGATIVE bigint expression
    (lengths and turn indexes; 5 groups covers < 2^35)."""
    arms = []
    for g in range(1, max_groups + 1):
        parts = []
        for i in range(g):
            grp = f"((({e}) >> {7 * i}) & 127)"
            byte = f"({grp} | 128)" if i < g - 1 else grp
            parts.append(f"lpad(lower(to_hex({byte})), 2, '0')")
        body = " || ".join(parts)
        if g < max_groups:
            arms.append(f"WHEN ({e}) < {1 << (7 * g)} THEN {body}")
        else:
            arms.append(f"ELSE {body}")
    return "(CASE " + " ".join(arms) + " END)"


def _sql_fixed64le_hex(e: str) -> str:
    """SQL expression: 8-byte little-endian hex of a bigint in [0, 2^63)."""
    return " || ".join(
        f"lpad(lower(to_hex(((({e}) >> {8 * i}) & 255))), 2, '0')" for i in range(8)
    )


def gen_q186_otlp_proto_wire_sql(prelude: str, lib_name: str) -> str:
    """Envelope reconstruction over the transcripts CTE ``t`` of
    ``prelude``. Assumes turn_idx >= 0 (it is row_number()-1 by
    construction); a negative index would need the 10-byte two's
    complement form on both sides."""

    def vh(e: str) -> str:
        return _sql_varint_hex(e)

    def hl(e: str) -> str:  # byte length of a hex string column
        return f"(length({e}) // 2)"

    def sbytes(e: str) -> str:  # UTF-8 byte length of a varchar expression
        return f"(length(hex({e})) // 2)"

    def anystr(e: str) -> str:  # AnyValue{string_value=e} hex
        return f"'0a' || {vh(sbytes(e))} || lower(hex({e}))"

    key_role = "0a" + _pv_hex(len(b"role")) + b"role".hex()
    key_tool = "0a" + _pv_hex(len(b"tool")) + b"tool".hex()
    key_idx = "0a" + _pv_hex(len(b"turn.idx")) + b"turn.idx".hex()
    key_conv = "0a" + _pv_hex(len(b"conv.id")) + b"conv.id".hex()
    lib = lib_name.encode("utf-8")
    il_payload = "0a" + _pv_hex(len(lib)) + lib.hex()  # InstrumentationLibrary{name}
    lib_field = "0a" + _pv_hex(len(il_payload) // 2) + il_payload  # ill field 1

    def kv_attr(key_const_hex: str, any_col: str) -> str:
        """record attribute: '32' (field 6 LEN) wrapping KeyValue{key,value}."""
        kv = f"'{key_const_hex}' || '12' || {vh(hl(any_col))} || {any_col}"
        return f"'32' || {vh(f'length({kv}) // 2')} || ({kv})"

    return f"""{prelude},
rec0 AS (
  SELECT conv_id, turn_idx,
    CASE WHEN ts IS NULL OR epoch_us(ts) * 1000 = 0
         THEN '' ELSE '09' || {_sql_fixed64le_hex("epoch_us(ts) * 1000")} END AS time_hex,
    CASE WHEN text IS NULL THEN NULL ELSE {anystr("text")} END AS any_text,
    CASE WHEN role IS NULL THEN NULL ELSE {anystr("role")} END AS any_role,
    CASE WHEN tool IS NULL THEN NULL ELSE {anystr("tool")} END AS any_tool,
    CASE WHEN turn_idx IS NULL THEN NULL ELSE '18' || {vh("turn_idx")} END AS any_idx
  FROM t),
rec1 AS (
  SELECT conv_id, turn_idx,
    time_hex
    || CASE WHEN any_text IS NULL THEN ''
            ELSE '2a' || {vh(hl("any_text"))} || any_text END
    || CASE WHEN any_role IS NULL THEN '' ELSE {kv_attr(key_role, "any_role")} END
    || CASE WHEN any_tool IS NULL THEN '' ELSE {kv_attr(key_tool, "any_tool")} END
    || CASE WHEN any_idx IS NULL THEN '' ELSE {kv_attr(key_idx, "any_idx")} END
    AS rec_hex
  FROM rec0),
recs AS (
  SELECT conv_id,
    string_agg('12' || {vh(hl("rec_hex"))} || rec_hex, '' ORDER BY turn_idx) AS logs_hex
  FROM rec1 GROUP BY conv_id),
env0 AS (
  SELECT conv_id, logs_hex,
    CASE WHEN conv_id IS NULL THEN ''
         ELSE '0a' || {vh(f"length('{key_conv}' || '12' || {vh(hl(anystr('conv_id')))} || {anystr('conv_id')}) // 2")}
              || '{key_conv}' || '12' || {vh(hl(anystr("conv_id")))} || {anystr("conv_id")}
    END AS res_payload
  FROM recs),
env1 AS (
  SELECT conv_id,
    '0a' || {vh(hl("res_payload"))} || res_payload
    || '12' || {vh(f"length('{lib_field}' || logs_hex) // 2")} || '{lib_field}' || logs_hex
    AS rl_payload
  FROM env0),
env AS (
  SELECT conv_id, '0a' || {vh(hl("rl_payload"))} || rl_payload AS env_hex FROM env1)
SELECT conv_id, md5(env_hex) AS wire_md5, CAST(length(env_hex) // 2 AS BIGINT) AS n_bytes
FROM env
"""


# ---------------------------------------------------------------------------
# hostmetrics fixture corpus replay (q185)
# ---------------------------------------------------------------------------


def gen_q185_hostmetrics_sql() -> str:
    """Re-parse the committed /proc fixture corpus with INDEPENDENT SQL
    string machinery (string_split_regex / regexp / pivots) and emit the
    same (host, scraper, metric, labels, value) points the real parsers
    produce — the check that made the Prometheus text parser
    driver-checkable (q40), applied to the hostmetrics scrapers
    (reference receiver/hostmetricsreceiver/internal/scraper/*). The
    corpus text is the SHARED INPUT (embedded as literals); every parse
    rule below is written against /proc format documentation, not against
    sources/hostmetrics.py."""
    from opentelemetry_collector_spark.sources.hostmetrics_fixture import fixture_corpus

    values = ",\n    ".join(
        "('{}', '{}', '{}')".format(h, k, t.replace("'", "''")) for h, k, t in fixture_corpus()
    )

    cpu_states = ["user", "nice", "system", "idle", "wait", "interrupt", "softirq", "steal"]
    cpu_arms = "\n  UNION ALL ".join(
        f"SELECT host, 'cpu' AS scraper, 'system.cpu.time' AS metric, "
        f"'cpu=' || f[1] || ',state={st}' AS labels, "
        f"CAST(f[{i + 2}] AS DOUBLE) / 100.0 AS value FROM cpuf"
        for i, st in enumerate(cpu_states)
    )

    mem_states = [
        ("used", "(mt - mf - bu - ca)"),
        ("free", "mf"),
        ("buffered", "bu"),
        ("cached", "ca"),
        ("slab_reclaimable", "sr"),
        ("slab_unreclaimable", "su"),
    ]
    mem_arms = "\n  UNION ALL ".join(
        f"SELECT host, 'memory', 'system.memory.usage', 'state={st}', {expr} FROM mem"
        for st, expr in mem_states
    )

    load_arms = "\n  UNION ALL ".join(
        f"SELECT host, 'load', 'system.cpu.load_average.{w}', '', CAST(f[{i + 1}] AS DOUBLE) FROM loadf"
        for i, w in enumerate(["1m", "5m", "15m"])
    )

    net_metrics = ["io", "packets", "errors", "dropped"]
    net_arms = "\n  UNION ALL ".join(
        f"SELECT host, 'network', 'system.network.{m}', "
        f"'device=' || dev || ',direction={d}', CAST(f[{idx}] AS DOUBLE) FROM netf"
        for d, base in (("receive", 1), ("transmit", 9))
        for off, m in enumerate(net_metrics)
        for idx in [base + off]
    )

    disk_arms = "\n  UNION ALL ".join(
        [
            "SELECT host, 'disk', 'system.disk.io', 'device=' || dev || ',direction=read', CAST(f[6] AS DOUBLE) * 512.0 FROM diskf",
            "SELECT host, 'disk', 'system.disk.io', 'device=' || dev || ',direction=write', CAST(f[10] AS DOUBLE) * 512.0 FROM diskf",
            "SELECT host, 'disk', 'system.disk.operations', 'device=' || dev || ',direction=read', CAST(f[4] AS DOUBLE) FROM diskf",
            "SELECT host, 'disk', 'system.disk.operations', 'device=' || dev || ',direction=write', CAST(f[8] AS DOUBLE) FROM diskf",
            "SELECT host, 'disk', 'system.disk.io_time', 'device=' || dev, CAST(f[13] AS DOUBLE) / 1000.0 FROM diskf",
            "SELECT host, 'disk', 'system.disk.operation_time', 'device=' || dev || ',direction=read', CAST(f[7] AS DOUBLE) / 1000.0 FROM diskf",
            "SELECT host, 'disk', 'system.disk.operation_time', 'device=' || dev || ',direction=write', CAST(f[11] AS DOUBLE) / 1000.0 FROM diskf",
            "SELECT host, 'disk', 'system.disk.pending_operations', 'device=' || dev, CAST(f[12] AS DOUBLE) FROM diskf",
            "SELECT host, 'disk', 'system.disk.weighted_io_time', 'device=' || dev, CAST(f[14] AS DOUBLE) / 1000.0 FROM diskf",
            "SELECT host, 'disk', 'system.disk.merged', 'device=' || dev || ',direction=read', CAST(f[5] AS DOUBLE) FROM diskf",
            "SELECT host, 'disk', 'system.disk.merged', 'device=' || dev || ',direction=write', CAST(f[9] AS DOUBLE) FROM diskf",
        ]
    )

    return rf"""
WITH corpus(host, kind, text) AS (VALUES
    {values}),
lines AS (SELECT host, kind, unnest(string_split(rtrim(text, chr(10)), chr(10))) AS line
          FROM corpus),
cpuf AS (SELECT host, string_split_regex(trim(line), '\s+') AS f
         FROM lines WHERE kind = 'proc_stat' AND regexp_matches(line, '^cpu[0-9]')),
kv2 AS (SELECT host, kind, string_split_regex(trim(line), '\s+') AS f
        FROM lines WHERE len(string_split_regex(trim(line), '\s+')) = 2),
prockv AS (SELECT host, f[1] AS k, CAST(f[2] AS DOUBLE) AS v FROM kv2 WHERE kind = 'proc_stat'),
proc_rows AS (
  SELECT host, 'processes' AS scraper, 'system.processes.count' AS metric,
         'status=running' AS labels, v AS value FROM prockv WHERE k = 'procs_running'
  UNION ALL SELECT host, 'processes', 'system.processes.count', 'status=blocked', v
    FROM prockv WHERE k = 'procs_blocked'
  UNION ALL SELECT host, 'processes', 'system.processes.created', '', v
    FROM prockv WHERE k = 'processes'),
memkv AS (SELECT host, regexp_extract(line, '^(\w+):', 1) AS k,
                 CAST(regexp_extract(line, ':\s+(\d+)', 1) AS DOUBLE) * 1024 AS v
          FROM lines WHERE kind = 'meminfo' AND line LIKE '%:%'),
mem AS (SELECT host,
          max(CASE WHEN k = 'MemTotal' THEN v END) AS mt,
          max(CASE WHEN k = 'MemFree' THEN v END) AS mf,
          max(CASE WHEN k = 'Buffers' THEN v END) AS bu,
          max(CASE WHEN k = 'Cached' THEN v END) AS ca,
          max(CASE WHEN k = 'SReclaimable' THEN v END) AS sr,
          max(CASE WHEN k = 'SUnreclaim' THEN v END) AS su
        FROM memkv GROUP BY host),
mem_rows AS (
  {mem_arms}),
loadf AS (SELECT host, string_split_regex(trim(text), '\s+') AS f
          FROM corpus WHERE kind = 'loadavg'),
load_rows AS (
  {load_arms}),
netf0 AS (SELECT host, trim(substr(line, 1, strpos(line, ':') - 1)) AS dev,
                 string_split_regex(trim(substr(line, strpos(line, ':') + 1)), '\s+') AS f
          FROM lines WHERE kind = 'net_dev' AND strpos(line, ':') > 0),
netf AS (SELECT * FROM netf0 WHERE len(f) >= 12),
net_rows AS (
  {net_arms}),
vmkv AS (SELECT host, f[1] AS k, CAST(f[2] AS DOUBLE) AS v FROM kv2 WHERE kind = 'vmstat'),
vm AS (SELECT host,
         max(CASE WHEN k = 'pswpin' THEN v END) AS pin,
         max(CASE WHEN k = 'pswpout' THEN v END) AS pout,
         max(CASE WHEN k = 'pgfault' THEN v END) AS pgf,
         max(CASE WHEN k = 'pgmajfault' THEN v END) AS pgmf
       FROM vmkv GROUP BY host),
vm_rows AS (
  SELECT host, 'paging' AS scraper, 'system.paging.operations' AS metric,
         'direction=page_in,type=major' AS labels, pin AS value FROM vm WHERE pin IS NOT NULL
  UNION ALL SELECT host, 'paging', 'system.paging.operations', 'direction=page_out,type=major', pout
    FROM vm WHERE pout IS NOT NULL
  UNION ALL SELECT host, 'paging', 'system.paging.faults', 'type=major', pgmf
    FROM vm WHERE pgmf IS NOT NULL
  UNION ALL SELECT host, 'paging', 'system.paging.faults', 'type=minor', pgf - pgmf
    FROM vm WHERE pgmf IS NOT NULL AND pgf IS NOT NULL),
diskf0 AS (SELECT host, string_split_regex(trim(line), '\s+') AS f
           FROM lines WHERE kind = 'diskstats'),
diskf1 AS (SELECT host, f[3] AS dev, f FROM diskf0 WHERE len(f) >= 14),
diskf AS (SELECT * FROM diskf1 WHERE NOT regexp_matches(dev, '^loop')),
disk_rows AS (
  {disk_arms}),
cpu_rows AS (
  {cpu_arms})
SELECT * FROM cpu_rows
UNION ALL SELECT * FROM proc_rows
UNION ALL SELECT * FROM mem_rows
UNION ALL SELECT * FROM load_rows
UNION ALL SELECT * FROM net_rows
UNION ALL SELECT * FROM vm_rows
UNION ALL SELECT * FROM disk_rows
"""


# ---------------------------------------------------------------------------
# intHistogram wire reconstruction (q197) — the q186 technique applied to
# the metrics signal: DuckDB rebuilds to_otlp_int_histograms_proto's
# envelope bytes field-by-field (metrics.pb.go tags: Metric.name=1,
# int_histogram oneof=8 -> tag 0x42; IntHistogramDataPoint labels=1,
# count=4 fixed64 -> 0x21, sum=5 sfixed64 -> 0x29, bucket_counts=6 packed
# -> 0x32, explicit_bounds=7 packed -> 0x3a; IntHistogram
# aggregation_temporality=2 varint -> 0x10) and md5-compares. A matched
# encoder+decoder bug that q195/q196's roundtrip identity cannot see
# flips this digest.
# ---------------------------------------------------------------------------


def gen_q197_int_histogram_wire_sql(prelude: str, lib_name: str) -> str:
    """Envelope reconstruction over the transcripts CTE ``t``: the q196
    frame (per-(conv, role) datapoints, iv = length(text) * 1e9+7, the
    [16,32,64,128] bounds) marshalled to hex entirely in SQL. Assumes
    conv_ids are printable ASCII without JSON-escaped characters (they
    are by construction), so datapoint order by conv_id equals Spark's
    order by the labels-JSON sort key."""

    def vh(e: str) -> str:
        return _sql_varint_hex(e)

    def hl(e: str) -> str:  # byte length of a hex string column
        return f"(length({e}) // 2)"

    def sbytes(e: str) -> str:  # UTF-8 byte length of a varchar expression
        return f"(length(hex({e})) // 2)"

    f64 = _sql_fixed64le_hex

    # constants baked python-side, independent of the engine encoder
    import struct as _s

    bounds_payload = b"".join(_s.pack("<d", b) for b in (16.0, 32.0, 64.0, 128.0)).hex()
    bounds_field = "3a" + _pv_hex(len(bounds_payload) // 2) + bounds_payload
    key_conv = "0a" + _pv_hex(len(b"conv")) + b"conv".hex()
    lib = lib_name.encode("utf-8")
    il_payload = "0a" + _pv_hex(len(lib)) + lib.hex()
    lib_field = "0a" + _pv_hex(len(il_payload) // 2) + il_payload

    # KeyValue{key="conv", value=conv_id} wrapped as datapoint field 1
    kv = f"'{key_conv}' || '12' || {vh(sbytes('conv_id'))} || lower(hex(conv_id))"
    label_field = f"'0a' || {vh(f'length({kv}) // 2')} || ({kv})"

    counts_packed = " || ".join(f64(f"c{i}") for i in range(5))

    return f"""{prelude},
base AS (
  SELECT role, conv_id,
         len(list_filter([16.0, 32.0, 64.0, 128.0],
                         x -> CAST(length(text) AS DOUBLE) > x)) AS pos,
         CAST(length(text) AS BIGINT) * 1000000007 AS iv
  FROM t),
dp AS (
  SELECT role, conv_id,
         CAST(count(*) AS BIGINT) AS h_count,
         CAST(sum(iv) AS BIGINT) AS h_sum,
         CAST(sum(CASE WHEN pos = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c0,
         CAST(sum(CASE WHEN pos = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN pos = 2 THEN 1 ELSE 0 END) AS BIGINT) AS c2,
         CAST(sum(CASE WHEN pos = 3 THEN 1 ELSE 0 END) AS BIGINT) AS c3,
         CAST(sum(CASE WHEN pos = 4 THEN 1 ELSE 0 END) AS BIGINT) AS c4
  FROM base GROUP BY role, conv_id),
dp_hex AS (
  SELECT role, conv_id,
    {label_field}
    || CASE WHEN h_count = 0 THEN '' ELSE '21' || {f64("h_count")} END
    || CASE WHEN h_sum = 0 THEN '' ELSE '29' || {f64("h_sum")} END
    || '32' || '28' || {counts_packed}
    || '{bounds_field}'
    AS d
  FROM dp),
per_metric AS (
  SELECT role,
    string_agg('0a' || {vh(hl("d"))} || d, '' ORDER BY conv_id) AS dps_hex
  FROM dp_hex GROUP BY role),
metric_hex AS (
  SELECT role,
    '0a' || {vh(sbytes("role"))} || lower(hex(role))
    || '42' || {vh(f"length(dps_hex || '1002') // 2")} || dps_hex || '1002'
    AS m
  FROM per_metric),
ilm AS (
  SELECT role, '{lib_field}' || '12' || {vh(hl("m"))} || m AS payload FROM metric_hex),
env AS (
  SELECT role,
    '0a' || {vh(f"length('0a00' || '12' || {vh(hl('payload'))} || payload) // 2")}
    || '0a00' || '12' || {vh(hl("payload"))} || payload
    AS env_hex
  FROM ilm)
SELECT role AS metric, md5(env_hex) AS wire_md5,
       CAST(length(env_hex) // 2 AS BIGINT) AS n_bytes
FROM env
"""
