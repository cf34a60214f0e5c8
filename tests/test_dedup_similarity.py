"""Golden tests for dedup / similarity / text-analysis operators
(the non-SQL-expressible ops get their correctness gate here)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from opentelemetry_collector_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    jaccard,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash,
    simhash_neardup_pairs,
)
from opentelemetry_collector_spark.operators.similarity import (
    cosine,
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from opentelemetry_collector_spark.operators.text import lang_guess, quality_metrics, token_count

BASE = (
    "the quick brown fox jumps over the lazy dog while the rain in spain "
    "falls mainly on the plain and every good boy deserves fudge"
)


def _docs(spark):
    rows = [
        (0, BASE),
        (1, BASE.replace("quick", "swift")),  # near-dup of 0
        (2, BASE),  # exact dup of 0
        (3, "completely different content about databases and query engines"),
        (4, "another unrelated document mentioning volcanoes and oceans"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    out = exact_dedup(_docs(spark), "doc_id").collect()
    by_survivor = {r.survivor_id: r.n_copies for r in out}
    assert by_survivor[0] == 2  # docs 0 and 2 collapse
    assert by_survivor[1] == 1
    assert len(out) == 5


def test_minhash_lsh_finds_planted_neardup(spark):
    pairs = {(r.a_id, r.b_id) for r in minhash_lsh_pairs(_docs(spark), "doc_id", threshold=0.5).collect()}
    assert (0, 1) in pairs  # near-dup found
    assert (0, 2) in pairs  # exact dup found
    assert all(a in (0, 1, 2) and b in (0, 1, 2) for a, b in pairs)  # no false positives


def test_minhash_matches_exact_jaccard_on_found_pairs(spark):
    lsh = {(r.a_id, r.b_id): r.jaccard_milli for r in minhash_lsh_pairs(_docs(spark), "doc_id", threshold=0.5).collect()}
    exact = {(r.a_id, r.b_id): r.jaccard_milli for r in ngram_jaccard_pairs(_docs(spark), "doc_id", threshold=0.5).collect()}
    for k, v in lsh.items():
        assert exact[k] == v  # verify stage reports EXACT jaccard


def test_lsh_verify_strategies_agree(spark):
    # the broadcast fast path and the at-scale shuffle path must be the
    # same operator: identical pair sets AND identical exact jaccards
    kw = dict(id_col="doc_id", threshold=0.5)
    bc = {(r.a_id, r.b_id): r.jaccard_milli
          for r in minhash_lsh_pairs(_docs(spark), verify_strategy="broadcast", **kw).collect()}
    sh = {(r.a_id, r.b_id): r.jaccard_milli
          for r in minhash_lsh_pairs(_docs(spark), verify_strategy="shuffle", **kw).collect()}
    assert bc == sh and bc


def test_lsh_no_false_negatives_at_high_threshold(spark):
    # with 32 hashes / 8 bands, P(candidate | j>=0.8) ~ 1 - (1-0.8^4)^8 > 0.99
    exact = {(r.a_id, r.b_id) for r in ngram_jaccard_pairs(_docs(spark), "doc_id", threshold=0.8).collect()}
    lsh = {(r.a_id, r.b_id) for r in minhash_lsh_pairs(_docs(spark), "doc_id", threshold=0.8).collect()}
    assert exact <= lsh or exact == lsh


def test_ngram_jaccard_max_df_prunes_hot_shingles(spark):
    """The Σdf² guard: a boilerplate prefix shared by EVERY document may
    not pair everything with everything once its shingles exceed max_df;
    the rare-shingle near-dup must survive the pruning."""
    boiler = "terms of service apply to all content here "
    rows = [
        (0, boiler + BASE),
        (1, boiler + BASE.replace("quick", "swift")),  # near-dup of 0
        (2, boiler + "databases and query engines compared at length"),
        (3, boiler + "volcanoes and oceans and islands and weather"),
        (4, boiler + "sed sagittis euismod arcu in hendrerit tellus"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pruned = {
        (r.a_id, r.b_id)
        for r in ngram_jaccard_pairs(df, "doc_id", threshold=0.4, max_df=3).collect()
    }
    assert (0, 1) in pruned
    # boilerplate-only overlap (df=5 shingles, all pruned) cannot pair
    assert all(a in (0, 1) and b in (0, 1) for a, b in pruned), pruned
    # unpruned full-space semantics are unchanged by the new parameter
    full = {
        (r.a_id, r.b_id): r.jaccard_milli
        for r in ngram_jaccard_pairs(_docs(spark), "doc_id", threshold=0.5).collect()
    }
    huge = {
        (r.a_id, r.b_id): r.jaccard_milli
        for r in ngram_jaccard_pairs(_docs(spark), "doc_id", threshold=0.5, max_df=10**6).collect()
    }
    assert full == huge and full


def test_token_fnv_hashes_match_python_reference(spark):
    """The replayable token hash (FNV poly + splitmix64 over code points)
    must equal a from-scratch Python fold, including the Java split("\\s+")
    edge cases the oracle SQL replicates: leading separator keeps a ""
    token, trailing empties drop, SQL trim strips spaces only."""
    import re

    import numpy as np

    from opentelemetry_collector_spark.functions.shingle_hash import token_fnv_hashes

    def ref_hash(tok):
        h = 0
        for ch in tok:
            h = (h * 1099511628211 + ord(ch)) % (1 << 64)
        h ^= h >> 33
        h = (h * 0xFF51AFD7ED558CCD) % (1 << 64)
        h ^= h >> 33
        h = (h * 0xC4CEB9FE1A85EC53) % (1 << 64)
        h ^= h >> 33
        return h - (1 << 64) if h >= 1 << 63 else h

    def ref_tokens(s):
        if s is None:
            return None
        t = s.strip(" ")
        if not t:
            return []
        toks = re.split(r"[ \t\n\x0b\f\r]+", t)
        while toks and toks[-1] == "":
            toks.pop()
        return toks

    texts = ["hello world", "\tlead tab", "trail\t", "  spaced  ", "", "\t", None, "héllo ünï", "one"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, text string")
    got = {
        r.i: r.h for r in df.select("i", token_fnv_hashes(F.col("text")).alias("h")).collect()
    }
    for i, t in enumerate(texts):
        toks = ref_tokens(t)
        want = None if toks is None else [ref_hash(x) for x in toks]
        assert got[i] == want, (t, got[i], want)
    # and the full simhash pipeline agrees between hashers on structure:
    # exact dups are hamming-0 pairs under BOTH hashers
    pairs_fnv = {
        (r.a_id, r.b_id): r.hamming
        for r in simhash_neardup_pairs(_docs(spark), "doc_id", max_hamming=8, hasher="fnv").collect()
    }
    assert pairs_fnv[(0, 2)] == 0  # exact dup pair survives hasher swap


def test_shingle_jaccard_identity(spark):
    df = spark.createDataFrame([(BASE,)], "t string").select(
        jaccard(shingles(F.col("t")), shingles(F.col("t"))).alias("j")
    )
    assert df.collect()[0].j == 1.0


def test_simhash_properties(spark):
    df = _docs(spark).withColumn("h", simhash(F.col("text")))
    h = {r.doc_id: r.h for r in df.collect()}
    assert h[0] == h[2]  # identical text => identical simhash
    ham01 = bin((h[0] ^ h[1]) & (2**64 - 1)).count("1")
    ham03 = bin((h[0] ^ h[3]) & (2**64 - 1)).count("1")
    assert ham01 < ham03  # near-dup closer than unrelated


def test_simhash_neardup_pairs(spark):
    pairs = {(r.a_id, r.b_id) for r in simhash_neardup_pairs(_docs(spark), "doc_id", max_hamming=6).collect()}
    assert (0, 2) in pairs
    assert (0, 1) in pairs or (1, 2) in pairs  # near-dup within 6 bits
    assert (0, 3) not in pairs


def _emb(spark, n=80, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, dim))
    v[1] = v[0] + rng.standard_normal(dim) * 0.01  # planted near-dup of 0
    rows = [(i, [float(x) for x in v[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark):
    emb = _emb(spark)
    out = cosine_topk(emb, emb.filter(F.col("vec_id") == 0), k=3).collect()
    assert out[0].neighbor_id == 1 and out[0].rank == 1  # planted near-dup is NN
    assert out[0].cos_milli >= 990
    assert [r.rank for r in out] == [1, 2, 3]


def test_cosine_self_similarity(spark):
    emb = _emb(spark, n=4)
    d = emb.select(
        cosine(
            F.transform("embedding", lambda x: x.cast("double")),
            F.transform("embedding", lambda x: x.cast("double")),
        ).alias("c")
    ).collect()
    assert all(abs(r.c - 1.0) < 1e-9 for r in d)


def test_lsh_topk_recall(spark):
    emb = _emb(spark, n=200)
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in lsh_topk(emb, q, dim=16, k=5, n_planes=4, n_tables=8).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6  # approximate, but must be way better than chance (5/199)
    # the planted near-dup must survive LSH (it lands in the same bucket w.h.p.)
    assert (0, 1) in approx


def test_ivf_full_probe_equals_exact(spark):
    emb = _emb(spark, n=120)
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id, r.rank) for r in cosine_topk(emb, q, k=5).collect()}
    ivf = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(emb, q, dim=16, k=5, nlist=8, nprobe=8).collect()
    }
    assert ivf == exact  # nprobe == nlist is brute force


def test_ivf_partial_probe_recall(spark):
    emb = _emb(spark, n=200)
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, dim=16, k=5, nlist=8, nprobe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6  # probing 3/8 lists keeps most true neighbors
    assert (0, 1) in approx  # planted near-dup shares the query's own list


def _clustered_emb(spark, n_clusters=6, per_cluster=40, dim=16, seed=7):
    """Well-separated planted clusters: cluster means far apart, tight noise."""
    rng = np.random.default_rng(seed)
    means = rng.standard_normal((n_clusters, dim)) * 10
    rows = []
    for c in range(n_clusters):
        pts = means[c] + rng.standard_normal((per_cluster, dim)) * 0.1
        for j, p in enumerate(pts):
            rows.append((c * per_cluster + j, [float(x) for x in p]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), n_clusters, per_cluster


def test_train_centroids_recovers_planted_clusters(spark):
    from opentelemetry_collector_spark.operators.similarity import (
        centroid_probe,
        train_centroids,
    )

    emb, k, per = _clustered_emb(spark)
    C = train_centroids(emb, dim=16, nlist=k, iters=8, seed=11)
    assert C.shape == (k, 16)
    lids = emb.select(
        (F.col("vec_id") / per).cast("int").alias("truth"),
        F.element_at(
            centroid_probe(F.transform("embedding", lambda x: x.cast("double")), 16, k, 1, centroids=C), 1
        ).alias("lid"),
    ).collect()
    # every planted cluster must map to exactly one list, injectively
    # (trained spherical k-means on well-separated clusters is exact)
    mapping = {}
    for r in lids:
        mapping.setdefault(r.truth, set()).add(r.lid)
    assert all(len(v) == 1 for v in mapping.values())
    assert len({next(iter(v)) for v in mapping.values()}) == k


def test_train_centroids_deterministic_and_improves_ivf_recall(spark):
    from opentelemetry_collector_spark.operators.similarity import train_centroids

    emb, k, _ = _clustered_emb(spark)
    C1 = train_centroids(emb, dim=16, nlist=k, iters=3, seed=11)
    C2 = train_centroids(emb, dim=16, nlist=k, iters=3, seed=11)
    assert np.array_equal(C1, C2)  # same seed + data -> same model
    q = emb.filter(F.col("vec_id") < 5)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    trained = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, dim=16, k=5, nlist=k, nprobe=1, centroids=C1).collect()
    }
    untrained = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(emb, q, dim=16, k=5, nlist=k, nprobe=1).collect()
    }
    r_trained = len(exact & trained) / len(exact)
    r_untrained = len(exact & untrained) / len(exact)
    # nprobe=1 on clustered data: the trained quantizer puts each query's
    # whole cluster in its probed list (perfect recall); random hyper-
    # sphere centroids split clusters
    assert r_trained == 1.0
    assert r_trained >= r_untrained


def test_ivf_trained_full_probe_equals_exact(spark):
    from opentelemetry_collector_spark.operators.similarity import train_centroids

    emb = _emb(spark, n=120)
    q = emb.filter(F.col("vec_id") < 5)
    C = train_centroids(emb, dim=16, nlist=8, iters=2, seed=5)
    exact = {(r.query_id, r.neighbor_id, r.rank) for r in cosine_topk(emb, q, k=5).collect()}
    ivf = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_topk(emb, q, dim=16, k=5, nlist=8, nprobe=8, centroids=C).collect()
    }
    assert ivf == exact  # full probe is brute force under ANY quantizer


def test_ivf_corpus_assignment_is_single_list(spark):
    from opentelemetry_collector_spark.operators.similarity import centroid_probe

    emb = _emb(spark, n=50)
    sizes = (
        emb.select(F.element_at(centroid_probe(F.transform("embedding", lambda x: x.cast("double")), 16, 8, 1), 1).alias("list_id"))
        .groupBy("list_id")
        .count()
        .collect()
    )
    assert sum(r["count"] for r in sizes) == 50  # every vector in exactly one list
    assert all(0 <= r.list_id < 8 for r in sizes)


def test_embedding_neardup_pairs(spark):
    out = embedding_neardup_pairs(_emb(spark), threshold=0.95).collect()
    assert {(r.a_id, r.b_id) for r in out} == {(0, 1)}


def test_token_count_edges(spark):
    df = spark.createDataFrame([("",), ("  ",), ("one",), ("a  b\tc",)], "t string")
    got = [r.n for r in df.select(token_count(F.col("t")).alias("n")).collect()]
    assert got == [0, 0, 1, 3]


def test_quality_metrics_ranges(spark):
    out = quality_metrics(_docs(spark), "text").collect()
    for r in out:
        assert 0 <= r.alpha_pm <= 1000 and 0 <= r.punct_pm <= 1000 and 0 <= r.stopword_pm <= 1000
    empty = [r for r in out if r.doc_id == 5][0]
    assert empty.n_tokens == 0 and empty.stopword_pm == 0


def test_lang_guess_markers(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the hat is of note"),
            (1, "el gato y la casa que bonita"),
            (2, "der hund und die katze ist da"),
            (3, "le chien et la maison est grande"),
            (4, "xyzzy plugh"),
        ],
        "id long, t string",
    )
    got = {r.id: r.g for r in df.select("id", lang_guess(F.col("t")).alias("g")).collect()}
    assert got == {0: "en", 1: "es", 2: "de", 3: "fr", 4: "und"}


def test_multimodal_stub(spark):
    from opentelemetry_collector_spark.operators.multimodal import (
        extract_features,
        frame_sample,
        payload_stats,
        wrap_binary,
    )

    df = _docs(spark).withColumn("b", F.encode("text", "UTF-8"))
    media = wrap_binary(df, "doc_id", "b", modality="image", mime="img/fake")
    stats = {r.media_id: r.n_bytes for r in payload_stats(media).collect()}
    assert stats[0] == len(BASE.encode())
    feats = {r.media_id: r.features for r in extract_features(media).collect()}
    assert feats[0] == feats[2]  # deterministic fake decode
    assert len(feats[0]) == 8 and abs(sum(feats[0]) - 1.0) < 1e-9
    frames = frame_sample(media, every_n_bytes=32, max_frames=4)
    per = {r[0]: r[1] for r in frames.groupBy("media_id").count().collect()}
    assert per[0] == 4  # len(BASE) > 128 bytes -> capped at max_frames

    with pytest.raises(Exception) as ei:
        extract_features(media, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_multimodal_frame_bytes_and_resize(spark):
    from opentelemetry_collector_spark.operators.multimodal import (
        frame_sample,
        resize,
        wrap_binary,
    )

    df = _docs(spark).withColumn("b", F.encode("text", "UTF-8"))
    media = wrap_binary(df, "doc_id", "b", modality="image", mime="img/fake")

    # frame slices reassemble to a prefix of the payload (stride slicing)
    frames = frame_sample(media, every_n_bytes=32, max_frames=4).filter(F.col("media_id") == 0)
    got = b"".join(r.frame_bytes for r in sorted(frames.collect(), key=lambda r: r.frame_idx))
    assert got == BASE.encode()[: len(got)] and len(got) == min(128, len(BASE.encode()))

    # resize: exact target byte size, meta width/height updated, deterministic
    out = {r.media_id: r for r in resize(media, width=8, height=4).collect()}
    assert len(out[0].payload) == 32
    assert out[0].meta.width == 8 and out[0].meta.height == 4
    assert out[0].payload == out[2].payload  # doc2 is an exact dup of doc0
    assert out[5].payload == b""  # empty doc -> empty payload, no crash

    import pytest as _pytest

    with _pytest.raises(Exception) as ei:
        resize(media, 8, 4, decode_stub=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(ei.value, NotImplementedError)


def test_simhash_votes_matches_catalyst_reference(spark):
    """functions/shingle_hash.simhash_votes (numpy vote kernel) must be
    value-identical to dedup.simhash_from_token_hashes (Catalyst reference):
    same xxhash64 inputs, same vote>0 rule, same bit-63 sign wrap."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.functions.shingle_hash import simhash_votes
    from opentelemetry_collector_spark.operators.dedup import (
        simhash_from_token_hashes,
        token_hashes,
    )

    rows = [(i, t) for i, t in enumerate(
        ["a b c", "a b c d", "", "  ", "x " * 40, "unicode ß ẞ İ", None]
    )]
    df = spark.createDataFrame(rows, "id int, text string").withColumn(
        "_th", token_hashes(F.col("text"))
    )
    out = df.select(
        "id",
        simhash_from_token_hashes(F.col("_th")).alias("ref"),
        simhash_votes(F.col("_th")).alias("fast"),
    ).collect()
    for r in out:
        assert r.ref == r.fast, (r.id, r.ref, r.fast)


def test_ivf_written_index_prunes_partitions_and_matches_inmemory(spark, tmp_path):
    """ivf_write_index/ivf_probe_index: the probe's parquet scan must
    statically prune to the probed list_id partitions, and results must be
    identical to the in-memory ivf_topk with the same seed/params."""
    from pyspark.sql import functions as F

    from opentelemetry_collector_spark.operators.similarity import (
        centroid_probe,
        ivf_probe_index,
        ivf_topk,
        ivf_write_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf")
    ivf_write_index(emb, path, dim=64, nlist=8)

    got = ivf_probe_index(spark, path, queries, dim=64, k=5, nlist=8, nprobe=2)
    ref = ivf_topk(emb, queries, dim=64, k=5, nlist=8, nprobe=2)
    as_set = lambda df: {tuple(r) for r in df.collect()}
    assert as_set(got) == as_set(ref)

    # partition pruning: scan must carry a list_id partition filter and read
    # fewer partitions than nlist
    q = queries.select(F.col("vec_id").alias("qid"), F.col("embedding"))
    probed = {
        r.list_id
        for r in queries.select(
            F.explode(centroid_probe(F.col("embedding").cast("array<double>"), 64, 8, 2)).alias("list_id")
        ).collect()
    }
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "list_id" in plan
    assert len(probed) < 8


def test_simhash_blocking_has_full_recall(spark):
    """Exhaustive recall check: operator pairs at radius d must EQUAL the
    brute-force hamming<=d pair set (pigeonhole blocking with d+1 chunks)."""
    from pyspark.sql import functions as F

    docs = synthesize_docs_for_simhash = spark.createDataFrame(
        [(i, " ".join(f"w{(i * 7 + j * 3) % 23}" for j in range(12))) for i in range(60)],
        "doc_id long, text string",
    )
    h = {r.doc_id: r.h & (2**64 - 1) for r in docs.withColumn("h", simhash(F.col("text"))).collect()}
    for d in (3, 8):
        brute = {
            (a, b)
            for a in h
            for b in h
            if a < b and bin(h[a] ^ h[b]).count("1") <= d
        }
        got = {
            (r.a_id, r.b_id)
            for r in simhash_neardup_pairs(docs, "doc_id", max_hamming=d).collect()
        }
        assert got == brute, (d, len(got), len(brute))


def test_exact_dedup_against_drops_only_cross_corpus_dups(spark):
    from opentelemetry_collector_spark.operators.dedup import exact_dedup_against

    seen = spark.createDataFrame(
        [(1, "The quick   brown fox"), (2, "unrelated seen doc")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [
            (10, "the quick brown fox"),   # normalized dup of seen doc 1
            (11, "a genuinely new doc"),
            (12, "a genuinely new doc"),   # within-batch dup: KEPT (not this op's job)
        ],
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in exact_dedup_against(new, seen).collect()}
    assert kept == {11, 12}


def test_exact_dedup_against_null_text_rows(spark):
    from opentelemetry_collector_spark.operators.dedup import exact_dedup_against

    seen = spark.createDataFrame(
        [(1, None), (2, "known doc")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(10, None), (11, "known doc"), (12, "fresh")], "doc_id long, text string"
    )
    # NULL fingerprints never join: NULL-text new docs are kept even when
    # the seen side also contains NULL text (the anti-join's null-never-
    # equal rule, which the q61 oracle mirrors with NOT EXISTS)
    kept = {r.doc_id for r in exact_dedup_against(new, seen).collect()}
    assert kept == {10, 12}


# --- product quantization ---------------------------------------------------


def _codeword_emb(spark, m=4, dsub=4, n=64, seed=9):
    """Vectors whose subvectors are drawn from a small codeword set, so a
    large-enough PQ codebook encodes them LOSSLESSLY."""
    rng = np.random.default_rng(seed)
    words = rng.standard_normal((m, 4, dsub))  # 4 codewords per subspace
    # unit-norm codewords => every composed vector has norm sqrt(m), so
    # L2-normalization maps each subspace onto exactly 4 distinct subvectors
    # (a vector-specific norm would smear them and break losslessness)
    words /= np.linalg.norm(words, axis=2, keepdims=True)
    rows = []
    for i in range(n):
        v = np.concatenate([words[j][rng.integers(4)] for j in range(m)])
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_lossless_when_codebook_covers_subvectors(spark):
    from opentelemetry_collector_spark.operators.similarity import (
        pq_topk,
        train_pq,
    )

    emb = _codeword_emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    # ksub=16 >> 4 distinct subvectors per subspace: training converges to
    # the exact codewords (scaled by normalization), so approx == exact
    B = train_pq(emb, dim=16, m=4, ksub=16, iters=8, seed=5)
    exact = {(r.query_id, r.neighbor_id, r.rank) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id, r.rank) for r in pq_topk(emb, q, B, k=5).collect()}
    assert approx == exact


def test_pq_codes_shape_and_determinism(spark):
    from opentelemetry_collector_spark.operators.similarity import pq_encode, train_pq

    emb = _emb(spark, n=60)
    B1 = train_pq(emb, dim=16, m=4, ksub=8, iters=3, seed=7)
    B2 = train_pq(emb, dim=16, m=4, ksub=8, iters=3, seed=7)
    assert B1.shape == (4, 8, 4)
    assert np.array_equal(B1, B2)
    codes = {r.nid: r.pq_code for r in pq_encode(emb, B1).collect()}
    assert len(codes) == 60
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in codes.values())


def test_pq_topk_recall_vs_exact(spark):
    from opentelemetry_collector_spark.operators.similarity import pq_topk, train_pq

    emb = _emb(spark, n=200)
    q = emb.filter(F.col("vec_id") < 5)
    B = train_pq(emb, dim=16, m=8, ksub=16, iters=5, seed=7)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in pq_topk(emb, q, B, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6  # 8x16 codes on random gaussians; >> chance (5/199)
    assert (0, 1) in approx  # the planted near-dup survives quantization


def test_pq_rejects_indivisible_dim(spark):
    import pytest

    from opentelemetry_collector_spark.operators.similarity import train_pq

    emb = _emb(spark, n=20)
    with pytest.raises(ValueError):
        train_pq(emb, dim=16, m=5)


def test_ivf_pq_full_probe_equals_pq(spark):
    from opentelemetry_collector_spark.operators.similarity import (
        ivf_pq_topk,
        pq_topk,
        train_pq,
    )

    emb = _emb(spark, n=120)
    q = emb.filter(F.col("vec_id") < 4)
    B = train_pq(emb, dim=16, m=4, ksub=16, iters=3, seed=7)
    full = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_pq_topk(emb, q, dim=16, codebooks=B, k=5, nlist=8, nprobe=8).collect()
    }
    flat = {(r.query_id, r.neighbor_id, r.rank) for r in pq_topk(emb, q, B, k=5).collect()}
    assert full == flat  # nprobe == nlist prunes nothing


def test_ivf_pq_partial_probe_recall_with_trained_quantizer(spark):
    from opentelemetry_collector_spark.operators.similarity import (
        ivf_pq_topk,
        train_centroids,
        train_pq,
    )

    emb, kclusters, per = _clustered_emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    C = train_centroids(emb, dim=16, nlist=kclusters, iters=5, seed=11)
    B = train_pq(emb, dim=16, m=4, ksub=16, iters=5, seed=7)
    got = ivf_pq_topk(
        emb, q, dim=16, codebooks=B, k=5, nlist=kclusters, nprobe=1, centroids=C
    ).collect()
    # Inside one tight cluster every cosine is ~identical, so "same top-5
    # pair set as exact" is unresolvable for ANY quantizer (flat PQ scores
    # the same) — the contract that IS testable: nprobe=1 with a trained
    # quantizer returns k neighbors and every one belongs to the query's
    # own planted cluster.
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r.neighbor_id)
    assert set(by_q) == {0, 1, 2, 3, 4}
    for qid, nids in by_q.items():
        assert len(nids) == 5
        assert all(n // per == qid // per for n in nids), (qid, nids)


def test_pq_written_index_prunes_partitions_and_matches_inmemory(spark, tmp_path):
    from opentelemetry_collector_spark.operators.similarity import (
        ivf_pq_topk,
        pq_probe_index,
        pq_write_index,
        train_pq,
    )

    emb = _emb(spark, n=150)
    q = emb.filter(F.col("vec_id") < 4)
    B = train_pq(emb, dim=16, m=4, ksub=16, iters=3, seed=7)
    path = str(tmp_path / "pq_index")
    pq_write_index(emb, path, dim=16, codebooks=B, nlist=8, seed=42)
    served = pq_probe_index(spark, path, q, dim=16, codebooks=B, k=5, nlist=8, nprobe=3, seed=42)
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "list_id" in plan  # static pruning
    mem = {
        (r.query_id, r.neighbor_id, r.rank)
        for r in ivf_pq_topk(emb, q, dim=16, codebooks=B, k=5, nlist=8, nprobe=3, seed=42).collect()
    }
    disk = {(r.query_id, r.neighbor_id, r.rank) for r in served.collect()}
    assert disk == mem  # the written path is the same operator


def test_pq_zero_vectors_follow_the_cosine_null_contract(spark):
    """A zero CORPUS vector encodes to NULL (never an arbitrary codeword)
    and cannot surface as a neighbor; a zero QUERY ranks nothing — the same
    per-row degradation cosine_topk applies."""
    from opentelemetry_collector_spark.operators.similarity import (
        ivf_pq_topk,
        pq_encode,
        pq_topk,
        train_pq,
    )

    emb = _emb(spark, n=40)
    dead = spark.createDataFrame(
        [(900, [0.0] * 16)], "vec_id long, embedding array<float>"
    )
    corpus = emb.unionByName(dead)
    B = train_pq(emb, dim=16, m=4, ksub=8, iters=2, seed=7)
    codes = {r.nid: r.pq_code for r in pq_encode(corpus, B).collect()}
    assert codes[900] is None and codes[0] is not None
    q = corpus.filter(F.col("vec_id").isin(0, 900))
    out = pq_topk(corpus, q, B, k=5).collect()
    assert {r.query_id for r in out} == {0}          # zero query ranks nothing
    assert all(r.neighbor_id != 900 for r in out)    # zero vector never a neighbor
    out2 = ivf_pq_topk(corpus, q, dim=16, codebooks=B, k=5, nlist=4, nprobe=4).collect()
    assert {r.query_id for r in out2} == {0}
    assert all(r.neighbor_id != 900 for r in out2)


def test_pq_topk_self_excluded_before_local_truncation(spark):
    """Self must be masked BEFORE the per-batch top-k cut: with the whole
    corpus in one partition and k == corpus-1, every query still gets k
    neighbors (truncate-then-filter would return k-1)."""
    from opentelemetry_collector_spark.operators.similarity import pq_topk, train_pq

    emb = _emb(spark, n=12).coalesce(1)
    B = train_pq(emb, dim=16, m=4, ksub=16, iters=4, seed=5)
    out = pq_topk(emb, emb.filter(F.col("vec_id") < 3), B, k=11).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, set()).add(r.neighbor_id)
    for qid, nids in per_q.items():
        assert len(nids) == 11 and qid not in nids


def test_null_embeddings_degrade_per_row_in_every_ann_path(spark):
    """One NULL embedding must drop only itself from the candidate set —
    never kill the job (the cosine()-NULL contract extended to the numpy
    kernels: LSH buckets, IVF probes, PQ codes, k-means training)."""
    from opentelemetry_collector_spark.operators.similarity import (
        ivf_topk, lsh_topk, pq_topk, train_centroids, train_pq,
    )

    emb = _emb(spark, n=40)
    with_null = emb.union(
        spark.createDataFrame([(999, None)], "vec_id long, embedding array<float>")
    )
    q = with_null.filter(F.col("vec_id") < 3)
    for out in (
        lsh_topk(with_null, q, dim=16, k=3, n_planes=6, n_tables=2),
        ivf_topk(with_null, q, dim=16, k=3, nlist=4, nprobe=4),
        pq_topk(with_null, q, train_pq(with_null, dim=16, m=4, ksub=8, iters=1), k=3),
    ):
        rows = out.collect()
        assert rows, "null row emptied the result set"
        assert all(r.neighbor_id != 999 and r.query_id != 999 for r in rows)
    C = train_centroids(with_null, dim=16, nlist=4, iters=1)
    assert C.shape == (4, 16) and np.isfinite(C).all()


def test_pq_topk_preserves_string_ids(spark):
    """PQ servers must accept any id type the non-PQ top-k paths accept."""
    from opentelemetry_collector_spark.operators.similarity import pq_topk, train_pq

    num = _emb(spark, n=30)
    emb = num.select(
        F.concat(F.lit("doc-"), F.col("vec_id").cast("string")).alias("vec_id"),
        "embedding",
    )
    q = emb.filter(F.col("vec_id").isin("doc-0", "doc-1"))
    out = pq_topk(emb, q, train_pq(emb, dim=16, m=4, ksub=8, iters=1), k=3)
    rows = out.collect()
    assert rows and out.schema["query_id"].dataType.simpleString() == "string"
    # the planted near-dup pair (0, 1) must still find each other by name
    assert any(r.query_id == "doc-0" and r.neighbor_id == "doc-1" and r.rank == 1 for r in rows)


def test_lsh_topk_rejects_nonpositive_tables(spark):
    import pytest

    from opentelemetry_collector_spark.operators.similarity import lsh_topk

    emb = _emb(spark, n=4)
    with pytest.raises(ValueError, match="n_tables"):
        lsh_topk(emb, emb, dim=16, n_tables=0)


def test_null_text_never_pairs_with_empty_text(spark):
    """The Arrow shingle kernel used to fillna('') NULL text, making every
    NULL doc a jaccard-1 duplicate of every ''-text doc — the Catalyst
    reference path (normalize->shingles of NULL = NULL) never pairs them."""
    from opentelemetry_collector_spark.operators.dedup import minhash_lsh_pairs

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, None), (4, "real words here enough to shingle"),
         (5, "real words here enough to shingle")],
        "doc_id long, text string",
    )
    pairs = {(r.a_id, r.b_id) for r in minhash_lsh_pairs(df, "doc_id", threshold=0.5).collect()}
    assert (1, 2) not in pairs and (1, 3) not in pairs
    assert (4, 5) in pairs  # real duplicates still found


def test_assign_clusters_nearest_and_tiebreak(spark):
    from opentelemetry_collector_spark.operators.similarity import assign_clusters

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.0])],  # 2 duplicates 0
        "vec_id long, embedding array<float>",
    )
    corpus = spark.createDataFrame(
        [
            (10, [2.0, 0.1]),   # nearest x-axis: tie between 0 and 2 -> 0
            (11, [0.1, 3.0]),   # nearest y-axis -> 1
            (12, [0.0, 0.0]),   # zero vector: no defined cosine -> dropped
            (13, None),         # NULL vector -> dropped
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: (r.cluster_id, r.cos_milli) for r in assign_clusters(corpus, cents).collect()}
    assert set(got) == {10, 11}
    assert got[10][0] == 0 and got[11][0] == 1
    assert got[10][1] > 990 and got[11][1] > 990


def test_assign_clusters_broadcasts_centroids_no_window(spark):
    from opentelemetry_collector_spark.operators.similarity import assign_clusters

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], "vec_id long, embedding array<float>"
    )
    out = assign_clusters(emb, emb.filter("vec_id < 3"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    # centroid side broadcast (corpus never shuffled for the join); the
    # argmax is a grouped partial agg, never a corpus-wide Window
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Window" not in plan
    assert out.count() == 20


def _sparse_cosine_brute(docs: dict, tau_pm: int, max_df=None):
    """Pure-Python replay of sparse_cosine_pairs' integer contract."""
    from collections import Counter

    tfs = {d: Counter(t.split()) for d, t in docs.items() if t.strip()}
    n = len(docs)
    max_bits = n.bit_length()
    dfreq = Counter(t for tf in tfs.values() for t in tf)
    w = {
        d: {
            t: c * (max_bits - dfreq[t].bit_length() + 1)
            for t, c in tf.items()
            if max_df is None or dfreq[t] <= max_df
        }
        for d, tf in tfs.items()
    }
    norms = {d: sum(x * x for x in ws.values()) for d, ws in w.items()}
    out = {}
    ids = sorted(w)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            dot = sum(w[a][t] * w[b].get(t, 0) for t in w[a])
            if dot and dot * dot * 1_000_000 >= tau_pm**2 * norms[a] * norms[b]:
                out[(a, b)] = (dot, norms[a], norms[b])
    return out


def test_sparse_cosine_pairs_matches_python_reference(spark):
    from opentelemetry_collector_spark.operators.similarity import sparse_cosine_pairs

    docs = {
        "d1": "the quick brown fox jumps",
        "d2": "the quick brown fox leaps",
        "d3": "entirely different words here",
        "d4": "the quick brown fox jumps",   # exact dup of d1
        "d5": "",                             # empty: no postings, no pairs
        "d6": "quick quick quick brown",      # repeated-token tf weighting
    }
    df = spark.createDataFrame(list(docs.items()), "doc_id string, text string")
    for tau, mdf in ((400, None), (700, None), (400, 3)):
        got = {
            (r["id_a"], r["id_b"]): (r["dot"], r["norm2_a"], r["norm2_b"])
            for r in sparse_cosine_pairs(df, "doc_id", tau_pm=tau, max_df=mdf).collect()
        }
        want = _sparse_cosine_brute(docs, tau, mdf)
        assert got == want, f"tau={tau} max_df={mdf}"
    # the exact dup pair always clears any threshold
    assert ("d1", "d4") in _sparse_cosine_brute(docs, 1000)


def test_sparse_cosine_pairs_validation_and_plan(spark):
    import pytest

    from opentelemetry_collector_spark.operators.similarity import sparse_cosine_pairs

    df = spark.createDataFrame([("a", "x y"), ("b", "x z")], "doc_id string, text string")
    with pytest.raises(ValueError, match="tau_pm"):
        sparse_cosine_pairs(df, "doc_id", tau_pm=0)
    plan = (
        sparse_cosine_pairs(df, "doc_id", tau_pm=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # posting self-join is keyed on the term; pair agg is partial-aggregated
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial_sum" in plan or "HashAggregate" in plan


def test_pool_embeddings_exact_integer_mean(spark):
    from opentelemetry_collector_spark.operators.similarity import pool_embeddings

    rows = [
        (0, [1.0, 2.0, -3.5], "a"),
        (1, [3.0, 0.0, 0.5], "a"),
        (2, [10.0, 10.0, 10.0], "b"),
        (3, None, "a"),                     # NULL vector drops per-row
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>, label string")
    got = {r["label"]: (r["n_vectors"], r["centroid_micros"])
           for r in pool_embeddings(df, ["label"]).collect()}
    # mean of (1,3)=2.0, (2,0)=1.0, (-3.5,0.5): sum -3000000, div 2 -> -1500000
    assert got["a"] == (2, [2_000_000, 1_000_000, -1_500_000])
    assert got["b"] == (1, [10_000_000, 10_000_000, 10_000_000])


def test_pool_embeddings_partition_invariant(spark):
    """Bit-identical centroids under any partitioning — the property float
    mean pooling does NOT have."""
    from opentelemetry_collector_spark.operators.similarity import pool_embeddings

    rows = [(i, [((i * 37) % 101) / 7.0, ((i * 13) % 89) / 11.0], i % 3)
            for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>, label int")
    a = {r["label"]: tuple(r["centroid_micros"])
         for r in pool_embeddings(df.coalesce(1), ["label"]).collect()}
    b = {r["label"]: tuple(r["centroid_micros"])
         for r in pool_embeddings(df.repartition(16, "vec_id"), ["label"]).collect()}
    assert a == b


def test_pool_embeddings_ragged_dims_average_per_position(spark):
    from opentelemetry_collector_spark.operators.similarity import pool_embeddings

    rows = [(0, [2.0, 4.0], "a"), (1, [4.0], "a")]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>, label string")
    r = pool_embeddings(df, ["label"]).collect()[0]
    # pos 0 averages both vectors; pos 1 only the vector that has it
    assert r["centroid_micros"] == [3_000_000, 4_000_000]


def test_contrastive_negatives_golden(spark):
    """Hard/random negative mining: near-dup exclusion from both pools,
    cosine-ranked hard picks, md5-deterministic random picks."""
    import hashlib

    from opentelemetry_collector_spark.operators.similarity import contrastive_negatives

    rows = [
        (0, [1.0, 0.0]),      # anchor
        (10, [1.0, 0.001]),   # cos ~0.9999995 -> milli 999: near-dup, excluded
        (11, [1.0, 1.0]),     # cos 0.7071 -> 707
        (12, [0.0, 1.0]),     # cos 0 -> 0
        (13, [-1.0, 0.0]),    # cos -1 -> -1000
        (14, [1.0, 2.0]),     # cos 0.4472 -> 447
    ]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = contrastive_negatives(
        emb, emb.filter("vec_id = 0"), k_hard=2, n_random=1
    ).collect()
    got = {(r["kind"], r["rank"]): (r["neighbor_id"], r["cos_milli"]) for r in out}
    assert got[("hard", 1)] == (11, 707)
    assert got[("hard", 2)] == (14, 447)
    # random pick: md5-lowest of the remaining pool {12, 13}
    expect_rnd = min((hashlib.md5(f"0:{n}".encode()).hexdigest(), n) for n in (12, 13))[1]
    assert got[("random", 1)][0] == expect_rnd
    assert len(got) == 3  # near-dup 10 appears in NO pool


def test_contrastive_negatives_plan_and_validation(spark):
    from opentelemetry_collector_spark.operators.similarity import contrastive_negatives

    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(20)], "vec_id bigint, embedding array<double>"
    )
    df = contrastive_negatives(emb, emb.filter("vec_id < 2"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # anchors broadcast against the scan; both rank filters map-side partial
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan
    with pytest.raises(ValueError):
        contrastive_negatives(emb, emb, k_hard=0)
