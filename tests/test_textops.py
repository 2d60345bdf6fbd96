"""Unit tests for the training-data operators: MinHash-LSH, SimHash,
similarity search, language-ID, quality features, fingerprints —
on crafted corpora where ground truth is known."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynaledger_spark.functions.text import predict_lang, quality_features, rolling_fingerprint
from dynaledger_spark.operators.dedup import (
    exact_jaccard,
    lsh_candidate_pairs,
    minhash_signatures,
    near_duplicates,
    simhash_fingerprints,
    simhash_near_duplicates,
)
from dynaledger_spark.operators.similarity import (
    bucketize,
    cosine_topk,
    lsh_topk,
    norm_stats,
    random_hyperplanes,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden outside"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, BASE),
        (1, BASE),                                   # exact duplicate of 0
        (2, BASE.replace("lazy", "sleepy")),         # near-dup of 0
        (3, "completely different content about spark sql engines and "
            "columnar storage formats with vectorized execution kernels"),
        (4, "el gato y el perro en la casa de la abuela que es muy grande y "
            "los pájaros cantan en el jardín por la mañana"),
        (5, "le chat et le chien dans la maison de la grand-mère est une "
            "belle journée les oiseaux du jardin"),
        (6, ""),                                     # empty doc edge case
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_near_dups(corpus):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in near_duplicates(corpus, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0            # exact dup
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.6
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_lsh_candidates_subset_of_all_pairs(corpus):
    sigs = minhash_signatures(corpus)
    cands = lsh_candidate_pairs(sigs)
    got = {(r.id_a, r.id_b) for r in cands.collect()}
    assert all(a < b for a, b in got)
    jacc = {(r.id_a, r.id_b): r.jaccard for r in exact_jaccard(cands, sigs).collect()}
    # LSH at 32 bands/128 hashes must recall the high-similarity pairs
    assert (0, 1) in jacc and (0, 2) in jacc


def test_simhash_hamming_clusters(corpus):
    fps = simhash_fingerprints(corpus)
    vals = {r.id: r.simhash for r in fps.collect()}
    assert vals[0] == vals[1]  # identical text → identical fingerprint
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_duplicates(fps, max_hamming=8).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 8
    assert (0, 3) not in pairs


def test_near_dup_collapse_output_identical(spark):
    """Round-13 exact-dup collapse: near_duplicates computes signatures/
    banding/Jaccard per DISTINCT text and expands group results back —
    output must be bit-identical to the uncollapsed composition of the
    primitive ops in BOTH cap regimes. The clone-weighted bucket cap is
    the load-bearing piece: a 50-clone group under cap=30 must drop in
    both plans (its banded rows exceed the cap in the uncollapsed plan;
    its WEIGHT exceeds it post-collapse), while under cap=1000 both
    emit all C(50,2) within-group pairs at jaccard exactly 1.0."""
    base = (
        "the quick brown fox jumps over the lazy dog and then naps in "
        "the warm sun near the barn"
    )
    rows = [(i, base) for i in range(50)]
    rows += [(100 + i, base.replace("lazy", f"sleepy{i % 2}")) for i in range(4)]
    rows += [(200, "completely unrelated text about columnar storage "
                   "engines and vectorized execution")]
    docs = spark.createDataFrame(rows, "doc_id long, text string").repartition(8)

    def old_plan(cap):
        sigs = minhash_signatures(docs)
        cands = lsh_candidate_pairs(sigs, max_bucket_size=cap)
        return exact_jaccard(cands, sigs).filter(F.col("jaccard") >= 0.5)

    def canon(df):
        return sorted((r.id_a, r.id_b, r.jaccard) for r in df.collect())

    for cap in (30, 1000):
        old = canon(old_plan(cap))
        new = canon(near_duplicates(docs, threshold=0.5, max_bucket_size=cap))
        assert old == new, f"cap={cap}: collapse changed the output"
    capped = canon(near_duplicates(docs, threshold=0.5, max_bucket_size=30))
    assert not any(a < 50 and b < 50 for a, b, _ in capped)  # group dropped
    uncapped = canon(near_duplicates(docs, threshold=0.5, max_bucket_size=1000))
    assert sum(1 for a, b, j in uncapped if a < 50 and b < 50 and j == 1.0) == 1225


def test_cosine_topk_exact(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to query
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0]),  # opposite
        (4, [0.5, 0.5, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = cosine_topk(emb.filter("vec_id != 0"), [1.0, 0.0, 0.0], k=3).collect()
    assert [r.vec_id for r in got] == [1, 4, 2]
    assert got[0].cos_sim == pytest.approx(0.9938, abs=1e-3)


def test_lsh_topk_recall(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter("vec_id = 0").head()["embedding"])
    corpus_wo_q = emb.filter("vec_id != 0")
    exact = [r.vec_id for r in cosine_topk(corpus_wo_q, qvec, k=10).collect()]
    approx = [
        r.vec_id
        for r in lsh_topk(corpus_wo_q, qvec, k=10, n_planes=6, probe_depth=2).collect()
    ]
    # multiprobe sign-LSH, 6 planes, Hamming-2 probes (~1/3 of buckets):
    # expect meaningful overlap with the exact top-10
    assert len(set(exact) & set(approx)) >= 3


def test_ivf_topk_recall(spark, sf_dir):
    from dynaledger_spark.catalog import read_table
    from dynaledger_spark.operators.similarity import ivf_topk

    emb = read_table(spark, sf_dir, "embeddings")
    qvec = list(emb.filter("vec_id = 0").head()["embedding"])
    corpus = emb.filter("vec_id != 0")
    exact = [r.vec_id for r in cosine_topk(corpus, qvec, k=10).collect()]
    # probing 8 of 16 cells must recall at least half the true top-10
    approx = [
        r.vec_id
        for r in ivf_topk(corpus, qvec, k=10, n_centroids=16, n_probes=8).collect()
    ]
    assert len(set(exact) & set(approx)) >= 5


def test_bucketize_is_deterministic(spark):
    emb = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0]), (1, [1.0, 2.0, 3.0]), (2, [-1.0, -2.0, -3.0])],
        "vec_id long, embedding array<float>",
    )
    planes = random_hyperplanes(3, 4, seed=7)
    got = {r.vec_id: r.bucket for r in bucketize(emb, planes).collect()}
    assert got[0] == got[1]
    assert got[0] != got[2]
    assert 0 <= got[0] < 16


def test_norm_stats(spark):
    emb = spark.createDataFrame(
        [(0, [3.0, 4.0]), (1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id: r for r in norm_stats(emb).collect()}
    assert got[0].l2_norm == 5.0 and got[0].dim == 2
    assert got[1].l2_norm == 0.0


def test_predict_lang(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat is on the mat and it is warm"),
            (1, "el gato es de la casa y los perros"),
            (2, "le chat et les oiseaux du jardin est une"),
            (3, "der hund und die katze ist nicht mit den"),
            (4, "xyzzy plugh qwerty"),  # no evidence → und
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.p for r in df.select("doc_id", predict_lang(F.col("text")).alias("p")).collect()}
    assert got[0] == "en" and got[1] == "es" and got[2] == "fr" and got[3] == "de"
    assert got[4] == "und" and got[5] == "und"


def test_quality_features(spark):
    df = spark.createDataFrame(
        [(0, "Hello, world! The test has 42 tokens?")], "doc_id long, text string"
    )
    r = quality_features(df).collect()[0]
    assert r.n_tokens == 7
    assert r.n_chars == 37
    assert r.punct_ratio == pytest.approx(3 / 37)  # , ! ?
    # BPE-ish split: Hello , world ! The test has 42 tokens ?  → 10 pieces
    assert r.n_bpe_tokens == 10
    assert r.avg_token_len == pytest.approx(37 / 7)


def test_rolling_fingerprint_stability(spark):
    df = spark.createDataFrame(
        [(0, "abc"), (1, "abc"), (2, "abd"), (3, "")], "doc_id long, text string"
    )
    got = {r.doc_id: r.fp for r in df.select("doc_id", rolling_fingerprint(F.col("text")).alias("fp")).collect()}
    assert got[0] == got[1] != got[2]
    # known value: ((97*31)+98)*31+99 = 96354
    assert got[0] == ((97 * 31 + 98) * 31 + 99)
    assert got[3] == 0


def test_bigrams_short_documents_emit_nothing(spark):
    """<2-token docs must contribute zero grams, not crash: the old
    greatest(size-2, -1) fed sequence(0, -1) which is DESCENDING [0, -1]
    and made slice() throw at runtime (round-3 advice)."""
    from dynaledger_spark.plans import queries_pipeline as qp
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, ""), (2, "one"), (3, "two tokens"), (4, "a b a b")],
        "doc_id long, text string",
    )
    # drive the same gram expression through the registry function by
    # monkeypatching its _docs source
    import unittest.mock as mock

    with mock.patch.object(qp, "_docs", lambda spark_, sf_dir_: docs):
        out = {
            (r["gram"], r["n"])
            for r in qp.ngram_top_bigrams(spark, "unused").collect()
        }
    assert out == {("two tokens", 1), ("a b", 2), ("b a", 1)}


def test_compression_ratio_matches_zlib(spark, sf_dir):
    """The mapInPandas compression signal must equal a direct python zlib
    recomputation byte-for-byte (same libz, pinned level), and repeated
    text must compress materially better than the corpus median."""
    import statistics
    import zlib

    from dynaledger_spark.plans.registry import load_all

    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    rows = load_all()["compression_ratio_quality"].build(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == set(docs)
    ratios = []
    for r in rows:
        raw = docs[r["doc_id"]].encode("utf-8")
        comp = zlib.compress(raw, 6)
        assert r["raw_len"] == len(raw)
        assert r["compressed_len"] == len(comp)
        assert r["compression_ratio"] == round(len(comp) / len(raw), 6)
        ratios.append(r["compression_ratio"])
    # sanity: a pathological 50x-repeated text compresses far below median
    rep = ("lorem ipsum " * 50).strip().encode()
    assert len(zlib.compress(rep, 6)) / len(rep) < statistics.median(ratios)


def test_tokenize_to_ids_oov_path(spark, tmp_path):
    """On a corpus with singleton (sub-min-count) words, tokenize_to_ids
    must emit -1 at exactly those positions — the testdata's vocabulary
    fits entirely in the 500-slot budget, so this path only fires here."""
    from dynaledger_spark.plans.registry import load_all

    rows = [
        (0, "alpha beta alpha uniqueword1", "en", "s0", 28),
        (1, "beta alpha beta uniqueword2", "en", "s0", 27),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    out = {
        r["doc_id"]: r
        for r in load_all()["tokenize_to_ids"].build(spark, d).collect()
    }
    # vocab (count desc, word asc): alpha(3)=0, beta(3)=1; singletons OOV
    assert out[0]["token_ids"] == "0 1 0 -1"
    assert out[1]["token_ids"] == "1 0 1 -1"
    assert out[0]["n_oov"] == 1 and out[1]["n_oov"] == 1
    assert out[0]["n_tokens"] == 4
