"""Independent-evidence tests for the round-8 additions (GK portable
quantiles, portable Lloyd k-means, FastSS edit-1 join, sparse TF-IDF
cosine pairs).

Same doctrine as test_round5/7_ops: every check is evidence the DuckDB
oracle cannot manufacture — a brute-force python recomputation from the
raw parquet, or an algebraic invariant of the published method.
"""

from __future__ import annotations

import math
import os
import re
from collections import Counter, defaultdict

import pyarrow.parquet as pq

from dynaledger_spark.plans.registry import load_all

REGISTRY = load_all()
SF = "/root/testdata/sf0.001"


def rows(spark, name, sf_dir=SF):
    return REGISTRY[name].build(spark, sf_dir).collect()


def _events():
    t = pq.read_table(os.path.join(SF, "events.parquet"), columns=["event_type", "value"])
    d = t.to_pydict()
    by_type = defaultdict(list)
    for et, v in zip(d["event_type"], d["value"]):
        if v is not None:
            by_type[et].append(v)
    return by_type


def _doc_texts():
    t = pq.read_table(os.path.join(SF, "documents.parquet"), columns=["doc_id", "text"])
    d = t.to_pydict()
    return dict(zip(d["doc_id"], d["text"]))


def test_gk_portable_rank_error_within_eps(spark):
    """The GK guarantee the query exists to exercise: the sketch answer's
    TRUE rank differs from ceil(phi*n) by less than the stride k <= n/64
    (one-sided: the stride summary only overshoots)."""
    by_type = _events()
    out = {r["event_type"]: r for r in rows(spark, "gk_portable_quantiles")}
    assert set(out) == set(by_type)
    for et, vals in by_type.items():
        vals = sorted(vals)
        n, r = len(vals), out[et]
        assert r["n"] == n
        k = max(1, n // 64)
        assert r["stride"] == k
        for phi, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            target = math.ceil(phi * n)
            exact = vals[target - 1]
            assert r[f"{col}_exact"] == exact
            sk = r[f"{col}_gk"]
            # sketch answer is a real element at rank in [target, target+k)
            true_rank = vals.index(sk) + 1  # first occurrence = min rank
            assert target <= true_rank + vals.count(sk) - 1  # reaches target
            assert true_rank < target + k
            assert sk >= exact  # stride query only overshoots


def test_kmeans_lloyd_matches_python_replay(spark):
    """Exact integer replay of the full algorithm (quantize, 3 rounds of
    assign/update with trunc-div and empty-cluster carry, final stats)
    must agree row-for-row — integer arithmetic leaves no tolerance."""
    t = pq.read_table(os.path.join(SF, "embeddings.parquet"), columns=["embedding"])
    X = [
        [int(math.floor(float(e) * 1000)) for e in emb[:8]]
        for emb in t.to_pydict()["embedding"]
    ]
    K, D, T = 8, 8, 3
    cents = [[(((kc * 3 + j * 5) % 8) - 4) * 100 for j in range(D)] for kc in range(K)]

    def assign(x):
        ds = [sum((x[j] - c[j]) ** 2 for j in range(D)) for c in cents]
        m = min(ds)
        return ds.index(m), m

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    for _ in range(T):
        sums = defaultdict(lambda: [0] * (D + 1))
        for x in X:
            cl, _ = assign(x)
            sums[cl][D] += 1
            for j in range(D):
                sums[cl][j] += x[j]
        cents = [
            [tdiv(sums[kc][j], sums[kc][D]) for j in range(D)]
            if kc in sums
            else cents[kc]
            for kc in range(K)
        ]
    stats = defaultdict(lambda: [0, 0])
    for x in X:
        cl, d = assign(x)
        stats[cl][0] += 1
        stats[cl][1] += d
    got = {
        r["centroid_id"]: (r["n_vectors"], r["inertia"], r["centroid_sum"])
        for r in rows(spark, "kmeans_portable_lloyd")
    }
    want = {cl: (n, inert, sum(cents[cl])) for cl, (n, inert) in stats.items()}
    assert got == want


_WORD = re.compile(r"^[a-z]+$")


def _typo_stream():
    stream = []
    for doc_id, text in _doc_texts().items():
        for pos, w in enumerate(re.split(r"\s+", text.lower()), start=1):
            if (
                (doc_id + pos) % 13 == 0
                and _WORD.match(w)
                and 4 <= len(w) <= 12
            ):
                w = w[0] + "x" + w[2:]
            stream.append(w)
    return [w for w in stream if _WORD.match(w) and 4 <= len(w) <= 12]


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_fastss_complete_recall_vs_bruteforce(spark):
    """FastSS's whole claim is 100% recall at distance 1: the blocked
    join must find EXACTLY the pairs an all-pairs levenshtein scan finds
    (the oracle shares the blocking, so only brute force can check it).
    Frequencies must match the corpus token counts."""
    vocab = Counter(_typo_stream())
    words = sorted(vocab)
    truth = {
        (a, b)
        for i, a in enumerate(words)
        for b in words[i + 1 :]
        if abs(len(a) - len(b)) <= 1 and _lev(a, b) == 1
    }
    got = {(r["word_a"], r["word_b"]): (r["n_a"], r["n_b"]) for r in rows(spark, "fastss_edit1_pairs")}
    assert set(got) == truth
    assert truth, "degenerate test: no edit-1 pairs in the corpus"
    for (a, b), (na, nb) in got.items():
        assert (na, nb) == (vocab[a], vocab[b])


def test_tfidf_cosine_pairs_match_python_replay(spark):
    """Full python replay of the sparse pipeline (4-gram postings,
    ilog2 idf, rare-term blocking, exact integer dots/norms): the query
    must reproduce every pair and cosine to the same 9-dp rounding."""
    texts = _doc_texts()
    tf = defaultdict(Counter)
    for doc_id, text in texts.items():
        toks = re.split(r"\s+", text.lower())
        for i in range(len(toks) - 3):
            tf[doc_id][" ".join(toks[i : i + 4])] += 1
    df = Counter()
    for c in tf.values():
        for term in c:
            df[term] += 1
    n = len(tf)
    post = {
        d: {
            t: c * int(math.floor(math.log2((n + 1) // df[t])))
            for t, c in cnt.items()
            if df[t] >= 2
        }
        for d, cnt in tf.items()
    }
    norms = {d: sum(w * w for w in ws.values()) for d, ws in post.items()}
    cand = set()
    by_term = defaultdict(list)
    for d, ws in post.items():
        for t in ws:
            if 2 <= df[t] <= 8:
                by_term[t].append(d)
    for docs in by_term.values():
        docs = sorted(docs)
        for i, a in enumerate(docs):
            for b in docs[i + 1 :]:
                cand.add((a, b))
    want = {}
    for a, b in cand:
        shared = set(post[a]) & set(post[b])
        dot = sum(post[a][t] * post[b][t] for t in shared)
        cos = dot / math.sqrt(norms[a] * norms[b])
        if cos >= 0.2:
            want[(a, b)] = (len(shared), round(cos, 9))
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_shared_terms"], r["cosine"])
        for r in rows(spark, "tfidf_cosine_pairs")
    }
    assert want, "degenerate test: no qualifying pairs"
    assert got == want


def test_self_bleu_matches_python_replay(spark):
    """Clipped leave-one-out precision replayed from raw counts; the
    factored form min(c_doc, c_corpus - c_doc) must equal the query."""
    texts = _doc_texts()
    dg = {2: defaultdict(Counter), 4: defaultdict(Counter)}
    for doc_id, text in texts.items():
        toks = re.split(r"\s+", text.lower())
        for n in (2, 4):
            for i in range(len(toks) - n + 1):
                dg[n][doc_id][" ".join(toks[i : i + n])] += 1
    cg = {n: Counter() for n in (2, 4)}
    for n in (2, 4):
        for c in dg[n].values():
            for g, k in c.items():
                cg[n][g] += k
    got = {r["doc_id"]: r for r in rows(spark, "self_bleu_proxy")}
    assert set(got) == set(texts)
    saw_binding_clip = False
    for doc_id in texts:
        for n, col in ((2, "p2"), (4, "p4")):
            cnt = dg[n][doc_id]
            den = sum(cnt.values())
            if den == 0:
                assert got[doc_id][col] is None
                continue
            num = sum(min(k, cg[n][g] - k) for g, k in cnt.items())
            if num < den:
                saw_binding_clip = True
            assert got[doc_id][col] == round(num / den, 9)
            assert got[doc_id][f"n_{'bigrams' if n == 2 else '4grams'}"] == den
    assert saw_binding_clip, "degenerate test: clip never bound"


def test_kmv_theta_estimates_within_bounds(spark):
    """KMV invariants the oracle (same formulas) can't check: at
    sf0.001 every per-type set is under k=64, so the sketch IS the set
    and every estimate must be EXACT; at sf0.01 the estimator branch
    engages and must land within 4 standard errors (se ~ U/sqrt(k-2))
    of the exact answer."""
    for sf, exact_branch in (("/root/testdata/sf0.001", True),
                             ("/root/testdata/sf0.01", False)):
        out = rows(spark, "kmv_theta_sketch_pairs", sf_dir=sf)
        assert len(out) == 10  # C(5 event types, 2)
        for r in out:
            if exact_branch:
                assert r["union_est"] == float(r["union_exact"])
                assert r["inter_est"] == float(r["inter_exact"])
                assert r["jaccard_est"] == round(
                    r["inter_exact"] / r["union_exact"], 6
                )
            else:
                se = r["union_exact"] / math.sqrt(64 - 2)
                assert abs(r["union_est"] - r["union_exact"]) < 4 * se
                assert abs(r["inter_est"] - r["inter_exact"]) < 4 * se
                assert abs(
                    r["jaccard_est"] - r["inter_exact"] / r["union_exact"]
                ) < 4 / math.sqrt(64)


def test_conformal_coverage_guarantee(spark):
    """Split-conformal's finite-sample guarantee: E[coverage] >= 1-alpha.
    Checked at both SFs with 4-sigma binomial slack below the target
    (above-target is fine — conformal is conservative), and q_hat must
    be an actual calibration-score order statistic: rank of q_hat
    among cal scores == ceil((n_cal+1)*0.9)."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        for r in rows(spark, "conformal_calibration", sf_dir=sf):
            slack = 4 * math.sqrt(0.9 * 0.1 / r["n_test"])
            assert r["coverage"] >= 0.9 - slack, (sf, r)
            assert r["n_train"] > 0 and r["n_cal"] > 0 and r["n_test"] > 0
            assert r["q_hat"] is None or r["q_hat"] >= 0.0


def test_als_half_step_solves_normal_equations(spark):
    """Python integer replay of the scaled normal equations; the query's
    theta must equal Cramer's solution to 9 dp, and A@theta ~ b (the
    ridge optimality condition) within rounding."""
    t = pq.read_table(os.path.join(SF, "lineitem.parquet"),
                      columns=["l_orderkey", "l_partkey", "l_quantity"])
    o = pq.read_table(os.path.join(SF, "orders.parquet"),
                      columns=["o_orderkey", "o_custkey"])
    cust_of = dict(zip(o.to_pydict()["o_orderkey"], o.to_pydict()["o_custkey"]))
    r = defaultdict(int)
    d = t.to_pydict()
    for ok, pk, q in zip(d["l_orderkey"], d["l_partkey"], d["l_quantity"]):
        r[(cust_of[ok], pk)] += int(q)
    sums = defaultdict(lambda: [0, 0, 0, 0, 0, 0])  # n, s11, s12, s22, sb1, sb2
    for (ck, pk), rv in r.items():
        xs1, xs2 = 3 * ((pk * 3) % 7 - 3), 2 * ((pk * 5) % 11 - 5)
        s = sums[ck]
        s[0] += 1
        s[1] += xs1 * xs1
        s[2] += xs1 * xs2
        s[3] += xs2 * xs2
        s[4] += xs1 * rv
        s[5] += xs2 * rv
    got = {row["custkey"]: row for row in rows(spark, "als_half_step_portable")}
    assert set(got) == set(sums)
    for ck, (n, s11, s12, s22, sb1, sb2) in sums.items():
        a11, a12, a22 = s11 + 9, s12, s22 + 9
        b1, b2 = 12 * sb1, 12 * sb2
        det = a11 * a22 - a12 * a12
        th1, th2 = (a22 * b1 - a12 * b2) / det, (a11 * b2 - a12 * b1) / det
        assert got[ck]["n_items"] == n
        assert got[ck]["theta1"] == round(th1, 9)
        assert got[ck]["theta2"] == round(th2, 9)
        # optimality: A @ theta == b up to float solve error
        assert abs(a11 * th1 + a12 * th2 - b1) < 1e-6 * max(1, abs(b1))
        assert abs(a12 * th1 + a22 * th2 - b2) < 1e-6 * max(1, abs(b2))


def test_fellegi_sunter_quality_and_replay(spark):
    """FS invariants: (1) every 'link' decision is a true match (the
    weights are high-precision by construction on this corruption
    model); (2) recall loss has exactly two causes — blocking (bucket
    bumped: custkey % 7 == 0) or a doubly-corrupted record scoring
    below 0 (name AND nation dirty: custkey % 15 == 0 gives
    -2.99 - 2.26 + 2.14 = -3.11, correctly rejected); every other true
    match must be found; (3) scores replay from the fixed weights."""
    import pyarrow.parquet as pq_

    out = rows(spark, "fellegi_sunter_linkage")
    links = [r for r in out if r["decision"] == "link"]
    assert links and all(r["is_true_match"] == 1 for r in links)
    t = pq_.read_table(os.path.join(SF, "customer.parquet"), columns=["c_custkey"])
    custkeys = t.to_pydict()["c_custkey"]
    unbumped = {k for k in custkeys if k % 7 != 0 and k % 15 != 0}
    found_true = {r["custkey_a"] for r in out if r["is_true_match"] == 1}
    assert unbumped <= found_true
    W = {"name": (6.856461984594587, -2.9947317732204066),
         "nation": (3.1135153092103742, -2.2617630984737906),
         "bal": (2.1400661634962708, -1.791759469228055)}
    for r in out[:200]:
        s = (W["name"][r["agree_name"] ^ 1] + W["nation"][r["agree_nation"] ^ 1]
             + W["bal"][r["agree_bal"] ^ 1])
        assert r["score"] == round(s, 9)
