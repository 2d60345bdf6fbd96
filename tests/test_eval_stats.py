"""Eval-stats family (queries_eval): python mirrors for PMI, the
clustering-agreement combinatorics, and per-dimension MI. The mirrors
reproduce the repo's float discipline (sequential folds, round-at-12
ln terms), so comparisons are exact, not approximate."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row

from dynaledger_spark.plans.registry import load_all

REGISTRY = load_all()

PROP = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# ---------------------------------------------------------------------------
# PMI ≡ python brute force
# ---------------------------------------------------------------------------
@PROP
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from([f"w{i}" for i in range(6)]), min_size=1, max_size=30
        ).map(" ".join),
        min_size=1,
        max_size=10,
    )
)
def test_pmi_matches_bruteforce(spark, tmp_path_factory, docs):
    d = tmp_path_factory.mktemp("pmi_docs")
    spark.createDataFrame(
        [
            Row(doc_id=i, text=t, lang="en", source="src0", n_chars=len(t))
            for i, t in enumerate(docs)
        ]
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))

    got = [
        (r["w1"], r["w2"], r["n12"], r["pmi"])
        for r in REGISTRY["pmi_collocations"].build(spark, str(d)).collect()
    ]

    bi = []
    for t in docs:
        toks = t.split(" ")
        bi += list(zip(toks, toks[1:]))
    joint = Counter(bi)
    firsts = Counter(w1 for w1, _ in bi)
    seconds = Counter(w2 for _, w2 in bi)
    T = len(bi)
    want = [
        (w1, w2, n, round(math.log(n * T / (firsts[w1] * seconds[w2])), 12))
        for (w1, w2), n in joint.items()
        if n >= 5
    ]
    want.sort(key=lambda r: (-r[3], r[0], r[1]))
    assert got == want[:30]


# ---------------------------------------------------------------------------
# Clustering eval ≡ python mirror on the real embeddings
# ---------------------------------------------------------------------------
def test_clustering_eval_matches_python(spark, sf_dir):
    from dynaledger_spark.plans.queries_vector import _centroids, _emb

    row = REGISTRY["clustering_eval_ari"].build(spark, sf_dir).collect()[0]

    cents = _centroids()
    cont: dict[tuple[int, int], int] = defaultdict(int)
    for r in _emb(spark, sf_dir).select("embedding", "label").collect():
        vec = r["embedding"]
        dists = []
        for c in cents:
            acc = 0.0  # same sequential IEEE fold as F.aggregate
            for x, y in zip(vec, c):
                xd = float(x)
                acc += (xd - y) * (xd - y)
            dists.append(acc)
        m = min(dists)
        cell = dists.index(m)  # first index attaining the min
        cont[(cell, r["label"])] += 1

    n = sum(cont.values())
    comb2 = lambda v: v * (v - 1) // 2  # noqa: E731
    cells = defaultdict(int)
    labels = defaultdict(int)
    maj = defaultdict(int)
    for (c, l), v in cont.items():
        cells[c] += v
        labels[l] += v
        maj[c] = max(maj[c], v)
    sum_comb = sum(comb2(v) for v in cont.values())
    sum_a = sum(comb2(v) for v in cells.values())
    sum_b = sum(comb2(v) for v in labels.values())
    comb_n = comb2(n)
    assert row["n_vectors"] == n
    assert row["n_cells"] == len(cells)
    assert row["purity"] == round(sum(maj.values()) / n, 9)
    assert row["rand_index"] == round(
        (comb_n + 2 * sum_comb - sum_a - sum_b) / comb_n, 9
    )
    assert row["ari"] == round(
        2 * (comb_n * sum_comb - sum_a * sum_b)
        / (comb_n * (sum_a + sum_b) - 2 * sum_a * sum_b),
        9,
    )
    # sanity: the metrics mean something on this data
    assert 0.0 < row["purity"] <= 1.0
    assert -1.0 <= row["ari"] <= 1.0


# ---------------------------------------------------------------------------
# Per-dimension MI ≡ python mirror; MI is non-negative up to term rounding
# ---------------------------------------------------------------------------
def test_feature_mi_matches_python(spark, sf_dir):
    from dynaledger_spark.plans.queries_vector import _emb

    got = {
        r["dim"]: r["mi"]
        for r in REGISTRY["feature_mi_by_dim"].build(spark, sf_dir).collect()
    }
    assert sorted(got) == list(range(64))

    rows = _emb(spark, sf_dir).select("embedding", "label").collect()
    n = len(rows)
    labels = Counter(r["label"] for r in rows)
    for dim in (0, 7, 33, 63):  # spot-check four dimensions exactly
        joint = Counter()
        margin_s = Counter()
        for r in rows:
            pos = float(r["embedding"][dim]) >= 0
            joint[(pos, r["label"])] += 1
            margin_s[pos] += 1
        terms = [
            n_sl * round(math.log(n_sl * n / (margin_s[s] * labels[l])), 12)
            for (s, l), n_sl in joint.items()
        ]
        acc = 0.0
        for t in sorted(terms):  # the repo's sorted fold
            acc += t
        assert got[dim] == round(acc / n, 9), dim
    # MI >= 0 mathematically; rounding at 12 can only wiggle ~1e-9
    assert all(v >= -1e-8 for v in got.values())


# ---------------------------------------------------------------------------
# Incremental MinHash ≡ full run restricted to new-batch pairs
# ---------------------------------------------------------------------------
def test_minhash_incremental_is_exact_subset(spark, sf_dir):
    """The incremental run must produce EXACTLY the full run's pairs
    whose higher id is in the new batch — no pair lost at the bucket
    boundary, none invented."""
    from dynaledger_spark.catalog import read_table

    cutoff = (
        read_table(spark, sf_dir, "documents").agg(
            {"doc_id": "max"}
        ).collect()[0][0]
        * 4
        // 5
    )
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in REGISTRY["minhash_portable_pairs"].build(spark, sf_dir).collect()
    }
    inc = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in REGISTRY["minhash_portable_incremental"]
        .build(spark, sf_dir)
        .collect()
    }
    want = {k: v for k, v in full.items() if max(k) >= cutoff}
    assert inc == want
    assert inc, "testdata must exercise the incremental path"


# ---------------------------------------------------------------------------
# Markov sequence score ≡ python mirror
# ---------------------------------------------------------------------------
def test_markov_score_matches_python(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = {
        r["user_id"]: (r["n_transitions"], r["avg_loglik"])
        for r in REGISTRY["markov_sequence_score"].build(spark, sf_dir).collect()
    }

    rows = (
        read_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    by_user: dict[int, list] = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    pairs = []
    for u, evs in by_user.items():
        evs.sort()
        pairs += [(u, a[2], b[2]) for a, b in zip(evs, evs[1:])]
    trans = Counter((p, c) for _, p, c in pairs)
    margins = Counter(p for _, p, _ in pairs)
    per_user = Counter((u, p, c) for u, p, c in pairs)
    want = {}
    users = {u for u, _, _ in pairs}
    for u in users:
        terms = sorted(
            n * round(math.log(trans[(p, c)] / margins[p]), 12)
            for (uu, p, c), n in per_user.items()
            if uu == u
        )
        total = sum(n for (uu, _, _), n in per_user.items() if uu == u)
        acc = 0.0
        for t in terms:
            acc += t
        want[u] = (total, round(acc / total, 9))
    assert got == want
