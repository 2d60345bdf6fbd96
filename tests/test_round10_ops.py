"""Round-10 additions: the RAG retrieval composition."""

from __future__ import annotations

import os
from collections import defaultdict

from dynaledger_spark.plans.registry import load_all
from dynaledger_spark.plans.queries_retrieval import _RAG_CHUNK_STRIDE

REGISTRY = load_all()


def _doc_rows(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    return read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()


def test_rag_pipeline_decontamination_and_ranks(spark, sf_dir):
    """Invariants the oracle can't state as directly: every retrieved
    chunk comes from a NON-benchmark doc that shares no 5-gram with any
    benchmark doc (the decontamination guarantee — a RAG system must
    never surface eval passages), ranks are dense 1..k per query with
    cosine non-increasing, and the result is non-empty (a 0-row pass
    would be vacuous)."""
    out = REGISTRY["rag_pipeline_e2e"].build(spark, sf_dir).collect()
    assert len(out) > 10  # non-vacuous

    # chunk_id encoding headroom: the stride must exceed any doc's chunk
    # count by orders of magnitude, else two docs' chunks collide and
    # merge silently (the oracle shares the formula, so parity alone
    # cannot catch it — this guard can)
    import pandas as _pd

    texts = _pd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    max_chunks = max(
        -(-max(len(t.split()) - 8, 1) // 24) for t in texts.text
    )
    assert max_chunks * 100 < _RAG_CHUNK_STRIDE, (
        f"chunk stride {_RAG_CHUNK_STRIDE} too tight for max {max_chunks} chunks/doc"
    )

    # python re-derivation of the contaminated set (independent of the
    # Spark shingle machinery)
    docs = _doc_rows(spark, sf_dir)
    grams: dict[int, set] = {}
    for r in docs:
        t = r["text"].split()
        n = len(t)
        grams[r["doc_id"]] = {
            " ".join(t[i : i + 5]) for i in range(max(n - 4, 1))
        }
    bench_docs = {d for d in grams if d % 97 == 0}
    bench_grams = set().union(*(grams[d] for d in bench_docs)) if bench_docs else set()
    contaminated = {
        d for d, g in grams.items() if d not in bench_docs and g & bench_grams
    }

    by_query = defaultdict(list)
    for r in out:
        src_doc = r["retrieved_chunk"] // _RAG_CHUNK_STRIDE
        assert src_doc % 97 != 0, "retrieved a benchmark passage"
        assert src_doc not in contaminated, (
            f"retrieved chunk from contaminated doc {src_doc}"
        )
        assert r["query_chunk"] // _RAG_CHUNK_STRIDE in bench_docs
        assert -1.0 - 1e-9 <= r["cosine"] <= 1.0 + 1e-9
        by_query[r["query_chunk"]].append((r["rnk"], r["cosine"]))
    for q, rows in by_query.items():
        rows.sort()
        assert [rk for rk, _ in rows] == list(range(1, len(rows) + 1)), (
            f"ranks not dense for query {q}: {rows}"
        )
        cosines = [c for _, c in rows]
        assert all(a >= b for a, b in zip(cosines, cosines[1:])), (
            f"cosine not non-increasing for query {q}: {cosines}"
        )


def test_rag_pipeline_retrieval_replay(spark, sf_dir):
    """Plain-python replay of the whole retrieval half (chunk → signed
    feature hash → dominant-dim cell → 1-probe top-3 by cosine) from the
    raw documents — independent of both engines' SQL machinery.  The
    md5 polynomial and integer arithmetic make the replay exact."""
    import hashlib
    import math

    out = REGISTRY["rag_pipeline_e2e"].build(spark, sf_dir).collect()
    docs = _doc_rows(spark, sf_dir)

    def h40(w: str) -> int:
        return int(hashlib.md5(w.encode()).hexdigest()[:10], 16)

    # chunk + embed
    feats: dict[int, dict[int, int]] = {}
    doc_of: dict[int, int] = {}
    for r in docs:
        t = r["text"].split(" ")
        n_chunks = math.ceil(max(len(t) - 8, 1) / 24.0)
        for i in range(int(n_chunks)):
            words = t[i * 24 : i * 24 + 32]
            if not words:
                continue
            cid = r["doc_id"] * _RAG_CHUNK_STRIDE + i
            doc_of[cid] = r["doc_id"]
            vec: dict[int, int] = defaultdict(int)
            for w in words:
                h = h40(w)
                vec[h % 16] += 1 if (h // 16) % 2 == 0 else -1
            vec = {b: v for b, v in vec.items() if v != 0}
            if vec:
                feats[cid] = vec

    # decontamination (same derivation as the other test)
    grams: dict[int, set] = {}
    for r in docs:
        t = r["text"].split()
        grams[r["doc_id"]] = {
            " ".join(t[i : i + 5]) for i in range(max(len(t) - 4, 1))
        }
    bench_docs = {d for d in grams if d % 97 == 0}
    bench_grams = set().union(*(grams[d] for d in bench_docs))
    contaminated = {
        d for d, g in grams.items() if d not in bench_docs and g & bench_grams
    }

    def cell(vec: dict[int, int]) -> int:
        return min(vec, key=lambda b: (-abs(vec[b]), b))

    cells: dict[int, int] = {cid: cell(v) for cid, v in feats.items()}
    corpus = [
        cid
        for cid in feats
        if doc_of[cid] % 97 != 0 and doc_of[cid] not in contaminated
    ]
    want = {}
    for q in (cid for cid in feats if doc_of[cid] % 97 == 0):
        qv = feats[q]
        nq = sum(v * v for v in qv.values())
        scored = []
        for x in corpus:
            if cells[x] != cells[q]:
                continue
            xv = feats[x]
            dot = sum(qv[b] * xv[b] for b in qv.keys() & xv.keys())
            if not (qv.keys() & xv.keys()):
                continue  # no shared buckets -> pair never materializes
            nx = sum(v * v for v in xv.values())
            scored.append((-(dot / math.sqrt(nq * nx)), x))
        scored.sort()
        for rk, (negc, x) in enumerate(scored[:3], start=1):
            want[(q, rk)] = (x, round(-negc, 12))

    got = {(r["query_chunk"], r["rnk"]): (r["retrieved_chunk"], r["cosine"]) for r in out}
    assert got == want
