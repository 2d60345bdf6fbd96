"""Independent-evidence tests for the round-5 batch-2 families
(finance indicators, governance audits, retrieval, MLM masking).

Same doctrine as test_round5_ops: every check is evidence the DuckDB
oracle cannot manufacture — a brute-force Python recomputation, an
algebraic invariant, or a distributional property.
"""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from dynaledger_spark.plans.registry import load_all

REGISTRY = load_all()


def rows(spark, sf_dir, name):
    return REGISTRY[name].build(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def daily_cents(spark, sf_dir):
    """Daily purchase revenue in cents recomputed row-by-row in Python."""
    from dynaledger_spark.catalog import read_table

    ev = read_table(spark, sf_dir, "events").select("ts", "event_type", "value")
    per_day: dict = defaultdict(int)
    for r in ev.collect():
        if r.event_type == "purchase":
            # Decimal-exact cents, same as round(value*100) on a 2dp double
            # (test_featurestore precedent)
            per_day[r.ts.date()] += int(round(r.value * 100))
    return dict(sorted(per_day.items()))


def test_drawdown_vs_brute_force(spark, sf_dir, daily_cents):
    got = rows(spark, sf_dir, "max_drawdown_daily_revenue")
    peak = 0
    dd = []
    for day, cents in daily_cents.items():
        peak = max(peak, cents)
        if peak > 0:
            dd.append((peak - cents, day.isoformat(), cents, peak))
    expect = sorted(dd, key=lambda t: (-t[0], t[1]))[:10]
    assert [(r.dd_cents, r.day, r.cents, r.peak_cents) for r in got] == expect
    for r in got:
        assert 0 <= r.dd_frac <= 1


def test_rsi_vs_brute_force(spark, sf_dir, daily_cents):
    got = {r.day: (r.gain14, r.loss14, r.rsi) for r in rows(spark, sf_dir, "rsi_14_daily_revenue")}
    series = list(daily_cents.items())
    diffs = [
        (series[i][0], series[i][1] - series[i - 1][1])
        for i in range(1, len(series))
    ]
    for i in range(13, len(diffs)):
        window = [d for _, d in diffs[i - 13 : i + 1]]
        g = sum(d for d in window if d > 0)
        l = sum(-d for d in window if d < 0)
        day = diffs[i][0].isoformat()
        rsi = 50.0 if g + l == 0 else round(100.0 * g / (g + l), 9)
        assert got[day][0] == g and got[day][1] == l
        assert got[day][2] == pytest.approx(rsi, abs=1e-9)
    assert len(got) == max(0, len(diffs) - 13)


def test_bollinger_vs_brute_force(spark, sf_dir, daily_cents):
    got = {r.day: r.breakout for r in rows(spark, sf_dir, "bollinger_breakout_days")}
    series = list(daily_cents.items())
    expect = {}
    for i in range(6, len(series)):
        window = [c for _, c in series[i - 6 : i + 1]]
        s1, s2 = sum(window), sum(c * c for c in window)
        mean = s1 / 7.0
        sd = math.sqrt((s2 - s1 * s1 / 7.0) / 6.0)
        c = series[i][1]
        if c > mean + 1.25 * sd:
            expect[series[i][0].isoformat()] = "hi"
        elif c < mean - 1.25 * sd:
            expect[series[i][0].isoformat()] = "lo"
    assert got == expect
    assert expect, "band multiplier should produce at least one breakout day"


def test_hhi_bounds_and_consistency(spark, sf_dir):
    for r in rows(spark, sf_dir, "revenue_concentration_hhi"):
        # HHI of n equal shares is 1/n; of a monopoly is 1
        assert 1.0 / r.n_customers <= r.hhi + 1e-9
        assert r.hhi <= 1.0 + 1e-9
        assert 0 < r.top_share <= 1.0
        # the largest customer alone contributes top_share^2 to HHI
        assert r.hhi >= r.top_share**2 - 1e-9


def test_schema_drift_halves_partition_the_table(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = {r.metric: (r.h0, r.h1) for r in rows(spark, sf_dir, "schema_drift_report")}
    total = read_table(spark, sf_dir, "orders").count()
    assert got["row_count"][0] + got["row_count"][1] == total
    # parity split keeps both halves' stats near each other on synth data
    assert got["min_totalprice"][0] > 0 and got["min_totalprice"][1] > 0


def test_freshness_invariants(spark, sf_dir):
    got = rows(spark, sf_dir, "freshness_lag_by_type")
    assert got, "at least one event stream"
    assert all(r.lag_hours >= 0 for r in got)
    assert min(r.lag_hours for r in got) == 0  # some stream holds the watermark
    assert all(0.0 <= r.share_last_7d <= 1.0 for r in got)


def test_l_diversity_entropy_bounded_by_log_l(spark, sf_dir):
    got = rows(spark, sf_dir, "l_diversity_audit")
    assert got
    for r in got:
        assert 1 <= r.l_distinct <= 5  # five market segments exist
        assert r.l_distinct <= r.k
        # entropy of l outcomes is at most ln(l), achieved when uniform
        assert -1e-9 <= r.entropy_l <= math.log(r.l_distinct) + 1e-9
    # result is the worst (least diverse) groups: all l values ≤ any other
    # group's l is not checkable from the slice alone, but the slice itself
    # must be sorted ascending by l_distinct
    ls = [r.l_distinct for r in got]
    assert ls == sorted(ls)


def test_fk_scorecard_matches_direct_counts(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = {r.edge: r for r in rows(spark, sf_dir, "fk_orphan_scorecard")}
    assert set(got) == {
        "lineitem->orders", "lineitem->part", "lineitem->supplier",
        "orders->customer", "customer->nation", "supplier->nation",
    }
    li = read_table(spark, sf_dir, "lineitem")
    orders = read_table(spark, sf_dir, "orders")
    assert got["lineitem->orders"].child_rows == li.count()
    assert got["orders->customer"].child_rows == orders.count()
    # the synthetic generator is referentially intact
    for r in got.values():
        assert r.orphans == 0 and r.orphan_rate == 0.0


def test_dp_noise_is_laplace_and_reproducible(spark, sf_dir):
    a = rows(spark, sf_dir, "dp_noisy_counts")
    b = rows(spark, sf_dir, "dp_noisy_counts")
    assert a == b  # deterministic release
    for r in a:
        assert r.noisy_count == pytest.approx(r.true_count + r.noise, abs=1e-6)
        # Laplace(b=1) quantile bound: |noise| = -ln(1-2|u|) with
        # |u| <= 0.4999995 -> |noise| <= ln(1e6)
        assert abs(r.noise) <= math.log(1_000_000.0) + 1e-9


def test_bm25_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table
    from dynaledger_spark.plans.queries_retrieval import B, K1, QUERY_TERMS

    docs = [
        (r.doc_id, r.text.split(" "))
        for r in read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ]
    n_docs = len(docs)
    avgdl = sum(len(t) for _, t in docs) / n_docs
    df = {
        t: sum(1 for _, toks in docs if t in toks) for t in QUERY_TERMS
    }
    scored = []
    for doc_id, toks in docs:
        s = 0.0
        hit = False
        for t in QUERY_TERMS:
            tf = toks.count(t)
            if tf == 0:
                s += 0.0
                continue
            hit = True
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (tf * (K1 + 1.0)) / (
                tf + K1 * (1.0 - B + B * (len(toks) / avgdl))
            )
        if hit:
            scored.append((doc_id, round(s, 9)))
    expect = sorted(scored, key=lambda t: (-t[1], t[0]))[:20]
    got = [(r.doc_id, r.bm25) for r in rows(spark, sf_dir, "bm25_topk_docs")]
    assert [d for d, _ in got] == [d for d, _ in expect]
    for (_, g), (_, e) in zip(got, expect):
        assert g == pytest.approx(e, abs=1e-8)


def test_rrf_recomputes_from_ranks(spark, sf_dir):
    got = rows(spark, sf_dir, "rrf_hybrid_topk")
    assert got
    for r in got:
        expect = 0.0
        if r.r_lex is not None:
            expect += 1.0 / (60.0 + r.r_lex)
        if r.r_dense is not None:
            expect += 1.0 / (60.0 + r.r_dense)
        assert r.rrf == pytest.approx(expect, abs=1e-9)
        assert r.r_lex is not None or r.r_dense is not None
    # the fused list must contain any doc ranked #1 by either retriever:
    # 1/61 alone beats the best possible double-miss score of docs outside
    # both top-100 lists (0), and beats two mid-list memberships only when
    # 1/(60+a)+1/(60+b) < 1/61 is false — so just assert membership
    tops = [r.doc_id for r in got]
    lex_first = next(r.doc_id for r in got if r.r_lex == 1) if any(
        r.r_lex == 1 for r in got
    ) else None
    assert lex_first is None or lex_first in tops


def test_mlm_mask_rate_and_checksum(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = {r.doc_id: r for r in rows(spark, sf_dir, "mlm_mask_positions")}
    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    total_tokens = total_masked = 0
    for d in docs:
        n = len(d.text.split(" "))
        masked = [
            p
            for p in range(n)
            if (((d.doc_id * 1000003 + p) % 1000000007) * 2654435761)
            % 1000000007
            % 100
            < 15
        ]
        r = got[d.doc_id]
        assert r.n_tokens == n
        assert r.n_masked == len(masked)
        assert r.mask_pos_sum == sum(masked)
        total_tokens += n
        total_masked += len(masked)
    # realized corpus-level mask rate concentrates near 15%
    rate = total_masked / total_tokens
    assert 0.10 < rate < 0.20, rate


def test_psi_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = {r.event_type: r for r in rows(spark, sf_dir, "psi_feature_drift")}
    ev = read_table(spark, sf_dir, "events").select("event_type", "ts", "value").collect()
    cells = defaultdict(lambda: [[0] * 10, [0] * 10])
    for r in ev:
        half = 0 if r.ts.day <= 15 else 1
        b = min(int(r.value // 40), 9)
        cells[r.event_type][half][b] += 1
    for et, (ref, cur) in cells.items():
        n_ref, n_cur = sum(ref), sum(cur)
        psi = 0.0
        terms = []
        for b in range(10):
            p = (ref[b] + 0.5) / (n_ref + 5.0)
            q = (cur[b] + 0.5) / (n_cur + 5.0)
            terms.append(round((p - q) * math.log(p / q), 12))
        psi = round(math.fsum(terms), 9)
        assert got[et].n_ref == n_ref and got[et].n_cur == n_cur
        assert got[et].psi == pytest.approx(psi, abs=1e-8)
        assert got[et].psi >= -1e-12  # PSI is a symmetrized KL: nonnegative


def test_join_key_skew_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = {r.col: r for r in rows(spark, sf_dir, "join_key_skew_report")}
    freq = defaultdict(int)
    for r in read_table(spark, sf_dir, "events").select("user_id").collect():
        freq[r.user_id] += 1
    row = got["events.user_id"]
    assert row.n_rows == sum(freq.values())
    assert row.n_keys == len(freq)
    assert row.max_freq == max(freq.values())
    top = min(k for k, v in freq.items() if v == row.max_freq)
    assert row.top_key == top
    assert row.skew_ratio >= 1.0  # max >= avg by definition


def test_cluster_prf_accounting(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = rows(spark, sf_dir, "cluster_majority_prf")
    n = read_table(spark, sf_dir, "embeddings").count()
    assert sum(r.n_actual for r in got) == n
    assert sum(r.n_predicted for r in got) == n  # every vector predicted once
    assert sum(r.tp for r in got) <= n
    for r in got:
        assert r.tp <= r.n_actual and r.tp <= r.n_predicted
        assert 0.0 <= r.recall <= 1.0
        if r.prec is not None:
            assert 0.0 <= r.prec <= 1.0
        assert 0.0 <= r.f1 <= 1.0
    # 8 cells cannot predict all 10 labels
    assert any(r.n_predicted == 0 for r in got)


def test_kwic_context_matches_text(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = rows(spark, sf_dir, "kwic_concordance")
    assert got
    texts = {
        r.doc_id: r.text.split(" ")
        for r in read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    for r in got:
        toks = texts[r.doc_id]
        assert toks[r.pos] == "join"
        lo, hi = max(0, r.pos - 3), min(len(toks) - 1, r.pos + 3)
        assert r.context == " ".join(toks[lo : hi + 1])


def test_power_iteration_is_an_eigenpair(spark, sf_dir):
    a = rows(spark, sf_dir, "power_iteration_top_pc")
    b = rows(spark, sf_dir, "power_iteration_top_pc")
    assert a == b  # deterministic
    v = [r.loading for r in sorted(a, key=lambda r: r.dim)]
    lam = a[0].eigenvalue
    assert sum(x * x for x in v) == pytest.approx(1.0, abs=1e-6)
    # rebuild the covariance and check the Rayleigh residual
    cov = rows(spark, sf_dir, "embedding_covariance")
    d = len(v)
    A = [[0.0] * d for _ in range(d)]
    for r in cov:
        A[r.dim_i - 1][r.dim_j - 1] = r.cov
        A[r.dim_j - 1][r.dim_i - 1] = r.cov
    Av = [sum(A[i][k] * v[k] for k in range(d)) for i in range(d)]
    resid = math.sqrt(sum((Av[i] - lam * v[i]) ** 2 for i in range(d)))
    assert lam > 0
    assert resid / lam < 1e-4, (resid, lam)
    # lambda_max of a symmetric matrix dominates every diagonal entry
    assert lam >= max(A[i][i] for i in range(d)) - 1e-9
    # sign canonicalization: the largest-|loading| dim is positive
    assert max(v, key=abs) > 0


def test_ivm_merge_equals_recompute(spark, sf_dir):
    """The IVM invariant, re-derived in Python: merge(base, delta) must
    equal a from-scratch daily recompute, and `touched` must be exactly
    the delta's day set."""
    from dynaledger_spark.catalog import read_table

    got = {r.day: r for r in rows(spark, sf_dir, "ivm_daily_revenue_refresh")}
    full = defaultdict(lambda: [0, 0])
    touched = set()
    for r in read_table(spark, sf_dir, "events").select(
        "event_id", "ts", "event_type", "value"
    ).collect():
        if r.event_type != "purchase":
            continue
        day = r.ts.date().isoformat()
        full[day][0] += int(round(r.value * 100))
        full[day][1] += 1
        if r.event_id % 97 == 0:
            touched.add(day)
    assert set(got) == set(full)
    for day, (cents, n) in full.items():
        assert got[day].cents == cents and got[day].n_events == n
        assert got[day].touched == (day in touched)
    assert touched, "the late-batch filter must select something"
    assert len(touched) < len(full) or len(full) <= 31


def test_cdc_chunks_reassemble_and_shift_resilience(spark, sf_dir):
    """Chunk accounting: per-source total_chars equals the corpus char
    volume; stored <= total; and the CDC property — identical docs
    produce identical chunk multisets (exercised corpus-wide: n_unique
    < n_chunks iff any chunk repeats)."""
    from dynaledger_spark.catalog import read_table

    got = {r.source: r for r in rows(spark, sf_dir, "cdc_chunk_dedup")}
    docs = read_table(spark, sf_dir, "documents").select("source", "text").collect()
    per_source = defaultdict(int)
    for d in docs:
        per_source[d.source] += len(d.text)
    for src, total in per_source.items():
        r = got[src]
        assert r.total_chars == total  # chunks partition every document
        assert 0 < r.stored_chars <= r.total_chars
        assert r.n_unique <= r.n_chunks
        assert r.dedup_savings == pytest.approx(
            1.0 - r.stored_chars / r.total_chars, abs=1e-8
        )


def test_cdc_cut_points_shift_with_content():
    """The defining CDC property vs fixed-size blocks: prepending text
    changes only the leading chunks — the tail chunk sequence
    re-synchronizes. Pure-Python mirror of the query's hash rule."""
    M, W, MASK = 1000000007, 8, 32

    def chunks(text):
        cuts = []
        for i in range(W, len(text) + 1):
            h = 0
            for ch in text[i - W : i]:
                h = (h * 31 + ord(ch)) % M
            if h % MASK == 0:
                cuts.append(i)
        bs = [0] + cuts + [len(text)]
        return [text[a:b] for a, b in zip(bs, bs[1:]) if b > a]

    base = "the quick brown fox jumps over the lazy dog " * 20
    shifted = "PREFIX INSERTED " + base
    c1, c2 = chunks(base), chunks(shifted)
    # the chunk SEQUENCE re-synchronizes after the perturbed head: the
    # common suffix covers all but a bounded number of leading chunks
    # (fixed-size blocks would re-align nowhere after a 16-char shift)
    suffix = 0
    while (
        suffix < min(len(c1), len(c2))
        and c1[-1 - suffix] == c2[-1 - suffix]
    ):
        suffix += 1
    assert suffix >= len(c1) - 3, (suffix, len(c1))


def test_grid_clusters_cover_all_dense_cells(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = rows(spark, sf_dir, "grid_density_clusters")
    assert got, "the density threshold must keep some cells"
    cells = defaultdict(int)
    for r in read_table(spark, sf_dir, "embeddings").select("embedding").collect():
        cx = math.floor(float(r.embedding[0]) / 0.1) + 50
        cy = math.floor(float(r.embedding[1]) / 0.1) + 50
        cells[cx * 1000 + cy] += 1
    n = sum(cells.values())
    minpts = max(3, n // 100)
    dense = {c: k for c, k in cells.items() if k >= minpts}
    assert sum(r.n_cells for r in got) == len(dense)
    assert sum(r.n_points for r in got) == sum(dense.values())
    # every cluster id is a dense cell and the min of its component
    ids = [r.cluster_id for r in got]
    assert all(c in dense for c in ids)
    assert len(set(ids)) == len(ids)


def test_holt_forecast_vs_brute_force(spark, sf_dir, daily_cents):
    got = {r.h: r.forecast_cents for r in rows(spark, sf_dir, "holt_linear_forecast")}
    xs = [float(c) for _, c in sorted(daily_cents.items())]
    l, b = xs[0], xs[1] - xs[0]
    for x in xs[2:]:
        lp = 0.5 * x + 0.5 * (l + b)
        b = 0.3 * (lp - l) + 0.7 * b
        l = lp
    for h in range(1, 8):
        assert got[h] == pytest.approx(round(l + h * b, 6), abs=1e-6)
    # forecasts advance linearly: constant per-step increment = trend
    incs = {round(got[h + 1] - got[h], 4) for h in range(1, 7)}
    assert len(incs) == 1


def test_duckdb_list_reduce_double_struct_aliasing_bug():
    """Pins the DuckDB 1.0 bug that forced holt_linear_forecast's oracle
    onto a recursive CTE: list_reduce with a DOUBLE struct accumulator
    aliases the fields (every output field collapses to the same value
    from the 3rd lambda application), while DECIMAL state folds
    correctly. If this test starts FAILING (i.e. DuckDB fixed it), the
    oracle may return to the simpler fold form."""
    import duckdb

    con = duckdb.connect()
    r = con.execute(
        """
        SELECT list_reduce(
            [struct_pack(l := CAST(1.0 AS DOUBLE), b := CAST(1.0 AS DOUBLE),
                         x := CAST(0.0 AS DOUBLE)),
             struct_pack(l := CAST(0.0 AS DOUBLE), b := CAST(0.0 AS DOUBLE),
                         x := CAST(4.0 AS DOUBLE)),
             struct_pack(l := CAST(0.0 AS DOUBLE), b := CAST(0.0 AS DOUBLE),
                         x := CAST(8.0 AS DOUBLE)),
             struct_pack(l := CAST(0.0 AS DOUBLE), b := CAST(0.0 AS DOUBLE),
                         x := CAST(16.0 AS DOUBLE))],
            (acc, e) -> struct_pack(l := acc.l + acc.b + e.x, b := acc.l,
                                    x := CAST(0.0 AS DOUBLE)))
        """
    ).fetchone()[0]
    # correct left fold would give l=37, b=15; the bug collapses both
    assert r["l"] == r["b"], (
        "DuckDB fixed the DOUBLE-struct list_reduce aliasing — "
        "holt_linear_forecast's oracle can be simplified back to a fold"
    )


def test_t_closeness_bounds_and_grand_group(spark, sf_dir):
    got = rows(spark, sf_dir, "t_closeness_audit")
    assert got
    for r in got:
        # total variation distance lives in [0, 1)
        assert -1e-9 <= r.t_distance < 1.0
        assert r.k >= 2
    # sorted worst-first
    ts = [r.t_distance for r in got]
    assert ts == sorted(ts, reverse=True)
    # a group matching the global mix exactly would score 0; the worst
    # group must deviate more than the best in the slice
    assert ts[0] >= ts[-1]


def test_lang_confusion_accounting(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = rows(spark, sf_dir, "lang_id_confusion")
    n_docs = read_table(spark, sf_dir, "documents").count()
    assert sum(r.n for r in got) == n_docs
    # shares sum to 1 within each actual language
    per_actual = defaultdict(float)
    for r in got:
        per_actual[r.actual_lang] += r.share_of_actual
    for lang, s in per_actual.items():
        assert s == pytest.approx(1.0, abs=1e-6), lang
    # the synthetic corpus draws one shared vocabulary whatever the gold
    # label, so high diagonal accuracy is impossible by construction —
    # the confusion REPORT is the operator under test, not the
    # classifier. Structural checks: the prediction codomain is closed,
    # and the diagonal is populated (gold 'en' docs do hit 'en').
    assert {r.pred_lang for r in got} <= {"de", "en", "es", "fr", "zh", "und"}
    diag = sum(r.n for r in got if r.actual_lang == r.pred_lang)
    assert diag > 0


def test_bpe_merges_match_reference_implementation(spark, sf_dir):
    """The distributed BPE loop must reproduce the textbook trainer
    EXACTLY: same merges, same order, same pair counts — argmax ties
    broken by (count desc, pair lexicographic), merges applied
    left-to-right non-overlapping."""
    from collections import Counter

    from dynaledger_spark.catalog import read_table

    got = [
        (r.merge_rank, r.left, r.right, r.merged, r.pair_count)
        for r in rows(spark, sf_dir, "bpe_learn_merges")
    ]
    words = Counter()
    for r in read_table(spark, sf_dir, "documents").select("text").collect():
        for w in r.text.split(" "):
            if w:
                words[w] += 1
    vocab = {tuple(w): c for w, c in words.items()}
    expect = []
    for rank in range(1, 9):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), n = best
        expect.append((rank, a, b, a + b, n))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    assert got == expect


def test_bpe_apply_matches_reference_and_compresses(spark, sf_dir):
    """Apply the learned merges with the textbook apply loop and
    compare segmentations exactly; BPE must compress (total subwords
    < total chars) once multi-char merges exist."""
    from collections import Counter

    from dynaledger_spark.catalog import read_table

    got = {
        r.w: (r.cnt, r.n_chars, r.n_subwords, r.segmentation)
        for r in rows(spark, sf_dir, "bpe_segment_words")
    }
    merges = [
        (r.left, r.right)
        for r in sorted(
            rows(spark, sf_dir, "bpe_learn_merges"), key=lambda r: r.merge_rank
        )
    ]
    words = Counter()
    for r in read_table(spark, sf_dir, "documents").select("text").collect():
        for w in r.text.split(" "):
            if w:
                words[w] += 1
    assert set(got) == set(words)
    total_chars = total_sub = 0
    for w, cnt in words.items():
        syms = list(w)
        for a, b in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        r = got[w]
        assert r[0] == cnt and r[1] == len(w)
        assert r[2] == len(syms)
        assert r[3] == "·".join(syms)
        total_chars += len(w)
        total_sub += len(syms)
    assert total_sub < total_chars  # the merges actually compress


def test_span_corruption_invariants(spark, sf_dir):
    got = rows(spark, sf_dir, "span_corruption_plan")
    assert got
    tot_tokens = sum(r.n_tokens for r in got)
    tot_corrupted = sum(r.n_corrupted for r in got)
    for r in got:
        # spans are 3 tokens, clipped and merged: coverage bounds
        assert r.n_corrupted <= min(3 * r.n_spans, r.n_tokens)
        assert r.n_corrupted >= r.n_spans  # each span covers >= 1 token
        assert 0.0 <= r.corrupt_rate <= 1.0
    # nominal rate is 3/20 = 15%, but the hash's input domain here is
    # small (doc_id<=499, p<=~60) so the realized start rate drifts
    # (measured ~8%) — assert a loose band plus non-degeneracy
    rate = tot_corrupted / tot_tokens
    assert 0.03 < rate < 0.30, rate
    assert sum(r.n_spans for r in got) > 0


def test_gini_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = {r.segment: r for r in rows(spark, sf_dir, "gini_customer_revenue")}
    cust_seg = {
        r.c_custkey: r.c_mktsegment
        for r in read_table(spark, sf_dir, "customer").collect()
    }
    per = defaultdict(lambda: defaultdict(int))
    for r in read_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice").collect():
        per[cust_seg[r.o_custkey]][r.o_custkey] += int(round(r.o_totalprice * 100))
    for seg, cust in per.items():
        xs = sorted(cust.values())
        n, tot = len(xs), sum(xs)
        g = (2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * tot) / (
            n * tot
        )
        r = got[seg]
        assert r.n_customers == n and r.total_cents == tot
        assert r.gini == pytest.approx(round(g, 9), abs=1e-8)
        assert 0.0 <= r.gini < 1.0


def test_trimmed_mean_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = {r.priority: r for r in rows(spark, sf_dir, "trimmed_mean_priority")}
    per = defaultdict(list)
    for r in read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect():
        per[r.o_orderpriority].append(int(round(r.o_totalprice * 100)))
    for pri, xs in per.items():
        xs.sort()
        k = len(xs) // 10
        kept = xs[k : len(xs) - k]
        r = got[pri]
        assert r.n_orders == len(xs) and r.n_kept == len(kept)
        assert r.trimmed_mean == pytest.approx(
            round(sum(kept) / len(kept) / 100.0, 6), abs=1e-6
        )
        # robust: trimmed mean sits inside the untrimmed min/max
        assert xs[0] / 100.0 <= r.trimmed_mean <= xs[-1] / 100.0


def test_burstiness_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = rows(spark, sf_dir, "user_burstiness")
    assert got
    for r in got:
        assert -1.0 <= r.burstiness <= 1.0
        assert r.n_gaps >= 5
    bs = [r.burstiness for r in got]
    assert bs == sorted(bs, reverse=True)
    # recompute the top user exactly
    top = got[0]
    evs = sorted(
        (
            (r.ts, r.event_id)
            for r in read_table(spark, sf_dir, "events")
            .filter(f"user_id = {top.user_id}")
            .select("ts", "event_id")
            .collect()
        )
    )
    us = [int(t.timestamp() * 1_000_000) for t, _ in evs]
    gaps = [b - a for a, b in zip(us, us[1:])]
    n, s1 = len(gaps), sum(gaps)
    s2 = sum(g * g for g in gaps)
    cv = math.sqrt(max((s2 - s1 * s1 / n) / n, 0.0)) / (s1 / n)
    assert top.cv == pytest.approx(round(cv, 9), abs=1e-6)
    assert top.burstiness == pytest.approx(round((cv - 1) / (cv + 1), 9), abs=1e-6)


def test_ks_two_sample_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    [r] = rows(spark, sf_dir, "ks_two_sample_values")
    a, b = [], []
    for e in read_table(spark, sf_dir, "events").select(
        "ts", "event_type", "value"
    ).collect():
        if e.event_type != "purchase":
            continue
        (a if e.ts.day <= 15 else b).append(int(round(e.value * 100)))
    assert r.n_ref == len(a) and r.n_cur == len(b)
    a.sort()
    b.sort()
    import bisect

    d = 0.0
    for v in sorted(set(a) | set(b)):
        f0 = bisect.bisect_right(a, v) / len(a)
        f1 = bisect.bisect_right(b, v) / len(b)
        d = max(d, abs(f0 - f1))
    assert r.ks_d == pytest.approx(d, abs=1e-8)
    assert 0.0 <= r.ks_d <= 1.0
    assert r.crit_05 > 0


def test_ann_recall_eval_consistency(spark, sf_dir):
    [r] = rows(spark, sf_dir, "ann_recall_eval")
    assert r.k == 10
    assert 0 <= r.n_common <= 10
    assert r.recall_at_10 == pytest.approx(r.n_common / 10.0, abs=1e-9)
    # must agree with intersecting the two registry rankings directly
    exact = {x.vec_id for x in rows(spark, sf_dir, "ann_cosine_topk")}
    lsh = {x.vec_id for x in rows(spark, sf_dir, "ann_lsh_bucketed")}
    assert r.n_common == len(exact & lsh)
    # no quality gate here: 8-plane Hamming-1 probing scans ~9/256 of
    # bucket space, so low recall on ISOTROPIC vectors is the expected
    # physics (the quality-gated index is IVF — test_ivf_recall_at_10).
    # This query's job is to MEASURE it; the eval must be self-consistent
    # (n_common can legitimately be 0 at SFs where the probe set misses
    # the whole exact top-10 — measured 0/10 at sf0.01, 2/10 at sf0.001).


def test_ndcg_vs_brute_force(spark, sf_dir):
    [r] = rows(spark, sf_dir, "ndcg_lexical_vs_dense")
    lex = [x.doc_id for x in rows(spark, sf_dir, "bm25_topk_docs")][:10]
    gold = {x.vec_id for x in rows(spark, sf_dir, "ann_cosine_topk")}  # top-10
    # gold for the query is dense top-20; recompute from cosine ranking
    from dynaledger_spark.catalog import read_table
    from dynaledger_spark.operators.similarity import cosine_topk

    emb = read_table(spark, sf_dir, "embeddings")
    qv = emb.filter("vec_id = 0").select("embedding").head()[0]
    gold20 = {
        x.vec_id
        for x in cosine_topk(
            emb.filter("vec_id <> 0"), list(qv), k=20
        ).collect()
    }
    dcg = sum(
        (1.0 / math.log2(i + 2)) if d in gold20 else 0.0
        for i, d in enumerate(lex)
    )
    idcg = sum(1.0 / math.log2(i + 2) for i in range(len(lex)))
    assert r.k == len(lex)
    assert r.n_relevant_in_k == sum(1 for d in lex if d in gold20)
    assert r.ndcg_at_10 == pytest.approx(dcg / idcg, abs=1e-6)
    assert 0.0 <= r.ndcg_at_10 <= 1.0


def test_embedding_drift_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    got = rows(spark, sf_dir, "embedding_drift_report")
    assert len(got) == 10
    halves = defaultdict(lambda: defaultdict(list))
    for r in read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect():
        for d, x in enumerate(r.embedding, start=1):
            halves[r.vec_id % 2][d].append(float(x))
    for r in got:
        xs0, xs1 = halves[0][r.dim], halves[1][r.dim]
        # replicate the sorted-fold sums exactly
        s10 = 0.0
        for v in sorted(xs0):
            s10 += v
        s11 = 0.0
        for v in sorted(xs1):
            s11 += v
        assert r.mean_ref == pytest.approx(round(s10 / len(xs0), 9), abs=1e-9)
        assert r.mean_cur == pytest.approx(round(s11 / len(xs1), 9), abs=1e-9)
        assert r.std_shift >= 0
    shifts = [r.std_shift for r in got]
    assert shifts == sorted(shifts, reverse=True)


def test_stream_anomaly_zscore_flags_3sigma(spark, sf_dir):
    got = rows(spark, sf_dir, "stream_anomaly_zscore")
    assert got, "3-sigma outliers exist in the synthetic value mix"
    for r in got:
        assert abs(r.z) > 3.0


def test_ab_ztest_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    [r] = rows(spark, sf_dir, "ab_conversion_ztest")
    per = defaultdict(lambda: [0, 0])
    for e in read_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).collect():
        if e.event_type == "view":
            per[e.user_id][0] += 1
        elif e.event_type == "purchase":
            per[e.user_id][1] += 1
    stats = {0: [0, 0], 1: [0, 0]}
    for uid, (nv, np_) in per.items():
        if nv == 0:
            continue
        s = stats[uid % 2]
        s[0] += 1
        s[1] += 1 if np_ > nv else 0
    (n0, x0), (n1, x1) = stats[0], stats[1]
    assert (r.n0, r.x0, r.n1, r.x1) == (n0, x0, n1, x1)
    assert r.rate_a == pytest.approx(x0 / n0, abs=1e-9)
    assert r.rate_b == pytest.approx(x1 / n1, abs=1e-9)
    if 0 < x0 + x1 < n0 + n1:
        pool = (x0 + x1) / (n0 + n1)
        z = (x1 / n1 - x0 / n0) / math.sqrt(
            pool * (1 - pool) * (1 / n0 + 1 / n1)
        )
        assert r.z == pytest.approx(z, abs=1e-6)
    # Wilson lower bound sits at or below the point estimate
    assert r.wilson_lo_a <= r.rate_a + 1e-9
    assert r.wilson_lo_b <= r.rate_b + 1e-9
    assert r.wilson_lo_a >= 0 and r.wilson_lo_b >= 0
