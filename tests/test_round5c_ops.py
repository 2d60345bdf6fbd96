"""Independent-evidence tests for the round-5 batch-9 additions
(BFS levels, Mann-Whitney U, CUPED, WOE/IV).

Same doctrine as test_round5_ops: every check is evidence the DuckDB
oracle cannot manufacture — a brute-force Python recomputation, an
algebraic invariant, or a distributional property.
"""

from __future__ import annotations

import math
from collections import defaultdict, deque

import pytest

from dynaledger_spark.plans.registry import load_all

REGISTRY = load_all()


def rows(spark, sf_dir, name):
    return REGISTRY[name].build(spark, sf_dir).collect()


def test_bfs_levels_vs_python_bfs(spark, sf_dir):
    """Frontier-join BFS must equal a textbook queue BFS on the
    collected edge set (depth-capped at the operator's 4)."""
    from dynaledger_spark.plans.queries_graph import _BFS_DEPTH, _edges

    edges = [(r.pa, r.pb) for r in _edges(spark, sf_dir).collect()]
    adj = defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    seed = min(a for a, _ in edges)
    level = {seed: 0}
    q = deque([seed])
    while q:
        v = q.popleft()
        if level[v] == _BFS_DEPTH:
            continue
        for w in adj[v]:
            if w not in level:
                level[w] = level[v] + 1
                q.append(w)
    got = {r.v: r.level for r in rows(spark, sf_dir, "bfs_levels_copurchase")}
    assert got == level
    # sanity on the BFS invariants: seed at 0, levels contiguous
    assert got[seed] == 0
    assert set(got.values()) == set(range(max(got.values()) + 1))


def test_bfs_levels_adjacent_differ_by_at_most_one(spark, sf_dir):
    """Every edge with both ends reached must connect levels d/d±1 —
    the defining property of BFS layering (a gap of 2 would mean the
    frontier skipped a shorter path)."""
    from dynaledger_spark.plans.queries_graph import _edges

    got = {r.v: r.level for r in rows(spark, sf_dir, "bfs_levels_copurchase")}
    for r in _edges(spark, sf_dir).collect():
        if r.pa in got and r.pb in got:
            assert abs(got[r.pa] - got[r.pb]) <= 1


def _purchase_halves(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    a, b = [], []
    for e in (
        read_table(spark, sf_dir, "events")
        .select("ts", "event_type", "value")
        .collect()
    ):
        if e.event_type != "purchase":
            continue
        (a if e.ts.day <= 15 else b).append(int(round(e.value * 100)))
    return a, b


def test_mann_whitney_vs_brute_force(spark, sf_dir):
    """Recompute U and z from raw midranks over the pooled sample —
    the O(N log N) sort-based derivation, not the windowed-rollup one."""
    [r] = rows(spark, sf_dir, "mann_whitney_u_test")
    a, b = _purchase_halves(spark, sf_dir)
    assert (r.na, r.nb) == (len(a), len(b))
    pooled = sorted((v, 0) for v in a) + sorted((v, 1) for v in b)
    pooled.sort(key=lambda t: t[0])
    # midranks via tie runs
    ra = 0.0
    ties = 0
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        t = j - i
        mid = (i + 1 + j) / 2.0  # average of ranks i+1..j
        ra += mid * sum(1 for k in range(i, j) if pooled[k][1] == 0)
        ties += t**3 - t
        i = j
    na, nb = len(a), len(b)
    u = ra - na * (na + 1) / 2.0
    n = na + nb
    sigma = math.sqrt(
        na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0)))
    )
    assert r.u2_a == int(2 * u)
    assert r.tie_sum == ties
    assert r.u_minus_mean == pytest.approx(u - na * nb / 2.0, abs=1e-6)
    assert r.z == pytest.approx((u - na * nb / 2.0) / sigma, abs=1e-8)


def test_mann_whitney_symmetry_invariant(spark, sf_dir):
    """U_A + U_B = n_a·n_b: recover U_B from the reported doubled U_A
    and check the rank-sum identity holds exactly."""
    [r] = rows(spark, sf_dir, "mann_whitney_u_test")
    assert r.u2_a % 1 in (0,)  # integer by construction
    u2_b = 2 * r.na * r.nb - r.u2_a
    assert u2_b >= 0
    assert r.u2_a >= 0


def test_cuped_vs_numpy(spark, sf_dir):
    """θ, per-arm adjusted means, and ρ² recomputed with numpy from the
    per-user cent totals."""
    import numpy as np

    from dynaledger_spark.catalog import read_table

    pre = defaultdict(int)
    post = defaultdict(int)
    users = set()
    for e in (
        read_table(spark, sf_dir, "events")
        .select("ts", "user_id", "event_type", "value")
        .collect()
    ):
        users.add(e.user_id)
        cents = int(round(e.value * 100))
        if e.ts.day <= 15:
            pre[e.user_id] += cents
        elif e.event_type == "purchase":
            post[e.user_id] += cents
    uids = sorted(users)
    x = np.array([pre[u] for u in uids], dtype=float)
    y = np.array([post[u] for u in uids], dtype=float)
    n = len(uids)
    theta = ((n * (x * y).sum() - x.sum() * y.sum())
             / (n * (x * x).sum() - x.sum() ** 2))
    rho2 = (n * (x * y).sum() - x.sum() * y.sum()) ** 2 / (
        (n * (x * x).sum() - x.sum() ** 2)
        * (n * (y * y).sum() - y.sum() ** 2)
    )
    got = {r.arm: r for r in rows(spark, sf_dir, "cuped_adjusted_ab")}
    assert set(got) == {0, 1}
    xbar = x.mean()
    for arm in (0, 1):
        mask = np.array([u % 2 == arm for u in uids])
        assert got[arm].n_users == int(mask.sum())
        assert got[arm].mean_post == pytest.approx(
            y[mask].mean() / 100.0, abs=1e-8
        )
        adj = y[mask].mean() - theta * (x[mask].mean() - xbar)
        assert got[arm].mean_cuped == pytest.approx(adj / 100.0, abs=1e-8)
        assert got[arm].theta == pytest.approx(theta, abs=1e-8)
        assert got[arm].var_reduction == pytest.approx(rho2, abs=1e-8)
    # CUPED must not move the estimated treatment effect direction:
    # difference of adjusted means equals difference of raw means
    # shifted by theta*(xbar_0 - xbar_1) — check the identity.
    d_raw = got[1].mean_post - got[0].mean_post
    d_adj = got[1].mean_cuped - got[0].mean_cuped
    m0 = x[np.array([u % 2 == 0 for u in uids])].mean()
    m1 = x[np.array([u % 2 == 1 for u in uids])].mean()
    assert d_adj == pytest.approx(d_raw - theta * (m1 - m0) / 100.0, abs=1e-6)


def test_woe_iv_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    urgent = {
        r.o_custkey
        for r in read_table(spark, sf_dir, "orders")
        .filter("o_orderpriority = '1-URGENT'")
        .select("o_custkey")
        .collect()
    }
    bins = defaultdict(lambda: [0, 0])  # bin -> [event, nonevent]
    for c in (
        read_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .collect()
    ):
        b = math.floor(c.c_acctbal / 1000.0)
        bins[b][0 if c.c_custkey in urgent else 1] += 1
    et = sum(v[0] for v in bins.values())
    net = sum(v[1] for v in bins.values())
    nb = len(bins)
    got = {r.bin: r for r in rows(spark, sf_dir, "woe_iv_acctbal_urgent")}
    assert set(got) == set(bins)
    for b, (e, ne) in bins.items():
        pe = (e + 0.5) / (et + 0.5 * nb)
        pne = (ne + 0.5) / (net + 0.5 * nb)
        woe = math.log(pe / pne)
        assert got[b].n_event == e and got[b].n_nonevent == ne
        assert got[b].woe == pytest.approx(woe, abs=1e-8)
        assert got[b].iv_term == pytest.approx((pe - pne) * woe, abs=1e-8)
    # IV terms of a binary split sum to a nonnegative number
    assert sum(r.iv_term for r in got.values()) >= 0


def test_bootstrap_ci_vs_brute_force(spark, sf_dir):
    """Replay the deterministic Poisson draws in pure Python and
    recompute the replicate means and percentile CI."""
    from dynaledger_spark.catalog import read_table
    from dynaledger_spark.plans.queries_sampling import (
        _BOOT_B,
        _H1,
        _H2,
        _M32,
        _POIS1_CDF,
    )

    [r] = rows(spark, sf_dir, "bootstrap_mean_ci")
    cents = {
        e.event_id: int(round(e.value * 100))
        for e in read_table(spark, sf_dir, "events")
        .filter("event_type = 'purchase'")
        .select("event_id", "value")
        .collect()
    }
    thresholds = [float(t) for t in _POIS1_CDF]
    means = []
    for rep in range(1, _BOOT_B + 1):
        wsum = wn = 0
        for eid, c in cents.items():
            u = ((eid * _H1 + rep * _H2) % _M32) / _M32
            w = 6
            for k, t in enumerate(thresholds):
                if u < t:
                    w = k
                    break
            wsum += w * c
            wn += w
        means.append(wsum / wn / 100.0)
    means.sort()
    assert r.n_events == len(cents)
    assert r.n_replicates == _BOOT_B
    assert r.point_mean == pytest.approx(
        sum(cents.values()) / len(cents) / 100.0, abs=1e-8
    )
    assert r.ci_lo == pytest.approx(means[math.ceil(0.025 * _BOOT_B) - 1], abs=1e-8)
    assert r.ci_hi == pytest.approx(means[math.ceil(0.975 * _BOOT_B) - 1], abs=1e-8)
    assert r.ci_lo <= r.point_mean <= r.ci_hi


def test_ols_vs_numpy_lstsq(spark, sf_dir):
    """The Cramer solution must match numpy's least-squares solve."""
    import numpy as np

    from dynaledger_spark.catalog import read_table

    li = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_quantity", "l_discount", "l_extendedprice")
        .collect()
    )
    X = np.array([[1.0, float(r.l_quantity), float(r.l_discount)] for r in li])
    y = np.array([float(r.l_extendedprice) for r in li])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    [r] = rows(spark, sf_dir, "ols_price_qty_discount")
    assert r.n == len(li)
    assert r.beta0 == pytest.approx(beta[0], rel=1e-6)
    assert r.beta1 == pytest.approx(beta[1], rel=1e-6)
    assert r.beta2 == pytest.approx(beta[2], rel=1e-6)
    resid = y - X @ beta
    sst = ((y - y.mean()) ** 2).sum()
    assert r.r2 == pytest.approx(1.0 - (resid**2).sum() / sst, abs=1e-6)
    assert 0.0 <= r.r2 <= 1.0


def test_lift_gains_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    urgent = {
        r.o_custkey
        for r in read_table(spark, sf_dir, "orders")
        .filter("o_orderpriority = '1-URGENT'")
        .select("o_custkey")
        .collect()
    }
    custs = sorted(
        (
            (-c.c_acctbal, c.c_custkey, 1 if c.c_custkey in urgent else 0)
            for c in read_table(spark, sf_dir, "customer")
            .select("c_custkey", "c_acctbal")
            .collect()
        )
    )
    n = len(custs)
    # ntile semantics: first (n % 10) tiles get one extra row
    base, extra = divmod(n, 10)
    sizes = [base + (1 if i < extra else 0) for i in range(10)]
    got = sorted(rows(spark, sf_dir, "lift_gains_deciles"), key=lambda r: r.decile)
    tot_event = sum(t[2] for t in custs)
    idx = 0
    cum_e = cum_n = 0
    for d, size in enumerate(sizes, start=1):
        ev = sum(t[2] for t in custs[idx : idx + size])
        idx += size
        cum_e += ev
        cum_n += size
        r = got[d - 1]
        assert (r.n_customers, r.n_event) == (size, ev)
        assert r.cum_event == cum_e
        assert r.cum_gain == pytest.approx(cum_e / tot_event, abs=1e-8)
        assert r.cum_lift == pytest.approx(
            (cum_e / cum_n) / (tot_event / n), abs=1e-8
        )
    # gains are monotone and end at 1; lift is decreasing-ish ending at 1
    assert got[-1].cum_gain == pytest.approx(1.0)
    assert got[-1].cum_lift == pytest.approx(1.0)


def _decile_bins(spark, sf_dir):
    """(n, e) per acctbal-ascending decile, recomputed in Python."""
    from dynaledger_spark.catalog import read_table

    urgent = {
        r.o_custkey
        for r in read_table(spark, sf_dir, "orders")
        .filter("o_orderpriority = '1-URGENT'")
        .select("o_custkey")
        .collect()
    }
    custs = sorted(
        (c.c_acctbal, c.c_custkey, 1 if c.c_custkey in urgent else 0)
        for c in read_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_acctbal")
        .collect()
    )
    n = len(custs)
    base, extra = divmod(n, 10)
    sizes = [base + (1 if i < extra else 0) for i in range(10)]
    bins, idx = [], 0
    for size in sizes:
        bins.append((size, sum(t[2] for t in custs[idx : idx + size])))
        idx += size
    return bins


def test_isotonic_vs_sequential_pav(spark, sf_dir):
    """The minimax-identity fit must equal the TEXTBOOK sequential
    pool-adjacent-violators sweep — a genuinely different algorithm."""
    bins = _decile_bins(spark, sf_dir)
    # classic PAV: maintain a stack of (weight, sum) blocks, merge while
    # the tail violates monotonicity
    stack: list[list[float]] = []
    for n, e in bins:
        stack.append([n, e])
        while len(stack) > 1 and (
            stack[-2][1] / stack[-2][0] >= stack[-1][1] / stack[-1][0]
        ):
            w2, s2 = stack.pop()
            stack[-1][0] += w2
            stack[-1][1] += s2
    fitted = []
    for w, s in stack:
        # each pooled block emits its average for every member bin
        cnt = 0
        i = len(fitted)
        while cnt < w:
            cnt += bins[i][0]
            fitted.append(s / w)
            i += 1
    got = sorted(
        rows(spark, sf_dir, "isotonic_calibration_deciles"),
        key=lambda r: r.decile,
    )
    assert [r.n_event for r in got] == [e for _, e in bins]
    for r, f in zip(got, fitted):
        assert r.iso_rate == pytest.approx(f, abs=1e-8)
    # defining properties: monotone non-decreasing, same weighted mean
    iso = [r.iso_rate for r in got]
    assert all(a <= b + 1e-12 for a, b in zip(iso, iso[1:]))
    tot_n = sum(n for n, _ in bins)
    assert sum(r.iso_rate * r.n_customers for r in got) == pytest.approx(
        sum(e for _, e in bins), rel=1e-6
    )
    assert tot_n == sum(r.n_customers for r in got)


def test_ab_power_vs_closed_form(spark, sf_dir):
    [z] = rows(spark, sf_dir, "ab_conversion_ztest")
    [p] = rows(spark, sf_dir, "ab_power_analysis")
    assert (p.n0, p.x0, p.n1, p.x1) == (z.n0, z.x0, z.n1, z.x1)
    za, zb = 1.959963984540054, 0.8416212335729143
    p0, p1 = p.x0 / p.n0, p.x1 / p.n1
    mde = (za + zb) * math.sqrt(
        p0 * (1 - p0) / p.n0 + p1 * (1 - p1) / p.n1
    )
    assert p.mde_now == pytest.approx(mde, abs=1e-8)
    if p0 != p1:
        n_req = math.ceil(
            (za + zb) ** 2 * (p0 * (1 - p0) + p1 * (1 - p1)) / (p1 - p0) ** 2
        )
        assert p.n_per_arm_80pct == n_req
        # self-consistency: at the required n, the MDE equals |delta|
        mde_at_req = (za + zb) * math.sqrt(
            (p0 * (1 - p0) + p1 * (1 - p1)) / n_req
        )
        assert mde_at_req <= abs(p1 - p0) * 1.01


def test_source_vocab_overlap_vs_brute_force(spark, sf_dir):
    from dynaledger_spark.catalog import read_table

    vocab = defaultdict(set)
    for d in (
        read_table(spark, sf_dir, "documents")
        .select("source", "text")
        .collect()
    ):
        for w in d.text.split(" "):
            if w:
                vocab[d.source].add(w)
    got = {
        (r.source_a, r.source_b): r
        for r in rows(spark, sf_dir, "source_vocab_overlap")
    }
    srcs = sorted(vocab)
    for i, sa in enumerate(srcs):
        for sb in srcs[i + 1 :]:
            inter = len(vocab[sa] & vocab[sb])
            if inter == 0:
                assert (sa, sb) not in got
                continue
            r = got[(sa, sb)]
            assert (r.vocab_a, r.vocab_b, r.n_shared) == (
                len(vocab[sa]),
                len(vocab[sb]),
                inter,
            )
            union = len(vocab[sa] | vocab[sb])
            assert r.jaccard == pytest.approx(inter / union, abs=1e-8)
