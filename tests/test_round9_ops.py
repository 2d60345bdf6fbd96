"""Round-9 operator tests: priority sampling + degree-oriented triangles.

Each new operator gets (a) a transparent python replay of the algorithm
over collected inputs (the established invariant-pinning discipline) and
(b) non-vacuity assertions (nonempty-oracle-outputs rule: a 0-row parity
pass proves nothing).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynaledger_spark.plans.registry import load_all

REGISTRY = load_all()


def test_priority_sample_replay_and_estimator(spark, sf_dir):
    """Replay Duffield-Lund-Thorup in plain python over the collected
    orders table: same hash-uniform u, same priorities, same top-k —
    the Spark sample membership and tau must match exactly; the
    grand-total estimator (sum over sample of max(w, tau)) must land
    within 50% of the exact total (k=64 gives ~O(1/sqrt(k)) relative
    error; the bound is loose on purpose — unbiasedness, not variance,
    is the contract)."""
    import os

    from dynaledger_spark.plans.queries_sampling import _H2, _M32, _PRIO_K

    out = REGISTRY["priority_sample_subset_sum"].build(spark, sf_dir).collect()
    assert len(out) >= 2, "need multiple priority classes for a non-vacuous test"
    assert sum(r["n_sampled"] for r in out) == _PRIO_K
    assert all(r["n_orders"] > 0 and r["exact_total"] > 0 for r in out)

    orders = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .collect()
    )
    keyed = [
        (
            r["o_totalprice"]
            / (((r["o_orderkey"] * _H2 + 424243) % _M32 + 1) / float(_M32 + 1)),
            r["o_orderkey"],
            r["o_orderpriority"],
            r["o_totalprice"],
        )
        for r in orders
    ]
    keyed.sort(key=lambda t: (-t[0], t[1]))
    top = keyed[: _PRIO_K + 1]
    tau = top[-1][0]
    samp = [t for t in top if t[0] > tau]
    assert len(samp) == _PRIO_K
    est_grand = sum(max(w, tau) for (_, _, _, w) in samp)
    exact_grand = sum(r["o_totalprice"] for r in orders)
    assert abs(est_grand - exact_grand) / exact_grand < 0.5, (
        est_grand,
        exact_grand,
    )
    # per-class n_sampled matches the replay
    per_class = {}
    for _, _, cls, _ in samp:
        per_class[cls] = per_class.get(cls, 0) + 1
    got_per_class = {r["o_orderpriority"]: r["n_sampled"] for r in out}
    for cls, n in per_class.items():
        assert got_per_class[cls] == n


def test_priority_sample_append_stability(spark, sf_dir, tmp_path):
    """Priority sampling is mergeable: the top-(k+1) over a corpus UNION
    a disjoint batch equals the top-(k+1) of the union — i.e. appending
    data can only displace, never corrupt, the sample (the property
    that makes the 100 TB one-pass form correct). Verified by running
    the query over an events-append-style doubled orders table and
    replaying."""
    import os

    from dynaledger_spark.plans.queries_sampling import _H2, _M32, _PRIO_K

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    shifted = orders.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(900_000_000)
    )
    union_dir = str(tmp_path / "orders_union")
    orders.unionByName(shifted).write.parquet(
        os.path.join(union_dir, "orders.parquet")
    )
    out = REGISTRY["priority_sample_subset_sum"].build(spark, union_dir).collect()
    assert sum(r["n_sampled"] for r in out) == _PRIO_K
    # exact totals doubled (the estimator tracks the union corpus)
    base = {
        r["o_orderpriority"]: r["exact_total"]
        for r in REGISTRY["priority_sample_subset_sum"].build(spark, sf_dir).collect()
    }
    got = {r["o_orderpriority"]: r["exact_total"] for r in out}
    for cls, v in base.items():
        assert got[cls] == pytest.approx(2 * v, rel=1e-12)


def test_oriented_triangles_match_naive_python(spark, sf_dir):
    """The degree-oriented wedge join must count exactly the triangles a
    transparent python edge-iterator finds on the collected edge set."""
    from dynaledger_spark.plans.queries_graph import _edges

    edges = [(r["pa"], r["pb"]) for r in _edges(spark, sf_dir).collect()]
    assert edges, "empty co-purchase edge set makes this vacuous"
    eset = set(edges)
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_tri = 0
    for a, b in edges:  # a < b canonical
        n_tri += sum(1 for c in adj[a] & adj[b] if b < c and (a, c) in eset and (b, c) in eset)
    row = REGISTRY["copurchase_triangles"].build(spark, sf_dir).first()
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == n_tri
    spark.catalog.clearCache()


def test_shapley_efficiency_and_replay(spark, sf_dir):
    """Shapley efficiency axiom: sum(phi_i) = v(N) - v(empty) — total
    attributed credit equals the converters any channel could have
    influenced (organic zero-touch conversions stay unattributed).
    Verified against a transparent python replay of the whole lattice
    computation (masks, subset-containment v, factorial weights)."""
    import math
    import os
    from collections import Counter

    out = REGISTRY["shapley_channel_attribution"].build(spark, sf_dir).collect()
    assert len(out) >= 2
    assert all(r["n_converters_touched"] > 0 for r in out)

    from dynaledger_spark.catalog import read_table

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    first_p: dict[int, object] = {}
    for r in ev:
        if r["event_type"] == "purchase":
            if r["user_id"] not in first_p or r["ts"] < first_p[r["user_id"]]:
                first_p[r["user_id"]] = r["ts"]
    channels = sorted({r["event_type"] for r in ev} - {"purchase"})
    bit = {c: i for i, c in enumerate(channels)}
    n = len(channels)
    masks: dict[int, int] = {u: 0 for u in first_p}
    for r in ev:
        u = r["user_id"]
        if u in first_p and r["event_type"] != "purchase" and r["ts"] < first_p[u]:
            masks[u] |= 1 << bit[r["event_type"]]
    tm = Counter(masks.values())
    v = [
        sum(c for m, c in tm.items() if (m & s) == m) for s in range(1 << n)
    ]
    nfact = math.factorial(n)
    phi = {}
    for c in channels:
        i = bit[c]
        num = sum(
            math.factorial(bin(s).count("1"))
            * math.factorial(n - 1 - bin(s).count("1"))
            * (v[s | (1 << i)] - v[s])
            for s in range(1 << n)
            if not (s >> i) & 1
        )
        phi[c] = num
    got = {r["channel"]: r["shapley_num"] for r in out}
    assert got == phi
    # efficiency: sum phi = n! * (v(N) - v(0))
    assert sum(phi.values()) == nfact * (v[(1 << n) - 1] - v[0])
    for r in out:
        assert r["shapley"] == pytest.approx(phi[r["channel"]] / nfact, rel=0, abs=0)


def test_sequential_pattern_replay(spark, sf_dir):
    """Replay subsequence support in plain python (direct existential
    scan over each user's ordered timeline, NOT the rank-bounds trick)
    — proving the bounds shortcut computes exactly GSP support."""
    from collections import defaultdict

    from dynaledger_spark.catalog import read_table
    from dynaledger_spark.plans.queries_behavior import _SEQ_MIN_SUPPORT

    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    ).collect()
    timelines = defaultdict(list)
    for r in ev:
        timelines[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    for u in timelines:
        timelines[u].sort()
    sup2, sup3 = defaultdict(int), defaultdict(int)
    for u, tl in timelines.items():
        seq = [t for _, _, t in tl]
        # genuine existential subsequence scan (ADVICE r9 item 5): a
        # pattern is supported iff ordered indices exist — derived from
        # prefix/suffix SEEN SETS per position, never from the
        # first[a]/last[c] bounds the query under test uses.
        n_ev = len(seq)
        prefix: list[set] = [set() for _ in range(n_ev)]
        for j in range(1, n_ev):
            prefix[j] = prefix[j - 1] | {seq[j - 1]}
        suffix: list[set] = [set() for _ in range(n_ev)]
        for j in range(n_ev - 2, -1, -1):
            suffix[j] = suffix[j + 1] | {seq[j + 1]}
        pats2, pats3 = set(), set()
        for j in range(n_ev):
            b = seq[j]
            for a in prefix[j]:
                pats2.add((a, b))  # exists i<j with seq[i]=a, seq[j]=b
            for a in prefix[j]:
                for c in suffix[j]:
                    pats3.add((a, b, c))  # exists i<j<k
        for p in pats2:
            sup2[p] += 1
        for p in pats3:
            sup3[p] += 1
    want = {}
    for (a, b), n in sup2.items():
        if n >= _SEQ_MIN_SUPPORT:
            want[f"{a}->{b}"] = n
    for (a, b, c), n in sup3.items():
        if n >= _SEQ_MIN_SUPPORT:
            want[f"{a}->{b}->{c}"] = n
    out = REGISTRY["sequential_pattern_support"].build(spark, sf_dir).collect()
    got = {r["pattern"]: r["n_support"] for r in out}
    assert got == want
    assert len(got) > 10  # non-vacuous
    spark.catalog.clearCache()


def test_golden_record_purity_and_replay(spark, sf_dir):
    """Entity clusters must be exactly the transitive closure of the FS
    link pairs (python union-find replay), and the purity flag must
    agree with the members' underlying custkeys. Most clusters should
    be pure (the linkage's pair precision is 1.0 at test SFs; impure
    clusters can only come from transitive chains)."""
    out = REGISTRY["entity_golden_record"].build(spark, sf_dir).collect()
    assert len(out) > 10
    links = [
        (r["custkey_a"], r["custkey_b"])
        for r in REGISTRY["fellegi_sunter_linkage"].build(spark, sf_dir).collect()
        if r["decision"] == "link"
    ]
    assert links
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for ka, kb in links:
        union(ka * 2, kb * 2 + 1)
    from collections import defaultdict

    clusters = defaultdict(set)
    for node in parent:
        clusters[find(node)].add(node)
    want = {
        min(ms): ms for ms in clusters.values() if len(ms) >= 2
    }
    got = {r["cluster_id"]: r for r in out}
    assert set(got) == set(want)
    for cid, ms in want.items():
        r = got[cid]
        assert r["n_members"] == len(ms)
        custs = {n // 2 for n in ms}
        assert r["n_customers"] == len(custs)
        assert r["pure"] == (len(custs) == 1)
    assert sum(1 for r in out if r["pure"]) >= len(out) // 2
    spark.catalog.clearCache()
