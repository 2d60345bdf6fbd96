"""Connected components: chains, isolated nodes, merge-through-bridge,
convergence within diameter iterations."""

from __future__ import annotations

from dynaledger_spark.operators.graph import connected_components, dedup_clusters


def test_components_chain_and_isolated(spark):
    nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    # chain 0-1-2-3 (diameter 3), pair 4-5, isolated 6
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (4, 5)], "src long, dst long"
    )
    got = {r.node: r.component for r in connected_components(nodes, edges, "id").collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6}


def test_components_bridge_merges(spark):
    nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
    # two triangles joined by one bridge edge → single component
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)],
        "src long, dst long",
    )
    got = {r.node: r.component for r in connected_components(nodes, edges, "id").collect()}
    assert set(got.values()) == {0}


def test_dedup_clusters_canonical(spark):
    docs = spark.createDataFrame([(i,) for i in [10, 11, 12, 20]], "doc_id long")
    pairs = spark.createDataFrame([(10, 11), (11, 12)], "doc_a long, doc_b long")
    got = {r.doc_id: (r.cluster_id, r.is_canonical) for r in dedup_clusters(docs, pairs).collect()}
    assert got == {
        10: (10, True),
        11: (10, False),
        12: (10, False),
        20: (20, True),
    }
