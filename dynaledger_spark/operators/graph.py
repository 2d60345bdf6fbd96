"""Iterative graph operators: connected components for dedup clustering.

Near-dup detection yields PAIRS; deduplication needs CLUSTERS (A~B, B~C ⇒
{A,B,C} keep one). Components are computed by min-label propagation:
every node starts labeled with itself and repeatedly takes the minimum
label among itself and its neighbors — after O(component diameter)
rounds the labels are fixpoint and equal each component's minimum id.

Scale posture: each round is one shuffle (edges ⋈ labels, groupBy min);
`localCheckpoint` truncates lineage so the plan doesn't grow with
iterations (the classic iterative-Spark trap); convergence is detected
with a count of changed labels, so the loop runs diameter+1 rounds, not
max_iter. Near-dup graphs are short-diameter (clusters are cliques-ish),
so expect single-digit rounds even at corpus scale. For planet-scale
graphs swap in the large-star/small-star variant — same skeleton.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    node_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) where component = min node id reachable.

    `nodes` may contain isolated vertices (own component). Undirected:
    edges are symmetrized internally.

    Iteration overhead matters more than data volume here (each round is
    jobs over an ever-smaller frontier), so shuffle partitions are scoped
    down for the loop and convergence is detected by the label-sum
    (labels only ever decrease, so an unchanged sum IS the fixpoint —
    one agg instead of a join+count per round).
    """
    # Edge derivation may be arbitrarily expensive (e.g. a shingle join):
    # materialize it at the session's full parallelism BEFORE scoping the
    # shuffle width down for the tiny per-iteration jobs.
    bidir = (
        edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
        .union(edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels_init = nodes.select(F.col(node_col).alias("node")).withColumn(
        "label", F.col("node")
    ).localCheckpoint(eager=True)

    spark = nodes.sparkSession
    old_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        return _cc_loop(labels_init, bidir, max_iter)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _cc_loop(labels: DataFrame, bidir: DataFrame, max_iter: int) -> DataFrame:
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]

    for _ in range(max_iter):
        neighbor_min = (
            bidir.join(labels, bidir["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        propagated = labels.join(
            neighbor_min, labels["node"] == neighbor_min["a"], "left"
        ).select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias(
                "label"
            ),
        )
        # pointer jumping: label ← label(label). Doubles the propagation
        # horizon each round → O(log diameter) rounds instead of
        # O(diameter); long dup-chains (hundreds of docs) converge in
        # single-digit iterations.
        lmap = propagated.select(
            F.col("node").alias("lnode"), F.col("label").alias("llabel")
        )
        new_labels = (
            propagated.join(lmap, propagated["label"] == lmap["lnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("llabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        labels = new_labels
        new_sum = labels.agg(F.sum("label")).collect()[0][0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(F.col("node"), F.col("label").alias("component"))


def dedup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Cluster near-dup pairs into components and pick the canonical doc
    (minimum id) per cluster — the keep/drop decision of corpus dedup."""
    comp = connected_components(
        docs.select(F.col(id_col).alias("id")), pairs, "id", pair_a, pair_b
    )
    return comp.select(
        F.col("node").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).alias("is_canonical"),
    )
