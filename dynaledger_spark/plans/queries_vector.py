"""Vector / embedding queries over the `embeddings` table.

Similarity-search operators for a training-data pipeline: exact norms,
brute-force cosine top-k (the correctness baseline), and LSH-bucketed
variants (the scale path) live in operators/similarity.py.

Float discipline for oracle parity: element-wise math is done in DOUBLE
with a sequential left-fold (`aggregate` in Spark, `list_reduce`-free
ordered forms in DuckDB), which is order-deterministic in both engines.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynaledger_spark.plans.registry import register


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Single small file → 1-task scan; the 64-dim fold per row is the
    # cost, so parallelize it (see _docs in queries_text).
    df = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    return df.repartition(spark.sparkContext.defaultParallelism)


# Sequential left-fold sum of squares — identical fold order both engines.
_SQ_FOLD_SPARK = (
    "aggregate(embedding, CAST(0.0 AS DOUBLE),"
    " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
)
_SQ_FOLD_DUCK = (
    "list_aggregate(list_transform(embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
)


# Dot product of two double arrays as a sequential fold — DuckDB twin uses
# list_zip + list_aggregate('sum'), the same left-to-right accumulation.
def _duck_dot(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(list_zip({a}, {b}),"
        " x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"
    )


@register(
    "ann_cosine_topk",
    headline=True,
    doc="brute-force cosine top-k vs the vec_id=0 query vector",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        scored AS (
            SELECT e.vec_id,
                   {_duck_dot('e.embedding', 'q.qv')}
                   / (sqrt({_SQ_FOLD_DUCK.replace('embedding', 'e.embedding')})
                      * sqrt({_SQ_FOLD_DUCK.replace('embedding', 'q.qv')})) AS cos_sim
            FROM embeddings e, q
            WHERE e.vec_id <> 0
        )
        SELECT vec_id, cos_sim FROM scored
        ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: cosine of every vector against the vec_id=0
    embedding, top-10. The query vector is fetched once (1-row lookup)
    and inlined as a literal — the corpus pass is a single
    scan-project-TakeOrdered, no shuffle, no crossJoin.
    """
    from dynaledger_spark.operators.similarity import cosine_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return cosine_topk(emb.filter(F.col("vec_id") != 0), list(qvec), k=10)


# Sign-LSH oracle machinery: the hyperplanes are pure seed-derived
# constants (data-independent), so the full LSH pipeline — bucket the
# corpus, bucket the query, multiprobe Hamming<=1, exact cosine re-rank —
# is expressible in DuckDB with the plane literals inlined. dim=64 is the
# testdata embedding width (TESTDATA.md); the fold order matches Spark's
# sequential aggregate exactly, as already proven by ann_cosine_topk.
_LSH_DIM, _LSH_PLANES_N, _LSH_SEED = 64, 8, 42


def _duck_bucket(vec: str) -> str:
    from dynaledger_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(_LSH_DIM, _LSH_PLANES_N, _LSH_SEED)
    terms = []
    for i, plane in enumerate(planes):
        lit = "[" + ", ".join(repr(float(v)) for v in plane) + "]::DOUBLE[]"
        terms.append(
            f"(CASE WHEN {_duck_dot(vec, lit)} > 0 THEN {2 ** i} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


@register(
    "ann_lsh_bucketed",
    doc="sign-LSH bucketed ANN (multiprobe Hamming-1) vs vec_id=0",
    oracle=f"""
        WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
        qb AS (SELECT {_duck_bucket('qv')} AS b FROM q),
        scored AS (
            SELECT e.vec_id,
                   {_duck_dot('e.embedding', 'q.qv')}
                   / (sqrt({_SQ_FOLD_DUCK.replace('embedding', 'e.embedding')})
                      * sqrt({_SQ_FOLD_DUCK.replace('embedding', 'q.qv')}))
                     AS cos_sim,
                   {_duck_bucket('e.embedding')} AS eb
            FROM embeddings e, q
            WHERE e.vec_id <> 0
        )
        SELECT vec_id, cos_sim FROM scored, qb
        WHERE xor(scored.eb, qb.b) IN (0, 1, 2, 4, 8, 16, 32, 64, 128)
        ORDER BY cos_sim DESC, vec_id LIMIT 10
    """,
)
def ann_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: probe only the query's sign-LSH bucket (+Hamming-1
    neighbors) instead of scanning the corpus; exact cosine re-ranks the
    bucket. Recall vs the exact baseline is asserted in unit tests, and
    the whole pipeline is oracle-exact: the seeded hyperplanes are
    inlined into the DuckDB SQL, which re-derives the query bucket, the
    Hamming-1 probe set (xor is 0 or a power of two), and the identical
    sequential-fold cosine.
    """
    from dynaledger_spark.operators.similarity import lsh_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return lsh_topk(
        emb.filter(F.col("vec_id") != 0),
        list(qvec),
        k=10,
        n_planes=_LSH_PLANES_N,
        seed=_LSH_SEED,
    )


@register(
    "ann_ivf_topk",
    doc="IVF ANN: spherical k-means quantizer, 6-of-16 cells probed, exact re-rank",
    oracle=None,  # cell assignment depends on k-means fit → rows-only
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IVF scale path: 6/16ths of the corpus scanned per query once
    the index is built (at scale: corpus written partitioned by
    centroid, centroid list kept driver-side). 6 probes because the
    testdata embeddings are isotropic — recall@10 = 0.9 here, vs 0.9 at
    2/16 probes on clustered embeddings; both measured in
    tests/test_pipeline_ops.py::test_ivf_recall_at_10_vs_exact.
    """
    from dynaledger_spark.operators.similarity import ivf_topk

    emb = _emb(spark, sf_dir)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return ivf_topk(
        emb.filter(F.col("vec_id") != 0), list(qvec), k=10, n_probes=6
    )


@register(
    "cosine_near_dup_windowed",
    doc="embedding-cosine near-dup over windowed candidate pairs",
    oracle=f"""
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_duck_dot('a.embedding', 'b.embedding')}
               / (sqrt({_SQ_FOLD_DUCK.replace('embedding', 'a.embedding')})
                  * sqrt({_SQ_FOLD_DUCK.replace('embedding', 'b.embedding')})) AS cos_sim
        FROM embeddings a JOIN embeddings b
          ON a.label = b.label AND b.vec_id - a.vec_id BETWEEN 1 AND 3
    """,
)
def cosine_near_dup_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup scoring on candidate pairs (same label,
    vec_id within 3) — the oracle-exact stand-in for LSH-generated
    candidates; same fold arithmetic as the production path.
    """
    from dynaledger_spark.operators.similarity import cosine

    emb = _emb(spark, sf_dir)
    a, b = emb.alias("a"), emb.alias("b")
    return a.join(
        b,
        (F.col("a.label") == F.col("b.label"))
        & (F.col("b.vec_id") - F.col("a.vec_id")).between(1, 3),
    ).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos_sim"),
    )


@register(
    "embedding_norms",
    doc="L2 norm + dimension count per embedding (fold in double)",
    oracle=f"""
        SELECT vec_id, label,
               CAST(len(embedding) AS INT) AS dim,
               sqrt({_SQ_FOLD_DUCK}) AS l2_norm
        FROM embeddings
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm via a JVM-side array fold — no UDF, stays in
    whole-stage codegen; the scan reads only (vec_id, label, embedding).
    """
    emb = _emb(spark, sf_dir)
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").cast("int").alias("dim"),
        F.sqrt(F.expr(_SQ_FOLD_SPARK)).alias("l2_norm"),
    )


@register(
    "ann_ivf_persisted_topk",
    doc="IVF probe against partition-pruned persisted cells (parquet partitionBy centroid)",
    oracle=None,  # k-means centroids are a runtime fit → engine-specific
)
def ann_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production IVF serving path: cells persisted
    `partitionBy(centroid)` once, probes read ONLY the n_probes nearest
    cells via partition pruning (PartitionFilters plan-asserted in
    tests/test_plans.py). This registry entry exercises the full
    write→prune→re-rank cycle each round; rows-only because the k-means
    fit (and therefore cell assignment) is engine-specific."""
    import shutil
    import tempfile

    from dynaledger_spark.operators.similarity import (
        ivf_index,
        ivf_topk_persisted,
        ivf_write_cells,
    )

    emb = _emb(spark, sf_dir)
    qvec = list(emb.filter("vec_id = 0").head()["embedding"])
    corpus = emb.filter("vec_id != 0")
    assigned, centroids = ivf_index(corpus, n_centroids=16)
    path = tempfile.mkdtemp(prefix="ivf_cells_")
    try:
        ivf_write_cells(assigned, path)
        out = ivf_topk_persisted(spark, path, centroids, qvec, k=10, n_probes=6)
        # materialize before the cell files vanish
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(path, ignore_errors=True)
