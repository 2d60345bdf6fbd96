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
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# Sequential left-fold sum of squares — identical fold order both engines.
_SQ_FOLD_SPARK = (
    "aggregate(embedding, CAST(0.0 AS DOUBLE),"
    " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"
)
_SQ_FOLD_DUCK = (
    "list_aggregate(list_transform(embedding,"
    " x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')"
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
