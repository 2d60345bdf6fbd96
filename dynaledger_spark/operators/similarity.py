"""Similarity search over embedding columns (array<float>).

Two paths, one contract:
  * `cosine_topk` — brute-force exact top-k for one query vector: a single
    map-side pass (no shuffle except the final TakeOrdered), the
    correctness baseline.
  * `lsh_topk` — random-hyperplane LSH: bucket the corpus by sign bits,
    probe only the query's bucket (plus optional multi-probe neighbors at
    Hamming distance 1), exact cosine on the candidates. At 100 TB the
    bucketed table is written once (partitioned by bucket) and each query
    touches one partition.

All vector math is a JVM-side fold in double precision — no UDFs, no
collect of the corpus.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (order-deterministic)."""
    return F.aggregate(
        F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            _to_double(a), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against one literal query vector.

    The query is inlined as an array literal → scan-project-TakeOrdered;
    Catalyst never shuffles the corpus.
    """
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = emb.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def bucket_of(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id (bigint) of a vector under the hyperplanes."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(dot(vec, p) > 0, F.lit(2 ** i)).otherwise(0).cast("long")
    return bucket


def bucketize(
    emb: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus + LSH bucket column (write once, partition by bucket at scale)."""
    return emb.withColumn("bucket", bucket_of(F.col(vec_col), planes))


def _query_bucket(query_vec: list[float], planes: list[list[float]]) -> int:
    b = 0
    for i, plane in enumerate(planes):
        s = sum(float(x) * float(y) for x, y in zip(query_vec, plane))
        if s > 0:
            b += 2 ** i
    return b


def _probe_buckets(qb: int, n_planes: int, depth: int) -> list[int]:
    """All buckets within Hamming distance ≤ depth of the query bucket."""
    from itertools import combinations

    probes = [qb]
    for d in range(1, depth + 1):
        for bits in combinations(range(n_planes), d):
            flip = 0
            for i in bits:
                flip |= 1 << i
            probes.append(qb ^ flip)
    return probes


def lsh_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    probe_depth: int = 1,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: probe the query's sign-LSH bucket plus all
    buckets within Hamming distance ≤ probe_depth (multiprobe), then rank
    candidates by exact cosine. Bigger depth trades scan fraction for
    recall — at 100 TB each bucket is a partition, so cost is
    proportional to buckets probed, not corpus size."""
    dim = len(query_vec)
    planes = random_hyperplanes(dim, n_planes, seed)
    qb = _query_bucket(query_vec, planes)
    probes = _probe_buckets(qb, n_planes, probe_depth)
    bucketed = bucketize(emb, planes, vec_col)
    cands = bucketed.filter(F.col("bucket").isin(probes))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        cands.select(F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def norm_stats(emb: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Per-vector L2 norm + dimension (quality gate for embedding columns)."""
    return emb.select(
        F.col(id_col),
        F.size(vec_col).alias("dim"),
        l2_norm(F.col(vec_col)).alias("l2_norm"),
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: k-means coarse quantizer + probed exact re-rank
# ---------------------------------------------------------------------------
def ivf_index(
    emb: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF index: assign every vector to its nearest k-means
    centroid. Returns (corpus + `centroid` column, centroid list).

    At 100 TB: fit on a sample (KMeans is iterative — never on the full
    corpus), write the assigned corpus partitioned by `centroid`, keep
    the tiny centroid list driver-side. Each query then reads only the
    probed partitions.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = emb.withColumn("_features", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(
        k=n_centroids, seed=seed, featuresCol="_features", predictionCol="centroid"
    ).fit(feats)
    assigned = model.transform(feats).drop("_features")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    n_probes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF: probe the `n_probes` centroids nearest
    the query (cosine, computed driver-side on the tiny centroid list),
    exact cosine re-rank inside the probed cells. Scan fraction ≈
    n_probes / n_centroids."""
    import numpy as np

    assigned, centroids = ivf_index(emb, n_centroids, vec_col, seed)
    c = np.asarray(centroids, dtype="float64")
    q = np.asarray(query_vec, dtype="float64")
    sims = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-12)
    probes = [int(i) for i in np.argsort(-sims)[:n_probes]]

    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        assigned.filter(F.col("centroid").isin(probes))
        .select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
