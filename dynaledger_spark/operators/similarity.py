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

from pyspark.sql import Column, DataFrame, Window
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
    id_col: str = "vec_id",
    seed: int = 42,
    fit_sample: int = 4096,
) -> tuple[DataFrame, list[list[float]]]:
    """Build an IVF index: assign every vector to its nearest k-means
    centroid. Returns (corpus + `centroid` column, centroid list).

    The coarse quantizer never iterates over the corpus: SPHERICAL
    k-means (Lloyd's on L2-normalized vectors, centers renormalized
    each step) runs driver-side on a deterministic hash-sample of
    ~`fit_sample` vectors (k-means centroids stabilize on a sample —
    the quantizer only has to partition space, not be optimal), then
    assignment is ONE distributed pass of pure JVM expressions
    (per-centroid dot-product folds + argmax — with unit centroids,
    max dot ≡ max cosine, and the row's own norm can't change its
    argmax). Spherical matters because downstream search is COSINE:
    plain L2 k-means on raw vectors lets norm dominate cell shape, so
    directionally-close vectors land in different cells. Measured
    recall@10 vs the exact baseline
    (tests/test_pipeline_ops.py::test_ivf_recall_at_10_vs_exact):
    clustered embeddings 0.9 at 2/16 probes (IVF's actual regime);
    the ISOTROPIC sf0.1 testdata — unit-norm near-random vectors,
    top-10 sims only 0.31-0.41 — needs 6/16 probes for 0.9 (4/16
    gives 0.5: on structureless data recall is bounded by scan
    fraction, a data property no quantizer escapes).
    An iterative cluster-side fit would cost `iterations` full scans
    plus job scheduling per step — the dominant cost at any scale, and
    the wrong shape at 100 TB. Cells then get written
    `partitionBy('centroid')` so each query reads only probed
    partitions.
    """
    import numpy as np

    n = emb.count()
    keep_mod = max(1, n // fit_sample)
    # sorted by id: collect() row order depends on partitioning, and the
    # seeded init draws BY POSITION — an unsorted sample would make the
    # fit (and so recall) vary with the caller's partition layout
    sample_rows = (
        emb.select(
            F.col(id_col).alias("i"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .where(F.pmod(F.xxhash64(F.col(id_col)), F.lit(keep_mod)) == 0)
        .collect()
    )
    sample = np.asarray(
        [v for _, v in sorted((r["i"], r["v"]) for r in sample_rows)],
        dtype="float64",
    )
    sample /= np.linalg.norm(sample, axis=1, keepdims=True) + 1e-12
    k = min(n_centroids, len(sample))
    rng = np.random.default_rng(seed)
    centers = sample[rng.choice(len(sample), size=k, replace=False)]
    for _ in range(10):
        assign = (sample @ centers.T).argmax(axis=1)
        new = np.array(
            [
                sample[assign == j].mean(axis=0) if (assign == j).any() else centers[j]
                for j in range(k)
            ]
        )
        new /= np.linalg.norm(new, axis=1, keepdims=True) + 1e-12
        if np.allclose(new, centers):
            break
        centers = new

    v = F.col(vec_col).cast("array<double>")

    def _dot(j: int) -> Column:
        return F.aggregate(
            F.zip_with(
                v,
                F.array(*[F.lit(float(x)) for x in centers[j]]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    # argmax as array_max over (dot, index) structs: struct ordering
    # compares dot first, index breaks exact ties deterministically.
    nearest = F.array_max(
        F.array(
            *[
                F.struct(_dot(j).alias("d"), F.lit(j).alias("j"))
                for j in range(k)
            ]
        )
    )
    assigned = emb.withColumn("centroid", nearest["j"].cast("int"))
    return assigned, [c.tolist() for c in centers]


def ivf_write_cells(
    assigned: DataFrame,
    path: str,
) -> None:
    """Persist an IVF-assigned corpus as centroid-partitioned parquet.

    One directory per cell (`centroid=<j>/`): a probe query's
    `centroid IN (...)` filter becomes a partition filter, so Spark
    lists and scans only the probed cells — the scan cost is
    n_probes/n_centroids of the corpus by construction, which is the
    entire point of IVF at 100 TB. Pruning is plan-asserted in
    tests/test_plans.py::test_ivf_persisted_partition_pruning.
    The pre-write repartition clusters each cell into one task (guide
    §6 output sizing): without it every upstream task writes a sliver
    of every cell — ~512 four-row files at sf0.1 (32 spread tasks ×
    16 cells), which the probe side then pays for in per-file opens.
    One shuffle of skinny assigned rows buys one file per cell (AQE
    coalesces the tiny exchange); row content and therefore probe
    results are unchanged (the reader re-sorts by cos_sim, vec_id).
    """
    assigned.repartition("centroid").write.mode("overwrite").partitionBy(
        "centroid"
    ).parquet(path)


def probe_centroids(
    centroids: list[list[float]], query_vec: list[float], n_probes: int
) -> list[int]:
    """The `n_probes` centroid ids nearest the query by cosine —
    driver-side on the tiny centroid list."""
    import numpy as np

    c = np.asarray(centroids, dtype="float64")
    q = np.asarray(query_vec, dtype="float64")
    sims = (c @ q) / (np.linalg.norm(c, axis=1) * np.linalg.norm(q) + 1e-12)
    return [int(i) for i in np.argsort(-sims)[:n_probes]]


def ivf_topk_persisted(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k against a persisted IVF cell store: read only the
    probed `centroid=` partitions (partition pruning), exact cosine
    re-rank inside them. The index is built once (`ivf_index` +
    `ivf_write_cells`); queries never touch unprobed cells."""
    probes = probe_centroids(centroids, query_vec, n_probes)
    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    cells = spark.read.parquet(path).filter(F.col("centroid").isin(probes))
    return (
        cells.select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


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
    assigned, centroids = ivf_index(
        emb, n_centroids, vec_col=vec_col, id_col=id_col, seed=seed
    )
    probes = probe_centroids(centroids, query_vec, n_probes)

    qcol = F.array(*[F.lit(float(v)) for v in query_vec])
    return (
        assigned.filter(F.col("centroid").isin(probes))
        .select(F.col(id_col), cosine(F.col(vec_col), qcol).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_salt: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Batch k-NN join: exact top-k corpus neighbors for EVERY query row.

    Plan shape for scale: the query set is broadcast (a training-data
    query batch is KBs against a 100 TB corpus), scoring is a map-side
    fan-out (corpus × n_queries rows, no corpus shuffle), and top-k runs
    in TWO stages so no reducer ever sees a query's full score list:

      1. per (query, salt) partial top-k — salt = hash(corpus id) mod
         n_salt spreads each query's scores over n_salt reducers
         (deterministic, partitioning-independent), each keeping ≤ k
         rows via a spillable window sort;
      2. global top-k per query over the ≤ n_salt·k survivors.

    Every global top-k row is in the top-k of its own salt bucket, so
    stage 1 keeps a superset — the two-stage result is exactly the
    single-stage result. Ties break on (cos_sim DESC, corpus id ASC).
    """
    scored = corpus.crossJoin(F.broadcast(queries)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col(query_vec_col)).alias("cos_sim"),
    )
    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salt))
    w1 = Window.partitionBy(query_id_col, salt.alias("salt")).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    partial = scored.withColumn("rn1", F.row_number().over(w1)).filter(
        F.col("rn1") <= k
    )
    w2 = Window.partitionBy(query_id_col).orderBy(
        F.col("cos_sim").desc(), F.col(id_col)
    )
    return (
        partial.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "cos_sim", "rank")
    )
