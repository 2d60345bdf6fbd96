"""Conditional single-file-scan parallelization (VERDICT r13 item 2).

The driver testdata ships ONE single-row-group parquet file per table, so
every scan is structurally 1-task while the text/vector operators do heavy
per-row expression work (regex, shingling, hash folds, d² outer products).
Round 11-13 parallelized those map sides with an unconditional
``repartition(defaultParallelism)`` — correct at sf0.1, but at 100 TB that
line round-robin-shuffles the entire corpus (full text bytes) in front of
work the scan's natural file parallelism would already spread: exactly the
anti-pattern dedup_exact removed in r13.

``read_spread`` makes the spread CONDITIONAL ON THE SCAN'S ACTUAL
PARALLELISM instead of hoping someone deletes the line at scale: it
estimates the scan's input-partition count with Spark's own split formula
(FilePartition.maxSplitBytes — the same session confs the planner reads)
from a Hadoop-FS listing of the input, and returns the raw scan unchanged
whenever the files alone give at least half the cluster's parallelism.
The estimate is decision-grade by construction: at testdata scale it says
"a handful of splits" (spread fires, plan unchanged vs r13), at 100 TB the
listing early-exits after ~maxPartitionBytes·parallelism/2 cumulative
bytes (a few dozen file stats) and the spread vanishes. A planning-time
file listing costs ~ms and touches no data, unlike an ``df.rdd``
partition probe (~50-150 ms of physical planning per query build).

Why half, not all: the gate only needs to separate "structurally serial
scan" (1-3 splits) from "the scan already feeds every core"; demanding
full parallelism would re-introduce the shuffle on inputs with, say, 20
of 32 splits, where the spread buys at most 1.6x on the map side but
pays a full-corpus shuffle for it.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession


def scan_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(estimated scan partitions, data bytes seen) for a parquet input.

    Mirrors Spark's FilePartition sizing: each file is charged
    ``spark.sql.files.openCostInBytes``; the split size is
    ``min(maxPartitionBytes, max(openCost, totalBytes/parallelism))``.
    Listing goes through the Hadoop FileSystem API (HDFS/S3-safe — the
    streaming/ingest.py posture) and EARLY-EXITS once enough bytes are
    seen to guarantee ≥ parallelism/2 splits at the largest possible
    split size, so the probe is O(dozens of file stats) at any scale.
    Returns (a huge estimate, data bytes seen so far) on that early
    exit. The second element excludes the open-cost charge — it is the
    input's real size, for width sizing.
    """
    sc = spark.sparkContext
    conf = spark._jsparkSession.sessionState().conf()
    max_split = int(conf.filesMaxPartitionBytes())
    open_cost = int(conf.filesOpenCostInBytes())
    parallelism = sc.defaultParallelism
    enough = max_split * max(1, parallelism // 2)

    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    data = 0
    charged = 0
    files = fs.listFiles(hpath, True)
    while files.hasNext():
        status = files.next()
        name = status.getPath().getName()
        if name.startswith(("_", ".")):  # _SUCCESS, metadata, hidden
            continue
        data += int(status.getLen())
        charged += int(status.getLen()) + open_cost
        if charged >= enough:
            # est ≥ charged/max_split ≥ parallelism/2 no matter what the
            # remaining files add — the caller only needs the inequality.
            return (1 << 30), data
    if charged <= 0:
        return 0, 0
    split = min(max_split, max(open_cost, charged // max(1, parallelism)))
    return math.ceil(charged / split), data


def read_spread(
    spark: SparkSession,
    path: str,
    key: Column | str | None = None,
    width: int | None = None,
) -> DataFrame:
    """Parquet scan, repartitioned (round-robin, or by ``key``) to
    ``width`` (default ``defaultParallelism``) ONLY when the input lacks
    file parallelism; the raw scan otherwise.

    ``width`` follows ``local[$SPARK_GRAFT_CPUS]`` by default, so the
    driver's low-core scaling run sees the same plan shape at every core
    count; at real scale the gate removes the exchange entirely.
    """
    return spread_if_serial(
        spark, spark.read.parquet(path), path, key=key, width=width
    )


def spread_if_serial(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    key: Column | str | None = None,
    width: int | None = None,
) -> DataFrame:
    """Conditionally repartition an already-derived frame whose lineage
    is a scan of ``path`` (e.g. a catalog read + projection/filter) —
    for spread sites that sit on skinny pre-explode rows rather than on
    the raw scan. Same gate as ``read_spread``."""
    est, _ = scan_stats(spark, path)
    if est >= max(2, spark.sparkContext.defaultParallelism // 2):
        return df
    target = width or spark.sparkContext.defaultParallelism
    return df.repartition(target) if key is None else df.repartition(target, key)
