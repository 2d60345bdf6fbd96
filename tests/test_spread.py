"""Conditional scan spread (plans/spread.py, round 14).

The round-11/13 single-file-scan repartitions were unconditional: correct
on the testdata's one-file-per-table layout, but at 100 TB they would
round-robin-shuffle the whole corpus in front of work the scan's file
parallelism already spreads. read_spread gates the repartition on the
scan's ACTUAL parallelism — these tests pin both sides of the gate and
the media width sizing.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from dynaledger_spark.plans.spread import read_spread, scan_stats, spread_if_serial

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


@pytest.fixture(scope="module")
def multifile(spark, tmp_path_factory):
    """A documents corpus split across 40 parquet files — enough files
    that Spark's own split formula gives >= parallelism/2 scan tasks."""
    out = str(tmp_path_factory.mktemp("mf") / "documents.parquet")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    docs.repartition(40).write.mode("overwrite").parquet(out)
    return out


def test_single_file_scan_spreads(spark):
    path = os.path.join(SF, "documents.parquet")
    est, data_bytes = scan_stats(spark, path)
    assert est < max(2, spark.sparkContext.defaultParallelism // 2)
    assert 0 < data_bytes < 1 << 22
    df = read_spread(spark, path)
    assert "RoundRobinPartitioning" in _plan(df)


def test_multi_file_scan_keeps_raw_scan(spark, multifile):
    est, _ = scan_stats(spark, multifile)
    assert est >= max(2, spark.sparkContext.defaultParallelism // 2)
    df = read_spread(spark, multifile)
    assert "Exchange" not in _plan(df)
    # keyed form obeys the same gate
    df = read_spread(spark, multifile, key=F.col("doc_id"))
    assert "Exchange" not in _plan(df)


def test_keyed_spread_on_single_file(spark):
    path = os.path.join(SF, "documents.parquet")
    df = read_spread(spark, path, key=F.col("doc_id"))
    assert "hashpartitioning(doc_id" in _plan(df)


def test_spread_if_serial_derived_frame(spark, multifile):
    path = os.path.join(SF, "documents.parquet")
    base = spark.read.parquet(path).select("doc_id")
    assert "Exchange" in _plan(spread_if_serial(spark, base, path))
    base_mf = spark.read.parquet(multifile).select("doc_id")
    assert "Exchange" not in _plan(spread_if_serial(spark, base_mf, multifile))


def test_spread_preserves_rows(spark):
    path = os.path.join(SF, "documents.parquet")
    raw = spark.read.parquet(path)
    spread = read_spread(spark, path)
    assert sorted(r.doc_id for r in spread.select("doc_id").collect()) == sorted(
        r.doc_id for r in raw.select("doc_id").collect()
    )


def test_media_width_sized_by_bytes_not_cores(spark):
    """A sub-MB corpus must decode in the scan task itself: no exchange
    at all, regardless of core count (the r13 32-way spread made the
    headline media query slower at 32 cores than 8)."""
    from dynaledger_spark.plans.queries_multimodal import _media_decoded

    plan = _plan(_media_decoded(spark, SF))
    assert "Exchange" not in plan
