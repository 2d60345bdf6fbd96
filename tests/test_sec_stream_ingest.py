"""Streaming SEC ingest: exactly-once per landed file, typed output
identical to the batch path, incremental re-runs are no-ops."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from dynaledger_spark.schemas import NUM_SCHEMA
from dynaledger_spark.streaming.sec_ingest import run_ingest, sec_tsv_stream

HEADER = "adsh\ttag\tversion\tddate\tqtrs\tuom\tsegments\tcoreg\tvalue\tfootnote"


def _write_tsv(path: str, rows: list[str]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(HEADER + "\n")
        for r in rows:
            f.write(r + "\n")


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "landing" / "2023Q1"),
        str(tmp_path / "table"),
        str(tmp_path / "ckpt"),
    )


def _schema_with_source() -> T.StructType:
    return NUM_SCHEMA


def test_streaming_ingest_exactly_once(spark, dirs):
    landing, table, ckpt = dirs
    _write_tsv(
        f"{landing}/num1.txt",
        [
            "a-1\tAssets\tv1\t20230331\t0\tUSD\t\t\t100.5\t",
            "a-1\tLiab\tv1\t20230331\t0\tUSD\t\t\tnot_a_number\t",  # coerce→null
        ],
    )
    stream = sec_tsv_stream(spark, landing + "/*.txt", _schema_with_source(), source_file="2023Q1")
    run_ingest(stream, table, ckpt)
    got = spark.read.parquet(table)
    assert got.count() == 2
    row = {r.tag: r for r in got.collect()}
    assert row["Assets"].value == 100.5
    assert row["Liab"].value is None  # ON_ERROR=CONTINUE semantics
    assert row["Assets"].ddate == 20230331
    assert row["Assets"].source_file == "2023Q1"

    # re-run with no new files: checkpoint makes it a no-op
    run_ingest(sec_tsv_stream(spark, landing + "/*.txt", _schema_with_source(), source_file="2023Q1"), table, ckpt)
    assert spark.read.parquet(table).count() == 2

    # a new file lands: only its rows append
    _write_tsv(f"{landing}/num2.txt", ["b-2\tRevenue\tv1\t20230331\t1\tUSD\t\t\t7.25\t"])
    run_ingest(sec_tsv_stream(spark, landing + "/*.txt", _schema_with_source(), source_file="2023Q1"), table, ckpt)
    final = spark.read.parquet(table)
    assert final.count() == 3
    assert final.filter("tag = 'Revenue'").head().value == 7.25


def test_streaming_types_match_batch_schema(spark, dirs):
    landing, table, ckpt = dirs
    _write_tsv(f"{landing}/num1.txt", ["a-1\tAssets\tv1\t20230331\t0\tUSD\t\t\t1.0\t"])
    run_ingest(
        sec_tsv_stream(spark, landing + "/*.txt", NUM_SCHEMA, source_file="2023Q1"),
        table,
        ckpt,
    )
    got = spark.read.parquet(table)
    want = {f.name: f.dataType for f in NUM_SCHEMA.fields}
    for f in got.schema.fields:
        assert want[f.name] == f.dataType, f.name
