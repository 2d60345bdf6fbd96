"""Multi-quarter SEC backfill e2e (VERDICT r8 items 5-6).

The reference's actual operating mode is quarterly accretion: per-quarter
raw tables (snowflake_raw_data_loader.py:50) and latest-partition
discovery before each load (load_json_data_snowflake.py:30-59). This
module drives FOUR synthetic quarters through the full engine path —

    ZIP -> extract -> typed parquet -> append_quarter_facts
        -> partition-pruned statement read     (plan-asserted, DPP shape)
        -> DuckDB row parity on a quarter's facts
    and the adsh-bucketed raw store
        -> zero-Exchange statement join        (plan-pinned)
        -> DuckDB row parity on the join

— so the partition layout, the accretion semantics, and the bucketed
join are all proven on SEC-shaped data, not just on TPC-H tables.
"""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from dynaledger_spark.operators.backfill import (
    append_quarter_bucketed,
    append_quarter_facts,
    bucketed_statement_join,
    drop_bucketed,
    latest_fact_quarter,
    statement_facts,
)
from dynaledger_spark.sources.parquet_io import write_partitioned
from dynaledger_spark.sources.tsv import extract_zip, ingest_quarter
from tests.oracle_compare import compare

QUARTERS = ("2024Q1", "2024Q2", "2024Q3", "2024Q4")
_BKT = "bktq"  # bucketed-store suffix for this module


def _ingest_bench():
    spec = importlib.util.spec_from_file_location(
        "ingest_bench_bf",
        os.path.join(
            os.path.dirname(os.path.dirname(__file__)), "tools", "ingest_bench.py"
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def backfill(spark, tmp_path_factory):
    """Four quarters ingested and accreted into (a) the partitioned fact
    store and (b) the adsh-bucketed raw tables; typed parquet kept on
    disk for DuckDB parity."""
    bench = _ingest_bench()
    root = tmp_path_factory.mktemp("sec_backfill")
    facts_root = str(root / "facts")
    typed_root = str(root / "typed")
    drop_bucketed(spark, suffix=_BKT)
    for q in QUARTERS:
        zp = str(root / f"{q}.zip")
        bench.build_quarter_zip(zp, n_num=6_000, n_sub=100, n_tag=300, quarter=q)
        typed = ingest_quarter(spark, extract_zip(zp, str(root / f"ext_{q}")), q)
        for table in ("sec_sub", "sec_pre", "sec_num"):
            write_partitioned(
                typed[table], os.path.join(typed_root, table), mode="append"
            )
        append_quarter_facts(
            typed["sec_num"], typed["sec_sub"], typed["sec_pre"], q, facts_root
        )
        append_quarter_bucketed(typed, n_buckets=8, suffix=_BKT)
    yield {"facts": facts_root, "typed": typed_root}
    drop_bucketed(spark, suffix=_BKT)


@pytest.fixture(scope="module")
def duck_typed(backfill):
    """DuckDB views over the SAME typed parquet the engine accreted,
    hive-partitioned so source_file comes back as a column."""
    con = duckdb.connect()
    for table in ("sec_sub", "sec_pre", "sec_num"):
        con.execute(
            f"CREATE VIEW {table} AS SELECT * FROM read_parquet("
            f"'{backfill['typed']}/{table}/*/*.parquet', hive_partitioning=1)"
        )
    yield con
    con.close()


def test_latest_partition_discovery(spark, backfill):
    """load_json_data_snowflake.py:30-59's probe: the MAX over the
    partition column folds directory names only."""
    assert latest_fact_quarter(spark, backfill["facts"]) == "2024Q4"


def test_statement_read_prunes_partitions(spark, backfill):
    """The recurring (quarter, statement) read must touch exactly one
    leaf directory: every input file carries both partition values, and
    the scan's PartitionFilters show the pruning is planner-level, not
    a post-scan filter."""
    df = statement_facts(spark, backfill["facts"], "2024Q2", "IS")
    assert df.count() > 0
    # files actually opened at execution (inputFiles() would report the
    # pre-pruning file index): all inside the single pruned leaf dir
    files = [
        r[0] for r in df.select(F.input_file_name()).distinct().collect()
    ]
    assert files, "no input files resolved"
    for f in files:
        assert "source_file=2024Q2" in f and "statement_type=IS" in f, f
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "source_file" in plan.split("PartitionFilters", 1)[1][:300]


def test_backfill_facts_parity_duckdb(spark, backfill, duck_typed):
    """One quarter's accreted facts vs the dbt-shaped DuckDB twin over
    the same typed parquet (DECIMAL-folded sum -> bitwise equality)."""
    got = statement_facts(spark, backfill["facts"], "2024Q3", "BS").drop(
        "source_file", "statement_type"
    )
    twin = """
        SELECT num.adsh, sub.cik, sub.name AS company_name,
               sub.filed AS filing_date, sub.fy AS fiscal_year,
               sub.fp AS fiscal_period, num.tag, num.uom AS unit_of_measure,
               num.ddate AS report_date, num.qtrs, pre.plabel,
               CAST(SUM(CAST(num.value AS DECIMAL(27,6))) AS DOUBLE)
                   AS total_value
        FROM sec_num num
        JOIN sec_sub sub ON num.adsh = sub.adsh
        JOIN sec_pre pre ON num.adsh = pre.adsh AND num.tag = pre.tag
        WHERE pre.stmt = 'BS' AND num.source_file = '2024Q3'
        GROUP BY ALL
    """
    compare(got, duck_typed, twin)


def test_cross_quarter_facts_are_disjoint_and_complete(spark, backfill):
    """Accretion is append-only: every quarter's partition exists, and
    no filing leaks across quarters (disjoint adsh pools by
    construction)."""
    facts = spark.read.parquet(backfill["facts"])
    per_q = {
        r["source_file"]: r["n"]
        for r in facts.groupBy("source_file").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(per_q) == set(QUARTERS)
    assert all(n > 0 for n in per_q.values())
    leaks = (
        facts.groupBy("adsh")
        .agg(F.countDistinct("source_file").alias("nq"))
        .filter("nq > 1")
        .count()
    )
    assert leaks == 0


def test_bucketed_statement_join_zero_exchange(spark, backfill):
    """VERDICT item 6: over the adsh-bucketed raw store the RAW
    statement join (backend/main.py:163-177 shape) plans with ZERO
    Exchange — for EVERY accreted quarter, i.e. the shuffle was paid
    once at ingest and never again. Broadcast is disabled to surface
    the large-large (100 TB) plan; at toy scale AQE would broadcast."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        for q in ("2024Q1", "2024Q4"):
            df = bucketed_statement_join(spark, q, "BS", suffix=_BKT)
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan, plan[:2000]
            assert "Exchange" not in plan, plan[:2000]
            assert df.count() > 0
        # ADVICE r9 item 3: the subset-key co-partition relaxation is
        # scoped to the clone session the DataFrame is bound to — the
        # SHARED session keeps the default safety for every later query.
        assert (
            spark.conf.get("spark.sql.requireAllClusterKeysForCoPartition")
            == "true"
        )
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_statement_join_parity(spark, backfill, duck_typed):
    """The bucketed layout changes the PLAN, never the result: row-level
    parity of the statement join against DuckDB over the typed
    parquet."""
    got = bucketed_statement_join(spark, "2024Q2", "IS", suffix=_BKT)
    twin = """
        SELECT sub.adsh, sub.cik, sub.name, sub.filed,
               pre.line, pre.plabel,
               num.tag, num.version, num.ddate, num.qtrs, num.uom, num.value
        FROM sec_sub sub
        JOIN sec_pre pre ON sub.adsh = pre.adsh
        JOIN sec_num num ON sub.adsh = num.adsh
             AND pre.tag = num.tag AND pre.version = num.version
        WHERE pre.stmt = 'IS' AND sub.source_file = '2024Q2'
    """
    compare(got, duck_typed, twin)
