"""Fact-table builder — the dbt fact models re-expressed in DataFrame ops.

Reference: models/fact_data_load/{balance_sheet,income_statement,
cash_flow}_load.sql (identical shape, parameterized by stmt):

    num ⋈_adsh sub, num ⋈_(adsh,tag) pre, WHERE pre.stmt = <S>
    DENSE_RANK() OVER (PARTITION BY <12 cols> ORDER BY ddate DESC) AS rn
    SELECT <12 cols>, SUM(value) GROUP BY <12 cols>, rn

Faithfully reproduced quirks:
  * the pre join deliberately omits `version` (balance_sheet_load.sql:32-33),
    so a tag presented with several versions multiplies rows — kept;
  * `ddate` appears inside the DENSE_RANK partition key, so rn is
    constantly 1 — kept (the oracle agrees; SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from dynaledger_spark.functions.agg import dsum

STATEMENT_TYPES = {"Balance Sheet": "BS", "Income Statement": "IS", "Cash Flow": "CF"}

_GROUP_COLS = [
    "adsh", "cik", "company_name", "filing_date", "fiscal_year", "fiscal_period",
    "tag", "unit_of_measure", "report_date", "qtrs", "statement_type", "plabel",
]


def build_fact_table(
    num: DataFrame, sub: DataFrame, pre: DataFrame, stmt: str
) -> DataFrame:
    """One fact table (13 cols, §1.5) for a statement type ('BS'/'IS'/'CF').

    Scale notes: both joins shuffle on adsh (the pre join key is a
    superset), so AQE plans a single exchange for num; sub is usually
    small relative to num (one row per filing vs millions of facts) —
    Catalyst broadcast-picks it under the configured threshold. The
    groupBy reuses the join clustering on adsh.
    """
    joined = (
        num.join(sub.select("adsh", "cik", "name", "filed", "fy", "fp"), "adsh")
        .join(
            pre.select("adsh", "tag", "stmt", "plabel").filter(F.col("stmt") == stmt),
            ["adsh", "tag"],
        )
        .select(
            "adsh",
            "cik",
            F.col("name").alias("company_name"),
            F.col("filed").alias("filing_date"),
            F.col("fy").alias("fiscal_year"),
            F.col("fp").alias("fiscal_period"),
            "tag",
            F.col("uom").alias("unit_of_measure"),
            F.col("ddate").alias("report_date"),
            "qtrs",
            F.col("stmt").alias("statement_type"),
            "plabel",
            "value",
        )
    )
    w = W.partitionBy(*_GROUP_COLS).orderBy(F.col("report_date").desc())
    # DECIMAL-accumulated sum (functions/agg.dsum): exact and associative,
    # so partial aggregates combine in any order — the result is identical
    # across retries, partitionings, and engines (registry determinism
    # contract applied to the ingest path).
    return (
        joined.withColumn("rn", F.dense_rank().over(w))
        .groupBy(*_GROUP_COLS, "rn")
        .agg(dsum(F.col("value"), "total_value"))
        .drop("rn")
    )


def build_all_facts(
    num: DataFrame, sub: DataFrame, pre: DataFrame
) -> dict[str, DataFrame]:
    """BALANCE_SHEET / INCOME_STATEMENT / CASH_FLOW fact tables."""
    return {
        "BALANCE_SHEET": build_fact_table(num, sub, pre, "BS"),
        "INCOME_STATEMENT": build_fact_table(num, sub, pre, "IS"),
        "CASH_FLOW": build_fact_table(num, sub, pre, "CF"),
    }


def build_facts_single_pass(num: DataFrame, sub: DataFrame, pre: DataFrame) -> DataFrame:
    """All three statement fact tables in ONE pass over num.

    `build_all_facts` mirrors the reference's three separate dbt models
    (one SELECT per statement), which re-joins and re-shuffles the full
    num table three times. Because `statement_type` is already a group
    column, one join + one aggregate produces every statement's rows;
    writing the result `partitionBy('statement_type')` yields the same
    three physical tables at a third of the shuffle cost — the ingest-
    path shape for a multi-quarter backfill.

    The DENSE_RANK window is eliminated, provably without effect: its
    partition key contains `report_date` (= the ORDER BY column ddate),
    so within any partition every row has the same ddate and the rank
    is the constant 1 — grouping by (12 cols, rn) equals grouping by
    the 12 cols. tests/test_sec_pipeline.py pins equality against the
    per-statement builders row for row.
    """
    joined = (
        num.join(sub.select("adsh", "cik", "name", "filed", "fy", "fp"), "adsh")
        .join(
            pre.select("adsh", "tag", "stmt", "plabel").filter(
                F.col("stmt").isin(*STATEMENT_TYPES.values())
            ),
            ["adsh", "tag"],
        )
        .select(
            "adsh",
            "cik",
            F.col("name").alias("company_name"),
            F.col("filed").alias("filing_date"),
            F.col("fy").alias("fiscal_year"),
            F.col("fp").alias("fiscal_period"),
            "tag",
            F.col("uom").alias("unit_of_measure"),
            F.col("ddate").alias("report_date"),
            "qtrs",
            F.col("stmt").alias("statement_type"),
            "plabel",
            "value",
        )
    )
    return joined.groupBy(*_GROUP_COLS).agg(dsum(F.col("value"), "total_value"))
