"""Classic TPC-H analytics adapted to the testdata schema (round-6
batch 1).

DynaLedger's user-facing surface is ad-hoc analytical SQL over a
star-schema warehouse (reference: backend/main.py:109-221 forwards
arbitrary SELECTs; streamlit_app.py renders the result grid). The
TPC-H query suite is the canonical claim check for that capability —
Q1 landed in round 5 (queries_stats.tpch_q1_pricing_summary); this
module adds the join-heavy classics the testdata schema can express:
Q3 (shipping priority), Q5 (local-supplier volume), Q6 (forecast
revenue change), Q10 (returned items), Q14 (promotion effect). The
testdata lacks l_shipmode/l_commitdate/partsupp, so Q4/Q9/Q12/Q19-
class queries are out of schema reach; parameters are shifted into
the generated 1995-2001 date range.

Exactness: every money SUM accumulates in DECIMAL (functions/agg.dsum
and its SQL twin osum) so partial-aggregate combine order cannot move
a result; ratios divide once in double and round at a fixed scale;
output dates render as strings; every ORDER BY carries a unique
tiebreaker.

Scale posture (100 TB): Q6 is a pure scan-aggregate — filters and the
7-column projection push into the parquet scan, one map-side-combined
partial per partition, no exchange beyond the final 1-row reduce. Q3/
Q5/Q10 shuffle lineitem once on l_orderkey to meet orders (the
unavoidable big-big join) and take every dimension side either as an
explicit broadcast (nation/region — O(100) rows forever) or a plain
equi-join whose strategy AQE picks from runtime sizes (customer/
supplier/part: broadcastable at test SF, sort-merge at 100 TB — the
declarative plan survives both). Q3/Q10's top-k is TakeOrdered
(per-partition heap + driver merge of k rows), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynaledger_spark.functions.agg import dsum, osum
from dynaledger_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from dynaledger_spark.catalog import read_table

    return read_table(spark, sf_dir, name)


def _rev():
    # built lazily: F.col needs an active SparkContext at call time
    return F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))


_REV_SQL = "l_extendedprice * (1 - l_discount)"


# ---------------------------------------------------------------------------
# Q3 — shipping priority: top unshipped orders by outstanding revenue
# ---------------------------------------------------------------------------
@register(
    "tpch_q3_shipping_priority",
    doc="TPC-H Q3: top-10 BUILDING-segment orders not yet shipped by 1998-06-01, by revenue",
    oracle=f"""
        SELECT l_orderkey,
               {osum(_REV_SQL, 'revenue')},
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_orderpriority
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-06-01'
          AND l_shipdate  > TIMESTAMP '1998-06-01'
        GROUP BY l_orderkey, orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 semantics on the testdata schema: revenue still on the
    table for BUILDING-segment orders placed before the cutoff whose
    items ship after it. The segment filter prunes customers BEFORE the
    join (predicate pushdown into the scan), lineitem meets orders on
    the orderkey shuffle, and the final top-10 is a TakeOrdered over
    the aggregated per-order rows.
    """
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(_rev(), "revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q5 — local supplier volume per nation within a region-year
# ---------------------------------------------------------------------------
@register(
    "tpch_q5_local_supplier_volume",
    doc="TPC-H Q5: 1996 revenue by ASIA nation where supplier and customer share the nation",
    oracle=f"""
        SELECT n_name, {osum(_REV_SQL, 'revenue')}
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
                     AND c_nationkey = s_nationkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1997-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue a region's nations generated in a year through
    LOCAL commerce (supplier nation == customer nation). nation⨝region
    is an explicit broadcast (O(100) rows at any scale); supplier and
    customer join declaratively so AQE broadcasts them at test SF and
    sort-merges at warehouse scale; lineitem→orders is the one big-big
    orderkey shuffle. The local-commerce constraint lands as the
    c_nationkey = s_nationkey equi-condition on the customer join, not
    a post-filter — Catalyst keeps it in the join key set.
    """
    nr = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey")
    )
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (supp.s_nationkey == cust.c_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(_rev(), "revenue"))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


# ---------------------------------------------------------------------------
# Q6 — forecast revenue change: the pure scan-aggregate
# ---------------------------------------------------------------------------
@register(
    "tpch_q6_forecast_revenue",
    doc="TPC-H Q6: 1997 revenue lift from discounts 5-7% on small quantities — pure scan-agg",
    oracle=f"""
        SELECT {osum('l_extendedprice * l_discount', 'revenue')},
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: what revenue would have been kept had mid-range
    discounts on small orders been revoked. The benchmark's pure
    scan-aggregate: all three predicates and the 4-column projection
    push into the parquet scan, one whole-stage-codegen'd partial
    aggregate per partition, a single 1-row exchange. The shape whose
    100 TB cost is I/O-bound by construction.
    """
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Q10 — returned-item reporting: who sent the most revenue back
# ---------------------------------------------------------------------------
@register(
    "tpch_q10_returned_items",
    doc="TPC-H Q10: top-20 customers by revenue returned in 1997Q1",
    oracle=f"""
        SELECT c_custkey, c_name, {osum(_REV_SQL, 'revenue')},
               c_acctbal, n_name, c_mktsegment
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-04-01'
          AND l_returnflag = 'R'
        GROUP BY c_custkey, c_name, c_acctbal, n_name, c_mktsegment
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: the quarter's top returners — the support-escalation
    report. Both selective filters (order quarter, returnflag) push to
    their scans before the orderkey shuffle; nation broadcasts; the
    customer join strategy is AQE's call. Top-20 via TakeOrdered on
    the aggregated per-customer rows.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name", "c_mktsegment")
        .agg(dsum(_rev(), "revenue"))
        .select(
            "c_custkey", "c_name", "revenue", "c_acctbal", "n_name",
            "c_mktsegment",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect: share of a month's revenue from promo parts
# ---------------------------------------------------------------------------
@register(
    "tpch_q14_promo_effect",
    doc="TPC-H Q14: % of 1997-09 revenue from PROMO-type parts",
    oracle=f"""
        SELECT round(
                   100.0
                   * CAST(SUM(CASE WHEN p_type = 'PROMO'
                              THEN CAST({_REV_SQL} AS DECIMAL(27,6))
                              ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
                   / CAST(SUM(CAST({_REV_SQL} AS DECIMAL(27,6))) AS DOUBLE), 9)
               AS promo_revenue_pct,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-09-01'
          AND l_shipdate <  TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: marketing's monthly scorecard — what fraction of
    revenue moved through promotional parts. One month of lineitem
    (shipdate filter pushed to the scan) joins part on partkey (AQE
    strategy); both the promo and total sums accumulate in DECIMAL and
    the percentage is ONE double division rounded at 9, so the
    conditional-sum combine order is irrelevant on both engines.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    dec = _rev().cast("decimal(27,6)")
    zero = F.lit(0).cast("decimal(27,6)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", dec).otherwise(zero))
                .cast("double")
                / F.sum(dec).cast("double"),
                9,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )
