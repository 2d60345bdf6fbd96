"""Classic TPC-H analytics adapted to the testdata schema.

DynaLedger's user-facing surface is ad-hoc analytical SQL over a
star-schema warehouse (reference: backend/main.py:109-221 forwards
arbitrary SELECTs; streamlit_app.py renders the result grid). The
TPC-H query suite is the canonical claim check for that capability —
Q1 landed in round 5 (queries_stats.tpch_q1_pricing_summary); round 6
added the join-heavy classics Q3 (shipping priority), Q5 (local-
supplier volume), Q6 (forecast revenue change), Q10 (returned items),
Q14 (promotion effect); round 7 completes every schema-expressible
query: Q7 (volume shipping), Q8 (market share), Q13 (order-count
distribution), Q15 (top supplier), Q17 (correlated small-quantity
AVG), Q18 (large-volume customers), Q22 (NOT EXISTS + scalar AVG).
The testdata lacks l_shipmode/l_commitdate/partsupp and the comment/
phone/container columns, so Q2/Q4/Q9/Q11/Q12/Q16/Q19/Q20/Q21 are out
of schema reach and Q13/Q17/Q22 are adapted (documented per query);
parameters are shifted into the generated 1995-2001 date range.

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
    sort-merges at warehouse scale. Join order: the YEAR-FILTERED
    orders meets lineitem FIRST (the one big-big orderkey shuffle) so
    the selective o_orderdate predicate shrinks lineitem before the
    supplier join — at warehouse scale, where supplier is no longer
    broadcastable, the old supplier-first order would shuffle the full
    lineitem twice (suppkey then orderkey). The local-commerce
    constraint lands as the c_nationkey = s_nationkey equi-condition
    on the customer join, not a post-filter — Catalyst keeps it in the
    join key set.
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
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
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
                   * CAST(SUM(CASE WHEN p_type LIKE 'PROMO%'
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
                * F.sum(
                    F.when(F.col("p_type").startswith("PROMO"), dec).otherwise(zero)
                )
                .cast("double")
                / F.sum(dec).cast("double"),
                9,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping: cross-border revenue by (supplier nation,
# customer nation, ship year). Adapted: grouped over ALL nation pairs
# rather than one fixed pair (the sf0.001 testdata has only 10
# suppliers, so any fixed pair is empty at the smallest SF; the
# all-pairs rollup keeps the query's shape — two nation dimension
# joins on opposite sides of the fact — with a bounded ≤25·24·2-row
# output).
# ---------------------------------------------------------------------------
@register(
    "tpch_q7_volume_shipping",
    doc="TPC-H Q7 (adapted): cross-border revenue by supplier-nation x customer-nation x ship year",
    oracle=f"""
        SELECT n1.n_name AS supp_nation,
               n2.n_name AS cust_nation,
               CAST(strftime(l_shipdate, '%Y') AS BIGINT) AS l_year,
               {osum(_REV_SQL, 'revenue')},
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 semantics: revenue that CROSSED a border, by the two
    nations involved and ship year. nation broadcasts twice (aliased);
    the ship-year window pushes into the lineitem scan; supplier and
    customer join declaratively (AQE broadcast at test SF, sort-merge
    at warehouse scale); lineitem→orders is the one big-big orderkey
    shuffle. The n1≠n2 cross-border predicate is a post-join filter on
    two broadcast-joined dim columns — O(1) per row, never a blowup.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    supp = _t(spark, sf_dir, "supplier")
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.date_format("l_shipdate", "yyyy").cast("bigint").alias("l_year"),
        )
        .agg(
            dsum(_rev(), "revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# ---------------------------------------------------------------------------
# Q8 — national market share: one supplier nation's share of a
# region's spend on one part type, by order year
# ---------------------------------------------------------------------------
@register(
    "tpch_q8_market_share",
    doc="TPC-H Q8: NATION_3's share of ASIA's ECONOMY-part revenue, by order year",
    oracle=f"""
        WITH hits AS (
            SELECT CAST(strftime(o_orderdate, '%Y') AS BIGINT) AS o_year,
                   CAST({_REV_SQL} AS DECIMAL(27,6)) AS volume,
                   n1.n_name AS supp_nation
            FROM lineitem
            JOIN part     ON p_partkey = l_partkey
            JOIN orders   ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            JOIN region   ON n2.n_regionkey = r_regionkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            WHERE r_name = 'ASIA'
              AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1998-01-01'
        )
        SELECT o_year,
               round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(27,6)) END) AS DOUBLE)
                     / CAST(SUM(volume) AS DOUBLE), 9) AS mkt_share,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM hits
        GROUP BY o_year
        ORDER BY o_year
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: what fraction of ASIA's ECONOMY-part revenue flowed
    through NATION_3 suppliers, per order year. The p_type filter
    prunes part before its join; region restricts the CUSTOMER side
    (nation⨝region broadcast) while the numerator condition reads the
    SUPPLIER side's broadcast nation name. Both the conditional and
    total sums accumulate in DECIMAL; the share is ONE double division
    rounded at 9 — combine order cannot move it on either engine.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = _t(spark, sf_dir, "customer")
    cust_nat = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp = _t(spark, sf_dir, "supplier")
    supp_nat = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    vol = _rev().cast("decimal(27,6)")
    zero = F.lit(0).cast("decimal(27,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cust_nat), cust.c_nationkey == F.col("cn_key"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(supp_nat), supp.s_nationkey == F.col("sn_key"))
        .groupBy(
            F.date_format("o_orderdate", "yyyy").cast("bigint").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                9,
            ).alias("mkt_share"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy("o_year")
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution. Adapted: the testdata has
# no o_comment, so the canonical "NOT LIKE '%special%requests%'"
# exclusion becomes an o_orderpriority exclusion with the same shape
# (a filtered LEFT join preserving order-less customers).
# ---------------------------------------------------------------------------
@register(
    "tpch_q13_order_count_distribution",
    doc="TPC-H Q13 (adapted): distribution of per-customer non-URGENT order counts",
    oracle="""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
        FROM (
            SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
                            AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey
        )
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
)
def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed 0, 1, 2, … qualifying
    orders. The priority exclusion lives IN the join condition (not a
    WHERE), so customers whose orders are all excluded still appear
    with c_count = 0 — the LEFT-join-then-COUNT(col) shape, where
    COUNT over the nullable key counts only matches. Two hash
    aggregates after one custkey shuffle; the second groups the
    already-tiny per-customer rollup.
    """
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).cast("bigint").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier: the supplier(s) hitting the quarter's max revenue
# ---------------------------------------------------------------------------
@register(
    "tpch_q15_top_supplier",
    doc="TPC-H Q15: supplier(s) with maximum 1997Q1 shipped revenue",
    oracle=f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no, {osum(_REV_SQL, 'total_revenue')}
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier
        JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the quarter's revenue champion, ties included — the
    classic scalar-subquery-against-a-derived-view shape. The quarter
    filter pushes into the scan; per-supplier revenue is one hash
    aggregate; the MAX is a 1-row broadcast crossJoin (the engine's
    standard decorrelation for scalar subqueries) and the equality
    filter keeps exact ties. Revenue values are DECIMAL-accumulated
    doubles, so the equality against MAX is bitwise-safe on both
    engines.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev(), "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue: the correlated-AVG subquery.
# Adapted: the testdata part has no p_container, so the brand filter
# stands alone.
# ---------------------------------------------------------------------------
@register(
    "tpch_q17_small_quantity_revenue",
    doc="TPC-H Q17 (adapted): avg yearly revenue lost if sub-half-average-quantity Brand#1 orders stopped",
    oracle="""
        SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE)
                     / 7.0, 9) AS avg_yearly,
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#1'
          AND l_quantity < (SELECT 0.5 * AVG(l_quantity)
                            FROM lineitem l2
                            WHERE l2.l_partkey = p_partkey)
    """,
)
def tpch_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue from orders of a brand's parts at quantities
    below half that part's average — the benchmark's correlated scalar
    AVG. Decorrelated the way every engine executes it: the per-part
    average is a groupBy over the SAME brand-filtered lineitem subset
    (partkey determines the group, so filtering first changes nothing),
    rejoined on partkey. The per-part AVG is exact on both engines —
    quantities are small integers, their sum and the single division
    are IEEE-identical. /7.0 (the 7-year date range of the classic
    benchmark) is kept for parity with the canonical result shape.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    pavg = li.groupBy(F.col("l_partkey").alias("avg_key")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(pavg, F.col("l_partkey") == F.col("avg_key"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(27,6)")).cast("double")
                / F.lit(7.0),
                9,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q18 — large-volume customers: orders whose total quantity tops 300
# ---------------------------------------------------------------------------
@register(
    "tpch_q18_large_volume_customers",
    doc="TPC-H Q18: top-100 orders with total quantity over 300, with their customers",
    oracle="""
        WITH big AS (
            SELECT l_orderkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING SUM(CAST(l_quantity AS DECIMAL(27,2))) > 300
        )
        SELECT c_custkey, c_name, o_orderkey,
               strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
               o_totalprice, sum_qty
        FROM big
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
    """,
)
def tpch_q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: who places the monster orders. The HAVING aggregate
    runs FIRST (one orderkey hash aggregate over lineitem — map-side
    partials make this cheap), shrinking the fact to the handful of
    big orders before any join; orders then customer attach to that
    tiny set (AQE broadcast at every scale — the big set is ~1e-3 of
    orders). Quantity sums accumulate in DECIMAL so the >300 cut is
    exact; top-100 is TakeOrdered.
    """
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("_q")
        )
        .filter(F.col("_q") > 300)
        .select("l_orderkey", F.col("_q").cast("double").alias("sum_qty"))
    )
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q22 — global sales opportunity. Adapted twice for the testdata
# schema/generator: no c_phone, so the country-code prefix filter
# becomes a nationkey set; every generated customer has SOME order, so
# "never ordered" becomes "no order since 2000-01-01" (same NOT EXISTS
# shape, now with a pushed date predicate on the inner side).
# ---------------------------------------------------------------------------
_Q22_NATIONS = (0, 3, 5, 8, 12, 13, 15, 17, 18, 19, 21, 24)


@register(
    "tpch_q22_global_sales_opportunity",
    doc="TPC-H Q22 (adapted): rich-but-dormant customers by nation — above-average balance, no order since 2000",
    oracle=f"""
        WITH pool AS (
            SELECT c_custkey, c_nationkey, c_acctbal
            FROM customer
            WHERE c_nationkey IN {_Q22_NATIONS}
        ),
        thr AS (
            SELECT CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                   / (100.0 * COUNT(*)) AS avg_bal
            FROM pool WHERE c_acctbal > 0.0
        )
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS numcust,
               CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
               / 100.0 AS totacctbal
        FROM pool, thr
        WHERE c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey
        ORDER BY c_nationkey
    """,
)
def tpch_q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: customers worth a sales call — above-average balance
    in the target nations, dormant since the cutoff. Exercises the two
    decorrelation shapes at once: the scalar AVG becomes a 1-row
    broadcast crossJoin, and NOT EXISTS becomes a left_anti join whose
    inner side is pre-shrunk by the pushed o_orderdate filter. The
    average-balance threshold is computed in integer cents (exact sum,
    one double division), so the > comparison is bitwise-identical on
    both engines.
    """
    cents = F.round(F.col("c_acctbal") * 100).cast("bigint")
    pool = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey").isin(*_Q22_NATIONS))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    thr = pool.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(cents).cast("double")
            / (F.lit(100.0) * F.count(F.lit(1)))
        ).alias("avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        pool.crossJoin(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, pool.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
