"""Classic TPC-H analytics adapted to the testdata schema.

DynaLedger's user-facing surface is ad-hoc analytical SQL over a
star-schema warehouse (reference: backend/main.py:109-221 forwards
arbitrary SELECTs; streamlit_app.py renders the result grid). The
TPC-H query suite is the canonical claim check for that capability —
Q1 landed in round 5 (queries_stats.tpch_q1_pricing_summary); round 6
added the join-heavy classics Q3 (shipping priority), Q5 (local-
supplier volume), Q6 (forecast revenue change), Q10 (returned items),
Q14 (promotion effect); round 7 completes the full 22-query suite:
Q7 (volume shipping), Q8 (market share), Q13 (order-count
distribution), Q15 (top supplier), Q17 (correlated small-quantity
AVG), Q18 (large-volume customers), Q22 (NOT EXISTS + scalar AVG)
run near-verbatim, and the nine queries whose canonical text needs
columns the testdata lacks (l_shipmode/l_commitdate/l_receiptdate,
partsupp, and the comment/phone/container columns) are ADAPTED so
each preserves its defining PLAN SHAPE on the available schema —
Q2's correlated argmin-per-part, Q4's EXISTS semi-join group-count,
Q9's 5-way profit rollup, Q11's group-vs-global-scalar HAVING, Q12's
CASE-pivot over a joined year slice, Q16's filtered COUNT(DISTINCT)
with a NOT IN exclusion, Q19's disjunction-of-conjunctions pushdown,
Q20's nested-aggregate semi-join, Q21's double self-join semi+anti —
with the substitution documented per query. Parameters are shifted
into the generated 1995-2001 date range and value domains.

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
    AVG. Decorrelated as a PARTITIONED window over the brand-filtered
    join (partkey determines the correlation group, so filtering first
    changes nothing): avg(l_quantity) OVER (PARTITION BY l_partkey)
    rides the one partkey shuffle and the filter applies in the same
    pass — the groupBy-then-rejoin shape would scan lineitem twice.
    The per-part AVG is exact on both engines — quantities are small
    integers, their sum and the single division are IEEE-identical.
    /7.0 (the 7-year date range of the classic benchmark) is kept for
    parity with the canonical result shape.
    """
    from pyspark.sql import Window as W

    part = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    li = (
        _t(spark, sf_dir, "lineitem")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
    )
    return (
        li.withColumn(
            "avg_qty", F.avg("l_quantity").over(W.partitionBy("l_partkey"))
        )
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


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (adapted). The testdata has no partsupp/
# ps_supplycost, so the "offered cost" becomes the minimum observed
# unit price (l_extendedprice / l_quantity) each supplier has ever
# shipped the part at — preserving Q2's defining shape: a correlated
# argmin-per-part subquery resolved against a region-restricted
# supplier pool, returning ALL tied suppliers.
# ---------------------------------------------------------------------------
@register(
    "tpch_q2_min_cost_supplier",
    doc="TPC-H Q2 (adapted): cheapest EUROPE supplier per mid-size STANDARD part, ties kept",
    oracle="""
        WITH offers AS (
            SELECT l_partkey, l_suppkey,
                   MIN(l_extendedprice / l_quantity) AS unit_price
            FROM lineitem GROUP BY l_partkey, l_suppkey
        ),
        eur AS (
            SELECT s_suppkey, s_name, s_acctbal, n_name
            FROM supplier
            JOIN nation ON n_nationkey = s_nationkey
            JOIN region ON r_regionkey = n_regionkey
            WHERE r_name = 'EUROPE'
        ),
        eo AS (
            SELECT l_partkey, unit_price, s_name, s_acctbal, n_name
            FROM offers JOIN eur ON l_suppkey = s_suppkey
        ),
        best AS (
            SELECT l_partkey AS best_key, MIN(unit_price) AS best_price
            FROM eo GROUP BY l_partkey
        )
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
               unit_price
        FROM part
        JOIN eo   ON l_partkey = p_partkey
        JOIN best ON best_key = p_partkey AND unit_price = best_price
        WHERE p_type = 'STANDARD' AND p_size BETWEEN 10 AND 20
        ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
        LIMIT 100
    """,
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2's correlated MIN decorrelated the standard way: one
    (partkey, suppkey) aggregate builds the offer book, the regional
    minimum is a second partkey aggregate over the SAME rows, and the
    tie-preserving equality rejoin replaces the scalar subquery. The
    unit price is a single IEEE double division per row and MIN only
    selects among computed values, so the equality rejoin matches
    bitwise on both engines. nation⨝region is an explicit broadcast;
    the offer book shuffles lineitem once on (partkey, suppkey) — at
    100 TB that is the same one shuffle, and the best-price side is a
    partkey-partial re-aggregate of the already-shrunk offer book.
    reference: backend/main.py:109-134 (ad-hoc SQL surface).
    """
    li = _t(spark, sf_dir, "lineitem")
    offers = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
                "unit_price"
            )
        )
    )
    nr = (
        _t(spark, sf_dir, "nation")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    eur = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    from pyspark.sql import Window as W

    eo = offers.join(eur, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "l_partkey", "unit_price", "s_name", "s_acctbal", "n_name"
    )
    # regional min per part as a PARTITIONED window over the same offer
    # book — one partkey shuffle serves both the min and the
    # tie-preserving filter; the naive groupBy-then-rejoin shape scans
    # lineitem twice (no exchange reuse across the aggregate boundary)
    best = eo.withColumn(
        "best_price", F.min("unit_price").over(W.partitionBy("l_partkey"))
    ).filter(F.col("unit_price") == F.col("best_price"))
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "STANDARD") & F.col("p_size").between(10, 20)
    )
    return (
        part.join(best, F.col("l_partkey") == F.col("p_partkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_price")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Q4 — order priority checking (adapted). The canonical EXISTS
# predicate (l_commitdate < l_receiptdate: a late line) has no columns
# here; l_returnflag = 'R' (a returned line) stands in as the
# "problem order" marker. The shape — a quarter-sliced order count per
# priority gated by an EXISTS semi-join into lineitem — is unchanged.
# ---------------------------------------------------------------------------
@register(
    "tpch_q4_order_priority",
    doc="TPC-H Q4 (adapted): 1997Q3 order counts per priority, orders having a returned line",
    oracle="""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-07-01'
          AND o_orderdate <  TIMESTAMP '1997-10-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: how many orders per priority band had a problem line.
    EXISTS compiles to a left_semi join — Spark never materializes the
    duplicate-producing inner join, and the returnflag filter pushes
    into the lineitem scan so the semi-join's build side is only the
    returned lines. The quarter filter prunes orders before the
    shuffle. At 100 TB both sides arrive shuffled on orderkey once;
    the aggregate output is 5 rows.
    """
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    returned = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey")
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Q9 — product type profit (adapted). Without ps_supplycost the profit
# measure loses its cost term and becomes discounted revenue; the
# defining 5-way join (lineitem ⨝ part[p_name LIKE] ⨝ supplier ⨝
# nation ⨝ orders) and the nation × order-year rollup are unchanged.
# ---------------------------------------------------------------------------
@register(
    "tpch_q9_product_type_profit",
    doc="TPC-H Q9 (adapted): discounted revenue on red parts by supplier nation and order year",
    oracle=f"""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS INT) AS o_year,
               {osum(_REV_SQL, 'sum_profit')}
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON n_nationkey = s_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        WHERE p_name LIKE '%red%'
        GROUP BY n_name, year(o_orderdate)
        ORDER BY nation, o_year DESC
    """,
)
def tpch_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: profit contribution of one product family, rolled up
    by the supplying nation and the order year. The p_name LIKE filter
    prunes part FIRST (the join then keeps ~1/6 of lineitem);
    supplier/part join declaratively (AQE broadcasts at test SF,
    sort-merge at warehouse scale), nation is an explicit broadcast,
    and the one unavoidable big-big shuffle is lineitem⨝orders on
    orderkey. 25 nations × 7 years of output rows.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    orders = _t(spark, sf_dir, "orders")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(_rev(), "sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


# ---------------------------------------------------------------------------
# Q11 — important stock identification (adapted). partsupp value
# (ps_supplycost × ps_availqty) becomes per-part discounted revenue,
# keeping the defining shape: a grouped aggregate HAVING-filtered
# against a scalar fraction of the SAME aggregate computed globally.
# ---------------------------------------------------------------------------
@register(
    "tpch_q11_important_stock",
    doc="TPC-H Q11 (adapted): parts whose revenue exceeds 0.08% of global revenue",
    oracle=f"""
        WITH pr AS (
            SELECT l_partkey, {osum(_REV_SQL, 'part_value')}
            FROM lineitem GROUP BY l_partkey
        ),
        tot AS (
            SELECT {osum(_REV_SQL, 'total_value')} FROM lineitem
        )
        SELECT l_partkey, part_value
        FROM pr, tot
        WHERE part_value > 0.0008 * total_value
        ORDER BY part_value DESC, l_partkey
    """,
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: the parts that matter — per-part value above a fixed
    fraction of total value. Both aggregates accumulate in DECIMAL so
    the per-part values and the global total are exact (the global sum
    equals the sum of the per-part sums by associativity); the single
    fraction multiply happens once in double on each engine. The
    threshold is a 1-row broadcast crossJoin, never a driver collect.
    One partkey shuffle over lineitem; the global total re-aggregates
    the per-partition partials — at 100 TB both are map-side-combined
    hash aggregates.
    """
    li = _t(spark, sf_dir, "lineitem")
    # ONE lineitem pass at runtime: the global total re-aggregates the
    # per-part DECIMAL partials (associative, so it equals the direct
    # corpus sum bitwise), and because both branches share the same
    # partial-aggregate exchange AQE executes the scan once and feeds
    # the second branch through a ReusedExchange (verified: 1 reuse
    # node in the executed plan)
    pr_dec = li.groupBy("l_partkey").agg(
        F.sum(_rev().cast("decimal(27,6)")).alias("_v")
    )
    pr = pr_dec.select(
        "l_partkey", F.col("_v").cast("double").alias("part_value")
    )
    tot = pr_dec.agg(
        F.sum("_v").cast("double").alias("total_value")
    )
    return (
        pr.crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") > 0.0008 * F.col("total_value"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# ---------------------------------------------------------------------------
# Q12 — shipping mode / priority pivot (adapted). No l_shipmode or
# commit/receipt dates: the pivot dimension becomes l_linestatus and
# the year slice cuts on l_shipdate. The defining CASE-sum pivot of
# high- vs low-priority orders across a joined fact slice is intact.
# ---------------------------------------------------------------------------
@register(
    "tpch_q12_priority_pivot",
    doc="TPC-H Q12 (adapted): high/low-priority line counts by linestatus for 1997 shipments",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
        ORDER BY l_linestatus
    """,
)
def tpch_q12_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: did the slow shipping channel carry the urgent
    orders? The year filter pushes into the lineitem scan (pruning
    ~6/7 of the fact before the orderkey shuffle), the CASE pivot is
    a pair of conditional counts folded into ONE hash aggregate (one
    pass, map-side partials), and the output is 2 rows.
    """
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


# ---------------------------------------------------------------------------
# Q16 — supplier-part relationship count (adapted). Without partsupp,
# the supply relationship is the one OBSERVED in lineitem (supplier s
# has shipped part p); without s_comment, the "customer complaints"
# exclusion becomes the negative-balance suppliers. The defining shape
# — COUNT(DISTINCT supplier) per (brand, type, size) over a filtered
# relationship set minus a NOT IN supplier exclusion — is unchanged.
# ---------------------------------------------------------------------------
@register(
    "tpch_q16_parts_supplier_count",
    doc="TPC-H Q16 (adapted): distinct good-standing suppliers per brand/type/size, selected sizes",
    oracle="""
        SELECT p_brand, p_type, p_size,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part
        JOIN lineitem ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#3'
          AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
          AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                WHERE s_acctbal < 0)
        GROUP BY p_brand, p_type, p_size
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)
def tpch_q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many distinct suppliers can deliver each part
    class, excluding the blacklist. NOT IN over a provably non-null
    key column compiles to a left_anti join (the blacklist is tiny —
    an explicit broadcast); the brand/size filters push into the part
    scan before the join. COUNT(DISTINCT) runs as Spark's two-phase
    distinct aggregate — partial distinct per partition on
    (brand,type,size,suppkey), then the final count — no row ever
    leaves the executors un-aggregated.
    """
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#3")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).cast("bigint").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# Q19 — discounted revenue under a disjunction of conjunctions
# (adapted). p_container and l_shipmode/l_shipinstruct don't exist;
# the three OR'd branches pair (brand, size range, quantity range)
# instead. The defining challenge — a filter that mixes columns from
# BOTH join sides inside each disjunct, where the optimizer must still
# extract the common per-table predicates and push them below the
# join — is preserved.
# ---------------------------------------------------------------------------
@register(
    "tpch_q19_disjunctive_revenue",
    doc="TPC-H Q19 (adapted): revenue from three OR'd brand/size/quantity windows",
    oracle=f"""
        SELECT {osum(_REV_SQL, 'revenue')},
               CAST(COUNT(*) AS BIGINT) AS n_items
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: the disjunctive-pushdown stress test. Each OR branch
    constrains part (brand, size) AND lineitem (quantity); Catalyst's
    constraint propagation extracts the per-table residuals — p_brand
    IN (...) AND p_size <= 15 onto the part scan, l_quantity BETWEEN
    1 AND 30 onto the lineitem scan — so both sides shrink before the
    partkey join, and the full mixed predicate re-applies after it.
    Single scalar output row, DECIMAL-exact.
    """
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    b = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(b)
        .agg(
            dsum(_rev(), "revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (adapted). ps_availqty doesn't exist,
# so "shipped more than half of availability in the year" becomes
# "the year's shipments exceed half of the supplier's ALL-TIME volume
# for that part" — same nested-aggregate semi-join: an inner
# (supplier, part) aggregate gates an outer supplier list restricted
# to a nation set.
# ---------------------------------------------------------------------------
_Q20_NATIONS = ("NATION_3", "NATION_7", "NATION_11")


@register(
    "tpch_q20_promotion_suppliers",
    doc="TPC-H Q20 (adapted): suppliers who shipped most of their red-part volume in 1997",
    oracle=f"""
        WITH per AS (
            SELECT l_suppkey,
                   SUM(CAST(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                                  AND l_shipdate <  TIMESTAMP '1998-01-01'
                                 THEN l_quantity ELSE 0 END
                            AS DECIMAL(27,2))) AS q97,
                   SUM(CAST(l_quantity AS DECIMAL(27,2))) AS qtot
            FROM lineitem
            JOIN part ON p_partkey = l_partkey
            WHERE p_name LIKE 'red%'
            GROUP BY l_suppkey, l_partkey
        )
        SELECT s_name, s_acctbal
        FROM supplier
        JOIN nation ON n_nationkey = s_nationkey
        WHERE n_name IN {_Q20_NATIONS}
          AND EXISTS (SELECT 1 FROM per
                      WHERE l_suppkey = s_suppkey
                        AND 2 * q97 > qtot AND q97 > 0)
        ORDER BY s_name
    """,
)
def tpch_q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: which in-nation suppliers concentrated their red-part
    shipments into 1997. The inner aggregate groups the part-filtered
    lineitem by (suppkey, partkey) with both quantity sums in ONE pass
    (conditional + unconditional DECIMAL accumulators — exact, so the
    2·q97 > qtot cut cannot waver); the qualifying suppkeys then gate
    the nation-filtered supplier list through a left_semi join. At
    100 TB: one (suppkey, partkey) shuffle over the ~1/6-pruned fact,
    and the semi-join's left side is the 100-row-per-million supplier
    dim.
    """
    part = _t(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    li = _t(spark, sf_dir, "lineitem")
    in_97 = (
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    per = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(in_97, F.col("l_quantity")).otherwise(0).cast("decimal(27,2)")
            ).alias("q97"),
            F.sum(F.col("l_quantity").cast("decimal(27,2)")).alias("qtot"),
        )
        .filter((F.lit(2) * F.col("q97") > F.col("qtot")) & (F.col("q97") > 0))
        .select("l_suppkey")
    )
    nat = _t(spark, sf_dir, "nation").filter(F.col("n_name").isin(*_Q20_NATIONS))
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey")
    )
    return (
        supp.join(per, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (adapted). Without receipt/
# commit dates, "the line that arrived late" becomes "the line that
# came back returned" (l_returnflag = 'R'); o_orderstatus = 'F' is on
# schema and stays. The defining shape — a semi-join (some OTHER
# supplier contributed to the order) stacked with an anti-join (no
# OTHER supplier's line was a problem) over two more self-references
# of the fact — is unchanged.
# ---------------------------------------------------------------------------
@register(
    "tpch_q21_waiting_suppliers",
    doc="TPC-H Q21 (adapted): top-100 suppliers solely responsible for returns on multi-supplier finished orders",
    oracle="""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM supplier
        JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_returnflag = 'R'
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100
    """,
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: the supplier who single-handedly spoiled shared
    orders. Three self-references of lineitem resolve as one orderkey-
    keyed join tree: l1 (the returned lines on finished orders) takes
    a left_semi against "any other supplier's line" and a left_anti
    against "any other supplier's returned line" — both are equi-joins
    on orderkey with the <> residual evaluated on the matched pairs,
    so all three legs ride the SAME orderkey shuffle partitioning
    (Spark reuses the exchange); nothing ever materializes the
    quadratic pair set. The count per supplier is a final tiny
    aggregate; top-100 is TakeOrdered.
    """
    li = _t(spark, sf_dir, "lineitem")
    orders_f = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .drop("o_orderkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    sole = (
        l1.join(
            l2,
            (F.col("ok2") == F.col("l_orderkey"))
            & (F.col("sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("ok3") == F.col("l_orderkey"))
            & (F.col("sk3") != F.col("l_suppkey")),
            "left_anti",
        )
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
