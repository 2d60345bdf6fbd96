"""Extended SQL-surface queries: the remaining ANSI constructs a user of
the reference's arbitrary-SQL endpoint (backend/main.py:109-134) could
send — correlated scalar subqueries, CUBE, UNPIVOT, LEAD, NTILE, and
sliding RANGE frames — each expressed Spark-first and oracle-checked.

Scale notes are per-query; the common theme is that every construct here
compiles to one shuffle (or none beyond the grouping shuffle) — no
per-row re-execution, no driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dynaledger_spark.functions.agg import dsum, osum as _osum
from dynaledger_spark.plans.queries_core import _t
from dynaledger_spark.plans.registry import register


@register(
    "scalar_subquery_small_qty",
    doc="correlated scalar AVG subquery (TPC-H Q17 shape) → decorrelated agg-join",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM lineitem l1 JOIN part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#13'
          AND l1.l_quantity < 0.2 * (SELECT AVG(l2.l_quantity)
                                     FROM lineitem l2
                                     WHERE l2.l_partkey = l1.l_partkey)
    """,
)
def scalar_subquery_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar aggregate through the SQL pass-through surface.
    Catalyst decorrelates the per-part AVG into a separate aggregate plus
    an equi-join — one extra shuffle on l_partkey instead of a re-executed
    subquery per row, which is the only plan that survives 100 TB.
    AVG(l_quantity) is exact (integral values, counts << 2^53), so the
    0.2×avg threshold is bitwise identical in both engines."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("_q_part")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,6))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM _q_lineitem l1 JOIN _q_part ON p_partkey = l1.l_partkey
        WHERE p_brand = 'Brand#13'
          AND l1.l_quantity < 0.2 * (SELECT AVG(l2.l_quantity)
                                     FROM _q_lineitem l2
                                     WHERE l2.l_partkey = l1.l_partkey)
        """
    )


@register(
    "cube_sales_priority",
    doc="CUBE(nation, priority): all 4 grouping sets in one shuffle + GROUPING ids",
    oracle=f"""
        SELECT n.n_name AS nation,
               o.o_orderpriority AS priority,
               CAST(GROUPING(n.n_name) AS INT) AS g_nation,
               CAST(GROUPING(o.o_orderpriority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               {_osum('o.o_totalprice', 'revenue')}
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY CUBE(nation, priority)
    """,
)
def cube_sales_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cube over two dimensions — Spark expands the 4 grouping sets
    map-side (one pass over the join output, one shuffle); GROUPING()
    flags distinguish a real NULL dimension value from a subtotal row."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
        )
        .cube("nation", "priority")
        .agg(
            F.grouping("nation").cast("int").alias("g_nation"),
            F.grouping("priority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(F.col("o_totalprice"), "revenue"),
        )
        .select(
            "nation", "priority", "g_nation", "g_priority", "n_orders", "revenue"
        )
    )


@register(
    "unpivot_lineitem_measures",
    doc="UNPIVOT: wide measure columns → (measure, value) rows, scan-only",
    oracle="""
        SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
               l_quantity AS mvalue FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
        FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
        UNION ALL
        SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem
    """,
)
def unpivot_lineitem_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping (the inverse of event_type_pivot). Spark's
    native unpivot is an Expand node — a single scan emitting 4 rows per
    input row, no shuffle and no self-union re-scan; at 100 TB that is 1
    read instead of the oracle's 4."""
    return _t(spark, sf_dir, "lineitem").unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="mvalue",
    )


@register(
    "lead_next_order_gap",
    doc="LEAD window: seconds from each order to the customer's next order",
    oracle="""
        SELECT o_orderkey, o_custkey,
               CAST(datediff('second', o_orderdate,
                    lead(o_orderdate) OVER (PARTITION BY o_custkey
                        ORDER BY o_orderdate, o_orderkey)) AS BIGINT) AS gap_s
        FROM orders
    """,
)
def lead_next_order_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-looking window (lag's twin — lag is covered by
    sessionization): one shuffle on o_custkey, sort within partition,
    o_orderkey tiebreaker for determinism. NULL gap marks each customer's
    latest order."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("nxt", F.lead("o_orderdate").over(w))
        .select(
            "o_orderkey",
            "o_custkey",
            F.expr("timestampdiff(SECOND, o_orderdate, nxt)").alias("gap_s"),
        )
    )


@register(
    "ntile_acctbal_quartiles",
    doc="NTILE(4) global ranking of customers by account balance",
    oracle="""
        SELECT c_custkey, c_acctbal,
               CAST(ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS INT)
                 AS quartile
        FROM customer
    """,
)
def ntile_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth bucketing via a global NTILE. A single-partition window
    is inherently serial — at 100 TB the same feature ships as
    approxQuantile cutpoints + a broadcast range join (see
    value_quantiles_sketch); this query keeps the exact ANSI semantics on
    the dimension-sized customer table where one sort is fine."""
    customer = _t(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return customer.select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "rolling_30d_revenue",
    doc="sliding RANGE frame: 30-day rolling revenue over the daily series",
    oracle="""
        WITH daily AS (
            SELECT CAST(datediff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS INT) AS day_n,
                   SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS rev_dec
            FROM orders GROUP BY day_n
        )
        SELECT day_n,
               CAST(CAST(SUM(rev_dec) OVER (ORDER BY day_n
                    RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
                    AS DECIMAL(38,6)) AS DOUBLE) AS rolling_rev
        FROM daily
    """,
)
def rolling_30d_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True RANGE frame (value-based, not row-count): each day sums the
    preceding 29 calendar days even when days are missing from the data.
    Aggregating to the daily grain first shrinks the window input from
    row-scale to date-scale (~10^3 rows at any SF), so the single-
    partition window is trivially cheap; the decimal accumulator keeps
    the sliding sum order-independent and bitwise-stable."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            .cast("int")
            .alias("day_n"),
            F.col("o_totalprice").cast("decimal(27,6)").alias("price_dec"),
        )
        .groupBy("day_n")
        .agg(F.sum("price_dec").alias("rev_dec"))
    )
    w = W.orderBy("day_n").rangeBetween(-29, 0)
    return daily.select(
        "day_n",
        F.sum("rev_dec").over(w).cast("decimal(38,6)").cast("double").alias(
            "rolling_rev"
        ),
    )
