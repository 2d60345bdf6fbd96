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


@register(
    "first_last_order_span",
    doc="FIRST_VALUE/LAST_VALUE windows: customer lifetime span on every order",
    oracle="""
        SELECT o_orderkey, o_custkey,
               first_value(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS first_ts,
               last_value(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS last_ts,
               CAST(datediff('day', CAST(first_value(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS DATE), CAST(last_value(o_orderdate) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS DATE)) AS INT) AS span_days
        FROM orders
    """,
)
def first_last_order_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE with the default growing frame and LAST_VALUE with an
    explicit unbounded frame (the classic last_value footgun, done
    right), plus a derived day span. One shuffle on o_custkey; both
    windows share the same partitioning + sort so Catalyst evaluates
    them in a single Window node over one sorted pass. Unique
    o_orderkey tiebreaker keeps every value deterministic."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    first_ts = F.first("o_orderdate").over(w)
    last_ts = F.last("o_orderdate").over(wfull)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        first_ts.alias("first_ts"),
        last_ts.alias("last_ts"),
        F.datediff(last_ts.cast("date"), first_ts.cast("date"))
        .cast("int")
        .alias("span_days"),
    )


@register(
    "median_disc_by_priority",
    doc="exact distributed discrete median (quantile_disc 0.5) per group, no collect",
    oracle="""
        SELECT o_orderpriority AS priority,
               quantile_disc(o_totalprice, 0.5) AS median_price,
               COUNT(*) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
)
def median_disc_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group discrete median without gathering values: rank
    rows within each group and keep the one at 1-based rank
    (n-1) div 2 + 1 = ceil(n/2) — DuckDB's quantile_disc inverted-CDF
    rule at q=0.5 (see quantiles_disc_by_priority for general q) —
    using pure integer arithmetic (no float index math to drift). One
    shuffle on the group key; row_number and the group count share a
    single sort. At 100 TB this beats any collect_list-based median by
    never materializing a group in one task, and stays exact where
    percentile_approx would not be."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wp = W.partitionBy("o_orderpriority")
    return (
        orders.select("o_orderpriority", "o_totalprice", "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .filter(F.expr("rn = (n - 1) div 2 + 1"))
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_totalprice").alias("median_price"),
            F.col("n").alias("n_orders"),
        )
    )


@register(
    "stddev_exact_by_flag",
    doc="order-independent exact AVG/STDDEV via decimal (n, Σx, Σx²) sums",
    oracle="""
        WITH g AS (
            SELECT l_returnflag,
                   COUNT(*) AS n_items,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(27,6)))
                        AS DOUBLE) AS s2
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, n_items,
               s1 / n_items AS avg_qty,
               sqrt((s2 - (s1 * s1) / n_items) / (n_items - 1)) AS stddev_qty
        FROM g
    """,
)
def stddev_exact_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment aggregates the deterministic way: built-in stddev_samp
    combines partial (mean, M2) states in partition order, so two runs
    can differ in the last ulp and an oracle can't match it bitwise.
    Instead accumulate n, Σx, Σx² exactly in DECIMAL (associative, so
    map-side partial aggregation is still free) and finish with one
    fixed IEEE expression — identical in Spark and DuckDB. l_quantity
    is integral and ≤ 2500 per x², so the decimal sums are exact."""
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity")
    g = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(qty.cast("decimal(27,6)")).cast("double").alias("s1"),
        F.sum((qty * qty).cast("decimal(27,6)")).cast("double").alias("s2"),
    )
    return g.select(
        "l_returnflag",
        "n_items",
        F.expr("s1 / n_items").alias("avg_qty"),
        F.expr("sqrt((s2 - (s1 * s1) / n_items) / (n_items - 1))").alias(
            "stddev_qty"
        ),
    )


@register(
    "regex_extract_id_buckets",
    doc="regexp_extract capture group → typed key, grouped rollup",
    oracle="""
        SELECT CAST(regexp_extract(c_name, 'Customer#(\\d+)', 1) AS BIGINT) % 100
                 AS id_bucket,
               COUNT(*) AS n_customers,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(27,6))) AS DOUBLE)
                 AS sum_acctbal
        FROM customer GROUP BY id_bucket
    """,
)
def regex_extract_id_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex capture-group extraction as a typed join/group key (the
    reference leans on regex only as validation predicates — P19; this
    is the extraction side a pass-through SQL user gets). Stays inside
    whole-stage codegen: regexp_extract + cast + pmod are all JVM
    expressions, then one hash-aggregate shuffle on the derived key."""
    customer = _t(spark, sf_dir, "customer")
    cid = F.regexp_extract(F.col("c_name"), r"Customer#(\d+)", 1).cast("bigint")
    return (
        customer.select((cid % 100).alias("id_bucket"), "c_acctbal")
        .groupBy("id_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum(F.col("c_acctbal"), "sum_acctbal"),
        )
    )


@register(
    "string_functions_matrix",
    doc="scalar string-function surface: case, pad, split, translate, concat_ws",
    oracle="""
        SELECT c_custkey,
               upper(c_mktsegment) AS seg_upper,
               lower(c_name) AS name_lower,
               lpad(CAST(c_custkey % 1000 AS VARCHAR), 6, '0') AS padded_id,
               concat_ws('-', c_mktsegment, CAST(c_nationkey AS VARCHAR))
                 AS seg_nation,
               translate(c_name, '#', '-') AS name_dashed,
               reverse(c_name) AS name_rev,
               substring(c_name, 1, 8) AS name_prefix,
               CAST(length(c_name) AS INT) AS name_len,
               split_part(c_name, '#', 2) AS id_str
        FROM customer
    """,
)
def string_functions_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar string surface a pass-through SQL user leans on (the
    reference templates and validates strings server-side — P16-P19).
    Pure row-level JVM expressions: the whole projection runs inside one
    whole-stage-codegen span over the scan, zero shuffles at any scale."""
    c = _t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_name").alias("name_lower"),
        F.lpad((F.col("c_custkey") % 1000).cast("string"), 6, "0").alias(
            "padded_id"
        ),
        F.concat_ws(
            "-", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("seg_nation"),
        F.translate(F.col("c_name"), "#", "-").alias("name_dashed"),
        F.reverse(F.col("c_name")).alias("name_rev"),
        F.substring(F.col("c_name"), 1, 8).alias("name_prefix"),
        F.length("c_name").cast("int").alias("name_len"),
        F.element_at(F.split(F.col("c_name"), "#"), 2).alias("id_str"),
    )


@register(
    "date_functions_matrix",
    doc="calendar-function surface: parts, ISO week, aligned dow, last_day, add_months",
    oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS INT) AS yr,
               CAST(quarter(o_orderdate) AS INT) AS qtr,
               CAST(month(o_orderdate) AS INT) AS mon,
               CAST(day(o_orderdate) AS INT) AS dom,
               CAST(dayofweek(o_orderdate) AS INT) AS dow_sun0,
               CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR)
                 AS month_end,
               CAST(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                    AS VARCHAR) AS plus_3mo,
               CAST(CAST(date_trunc('quarter', o_orderdate) AS DATE)
                    AS VARCHAR) AS quarter_start
        FROM orders
    """,
)
def date_functions_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar extraction with the cross-engine traps normalized
    explicitly: day-of-week is published on the DuckDB convention
    (0=Sunday; Spark's dayofweek is 1-based), month arithmetic uses
    add_months (end-of-month clamped, same as interval addition), and
    derived DATE values ship as ISO-8601 strings (engines disagree on
    date_trunc's return type and drivers on DATE's in-memory form).
    All row-level codegen expressions — no shuffle."""
    o = _t(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.month("o_orderdate").cast("int").alias("mon"),
        F.dayofmonth("o_orderdate").cast("int").alias("dom"),
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow_sun0"),
        F.weekofyear("o_orderdate").cast("int").alias("iso_week"),
        F.last_day(d).cast("string").alias("month_end"),
        F.add_months(d, 3).cast("string").alias("plus_3mo"),
        F.date_trunc("quarter", F.col("o_orderdate"))
        .cast("date")
        .cast("string")
        .alias("quarter_start"),
    )


@register(
    "rank_family_segments",
    doc="RANK / PERCENT_RANK / CUME_DIST over per-segment balance ordering",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               CAST(rank() OVER w AS BIGINT) AS bal_rank,
               percent_rank() OVER w AS bal_pct_rank,
               cume_dist() OVER w AS bal_cume_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def rank_family_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ranking family beyond dense_rank (W1) and ntile:
    rank with gaps, percent_rank = (rank-1)/(n-1), cume_dist = rows≤cur/n.
    Both ratios are single int divisions of identical operands, so the
    doubles agree bitwise across engines. One shuffle on the segment
    key; all three functions share one Window node and one sort."""
    c = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.rank().over(w).cast("bigint").alias("bal_rank"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


@register(
    "grouping_sets_mixed",
    doc="explicit GROUPING SETS: two disjoint single-dim subtotals + grand total",
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
        GROUP BY GROUPING SETS ((n.n_name), (o.o_orderpriority), ())
    """,
)
def grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS (the general form under ROLLUP/CUBE):
    per-nation and per-priority subtotals plus the grand total, WITHOUT
    the cross product — one Expand pass, one shuffle, 3 result strata.
    GROUPING() flags disambiguate subtotal NULLs from data NULLs."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    joined = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.col("o_orderpriority").alias("priority"),
            "o_totalprice",
        )
    )
    joined.createOrReplaceTempView("_q_gs_joined")
    return spark.sql(
        """
        SELECT nation, priority,
               CAST(GROUPING(nation) AS INT) AS g_nation,
               CAST(GROUPING(priority) AS INT) AS g_priority,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE)
                 AS revenue
        FROM _q_gs_joined
        GROUP BY GROUPING SETS ((nation), (priority), ())
        """
    )


@register(
    "higher_order_array_ops",
    doc="higher-order array functions: transform/aggregate/filter/exists/sort",
    oracle="""
        WITH g AS (
            SELECT l_orderkey, list(CAST(l_quantity AS BIGINT)) AS q
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT l_orderkey,
               CAST(list_aggregate(list_transform(q, x -> x * x), 'sum')
                    AS BIGINT) AS qty_sumsq,
               CAST(len(list_filter(q, x -> x >= 30)) AS INT) AS n_big,
               len(list_filter(q, x -> x = 1)) > 0 AS has_single_unit,
               array_to_string(list_sort(q), ',') AS qty_sorted_csv
        FROM g
    """,
)
def higher_order_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda-based array processing entirely in JVM expressions —
    transform, aggregate (fold), filter, exists, sort_array — over a
    per-order quantity list. Quantities ride as BIGINT so the fold is
    exact under any collect_list order, and every output is a scalar
    (array columns cross driver boundaries with engine-specific
    renderings; scalars don't). One grouping shuffle, then pure map."""
    li = _t(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.collect_list(F.col("l_quantity").cast("bigint")).alias("q")
    )
    return g.select(
        "l_orderkey",
        F.aggregate(
            F.transform("q", lambda x: x * x),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("qty_sumsq"),
        F.size(F.filter("q", lambda x: x >= 30)).cast("int").alias("n_big"),
        F.exists("q", lambda x: x == 1).alias("has_single_unit"),
        F.array_join(
            F.transform(F.sort_array("q"), lambda x: x.cast("string")), ","
        ).alias("qty_sorted_csv"),
    )


@register(
    "top3_orders_per_segment",
    doc="per-group top-k: 3 largest orders in each market segment",
    oracle="""
        SELECT * FROM (
            SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY c.c_mktsegment
                       ORDER BY o.o_totalprice DESC, o.o_orderkey
                   ) AS INT) AS rn
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        ) WHERE rn <= 3
    """,
)
def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (the grouped twin of topk_customers' global
    TakeOrdered): row_number within segment + rank filter. Catalyst's
    WindowGroupLimit rule pushes the k=3 bound INTO the sort, so each
    partition keeps a 3-row heap per group on the map side instead of
    fully sorting every group before filtering — the difference between
    O(n log k) and O(n log n) per group at corpus scale (asserted in
    tests/test_plans.py)."""
    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
    )


@register(
    "not_in_suppliers_null_aware",
    doc="NOT IN subquery: null-aware anti-join (ANSI three-valued semantics)",
    oracle="""
        SELECT s_suppkey, s_name
        FROM supplier
        WHERE s_suppkey NOT IN (
            SELECT l_suppkey FROM lineitem
            WHERE l_quantity >= 49 AND l_discount >= 0.10
        )
    """,
)
def not_in_suppliers_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN against a subquery — semantically NOT the complement of
    EXISTS: under ANSI three-valued logic a single NULL in the subquery
    empties the whole result, so Catalyst plans a null-aware anti-join
    (distinct from exists_bulk_orders' left-semi). l_suppkey is non-null
    here so rows do come back, and the oracle pins that both engines
    apply the same semantics; suppliers who ever shipped a deep-discount
    bulk line (qty ≥ 49 AND discount ≥ 0.10) are excluded — the plain
    qty ≥ 49 predicate matched EVERY supplier at every verify SF, so the
    result was 0-row and the green vacuous (VERDICT r9 item 1; the
    tightened predicate leaves 4/29/296 suppliers at sf0.001/0.01/0.1).
    """
    _t(spark, sf_dir, "supplier").createOrReplaceTempView("_q_supplier")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("_q_lineitem")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM _q_supplier
        WHERE s_suppkey NOT IN (
            SELECT l_suppkey FROM _q_lineitem
            WHERE l_quantity >= 49 AND l_discount >= 0.10
        )
        """
    )


@register(
    "like_pattern_filter",
    doc="LIKE / NOT LIKE pattern predicates with _ and % wildcards",
    oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_name LIKE 'Customer#00000__1%'
          AND c_mktsegment NOT LIKE '%MACH%'
    """,
)
def like_pattern_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL LIKE wildcards (`_` single char, `%` any run) — the pattern
    surface between equality and full regex (P19). Compiles to a
    codegen'd string match pushed against the scan output; both engines
    share ANSI LIKE semantics exactly."""
    c = _t(spark, sf_dir, "customer")
    return c.filter(
        F.col("c_name").like("Customer#00000__1%")
        & ~F.col("c_mktsegment").like("%MACH%")
    ).select("c_custkey", "c_name", "c_mktsegment")


@register(
    "union_distinct_actors",
    doc="UNION (distinct): buyers ∪ event actors with duplicate elimination",
    oracle="""
        SELECT o_custkey AS actor_id FROM orders
        UNION
        SELECT user_id FROM events
    """,
)
def union_distinct_actors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-semantics UNION (vs union_by_name's UNION ALL): one
    deduplicating hash aggregate over the concatenated inputs —
    completes the set-operation family with INTERSECT
    (converting_users_intersect) and EXCEPT (inactive_customers_except)."""
    orders = _t(spark, sf_dir, "orders")
    events = _t(spark, sf_dir, "events")
    return (
        orders.select(F.col("o_custkey").alias("actor_id"))
        .union(events.select("user_id"))
        .distinct()
    )


_RCTE_MONTHS = """
WITH RECURSIVE months(m) AS (
    SELECT {lo}
    UNION ALL
    SELECT m + 1 FROM months WHERE m < {hi}
),
monthly AS (
    SELECT year(o_orderdate) * 12 + month(o_orderdate) AS m,
           COUNT(*) AS n_orders,
           SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS rev_dec
    FROM {orders} GROUP BY 1
)
SELECT months.m AS month_n,
       CAST(COALESCE(monthly.n_orders, 0) AS BIGINT) AS n_orders,
       CAST(COALESCE(monthly.rev_dec, CAST(0 AS DECIMAL(27,6))) AS DOUBLE)
         AS revenue
FROM months LEFT JOIN monthly ON months.m = monthly.m
"""

_RCTE_BOUNDS = (
    "(SELECT {agg}(year(o_orderdate) * 12 + month(o_orderdate)) FROM {orders})"
)


@register(
    "recursive_month_series",
    doc="WITH RECURSIVE month generator joined to monthly revenue (one SQL text, both engines)",
    oracle=_RCTE_MONTHS.format(
        orders="orders",
        lo=_RCTE_BOUNDS.format(agg="min", orders="orders"),
        hi=_RCTE_BOUNDS.format(agg="max", orders="orders"),
    ),
)
def recursive_month_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE through the SQL pass-through surface (Spark 4's
    WITH RECURSIVE): generate the dense month series between the data's
    bounds by recursion, then left-join monthly aggregates. Recursion
    is sequential by nature, and Spark re-evaluates any scalar subquery
    in the recursive member ON EVERY ITERATION — with inline bounds
    that meant ~2 fact-table scans per generated month (measured 27 s
    at sf0.1). The bounds are therefore computed once up front and
    inlined as literals, leaving each recursion step pure 1-row
    arithmetic; the DuckDB oracle keeps the inline-subquery spelling
    (it evaluates them once) and agrees exactly. The iterative twin at
    corpus scale is calendar_fill_daily_revenue's sequence+explode —
    recursion is the portable ANSI spelling, not the 100 TB plan."""
    orders = _t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_q_orders_rcte")
    lo, hi = (
        orders.selectExpr(
            "min(year(o_orderdate) * 12 + month(o_orderdate))",
            "max(year(o_orderdate) * 12 + month(o_orderdate))",
        ).collect()[0]
    )
    if lo is None:
        # empty orders: the oracle's recursive anchor is the NULL min,
        # recursion stops immediately, and the left join coalesces to
        # one (NULL, 0, 0.0) row — emit the identical row
        return spark.sql(
            "SELECT CAST(NULL AS BIGINT) AS month_n,"
            " CAST(0 AS BIGINT) AS n_orders, CAST(0.0 AS DOUBLE) AS revenue"
        )
    return spark.sql(
        _RCTE_MONTHS.format(orders="_q_orders_rcte", lo=int(lo), hi=int(hi))
    )


@register(
    "quantiles_disc_by_priority",
    doc="exact distributed p25/p50/p75 per group in one ranked pass",
    oracle="""
        SELECT o_orderpriority AS priority, 'p25' AS q,
               quantile_disc(o_totalprice, 0.25) AS qvalue
        FROM orders GROUP BY o_orderpriority
        UNION ALL
        SELECT o_orderpriority, 'p50', quantile_disc(o_totalprice, 0.50)
        FROM orders GROUP BY o_orderpriority
        UNION ALL
        SELECT o_orderpriority, 'p75', quantile_disc(o_totalprice, 0.75)
        FROM orders GROUP BY o_orderpriority
    """,
)
def quantiles_disc_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """median_disc generalized to a quantile set: one ranked pass per
    group emits p25/p50/p75 with quantile_disc's inverted-CDF rule —
    the element at 1-based rank ceil(n·q), probed empirically against
    DuckDB across n (floor((n-1)·q) agrees only at q=0.5). Quarters
    make that pure integer arithmetic ((n·k + 3) div 4), immune to
    float-index drift. A row whose rank hits several quantile indices
    (tiny groups) is emitted once per label via the exploded label
    array. Still one shuffle + one sort; the oracle's 3-scan UNION
    shape is exactly what this plan avoids at scale."""
    orders = _t(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wp = W.partitionBy("o_orderpriority")
    labeled = (
        orders.select("o_orderpriority", "o_totalprice", "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(wp))
        .withColumn(
            "q",
            F.explode(
                F.expr(
                    """
                    filter(transform(array(
                        struct('p25' AS lab, (n * 1 + 3) div 4 AS target),
                        struct('p50' AS lab, (n * 2 + 3) div 4 AS target),
                        struct('p75' AS lab, (n * 3 + 3) div 4 AS target)),
                        s -> CASE WHEN s.target = rn THEN s.lab END),
                        x -> x IS NOT NULL)
                    """
                )
            ),
        )
    )
    return labeled.select(
        F.col("o_orderpriority").alias("priority"),
        "q",
        F.col("o_totalprice").alias("qvalue"),
    )
