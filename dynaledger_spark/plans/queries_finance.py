"""Financial-indicator operators over the ledger's revenue series
(round-5 batch 2).

DynaLedger is a financial-statement engine (reference:
backend/main.py 109-221 serves balance-sheet / income-statement
queries); the natural next reports a finance user runs on top of the
fact tables are the technical-indicator family: how far is revenue
off its high (drawdown), is it overbought/oversold (RSI), is today
outside the rolling volatility band (Bollinger), and how concentrated
is revenue across customers (HHI). Everything here follows the repo's
exact-integer discipline: the daily series is summed in integer cents
(round(value*100)), every window/aggregate stays integer until the
final float ratio, which is rounded at a fixed scale so Spark and the
DuckDB oracle agree bitwise.

Scale posture: the one real exchange in each query is the first
groupBy (map-side combined to |days| or |customers| per partition).
The per-day windows that follow run over the aggregated daily series —
one row per day, broadcast-sized forever (36.5k rows per century at
100 TB), so the single-partition WindowExec is the intended plan and
is whitelisted as calendar-bounded (tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from dynaledger_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from dynaledger_spark.catalog import read_table

    return read_table(spark, sf_dir, name)


_DAILY_SQL = """
        SELECT CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase' GROUP BY 1
"""


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily purchase revenue in exact integer cents (the repo's shared
    convention — see queries_featurestore.acf_daily_revenue)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"))
    )


# ---------------------------------------------------------------------------
# Drawdown: how far below the best-ever revenue day is each day?
# ---------------------------------------------------------------------------
@register(
    "max_drawdown_daily_revenue",
    doc="top-10 drawdown days: daily revenue vs its running all-time high",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        pk AS (
            SELECT day, cents,
                   MAX(cents) OVER (ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS peak
            FROM daily
        )
        SELECT strftime(day, '%Y-%m-%d') AS day, cents,
               CAST(peak AS BIGINT) AS peak_cents,
               CAST(peak - cents AS BIGINT) AS dd_cents,
               round(CAST(peak - cents AS DOUBLE) / CAST(peak AS DOUBLE), 9)
                   AS dd_frac
        FROM pk WHERE peak > 0
        ORDER BY dd_cents DESC, day LIMIT 10
    """,
)
def max_drawdown_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "revenue off its high" report: running all-time-high of the
    daily series (integer cents), drawdown = peak − today, worst 10
    days. Integer algebra end to end; the only float op is the final
    dd/peak ratio, rounded at 9 so both engines round the same double.
    """
    daily = _daily(spark, sf_dir)
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    pk = daily.withColumn("peak", F.max("cents").over(w))
    return (
        pk.filter(F.col("peak") > 0)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            F.col("peak").cast("bigint").alias("peak_cents"),
            (F.col("peak") - F.col("cents")).cast("bigint").alias("dd_cents"),
            F.round(
                (F.col("peak") - F.col("cents")).cast("double")
                / F.col("peak").cast("double"),
                9,
            ).alias("dd_frac"),
        )
        .orderBy(F.col("dd_cents").desc(), "day")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# RSI(14) on daily revenue — SMA (Cutler) variant, integer gains/losses
# ---------------------------------------------------------------------------
@register(
    "rsi_14_daily_revenue",
    doc="14-day Cutler RSI of daily revenue: integer gain/loss sums, one float division",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        d AS (
            SELECT day, cents,
                   cents - lag(cents) OVER (ORDER BY day) AS diff,
                   row_number() OVER (ORDER BY day) AS rn
            FROM daily
        ),
        g AS (
            SELECT day, rn,
                   SUM(CASE WHEN diff > 0 THEN diff ELSE 0 END)
                       OVER (ORDER BY day ROWS BETWEEN 13 PRECEDING
                             AND CURRENT ROW) AS gain14,
                   SUM(CASE WHEN diff < 0 THEN -diff ELSE 0 END)
                       OVER (ORDER BY day ROWS BETWEEN 13 PRECEDING
                             AND CURRENT ROW) AS loss14
            FROM d WHERE diff IS NOT NULL
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(gain14 AS BIGINT) AS gain14,
               CAST(loss14 AS BIGINT) AS loss14,
               CASE WHEN gain14 + loss14 = 0 THEN 50.0
                    ELSE round(100.0 * CAST(gain14 AS DOUBLE)
                               / CAST(gain14 + loss14 AS DOUBLE), 9)
               END AS rsi
        FROM g WHERE rn >= 15
        ORDER BY day
    """,
)
def rsi_14_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cutler's RSI (simple-moving-average form — unlike Wilder's EMA it
    is a pure 14-row window, so it needs no recurrence): gains and
    losses are integer cent diffs summed over a ROWS 13-PRECEDING
    frame; RSI = 100·G/(G+L) is the single float op, rounded at 9.
    Rows before the 15th day (14 full diffs) are dropped; a flat
    14-day window (G+L=0) pins RSI to the conventional 50.
    """
    daily = _daily(spark, sf_dir)
    wo = W.orderBy("day")
    d = daily.select(
        "day",
        "cents",
        (F.col("cents") - F.lag("cents").over(wo)).alias("diff"),
        F.row_number().over(wo).alias("rn"),
    ).filter(F.col("diff").isNotNull())
    w14 = W.orderBy("day").rowsBetween(-13, 0)
    g = d.select(
        "day",
        "rn",
        F.sum(F.when(F.col("diff") > 0, F.col("diff")).otherwise(0)).over(w14).alias("gain14"),
        F.sum(F.when(F.col("diff") < 0, -F.col("diff")).otherwise(0)).over(w14).alias("loss14"),
    )
    return (
        g.filter(F.col("rn") >= 15)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            F.col("gain14").cast("bigint").alias("gain14"),
            F.col("loss14").cast("bigint").alias("loss14"),
            F.when(F.col("gain14") + F.col("loss14") == 0, F.lit(50.0))
            .otherwise(
                F.round(
                    F.lit(100.0)
                    * F.col("gain14").cast("double")
                    / (F.col("gain14") + F.col("loss14")).cast("double"),
                    9,
                )
            )
            .alias("rsi"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Bollinger bands: 7-day rolling mean ± 2σ breakouts
# ---------------------------------------------------------------------------
@register(
    "bollinger_breakout_days",
    doc="days outside the 7-day rolling mean ± 1.25σ band (exact integer moments)",
    oracle=f"""
        WITH daily AS ({_DAILY_SQL}),
        roll AS (
            SELECT day, cents,
                   row_number() OVER (ORDER BY day) AS rn,
                   SUM(cents) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
                                    AND CURRENT ROW) AS s1,
                   SUM(CAST(cents AS HUGEINT) * cents)
                       OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING
                             AND CURRENT ROW) AS s2
            FROM daily
        ),
        band AS (
            SELECT day, cents,
                   CAST(s1 AS DOUBLE) / 7.0 AS mean,
                   sqrt((CAST(s2 AS DOUBLE)
                         - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / 7.0)
                        / 6.0) AS sd
            FROM roll WHERE rn >= 7
        )
        SELECT strftime(day, '%Y-%m-%d') AS day, cents,
               round(mean, 6) AS mean7, round(sd, 6) AS sd7,
               CASE WHEN cents > mean + 1.25 * sd THEN 'hi' ELSE 'lo' END
                   AS breakout
        FROM band
        WHERE cents > mean + 1.25 * sd OR cents < mean - 1.25 * sd
        ORDER BY day
    """,
)
def bollinger_breakout_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volatility-band anomaly days (1.25σ — the synthetic daily
    series is near-homoscedastic, so the textbook 2σ band fires zero
    days at test SFs and the query would be vacuous): rolling mean/σ
    over a full 7-row
    frame via exact integer (Σx, Σx²) sums — the moment trick from
    stddev_exact_by_flag applied to a moving window. The band compare
    runs in doubles derived from identical exact integers, so the
    boundary decision is the same IEEE comparison in both engines.
    Σx² accumulates in DECIMAL(38,0) (HUGEINT in the oracle): cents²
    overflows BIGINT once a day clears ~$30B.
    """
    daily = _daily(spark, sf_dir)
    wo = W.orderBy("day")
    w7 = W.orderBy("day").rowsBetween(-6, 0)
    sq = F.col("cents").cast("decimal(19,0)") * F.col("cents")
    roll = daily.select(
        "day",
        "cents",
        F.row_number().over(wo).alias("rn"),
        F.sum("cents").over(w7).alias("s1"),
        F.sum(sq.cast("decimal(38,0)")).over(w7).alias("s2"),
    ).filter(F.col("rn") >= 7)
    mean = F.col("s1").cast("double") / F.lit(7.0)
    sd = F.sqrt(
        (
            F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double") / F.lit(7.0)
        )
        / F.lit(6.0)
    )
    band = roll.select("day", "cents", mean.alias("mean"), sd.alias("sd"))
    c = F.col("cents")
    return (
        band.filter(
            (c > F.col("mean") + 1.25 * F.col("sd"))
            | (c < F.col("mean") - 1.25 * F.col("sd"))
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cents",
            F.round("mean", 6).alias("mean7"),
            F.round("sd", 6).alias("sd7"),
            F.when(c > F.col("mean") + 1.25 * F.col("sd"), F.lit("hi"))
            .otherwise(F.lit("lo"))
            .alias("breakout"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Revenue concentration: Herfindahl-Hirschman index per market segment
# ---------------------------------------------------------------------------
@register(
    "revenue_concentration_hhi",
    doc="customer-revenue concentration per segment: HHI and top-1 share, integer-exact",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_mktsegment AS segment, o.o_custkey,
                   CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        )
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               round(CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DOUBLE)
                     / (CAST(SUM(cents) AS DOUBLE)
                        * CAST(SUM(cents) AS DOUBLE)), 9) AS hhi,
               round(CAST(MAX(cents) AS DOUBLE)
                     / CAST(SUM(cents) AS DOUBLE), 9) AS top_share
        FROM per_cust GROUP BY segment ORDER BY segment
    """,
)
def revenue_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration-risk screen a ledger analyst runs per segment:
    HHI = Σ share_i² = Σc_i² / (Σc_i)² — numerator and denominator are
    exact integer sums (DECIMAL(38,0) products; HUGEINT in the
    oracle), so the n² normalization cancels symbolically and the only
    float is the final division pair, rounded at 9.

    Plan: one hash aggregate per (segment, custkey) after a broadcast
    join of customer→orders? No — customer is the larger-side dim at
    scale; the join shuffles on custkey (both sides pre-partitioned by
    the same key) and the second aggregate reuses the segment key
    exchange. No windows, no skew sensitivity beyond AQE's remit.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_cust = (
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    big = F.col("cents").cast("decimal(19,0)")
    return (
        per_cust.groupBy("segment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.sum((big * F.col("cents")).cast("decimal(38,0)")).alias("_sq"),
            F.max("cents").alias("_mx"),
        )
        .select(
            "segment",
            "n_customers",
            "total_cents",
            F.round(
                F.col("_sq").cast("double")
                / (
                    F.col("total_cents").cast("double")
                    * F.col("total_cents").cast("double")
                ),
                9,
            ).alias("hhi"),
            F.round(
                F.col("_mx").cast("double") / F.col("total_cents").cast("double"), 9
            ).alias("top_share"),
        )
        .orderBy("segment")
    )


# ---------------------------------------------------------------------------
# Holt linear-trend forecast of daily revenue
# ---------------------------------------------------------------------------
@register(
    "holt_linear_forecast",
    doc="Holt double-exponential smoothing over daily revenue; 7-day-ahead forecasts",
    oracle=f"""
        WITH RECURSIVE daily AS ({_DAILY_SQL}),
        idx AS (
            SELECT row_number() OVER (ORDER BY day) AS rn,
                   CAST(cents AS DOUBLE) AS x
            FROM daily
        ),
        n AS (SELECT MAX(rn) AS m FROM idx),
        st(rn, l, b) AS (
            SELECT CAST(2 AS BIGINT),
                   (SELECT x FROM idx WHERE rn = 1),
                   (SELECT x FROM idx WHERE rn = 2)
                   - (SELECT x FROM idx WHERE rn = 1)
            WHERE (SELECT m FROM n) >= 2
            UNION ALL
            SELECT st.rn + 1,
                   0.5 * i.x + 0.5 * (st.l + st.b),
                   0.3 * ((0.5 * i.x + 0.5 * (st.l + st.b)) - st.l)
                   + 0.7 * st.b
            FROM st JOIN idx i ON i.rn = st.rn + 1
            WHERE st.rn < (SELECT m FROM n)
        ),
        fin AS (SELECT l, b FROM st ORDER BY rn DESC LIMIT 1)
        SELECT CAST(u.h AS BIGINT) AS h,
               round(l + CAST(u.h AS DOUBLE) * b, 6) AS forecast_cents
        FROM fin, unnest(range(1, 8)) AS u(h)
        ORDER BY h
    """,
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's double-exponential smoothing (α=0.5, β=0.3) over the
    daily revenue series, forecasting 1-7 days past the corpus edge —
    the level+trend recurrence every ops dashboard runs. The recurrence
    is inherently sequential, so both engines fold the SAME day-ordered
    array: the init state rides as the first fold element (DuckDB's
    list_reduce has no initial-value form — the state struct is
    prepended, and data elements carry their value in the `x` slot).
    The updated level appears twice in the step expression; both
    engines evaluate the identical IEEE sequence, so duplication
    changes nothing. Only forecasts are rounded (at 6).

    Plan: one corpus day-aggregate; the fold runs over the
    calendar-bounded daily array in a single row (36.5k elements per
    century — driver-scale forever). The h=1..7 fan-out is an explode
    of a 7-element sequence.
    """
    daily = _daily(spark, sf_dir)
    arr = daily.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("day", "cents"))),
            lambda s: s.cents.cast("double"),
        ).alias("xs")
    ).filter(F.size("xs") >= 2)
    xs = F.col("xs")
    st = arr.select(
        F.aggregate(
            F.slice(xs, 3, F.greatest(F.size(xs) - 2, F.lit(0))),
            F.struct(
                F.element_at(xs, 1).alias("l"),
                (F.element_at(xs, 2) - F.element_at(xs, 1)).alias("b"),
            ),
            lambda acc, x: F.struct(
                (0.5 * x + 0.5 * (acc.l + acc.b)).alias("l"),
                (
                    0.3 * ((0.5 * x + 0.5 * (acc.l + acc.b)) - acc.l)
                    + 0.7 * acc.b
                ).alias("b"),
            ),
        ).alias("s")
    )
    return (
        st.select(
            F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h"), "s"
        )
        .select(
            F.col("h").cast("bigint").alias("h"),
            F.round(
                F.col("s.l") + F.col("h").cast("double") * F.col("s.b"), 6
            ).alias("forecast_cents"),
        )
        .orderBy("h")
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue per segment
# ---------------------------------------------------------------------------
@register(
    "gini_customer_revenue",
    doc="per-segment Gini coefficient of customer revenue (rank-weighted exact integers)",
    oracle="""
        WITH per_cust AS (
            SELECT c.c_mktsegment AS segment, o.o_custkey,
                   CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT))
                        AS BIGINT) AS cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT segment, cents,
                   row_number() OVER (PARTITION BY segment
                                      ORDER BY cents, o_custkey) AS rk
            FROM per_cust
        )
        SELECT segment,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               CAST(SUM(cents) AS BIGINT) AS total_cents,
               round(CAST(2 * SUM(CAST(rk AS HUGEINT) * cents)
                          - (COUNT(*) + 1) * SUM(CAST(cents AS HUGEINT))
                          AS DOUBLE)
                     / CAST(COUNT(*) * SUM(CAST(cents AS HUGEINT))
                            AS DOUBLE), 9) AS gini
        FROM ranked GROUP BY segment ORDER BY segment
    """,
)
def gini_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inequality twin of the HHI concentration screen: per-segment
    Gini of customer revenue via the rank formula
    G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over ascending-sorted values
    (custkey tiebreak makes the rank total — equal values contribute
    the same sum whatever their relative order, so the tiebreak cannot
    change G). Numerator and denominator are exact integer sums
    (DECIMAL(38,0) / HUGEINT products); one rounded division.

    Plan: the same custkey join + (segment, custkey) aggregate as
    revenue_concentration_hhi, one per-segment rank window (the only
    sort — partitioned by segment, never global), one hash aggregate.
    """
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    per_cust = (
        o.join(c, c.c_custkey == o.o_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    rk = F.row_number().over(
        W.partitionBy("segment").orderBy("cents", "o_custkey")
    )
    ranked = per_cust.withColumn("rk", rk)
    big = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    agg = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("cents").cast("bigint").alias("total_cents"),
        F.sum((big("rk") * F.col("cents")).cast("decimal(38,0)")).alias("_rx"),
    )
    n = F.col("n_customers").cast("decimal(38,0)")
    tot = F.col("total_cents").cast("decimal(38,0)")
    return agg.select(
        "segment",
        "n_customers",
        "total_cents",
        F.round(
            (2 * F.col("_rx") - (n + 1) * tot).cast("double")
            / (n * tot).cast("double"),
            9,
        ).alias("gini"),
    ).orderBy("segment")


# ---------------------------------------------------------------------------
# Accounts-receivable aging buckets
# ---------------------------------------------------------------------------
@register(
    "ar_aging_buckets",
    doc="open-order value by priority x age bucket (0-30/31-60/61-90/90+) at the ledger date",
    oracle="""
        WITH anchor AS (
            SELECT MAX(CAST(o_orderdate AS DATE)) AS asof_day FROM orders
        ),
        open_orders AS (
            SELECT o_orderpriority AS priority,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
                   datediff('day', CAST(o_orderdate AS DATE),
                            (SELECT asof_day FROM anchor)) AS age
            FROM orders WHERE o_orderstatus IN ('O', 'P')
        ),
        bucketed AS (
            SELECT priority,
                   CASE WHEN age <= 30 THEN '0-30'
                        WHEN age <= 60 THEN '31-60'
                        WHEN age <= 90 THEN '61-90'
                        ELSE '90+' END AS bucket,
                   cents
            FROM open_orders
        )
        SELECT priority, bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               round(CAST(SUM(cents) AS DOUBLE) / 100.0, 2) AS open_value
        FROM bucketed GROUP BY priority, bucket
    """,
)
def ar_aging_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The receivables-aging report — the ledger readout every finance
    team runs at close: outstanding (open / pending) order value split
    by how long it has been on the books, per priority band. The as-of
    date is the ledger's own max order date (deterministic, no wall
    clock). Values are exact integer cents; the only float is the final
    cents→currency division, rounded at 2.

    Plan: 1-row anchor broadcast, map-side bucket expression, one
    (priority × bucket ≤ 20-row) hash aggregate. One exchange.
    """
    o = _t(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("asof"))
    open_orders = o.filter(F.col("o_orderstatus").isin("O", "P")).select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        F.to_date("o_orderdate").alias("odate"),
    )
    aged = open_orders.crossJoin(F.broadcast(anchor)).select(
        "priority",
        "cents",
        F.datediff(F.col("asof"), F.col("odate")).alias("age"),
    )
    bucket = (
        F.when(F.col("age") <= 30, "0-30")
        .when(F.col("age") <= 60, "31-60")
        .when(F.col("age") <= 90, "61-90")
        .otherwise("90+")
    )
    return (
        aged.select("priority", bucket.alias("bucket"), "cents")
        .groupBy("priority", "bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("cents").cast("double") / 100.0, 2).alias(
                "open_value"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Revenue decomposition + reconciliation
# ---------------------------------------------------------------------------
@register(
    "revenue_decomposition_reconcile",
    doc="per-returnflag gross/discount/tax/net decomposition with an exact reconciliation residual",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                         AS DECIMAL(38,6)) AS VARCHAR)
                   AS gross,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(l_discount AS DECIMAL(8,2)))
                         AS DECIMAL(38,6)) AS VARCHAR)
                   AS discount_amt,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(8,2))))
                         AS DECIMAL(38,6)) AS VARCHAR)
                   AS net,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(8,2)))
                             * CAST(l_tax AS DECIMAL(8,2)))
                         AS DECIMAL(38,6)) AS VARCHAR)
                   AS tax_amt,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * (1 - CAST(l_discount AS DECIMAL(8,2)))
                             * (1 + CAST(l_tax AS DECIMAL(8,2))))
                         AS DECIMAL(38,6)) AS VARCHAR)
                   AS charged,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                         - SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                               * CAST(l_discount AS DECIMAL(8,2)))
                         - SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                               * (1 - CAST(l_discount AS DECIMAL(8,2))))
                         AS DECIMAL(38,6)) AS VARCHAR) AS residual
        FROM lineitem GROUP BY l_returnflag
    """,
)
def revenue_decomposition_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The double-entry sanity check behind fact_build's rollups: split
    each gross charge into discount, net, and tax components and PROVE the
    books balance — gross − discount − net must be exactly zero, and
    because every component is accumulated in DECIMAL (exact, not
    IEEE), the residual column is an exact "0.000000", not merely
    small. A float pipeline cannot make this guarantee; this query is
    the demonstration that the engine's money math is ledger-grade.

    All money components are EMITTED as the exact DECIMAL (canonical
    6-dp text) rather than cast to DOUBLE — past ~17 significant digits
    Spark and DuckDB round the same decimal to adjacent doubles (README
    "DECIMAL→DOUBLE casts diverge"; round-11 10x sweep caught this
    query), and a ledger-grade decomposition should never pass through
    a lossy cast at all.

    Plan: one map-side-combined hash aggregate over lineitem; all six
    measures share the scan. One exchange.
    """
    li = _t(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice").cast("decimal(18,2)")
    d = F.col("l_discount").cast("decimal(8,2)")
    t = F.col("l_tax").cast("decimal(8,2)")

    def money(c):  # exact decimal, canonical fixed-scale text
        return c.cast("decimal(38,6)").cast("string")

    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        money(F.sum(p)).alias("gross"),
        money(F.sum(p * d)).alias("discount_amt"),
        money(F.sum(p * (1 - d))).alias("net"),
        money(F.sum(p * (1 - d) * t)).alias("tax_amt"),
        money(F.sum(p * (1 - d) * (1 + t))).alias("charged"),
        money(F.sum(p) - F.sum(p * d) - F.sum(p * (1 - d))).alias("residual"),
    )
