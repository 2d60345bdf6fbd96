"""Time-series analytics queries: calendar gap-filling and funnel
attribution over the events/orders tables.

The reference's query surface stops at raw aggregates (its Streamlit layer
does chart post-processing client-side — streamlit_app.py:259-303); these
are the engine-side time-series operations that replace such client code
at corpus scale, each oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynaledger_spark.plans.queries_core import _t
from dynaledger_spark.plans.registry import register


@register(
    "calendar_fill_daily_revenue",
    doc="gap-filled daily series: dense calendar via sequence+explode, zero-filled",
    oracle="""
        WITH daily AS (
            SELECT CAST(datediff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE)) AS INT) AS day_n,
                   SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS rev_dec,
                   COUNT(*) AS n_orders
            FROM orders GROUP BY day_n
        ),
        bounds AS (SELECT min(day_n) AS lo, max(day_n) AS hi FROM daily),
        cal AS (
            SELECT CAST(unnest(generate_series(lo, hi)) AS INT) AS day_n
            FROM bounds
        )
        SELECT c.day_n,
               CAST(COALESCE(d.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(d.rev_dec, CAST(0 AS DECIMAL(27,6))) AS DOUBLE)
                 AS revenue
        FROM cal c LEFT JOIN daily d USING (day_n)
    """,
)
def calendar_fill_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regularize an event-dated series onto a dense daily grid (the
    missing-day problem every training-data time series hits): aggregate
    to day grain, take min/max bounds, explode `sequence(lo, hi)` into
    the full calendar, left-join the observations back and zero-fill.
    The calendar side is generated from a 1-row broadcast (never a
    driver loop); the join key is an int day number so the whole thing
    is codegen + one grouping shuffle. Day-scale cardinality (~10^3 at
    any SF) keeps the dense grid trivially small even at 100 TB of
    fact rows."""
    orders = _t(spark, sf_dir, "orders")
    daily = (
        orders.select(
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1970-01-01"))
            .cast("int")
            .alias("day_n"),
            F.col("o_totalprice").cast("decimal(27,6)").alias("price_dec"),
        )
        .groupBy("day_n")
        .agg(
            F.sum("price_dec").alias("rev_dec"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    bounds = daily.agg(
        F.min("day_n").alias("lo"), F.max("day_n").alias("hi")
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day_n")
    ).select(F.col("day_n").cast("int").alias("day_n"))
    return (
        cal.join(daily, "day_n", "left")
        .select(
            "day_n",
            F.coalesce(F.col("n_orders"), F.lit(0)).cast("bigint").alias(
                "n_orders"
            ),
            F.coalesce(
                F.col("rev_dec"), F.lit(0).cast("decimal(27,6)")
            )
            .cast("double")
            .alias("revenue"),
        )
    )


@register(
    "funnel_view_click_purchase",
    doc="ordered funnel: first view → first click after it → first purchase after that",
    oracle="""
        WITH v AS (
            SELECT user_id, min(ts) AS view_ts
            FROM events WHERE event_type = 'view' GROUP BY user_id
        ),
        c AS (
            SELECT e.user_id, min(e.ts) AS click_ts
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts >= v.view_ts
            GROUP BY e.user_id
        ),
        p AS (
            SELECT e.user_id, min(e.ts) AS purchase_ts
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts >= c.click_ts
            GROUP BY e.user_id
        )
        SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
               p.user_id IS NOT NULL AS converted
        FROM v LEFT JOIN c ON v.user_id = c.user_id
               LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel (the event-order-sensitive analytics the
    reference's client layer cannot do): per user, the first view, the
    first click at-or-after it, and the first purchase at-or-after that
    click — a stage only counts when it happens in order. Three hash
    aggregates and the stitching joins all cluster on user_id, so after
    the first shuffle the rest reuses the same partitioning; nulls mark
    funnel drop-off and `converted` flags completion."""
    events = _t(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            F.col("purchase_ts").isNotNull().alias("converted"),
        )
    )


# ---------------------------------------------------------------------------
# VWAP-style weighted price index per time bucket (round-4)
# ---------------------------------------------------------------------------
@register(
    "vwap_weekly_priceband",
    doc="quantity-weighted effective unit price per ship week (exact decimal sums)",
    oracle="""
        SELECT date_trunc('week', l_shipdate) AS week_start,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
                    AS DOUBLE) AS sum_net,
               CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE) AS sum_qty,
               round(CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,6)))
                          AS DOUBLE)
                     / CAST(SUM(CAST(l_quantity AS DECIMAL(27,6))) AS DOUBLE), 9)
                   AS vwap
        FROM lineitem GROUP BY date_trunc('week', l_shipdate)
    """,
)
def vwap_weekly_priceband(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VWAP over calendar buckets: Σ(net revenue)/Σ(quantity) per ship
    week — the continuous-aggregate twin of time_bucket_ohlc for a
    weighted measure. Both sums are decimal-exact (net price has ≤4dp —
    2dp price × 2dp discount factor — exactly representable at scale 6),
    the one division runs in double rounded to 9 decimals (the quotient
    is ~10³, so 12 would demand more significant digits than a double
    carries). Single hash aggregate on
    (week) with map-side partials; at 100 TB this is the query a
    materialized rollup table serves.
    """
    from dynaledger_spark.functions.agg import dsum

    li = _t(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    agg = li.groupBy(
        F.date_trunc("week", F.col("l_shipdate")).alias("week_start")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        dsum(net, "sum_net"),
        dsum(F.col("l_quantity"), "sum_qty"),
    )
    return agg.withColumn(
        "vwap", F.round(F.col("sum_net") / F.col("sum_qty"), 9)
    )


# ---------------------------------------------------------------------------
# Robust outlier detection via median absolute deviation (round-4)
# ---------------------------------------------------------------------------
@register(
    "mad_outlier_summary",
    doc="median/MAD robust outlier counts per event type",
    oracle="""
        WITH med AS (
            SELECT event_type,
                   round(quantile_cont(value, 0.5), 6) AS med
            FROM events GROUP BY event_type
        ),
        mad AS (
            SELECT e.event_type, m.med,
                   round(quantile_cont(abs(e.value - m.med), 0.5), 6) AS mad
            FROM events e JOIN med m USING (event_type)
            GROUP BY e.event_type, m.med
        )
        SELECT e.event_type, a.med, a.mad,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(*) FILTER (abs(e.value - a.med) > 3 * a.mad) AS BIGINT)
                   AS n_outliers
        FROM events e JOIN mad a USING (event_type)
        GROUP BY e.event_type, a.med, a.mad
    """,
)
def mad_outlier_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) outlier detection — the z-score twin
    (zscore_outliers) breaks on heavy tails; MAD does not. Two exact
    median passes (value, then |value − median|) with the medians
    rounded to 6dp immediately: 2dp input data makes the true quantiles
    ≤4dp, so the rounding pins any last-ulp interpolation divergence
    BEFORE the comparison threshold uses it — boundary rows then flag
    identically in both engines. The three aggregates all hash on
    event_type: one exchange, reused. At 100 TB the exact medians
    become t-digest/GK sketches (queries_approx) with the same shape.
    """
    ev = _t(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(med, "event_type")
    mad = dev.groupBy("event_type", "med").agg(
        F.round(
            F.expr("percentile(abs(value - med), 0.5)"), 6
        ).alias("mad")
    )
    flagged = ev.join(mad, "event_type")
    return flagged.groupBy("event_type", "med", "mad").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum(
            (F.abs(F.col("value") - F.col("med")) > 3 * F.col("mad")).cast("bigint")
        ).alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# Funnel latency: time-to-convert percentiles (round-4)
# ---------------------------------------------------------------------------
@register(
    "time_to_convert_stats",
    doc="first-view → first-purchase latency percentiles across users",
    oracle="""
        WITH firsts AS (
            SELECT user_id,
                   MIN(ts) FILTER (event_type = 'view') AS first_view,
                   MIN(ts) FILTER (event_type = 'purchase') AS first_purchase
            FROM events GROUP BY user_id
        ),
        converted AS (
            SELECT CAST(epoch_us(first_purchase) // 1000000
                        - epoch_us(first_view) // 1000000 AS BIGINT) AS delta_s
            FROM firsts
            WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
              AND first_purchase >= first_view
        )
        SELECT COUNT(*) AS n_converted,
               round(quantile_cont(delta_s, 0.25), 4) AS p25_s,
               round(quantile_cont(delta_s, 0.50), 4) AS p50_s,
               round(quantile_cont(delta_s, 0.90), 4) AS p90_s
        FROM converted
    """,
)
def time_to_convert_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel latency distribution: one conditional-MIN aggregate per
    user (no self-join of the event stream), truncate both endpoints to
    epoch seconds, then interpolated percentiles over the per-user
    deltas. Deltas are exact integers so the interpolation arithmetic is
    the only float op — rounded at 4dp, far above its ulp. Two
    aggregates: per-user (corpus-sized, map-side combinable) and the
    1-row summary.
    """
    ev = _t(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("fp"),
    )
    conv = firsts.filter(
        F.col("fv").isNotNull() & F.col("fp").isNotNull() & (F.col("fp") >= F.col("fv"))
    ).select(
        (
            F.expr("unix_micros(fp) div 1000000")
            - F.expr("unix_micros(fv) div 1000000")
        ).alias("delta_s")
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.round(F.expr("percentile(delta_s, 0.25)"), 4).alias("p25_s"),
        F.round(F.expr("percentile(delta_s, 0.50)"), 4).alias("p50_s"),
        F.round(F.expr("percentile(delta_s, 0.90)"), 4).alias("p90_s"),
    )
