"""Data-quality / governance operators (round-5 batch 2).

The audit layer a warehouse team runs over the same tables the
analytics queries read: two-snapshot schema-drift comparison,
per-stream freshness lag, an l-diversity privacy audit (the natural
companion to k_anonymity_audit), a referential-integrity scorecard
over every FK edge in the schema at once, a charset profile of the
document corpus (mojibake / control-character screening before
training-data export), and deterministic-seed Laplace noisy counts
(the differential-privacy release mechanism, made oracle-exact by
deriving the noise from a portable rolling hash instead of an RNG).

Reference provenance: extends the validation family the reference
runs via dbt tests (DynaLedger run_dbt_pipeline.sh:46-47,
models/schema.yml) from single-table checks to cross-snapshot and
cross-edge governance reports.

Scale posture: every query is hash aggregates + broadcast-sized
scalars; the FK scorecard's six anti-joins are independent
shuffle-hash/broadcast joins unioned at the end (each edge keyed on
its own FK — no shared hot key). Nothing windows over an unbounded
per-key series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynaledger_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from dynaledger_spark.catalog import read_table

    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Schema-drift report: column stats compared across two stable halves
# ---------------------------------------------------------------------------
@register(
    "schema_drift_report",
    doc="column-stat drift between the two o_orderkey-parity snapshots of orders",
    oracle="""
        WITH h AS (
            SELECT o_orderkey % 2 AS half,
                   CAST(COUNT(*) AS DOUBLE) AS row_count,
                   CAST(COUNT(DISTINCT o_orderstatus) AS DOUBLE) AS nd_status,
                   CAST(COUNT(DISTINCT o_orderpriority) AS DOUBLE) AS nd_priority,
                   CAST(COUNT(DISTINCT o_custkey) AS DOUBLE) AS nd_custkey,
                   CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
                   CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
                   CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
                        AS DOUBLE) / 100.0 AS sum_price
            FROM orders GROUP BY 1
        ),
        w AS (
            SELECT * FROM
            (SELECT row_count AS a_row_count, nd_status AS a_nd_status,
                    nd_priority AS a_nd_priority, nd_custkey AS a_nd_custkey,
                    min_price AS a_min_price, max_price AS a_max_price,
                    sum_price AS a_sum_price FROM h WHERE half = 0) ,
            (SELECT row_count AS b_row_count, nd_status AS b_nd_status,
                    nd_priority AS b_nd_priority, nd_custkey AS b_nd_custkey,
                    min_price AS b_min_price, max_price AS b_max_price,
                    sum_price AS b_sum_price FROM h WHERE half = 1)
        )
        SELECT metric, h0, h1, round(abs(h0 - h1), 6) AS abs_diff FROM (
            SELECT 'row_count' AS metric, a_row_count AS h0, b_row_count AS h1 FROM w
            UNION ALL SELECT 'n_distinct_status', a_nd_status, b_nd_status FROM w
            UNION ALL SELECT 'n_distinct_priority', a_nd_priority, b_nd_priority FROM w
            UNION ALL SELECT 'n_distinct_custkey', a_nd_custkey, b_nd_custkey FROM w
            UNION ALL SELECT 'min_totalprice', a_min_price, b_min_price FROM w
            UNION ALL SELECT 'max_totalprice', a_max_price, b_max_price FROM w
            UNION ALL SELECT 'sum_totalprice', a_sum_price, b_sum_price FROM w
        ) ORDER BY metric
    """,
)
def schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "did the new snapshot change shape?" report: the same column
    statistics computed over two deterministic halves (orderkey
    parity stands in for yesterday/today snapshots) and unpivoted
    into (metric, h0, h1, abs_diff) rows. Sums go through integer
    cents so both engines agree bitwise; distinct counts are exact
    (this is the audit path — the sketch path is approx_distinct_*).

    Plan: ONE pass over orders (grouped by parity), one broadcast-sized
    two-row cross join, then a constant 7-row stack — the drift
    unpivot costs nothing beyond the single scan + exchange.
    """
    o = _t(spark, sf_dir, "orders")
    h = o.groupBy((F.col("o_orderkey") % 2).alias("half")).agg(
        F.count(F.lit(1)).cast("double").alias("row_count"),
        F.countDistinct("o_orderstatus").cast("double").alias("nd_status"),
        F.countDistinct("o_orderpriority").cast("double").alias("nd_priority"),
        F.countDistinct("o_custkey").cast("double").alias("nd_custkey"),
        F.min("o_totalprice").cast("double").alias("min_price"),
        F.max("o_totalprice").cast("double").alias("max_price"),
        (
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).cast("double")
            / 100.0
        ).alias("sum_price"),
    )
    cols = [
        ("row_count", "row_count"),
        ("nd_status", "n_distinct_status"),
        ("nd_priority", "n_distinct_priority"),
        ("nd_custkey", "n_distinct_custkey"),
        ("min_price", "min_totalprice"),
        ("max_price", "max_totalprice"),
        ("sum_price", "sum_totalprice"),
    ]
    a = h.filter(F.col("half") == 0).select(
        *[F.col(c).alias(f"a_{c}") for c, _ in cols]
    )
    b = h.filter(F.col("half") == 1).select(
        *[F.col(c).alias(f"b_{c}") for c, _ in cols]
    )
    w = a.crossJoin(F.broadcast(b))
    stack = ", ".join(f"'{m}', a_{c}, b_{c}" for c, m in cols)
    return (
        w.select(
            F.expr(f"stack({len(cols)}, {stack}) AS (metric, h0, h1)")
        )
        .withColumn("abs_diff", F.round(F.abs(F.col("h0") - F.col("h1")), 6))
        .orderBy("metric")
    )


# ---------------------------------------------------------------------------
# Freshness lag per event stream
# ---------------------------------------------------------------------------
@register(
    "freshness_lag_by_type",
    doc="per event_type staleness vs the corpus watermark + trailing-7d share",
    oracle="""
        WITH wm AS (SELECT MAX(ts) AS corpus_max FROM events)
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(ts) AS latest_ts,
               CAST((epoch_us(corpus_max) - epoch_us(MAX(ts))) // 3600000000
                    AS BIGINT) AS lag_hours,
               round(CAST(SUM(CASE WHEN ts >= corpus_max - INTERVAL 7 DAY
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 9) AS share_last_7d
        FROM events CROSS JOIN wm
        GROUP BY event_type, corpus_max
        ORDER BY event_type
    """,
)
def freshness_lag_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingestion-monitoring freshness panel: how stale is each
    stream relative to the newest record anywhere (integer epoch
    MICROseconds — ts carries sub-second precision, so second-grain
    epoch would round differently per engine), and what share of its
    rows arrived in the trailing 7 days. The watermark is a broadcast
    scalar; one hash aggregate on event_type does the rest.
    """
    ev = _t(spark, sf_dir, "events")
    wm = ev.agg(F.max("ts").alias("corpus_max"))
    return (
        ev.crossJoin(F.broadcast(wm))
        .groupBy("event_type", "corpus_max")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("ts").alias("latest_ts"),
            F.sum(
                F.when(
                    F.col("ts") >= F.col("corpus_max") - F.expr("INTERVAL 7 DAY"),
                    1,
                ).otherwise(0)
            ).alias("_n7"),
        )
        .select(
            "event_type",
            "n_events",
            "latest_ts",
            F.expr(
                "(unix_micros(corpus_max) - unix_micros(latest_ts))"
                " div 3600000000"
            )
            .cast("bigint")
            .alias("lag_hours"),
            F.round(
                F.col("_n7").cast("double") / F.col("n_events").cast("double"), 9
            ).alias("share_last_7d"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# l-diversity audit (companion to k_anonymity_audit)
# ---------------------------------------------------------------------------
@register(
    "l_diversity_audit",
    doc="distinct + entropy l-diversity of mktsegment within (nation, acctbal-band) QI groups",
    oracle="""
        WITH cells AS (
            SELECT c_nationkey AS nation,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                   c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2, 3
        ),
        g AS (
            SELECT nation, bal_band,
                   CAST(SUM(n) AS BIGINT) AS k,
                   CAST(COUNT(*) AS BIGINT) AS l_distinct,
                   list(CAST(n AS DOUBLE) ORDER BY c_mktsegment) AS ns
            FROM cells GROUP BY 1, 2
        )
        SELECT nation, bal_band, k, l_distinct,
               round(-list_reduce(
                   list_transform(ns, x -> round((x / CAST(k AS DOUBLE))
                                           * ln(x / CAST(k AS DOUBLE)), 12)),
                   (a, b) -> a + b), 9) + 0.0 AS entropy_l
        FROM g WHERE k >= 2
        ORDER BY l_distinct, k DESC, nation, bal_band
        LIMIT 25
    """,
)
def l_diversity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy re-identification audit one level past k-anonymity: for
    each quasi-identifier cell (nation × $1000 account-balance band),
    how many distinct sensitive values (market segment) appear
    (distinct-l) and how evenly (entropy-l, nats). Sensitive-value
    counts are exact integers; the entropy sum is the one float
    reduction — each term is derived from the same integers in both
    engines and the per-group term count is ≤ |segments| = O(1), so
    the fold order is the group's sort order in both. The 25 least
    diverse groups (worst disclosure risk) surface first.
    """
    c = _t(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    # entropy from the bounded per-group (segment, n) set: collect the ≤5
    # cell counts, sort for a deterministic fold order, fold in one pass.
    groups = cells.groupBy("nation", "bal_band").agg(
        F.sum("n").cast("bigint").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("l_distinct"),
        F.array_sort(F.collect_list(F.struct("c_mktsegment", "n"))).alias("_cells"),
    )
    p = "CAST(s.n AS DOUBLE) / CAST(k AS DOUBLE)"
    # + 0.0 collapses IEEE -0.0 (a fully-uniform or singleton cell folds
    # to -Σ0 = -0.0 in one engine, +0.0 in the other) to +0.0 in both.
    # each -p·ln(p) term is pinned at 12 decimals before the fold (the
    # repo-wide convention for ln-derived values) so a cross-libm ln ulp
    # cannot flip the final round(…, 9) at a half-way boundary.
    groups = groups.withColumn(
        "entropy_l",
        F.round(
            -F.expr(
                f"aggregate(_cells, CAST(0.0 AS DOUBLE),"
                f" (acc, s) -> acc + round(({p}) * ln({p}), 12))"
            ),
            9,
        )
        + 0.0,
    )
    return (
        groups.filter(F.col("k") >= 2)
        .select("nation", "bal_band", "k", "l_distinct", "entropy_l")
        .orderBy("l_distinct", F.col("k").desc(), "nation", "bal_band")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Referential-integrity scorecard over every FK edge at once
# ---------------------------------------------------------------------------
@register(
    "fk_orphan_scorecard",
    doc="orphan counts and rates for all six FK edges in one report",
    oracle="""
        SELECT edge, child_rows, orphans,
               CASE WHEN child_rows > 0 THEN
                    round(CAST(orphans AS DOUBLE) / CAST(child_rows AS DOUBLE), 9)
               END AS orphan_rate
        FROM (
            SELECT 'lineitem->orders' AS edge,
                   (SELECT COUNT(*) FROM lineitem) AS child_rows,
                   (SELECT COUNT(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_orderkey = l.l_orderkey))
                       AS orphans
            UNION ALL
            SELECT 'lineitem->part',
                   (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM part p
                                      WHERE p.p_partkey = l.l_partkey))
            UNION ALL
            SELECT 'lineitem->supplier',
                   (SELECT COUNT(*) FROM lineitem),
                   (SELECT COUNT(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM supplier s
                                      WHERE s.s_suppkey = l.l_suppkey))
            UNION ALL
            SELECT 'orders->customer',
                   (SELECT COUNT(*) FROM orders),
                   (SELECT COUNT(*) FROM orders o
                    WHERE NOT EXISTS (SELECT 1 FROM customer c
                                      WHERE c.c_custkey = o.o_custkey))
            UNION ALL
            SELECT 'customer->nation',
                   (SELECT COUNT(*) FROM customer),
                   (SELECT COUNT(*) FROM customer c
                    WHERE NOT EXISTS (SELECT 1 FROM nation n
                                      WHERE n.n_nationkey = c.c_nationkey))
            UNION ALL
            SELECT 'supplier->nation',
                   (SELECT COUNT(*) FROM supplier),
                   (SELECT COUNT(*) FROM supplier s
                    WHERE NOT EXISTS (SELECT 1 FROM nation n
                                      WHERE n.n_nationkey = s.s_nationkey))
        )
        ORDER BY edge
    """,
)
def fk_orphan_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole-schema integrity dashboard: every FK edge's orphan
    count (left-anti join) and rate in one result — the batch
    generalization of the single-edge anti_join_fk / dbt
    relationship test (reference models/schema.yml). Each edge's
    anti-join broadcasts its parent's key column when small (nation,
    supplier) and shuffle-hash-joins otherwise; the six edges are
    independent plans unioned at the end, so Spark schedules their
    stages concurrently.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    p = _t(spark, sf_dir, "part")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")

    def edge(name: str, child: DataFrame, ck: str, parent: DataFrame, pk: str):
        total = child.agg(F.count(F.lit(1)).alias("child_rows"))
        psel = parent.select(pk)
        orphans = child.join(
            psel, child[ck] == psel[pk], "left_anti"
        ).agg(F.count(F.lit(1)).alias("orphans"))
        return (
            total.crossJoin(F.broadcast(orphans))
            .select(
                F.lit(name).alias("edge"),
                F.col("child_rows").cast("bigint").alias("child_rows"),
                F.col("orphans").cast("bigint").alias("orphans"),
                # rate undefined on an empty child table: NULL under a
                # guard mirrored in the oracle, never ANSI div/0
                F.when(
                    F.col("child_rows") > 0,
                    F.round(
                        F.col("orphans").cast("double")
                        / F.col("child_rows").cast("double"),
                        9,
                    ),
                ).alias("orphan_rate"),
            )
        )

    edges = [
        edge("lineitem->orders", li, "l_orderkey", o, "o_orderkey"),
        edge("lineitem->part", li, "l_partkey", p, "p_partkey"),
        edge("lineitem->supplier", li, "l_suppkey", s, "s_suppkey"),
        edge("orders->customer", o, "o_custkey", c, "c_custkey"),
        edge("customer->nation", c, "c_nationkey", n, "n_nationkey"),
        edge("supplier->nation", s, "s_nationkey", n, "n_nationkey"),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out.orderBy("edge")


# ---------------------------------------------------------------------------
# Charset profile of the document corpus (mojibake / control-char screen)
# ---------------------------------------------------------------------------
@register(
    "charset_profile_by_source",
    doc="per-source charset hygiene: control chars, replacement chars, non-ASCII and space ratios",
    oracle="""
        WITH per_doc AS (
            SELECT source,
                   length(text) AS n,
                   length(text) - length(regexp_replace(text, '[ -~]', '', 'g'))
                       AS n_outside_printable,
                   length(text) - length(regexp_replace(text, '[ ]', '', 'g'))
                       AS n_space,
                   CASE WHEN regexp_matches(text,
                        '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]') THEN 1 ELSE 0
                       END AS has_ctrl,
                   CASE WHEN contains(text, chr(65533)) THEN 1 ELSE 0 END
                       AS has_replacement
            FROM documents
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(has_ctrl) AS BIGINT) AS docs_with_ctrl,
               CAST(SUM(has_replacement) AS BIGINT) AS docs_with_replacement,
               round(CAST(SUM(n_outside_printable) AS DOUBLE) * 1000.0
                     / CAST(SUM(n) AS DOUBLE), 6) AS permille_non_printable,
               round(CAST(SUM(n_space) AS DOUBLE) * 1000.0
                     / CAST(SUM(n) AS DOUBLE), 6) AS permille_space
        FROM per_doc GROUP BY source ORDER BY source
    """,
)
def charset_profile_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-export encoding screen for a training corpus: per
    source, how many documents carry C0 control characters or U+FFFD
    replacement characters (both mojibake tells), plus exact
    per-mille rates of non-printable-ASCII and space characters. All
    counts are integer character tallies (length-difference after
    regexp strip — Java and RE2 agree on these byte-class patterns);
    ratios are the single rounded float.
    """
    d = _t(spark, sf_dir, "documents")
    n = F.length("text")
    per_doc = d.select(
        "source",
        n.alias("n"),
        (n - F.length(F.regexp_replace("text", "[ -~]", ""))).alias(
            "n_outside_printable"
        ),
        (n - F.length(F.regexp_replace("text", "[ ]", ""))).alias("n_space"),
        F.when(
            F.col("text").rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"), 1
        )
        .otherwise(0)
        .alias("has_ctrl"),
        F.when(F.col("text").contains(F.lit("�")), 1).otherwise(0).alias(
            "has_replacement"
        ),
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("has_ctrl").cast("bigint").alias("docs_with_ctrl"),
            F.sum("has_replacement").cast("bigint").alias("docs_with_replacement"),
            F.round(
                F.sum("n_outside_printable").cast("double")
                * 1000.0
                / F.sum("n").cast("double"),
                6,
            ).alias("permille_non_printable"),
            F.round(
                F.sum("n_space").cast("double") * 1000.0 / F.sum("n").cast("double"),
                6,
            ).alias("permille_space"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Differential-privacy-style noisy counts with deterministic seeded noise
# ---------------------------------------------------------------------------
@register(
    "dp_noisy_counts",
    doc="Laplace-noised event counts (ε=1) with portable hash-seeded noise",
    oracle="""
        WITH counts AS (
            SELECT event_type, CAST(COUNT(*) AS BIGINT) AS true_count
            FROM events GROUP BY 1
        ),
        seeded AS (
            SELECT event_type, true_count,
                   list_reduce(
                       list_transform(range(1, length(event_type) + 1),
                           i -> CAST(coalesce(ascii(event_type[i:i]), 0)
                                     AS BIGINT)),
                       (acc, c) -> (acc * 31 + c) % 1000000007
                   ) AS h
            FROM counts
        ),
        u AS (
            SELECT event_type, true_count,
                   ((CAST(h % 999999 AS DOUBLE) + 0.5) / 1000000.0) - 0.5 AS uu
            FROM seeded
        )
        SELECT event_type, true_count,
               round(CASE WHEN uu >= 0 THEN -ln(1.0 - 2.0 * uu)
                          ELSE ln(1.0 + 2.0 * uu) END, 6) AS noise,
               round(CAST(true_count AS DOUBLE)
                     + (CASE WHEN uu >= 0 THEN -ln(1.0 - 2.0 * uu)
                             ELSE ln(1.0 + 2.0 * uu) END), 6) AS noisy_count
        FROM u ORDER BY event_type
    """,
)
def dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DP release mechanism with the RNG replaced by a derivation
    both engines can reproduce: uniform u ∈ (−½, ½) comes from the
    portable polynomial rolling hash of the group key (mod 1e9+7, the
    doc_fingerprint convention), and Laplace(b=1/ε, ε=1) noise is the
    inverse-CDF transform −b·sgn(u)·ln(1−2|u|). The +0.5 offset keeps
    u strictly inside the open interval, so ln never sees 0. A real
    deployment would swap the hash for a CSPRNG per release — the
    derivation is the operator under test, not the entropy source.

    Plan: one hash aggregate; the noise math is per-group scalar
    expression work on a handful of rows.
    """
    from dynaledger_spark.functions.text import rolling_fingerprint

    ev = _t(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    seeded = counts.withColumn("h", rolling_fingerprint(F.col("event_type")))
    u = seeded.withColumn(
        "uu",
        ((F.col("h") % 999999).cast("double") + 0.5) / 1000000.0 - 0.5,
    )
    noise = F.when(
        F.col("uu") >= 0, -F.log(F.lit(1.0) - 2.0 * F.col("uu"))
    ).otherwise(F.log(F.lit(1.0) + 2.0 * F.col("uu")))
    return u.select(
        "event_type",
        "true_count",
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_count").cast("double") + noise, 6).alias("noisy_count"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Population-stability-index feature drift (the ML-monitoring metric)
# ---------------------------------------------------------------------------
@register(
    "psi_feature_drift",
    doc="PSI of the event value distribution, first half-month vs second, per event_type",
    oracle="""
        WITH binned AS (
            SELECT event_type,
                   CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS half,
                   CAST(least(floor(value / 40.0), 9) AS BIGINT) AS bin
            FROM events
        ),
        obs AS (
            SELECT event_type, bin,
                   SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c_ref,
                   SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c_cur
            FROM binned GROUP BY 1, 2
        ),
        grid AS (
            SELECT t.event_type, CAST(u.b AS BIGINT) AS bin
            FROM (SELECT DISTINCT event_type FROM binned) t,
                 unnest(range(0, 10)) AS u(b)
        ),
        cells AS (
            SELECT g.event_type, g.bin,
                   COALESCE(o.c_ref, 0) AS c_ref,
                   COALESCE(o.c_cur, 0) AS c_cur
            FROM grid g LEFT JOIN obs o
              ON o.event_type = g.event_type AND o.bin = g.bin
        ),
        tot AS (
            SELECT event_type,
                   SUM(c_ref) AS n_ref, SUM(c_cur) AS n_cur
            FROM cells GROUP BY 1
        ),
        terms AS (
            SELECT c.event_type, t.n_ref, t.n_cur,
                   round(((CAST(c_ref AS DOUBLE) + 0.5)
                          / (CAST(n_ref AS DOUBLE) + 5.0)
                          - (CAST(c_cur AS DOUBLE) + 0.5)
                            / (CAST(n_cur AS DOUBLE) + 5.0))
                         * ln(((CAST(c_ref AS DOUBLE) + 0.5)
                               / (CAST(n_ref AS DOUBLE) + 5.0))
                              / ((CAST(c_cur AS DOUBLE) + 0.5)
                                 / (CAST(n_cur AS DOUBLE) + 5.0))), 12)
                       AS term
            FROM cells c JOIN tot t ON t.event_type = c.event_type
        )
        SELECT event_type,
               CAST(n_ref AS BIGINT) AS n_ref,
               CAST(n_cur AS BIGINT) AS n_cur,
               round(list_reduce(list_prepend(0.0, list_sort(list(term))),
                                 (a, b) -> a + b), 9) AS psi
        FROM terms GROUP BY event_type, n_ref, n_cur
        ORDER BY event_type
    """,
)
def psi_feature_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index — the drift score model-monitoring
    dashboards alarm on (PSI > 0.2 = investigate): compare the event
    value distribution between the reference window (days 1-15 of the
    month) and the current window (rest) per event_type, over 10
    fixed-width $40 bins. Fixed bins, not quantiles: quantile edges
    differ between engines, integer bin ids cannot. Counts get +0.5/+5
    Laplace smoothing so empty bins never hit ln(0). Each bin term is
    one IEEE expression from exact integers rounded at 12; the per-type
    sum is the repo's sorted fold (order-independent), rounded at 9.

    Plan: one scan, one (event_type, bin) hash aggregate — the ref/cur
    split is a conditional aggregation, NOT two scans — then the
    observed cells densify onto the fixed type × 10-bin grid (a
    10-row broadcast fan-out) and broadcast-sized rollups finish. Bin
    count is fixed at 10, so the final fold state is O(1) per type
    regardless of corpus size.
    """
    from dynaledger_spark.plans.queries_mlprep import _fold

    ev = _t(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.when(F.dayofmonth("ts") <= 15, 0).otherwise(1).alias("half"),
        F.least(F.floor(F.col("value") / 40.0), F.lit(9))
        .cast("bigint")
        .alias("bin"),
    )
    obs = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c_cur"),
    )
    # the PSI design fixes ALL 10 bins — a bin empty in both halves still
    # contributes its (smoothed) tiny term, so densify the observed cells
    # onto the full type × bin grid
    grid = binned.select("event_type").distinct().crossJoin(
        F.broadcast(
            spark.range(0, 10).select(F.col("id").cast("bigint").alias("bin"))
        )
    )
    cells = grid.join(obs, ["event_type", "bin"], "left").select(
        "event_type",
        "bin",
        F.coalesce(F.col("c_ref"), F.lit(0)).alias("c_ref"),
        F.coalesce(F.col("c_cur"), F.lit(0)).alias("c_cur"),
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    p = (F.col("c_ref").cast("double") + 0.5) / (
        F.col("n_ref").cast("double") + 5.0
    )
    q = (F.col("c_cur").cast("double") + 0.5) / (
        F.col("n_cur").cast("double") + 5.0
    )
    terms = cells.join(tot, "event_type").select(
        "event_type",
        "n_ref",
        "n_cur",
        F.round((p - q) * F.log(p / q), 12).alias("term"),
    )
    return (
        terms.groupBy("event_type", "n_ref", "n_cur")
        .agg(F.round(_fold("term"), 9).alias("psi"))
        .select(
            "event_type",
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_cur").cast("bigint").alias("n_cur"),
            "psi",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Join-key skew report — the 100 TB planning diagnostic
# ---------------------------------------------------------------------------
@register(
    "join_key_skew_report",
    doc="per join-key skew stats (max/avg frequency ratio, heaviest key) for the hot keys",
    oracle="""
        SELECT col, n_rows, n_keys, max_freq,
               round(CAST(max_freq AS DOUBLE)
                     / (CAST(n_rows AS DOUBLE) / CAST(n_keys AS DOUBLE)), 6)
                   AS skew_ratio,
               top_key
        FROM (
            SELECT 'lineitem.l_orderkey' AS col,
                   CAST(SUM(n) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(MAX(n) AS BIGINT) AS max_freq,
                   CAST(MIN(k) FILTER (WHERE n = (SELECT MAX(n) FROM (
                       SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey)))
                       AS BIGINT) AS top_key
            FROM (SELECT l_orderkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1)
            UNION ALL
            SELECT 'lineitem.l_partkey',
                   CAST(SUM(n) AS BIGINT), CAST(COUNT(*) AS BIGINT),
                   CAST(MAX(n) AS BIGINT),
                   CAST(MIN(k) FILTER (WHERE n = (SELECT MAX(n) FROM (
                       SELECT COUNT(*) AS n FROM lineitem GROUP BY l_partkey)))
                       AS BIGINT)
            FROM (SELECT l_partkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1)
            UNION ALL
            SELECT 'orders.o_custkey',
                   CAST(SUM(n) AS BIGINT), CAST(COUNT(*) AS BIGINT),
                   CAST(MAX(n) AS BIGINT),
                   CAST(MIN(k) FILTER (WHERE n = (SELECT MAX(n) FROM (
                       SELECT COUNT(*) AS n FROM orders GROUP BY o_custkey)))
                       AS BIGINT)
            FROM (SELECT o_custkey AS k, COUNT(*) AS n FROM orders GROUP BY 1)
            UNION ALL
            SELECT 'events.user_id',
                   CAST(SUM(n) AS BIGINT), CAST(COUNT(*) AS BIGINT),
                   CAST(MAX(n) AS BIGINT),
                   CAST(MIN(k) FILTER (WHERE n = (SELECT MAX(n) FROM (
                       SELECT COUNT(*) AS n FROM events GROUP BY user_id)))
                       AS BIGINT)
            FROM (SELECT user_id AS k, COUNT(*) AS n FROM events GROUP BY 1)
        )
        ORDER BY col
    """,
)
def join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The diagnostic a capacity planner runs before sizing a 100 TB
    join: for each candidate join key, how many rows and distinct
    keys, the heaviest key's frequency, and the skew ratio
    max/avg — the number that decides between a plain shuffle join,
    AQE skew splitting, or the salted-join path
    (salted_join_segment_revenue). top_key is the smallest key id
    among those at max frequency (deterministic tiebreak).

    Plan: one groupBy per audited key (each map-side combined), then a
    1-row rollup per key unioned — no windows, no collects; the
    per-key rollup state is a handful of scalars.
    """
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    ev = _t(spark, sf_dir, "events")

    def keystats(name: str, df: DataFrame, key: str):
        per_key = df.groupBy(F.col(key).alias("k")).agg(
            F.count(F.lit(1)).alias("n")
        )
        mx = per_key.agg(F.max("n").alias("mx"))
        top = (
            per_key.join(F.broadcast(mx), F.col("n") == F.col("mx"))
            .agg(F.min("k").cast("bigint").alias("top_key"))
        )
        stats = per_key.agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.max("n").cast("bigint").alias("max_freq"),
        )
        return (
            stats.crossJoin(F.broadcast(top))
            .select(
                F.lit(name).alias("col"),
                "n_rows",
                "n_keys",
                "max_freq",
                F.round(
                    F.col("max_freq").cast("double")
                    / (
                        F.col("n_rows").cast("double")
                        / F.col("n_keys").cast("double")
                    ),
                    6,
                ).alias("skew_ratio"),
                "top_key",
            )
        )

    parts = [
        keystats("lineitem.l_orderkey", li, "l_orderkey"),
        keystats("lineitem.l_partkey", li, "l_partkey"),
        keystats("orders.o_custkey", o, "o_custkey"),
        keystats("events.user_id", ev, "user_id"),
    ]
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out.orderBy("col")


# ---------------------------------------------------------------------------
# t-closeness audit (completes the k-anonymity / l-diversity trilogy)
# ---------------------------------------------------------------------------
@register(
    "t_closeness_audit",
    doc="total-variation distance of each QI group's segment mix vs the global mix",
    oracle="""
        WITH cells AS (
            SELECT c_nationkey AS nation,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                   c_mktsegment,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM customer GROUP BY 1, 2, 3
        ),
        gseg AS (
            SELECT c_mktsegment, CAST(SUM(n) AS BIGINT) AS n_g FROM cells
            GROUP BY 1
        ),
        tot AS (SELECT CAST(SUM(n_g) AS BIGINT) AS n_total FROM gseg),
        grid AS (
            SELECT g.nation, g.bal_band, s.c_mktsegment, s.n_g
            FROM (SELECT DISTINCT nation, bal_band FROM cells) g, gseg s
        ),
        dense AS (
            SELECT gr.nation, gr.bal_band, gr.c_mktsegment, gr.n_g,
                   COALESCE(c.n, 0) AS n
            FROM grid gr LEFT JOIN cells c
              ON c.nation = gr.nation AND c.bal_band = gr.bal_band
             AND c.c_mktsegment = gr.c_mktsegment
        ),
        gtot AS (
            SELECT nation, bal_band, CAST(SUM(n) AS BIGINT) AS k
            FROM dense GROUP BY 1, 2
        ),
        terms AS (
            SELECT d.nation, d.bal_band, d.c_mktsegment,
                   round(abs(CAST(d.n AS DOUBLE) / CAST(t.k AS DOUBLE)
                             - CAST(d.n_g AS DOUBLE)
                               / CAST((SELECT n_total FROM tot) AS DOUBLE)),
                         12) AS dev
            FROM dense d JOIN gtot t
              ON t.nation = d.nation AND t.bal_band = d.bal_band
        ),
        grp AS (
            SELECT nation, bal_band,
                   list(dev ORDER BY c_mktsegment) AS devs
            FROM terms GROUP BY 1, 2
        )
        SELECT g.nation, g.bal_band, t.k,
               round(0.5 * list_reduce(list_prepend(0.0, devs),
                                       (a, b) -> a + b), 9) AS t_distance
        FROM grp g JOIN gtot t
          ON t.nation = g.nation AND t.bal_band = g.bal_band
        WHERE t.k >= 2
        ORDER BY t_distance DESC, g.nation, g.bal_band
        LIMIT 25
    """,
)
def t_closeness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third privacy gate after k-anonymity and l-diversity: a QI
    group leaks when its sensitive-attribute DISTRIBUTION deviates
    from the global one, even if it is diverse. For the categorical
    segment attribute, the earth-mover distance reduces to total
    variation: t = ½·Σ|p_group − p_global|. Each deviation term is one
    IEEE expression from exact integers rounded at 12; the ≤5-term
    per-group sum folds in segment order. Groups densify onto the full
    segment grid first — a missing segment contributes |0 − p_global|,
    which dropping the row would silently lose (the PSI lesson). The
    25 most skewed groups (worst disclosure) surface first.
    """
    c = _t(spark, sf_dir, "customer")
    cells = c.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
        "c_mktsegment",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    glob = cells.groupBy("c_mktsegment").agg(F.sum("n").cast("bigint").alias("n_g"))
    tot = glob.agg(F.sum("n_g").cast("bigint").alias("n_total"))
    grid = (
        cells.select("nation", "bal_band")
        .distinct()
        .crossJoin(F.broadcast(glob))
    )
    dense = grid.join(
        cells, ["nation", "bal_band", "c_mktsegment"], "left"
    ).select(
        "nation",
        "bal_band",
        "c_mktsegment",
        "n_g",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
    )
    from pyspark.sql import Window as W

    ksum = F.sum("n").over(W.partitionBy("nation", "bal_band"))
    dev = F.round(
        F.abs(
            F.col("n").cast("double") / ksum.cast("double")
            - F.col("n_g").cast("double") / F.col("n_total").cast("double")
        ),
        12,
    )
    terms = dense.crossJoin(F.broadcast(tot)).select(
        "nation", "bal_band", "c_mktsegment", "n", dev.alias("dev")
    )
    grp = terms.groupBy("nation", "bal_band").agg(
        F.sum("n").cast("bigint").alias("k"),
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("c_mktsegment", "dev"))),
                lambda s: s.dev,
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ).alias("_devsum"),
    )
    return (
        grp.filter(F.col("k") >= 2)
        .select(
            "nation",
            "bal_band",
            "k",
            F.round(0.5 * F.col("_devsum"), 9).alias("t_distance"),
        )
        .orderBy(F.col("t_distance").desc(), "nation", "bal_band")
        .limit(25)
    )


# ---------------------------------------------------------------------------
# Quality-filter agreement (Cohen's kappa), round 7
# ---------------------------------------------------------------------------
_KAPPA_FILTERS = ("len_gate", "stopword_gate", "alpha_gate", "wordlen_gate")

# The four integer-exact gates, shared by filter_agreement_kappa and
# quality_ensemble_gate (SQL side; the Spark twin is _gate_flags below).
_GATES_SQL = """
            SELECT doc_id, source,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CASE WHEN len(string_split(text, ' ')) BETWEEN 20 AND 90
                        THEN 1 ELSE 0 END AS f1,
                   CASE WHEN len(list_filter(string_split(text, ' '),
                             t -> list_contains(['the','a','of','and','to',
                                                 'in','is','it','for','on'], t)))
                             >= 2
                        THEN 1 ELSE 0 END AS f2,
                   CASE WHEN 500 * length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                             >= 411 * length(text)
                        THEN 1 ELSE 0 END AS f3,
                   CASE WHEN 2 * (length(text) - len(string_split(text, ' ')) + 1)
                             <= 9 * len(string_split(text, ' '))
                        THEN 1 ELSE 0 END AS f4
            FROM documents
"""


def _gate_flags(docs: DataFrame) -> DataFrame:
    """Spark twin of _GATES_SQL: the four integer-exact quality gates."""
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    from dynaledger_spark.plans.queries_text import _STOPWORDS

    n_stop = F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
    n_alpha = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    n_chars = F.length("text")
    letters = n_chars - n_tok + 1
    return docs.select(
        "doc_id",
        "source",
        n_tok.cast("bigint").alias("n_tokens"),
        F.when((n_tok >= 20) & (n_tok <= 90), 1).otherwise(0).alias("f1"),
        F.when(n_stop >= 2, 1).otherwise(0).alias("f2"),
        F.when(500 * n_alpha >= 411 * n_chars, 1).otherwise(0).alias("f3"),
        F.when(2 * letters <= 9 * n_tok, 1).otherwise(0).alias("f4"),
    )


@register(
    "filter_agreement_kappa",
    doc="pairwise Cohen's kappa between four integer-exact quality filters",
    oracle=f"""
        WITH flags AS ({_GATES_SQL}),
        m AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(f1) AS BIGINT) AS s1, CAST(SUM(f2) AS BIGINT) AS s2,
                   CAST(SUM(f3) AS BIGINT) AS s3, CAST(SUM(f4) AS BIGINT) AS s4,
                   CAST(SUM(f1*f2) AS BIGINT) AS s12,
                   CAST(SUM(f1*f3) AS BIGINT) AS s13,
                   CAST(SUM(f1*f4) AS BIGINT) AS s14,
                   CAST(SUM(f2*f3) AS BIGINT) AS s23,
                   CAST(SUM(f2*f4) AS BIGINT) AS s24,
                   CAST(SUM(f3*f4) AS BIGINT) AS s34
            FROM flags
        ),
        pairs AS (
            SELECT 'len_gate' AS filter_a, 'stopword_gate' AS filter_b,
                   s1 AS sa, s2 AS sb, s12 AS sab, n FROM m
            UNION ALL SELECT 'len_gate', 'alpha_gate', s1, s3, s13, n FROM m
            UNION ALL SELECT 'len_gate', 'wordlen_gate', s1, s4, s14, n FROM m
            UNION ALL SELECT 'stopword_gate', 'alpha_gate', s2, s3, s23, n FROM m
            UNION ALL SELECT 'stopword_gate', 'wordlen_gate', s2, s4, s24, n FROM m
            UNION ALL SELECT 'alpha_gate', 'wordlen_gate', s3, s4, s34, n FROM m
        )
        SELECT filter_a, filter_b,
               sab AS n11, sa - sab AS n10, sb - sab AS n01,
               n - sa - sb + sab AS n00,
               round(CAST(sab + n - sa - sb + sab AS DOUBLE) / n, 9) AS po,
               CASE WHEN CAST(sa * sb + (n - sa) * (n - sb) AS DOUBLE)
                         / (n * n) = 1.0 THEN NULL
                    ELSE round(
                        (CAST(sab + n - sa - sb + sab AS DOUBLE) / n
                         - CAST(sa * sb + (n - sa) * (n - sb) AS DOUBLE)
                           / (n * n))
                        / (1.0 - CAST(sa * sb + (n - sa) * (n - sb) AS DOUBLE)
                                 / (n * n)), 9)
               END AS kappa
        FROM pairs
        ORDER BY filter_a, filter_b
    """,
)
def filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chance-corrected agreement (Cohen 1960) between quality filters —
    the standard diagnostic when assembling a filter ensemble (raw
    agreement is inflated when both filters pass almost everything;
    kappa subtracts the chance term). Four filters, all integer-exact
    so both engines agree bitwise on every flag: a Gopher-style token
    length gate [20, 90]; a stopword gate (>= 2 stopword tokens from the
    repo's 10-word list); an alphabetic-density gate (500*alpha_chars >=
    411*total_chars — a 0.822 ratio as an integer cross-multiply, set at
    this corpus's median so the gate discriminates); and a
    mean-word-length gate (letters/word <= 4.5, cross-multiplied —
    likewise the corpus median).
    kappa = (po - pe)/(1 - pe) from the 2x2 contingency integers, one
    rounding at 9 dp.

    Plan: ONE map-side-combined aggregate produces every marginal and
    joint count in a single corpus pass (no per-pair re-scan); the 6
    pair rows are a driver-sized projection of that 1-row result. Scales
    trivially. reference: SURVEY §2.11 (quality/eval tier).
    """
    from dynaledger_spark.plans.queries_text import _docs

    flags = _gate_flags(_docs(spark, sf_dir)).select("f1", "f2", "f3", "f4")
    m = flags.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        *[F.sum(f"f{i}").cast("bigint").alias(f"s{i}") for i in (1, 2, 3, 4)],
        *[
            F.sum(F.col(f"f{i}") * F.col(f"f{j}")).cast("bigint").alias(f"s{i}{j}")
            for i, j in ((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
        ],
    )
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(_KAPPA_FILTERS[i - 1]).alias("filter_a"),
                F.lit(_KAPPA_FILTERS[j - 1]).alias("filter_b"),
                F.col(f"s{i}").alias("sa"),
                F.col(f"s{j}").alias("sb"),
                F.col(f"s{i}{j}").alias("sab"),
            )
            for i, j in ((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
        ]
    )
    p = m.select(F.explode(pair_structs).alias("p"), "n").select("p.*", "n")
    po = (F.col("sab") + F.col("n") - F.col("sa") - F.col("sb") + F.col("sab")).cast(
        "double"
    ) / F.col("n")
    pe = (
        F.col("sa") * F.col("sb")
        + (F.col("n") - F.col("sa")) * (F.col("n") - F.col("sb"))
    ).cast("double") / (F.col("n") * F.col("n"))
    return p.select(
        "filter_a",
        "filter_b",
        F.col("sab").alias("n11"),
        (F.col("sa") - F.col("sab")).alias("n10"),
        (F.col("sb") - F.col("sab")).alias("n01"),
        (F.col("n") - F.col("sa") - F.col("sb") + F.col("sab")).alias("n00"),
        F.round(po, 9).alias("po"),
        F.when(pe == 1.0, F.lit(None).cast("double"))
        .otherwise(F.round((po - pe) / (1.0 - pe), 9))
        .alias("kappa"),
    ).orderBy("filter_a", "filter_b")


# ---------------------------------------------------------------------------
# Quality-filter ensemble gate (round 7)
# ---------------------------------------------------------------------------
_ENSEMBLE_MIN_VOTES = 3


@register(
    "quality_ensemble_gate",
    doc=f"ensemble quality gate: per-source yield when >= {_ENSEMBLE_MIN_VOTES} of 4 gates pass",
    oracle=f"""
        WITH flags AS ({_GATES_SQL}),
        voted AS (
            SELECT source, n_tokens, f1 + f2 + f3 + f4 AS votes,
                   CASE WHEN f1 + f2 + f3 + f4 >= {_ENSEMBLE_MIN_VOTES}
                        THEN 1 ELSE 0 END AS pass
            FROM flags
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(pass) AS BIGINT) AS n_pass,
               round(CAST(SUM(pass) AS DOUBLE) / COUNT(*), 9) AS pass_rate,
               CAST(SUM(n_tokens) AS BIGINT) AS tokens_in,
               CAST(SUM(pass * n_tokens) AS BIGINT) AS tokens_kept,
               round(CAST(SUM(pass * n_tokens) AS DOUBLE)
                     / SUM(n_tokens), 9) AS token_yield
        FROM voted GROUP BY source
        ORDER BY source
    """,
)
def quality_ensemble_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Majority-vote quality filtering — the ensemble pattern modern
    curation pipelines use (FineWeb/RefinedWeb stack several heuristic
    gates; a doc survives when most agree) reported as the per-source
    YIELD sheet a pipeline owner actually reads: docs in, docs kept,
    tokens kept. Gates are the four integer-exact filters shared with
    filter_agreement_kappa (that op measures whether the ensemble's
    members agree; this one applies the vote). All-integer except the
    two final ratios (one division each, 9 dp).

    Plan: scan-side gate flags + one map-side-combined rollup on
    source — ONE corpus pass, 20 rows out. Scales trivially.
    reference: SURVEY §2.11 (quality/curation tier).
    """
    from dynaledger_spark.plans.queries_text import _docs

    flags = _gate_flags(_docs(spark, sf_dir))
    votes = F.col("f1") + F.col("f2") + F.col("f3") + F.col("f4")
    voted = flags.select(
        "source",
        "n_tokens",
        F.when(votes >= _ENSEMBLE_MIN_VOTES, 1).otherwise(0).alias("pass"),
    )
    return (
        voted.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("pass").cast("bigint").alias("n_pass"),
            F.round(
                F.sum("pass").cast("double") / F.count(F.lit(1)), 9
            ).alias("pass_rate"),
            F.sum("n_tokens").cast("bigint").alias("tokens_in"),
            F.sum(F.col("pass") * F.col("n_tokens"))
            .cast("bigint")
            .alias("tokens_kept"),
            F.round(
                F.sum(F.col("pass") * F.col("n_tokens")).cast("double")
                / F.sum("n_tokens"),
                9,
            ).alias("token_yield"),
        )
        .orderBy("source")
    )
