"""Approximate/sketch aggregations over the events table.

The scale path for cardinality and quantile questions: HyperLogLog++
(`approx_count_distinct`) and the GK quantile sketch
(`percentile_approx`) are single-pass, mergeable, fixed-memory — at
100 TB the exact versions below are the ones that stop being feasible
(COUNT(DISTINCT) shuffles every distinct value). Sketch outputs are
engine-specific → rows-only driver checks; error bounds vs the exact
answers are asserted in tests/test_scale.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dynaledger_spark.plans.registry import register


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dynaledger_spark.catalog import read_table

    return read_table(spark, sf_dir, "events")


@register(
    "distinct_users_exact",
    doc="exact COUNT(DISTINCT user_id) per event_type (the sketch baseline)",
    oracle="""
        SELECT event_type,
               COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events
        GROUP BY event_type
    """,
)
def distinct_users_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct: expands to a two-phase aggregate (distinct keys
    shuffle). Correct at any scale but shuffle-heavy — the reason the
    sketch variant exists."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@register(
    "approx_distinct_users",
    doc="HyperLogLog++ distinct users per event_type (rsd 2%)",
    oracle=None,  # sketch values are engine-specific
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ sketch: fixed ~1.5 KB of state per group regardless of
    cardinality, map-side mergeable — the 100 TB answer to n_users.
    Relative error ≤ ~2% (rsd parameter), asserted in tests."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"))
    )


@register(
    "value_quantiles_sketch",
    doc="GK-sketch p50/p95/p99 of value per event_type",
    oracle=None,  # sketch interpolation is engine-specific
)
def value_quantiles_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna quantile sketch at accuracy 1/10000: single pass,
    bounded memory, mergeable across partitions."""
    return (
        _events(spark, sf_dir)
        .groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.95, 0.99], 10000).alias("q"),
        )
        .select(
            "event_type",
            F.col("q")[0].alias("p50"),
            F.col("q")[1].alias("p95"),
            F.col("q")[2].alias("p99"),
        )
    )
