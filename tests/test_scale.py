"""Scale utilities: salted joins preserve results while spreading skew,
bucketed tables join without a shuffle, sketches stay in error bounds."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from dynaledger_spark.operators.scale import bucketed_join, salted_join, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


def test_salted_join_same_result_as_plain(spark):
    # one pathologically hot key (90% of rows) + a long tail
    big = spark.createDataFrame(
        [(1 if i % 10 else i, float(i)) for i in range(1000)], "k long, v double"
    )
    small = spark.createDataFrame([(1, "hot"), (2, "cold"), (7, "mild")], "k long, name string")
    plain = big.join(small, ["k"]).groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    salted = salted_join(big, small, ["k"], n_salts=8).groupBy("k", "name").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_keeps_unmatched(spark):
    big = spark.createDataFrame([(1, 1.0), (99, 2.0)], "k long, v double")
    small = spark.createDataFrame([(1, "x")], "k long, name string")
    rows = {r.k: r.name for r in salted_join(big, small, ["k"], n_salts=4, how="left").collect()}
    assert rows == {1: "x", 99: None}


def test_bucketed_join_no_shuffle(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", ["o_orderkey"], n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", ["o_orderkey"], n_buckets=8)
    # at test scale the planner would broadcast (bucketing then moot);
    # disable auto-broadcast to surface the large-large plan shape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", ["o_orderkey"])
        plan = _plan(joined)
        # co-bucketed layout: sort-merge join with no Exchange on either side
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert joined.count() == orders.join(lineitem, "o_orderkey").count()


def test_hll_error_bound(spark, sf_dir):
    from dynaledger_spark.plans.registry import load_all

    reg = load_all()
    exact = {
        r.event_type: r.n_users
        for r in reg["distinct_users_exact"].build(spark, sf_dir).collect()
    }
    approx = {
        r.event_type: r.n_users_approx
        for r in reg["approx_distinct_users"].build(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(0.05 * n, 2), (et, n, approx[et])


def test_quantile_sketch_error_bound(spark, sf_dir):
    from dynaledger_spark.catalog import read_table
    from dynaledger_spark.plans.registry import load_all

    reg = load_all()
    sk = {r.event_type: r for r in reg["value_quantiles_sketch"].build(spark, sf_dir).collect()}
    events = read_table(spark, sf_dir, "events")
    for et, row in sk.items():
        vals = sorted(
            r.value for r in events.filter(F.col("event_type") == et).select("value").collect()
        )
        n = len(vals)
        for p, got in [(0.5, row.p50), (0.95, row.p95), (0.99, row.p99)]:
            # GK guarantee: returned value's rank within eps*n of target
            target = p * n
            import bisect

            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got)
            eps = max(n / 10000, 1.5)
            assert lo - eps <= target <= hi + eps, (et, p, got)


def test_bucketed_registry_query_plan(spark, sf_dir):
    """The registry's bucketed_colocated_join, with broadcast disabled
    (the large-large regime it exists for): join must run through the
    bucketed layout — SortMergeJoin, zero Exchange below the aggregate."""
    from dynaledger_spark.plans.registry import load_all

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = load_all()["bucketed_colocated_join"].build(spark, sf_dir)
        plan = _plan(df)
        assert "SortMergeJoin" in plan
        # exactly one Exchange: the groupBy's — none feeding the join
        join_part = plan.split("SortMergeJoin", 1)[1]
        assert "Exchange" not in join_part
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
