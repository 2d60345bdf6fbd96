"""Temporal joins: as-of (point-in-time) enrichment.

Spark has no native ASOF JOIN; the naive rewrite (range join + row_number)
explodes quadratically on busy keys. This implementation is the
union-tag trick: interleave both sides on (key, time), then a running
`last(payload, ignoreNulls)` window carries the latest right-side payload
forward into each left row. One shuffle on the key, per-partition sort,
zero UDFs — the shape that survives 100 TB (state is one payload struct
per row in flight, and skewed keys are still just a sort).

Semantics (matching DuckDB `ASOF LEFT JOIN ... ON l.k = r.k AND r.t <= l.t`):
for each left row, the right row with the greatest right_ts <= left_ts on
the same key; no candidate → NULL payload. At equal timestamps the right
row is visible to the left row (right sorts first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Point-in-time join: latest right row with right_ts <= left_ts per key.

    Returns every left row + `{payload_prefix}{col}` for each payload
    column (including `{payload_prefix}ts`), NULL where no right row
    precedes. Payloads are carried in a struct so genuinely-NULL payload
    values don't break the ignoreNulls carry-forward.
    """
    if payload_cols is None:
        payload_cols = [c for c in right.columns if c not in on and c != right_ts]

    payload = F.struct(
        F.col(right_ts).alias("ts"), *[F.col(c).alias(c) for c in payload_cols]
    )
    l_tagged = left.withColumn("_t", F.col(left_ts)).withColumn(
        "_payload", F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        )
    ).withColumn("_side", F.lit(1))
    r_tagged = (
        right.select(*on, F.col(right_ts).alias("_t"), payload.alias("_payload"))
        .withColumn("_side", F.lit(0))
    )
    # align columns: right rows carry NULL for left-only columns
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = r_tagged.select(*l_tagged.columns).unionByName(l_tagged)

    w = (
        W.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = u.withColumn("_match", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_t", "_payload", "_side")
    out = out.withColumn(f"{payload_prefix}ts", F.col("_match.ts"))
    for c in payload_cols:
        out = out.withColumn(f"{payload_prefix}{c}", F.col(f"_match.{c}"))
    return out.drop("_match")


def range_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join without a quadratic range join.

    The naive `p.ts BETWEEN i.start AND i.end` theta-join degenerates to
    a per-key nested loop. Here both sides get equi-joinable time-bucket
    keys — intervals explode into every bucket they overlap, points map
    to one bucket — so the planner runs a hash join on
    (key, bucket) and the exact BETWEEN predicate only filters bucket-
    local candidates. Cost scales with interval length / bucket size,
    not with rows²; pick `bucket` near the typical interval length.
    """
    bucket_sec = F.lit(_interval_seconds(bucket))
    p_b = points.withColumn(
        "_bucket", F.floor(F.unix_timestamp(F.col(point_ts)) / bucket_sec)
    )
    i_b = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(F.unix_timestamp(F.col(start_ts)) / bucket_sec),
                F.floor(F.unix_timestamp(F.col(end_ts)) / bucket_sec),
            )
        ),
    )
    joined = p_b.join(i_b, on + ["_bucket"], how).filter(
        F.col(point_ts).between(F.col(start_ts), F.col(end_ts))
    )
    return joined.drop("_bucket")


def _interval_seconds(spec: str) -> int:
    qty, unit = spec.split()
    mult = {
        "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
    }[unit]
    return int(qty) * mult


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    on: list[str],
    a_start: str,
    a_end: str,
    b_start: str,
    b_end: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Interval×interval overlap join (closed intervals) without O(N²).

    Both sides explode into the time buckets they cover and hash-join on
    (key, bucket); the exact overlap predicate
    (a_start <= b_end AND b_start <= a_end) filters bucket-local
    candidates. A pair overlapping k shared buckets would appear k
    times — instead of a distinct shuffle, each pair is emitted ONLY in
    its first shared bucket (the bucket of max(a_start, b_start), which
    any overlapping pair is guaranteed to share), so the join output is
    exactly-once by construction. Cost scales with interval length /
    bucket size, never rows².
    """
    sec = F.lit(_interval_seconds(bucket))

    def bucketed(df: DataFrame, start: str, end: str) -> DataFrame:
        return df.withColumn(
            "_bucket",
            F.explode(
                F.sequence(
                    F.floor(F.unix_timestamp(F.col(start)) / sec),
                    F.floor(F.unix_timestamp(F.col(end)) / sec),
                )
            ),
        )

    a_b, b_b = bucketed(a.alias("a"), a_start, a_end), bucketed(b.alias("b"), b_start, b_end)
    first_shared = F.floor(
        F.greatest(
            F.unix_timestamp(F.col(f"a.{a_start}")), F.unix_timestamp(F.col(f"b.{b_start}"))
        )
        / sec
    )
    cond = (
        (F.col(f"a.{a_start}") <= F.col(f"b.{b_end}"))
        & (F.col(f"b.{b_start}") <= F.col(f"a.{a_end}"))
        & (a_b["_bucket"] == first_shared)
    )
    for k in on:
        cond = cond & (F.col(f"a.{k}") == F.col(f"b.{k}"))
    return a_b.join(b_b, cond & (a_b["_bucket"] == b_b["_bucket"])).drop("_bucket")
