"""As-of join semantics on crafted timelines: latest-prior match, equal-ts
visibility, no-match NULLs, and key isolation."""

from __future__ import annotations

import datetime as dt

from dynaledger_spark.operators.temporal import asof_join

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)


def _at(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, 1, _at(10)),   # after quotes at 0 and 5 → matches 5
            (2, 1, _at(5)),    # equal ts → the t=5 quote is visible
            (3, 1, _at(1)),    # only the t=0 quote precedes
            (4, 2, _at(10)),   # user 2 has no quotes → NULL
            (5, 3, _at(0)),    # quote arrives later (t=1) → NULL (no future leak)
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _at(0), 100.0),
            (1, _at(5), 200.0),
            (3, _at(1), 999.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    got = {
        r.event_id: (r.asof_ts, r.asof_value)
        for r in asof_join(left, right, on=["user_id"], payload_cols=["value"]).collect()
    }
    assert got[1] == (_at(5), 200.0)
    assert got[2] == (_at(5), 200.0)   # r.t <= l.t includes equality
    assert got[3] == (_at(0), 100.0)
    assert got[4] == (None, None)
    assert got[5] == (None, None)      # strictly no future data


def test_range_join_bucketed_boundaries(spark):
    from dynaledger_spark.operators.temporal import range_join_bucketed

    points = spark.createDataFrame(
        [
            (1, 1, _at(0)),     # exactly at start → included
            (2, 1, _at(90)),    # exactly at end → included
            (3, 1, _at(91)),    # one minute past → excluded
            (4, 1, _at(-1)),    # before start → excluded
            (5, 2, _at(30)),    # right key, wrong user → excluded
        ],
        "point_id long, user_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(1, 10, _at(0), _at(90))],  # 1.5h: spans two 1h buckets
        "user_id long, interval_id long, start_ts timestamp, end_ts timestamp",
    )
    got = sorted(
        r.point_id
        for r in range_join_bucketed(
            points, intervals, on=["user_id"],
            point_ts="ts", start_ts="start_ts", end_ts="end_ts", bucket="1 hour",
        ).collect()
    )
    assert got == [1, 2]


def test_asof_join_null_payload_carries(spark):
    # a NULL payload VALUE must still count as a match (struct wrapper)
    left = spark.createDataFrame([(1, 1, _at(10))], "event_id long, user_id long, ts timestamp")
    right = spark.createDataFrame(
        [(1, _at(0), 100.0), (1, _at(5), None)], "user_id long, ts timestamp, value double"
    )
    r = asof_join(left, right, on=["user_id"], payload_cols=["value"]).head()
    # the t=5 row IS the latest match even though its value is NULL
    assert r.asof_ts == _at(5) and r.asof_value is None


def test_interval_overlap_join_property(spark):
    """Randomized interval sets (hypothesis): the bucketed
    first-shared-bucket join equals brute-force overlap enumeration
    exactly — pairs, no duplicates, any bucket width."""
    import datetime as dt

    from hypothesis import given, settings, strategies as st

    from dynaledger_spark.operators.temporal import interval_overlap_join

    base = dt.datetime(2024, 1, 1)

    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 72 * 60), st.integers(1, 360)),
            min_size=1, max_size=12,
        ),
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 72 * 60), st.integers(1, 360)),
            min_size=1, max_size=12,
        ),
        st.sampled_from(["1 hour", "30 minutes", "1 day"]),
    )
    def check(a_rows, b_rows, bucket):
        a = spark.createDataFrame(
            [
                (i, k, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + d))
                for i, (k, s, d) in enumerate(a_rows)
            ],
            "a_id int, k int, a_start timestamp, a_end timestamp",
        )
        b = spark.createDataFrame(
            [
                (i, k, base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + d))
                for i, (k, s, d) in enumerate(b_rows)
            ],
            "b_id int, k int, b_start timestamp, b_end timestamp",
        )
        got = sorted(
            (r["a_id"], r["b_id"])
            for r in interval_overlap_join(
                a, b, on=["k"], a_start="a_start", a_end="a_end",
                b_start="b_start", b_end="b_end", bucket=bucket,
            ).collect()
        )
        want = sorted(
            (i, j)
            for i, (ka, sa, da) in enumerate(a_rows)
            for j, (kb, sb, db) in enumerate(b_rows)
            if ka == kb and sa <= sb + db and sb <= sa + da
        )
        assert got == want

    check()
