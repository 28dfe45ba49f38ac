"""As-of join vs pandas merge_asof; sessionization vs a plain-Python oracle."""

import datetime as dt

import pandas as pd
import pytest

from sat_val_framework_spark.functions.asof import as_of_join, sessionize

T0 = dt.datetime(2024, 1, 1)


def _ts(minutes):
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    left_rows = [
        (i, i % 3, _ts(m)) for i, m in enumerate([5, 12, 31, 44, 58, 70, 71, 90, 130, 200])
    ]
    right_rows = [
        (k, _ts(m), 100 * k + m) for k in range(3) for m in (0, 30, 60, 120)
    ]
    left = spark.createDataFrame(left_rows, "event_id long, k long, ts timestamp")
    right = spark.createDataFrame(right_rows, "k long, rts timestamp, payload long")
    return left, right, left_rows, right_rows


def test_asof_matches_pandas_merge_asof(frames):
    left, right, left_rows, right_rows = frames
    got = {
        r["event_id"]: r["asof_payload"]
        for r in as_of_join(left, right, "k", "ts", "rts", ["payload"]).collect()
    }
    lp = pd.DataFrame(left_rows, columns=["event_id", "k", "ts"]).sort_values("ts")
    rp = pd.DataFrame(right_rows, columns=["k", "rts", "payload"]).sort_values("rts")
    exp = pd.merge_asof(lp, rp, left_on="ts", right_on="rts", by="k", direction="backward")
    for r in exp.itertuples():
        want = None if pd.isna(r.payload) else int(r.payload)
        assert got[r.event_id] == want, r


def test_asof_no_match_is_null(spark, frames):
    left, right, *_ = frames
    early = spark.createDataFrame([(99, 0, _ts(-10))], "event_id long, k long, ts timestamp")
    out = as_of_join(early, right, "k", "ts", "rts", ["payload"]).collect()
    assert out[0]["asof_payload"] is None


def test_asof_tie_matches_equal_timestamp(spark, frames):
    _, right, *_ = frames
    at_exact = spark.createDataFrame([(7, 1, _ts(30))], "event_id long, k long, ts timestamp")
    out = as_of_join(at_exact, right, "k", "ts", "rts", ["payload"]).collect()
    assert out[0]["asof_payload"] == 100 * 1 + 30  # right_ts == left_ts matches


def test_sessionize_gap_boundaries(spark):
    rows = [(1, _ts(m)) for m in (0, 10, 20, 80, 85, 200)] + [(2, _ts(0)), (2, _ts(100))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = sessionize(ev, "user_id", "ts", gap_seconds=1800).collect()
    sess = {(r["user_id"], r["ts"]): r["session_seq"] for r in out}
    # user 1: 0/10/20 in s1 (gaps 10min), 80/85 in s2 (gap 60min), 200 in s3
    assert [sess[(1, _ts(m))] for m in (0, 10, 20, 80, 85, 200)] == [1, 1, 1, 2, 2, 3]
    assert [sess[(2, _ts(m))] for m in (0, 100)] == [1, 2]
    # exactly-at-gap boundary does NOT start a new session (strict >)
    ev2 = spark.createDataFrame([(3, _ts(0)), (3, _ts(30))], "user_id long, ts timestamp")
    out2 = {r["ts"]: r["session_seq"] for r in sessionize(ev2, "user_id", "ts", 1800).collect()}
    assert out2[_ts(30)] == 1


def test_sessionize_deterministic_across_partitionings(spark):
    rows = [(u, _ts(m)) for u in range(5) for m in range(0, 300, 7)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    a = sorted(map(tuple, sessionize(ev.coalesce(1), "user_id", "ts").collect()))
    b = sorted(map(tuple, sessionize(ev.repartition(8), "user_id", "ts").collect()))
    assert a == b


def test_range_join_matches_naive_nonequi(spark):
    """Bucketized range join == the naive non-equi join, including intervals
    spanning multiple buckets and exact boundary inclusion."""
    import random

    from pyspark.sql import functions as F

    from sat_val_framework_spark.functions.asof import range_join

    random.seed(3)
    left_rows = [(i, i % 5, random.randint(0, 1000)) for i in range(300)]
    right_rows = [
        (j, j % 5, s := random.randint(0, 950), s + random.randint(0, 120))
        for j in range(80)
    ]
    left = spark.createDataFrame(left_rows, ["lid", "k", "ts"])
    right = spark.createDataFrame(right_rows, ["rid", "k", "lo", "hi"])
    got = {
        (r["lid"], r["rid"])
        for r in range_join(left, right, "k", "ts", "lo", "hi", bucket_width=50).collect()
    }
    naive = {
        (r["lid"], r["rid"])
        for r in left.join(
            right,
            (left.k == right.k) & (left.ts >= right.lo) & (left.ts <= right.hi),
        ).collect()
    }
    assert got == naive and len(naive) > 0


def test_range_join_plan_has_no_nested_loop(spark):
    from sat_val_framework_spark.functions.asof import range_join

    left = spark.createDataFrame([(1, 1, 10)], ["lid", "k", "ts"])
    right = spark.createDataFrame([(1, 1, 5, 15)], ["rid", "k", "lo", "hi"])
    plan = (
        range_join(left, right, "k", "ts", "lo", "hi", bucket_width=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan and "CartesianProduct" not in plan


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100_000)),
        min_size=1,
        max_size=50,
    )
)
def test_sessionize_property_vs_python_oracle(spark, pairs):
    """For ANY event set, session assignment equals the plain-python gap
    fold (duplicate timestamps land in the same session, so task order
    cannot matter)."""
    import datetime

    from pyspark.sql import functions as F

    from sat_val_framework_spark.functions.asof import sessionize

    base = datetime.datetime(2024, 1, 1)
    rows = [(u, base + datetime.timedelta(seconds=s)) for u, s in pairs]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        (r["user_id"], r["ts"]): r["session_seq"]
        for r in sessionize(df, key="user_id", ts="ts", gap_seconds=600).collect()
    }
    # python oracle
    expected = {}
    by_user: dict = {}
    for u, t in sorted(rows, key=lambda x: (x[0], x[1])):
        last, seq = by_user.get(u, (None, 0))
        if last is None or (t - last).total_seconds() > 600:
            seq += 1
        by_user[u] = (t, seq)
        expected[(u, t)] = seq
    assert got == expected
