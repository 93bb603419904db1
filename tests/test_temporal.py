"""Edge semantics for the temporal join operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from s3_elasticsearch_data_pipeline_spark.operators.temporal import (
    asof_join, range_join)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_join_basic_and_no_match(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00")),
         (2, "u1", _ts("2024-01-01T12:00")),
         (3, "u2", _ts("2024-01-01T09:00"))],   # u2 has no prior right row
        "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "u1", _ts("2024-01-01T09:30"), 1.0),
         (11, "u1", _ts("2024-01-01T11:00"), 2.0),
         (12, "u2", _ts("2024-01-01T09:30"), 3.0)],
        "event_id long, user_id string, ts timestamp, value double")
    out = {r.event_id: (r.asof_event_id, r.asof_value)
           for r in asof_join(left, right, "user_id",
                              right_cols=("event_id", "value")).collect()}
    assert out[1] == (10, 1.0)      # latest right at/before 10:00
    assert out[2] == (11, 2.0)      # 11:00 beats 09:30
    assert out[3] == (None, None)   # no right row at/before 09:00


def test_asof_join_tie_and_strict(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00"))],
        "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "u1", _ts("2024-01-01T10:00"), 1.0)],
        "event_id long, user_id string, ts timestamp, value double")
    # non-strict: same-instant right row is visible
    got = asof_join(left, right, "user_id",
                    right_cols=("event_id",)).collect()[0]
    assert got.asof_event_id == 10
    # strict: it is not
    got = asof_join(left, right, "user_id", right_cols=("event_id",),
                    strict=True).collect()[0]
    assert got.asof_event_id is None


def test_asof_join_equal_ts_deterministic_winner(spark):
    left = spark.createDataFrame(
        [(1, "u1", _ts("2024-01-01T10:00"))],
        "event_id long, user_id string, ts timestamp")
    right = spark.createDataFrame(
        [(10, "u1", _ts("2024-01-01T09:00"), 1.0),
         (11, "u1", _ts("2024-01-01T09:00"), 2.0)],
        "event_id long, user_id string, ts timestamp, value double")
    got = asof_join(left, right, "user_id",
                    right_cols=("event_id", "value")).collect()[0]
    assert got.asof_event_id == 11  # greatest carried key wins ties


def test_range_join_boundaries(spark):
    facts = spark.createDataFrame(
        [(1, 0.0), (2, 99.99), (3, 100.0), (4, 250.0), (5, -1.0)],
        "id long, v double")
    tiers = spark.createDataFrame(
        [("low", 0.0, 100.0), ("mid", 100.0, 250.0), ("high", 250.0, 1000.0)],
        "tier string, lo double, hi double")
    got = {r.id: r.tier for r in
           range_join(facts, tiers, "v").select("id", "tier").collect()}
    assert got == {1: "low", 2: "low", 3: "mid", 4: "high"}  # 5 unmatched
    # left outer keeps unmatched facts with null tier
    outer = {r.id: r.tier for r in
             range_join(facts, tiers, "v", how="left")
             .select("id", "tier").collect()}
    assert outer[5] is None and len(outer) == 5


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

EVENT_ROWS = st.lists(
    st.tuples(st.integers(0, 3),                    # user_id
              st.integers(0, 50),                   # ts (seconds)
              st.sampled_from(["a", "b", "c"])),    # attr
    min_size=1, max_size=30)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=EVENT_ROWS)
def test_scd2_invariants(spark, rows):
    """SCD2 output must tile each user's timeline: contiguous
    effective ranges, exactly one current version, consecutive
    versions differ in the tracked attribute, and n_events sums to
    the user's event count."""
    from s3_elasticsearch_data_pipeline_spark.operators.temporal import (
        scd2_history)
    df = spark.createDataFrame(
        [(i, u, t, a) for i, (u, t, a) in enumerate(rows)],
        "event_id long, user_id long, ts long, event_type string")
    out = scd2_history(df, ts="ts").collect()

    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    events_per_user = {}
    for _i, (u, _t, _a) in enumerate(rows):
        events_per_user[u] = events_per_user.get(u, 0) + 1

    for u, versions in by_user.items():
        versions.sort(key=lambda r: (r["effective_from"],
                                     r["effective_to"] is None,
                                     r["effective_to"]))
        assert sum(v["n_events"] for v in versions) == events_per_user[u]
        assert sum(v["is_current"] for v in versions) == 1
        assert versions[-1]["is_current"] == 1
        for a, b in zip(versions, versions[1:]):
            assert a["effective_to"] == b["effective_from"]
            if a["effective_from"] != b["effective_from"]:
                # runs starting at the same instant have no recoverable
                # order from the output alone; skip the attr check there
                assert a["event_type"] != b["event_type"]
