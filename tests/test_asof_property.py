"""Property test: the distributed as-of join must agree with pandas'
single-node ``merge_asof`` (the de-facto semantics standard) on random
event streams — keys, duplicates, out-of-range rows and all."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from s3_elasticsearch_data_pipeline_spark.operators.temporal import asof_join


@st.composite
def event_frames(draw):
    n_left = draw(st.integers(1, 25))
    n_right = draw(st.integers(0, 25))
    keys = ["a", "b", "c"]
    left = pd.DataFrame({
        "event_id": range(n_left),
        "user_id": [draw(st.sampled_from(keys)) for _ in range(n_left)],
        "ts": pd.to_datetime(
            [draw(st.integers(0, 10_000)) for _ in range(n_left)], unit="s"),
    })
    right = pd.DataFrame({
        "event_id": range(100, 100 + n_right),
        "user_id": [draw(st.sampled_from(keys)) for _ in range(n_right)],
        "ts": pd.to_datetime(
            [draw(st.integers(0, 10_000)) for _ in range(n_right)], unit="s"),
        "value": [float(i) for i in range(n_right)],
    })
    return left, right


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(event_frames())
def test_asof_matches_pandas_merge_asof(spark, frames):
    left_pd, right_pd = frames
    left = spark.createDataFrame(
        left_pd, "event_id long, user_id string, ts timestamp")
    right = (spark.createDataFrame(
        right_pd, "event_id long, user_id string, ts timestamp, value double")
        if len(right_pd) else
        spark.createDataFrame([],
            "event_id long, user_id string, ts timestamp, value double"))

    got = {r.event_id: r.asof_value
           for r in asof_join(left, right, "user_id",
                              right_cols=("value",)).collect()}

    # pandas ground truth (sorted inputs required by merge_asof)
    if len(right_pd) == 0:
        want = {int(e): None for e in left_pd["event_id"]}
    else:
        lp = left_pd.sort_values(["ts", "event_id"], kind="stable")
        rp = right_pd.sort_values(["ts", "event_id"], kind="stable")
        merged = pd.merge_asof(lp, rp, on="ts", by="user_id",
                               direction="backward", suffixes=("", "_r"))
        want = {int(r.event_id): (None if pd.isna(r.value) else float(r.value))
                for r in merged.itertuples()}

    # where several right rows share (key, ts), merge_asof takes the
    # last input row; our tiebreak takes the greatest carried column —
    # identical here because value increases with input order.
    assert got == want, f"asof mismatch: {got} vs {want}"
