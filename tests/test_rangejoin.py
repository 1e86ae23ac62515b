"""Interval-join unit tests: exact window semantics incl. bucket-boundary
crossings (the correctness risk of the bucketing trick)."""

import datetime

from scikit_learn_imputer_spark.operators.rangejoin import interval_join_count


def test_interval_join_count_semantics(spark):
    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ts(seconds):
        return t0 + datetime.timedelta(seconds=seconds)

    # window = 60s; bucket width = 60s. Rows straddle bucket boundaries on
    # purpose: 55→70 crosses a boundary but is within the window.
    events = spark.createDataFrame(
        [
            (1, "u1", ts(0)),
            (2, "u1", ts(55)),    # 1 preceded by id1 (55s ago)
            (3, "u1", ts(70)),    # preceded by id2 (15s) and id1 (70s — OUT)
            (4, "u1", ts(300)),   # nothing within 60s
            (5, "u2", ts(56)),    # different user — isolated
            (6, "u1", ts(70)),    # simultaneous with id3 — half-open, no self/peer count
            (7, "u2", ts(116)),   # exactly 60s after id5 — boundary: included (>=)
        ],
        ["event_id", "user_id", "ts"],
    )
    out = interval_join_count(
        events, events, on="user_id", left_ts="ts", right_ts="ts",
        window_seconds=60,
    )
    got = {r["event_id"]: r["n_in_window"] for r in out.collect()}
    assert got == {1: 0, 2: 1, 3: 1, 4: 0, 5: 0, 6: 1, 7: 1}
    # all left rows preserved exactly once
    assert out.count() == 7
