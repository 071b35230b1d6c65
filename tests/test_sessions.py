"""Gap-based sessionization (operators/sessions.py)."""

import pandas as pd
import pytest

from versatiles_rs_spark.operators.sessions import session_stats, sessionize


def _events(spark):
    rows = [
        # user 1: two sessions split by a 45-min gap
        (1, "2024-01-01 10:00:00", 1, 2.0),
        (2, "2024-01-01 10:10:00", 1, 3.0),
        (3, "2024-01-01 10:55:00", 1, 5.0),
        (4, "2024-01-01 11:00:00", 1, 7.0),
        # user 2: single event
        (5, "2024-01-01 09:00:00", 2, 1.0),
        # user 3: boundary case — exactly the gap is SAME session (> not >=)
        (6, "2024-01-01 08:00:00", 3, 1.0),
        (7, "2024-01-01 08:30:00", 3, 1.0),
    ]
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf)


def test_session_boundaries(spark):
    out = sessionize(_events(spark), gap_minutes=30.0).collect()
    got = {r["event_id"]: r["session_no"] for r in out}
    assert got[1] == got[2] == 1
    assert got[3] == got[4] == 2  # 45-min silence starts session 2
    assert got[5] == 1
    assert got[6] == got[7] == 1  # exactly 30 min -> same session


def test_session_stats(spark):
    stats = {
        (r["user_id"], r["session_no"]): r
    for r in session_stats(_events(spark), gap_minutes=30.0).collect()}
    s1 = stats[(1, 1)]
    assert s1["n_events"] == 2
    assert s1["duration_s"] == pytest.approx(600.0)
    assert s1["value_sum"] == pytest.approx(5.0)
    s2 = stats[(1, 2)]
    assert s2["n_events"] == 2 and s2["duration_s"] == pytest.approx(300.0)
    assert stats[(2, 1)]["duration_s"] == 0.0
