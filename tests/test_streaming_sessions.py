"""The stateful streaming sessionizer must close sessions on >30min gaps
and keep the open tail in state (not emitted)."""

from datetime import datetime

import pytest

from fitness_nutrition_data_pipeline_spark.streaming.sessions import run_sessionizer_once


def _ts(minute: int) -> datetime:
    return datetime(2024, 1, 1, minute // 60, minute % 60, 0)


@pytest.fixture(scope="module")
def session_table(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("sess"))
    rows = [
        # user 1: events at t=0,10,20 (one session), gap, t=60,65 (second
        # session closes the first), open tail stays in state
        (1, _ts(0), 1, "view", 1.0),
        (2, _ts(10), 1, "view", 1.0),
        (3, _ts(20), 1, "click", 1.0),
        (4, _ts(60), 1, "view", 1.0),
        (5, _ts(65), 1, "view", 1.0),
        # user 2: single burst, never closes in-batch
        (6, _ts(5), 2, "view", 1.0),
        (7, _ts(6), 2, "view", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    df.write.mode("overwrite").parquet(f"{base}/events")
    return run_sessionizer_once(spark, f"{base}/events", "sess_out")


def test_closed_sessions_emitted(session_table):
    rows = session_table.collect()
    assert len(rows) == 1  # only user 1's first session closed
    r = rows[0]
    assert r.user_id == 1
    assert r.n_events == 3
    assert (r.session_end_us - r.session_start_us) == 20 * 60 * 1_000_000


def test_open_sessions_not_emitted(session_table):
    assert session_table.where("user_id = 2").count() == 0
