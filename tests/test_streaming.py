"""Structured Streaming rollups must reproduce the batch daily-rollup
semantics (SURVEY §2.8): same sums/means as the batch group-bys."""

import os

import pytest
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.streaming.rollups import (
    run_stream_to_memory,
    stream_daily_heartrate,
    stream_daily_sleep,
)

from tests import fixtures as FX


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    base = str(tmp_path_factory.mktemp("stream"))
    data_dir = FX.write_fixtures(base)
    return {
        "hr": os.path.join(base, "hr_in"),
        "sleep": os.path.join(base, "sleep_in"),
        "src": data_dir,
    }


def _stage(src_file: str, dst_dir: str):
    os.makedirs(dst_dir, exist_ok=True)
    import shutil

    shutil.copy(src_file, dst_dir)


def test_streaming_heartrate_matches_batch(spark, stream_dirs):
    _stage(f"{stream_dirs['src']}/fitbit/heartrate_seconds_merged.csv", stream_dirs["hr"])
    sdf = stream_daily_heartrate(spark, stream_dirs["hr"])
    assert sdf.isStreaming
    result = run_stream_to_memory(sdf, "hr_rollup")
    rows = {(r.device_id, str(r.day)): (r.avg_bpm, r.n_samples) for r in result.collect()}
    # fixture: 202 → 4/1 avg(90,100)=95 n=2; 4/2 avg(80)=80 n=1
    assert rows[(202, "2016-04-01")] == (95.0, 2)
    assert rows[(202, "2016-04-02")] == (80.0, 1)


def test_streaming_sleep_matches_batch(spark, stream_dirs):
    _stage(f"{stream_dirs['src']}/fitbit/minuteSleep_merged.csv", stream_dirs["sleep"])
    sdf = stream_daily_sleep(spark, stream_dirs["sleep"])
    result = run_stream_to_memory(sdf, "sleep_rollup")
    rows = {(r.device_id, str(r.day)): r.sleep_hours for r in result.collect()}
    assert abs(rows[(101, "2016-03-13")] - 3 / 60) < 1e-9
    assert abs(rows[(202, "2016-03-14")] - 1 / 60) < 1e-9
    # late/out-of-range 2015 row still rolls up in streaming (date filter
    # is a warehouse join concern, not an ingest concern)
    assert (101, "2015-12-30") in rows


def test_stream_fact_health_metric_matches_batch(spark, stream_dirs):
    """The streaming fact builder must emit exactly the rows the batch
    builder derives from the same file."""
    import sys

    from fitness_nutrition_data_pipeline_spark.config import PipelineConfig
    from fitness_nutrition_data_pipeline_spark.pipeline import FitnessWarehousePipeline
    from fitness_nutrition_data_pipeline_spark.streaming.rollups import (
        run_stream_to_memory,
        stream_fact_health_metric,
    )

    base = stream_dirs["src"]
    cfg = PipelineConfig(data_dir=base, fitbit_dir=f"{base}/fitbit",
                         warehouse_dir=f"{base}/_wh_stream", output_dir=f"{base}/_out_stream")
    p = FitnessWarehousePipeline(spark, cfg)
    p.extract()
    p.transform()

    _stage(f"{base}/fitbit/minuteSleep_merged.csv", stream_dirs["sleep"] + "_fact")
    sdf = stream_fact_health_metric(
        spark, stream_dirs["sleep"] + "_fact", "sleep_minutes",
        p.mapping, p.warehouse["Dim_Date"],
    )
    streamed = run_stream_to_memory(sdf, "fact_hm_stream")

    batch = p.warehouse["Fact_HealthMetric"].where(F.col("MetricTypeKey") == 2)
    batch_rows = sorted(map(tuple, batch.collect()))
    stream_rows = sorted(map(tuple, streamed.collect()))
    assert stream_rows == batch_rows
