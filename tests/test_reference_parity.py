"""Golden-parity test against the reference's own input data.

Runs the full warehouse pipeline on /root/reference/data (xlsx converted
via tools/xlsx_to_csv — no openpyxl in this container) and asserts the
reference's published row counts (BASELINE.md; output/etl_report_*.json +
etl_pipeline.log):

  Dim_User 4698, Dim_Date 3653, Dim_FoodItem 8789, Fact_UserSnapshot 4698,
  Fact_WorkoutSession 233, Fact_HealthMetric 66 (present-data: weight only
  — heartrate/sleep files absent from the snapshot),
  Bridge_User_DietPreference 46223, user mapping 15597, quality 100.

Skipped when the reference tree is absent (repo stays standalone).
"""

import os
import shutil

import pytest

REF = "/root/reference/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference data not available"
)


@pytest.fixture(scope="module")
def report(spark, tmp_path_factory):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))
    from xlsx_to_csv import convert

    from fitness_nutrition_data_pipeline_spark.config import PipelineConfig
    from fitness_nutrition_data_pipeline_spark.pipeline import FitnessWarehousePipeline

    base = str(tmp_path_factory.mktemp("refparity"))
    data = os.path.join(base, "data")
    os.makedirs(os.path.join(data, "fitbit"))
    for f in os.listdir(os.path.join(REF, "fitbit")):
        shutil.copy(os.path.join(REF, "fitbit", f), os.path.join(data, "fitbit"))
    shutil.copy(os.path.join(REF, "gym_members_exercise_tracking.csv"), data)
    # gym_recommendation flows through the NATIVE stdlib xlsx source
    # (copied as-is); nutrition goes through the pre-convert tool — the
    # golden counts below thereby pin BOTH xlsx ingestion paths
    shutil.copy(os.path.join(REF, "gym_recommendation.xlsx"), data)
    convert(os.path.join(REF, "nutrition.xlsx"), os.path.join(data, "nutrition.csv"))

    cfg = PipelineConfig(
        data_dir=data,
        fitbit_dir=os.path.join(data, "fitbit"),
        warehouse_dir=os.path.join(base, "wh"),
        output_dir=os.path.join(base, "out"),
    )
    return FitnessWarehousePipeline(spark, cfg).run()


GOLDEN = {
    "Dim_User": 4698,
    "Dim_Date": 3653,
    "Dim_FoodItem": 8789,
    "Fact_UserSnapshot": 4698,
    "Fact_WorkoutSession": 233,
    "Fact_HealthMetric": 66,
    "Bridge_User_DietPreference": 46223,
}


def test_golden_table_counts(report):
    for table, expected in GOLDEN.items():
        assert report["table_counts"][table] == expected, table


def test_mapping_and_score(report):
    assert report["total_users_mapped"] == 15597
    assert report["validation"]["quality_score"] == 100.0
    assert report["validation"]["issues"] == []
