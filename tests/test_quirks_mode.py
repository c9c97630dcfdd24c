"""reference_quirks=False: the corrected-intent behavior — mendeley goals
standardized from the real fitness_goal column, exercises blob reaching
the workout dimension/bridge."""

import pytest
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.config import PipelineConfig
from fitness_nutrition_data_pipeline_spark.pipeline import FitnessWarehousePipeline

from tests import fixtures as FX


@pytest.fixture(scope="module")
def pipeline(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("noquirks"))
    data_dir = FX.write_fixtures(base)
    cfg = PipelineConfig(
        data_dir=data_dir,
        fitbit_dir=f"{data_dir}/fitbit",
        warehouse_dir=f"{base}/warehouse",
        output_dir=f"{base}/output",
        reference_quirks=False,
    )
    p = FitnessWarehousePipeline(spark, cfg)
    p.extract()
    p.transform()
    return p


def test_goals_standardized_from_real_column(pipeline):
    goals = {
        r.OriginalID: r.FitnessGoal
        for r in pipeline.staging.where(F.col("Source") == "mendeley").collect()
    }
    # fixture mendeley: Weight Gain → build_muscle ('gain'), Weight Loss →
    # lose_weight — no maintain_health defaults
    assert set(goals.values()) == {"build_muscle", "lose_weight"}


def test_exercises_reach_dim_exercise(pipeline):
    names = {r.ExerciseName for r in pipeline.warehouse["Dim_Exercise"].collect()}
    # mendeley blob items now present alongside the gym workout types
    assert "squats" in names and "deadlifts" in names
    assert "cardio" in names  # gym types still there


def test_same_user_counts_either_mode(pipeline):
    # quirks only change attributes, not identity resolution
    assert pipeline.staging.count() == FX.EXPECTED_USERS
