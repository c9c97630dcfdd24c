"""Unit tests for the cleaning Column expressions (SURVEY §2.6 F1-F3, P5)."""


from fitness_nutrition_data_pipeline_spark.config import FITNESS_GOALS
from fitness_nutrition_data_pipeline_spark.functions.cleaning import (
    clean_text_list,
    normalize_columns,
    null_out_of_range,
    standardize_fitness_goal,
    strip_units,
)


def _vals(spark, expr, data, dtype="string"):
    df = spark.createDataFrame([(d,) for d in data], f"v {dtype}")
    return [r.out for r in df.select(expr.alias("out")).collect()]


def test_clean_text_list(spark):
    out = _vals(
        spark,
        clean_text_list("v"),
        [
            "Squats, deadlifts, bench presses, and overhead presses",
            "A and B",
            "one,two\nthree",
            " , ,",
            None,
        ],
    )
    assert out[0] == ["squats", "deadlifts", "bench presses", "overhead presses"]
    assert out[1] == ["a", "b"]
    assert out[2] == ["one", "two", "three"]
    assert out[3] == []
    assert out[4] == []


def test_strip_units(spark):
    out = _vals(spark, strip_units("v"), ["0.26 g", "9.00 mg", "0.00 IU", "0.1g", "381", "abc", None])
    assert out == [0.26, 9.0, 0.0, 0.1, 381.0, None, None]


def test_standardize_fitness_goal(spark):
    out = _vals(
        spark,
        standardize_fitness_goal("v", FITNESS_GOALS),
        ["Weight Loss", "Weight Gain", "Cardio", "Yoga", "wellness", None],
    )
    # Weight Gain hits 'gain' → build_muscle (FIXTURES §7 note); Yoga matches
    # nothing → default; None → default.
    assert out == [
        "lose_weight",
        "build_muscle",
        "endurance",
        "maintain_health",
        "maintain_health",
        "maintain_health",
    ]


def test_first_match_wins_order(spark):
    # 'lose weight build muscle' contains keywords of two buckets — dict
    # order must win (lose_weight first).
    out = _vals(spark, standardize_fitness_goal("v", FITNESS_GOALS), ["lose weight build muscle"])
    assert out == ["lose_weight"]


def test_null_out_of_range_exclusive(spark):
    out = _vals(spark, null_out_of_range("v", 10, 60), [10.0, 10.01, 59.99, 60.0, 22.5, None], "double")
    assert out == [None, 10.01, 59.99, None, 22.5, None]


def test_normalize_columns(spark):
    df = spark.createDataFrame([(1, 2.0)], ["Weight (kg)", "Fitness Goal"])
    assert normalize_columns(df).columns == ["weight_(kg)", "fitness_goal"]
