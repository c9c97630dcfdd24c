"""Idempotent partition upsert + quality quarantine."""

from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.load import split_quarantine, upsert_partitions


def test_upsert_partitions_idempotent(spark, tmp_path):
    path = str(tmp_path / "fact")
    day1 = spark.createDataFrame(
        [(1, 20160101, 10.0), (2, 20160101, 11.0)], "UserKey long, DateKey int, v double"
    )
    day2 = spark.createDataFrame(
        [(1, 20160102, 20.0)], "UserKey long, DateKey int, v double"
    )
    upsert_partitions(day1, path)
    upsert_partitions(day2, path)
    assert spark.read.parquet(path).count() == 3
    # re-run day1 with corrected data → replaces ONLY that partition
    day1_fixed = spark.createDataFrame(
        [(1, 20160101, 99.0)], "UserKey long, DateKey int, v double"
    )
    upsert_partitions(day1_fixed, path)
    out = spark.read.parquet(path)
    assert out.count() == 2
    assert out.where("DateKey = 20160102").count() == 1  # untouched
    assert out.where("DateKey = 20160101").first().v == 99.0


def test_split_quarantine(spark):
    df = spark.createDataFrame(
        [(1, 25.0, 1.70), (2, -5.0, 1.80), (3, 500.0, 0.2), (4, 70.0, None)],
        "id long, weight double, height double",
    )
    clean, bad = split_quarantine(
        df,
        {
            "weight_range": (F.col("weight") < 0) | (F.col("weight") > 300),
            "height_range": F.col("height").isNotNull() & ~F.col("height").between(1.0, 2.5),
        },
    )
    assert {r.id for r in clean.collect()} == {1, 4}
    quarantined = {r.id: r.violated_rules for r in bad.collect()}
    assert quarantined[2] == "weight_range"
    assert quarantined[3] == "weight_range,height_range"
    assert "violated_rules" in bad.columns and "_violations" not in bad.columns
