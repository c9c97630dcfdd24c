"""salted_join must be result-identical to the plain join — only the
shuffle distribution differs."""

from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.operators.keys import salted_join


def test_salted_join_equals_plain_join(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(o, "l_orderkey").groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    salted = salted_join(li, o, "l_orderkey", n_salts=8).groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("l_quantity"), 2).alias("q")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (99, "zz")], "k long, v string")
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], "k long, w double")
    out = {r.k: r.w for r in salted_join(left, right, "k", n_salts=4, how="left").collect()}
    assert out == {1: 10.0, 2: 20.0, 99: None}
