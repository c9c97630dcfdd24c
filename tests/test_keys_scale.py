"""assign_sequential_ids invariants on a real multi-partition input:
dense 1..N, exactly ordered by the order columns, no global window."""

from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.operators.keys import assign_sequential_ids


def test_dense_ordered_ids_multi_partition(spark):
    li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    )
    n = li.count()
    keyed = assign_sequential_ids(
        li, ["l_orderkey", "l_linenumber"], "seq_id", num_partitions=16
    )
    # dense, unique, starts at 1
    stats = keyed.agg(
        F.min("seq_id").alias("lo"),
        F.max("seq_id").alias("hi"),
        F.countDistinct("seq_id").alias("n_distinct"),
    ).first()
    assert (stats.lo, stats.hi, stats.n_distinct) == (1, n, n)
    # id order == sort order of the order columns
    sample = keyed.orderBy("seq_id").limit(100).collect()
    keys = [(r.l_orderkey, r.l_linenumber) for r in sample]
    assert keys == sorted(keys)
    assert [r.seq_id for r in sample] == list(range(1, 101))


def test_start_offset(spark):
    df = spark.range(10).withColumnRenamed("id", "v")
    keyed = assign_sequential_ids(df, ["v"], "k", start=500)
    vals = sorted(r.k for r in keyed.collect())
    assert vals == list(range(500, 510))
