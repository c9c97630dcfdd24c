"""Bucketed co-located joins: writing both join sides bucketed on the key
removes the shuffle from the join entirely — the disk-layout investment
that pays at every subsequent join at 100 TB (SURVEY §4 'indexing'
equivalent, with db_schema.sql:211-218's B-trees replaced by bucket
layout)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from fitness_nutrition_data_pipeline_spark.load import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    write_bucketed(orders, "orders_b", "o_custkey", 8)
    write_bucketed(customer, "customer_b", "c_custkey", 8)
    return spark.table("orders_b"), spark.table("customer_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    orders_b, customer_b = bucketed_tables
    # disable auto-broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders_b.join(
            customer_b, orders_b.o_custkey == customer_b.c_custkey
        ).groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n"))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain(mode="formatted")
        plan = buf.getvalue()
        # the join reads bucketed data directly: SortMergeJoin with no
        # Exchange between the scans and the join
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning(o_custkey" not in join_section
        assert "Exchange hashpartitioning(c_custkey" not in join_section
        # correctness unchanged
        n = joined.agg(F.sum("n")).first()[0]
        assert n == spark.table("orders_b").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
