"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under an sf directory.

Scans are plain ``spark.read.parquet`` so Catalyst keeps full predicate
pushdown / column pruning; at cluster scale the same call reads a
partitioned directory tree and prunes partitions for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # events.ts is parquet TIMESTAMP(NANOS). What the scan yields depends on
    # the Spark version and session confs of whoever built the session:
    #   - long nanos   (spark.sql.legacy.parquet.nanosAsLong=true, Spark ≤4.0)
    #   - TIMESTAMP_NTZ (Spark 4.1+ reads NANOS natively, micro-truncated)
    #   - error         (Spark ≤4.0 without the legacy conf)
    # load_table must work on ANY caller-provided session (e.g. a bare
    # SparkSession.builder.getOrCreate()), so set the legacy conf (harmless
    # where it's inert) and normalize whatever type comes back to a plain
    # session-TZ TIMESTAMP at microsecond precision.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Timestamp arithmetic / date extraction must agree with the DuckDB
    # oracle (which is timezone-naive): pin the session to UTC so results
    # don't depend on the machine timezone of whatever harness calls us.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # integer division — float division loses precision (epoch-nanos
            # exceed double's 2^53 exact-integer range)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, T.TimestampNTZType):
            # NTZ → LTZ cast interprets the wall-clock in the session TZ;
            # pinned to UTC above, so the epoch matches DuckDB's naive view.
            # LTZ is required downstream (unix_micros rejects TIMESTAMP_NTZ).
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view (for ``spark.sql`` queries)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
