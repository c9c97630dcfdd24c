"""Generic format connectors beyond the reference's CSV/XLSX/MySQL surface
(main_etl_pipeline.py:95-160 reads CSV + XLSX; db_schema.sql is the MySQL
sink): JSON-lines and ORC round-trips on Spark's native readers, Avro
gated behind its optional package.

Scale notes: all three are splittable columnar/row formats Spark reads
in parallel per file-split. JSONL carries its schema per record —
`read_jsonl` takes an explicit schema to keep the scan single-pass
(schema inference reads the data TWICE and samples types unstably;
never let it near 100 TB). ORC gets the same predicate
pushdown/column-pruning treatment as parquet. For event feeds, prefer
parquet/ORC; JSONL is the interchange/fallback format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(df: DataFrame, path: str, *, compression: str | None = None) -> None:
    """One JSON object per line, split across files by partition — the
    interchange format most external corpora arrive in."""
    w = df.write.mode("overwrite")
    if compression:
        w = w.option("compression", compression)
    w.json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Schema-EXPLICIT JSONL scan: a declared schema keeps the read
    single-pass and the column types stable (inference double-reads and
    type-guesses per sample). Corrupt lines land in the standard
    `_corrupt_record` column when it is declared in the schema."""
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """Columnar ORC sink (native, zlib by default) — same pushdown and
    pruning story as parquet; useful when downstream consumers are
    Hive/Trino-side."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro package is on the classpath. Avro is an
    OPTIONAL Spark module (org.apache.spark:spark-avro); this container
    does not ship it, so the writer below is import-gated the same way
    openpyxl is for XLSX (SURVEY §2.1 S3)."""
    try:
        # the same resolution Spark's writer performs — a bare
        # Class.forName is NOT honest here (the distribution can carry
        # the class without registering the data source)
        ds = spark._jvm.org.apache.spark.sql.execution.datasources.DataSource
        ds.lookupDataSource("avro", spark._jsparkSession.sessionState().conf())
        return True
    except Exception:
        return False


def write_avro_sparkpkg(df: DataFrame, path: str) -> None:
    """Avro sink through the OPTIONAL spark-avro SQL module; raises a
    clear error when the package is absent (gated — never a silent
    fallback). The always-available native-spec writer lives in
    sources/avro.py::write_avro — distinct name so the two can never be
    import-confused (ADVICE r10)."""
    if not avro_available(df.sparkSession):
        raise ModuleNotFoundError(
            "spark-avro is not on the classpath; add "
            "org.apache.spark:spark-avro to use the Avro sink"
        )
    df.write.mode("overwrite").format("avro").save(path)
